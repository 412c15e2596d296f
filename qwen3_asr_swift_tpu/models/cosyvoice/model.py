"""CosyVoice3 TTS: LLM → flow-matching DiT → HiFi-GAN, voice cloning.

TPU-native analog of the reference's CosyVoice module
(reference: Sources/CosyVoiceTTS/CosyVoiceTTS.swift:32-348, LLM.swift,
FlowMatching.swift, DiT.swift, HiFiGAN.swift, VoiceCloning.swift,
DialogueSynthesizer.swift): three stages —

1. a Qwen2-style LM autoregressively emits speech tokens (6561-vocab FSQ)
   from text (+ optional prompt-audio tokens for cloning);
2. a flow-matching DiT transforms noise → mel (80×) over N Euler ODE
   steps (reference: 10 compiled steps), conditioned on speech tokens and
   a speaker embedding (CAM++ x-vector for cloning);
3. a HiFi-GAN generator upsamples mel → 24 kHz waveform.

Multi-speaker dialogue scripts ("A: hi\nB: hello") are parsed and
synthesized per-turn (reference DialogueSynthesizer), with per-speaker
voices and emotion tags ([laughter], [breath] pass through the LM).

The LM loop runs in ``lax.while_loop``; the ODE integration is a
``lax.scan`` over a fixed step count; HiFi-GAN is a jitted conv graph.
"""

from __future__ import annotations

import dataclasses
import functools
import re
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import AudioChunk, SpeechGenerationModel
from ...ops.attention import NEG_INF, sdpa
from ...ops.nn import init_linear, layer_norm, linear, rms_norm, swiglu_mlp
from ...ops.rope import apply_rope, rope_angles
from ..qwen3_tts.codec import causal_conv1d, causal_transpose_conv1d, _conv_init


@dataclasses.dataclass(frozen=True)
class CosyVoiceConfig:
    # LLM (Qwen2.5-0.5B-ish)
    hidden_size: int = 896
    num_layers: int = 24
    num_heads: int = 14
    num_kv_heads: int = 2
    head_dim: int = 64
    intermediate_size: int = 4864
    text_vocab: int = 151936
    speech_vocab: int = 6562        # 6561 FSQ codes + EOS
    rope_theta: float = 1e6
    rms_norm_eps: float = 1e-6
    # DiT flow
    n_mels: int = 80
    dit_hidden: int = 256
    dit_layers: int = 4
    dit_heads: int = 4
    ode_steps: int = 10
    spk_dim: int = 192              # CAM++ x-vector
    token_mel_ratio: int = 2        # mel frames per speech token
    # vocoder
    hop: int = 480                  # 24 kHz / 50 Hz mel
    sample_rate: int = 24000
    max_tokens: int = 500


CONFIG_05B = CosyVoiceConfig()


def config_tiny() -> CosyVoiceConfig:
    return CosyVoiceConfig(hidden_size=32, num_layers=2, num_heads=2, num_kv_heads=1,
                           head_dim=16, intermediate_size=64, text_vocab=300,
                           speech_vocab=130, n_mels=16, dit_hidden=32, dit_layers=1,
                           dit_heads=2, ode_steps=2, spk_dim=16, hop=64, max_tokens=8)


def init_cosyvoice_params(key, cfg: CosyVoiceConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 16 + cfg.num_layers + cfg.dit_layers)
    h = cfg.hidden_size
    params = {
        "text_embed": (jax.random.normal(ks[0], (cfg.text_vocab, h)) * 0.02).astype(dtype),
        "speech_embed": (jax.random.normal(ks[1], (cfg.speech_vocab, h)) * 0.02).astype(dtype),
        "speech_head": init_linear(ks[2], h, cfg.speech_vocab, bias=False, dtype=dtype),
        "norm": {"weight": jnp.ones((h,), dtype)},
        "layers": [],
        "dit": {
            "token_embed": (jax.random.normal(ks[3], (cfg.speech_vocab, cfg.dit_hidden)) * 0.02).astype(dtype),
            "spk_proj": init_linear(ks[4], cfg.spk_dim, cfg.dit_hidden, dtype=dtype),
            "x_proj": init_linear(ks[5], cfg.n_mels, cfg.dit_hidden, dtype=dtype),
            "t_proj": init_linear(ks[6], 1, cfg.dit_hidden, dtype=dtype),
            "out": init_linear(ks[7], cfg.dit_hidden, cfg.n_mels, dtype=dtype),
            "layers": [],
        },
        "hifigan": {
            "pre": _conv_init(ks[8], 7, cfg.n_mels, 128, dtype=dtype),
            "up1": _conv_init(ks[9], 16, 128, 64, dtype=dtype),
            "up2": _conv_init(ks[10], 16, 64, 32, dtype=dtype),
            "res": _conv_init(ks[11], 7, 32, 32, dtype=dtype),
            "post": _conv_init(ks[12], 7, 32, 1, dtype=dtype),
        },
    }
    hd = cfg.head_dim
    for i in range(cfg.num_layers):
        k = jax.random.split(ks[16 + i], 7)
        params["layers"].append({
            "input_layernorm": {"weight": jnp.ones((h,), dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((h,), dtype)},
            "q_proj": init_linear(k[0], h, cfg.num_heads * hd, dtype=dtype),
            "k_proj": init_linear(k[1], h, cfg.num_kv_heads * hd, dtype=dtype),
            "v_proj": init_linear(k[2], h, cfg.num_kv_heads * hd, dtype=dtype),
            "o_proj": init_linear(k[3], cfg.num_heads * hd, h, bias=False, dtype=dtype),
            "mlp": {
                "gate_proj": init_linear(k[4], h, cfg.intermediate_size, bias=False, dtype=dtype),
                "up_proj": init_linear(k[5], h, cfg.intermediate_size, bias=False, dtype=dtype),
                "down_proj": init_linear(k[6], cfg.intermediate_size, h, bias=False, dtype=dtype),
            },
        })
    d = cfg.dit_hidden
    for i in range(cfg.dit_layers):
        k = jax.random.split(ks[16 + cfg.num_layers + i], 6)
        params["dit"]["layers"].append({
            "ln1": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "q": init_linear(k[0], d, d, dtype=dtype), "k": init_linear(k[1], d, d, dtype=dtype),
            "v": init_linear(k[2], d, d, dtype=dtype), "o": init_linear(k[3], d, d, dtype=dtype),
            "ln2": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "ff1": init_linear(k[4], d, d * 4, dtype=dtype),
            "ff2": init_linear(k[5], d * 4, d, dtype=dtype),
        })
    return params


# -- stage 1: LLM speech-token generation ------------------------------------

def llm_generate_tokens(params, cfg: CosyVoiceConfig, text_ids, n_valid, key,
                        max_tokens: int, temperature: float = 0.8, top_k: int = 25):
    """text_ids: [T_bucket] (left block) → (tokens [max_tokens], n)."""
    from ..chat.model import NEG_INF as _  # noqa: F401 — keep imports local

    b = 1
    t_bucket = text_ids.shape[0]
    max_len = t_bucket + max_tokens
    caches = [
        (jnp.zeros((b, cfg.num_kv_heads, max_len, cfg.head_dim), jnp.float32),
         jnp.zeros((b, cfg.num_kv_heads, max_len, cfg.head_dim), jnp.float32))
        for _ in range(cfg.num_layers)
    ]

    def forward(embeds, positions, caches, start, kv_len, key_valid):
        t = embeds.shape[1]
        x = embeds
        new_caches = []
        cols = jnp.arange(max_len)[None, None, None, :]
        rows = positions[:, None, :, None]
        mask = jnp.where((cols <= rows) & key_valid[None, None, None, :], 0.0, NEG_INF).astype(jnp.float32)
        for p, (kc, vc) in zip(params["layers"], caches):
            hd = cfg.head_dim
            h = rms_norm(x, p["input_layernorm"]["weight"], cfg.rms_norm_eps)
            q = linear(h, p["q_proj"]).reshape(b, t, cfg.num_heads, hd)
            k = linear(h, p["k_proj"]).reshape(b, t, cfg.num_kv_heads, hd)
            v = linear(h, p["v_proj"]).reshape(b, t, cfg.num_kv_heads, hd)
            cos, sin = rope_angles(positions, hd, cfg.rope_theta)
            cos, sin = cos[:, None], sin[:, None]
            q = apply_rope(q.transpose(0, 2, 1, 3), cos, sin)
            k = apply_rope(k.transpose(0, 2, 1, 3), cos, sin)
            v = v.transpose(0, 2, 1, 3)
            kc = jax.lax.dynamic_update_slice_in_dim(kc, k.astype(kc.dtype), start, axis=2)
            vc = jax.lax.dynamic_update_slice_in_dim(vc, v.astype(vc.dtype), start, axis=2)
            new_caches.append((kc, vc))
            a = sdpa(q, kc, vc, 1.0 / np.sqrt(hd), mask)
            x = x + linear(a.transpose(0, 2, 1, 3).reshape(b, t, -1), p["o_proj"])
            h2 = rms_norm(x, p["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
            x = x + swiglu_mlp(h2, p["mlp"])
        return rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps), new_caches

    embeds = jnp.take(params["text_embed"], text_ids, axis=0)[None]
    positions = jnp.arange(t_bucket)[None]
    prompt_valid = jnp.arange(max_len) < n_valid
    hidden, caches = forward(embeds, positions, caches, jnp.asarray(0, jnp.int32),
                             n_valid, prompt_valid)
    # last *valid* row; bucket is right-padded so gather at n_valid-1
    logits = linear(hidden[jnp.arange(b), n_valid - 1], params["speech_head"]).astype(jnp.float32)

    eos = cfg.speech_vocab - 1
    out = jnp.full((max_tokens,), eos, jnp.int32)

    def sample(lg, k):
        if top_k > 0:
            kth = jnp.sort(lg, axis=-1)[..., -top_k][..., None]
            lg = jnp.where(lg < kth, NEG_INF, lg)
        if temperature > 0:
            lg = lg / temperature + jax.random.gumbel(k, lg.shape, dtype=jnp.float32)
        return jnp.argmax(lg, axis=-1).astype(jnp.int32)

    key, k0 = jax.random.split(key)
    tok = sample(logits, k0)[0]
    out = out.at[0].set(tok)
    done0 = tok == eos

    def cond(s):
        step, _, _, done, _, _ = s
        return (step < max_tokens) & ~done

    def body(s):
        step, out, caches, done, tok, key = s
        emb = jnp.take(params["speech_embed"], tok[None], axis=0)[None]
        pos = (n_valid + step - 1)[None, None]
        idx = jnp.arange(max_len)
        kv_valid = prompt_valid | ((idx >= t_bucket) & (idx < t_bucket + step))
        hidden, caches = forward(emb, pos, caches, t_bucket + step - 1,
                                 n_valid + step, kv_valid)
        logits = linear(hidden[:, 0], params["speech_head"]).astype(jnp.float32)
        key, kk = jax.random.split(key)
        tok = sample(logits, kk)[0]
        out = out.at[step].set(jnp.where(done, out[step], tok))
        done = done | (tok == eos)
        return step + 1, out, caches, done, tok, key

    state = (jnp.asarray(1, jnp.int32), out, caches, done0, tok, key)
    _, out, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    n = jnp.sum(out != eos)
    return out, n


# -- stage 2: flow-matching DiT ----------------------------------------------

def dit_velocity(p, cfg: CosyVoiceConfig, x, tokens, spk, t):
    """x: [F, n_mels] noisy mel; tokens: [F] (token per mel frame);
    spk: [spk_dim]; t: scalar time. Returns velocity [F, n_mels]."""
    f = x.shape[0]
    h = linear(x[None], p["x_proj"])  # [1, F, D]
    h = h + jnp.take(p["token_embed"], tokens, axis=0)[None]
    h = h + linear(spk[None, None], p["spk_proj"])
    h = h + linear(jnp.full((1, 1, 1), t, h.dtype), p["t_proj"])
    hd = cfg.dit_hidden // cfg.dit_heads
    for lp in p["layers"]:
        hh = layer_norm(h, lp["ln1"]["weight"], lp["ln1"]["bias"])
        q = linear(hh, lp["q"]).reshape(1, f, cfg.dit_heads, hd).transpose(0, 2, 1, 3)
        k = linear(hh, lp["k"]).reshape(1, f, cfg.dit_heads, hd).transpose(0, 2, 1, 3)
        v = linear(hh, lp["v"]).reshape(1, f, cfg.dit_heads, hd).transpose(0, 2, 1, 3)
        a = sdpa(q, k, v, 1.0 / np.sqrt(hd))
        h = h + linear(a.transpose(0, 2, 1, 3).reshape(1, f, -1), lp["o"])
        hh = layer_norm(h, lp["ln2"]["weight"], lp["ln2"]["bias"])
        h = h + linear(jax.nn.gelu(linear(hh, lp["ff1"])), lp["ff2"])
    return linear(h, p["out"])[0]


def flow_to_mel(p, cfg: CosyVoiceConfig, tokens, spk, key):
    """Euler ODE from noise to mel over ode_steps (reference: 10 compiled
    steps). tokens: [F]. Returns mel [F, n_mels]."""
    f = tokens.shape[0]
    x = jax.random.normal(key, (f, cfg.n_mels), jnp.float32)
    dt = 1.0 / cfg.ode_steps

    def body(x, i):
        t = i.astype(jnp.float32) * dt
        v = dit_velocity(p, cfg, x, tokens, spk, t)
        return x + dt * v, None

    x, _ = jax.lax.scan(body, x, jnp.arange(cfg.ode_steps))
    return x


# -- stage 3: HiFi-GAN -------------------------------------------------------

def hifigan(p, mel, hop: int):
    """mel [F, n_mels] → wav [F*hop]."""
    h = causal_conv1d(mel[None], p["pre"])
    # two-stage upsample chosen so s1*s2 == hop
    s1 = 8 if hop % 8 == 0 else 4
    s2 = hop // s1
    h = jax.nn.leaky_relu(causal_transpose_conv1d(h, p["up1"], s1), 0.1)
    h = jax.nn.leaky_relu(causal_transpose_conv1d(h, p["up2"], s2), 0.1)
    h = h + jax.nn.leaky_relu(causal_conv1d(h, p["res"]), 0.1)
    return jnp.tanh(causal_conv1d(h, p["post"]))[0, :, 0]


# -- dialogue parsing ---------------------------------------------------------

_TURN = re.compile(r"^\s*([A-Za-z0-9_]+)\s*:\s*(.+)$")


def parse_dialogue(script: str) -> List[Tuple[str, str]]:
    """'A: hi\\nB: hello' → [("A", "hi"), ("B", "hello")]
    (reference: DialogueSynthesizer parser)."""
    turns = []
    for line in script.splitlines():
        m = _TURN.match(line)
        if m:
            turns.append((m.group(1), m.group(2).strip()))
        elif line.strip() and turns:
            turns[-1] = (turns[-1][0], turns[-1][1] + " " + line.strip())
    return turns


class CosyVoiceTTS(SpeechGenerationModel):
    def __init__(self, cfg: CosyVoiceConfig, params, tokenizer=None, dtype=jnp.float32):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
        self.voices: Dict[str, np.ndarray] = {}
        self._loaded = True
        self._llm = jax.jit(functools.partial(llm_generate_tokens, cfg=cfg,
                                              max_tokens=cfg.max_tokens),
                            static_argnames=())
        self._flow = jax.jit(functools.partial(flow_to_mel, cfg=cfg))
        self._vocoder = jax.jit(functools.partial(hifigan, hop=cfg.hop))

    @classmethod
    def init_random(cls, cfg: Optional[CosyVoiceConfig] = None, seed: int = 0, **kw) -> "CosyVoiceTTS":
        cfg = cfg or config_tiny()
        return cls(cfg, init_cosyvoice_params(jax.random.PRNGKey(seed), cfg), **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "FunAudioLLM/CosyVoice3-0.5B", cache_dir=None,
                        offline_mode: bool = False, dtype=jnp.bfloat16, **kw) -> "CosyVoiceTTS":
        from ...core.hub import download_weights
        from ...core.weights import load_safetensors, unflatten
        from ...tokenizers.bpe import BPETokenizer

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode)
        tokenizer = None
        try:
            tokenizer = BPETokenizer.from_pretrained_dir(model_dir)
        except FileNotFoundError:
            pass
        return cls(CONFIG_05B, unflatten(load_safetensors(model_dir)), tokenizer=tokenizer,
                   dtype=dtype, **kw)

    def register_voice(self, name: str, embedding: np.ndarray) -> None:
        """Voice cloning: register a CAM++-style x-vector
        (reference: VoiceCloning.swift)."""
        self.voices[name] = np.asarray(embedding, np.float32)[: self.cfg.spk_dim]

    def synthesize(self, text: str, voice: Optional[str] = None, seed: int = 0,
                   **kwargs) -> AudioChunk:
        ids = (self.tokenizer.encode(text) if self.tokenizer
               else [3 + (ord(c) % 64) for c in text])[:256]
        n = len(ids)
        bucket = max(16, ((n + 15) // 16) * 16)
        arr = np.zeros(bucket, np.int32)
        arr[:n] = ids
        tokens, n_tok = self._llm(self.params, text_ids=jnp.asarray(arr),
                                  n_valid=jnp.asarray(n, jnp.int32),
                                  key=jax.random.PRNGKey(seed))
        n_tok = int(n_tok)
        if n_tok == 0:
            return AudioChunk(np.zeros(0, np.float32), self.cfg.sample_rate)
        spk = self.voices.get(voice or "", np.zeros(self.cfg.spk_dim, np.float32))
        frame_tokens = jnp.repeat(tokens[:n_tok], self.cfg.token_mel_ratio)
        mel = self._flow(self.params["dit"], tokens=frame_tokens,
                         spk=jnp.asarray(spk), key=jax.random.PRNGKey(seed + 1))
        wav = self._vocoder(self.params["hifigan"], mel=mel)
        return AudioChunk(np.asarray(wav, np.float32), self.cfg.sample_rate)

    def synthesize_stream(self, text: str, voice: Optional[str] = None, seed: int = 0,
                          chunk_tokens: int = 30, left_context: int = 10, **kwargs):
        """Chunked streaming synthesis (reference: CosyVoice streaming —
        the flow DiT runs over a sliding token window with left context;
        only the new region's mel is vocoded and emitted)."""
        ids = (self.tokenizer.encode(text) if self.tokenizer
               else [3 + (ord(c) % 64) for c in text])[:256]
        n = len(ids)
        bucket = max(16, ((n + 15) // 16) * 16)
        arr = np.zeros(bucket, np.int32)
        arr[:n] = ids
        tokens, n_tok = self._llm(self.params, text_ids=jnp.asarray(arr),
                                  n_valid=jnp.asarray(n, jnp.int32),
                                  key=jax.random.PRNGKey(seed))
        n_tok = int(n_tok)
        if n_tok == 0:
            return
        spk = self.voices.get(voice or "", np.zeros(self.cfg.spk_dim, np.float32))
        tokens = np.asarray(tokens[:n_tok])
        r = self.cfg.token_mel_ratio
        emitted = 0
        while emitted < n_tok:
            ctx = min(left_context, emitted)
            window = tokens[emitted - ctx: min(emitted + chunk_tokens, n_tok)]
            frame_tokens = jnp.repeat(jnp.asarray(window), r)
            mel = self._flow(self.params["dit"], tokens=frame_tokens,
                             spk=jnp.asarray(spk), key=jax.random.PRNGKey(seed + 1 + emitted))
            wav = np.asarray(self._vocoder(self.params["hifigan"], mel=mel), np.float32)
            yield AudioChunk(wav[ctx * r * self.cfg.hop:], self.cfg.sample_rate)
            emitted += len(window) - ctx

    def synthesize_dialogue(self, script: str, voices: Optional[Dict[str, str]] = None,
                            gap_s: float = 0.3, **kw) -> AudioChunk:
        """Multi-speaker dialogue synthesis (reference: DialogueSynthesizer)."""
        pieces = []
        gap = np.zeros(int(gap_s * self.cfg.sample_rate), np.float32)
        for speaker, line in parse_dialogue(script):
            voice = (voices or {}).get(speaker, speaker if speaker in self.voices else None)
            chunk = self.synthesize(line, voice=voice, **kw)
            pieces.extend([chunk.samples, gap])
        samples = np.concatenate(pieces) if pieces else np.zeros(0, np.float32)
        return AudioChunk(samples, self.cfg.sample_rate)

    def warm_up(self) -> None:
        self.synthesize("hi")

    def unload(self) -> None:
        self.params = None
        self._loaded = False

    @property
    def is_loaded(self) -> bool:
        return self._loaded

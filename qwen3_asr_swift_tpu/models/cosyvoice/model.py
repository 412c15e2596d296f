"""CosyVoice3 TTS: Qwen2.5 LLM → flow-matching DiT → HiFT vocoder.

TPU-native implementation of the reference's CosyVoice module
(reference: Sources/CosyVoiceTTS/CosyVoiceTTS.swift:32-348, LLM.swift,
FlowMatching.swift, DiT.swift:384-480, HiFiGAN.swift:635-869,
VoiceCloning.swift, DialogueSynthesizer.swift). Three stages:

1. Qwen2.5-0.5B LM emits FSQ speech tokens (vocab 6561 + 200 control rows;
   sos/eos/task_id/fill at 6561..6564) from the prompt
   ``[sos, text…, task_id, (prompt speech tokens…)]`` with nucleus
   (top-k 25 / top-p 0.8) + repetition-aware sampling and min/max
   token-text-ratio guards — all inside one ``lax.while_loop``
   (reference: LLM.swift:56-140, 267-470; Configuration.swift:5-41).
2. The 22-layer AdaLN-Zero DiT integrates a CFG Euler ODE (10 steps,
   cosine schedule) from noise to 80-mel at 50 Hz (dit.py).
3. The HiFT neural-source-filter vocoder renders 24 kHz audio (hift.py).

Voice cloning follows the upstream zero-shot recipe: a CAM++ 192-d
x-vector conditions the flow, and optional reference FSQ codes + mel
anchor the LM prompt and the DiT ``cond`` slot.

Multi-speaker dialogue scripts ("A: hi") are parsed and synthesized
per-turn (reference DialogueSynthesizer).
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
from ...ops.attention import NEG_INF
from ...ops.nn import init_linear, linear, rms_norm
from ...ops.qwen2 import qwen2_decoder_layer
from .dit import (CosyDiTConfig, CosyFlowConfig, flow_config_tiny, flow_generate,
                  init_flow_params)
from .hift import CosyHiFTConfig, hift_config_tiny, hift_generate, init_hift_params


@dataclasses.dataclass(frozen=True)
class CosyVoiceConfig:
    # LLM (Qwen2.5-0.5B — reference: Configuration.swift:5-41)
    hidden_size: int = 896
    num_layers: int = 24
    num_heads: int = 14
    num_kv_heads: int = 2
    head_dim: int = 64
    intermediate_size: int = 4864
    text_vocab: int = 151936
    speech_token_size: int = 6561     # FSQ codes
    speech_token_extra: int = 200     # control rows appended to the codes
    rope_theta: float = 1e6
    rms_norm_eps: float = 1e-6
    # sampling (reference: CosyVoiceSamplingConfig)
    top_k: int = 25
    top_p: float = 0.8
    ras_win_size: int = 10
    ras_tau_r: float = 0.1
    min_token_text_ratio: float = 2.0
    max_token_text_ratio: float = 20.0
    max_tokens: int = 500
    # stages
    flow: CosyFlowConfig = dataclasses.field(default_factory=CosyFlowConfig)
    hift: CosyHiFTConfig = dataclasses.field(default_factory=CosyHiFTConfig)
    sample_rate: int = 24000

    @property
    def speech_vocab(self) -> int:
        return self.speech_token_size + self.speech_token_extra

    @property
    def sos_token(self) -> int:
        return self.speech_token_size

    @property
    def eos_token(self) -> int:
        return self.speech_token_size + 1

    @property
    def task_id_token(self) -> int:
        return self.speech_token_size + 2

    @property
    def fill_token(self) -> int:
        return self.speech_token_size + 3

    @property
    def stop_tokens(self) -> Tuple[int, ...]:
        """sos/eos/task all end generation (reference: Configuration.swift:29-39)."""
        return (self.speech_token_size, self.speech_token_size + 1,
                self.speech_token_size + 2)


CONFIG_05B = CosyVoiceConfig()


def config_tiny() -> CosyVoiceConfig:
    return CosyVoiceConfig(
        hidden_size=32, num_layers=2, num_heads=2, num_kv_heads=1, head_dim=16,
        intermediate_size=64, text_vocab=300, speech_token_size=40,
        speech_token_extra=8, max_tokens=8,
        flow=flow_config_tiny(), hift=hift_config_tiny(), sample_rate=24000)


def init_cosyvoice_params(key, cfg: CosyVoiceConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 6 + cfg.num_layers)
    h = cfg.hidden_size
    params = {
        "text_embed": (jax.random.normal(ks[0], (cfg.text_vocab, h)) * 0.02).astype(dtype),
        "speech_embed": (jax.random.normal(ks[1], (cfg.speech_vocab, h)) * 0.02).astype(dtype),
        "speech_head": init_linear(ks[2], h, cfg.speech_vocab, bias=True, dtype=dtype),
        "norm": {"weight": jnp.ones((h,), dtype)},
        "layers": [],
        "flow": init_flow_params(ks[3], cfg.flow, dtype),
        "hift": init_hift_params(ks[4], cfg.hift, dtype),
    }
    hd = cfg.head_dim
    for i in range(cfg.num_layers):
        k = jax.random.split(ks[6 + i], 7)
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
    return params


# -- stage 1: LLM speech-token generation ------------------------------------

def _nucleus_sample(lg, key, cfg: CosyVoiceConfig):
    """top-k → top-p (keep while cum−p ≤ top_p, top-1 always) → Gumbel-max
    (reference: LLM.swift nucleusSample :14-50)."""
    vocab = lg.shape[-1]
    if 0 < cfg.top_k < vocab:
        kth = jax.lax.top_k(lg, cfg.top_k)[0][..., -1]
        lg = jnp.where(lg < kth, NEG_INF, lg)
    if cfg.top_p < 1.0:
        order = jnp.argsort(-lg)
        probs = jax.nn.softmax(lg)
        sp = jnp.take(probs, order)
        keep_sorted = (jnp.cumsum(sp) - sp) <= cfg.top_p
        keep = jnp.zeros((vocab,), bool).at[order].set(keep_sorted)
        lg = jnp.where(keep, lg, NEG_INF)
    g = jax.random.gumbel(key, lg.shape, dtype=jnp.float32)
    return jnp.argmax(lg + g, axis=-1).astype(jnp.int32)


def _sample_token(lg, key, window, cfg: CosyVoiceConfig, ignore_eos):
    """Full reference sampler: suppress post-stop rows, optional stop-token
    masking below min length, nucleus sample, then repetition-aware
    resampling if the candidate already fills the recent window
    (reference: LLM.swift:56-140)."""
    vocab = lg.shape[-1]
    idx = jnp.arange(vocab)
    # suppress fill/padding rows (stop tokens stay live)
    lg = jnp.where(idx >= cfg.fill_token, NEG_INF, lg)
    stop_mask = jnp.zeros((vocab,), bool)
    for st in cfg.stop_tokens:
        stop_mask = stop_mask | (idx == st)
    lg = jnp.where(ignore_eos & stop_mask, NEG_INF, lg)

    k1, k2 = jax.random.split(key)
    tok = _nucleus_sample(lg, k1, cfg)

    rep = jnp.sum(window == tok)
    threshold = max(int(cfg.ras_win_size * cfg.ras_tau_r), 1)
    resample_lg = jnp.where(idx == tok, NEG_INF, lg)
    g = jax.random.gumbel(k2, lg.shape, dtype=jnp.float32)
    tok_resampled = jnp.argmax(resample_lg + g, axis=-1).astype(jnp.int32)
    return jnp.where(rep >= threshold, tok_resampled, tok)


def llm_generate_tokens(params, cfg: CosyVoiceConfig, text_ids, n_valid, key,
                        max_tokens: int, prompt_speech=None, n_prompt=None):
    """Generate FSQ speech tokens for a text prompt.

    text_ids: [T_bucket] right-padded text ids; n_valid: scalar count.
    prompt_speech: optional [P_bucket] FSQ codes for zero-shot cloning
    (n_prompt valid). Prompt layout [sos, text…, task_id, prompt…]
    (reference: LLM.swift:370-412). Returns (tokens [max_tokens], n).
    """
    b = 1
    t_bucket = text_ids.shape[0]
    p_bucket = 0 if prompt_speech is None else prompt_speech.shape[0]
    if n_prompt is None:
        n_prompt = jnp.asarray(0, jnp.int32)
    prefix_len = t_bucket + 2 + p_bucket
    max_len = prefix_len + max_tokens

    # --- build prefix embeddings: sos at 0, text at 1..n, task at n+1,
    # prompt speech right after --- all via static gathers + masks.
    h = cfg.hidden_size
    pos_idx = jnp.arange(prefix_len)
    text_part = jnp.take(params["text_embed"], text_ids, axis=0)         # [Tb, h]
    sos = jnp.take(params["speech_embed"], jnp.asarray(cfg.sos_token), axis=0)
    task = jnp.take(params["speech_embed"], jnp.asarray(cfg.task_id_token), axis=0)
    emb = jnp.zeros((prefix_len, h), text_part.dtype)
    emb = emb.at[0].set(sos)
    emb = emb.at[1:1 + t_bucket].set(text_part)
    # overwrite the slot right after the last valid text token with task_id
    emb = jax.lax.dynamic_update_slice_in_dim(emb, task[None], 1 + n_valid, axis=0)
    valid = (pos_idx == 0) | ((pos_idx >= 1) & (pos_idx <= n_valid)) | (pos_idx == 1 + n_valid)
    if prompt_speech is not None:
        sp_emb = jnp.take(params["speech_embed"], prompt_speech, axis=0)  # [Pb, h]
        # place prompt speech embeds at positions n_valid+2 .. n_valid+1+n_prompt
        shift = jnp.arange(p_bucket)
        target = 2 + n_valid + shift
        emb = emb.at[target].set(jnp.where((shift < n_prompt)[:, None], sp_emb, emb[target]))
        valid = valid | ((pos_idx >= 2 + n_valid) & (pos_idx < 2 + n_valid + n_prompt))
    n_prefix = 2 + n_valid + n_prompt
    embeds = emb[None]

    caches = [
        (jnp.zeros((b, cfg.num_kv_heads, max_len, cfg.head_dim), jnp.float32),
         jnp.zeros((b, cfg.num_kv_heads, max_len, cfg.head_dim), jnp.float32))
        for _ in range(cfg.num_layers)
    ]

    def forward(embeds, positions, caches, start, key_valid, mask_rows=None):
        """``positions`` are SEMANTIC (RoPE) positions; the causal mask
        compares cache SLOT indices, which diverge from semantic positions
        once bucket padding leaves gaps in the prefix — ``mask_rows``
        supplies the slot row (defaults to positions, correct for the
        prefill where slot == position)."""
        x = embeds
        new_caches = []
        cols = jnp.arange(max_len)[None, None, None, :]
        rows = (positions if mask_rows is None else mask_rows)[:, None, :, None]
        mask = jnp.where((cols <= rows) & key_valid[None, None, None, :], 0.0, NEG_INF).astype(jnp.float32)
        for p, (kc, vc) in zip(params["layers"], caches):
            x, kc, vc = qwen2_decoder_layer(
                p, x, positions, mask, num_heads=cfg.num_heads,
                num_kv_heads=cfg.num_kv_heads, head_dim=cfg.head_dim,
                rope_theta=cfg.rope_theta, rms_norm_eps=cfg.rms_norm_eps,
                kc=kc, vc=vc, start=start)
            new_caches.append((kc, vc))
        return rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps), new_caches

    positions = jnp.arange(prefix_len)[None]
    prefix_valid = jnp.concatenate([valid, jnp.zeros((max_tokens,), bool)])
    hidden, caches = forward(embeds, positions, caches, jnp.asarray(0, jnp.int32),
                             prefix_valid)
    # NOTE: padded prefix rows don't contaminate valid rows (masked keys), and
    # the last valid row sits at n_prefix-1 only when the prompt is contiguous
    # — with bucketed text the task/prompt slots were placed contiguously above.
    logits = linear(hidden[jnp.arange(b), n_prefix - 1], params["speech_head"]).astype(jnp.float32)[0]

    min_len = jnp.ceil(n_valid.astype(jnp.float32) * cfg.min_token_text_ratio).astype(jnp.int32)
    max_len_dyn = jnp.minimum(
        jnp.asarray(max_tokens, jnp.int32),
        (n_valid.astype(jnp.float32) * cfg.max_token_text_ratio).astype(jnp.int32) + 1)

    eos = cfg.eos_token
    out = jnp.full((max_tokens,), eos, jnp.int32)
    window0 = jnp.full((cfg.ras_win_size,), -1, jnp.int32)

    key, k0 = jax.random.split(key)
    tok = _sample_token(logits, k0, window0, cfg, ignore_eos=min_len > 0)
    stop_arr = jnp.asarray(cfg.stop_tokens, jnp.int32)
    is_stop0 = jnp.any(tok == stop_arr)
    out = out.at[0].set(jnp.where(is_stop0, eos, tok))
    window0 = window0.at[0].set(tok)

    def cond(s):
        step, _, _, done, _, _, _ = s
        return (step < max_len_dyn) & ~done

    def body(s):
        step, out, caches, done, tok, window, key = s
        emb = jnp.take(params["speech_embed"], tok[None], axis=0)[None]
        pos = (n_prefix + step - 1)[None, None]
        idx = jnp.arange(max_len)
        kv_valid = prefix_valid | ((idx >= prefix_len) & (idx < prefix_len + step))
        # mask rows are the SLOT being written (prefix_len + step - 1), not
        # the semantic position — with bucket-padded prefixes the semantic
        # position is smaller and would mask out the newest generated
        # tokens including the current one
        slot = (prefix_len + step - 1)[None, None] if hasattr(prefix_len, "shape") \
            else jnp.asarray(prefix_len + step - 1)[None, None]
        hidden, caches = forward(emb, pos, caches, prefix_len + step - 1, kv_valid,
                                 mask_rows=slot)
        logits = linear(hidden[:, 0], params["speech_head"]).astype(jnp.float32)[0]
        key, kk = jax.random.split(key)
        tok = _sample_token(logits, kk, window, cfg, ignore_eos=step < min_len)
        is_stop = jnp.any(tok == stop_arr)
        out = out.at[step].set(jnp.where(done | is_stop, out[step], tok))
        window = window.at[step % cfg.ras_win_size].set(tok)
        done = done | is_stop
        return step + 1, out, caches, done, tok, window, key

    state = (jnp.asarray(1, jnp.int32), out, caches, is_stop0, tok, window0, key)
    _, out, _, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    n = jnp.sum(out != eos)
    return out, n


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


@dataclasses.dataclass
class Voice:
    """A registered cloning voice: CAM++ x-vector + optional ICL prompt."""
    embedding: np.ndarray                      # [192]
    prompt_tokens: Optional[np.ndarray] = None  # [P] FSQ codes of ref audio
    prompt_feat: Optional[np.ndarray] = None    # [P*ratio, 80] ref mel


class CosyVoiceTTS(SpeechGenerationModel):
    def __init__(self, cfg: CosyVoiceConfig, params, tokenizer=None, dtype=jnp.float32):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
        self.voices: Dict[str, Voice] = {}
        self._loaded = True
        self._llm = jax.jit(functools.partial(llm_generate_tokens, cfg=cfg,
                                              max_tokens=cfg.max_tokens))
        self._flow = jax.jit(functools.partial(flow_generate, cfg=cfg.flow))
        self._hift = jax.jit(functools.partial(hift_generate, cfg=cfg.hift))

    @classmethod
    def init_random(cls, cfg: Optional[CosyVoiceConfig] = None, seed: int = 0, **kw) -> "CosyVoiceTTS":
        cfg = cfg or config_tiny()
        return cls(cfg, init_cosyvoice_params(jax.random.PRNGKey(seed), cfg), **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "FunAudioLLM/CosyVoice3-0.5B", cache_dir=None,
                        offline_mode: bool = False, dtype=jnp.float32, **kw) -> "CosyVoiceTTS":
        """Load converted weights (convert.py maps the upstream llm/flow/hift
        checkpoints into the canonical tree; reference load:
        CosyVoiceTTS.swift:88-101 + WeightLoading.swift)."""
        from ...core.hub import download_weights
        from ...tokenizers.bpe import BPETokenizer
        from .convert import load_or_convert

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode)
        params = load_or_convert(model_dir)
        tokenizer = None
        try:
            tokenizer = BPETokenizer.from_pretrained_dir(model_dir)
        except FileNotFoundError:
            pass
        return cls(CONFIG_05B, params, tokenizer=tokenizer, dtype=dtype, **kw)

    def register_voice(self, name: str, embedding: np.ndarray,
                       prompt_tokens=None, prompt_feat=None) -> None:
        """Voice cloning: register a CAM++ x-vector and optionally the
        reference clip's FSQ codes + flow-mel for zero-shot ICL cloning
        (reference: VoiceCloning.swift)."""
        self.voices[name] = Voice(
            np.asarray(embedding, np.float32)[: self.cfg.flow.spk_embed_dim],
            None if prompt_tokens is None else np.asarray(prompt_tokens, np.int32),
            None if prompt_feat is None else np.asarray(prompt_feat, np.float32))

    def clone_voice(self, name: str, audio: np.ndarray, sample_rate: int = 16000,
                    speaker_model=None) -> None:
        """Embed reference audio with CAM++ and register it as a cloning
        voice (reference: VoiceCloning.swift — CamPlusPlusSpeaker.embed →
        flow spk conditioning).  Pass a loaded ``CampPlusSpeaker`` (or any
        object with ``.embed``); defaults to downloading the published
        CAM++ checkpoint."""
        if speaker_model is None:
            from ..speaker.campplus import CampPlusSpeaker

            speaker_model = CampPlusSpeaker.from_pretrained()
        emb = speaker_model.embed(np.asarray(audio, np.float32), sample_rate)
        self.register_voice(name, emb)

    # -- internals -------------------------------------------------------------

    def _encode_text(self, text: str) -> np.ndarray:
        ids = (self.tokenizer.encode(text) if self.tokenizer
               else [3 + (ord(c) % 64) for c in text])[:256]
        return np.asarray(ids, np.int32)

    def _generate_tokens(self, text: str, voice: Optional[Voice], seed: int):
        ids = self._encode_text(text)
        n = len(ids)
        bucket = max(16, ((n + 15) // 16) * 16)
        arr = np.zeros(bucket, np.int32)
        arr[:n] = ids
        kw = {}
        if voice is not None and voice.prompt_tokens is not None:
            p = voice.prompt_tokens
            pb = max(16, ((len(p) + 15) // 16) * 16)
            parr = np.zeros(pb, np.int32)
            parr[:len(p)] = p
            kw = dict(prompt_speech=jnp.asarray(parr),
                      n_prompt=jnp.asarray(len(p), jnp.int32))
        tokens, n_tok = self._llm(self.params, text_ids=jnp.asarray(arr),
                                  n_valid=jnp.asarray(n, jnp.int32),
                                  key=jax.random.PRNGKey(seed), **kw)
        return np.asarray(tokens), int(n_tok)

    def _tokens_to_wav(self, tokens: np.ndarray, voice: Optional[Voice], seed: int) -> np.ndarray:
        """flow → mel → vocoder, with token-bucket padding (pad = repeat of
        the last valid token so the 3-frame pre-lookahead sees speech, not
        garbage); outputs sliced to the exact sample count."""
        cfgf = self.cfg.flow
        n_tok = len(tokens)
        bucket = max(8, ((n_tok + 7) // 8) * 8)
        padded = np.concatenate([tokens, np.full(bucket - n_tok, tokens[-1], np.int32)])
        kw = {}
        prompt_mel_frames = 0
        if voice is not None:
            kw["spk_embedding"] = jnp.asarray(voice.embedding)[None]
            if voice.prompt_tokens is not None and voice.prompt_feat is not None:
                kw["prompt_tokens"] = jnp.asarray(voice.prompt_tokens)[None]
                kw["prompt_feat"] = jnp.asarray(voice.prompt_feat)[None]
                prompt_mel_frames = voice.prompt_feat.shape[0]
        mel = self._flow(self.params["flow"], tokens=jnp.asarray(padded)[None],
                         key=jax.random.PRNGKey(seed + 1), **kw)
        # Drop the prompt-mel prefix but keep the bucketed tail so the
        # vocoder jits once per bucket; the wav is sliced to the exact count.
        mel = mel[:, prompt_mel_frames:prompt_mel_frames + bucket * cfgf.token_mel_ratio]
        wav = self._hift(self.params["hift"], mel=mel, key=jax.random.PRNGKey(seed + 2))
        n_samples = n_tok * cfgf.token_mel_ratio * self.cfg.hift.samples_per_frame
        return np.asarray(wav[0][:n_samples], np.float32)

    # -- public API --------------------------------------------------------------

    def synthesize(self, text: str, voice: Optional[str] = None, seed: int = 0,
                   **kwargs) -> AudioChunk:
        v = self.voices.get(voice or "")
        tokens, n_tok = self._generate_tokens(text, v, seed)
        if n_tok == 0:
            return AudioChunk(np.zeros(0, np.float32), self.cfg.sample_rate)
        wav = self._tokens_to_wav(tokens[:n_tok], v, seed)
        return AudioChunk(wav, self.cfg.sample_rate)

    def synthesize_stream(self, text: str, voice: Optional[str] = None, seed: int = 0,
                          chunk_tokens: int = 30, left_context: int = 10, **kwargs):
        """Chunked streaming synthesis (reference: CosyVoice streaming): the
        flow runs over a sliding token window with left context; only the
        new region's samples are emitted. Chunk boundaries re-anchor the
        ODE on the shared left-context tokens, so overlapping frames are
        re-synthesized with fresh context — streamed audio matches offline
        semantically (same tokens, same voice), not bit-exactly."""
        v = self.voices.get(voice or "")
        tokens, n_tok = self._generate_tokens(text, v, seed)
        if n_tok == 0:
            return
        tokens = tokens[:n_tok]
        r = self.cfg.flow.token_mel_ratio
        spf = self.cfg.hift.samples_per_frame
        emitted = 0
        while emitted < n_tok:
            ctx = min(left_context, emitted)
            window = tokens[emitted - ctx: min(emitted + chunk_tokens, n_tok)]
            wav = self._tokens_to_wav(window, v, seed)
            yield AudioChunk(wav[ctx * r * spf:], self.cfg.sample_rate)
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

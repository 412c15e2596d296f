"""VibeVoice Realtime TTS — split Qwen2 LM + diffusion head + σ-VAE.

The published Realtime-0.5B topology (reference:
Sources/VibeVoiceTTS/Models/VibeVoiceStreamModel.swift:90-300,
VibeVoiceTTSModel.swift, Constants.swift:13-19):

- A 24-layer Qwen2 backbone split into ``language_model`` (bottom 4
  layers, no final norm) and ``tts_language_model`` (top 20 layers +
  norm); text flows bottom→top with a per-position input-type embedding
  (1 = text, 0 = speech).
- Per frame the TTS LM hidden state conditions (a) the AdaLN diffusion
  head sampled with DPM-Solver++ 2M + CFG against a parallel NEGATIVE
  stream (prompt = the single negative-text token 151655) and (b) a
  binary EOS classifier (fc1→ReLU→fc2→σ > 0.5).
- Latents map to the σ-VAE decoder space via
  ``latent / speech_scaling_factor − speech_bias_factor`` and decode to
  24 kHz audio (tokenizer.py).
- Voice cloning mints REAL σ-VAE encoder latents from reference audio
  (reference ``vibevoice-encode-voice``); long-form carries true tail
  latents in memory across text chunks.

TPU shape: prefill (both streams) + the whole frame loop (LM step →
unrolled K-step DPM solve → EOS check) is ONE jitted program over a
``lax.while_loop``; audio decodes afterwards in bucketed causal chunks.
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core import AudioChunk, SpeechGenerationModel
from ...ops.attention import NEG_INF
from ...ops.nn import init_linear, linear, rms_norm
from ...ops.qwen2 import qwen2_decoder_layer
from .diffusion import (DiffusionConfig, diffusion_config_tiny, dpm_solve,
                        init_diffusion_params)
from .tokenizer import (TokenizerConfig, decode_chunked, encode, init_tokenizer_params,
                        tokenizer_config_tiny)

NEGATIVE_TEXT_ID = 151655
SPEECH_START_ID = 151652
SPEECH_END_ID = 151653
SPEECH_DIFFUSION_ID = 151654

#: reference: VibeVoiceTTSModel.systemPromptVibeVoice (the upstream
#: processor's system prompt; encoded with BOS)
SYSTEM_PROMPT = (" Transform the text provided by various speakers into "
                 "speech output, utilizing the distinct voice of each "
                 "respective speaker.\n")


@dataclasses.dataclass(frozen=True)
class VibeVoiceConfig:
    hidden_size: int = 896          # Realtime-0.5B Qwen2 backbone
    num_layers: int = 24
    tts_backbone_layers: int = 20   # top layers form the TTS LM
    num_heads: int = 14
    num_kv_heads: int = 2
    head_dim: int = 64
    intermediate_size: int = 4864
    vocab_size: int = 151936
    rope_theta: float = 1e6
    rms_norm_eps: float = 1e-6
    diffusion: DiffusionConfig = dataclasses.field(default_factory=DiffusionConfig)
    tokenizer: TokenizerConfig = dataclasses.field(default_factory=TokenizerConfig)
    sample_rate: int = 24000
    max_frames: int = 750
    negative_text_id: int = NEGATIVE_TEXT_ID
    speech_start_id: int = SPEECH_START_ID
    speech_end_id: int = SPEECH_END_ID
    speech_diffusion_id: int = SPEECH_DIFFUSION_ID

    @property
    def lm_layers(self) -> int:
        return self.num_layers - self.tts_backbone_layers

    @property
    def latent_dim(self) -> int:
        return self.diffusion.latent_size

    @property
    def vae_upsample(self) -> int:
        return self.tokenizer.total_ratio


CONFIG_05B = VibeVoiceConfig()


def config_tiny() -> VibeVoiceConfig:
    tok = tokenizer_config_tiny()
    diff = dataclasses.replace(diffusion_config_tiny(), latent_size=tok.vae_dim,
                               hidden_size=32)
    return VibeVoiceConfig(
        hidden_size=32, num_layers=3, tts_backbone_layers=2, num_heads=2,
        num_kv_heads=1, head_dim=16, intermediate_size=64, vocab_size=300,
        diffusion=diff, tokenizer=tok, max_frames=8, negative_text_id=299,
        speech_start_id=296, speech_end_id=297, speech_diffusion_id=298)


def _qwen2_layer_init(key, cfg: VibeVoiceConfig, dtype):
    k = jax.random.split(key, 7)
    h, hd = cfg.hidden_size, cfg.head_dim
    return {
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
    }


def init_vibevoice_params(key, cfg: VibeVoiceConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 10 + cfg.num_layers)
    h = cfg.hidden_size
    params = {
        "embed_tokens": (jax.random.normal(ks[0], (cfg.vocab_size, h)) * 0.02).astype(dtype),
        "tts_input_types": (jax.random.normal(ks[1], (2, h)) * 0.02).astype(dtype),
        "lm_layers": [_qwen2_layer_init(ks[10 + i], cfg, dtype)
                      for i in range(cfg.lm_layers)],
        "tts_layers": [_qwen2_layer_init(ks[10 + cfg.lm_layers + i], cfg, dtype)
                       for i in range(cfg.tts_backbone_layers)],
        "tts_norm": {"weight": jnp.ones((h,), dtype)},
        "acoustic_connector": {
            "fc1": init_linear(ks[2], cfg.latent_dim, h, dtype=dtype),
            "norm": {"weight": jnp.ones((h,), dtype)},
            "fc2": init_linear(ks[3], h, h, dtype=dtype),
        },
        "eos_classifier": {
            "fc1": init_linear(ks[4], h, h, dtype=dtype),
            "fc2": init_linear(ks[5], h, 1, dtype=dtype),
        },
        "prediction_head": init_diffusion_params(ks[6], cfg.diffusion, dtype),
        "acoustic_tokenizer": init_tokenizer_params(ks[7], cfg.tokenizer, dtype),
        "speech_scaling_factor": jnp.asarray(1.0, jnp.float32),
        "speech_bias_factor": jnp.asarray(0.0, jnp.float32),
    }
    return params


def acoustic_connect(p, latent):
    """SpeechConnector: fc1 → RMSNorm → fc2 (reference:
    VibeVoiceStreamModel.swift:7-25)."""
    x = linear(latent, p["fc1"])
    x = rms_norm(x, p["norm"]["weight"], 1e-6)
    return linear(x, p["fc2"])


def eos_probability(p, hidden):
    h = jax.nn.relu(linear(hidden, p["fc1"]))
    return jax.nn.sigmoid(linear(h, p["fc2"]).astype(jnp.float32))


def _layer_forward(lp, x, positions, mask, cfg, kc=None, vc=None, start=None):
    """One Qwen2 layer; if kc/vc given, write K/V at ``start`` and attend
    over the cache, else self-attend within x."""
    return qwen2_decoder_layer(
        lp, x, positions, mask, num_heads=cfg.num_heads,
        num_kv_heads=cfg.num_kv_heads, head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta, rms_norm_eps=cfg.rms_norm_eps,
        kc=kc, vc=vc, start=start)


def lm_forward(p, cfg: VibeVoiceConfig, embeds, valid):
    """Bottom ``lm_layers`` over a self-contained prompt (no cache kept —
    text is processed once; reference forwardLM, applyFinalNorm=false)."""
    b, t, _ = embeds.shape
    positions = (jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1) * valid
    rows = jnp.arange(t)[None, :, None]
    cols = jnp.arange(t)[None, None, :]
    mask = jnp.where((cols <= rows) & valid[:, None, :], 0.0, NEG_INF).astype(jnp.float32)[:, None]
    x = embeds
    for lp in p["lm_layers"]:
        x, _, _ = _layer_forward(lp, x, positions, mask, cfg)
    return x  # NO final norm


def generate_frames(p, cfg: VibeVoiceConfig, ids, valid, type_ids, voice_latents,
                    audio_start, key, max_frames: int, num_inference_steps: int,
                    cfg_scale: float):
    """Full jitted generation: dual-stream prefill + frame while_loop.

    ids: [T_bucket] the STRUCTURED prompt (system | " Speaker 0:"
    <speech_start> vae* <speech_end> "\n" | " Text input:\n Speaker
    0:{text}\n" | " Speech output:\n" <speech_start> — the reference's
    exact layout, VibeVoiceTTSModel.swift:439-471), with the vae
    placeholder block at ``audio_start``; ``valid`` and ``type_ids``
    (text=1 / speech=0 per position) are host-built [T_bucket] arrays.
    voice_latents [V_bucket, latent] overwrite the placeholder block's
    embeddings, and the MERGED sequence runs through the base LM before
    the type embeds + TTS backbone (reference :476-494).
    Returns (latents [max_frames, latent], n_frames).
    """
    b = 1
    t_bucket = ids.shape[0]
    v_bucket = voice_latents.shape[0]
    prefix_len = t_bucket
    max_len = prefix_len + max_frames
    dtype = p["embed_tokens"].dtype

    # ---- positive stream prefill ----
    valid = valid[None]
    embeds = jnp.take(p["embed_tokens"], ids, axis=0)[None]
    if v_bucket:
        voice_embeds = acoustic_connect(p["acoustic_connector"],
                                        voice_latents.astype(dtype))[None]
        embeds = jax.lax.dynamic_update_slice(
            embeds, voice_embeds.astype(embeds.dtype),
            (jnp.asarray(0, jnp.int32), audio_start, jnp.asarray(0, jnp.int32)))
    lm_hidden = lm_forward(p, cfg, embeds, valid)
    embeds = lm_hidden + jnp.take(p["tts_input_types"], type_ids, axis=0)[None]

    positions = (jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1) * valid
    n_prefix = jnp.sum(valid.astype(jnp.int32))

    caches = [
        (jnp.zeros((b, cfg.num_kv_heads, max_len, cfg.head_dim), jnp.float32),
         jnp.zeros((b, cfg.num_kv_heads, max_len, cfg.head_dim), jnp.float32))
        for _ in range(cfg.tts_backbone_layers)
    ]
    rows = positions[:, None, :, None]
    cols_pos = jnp.concatenate([positions[0], jnp.zeros((max_frames,), jnp.int32)])
    prefix_valid = jnp.concatenate([valid[0], jnp.zeros((max_frames,), bool)])
    mask = jnp.where((cols_pos[None, None, None, :] <= rows) &
                     prefix_valid[None, None, None, :], 0.0, NEG_INF).astype(jnp.float32)
    x = embeds
    new_caches = []
    for lp, (kc, vc) in zip(p["tts_layers"], caches):
        x, kc, vc = _layer_forward(lp, x, positions, mask, cfg, kc, vc,
                                   jnp.asarray(0, jnp.int32))
        new_caches.append((kc, vc))
    caches = new_caches
    x = rms_norm(x, p["tts_norm"]["weight"], cfg.rms_norm_eps)
    # last valid position (padding sits inside the prefix; gather explicitly)
    last_idx = jnp.argmax(positions[0] * valid[0].astype(jnp.int32))
    hidden = x[:, last_idx]

    # ---- negative stream prefill (single negative-text token) ----
    neg_ids = jnp.asarray([[cfg.negative_text_id]], jnp.int32)
    neg_embeds = jnp.take(p["embed_tokens"], neg_ids[0], axis=0)[None]
    neg_valid = jnp.ones((1, 1), bool)
    neg_lm_hidden = lm_forward(p, cfg, neg_embeds, neg_valid)
    neg_embeds = neg_lm_hidden + p["tts_input_types"][1][None, None]
    neg_max = 1 + max_frames
    neg_caches = [
        (jnp.zeros((b, cfg.num_kv_heads, neg_max, cfg.head_dim), jnp.float32),
         jnp.zeros((b, cfg.num_kv_heads, neg_max, cfg.head_dim), jnp.float32))
        for _ in range(cfg.tts_backbone_layers)
    ]
    neg_mask = jnp.where(jnp.arange(neg_max)[None, None, None, :] < 1, 0.0,
                         NEG_INF).astype(jnp.float32)
    xn = neg_embeds
    new_neg = []
    for lp, (kc, vc) in zip(p["tts_layers"], neg_caches):
        xn, kc, vc = _layer_forward(lp, xn, jnp.zeros((1, 1), jnp.int32), neg_mask,
                                    cfg, kc, vc, jnp.asarray(0, jnp.int32))
        new_neg.append((kc, vc))
    neg_caches = new_neg
    neg_hidden = rms_norm(xn, p["tts_norm"]["weight"], cfg.rms_norm_eps)[:, 0]

    latents_out = jnp.zeros((max_frames, cfg.latent_dim), jnp.float32)
    type0 = p["tts_input_types"][0][None, None]

    def cond_fn(s):
        step, _, _, _, _, _, done, _ = s
        return (step < max_frames) & ~done

    def body(s):
        step, latents_out, caches, neg_caches, hidden, neg_hidden, done, key = s
        key, kd = jax.random.split(key)
        latent = dpm_solve(p["prediction_head"], cfg.diffusion, hidden, kd,
                           neg_condition=neg_hidden,
                           num_inference_steps=num_inference_steps,
                           cfg_scale=cfg_scale)                       # [1, D]
        latents_out = latents_out.at[step].set(latent[0])
        emb = acoustic_connect(p["acoustic_connector"], latent.astype(dtype))[:, None] + type0

        # positive stream step
        pos = (n_prefix + step)[None, None]
        idx = jnp.arange(max_len)
        kv_valid = prefix_valid | ((idx >= prefix_len) & (idx < prefix_len + step + 1))
        m = jnp.where(kv_valid, 0.0, NEG_INF).astype(jnp.float32)[None, None, None, :]
        xs = emb
        nc = []
        for lp, (kc, vc) in zip(p["tts_layers"], caches):
            xs, kc, vc = _layer_forward(lp, xs, pos, m, cfg, kc, vc, prefix_len + step)
            nc.append((kc, vc))
        hidden = rms_norm(xs, p["tts_norm"]["weight"], cfg.rms_norm_eps)[:, 0]

        # negative stream step
        npos = (1 + step)[None, None]
        nidx = jnp.arange(neg_max)
        nm = jnp.where(nidx < 2 + step, 0.0, NEG_INF).astype(jnp.float32)[None, None, None, :]
        xn = emb
        nnc = []
        for lp, (kc, vc) in zip(p["tts_layers"], neg_caches):
            xn, kc, vc = _layer_forward(lp, xn, npos, nm, cfg, kc, vc, 1 + step)
            nnc.append((kc, vc))
        neg_hidden = rms_norm(xn, p["tts_norm"]["weight"], cfg.rms_norm_eps)[:, 0]

        done = eos_probability(p["eos_classifier"], hidden)[0, 0] > 0.5
        return step + 1, latents_out, nc, nnc, hidden, neg_hidden, done, key

    state = (jnp.asarray(0, jnp.int32), latents_out, caches, neg_caches,
             hidden, neg_hidden, jnp.asarray(False), key)
    n_f, latents_out, *_ = jax.lax.while_loop(cond_fn, body, state)
    return latents_out, n_f


class VibeVoiceTTS(SpeechGenerationModel):
    def __init__(self, cfg: VibeVoiceConfig, params, tokenizer=None, dtype=jnp.float32,
                 num_inference_steps: Optional[int] = None, cfg_scale: Optional[float] = None):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
        self.dtype = dtype
        self.num_inference_steps = num_inference_steps or cfg.diffusion.ddpm_num_inference_steps
        self.cfg_scale = cfg.diffusion.cfg_scale if cfg_scale is None else cfg_scale
        self._loaded = True
        self._generate = jax.jit(
            functools.partial(generate_frames, cfg=cfg,
                              num_inference_steps=self.num_inference_steps,
                              cfg_scale=self.cfg_scale),
            static_argnames=("max_frames",))
        self._decode = jax.jit(functools.partial(decode_chunked, cfg=cfg.tokenizer),
                               static_argnames=("chunk", "left_context"))
        self._encode = jax.jit(functools.partial(encode, cfg=cfg.tokenizer))

    @classmethod
    def init_random(cls, cfg: Optional[VibeVoiceConfig] = None, seed: int = 0, **kw) -> "VibeVoiceTTS":
        cfg = cfg or config_tiny()
        return cls(cfg, init_vibevoice_params(jax.random.PRNGKey(seed), cfg), **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "microsoft/VibeVoice-Realtime-0.5B",
                        cache_dir=None, offline_mode: bool = False, dtype=jnp.float32,
                        **kw) -> "VibeVoiceTTS":
        from ...core.hub import download_weights
        from ...tokenizers.bpe import BPETokenizer
        from .convert import convert_checkpoint

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode)
        params = convert_checkpoint(model_dir, CONFIG_05B)
        tokenizer = None
        try:
            tokenizer = BPETokenizer.from_pretrained_dir(model_dir)
        except FileNotFoundError:
            pass
        return cls(CONFIG_05B, params, tokenizer=tokenizer, dtype=dtype, **kw)

    # -- internals ---------------------------------------------------------------

    def _load_voice(self, voice: Optional[str]) -> np.ndarray:
        if voice and Path(voice).exists():
            return np.load(voice)["latents"].astype(np.float32)
        return np.zeros((0, self.cfg.latent_dim), np.float32)

    def _enc(self, s: str):
        return (self.tokenizer.encode(s) if self.tokenizer
                else [3 + (ord(c) % 64) for c in s])

    def _build_prompt(self, text: str, v_bucket: int, n_voice: int):
        """The reference's structured prompt (VibeVoiceTTSModel.swift:
        439-471): system | speaker exemplar with the speech delimiters
        around the vae placeholder block | text input | speech-output cue
        | <speech_start>. Returns (ids, valid, type_ids, audio_start)."""
        cfg = self.cfg
        pre = list(self._enc(SYSTEM_PROMPT))
        if v_bucket:
            pre += self._enc(" Speaker 0:") + [cfg.speech_start_id]
        audio_start = len(pre)
        mid = [cfg.speech_diffusion_id] * v_bucket
        post = ([cfg.speech_end_id] + self._enc("\n")) if v_bucket else []
        post += self._enc(f" Text input:\n Speaker 0:{text}\n")
        post += self._enc(" Speech output:\n") + [cfg.speech_start_id]
        ids = np.asarray(pre + mid + post, np.int32)
        valid = np.ones(len(ids), bool)
        valid[audio_start + n_voice : audio_start + v_bucket] = False
        type_ids = np.ones(len(ids), np.int32)         # text = 1
        type_ids[audio_start : audio_start + v_bucket] = 0  # speech = 0
        return ids, valid, type_ids, audio_start

    def _run(self, text: str, voice_latents: np.ndarray, max_frames: int, seed: int):
        v = len(voice_latents)
        v_bucket = 0 if v == 0 else max(8, ((v + 7) // 8) * 8)
        vl = np.zeros((v_bucket, self.cfg.latent_dim), np.float32)
        vl[:v] = voice_latents[:v_bucket]
        ids, valid, type_ids, a0 = self._build_prompt(text, v_bucket, v)
        n = len(ids)
        bucket = max(16, ((n + 15) // 16) * 16)
        arr = np.zeros(bucket, np.int32)
        arr[:n] = ids
        varr = np.zeros(bucket, bool)
        varr[:n] = valid
        tarr = np.ones(bucket, np.int32)
        tarr[:n] = type_ids
        latents, n_f = self._generate(
            self.params, ids=jnp.asarray(np.minimum(arr, self.cfg.vocab_size - 1)),
            valid=jnp.asarray(varr), type_ids=jnp.asarray(tarr),
            voice_latents=jnp.asarray(vl), audio_start=jnp.asarray(a0, jnp.int32),
            key=jax.random.PRNGKey(seed), max_frames=max_frames)
        return np.asarray(latents), int(n_f)

    def _latents_to_audio(self, lm_latents: np.ndarray) -> np.ndarray:
        """LM-space latents → decoder space → waveform
        (scaled = latent / scale − bias; reference stream loop)."""
        scale = float(self.params["speech_scaling_factor"])
        bias = float(self.params["speech_bias_factor"])
        dec_latents = lm_latents / scale - bias
        n = len(dec_latents)
        bucket = max(8, ((n + 7) // 8) * 8)
        padded = np.zeros((bucket, self.cfg.latent_dim), np.float32)
        padded[:n] = dec_latents
        wav = self._decode(self.params["acoustic_tokenizer"],
                           latents=jnp.asarray(padded)[None])
        return np.asarray(wav[0][: n * self.cfg.vae_upsample], np.float32)

    # -- public API ----------------------------------------------------------------

    def synthesize(self, text: str, voice: Optional[str] = None,
                   max_frames: Optional[int] = None, seed: int = 0, **kwargs) -> AudioChunk:
        voice_latents = self._load_voice(voice)
        latents, n_f = self._run(text, voice_latents, max_frames or self.cfg.max_frames, seed)
        if n_f == 0:
            return AudioChunk(np.zeros(0, np.float32), self.cfg.sample_rate)
        return AudioChunk(self._latents_to_audio(latents[:n_f]), self.cfg.sample_rate)

    def generate_long(self, text: str, voice: Optional[str] = None,
                      max_chars_per_chunk: int = 300, seed: int = 0,
                      carry_frames: int = 8, **kwargs) -> AudioChunk:
        """Long-form synthesis: text chunked on sentence boundaries, each
        chunk conditioned on the TRUE tail latents of the previous chunk
        (in memory — no proxy features, no temp files; reference:
        VibeVoiceTTSModel.swift long-form path)."""
        from ...core.text_chunker import chunk_text

        pieces = chunk_text(text, max_chars=max_chars_per_chunk)
        if not pieces:
            return AudioChunk(np.zeros(0, np.float32), self.cfg.sample_rate)
        waves = []
        carry = self._load_voice(voice)
        max_frames = kwargs.pop("max_frames", None) or self.cfg.max_frames
        for i, piece in enumerate(pieces):
            latents, n_f = self._run(piece, carry, max_frames, seed + i)
            if n_f == 0:
                continue
            lm_latents = latents[:n_f]
            waves.append(self._latents_to_audio(lm_latents))
            carry = lm_latents[-carry_frames:]
        return AudioChunk(np.concatenate(waves) if waves else np.zeros(0, np.float32),
                          self.cfg.sample_rate)

    def encode_voice(self, audio: np.ndarray, transcript: str, output: str) -> Path:
        """Mint a voice cache from reference audio through the REAL σ-VAE
        encoder; stores LM-space latents
        ((mean + bias) · scale — the inverse of the decode mapping)."""
        spf = self.cfg.vae_upsample
        n = max(1, len(audio) // spf) * spf
        padded = np.zeros(n, np.float32)
        padded[: min(len(audio), n)] = audio[:n]
        mean = np.asarray(self._encode(self.params["acoustic_tokenizer"],
                                       audio=jnp.asarray(padded)[None])[0])
        scale = float(self.params["speech_scaling_factor"])
        bias = float(self.params["speech_bias_factor"])
        lm_latents = (mean + bias) * scale
        out = Path(output)
        np.savez(out, latents=lm_latents[:64].astype(np.float32), transcript=transcript)
        return out

    def warm_up(self) -> None:
        self.synthesize("hi", max_frames=2)

    def unload(self) -> None:
        self.params = None
        self._loaded = False

    @property
    def is_loaded(self) -> bool:
        return self._loaded

"""PersonaPlex 7B: Moshi-architecture full-duplex speech-to-speech.

TPU-native re-design of the reference module
(reference: Sources/PersonaPlex/PersonaPlex.swift:51-1318,
TemporalTransformer.swift:185-335, Depformer.swift:187-249,
Configuration.swift:29-123):

- 17 token streams (1 text + 8 user-audio + 8 agent-audio codebooks),
  embedded and SUMMED into the temporal transformer input each 80 ms frame;
- TemporalTransformer: 32 layers, d=4096, RoPE base 1e4, context 3000;
- Depformer: 6 layers, d=1024, with PER-CODEBOOK input-embedding and
  output-head weight banks (the reference's MultiLinear) generating the
  16 agent codebooks sequentially within each frame — implemented as a
  ``lax.scan`` over stacked banks (same shape as Qwen3-TTS's code
  predictor);
- stream delay pattern (Configuration.swift:18, personaplex.md:108-121):
  delays = [0, 0,1,1,1,1,1,1,1, 0,1,1,1,1,1,1,1] — text and the two
  semantic codebooks (user cb0 / agent cb0) at delay 0, acoustic cb1-7 at
  delay 1. Generated tokens are written at the CURRENT position with no
  delay and every step reads position step-1, so the delays only shift
  EXTERNAL inputs: at step t the temporal input sees user cb0 from frame
  t-1 and user cb1-7 from frame t-2 (see ``user_stream_reads``), while
  agent streams always carry the previous step's generated codes;
- 5-phase prefill (PersonaPlex.swift:179-287): voice prompt embeddings |
  0.5 s silence spacer | SentencePiece'd text system prompt | second
  spacer | user audio consumed per-step during generation;
- during the user phase the depformer's user-codebook steps (8-15) are
  forced to the real user tokens (PersonaPlex.swift:432-455); afterwards
  its own user predictions feed back as the user-stream reads;
- silence early-stop: 15 consecutive all-silence agent frames end the
  response (personaplex.md:134), implemented as an on-device counter in
  the ``lax.while_loop`` cond;
- sampling: audio top-k 250 / T 0.8, text top-k 25 / T 0.7, both with
  repetition penalty 1.2 over a 30-token window (audio per codebook;
  batch-respond text history starts after the user phase, realtime's
  covers every frame — Sampling.swift:56-119, PersonaPlex.swift:401,
  459, 1232); optional text-entropy early stop (off by default)
  (reference docs/models/personaplex.md:130-135).

The whole conversation loop (temporal step → text+audio sampling →
depformer completion → delayed ring write) runs inside ``lax.while_loop``.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import AudioChunk, SpeechToSpeechModel
from ...ops.attention import NEG_INF, sdpa
from ...ops.kv_cache import (KVCache, after_prefill, after_token, cache_kv,
                             init_cache, write_prompt, write_token)
from ...ops.nn import init_linear, linear, rms_norm, swiglu_mlp
from ...ops.rope import apply_rope, rope_angles
from .mimi import (MimiConfig, init_mimi_decoder_stream,
                   init_mimi_encoder_stream, init_mimi_params, mimi_decode,
                   mimi_decode_frame, mimi_encode, mimi_encode_frame)
from .mimi import config_tiny as mimi_tiny

#: 440 Hz reference-tone codes fed on the user streams during prompting
#: (reference: Configuration.swift:82)
SINE_TOKENS = (430, 1268, 381, 1611, 1095, 1495, 56, 472)
#: silence codes fed on the agent streams during prompting and matched by
#: the silence early-stop (reference: Configuration.swift:85)
SILENCE_TOKENS = (948, 243, 1178, 546, 1736, 1030, 1978, 2008)
#: "<system> You are a helpful assistant. ..." pre-tokenized with the
#: upstream tokenizer_spm_32k_3.model (reference: Configuration.swift:90)
DEFAULT_SYSTEM_PROMPT_TOKENS = (
    607, 4831, 578, 493, 298, 272, 3850, 5019, 263,
    506, 1292, 2366, 267, 22876, 362, 263, 934, 4831, 578,
)


@dataclasses.dataclass(frozen=True)
class PersonaPlexConfig:
    d_model: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    head_dim: int = 128
    intermediate_size: int = 11264
    rope_theta: float = 1e4
    context: int = 3000
    text_vocab: int = 32001   # sentencepiece + pad
    audio_vocab: int = 2049   # 2048 codes + initial/pad token
    num_codebooks: int = 16   # depformer output
    temporal_codebooks: int = 8  # per side in the temporal input
    dep_d_model: int = 1024
    dep_layers: int = 6
    dep_heads: int = 16
    dep_ff: int = 2816        # depformer gating feed-forward width
    dep_context: int = 8      # depformer attention context (Configuration.swift:154)
    rms_norm_eps: float = 1e-8
    text_pad: int = 3         # silence/pad text token
    audio_pad: int = 2048     # initial audio token
    mimi: MimiConfig = MimiConfig()

    @property
    def num_streams(self) -> int:
        return 1 + 2 * self.temporal_codebooks  # 17

    @property
    def audio_card(self) -> int:
        """Audio head output size: card (2048); the +1 initial token exists
        only in embeddings (Depformer.swift:231)."""
        return self.audio_vocab - 1


CONFIG_7B = PersonaPlexConfig()


def config_tiny() -> PersonaPlexConfig:
    return PersonaPlexConfig(
        d_model=32, num_layers=2, num_heads=2, head_dim=16, intermediate_size=64,
        context=64, text_vocab=64, audio_vocab=2049, num_codebooks=16,
        temporal_codebooks=8, dep_d_model=32, dep_layers=2, dep_heads=2,
        dep_ff=48, mimi=mimi_tiny(),
    )


@dataclasses.dataclass(frozen=True)
class PersonaSampling:
    """reference: docs/models/personaplex.md:130-135."""

    audio_top_k: int = 250
    audio_temperature: float = 0.8
    audio_repetition_penalty: float = 1.2
    text_top_k: int = 25
    text_temperature: float = 0.7
    text_repetition_penalty: float = 1.2
    #: tokens of history the repetition penalties look back over
    #: (Configuration.swift:291 repetitionWindow)
    repetition_window: int = 30
    max_steps: int = 500
    #: stop after this many consecutive all-silence agent frames once the
    #: user audio has been consumed; 0 disables (personaplex.md:134)
    silence_stop_frames: int = 15
    #: stop when text-logit entropy stays below this for
    #: ``entropy_stop_window`` consecutive post-user steps; 0 disables
    #: (the reference's default — Configuration.swift:293)
    entropy_stop_threshold: float = 0.0
    entropy_stop_window: int = 10


def init_personaplex_params(key, cfg: PersonaPlexConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 12 + cfg.num_layers + cfg.dep_layers)
    d = cfg.d_model
    params = {
        "text_embed": (jax.random.normal(ks[0], (cfg.text_vocab, d)) * 0.02).astype(dtype),
        # user + agent audio stream embeddings: [2*K, audio_vocab, d]
        "audio_embed": (jax.random.normal(ks[1], (2 * cfg.temporal_codebooks, cfg.audio_vocab, d)) * 0.02).astype(dtype),
        "text_head": init_linear(ks[2], d, cfg.text_vocab, bias=False, dtype=dtype),
        "norm": {"weight": jnp.ones((d,), dtype)},
        "layers": [],
        # depformer (reference: Depformer.swift:187-237 — every projection
        # is a per-step MultiLinear weight bank, stored here [steps, in, out])
        "dep_in": (jax.random.normal(ks[3], (cfg.num_codebooks, d, cfg.dep_d_model)) * 0.02).astype(dtype),
        "dep_text_emb": (jax.random.normal(ks[6], (cfg.text_vocab, cfg.dep_d_model)) * 0.02).astype(dtype),
        "dep_embed": (jax.random.normal(ks[4], (cfg.num_codebooks - 1, cfg.audio_vocab, cfg.dep_d_model)) * 0.02).astype(dtype),
        "dep_heads_bank": (jax.random.normal(ks[5], (cfg.num_codebooks, cfg.dep_d_model, cfg.audio_card)) * 0.02).astype(dtype),
        "dep_layers": [],
    }
    hd = cfg.head_dim
    for i in range(cfg.num_layers):
        k = jax.random.split(ks[12 + i], 7)
        params["layers"].append({
            "input_layernorm": {"weight": jnp.ones((d,), dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((d,), dtype)},
            "q_proj": init_linear(k[0], d, cfg.num_heads * hd, bias=False, dtype=dtype),
            "k_proj": init_linear(k[1], d, cfg.num_heads * hd, bias=False, dtype=dtype),
            "v_proj": init_linear(k[2], d, cfg.num_heads * hd, bias=False, dtype=dtype),
            "o_proj": init_linear(k[3], cfg.num_heads * hd, d, bias=False, dtype=dtype),
            "mlp": {
                "gate_proj": init_linear(k[4], d, cfg.intermediate_size, bias=False, dtype=dtype),
                "up_proj": init_linear(k[5], d, cfg.intermediate_size, bias=False, dtype=dtype),
                "down_proj": init_linear(k[6], cfg.intermediate_size, d, bias=False, dtype=dtype),
            },
        })
    dd = cfg.dep_d_model
    s = cfg.num_codebooks
    for i in range(cfg.dep_layers):
        k = jax.random.split(ks[12 + cfg.num_layers + i], 4)
        scale = 0.02
        params["dep_layers"].append({
            "norm1": {"weight": jnp.ones((dd,), dtype)},
            "norm2": {"weight": jnp.ones((dd,), dtype)},
            # per-step banks: QKV packed [S, dd, 3dd], out [S, dd, dd],
            # gated FFN in [S, dd, 2ff] (gate | value halves), out [S, ff, dd]
            "in_proj": (jax.random.normal(k[0], (s, dd, 3 * dd)) * scale).astype(dtype),
            "out_proj": (jax.random.normal(k[1], (s, dd, dd)) * scale).astype(dtype),
            "gating_in": (jax.random.normal(k[2], (s, dd, 2 * cfg.dep_ff)) * scale).astype(dtype),
            "gating_out": (jax.random.normal(k[3], (s, cfg.dep_ff, dd)) * scale).astype(dtype),
        })
    return params


def fuse_temporal_params(params) -> dict:
    """Fuse q/k/v → "qkv_proj" and gate/up → "gate_up_proj" in every
    temporal layer (exact output-row concat — ops.nn.fuse_qkv_gate_up).
    The 80 ms frame step is a batch-1 GEMV chain where per-call fixed cost
    dominates; fusing drops 7 projections per layer to 4. Only valid
    replicated/unsharded — shard() unfuses for the per-projection TP
    rules. No-op on already-fused trees."""
    from ...ops.nn import fuse_qkv_gate_up

    return fuse_qkv_gate_up(params)


def unfuse_temporal_params(params, cfg: PersonaPlexConfig) -> dict:
    """Exact inverse of :func:`fuse_temporal_params` (output-row slices)."""
    from ...ops.nn import unfuse_qkv_gate_up

    d = cfg.num_heads * cfg.head_dim
    return unfuse_qkv_gate_up(params, d, d)


def embed_frame(params, cfg: PersonaPlexConfig, text_tok, user_codes, agent_codes):
    """Sum the 17 stream embeddings for one frame.
    text_tok: [B]; user_codes, agent_codes: [B, K]. Negative audio codes
    contribute zero (the reference masks -1 inputs to zero,
    PersonaPlex.swift:381-388). → [B, d]."""
    e = jnp.take(params["text_embed"], jnp.maximum(text_tok, 0), axis=0)
    k = cfg.temporal_codebooks

    def gather(stream_idx, code):
        emb = jnp.take(params["audio_embed"][stream_idx], jnp.maximum(code, 0), axis=0)
        return jnp.where((code >= 0)[..., None], emb, 0)

    user = jax.vmap(gather, in_axes=(0, 1), out_axes=1)(jnp.arange(k), user_codes)  # [B,K,d]
    agent = jax.vmap(gather, in_axes=(0, 1), out_axes=1)(jnp.arange(k, 2 * k), agent_codes)
    return e + user.sum(axis=1) + agent.sum(axis=1)


def user_stream_reads(user_codes, pred_user_prev, step, user_frames, k):
    """User-stream values the temporal input reads at generation step
    ``step`` (cache position ``step-1``), honoring the published delay
    pattern (Configuration.swift:18): user cb0 has delay 0 — position p
    holds frame p — and cb1-7 have delay 1 — position p holds frame p-1.
    Before the user audio (p<0 / p<1) the positions hold the prompt
    phases' sine tokens; after it (p >= user_frames) the generation loop
    has overwritten them with the depformer's own user predictions
    (written at the current position with NO delay,
    PersonaPlex.swift:471-503).

    user_codes: [B, >=k, T]; pred_user_prev: [B, k] (previous step's
    depformer user-bank output); step: traced int. → [B, k]."""
    sine = jnp.asarray(SINE_TOKENS[:k], jnp.int32)
    p = step - 1
    real_cb0 = user_codes[:, 0, jnp.clip(p, 0, user_frames - 1)]
    real_ac = user_codes[:, 1:k, jnp.clip(p - 1, 0, user_frames - 1)]
    cb0 = jnp.where(p < 0, sine[0],
                    jnp.where(p < user_frames, real_cb0, pred_user_prev[:, 0]))
    ac = jnp.where(p < 1, sine[1:][None],
                   jnp.where(p < user_frames, real_ac, pred_user_prev[:, 1:]))
    return jnp.concatenate([cb0[:, None], ac], axis=1)


def depformer_provided_tokens(user_codes, step, user_frames, cfg: PersonaPlexConfig):
    """Teacher-forced depformer tokens for generation step ``step``: during
    the user phase the user-codebook steps (8-15) are forced to the REAL
    user tokens at the current target position (cb0 = frame step, cb1-7 =
    frame step-1 via their delay; PersonaPlex.swift:432-455); -1 = sample.
    → [B, num_codebooks]."""
    k = cfg.temporal_codebooks
    b = user_codes.shape[0]
    sine = jnp.asarray(SINE_TOKENS[:k], jnp.int32)
    cb0 = user_codes[:, 0, jnp.clip(step, 0, user_frames - 1)]
    ac = jnp.where(step < 1, sine[1:][None],
                   user_codes[:, 1:k, jnp.clip(step - 1, 0, user_frames - 1)])
    user_bank = jnp.concatenate([cb0[:, None], ac], axis=1)
    user_bank = jnp.where(step < user_frames, user_bank, -1)
    agent_bank = jnp.full((b, cfg.num_codebooks - k), -1, jnp.int32)
    return jnp.concatenate([agent_bank, user_bank], axis=1)


def _temporal_layer(p, x, positions, mask, cache_layer, cfg, decode, cursor=None):
    b, t, _ = x.shape
    hd = cfg.head_dim
    h = rms_norm(x, p["input_layernorm"]["weight"], cfg.rms_norm_eps)
    if "qkv_proj" in p:  # fused projection (fuse_temporal_params)
        qkv = linear(h, p["qkv_proj"]).reshape(b, t, 3, cfg.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    else:
        q = linear(h, p["q_proj"]).reshape(b, t, cfg.num_heads, hd)
        k = linear(h, p["k_proj"]).reshape(b, t, cfg.num_heads, hd)
        v = linear(h, p["v_proj"]).reshape(b, t, cfg.num_heads, hd)
    cos, sin = rope_angles(positions, hd, cfg.rope_theta)
    cos, sin = cos[:, None], sin[:, None]
    q = apply_rope(q.transpose(0, 2, 1, 3), cos, sin)
    k = apply_rope(k.transpose(0, 2, 1, 3), cos, sin)
    v = v.transpose(0, 2, 1, 3)
    if decode:
        updated = write_token(cache_layer, k, v, cursor)
        # cache_kv dequantizes int8 caches (the convert+scale fuses into
        # the attention dots, so HBM reads stay 1 B/elt); fp passthrough
        ck, cv = cache_kv(updated, k.dtype)
        attn = sdpa(q, ck, cv, 1.0 / np.sqrt(hd), mask)
    else:
        updated = write_prompt(cache_layer, k, v)
        attn = sdpa(q, k, v, 1.0 / np.sqrt(hd), mask)
    x = x + linear(attn.transpose(0, 2, 1, 3).reshape(b, t, -1), p["o_proj"])
    h2 = rms_norm(x, p["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
    return x + swiglu_mlp(h2, p["mlp"]), updated


def temporal_prefill(params, cfg, embeds, valid, cache: KVCache):
    b, t, _ = embeds.shape
    positions = (jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1) * valid
    rows = jnp.arange(t)[None, :, None]
    cols = jnp.arange(t)[None, None, :]
    mask = jnp.where((cols <= rows) & valid[:, None, :], 0.0, NEG_INF).astype(jnp.float32)[:, None]
    x = embeds
    new_layers = []
    for p in params["layers"]:
        x, upd = _temporal_layer(p, x, positions, mask, cache.layers[len(new_layers)], cfg, False)
        new_layers.append(upd)
    x = rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps)
    return x, after_prefill(cache, new_layers, valid, t)


def temporal_step(params, cfg, embeds, cache: KVCache):
    b = embeds.shape[0]
    positions = cache.positions[:, None]
    written = jnp.arange(cache.max_len)[None, :] == cache.cursor
    mask = jnp.where(cache.valid | written, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]
    x = embeds
    new_layers = []
    for p in params["layers"]:
        x, upd = _temporal_layer(p, x, positions, mask, cache.layers[len(new_layers)], cfg,
                                 True, cache.cursor)
        new_layers.append(upd)
    x = rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps)
    return x[:, 0], after_token(cache, new_layers)


def _sample_topk(logits, key, top_k: int, temperature: float,
                 history=None, penalty: float = 1.0):
    """Top-k Gumbel-max sampling with an optional repetition penalty over
    ``history`` [B, W] (out-of-range entries are inactive): logits of
    in-history tokens divide by ``penalty`` when positive and multiply
    when negative, BEFORE the top-k cut (reference:
    Sampling.swift:56-86 sampleTopKWithPenalty)."""
    lg = logits.astype(jnp.float32)
    if history is not None and penalty != 1.0:
        from ...ops.sampling import apply_repetition_penalty

        # negative slots → out-of-range so the scatter drops them (the
        # shared op wraps negatives numpy-style otherwise)
        safe = jnp.where(history < 0, lg.shape[-1], history)
        lg = apply_repetition_penalty(lg, safe, safe.shape[-1], penalty)
    if top_k > 0:
        top = min(top_k, lg.shape[-1])
        kth = jax.lax.top_k(lg, top)[0][..., -1:]
        lg = jnp.where(lg < kth, NEG_INF, lg)
    if temperature > 0:
        lg = lg / temperature + jax.random.gumbel(key, lg.shape, dtype=jnp.float32)
    return jnp.argmax(lg, axis=-1).astype(jnp.int32)


def _depformer_step(params, cfg: PersonaPlexConfig, x, step, k_caches, v_caches):
    """One depformer forward (t=1) at codebook position ``step``: per-step
    MultiLinear banks, ``dep_context``-window attention with no positional
    encoding, gated-SiLU FFN (reference: Depformer.swift:187-249)."""
    b = x.shape[0]
    dd, nh = cfg.dep_d_model, cfg.dep_heads
    dh = dd // nh
    s_total = cfg.num_codebooks
    cols = jnp.arange(s_total)[None, None, None, :]
    mask = jnp.where((cols <= step) & (cols > step - cfg.dep_context),
                     0.0, NEG_INF).astype(jnp.float32)
    for li, p in enumerate(params["dep_layers"]):
        h = rms_norm(x, p["norm1"]["weight"], cfg.rms_norm_eps)
        qkv = jnp.einsum("bti,io->bto", h, p["in_proj"][step]).reshape(b, 1, 3, nh, dh)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        kk = qkv[:, :, 1].transpose(0, 2, 1, 3)
        vv = qkv[:, :, 2].transpose(0, 2, 1, 3)
        k_caches = k_caches.at[li].set(jax.lax.dynamic_update_slice_in_dim(
            k_caches[li], kk.astype(k_caches.dtype), step, axis=2))
        v_caches = v_caches.at[li].set(jax.lax.dynamic_update_slice_in_dim(
            v_caches[li], vv.astype(v_caches.dtype), step, axis=2))
        attn = sdpa(q, k_caches[li], v_caches[li], 1.0 / np.sqrt(dh), mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, dd)
        x = x + jnp.einsum("bti,io->bto", attn, p["out_proj"][step])
        h2 = rms_norm(x, p["norm2"]["weight"], cfg.rms_norm_eps)
        gv = jnp.einsum("bti,io->bto", h2, p["gating_in"][step])
        gate, value = jnp.split(gv, 2, axis=-1)
        x = x + jnp.einsum("bti,io->bto", jax.nn.silu(gate) * value,
                           p["gating_out"][step])
    return x, k_caches, v_caches


def depformer_generate(params, cfg: PersonaPlexConfig, temporal_hidden, text_token,
                       key, sampling: PersonaSampling, provided=None, history=None):
    """Generate 16 agent codebooks for one frame
    (reference: Depformer.swift:249-296). Step k input =
    ``dep_in[k](temporal_hidden) + emb(prev_token)`` where prev is the
    sampled TEXT token at k=0 (dep_text_emb) and the previous audio code
    after; every layer projection is a per-step weight bank; attention has
    no positional encoding and a ``dep_context``-step window; heads apply
    directly on the hidden state (no final norm).

    ``provided``: optional [B, 16] teacher-forced tokens (-1 = sample) —
    the reference forces user-codebook steps to real user audio during the
    user phase so the in-frame autoregressive chain sees real codes
    (PersonaPlex.swift:432-455).

    ``history``: optional [B, 16, W] per-codebook recent generated tokens
    (out-of-range = empty slot) — each codebook's sampling applies
    ``sampling.audio_repetition_penalty`` over its own row (reference:
    PersonaPlex.swift:455-467 feeds agentTokens[cbIdx].suffix(window)).

    temporal_hidden: [B, d_model]; text_token: [B] → codes [B, 16]."""
    b = temporal_hidden.shape[0]
    dd, nl, nh = cfg.dep_d_model, cfg.dep_layers, cfg.dep_heads
    dh = dd // nh
    s_total = cfg.num_codebooks
    dtype = temporal_hidden.dtype

    k_caches = jnp.zeros((nl, b, nh, s_total, dh), dtype)
    v_caches = jnp.zeros_like(k_caches)

    def forward(x, step, k_caches, v_caches):
        return _depformer_step(params, cfg, x, step, k_caches, v_caches)

    def step_input(step, prev_emb):
        cond = jnp.einsum("bi,io->bo", temporal_hidden, params["dep_in"][step])
        return (cond + prev_emb)[:, None].astype(dtype)

    if provided is None:
        provided = jnp.full((b, cfg.num_codebooks), -1, jnp.int32)

    def force(step, sampled):
        tok = provided[:, step]
        return jnp.where(tok >= 0, tok, sampled)

    def cb_hist(step):
        if history is None:
            return None
        return jnp.take(history, step, axis=1)  # [B, W]

    def sample(logits, k, step):
        return _sample_topk(logits, k, sampling.audio_top_k,
                            sampling.audio_temperature, history=cb_hist(step),
                            penalty=sampling.audio_repetition_penalty)

    # step 0: conditioned on the sampled text token
    zero = jnp.asarray(0, jnp.int32)
    x0 = step_input(zero, jnp.take(params["dep_text_emb"], text_token, axis=0))
    h0, k_caches, v_caches = forward(x0, zero, k_caches, v_caches)
    key, k0 = jax.random.split(key)
    code = force(zero, sample(h0[:, 0] @ params["dep_heads_bank"][0], k0, zero))

    def body(carry, cb_idx):
        code_prev, k_caches, v_caches, key = carry
        emb = jnp.take(params["dep_embed"][cb_idx - 1], code_prev, axis=0)
        x, k_caches, v_caches = forward(step_input(cb_idx, emb), cb_idx,
                                        k_caches, v_caches)
        key, kk = jax.random.split(key)
        code_next = force(cb_idx, sample(x[:, 0] @ params["dep_heads_bank"][cb_idx],
                                         kk, cb_idx))
        return (code_next, k_caches, v_caches, key), code_prev

    (last, _, _, _), prev = jax.lax.scan(
        body, (code, k_caches, v_caches, key),
        jnp.arange(1, cfg.num_codebooks, dtype=jnp.int32))
    return jnp.concatenate([prev.T, last[:, None]], axis=1)  # [B, 16]


def depformer_forward_logits(params, cfg: PersonaPlexConfig, temporal_hidden,
                             text_token, audio_tokens):
    """Teacher-forced depformer logits for parity testing: step k's input is
    the GIVEN previous token (text at k=0, audio_tokens[k-1] after), and the
    per-step logits are returned instead of sampled — the oracle surface
    pinned against transformers' MoshiDepthDecoder
    (tests/test_personaplex_convert.py). → [B, num_codebooks, audio_card]."""
    b = temporal_hidden.shape[0]
    dd, nl, nh = cfg.dep_d_model, cfg.dep_layers, cfg.dep_heads
    dh = dd // nh
    s_total = cfg.num_codebooks
    dtype = temporal_hidden.dtype

    k_caches = jnp.zeros((nl, b, nh, s_total, dh), dtype)
    v_caches = jnp.zeros_like(k_caches)

    logits = []
    prev_emb = jnp.take(params["dep_text_emb"], text_token, axis=0)
    for step in range(s_total):
        st = jnp.asarray(step, jnp.int32)
        cond = jnp.einsum("bi,io->bo", temporal_hidden, params["dep_in"][step])
        x = (cond + prev_emb)[:, None].astype(dtype)
        x, k_caches, v_caches = _depformer_step(params, cfg, x, st,
                                                k_caches, v_caches)
        logits.append(x[:, 0] @ params["dep_heads_bank"][step])
        if step < s_total - 1:
            prev_emb = jnp.take(params["dep_embed"][step], audio_tokens[:, step], axis=0)
    return jnp.stack(logits, axis=1)


class PersonaPlex(SpeechToSpeechModel):
    def __init__(self, cfg: PersonaPlexConfig, params, mimi_params, tokenizer=None,
                 dtype=jnp.bfloat16):
        self.cfg = cfg
        self.tokenizer = tokenizer  # SentencePieceModel for text stream
        #: text stream of the last respond()/respond_diagnostic() call
        self.last_text_tokens: Optional[np.ndarray] = None
        self.last_transcript: Optional[str] = None
        from ...ops.quant import cast_tree

        # cast preserves packed quantized tensors (uint32 codes + fp32
        # group scales); q/k/v and gate/up fuse for the batch-1 GEMV frame
        # step — shard() unfuses for TP partition rules. Fuse BEFORE the
        # device cast so the chip never holds fused+unfused copies at once
        # (the int8 7B leaves <4 GB HBM headroom).
        self.params = cast_tree(fuse_temporal_params(params), dtype)
        self.mimi_params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), mimi_params)
        self.dtype = dtype
        #: snapshot directory (set by from_pretrained) — named voice presets
        self.model_dir: Optional[str] = None
        self._loaded = True

        self._mimi_encode = jax.jit(functools.partial(mimi_encode, cfg=cfg.mimi))
        self._mimi_decode = jax.jit(functools.partial(mimi_decode, cfg=cfg.mimi))

        @jax.jit
        def _embed_voice_codes(p, codes):
            """agent-stream code prefix [1, 16, T] → temporal-input
            embeddings [1, T, d]. During the voice phase the text stream
            carries PAD and the user streams the sine reference tone
            (PersonaPlex.swift:184-199)."""
            k = cfg.temporal_codebooks
            sine = jnp.asarray(SINE_TOKENS[:k], jnp.int32)[None]

            def one(t):
                return embed_frame(p, cfg, jnp.full((1,), cfg.text_pad, jnp.int32),
                                   sine, codes[:, :k, t])

            return jax.vmap(one, out_axes=1)(jnp.arange(codes.shape[2]))

        self._embed_voice_codes = _embed_voice_codes

        @functools.partial(jax.jit,
                           static_argnames=("user_frames", "max_steps", "sampling", "diag"))
        def _converse(p, user_codes, voice_embeds, n_voice, prompt_reads, n_prompt,
                      key, *, user_frames, max_steps, sampling: PersonaSampling,
                      diag: bool = False):
            """user_codes: [1, 16, user_frames]; voice_embeds [1, V_cap, d]
            precomputed temporal-input embeddings for the voice-prompt
            prefix with n_voice valid frames; prompt_reads [1, 17, P_cap]
            the per-step READ tokens of the non-voice prompt phases
            (silence spacer | text system prompt | spacer — built by
            ``_prompt_reads`` with the per-stream delays and the voice
            delay-ring overlay baked in; PersonaPlex.swift:179-342) with
            n_prompt valid steps. Returns (agent codes [1, 16, max_steps],
            n_steps [1] actually generated before silence early-stop,
            per-step diagnostics dict when ``diag`` — the reference's
            respondDiagnostic capture, PersonaPlex.swift:1307-1318)."""
            b = 1
            k = cfg.temporal_codebooks
            # size the KV cache to exactly what this conversation can touch
            # (voice cap + prompt cap + generation budget — well under the
            # model's 3000-frame context for any realistic max_steps)
            cache_len = voice_embeds.shape[1] + prompt_reads.shape[2] + max_steps
            cache = init_cache(cfg.num_layers, b, cfg.num_heads, cache_len, cfg.head_dim, self.dtype)

            agent_out = jnp.full((b, cfg.num_codebooks, max_steps), cfg.audio_pad, jnp.int32)
            silence = jnp.asarray(SILENCE_TOKENS[:k], jnp.int32)
            # repetition-penalty window (PersonaPlex.swift:401,459): audio
            # history = the last W generated agent frames per codebook
            # (agent_out's pad init is out-of-range for the audio card, so
            # unwritten slots never penalize); text history = post-user
            # sampled text tokens only (allTextTokens accumulates from
            # prefillLen on)
            rep_w = min(sampling.repetition_window, max_steps)
            use_audio_hist = rep_w > 0 and sampling.audio_repetition_penalty != 1.0

            def body(s):
                (step, cache, agent_prev, pred_user_prev, text_prev, agent_out,
                 run, ent_run, text_hist, n_steps, key, dstats) = s
                user_read = user_stream_reads(user_codes, pred_user_prev, step,
                                              user_frames, k)
                # agent streams: generated codes are written at the current
                # position with no delay, so every read sees the previous
                # step's codes for ALL agent codebooks
                embeds = embed_frame(p, cfg, text_prev, user_read,
                                     agent_prev)[:, None].astype(self.dtype)
                hidden, cache = temporal_step(p, cfg, embeds, cache)
                key, kt, kd = jax.random.split(key, 3)
                text_logits = linear(hidden, p["text_head"])
                use_text_hist = rep_w > 0 and sampling.text_repetition_penalty != 1.0
                text_tok = _sample_topk(text_logits, kt,
                                        sampling.text_top_k, sampling.text_temperature,
                                        history=text_hist if use_text_hist else None,
                                        penalty=sampling.text_repetition_penalty)
                provided = depformer_provided_tokens(user_codes, step, user_frames, cfg)
                audio_hist = jax.lax.dynamic_slice(
                    agent_out, (0, 0, step - rep_w),
                    (b, cfg.num_codebooks, rep_w)) if use_audio_hist else None
                codes = depformer_generate(p, cfg, hidden, text_tok, kd, sampling,
                                           provided=provided, history=audio_hist)
                agent_out = agent_out.at[:, :, step].set(codes)
                counted = step >= user_frames
                text_hist = jnp.where(
                    counted, jnp.concatenate([text_hist[:, 1:], text_tok[:, None]], axis=1),
                    text_hist)
                # silence early-stop counter (post-user steps only)
                is_sil = jnp.all(codes[:, :k] == silence[None], axis=1)  # [B]
                run = jnp.where(counted & is_sil, run + 1,
                                jnp.where(counted, 0, run))
                stopped = (run >= sampling.silence_stop_frames) if sampling.silence_stop_frames > 0 else jnp.zeros((b,), bool)
                entropy_stop = (sampling.entropy_stop_threshold > 0
                                and sampling.entropy_stop_window > 0)
                if diag or entropy_stop:
                    lp = jax.nn.log_softmax(text_logits.astype(jnp.float32))
                    ent = -(jnp.exp(lp) * lp).sum(axis=-1)  # [B]
                if entropy_stop:
                    # text-token-collapse early stop (PersonaPlex.swift:412,
                    # disabled by default): entropy of the text distribution
                    low = ent < sampling.entropy_stop_threshold
                    ent_run = jnp.where(counted & low, ent_run + 1,
                                        jnp.where(counted, 0, ent_run))
                    stopped = stopped | (ent_run >= sampling.entropy_stop_window)
                dstats = dict(dstats,
                              text_tokens=dstats["text_tokens"].at[:, step].set(text_tok))
                if diag:
                    # per-step capture (reference DiagnosticInfo,
                    # PersonaPlex.swift:1309-1315)
                    hf = hidden.astype(jnp.float32)
                    dstats.update(
                        text_top_token=dstats["text_top_token"].at[:, step].set(
                            jnp.argmax(text_logits, -1).astype(jnp.int32)),
                        text_top_logit=dstats["text_top_logit"].at[:, step].set(
                            text_logits.astype(jnp.float32).max(-1)),
                        text_entropy=dstats["text_entropy"].at[:, step].set(ent),
                        hidden_stats=dstats["hidden_stats"].at[:, step].set(
                            jnp.stack([hf.mean(-1), hf.std(-1), hf.min(-1), hf.max(-1)],
                                      axis=-1)),
                    )
                n_steps = jnp.where(stopped & (n_steps >= max_steps), step + 1, n_steps)
                return (step + 1, cache, codes[:, :k], codes[:, k:], text_tok,
                        agent_out, run, ent_run, text_hist, n_steps, key, dstats)

            def cond(s):
                step, n_steps = s[0], s[9]
                return (step < max_steps) & jnp.any(n_steps >= max_steps)

            # 5-phase prefill: voice embeddings | spacer+prompt+spacer reads
            # (user audio is consumed per-step inside the loop, phase 5)
            v_cap = voice_embeds.shape[1]
            p_cap = prompt_reads.shape[2]
            prompt_emb = jax.vmap(
                lambda t: embed_frame(p, cfg, prompt_reads[:, 0, t],
                                      prompt_reads[:, 1 + k:, t],
                                      prompt_reads[:, 1: 1 + k, t]),
                out_axes=1)(jnp.arange(p_cap))
            embeds0 = jnp.concatenate([voice_embeds.astype(self.dtype),
                                       prompt_emb.astype(self.dtype)], axis=1)
            valid0 = jnp.concatenate([jnp.arange(v_cap)[None] < n_voice,
                                      jnp.arange(p_cap)[None] < n_prompt], axis=1)
            _, cache = temporal_prefill(p, cfg, embeds0, valid0, cache)

            # generation-start read state (cache position promptLen-1):
            # text PAD, agent silence, user sine (handled inside
            # user_stream_reads for step 0)
            # sampled text tokens are always captured (the reference's
            # respond returns them for transcript decoding,
            # PersonaPlex.swift:57); the rest only under ``diag``
            dstats0 = {"text_tokens": jnp.zeros((b, max_steps), jnp.int32)}
            if diag:
                dstats0.update(
                    text_top_token=jnp.zeros((b, max_steps), jnp.int32),
                    text_top_logit=jnp.zeros((b, max_steps), jnp.float32),
                    text_entropy=jnp.zeros((b, max_steps), jnp.float32),
                    hidden_stats=jnp.zeros((b, max_steps, 4), jnp.float32),
                )
            state = (jnp.asarray(0, jnp.int32), cache,
                     jnp.broadcast_to(silence[None], (b, k)),
                     jnp.broadcast_to(jnp.asarray(SINE_TOKENS[:k], jnp.int32)[None], (b, k)),
                     jnp.full((b,), cfg.text_pad, jnp.int32),
                     agent_out, jnp.zeros((b,), jnp.int32),
                     jnp.zeros((b,), jnp.int32),
                     # text-history slots init out-of-vocab = no penalty
                     jnp.full((b, max(rep_w, 1)), cfg.text_vocab, jnp.int32),
                     jnp.full((b,), max_steps, jnp.int32), key, dstats0)
            out = jax.lax.while_loop(cond, body, state)
            return out[5], jnp.minimum(out[9], out[0]), out[11]

        self._converse = _converse

    @classmethod
    def init_random(cls, cfg: Optional[PersonaPlexConfig] = None, seed: int = 0,
                    dtype=jnp.float32, quant_bits: Optional[int] = None,
                    **kw) -> "PersonaPlex":
        """``quant_bits`` packs the temporal-stack linears + text head into
        the MLX group-64 format (the reference serves 7B 8-bit — its ~9.5 GB
        footprint analog fits a single 16 GB v5e chip, where bf16 cannot;
        personaplex.md:166-182). Depformer banks and embeddings stay dense."""
        cfg = cfg or config_tiny()
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        params = init_personaplex_params(k1, cfg)
        if quant_bits:
            from ...ops.quant import quantize_tree

            params = quantize_tree(params, quant_bits, embed_keys=())
        return cls(cfg, params, init_mimi_params(k2, cfg.mimi), dtype=dtype, **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "nvidia/personaplex-7b-v1", cache_dir=None,
                        offline_mode: bool = False, dtype=jnp.bfloat16,
                        cfg: Optional[PersonaPlexConfig] = None,
                        quant_bits: Optional[int] = None, **kw) -> "PersonaPlex":
        """Load the upstream split-safetensors layout: ``temporal.safetensors``
        (4-bit MLX-quantized), ``embeddings.safetensors``,
        ``depformer.safetensors``, ``mimi.safetensors``
        (reference: Sources/PersonaPlex/WeightLoading.swift:12-90).

        ``quant_bits`` re-packs the temporal linears + text head to int8/4
        group-64 after conversion — 8-bit fits the 7B on one 16 GB chip
        (the reference's own serving config, personaplex.md:166)."""
        from safetensors import safe_open

        from ...core.hub import download_weights
        from .convert import convert_mimi_tree, convert_moshi_tree, dequantize_state_dict

        cfg = cfg or CONFIG_7B
        model_dir = Path(download_weights(
            model_id, cache_dir=cache_dir, offline_mode=offline_mode,
            additional_patterns=["voices/*", "*.model"]))
        # text-stream SentencePiece tokenizer → agent transcripts
        # (reference loads tokenizer_spm_32k_3.model, PersonaPlex.swift:1643)
        tok_path = model_dir / "tokenizer_spm_32k_3.model"
        if "tokenizer" not in kw and tok_path.exists():
            from ...tokenizers.sentencepiece_model import SentencePieceModel

            kw["tokenizer"] = SentencePieceModel.load(tok_path)

        def read(name):
            path = model_dir / name
            if not path.exists():
                raise FileNotFoundError(f"missing {name} in {model_dir}")
            with safe_open(str(path), framework="np") as f:
                return {k: f.get_tensor(k) for k in f.keys()}

        lm_sd = dequantize_state_dict({**read("temporal.safetensors"),
                                       **read("embeddings.safetensors"),
                                       **read("depformer.safetensors")})
        params = convert_moshi_tree(lm_sd, cfg)
        if quant_bits:
            from ...ops.quant import quantize_tree

            params = quantize_tree(params, quant_bits, embed_keys=())
        mimi_params = convert_mimi_tree(read("mimi.safetensors"), cfg.mimi)
        model = cls(cfg, params, mimi_params, dtype=dtype, **kw)
        model.model_dir = str(model_dir)
        return model

    VOICE_PROMPT_CAP = 32  # frames; fixed so one compiled program serves all prompts
    DELAY_RING = 4         # maxDelay + 3 (PersonaPlex.swift:210)
    PROMPT_CAP = 64        # spacer+text+spacer steps; fixed for one compiled program

    #: upstream voice preset names — voices/<name>.safetensors in the
    #: snapshot (reference: PersonaPlexVoice, Configuration.swift:313-321)
    VOICES = tuple(f"NAT{g}{i}" for g in "FM" for i in range(4)) + \
             tuple(f"VAR{g}{i}" for g in "FM" for i in range(5))

    @property
    def available_voices(self) -> list:
        """Voice presets with a file present in the loaded snapshot
        (empty for random-weight models with no snapshot dir)."""
        d = getattr(self, "model_dir", None)
        if d is None:
            return []
        voices_dir = Path(d) / "voices"
        return sorted(p.stem for p in voices_dir.glob("*.safetensors")) \
            if voices_dir.is_dir() else []

    def voice(self, name: str) -> dict:
        """Load a named voice preset from the snapshot's ``voices/`` dir
        (the reference's `voice: .NATM0` selection,
        PersonaPlex.swift:131-146). ``respond(voice_prompt="NATM0")``
        resolves through here."""
        d = getattr(self, "model_dir", None)
        if d is None:
            raise ValueError("no snapshot directory — named voices need "
                             "from_pretrained(); pass a voice dict instead")
        path = Path(d) / "voices" / f"{name}.safetensors"
        if not path.exists():
            raise FileNotFoundError(
                f"voice {name!r} not in snapshot; available: "
                f"{self.available_voices or self.VOICES}")
        return self.load_voice_prompt(str(path))

    def make_voice_prompt(self, audio: np.ndarray, sample_rate: int = 24000,
                          path: Optional[str] = None) -> dict:
        """Reference audio → voice prompt in the upstream format
        (reference: voice .safetensors with ``embeddings`` [T, 1, 1, d]
        temporal-input embeddings + ``cache`` [1, 17, 4] delay-ring token
        snapshot, PersonaPlex.swift:131-223). The embeddings carry the
        voice audio on the agent stream (text/user streams padded)."""
        cfg = self.cfg
        sr = cfg.mimi.sample_rate
        if sample_rate != sr:
            from ...audio.resample import resample

            audio = resample(np.asarray(audio, np.float32), sample_rate, sr)
        spf = cfg.mimi.samples_per_frame
        n = max(1, -(-len(audio) // spf))  # ceil: pad the tail to a whole frame
        audio = np.pad(audio, (0, n * spf - len(audio)))[: n * spf]
        codes = np.asarray(self._mimi_encode(self.mimi_params,
                                             audio=jnp.asarray(audio, jnp.float32)[None]))
        codes = codes[:, :, : self.VOICE_PROMPT_CAP]
        embeds = np.asarray(self._embed_voice_codes(self.params, jnp.asarray(codes)))  # [1,T,d]
        ring = self._build_voice_ring(codes[0], codes.shape[2])
        out = {"embeddings": embeds.transpose(1, 0, 2)[:, :, None].astype(np.float32),
               "cache": ring[None].astype(np.float32)}
        if path:
            from safetensors.numpy import save_file

            save_file(out, path)
        return out

    def _build_voice_ring(self, codes: np.ndarray, n_voice: int) -> np.ndarray:
        """Delay-ring token snapshot [17, DELAY_RING] for a locally built
        voice prompt, in the upstream convention that ``_prompt_reads``
        consumes: ring slot ``(p + 1) % RING`` holds the token WRITTEN at
        flat position ``p`` (the +1 is the reference's documented
        offset-after-init-skip mapping, ``tokenCache[flatPos] =
        cache[s, (flatPos + 1) % CT]`` — PersonaPlex.swift:203-223).

        During the voice phase the AGENT streams carry the voice clip's
        first ``k`` codebooks written at their delayed positions (stream
        delay d: position p holds frame p-d), the USER streams carry sine
        tokens and the text stream PAD (PersonaPlex.swift:184-199).

        codes: [>=k, T] Mimi codes of the voice clip."""
        cfg = self.cfg
        k = cfg.temporal_codebooks
        ring = np.full((cfg.num_streams, self.DELAY_RING), cfg.text_pad, np.int32)
        delays = [0, 0] + [1] * (k - 1) + [0] + [1] * (k - 1)
        sine = SINE_TOKENS[:k]
        last = codes.shape[1] - 1
        for s in range(cfg.num_streams):
            d = delays[s]
            for p in range(max(0, n_voice + d - self.DELAY_RING), n_voice + d):
                if s == 0:
                    val = cfg.text_pad
                elif s <= k:  # agent rows: voice codes at delayed positions
                    f = p - d
                    val = int(codes[s - 1, min(max(f, 0), last)]) if f >= 0 else cfg.audio_pad
                else:         # user rows: sine reference tone
                    val = sine[s - 1 - k]
                ring[s, (p + 1) % self.DELAY_RING] = val
        return ring

    @staticmethod
    def load_voice_prompt(path: str) -> dict:
        """Load an upstream-format voice .safetensors (or a legacy .npz code
        prefix, converted lazily at use)."""
        if str(path).endswith(".npz"):
            return {"codes": np.load(path)["codes"]}
        from safetensors import safe_open

        with safe_open(str(path), framework="np") as f:
            return {k: f.get_tensor(k) for k in f.keys()}

    def _voice_inputs(self, voice_prompt):
        """voice_prompt (dict with 'embeddings'+'cache', dict with 'codes',
        raw code array, or None) → (voice_embeds [1, CAP, d], n_voice int,
        ring [17, DELAY_RING] delay-buffer token snapshot or None)."""
        cfg = self.cfg
        cap = self.VOICE_PROMPT_CAP
        d = cfg.d_model
        embeds = np.zeros((1, cap, d), np.float32)
        ring_out = None
        n_voice = 0
        if voice_prompt is None:
            return jnp.asarray(embeds), 0, None
        if isinstance(voice_prompt, str):
            # path-like strings load directly (missing files raise the
            # plain file error); bare names resolve as snapshot presets
            import os

            if (os.sep in voice_prompt or voice_prompt.endswith((".safetensors", ".npz"))):
                voice_prompt = self.load_voice_prompt(voice_prompt)
            else:
                voice_prompt = self.voice(voice_prompt)  # preset name → dict
        vp = voice_prompt if isinstance(voice_prompt, dict) else {"codes": np.asarray(voice_prompt)}
        if "embeddings" in vp:
            e = np.asarray(vp["embeddings"], np.float32)   # [T, 1, 1, d]
            e = e.reshape(e.shape[0], -1)[:, -d:]
            n_voice = min(e.shape[0], cap)
            embeds[0, :n_voice] = e[:n_voice]
            ring = vp.get("cache")
            if ring is not None:
                ring_out = np.asarray(ring, np.float32)[0].astype(np.int32)  # [17, RING]
        else:
            codes = np.asarray(vp["codes"], np.int32)
            n_voice = min(codes.shape[2], cap)
            e = np.asarray(self._embed_voice_codes(self.params,
                                                   jnp.asarray(codes[:, :, :n_voice])))
            embeds[0, :n_voice] = e[0]
            ring_out = self._build_voice_ring(codes[0, :, :n_voice], n_voice)
        if ring_out is not None:
            ring_out[0] = np.clip(ring_out[0], 0, cfg.text_vocab - 1)
            ring_out[1:] = np.clip(ring_out[1:], 0, cfg.audio_vocab - 1)
        return jnp.asarray(embeds), n_voice, ring_out

    def _silence_spacer_frames(self) -> int:
        """0.5 s of frames at the Mimi frame rate (PersonaPlex.swift:154)."""
        return max(1, int(0.5 * self.cfg.mimi.frame_rate))

    def _prompt_tokens(self, system_prompt) -> list:
        """system_prompt: None (built-in default), str (SentencePiece'd via
        the model tokenizer), or a pre-tokenized id sequence."""
        if system_prompt is None:
            toks = list(DEFAULT_SYSTEM_PROMPT_TOKENS)
            if max(toks) >= self.cfg.text_vocab:  # tiny test configs
                toks = []
        elif isinstance(system_prompt, str):
            if self.tokenizer is None:
                raise ValueError("string system_prompt needs the SentencePiece "
                                 "tokenizer; pass token ids instead")
            toks = list(self.tokenizer.encode(system_prompt))
        else:
            toks = [int(t) for t in np.asarray(system_prompt).reshape(-1)]
        budget = self.PROMPT_CAP - 2 * self._silence_spacer_frames()
        if len(toks) > budget:
            from ...core.logging import inference as log

            log.warning(
                "system prompt is %d tokens but only %d fit the compiled "
                "prompt window (PROMPT_CAP=%d minus two %d-frame spacers) — "
                "truncating; raise PersonaPlex.PROMPT_CAP to fit longer prompts",
                len(toks), budget, self.PROMPT_CAP, self._silence_spacer_frames())
        return toks[:budget]

    def _prompt_reads(self, system_prompt, n_voice: int, ring):
        """Build the per-step READ tokens for the non-voice prompt phases
        (silence spacer | text prompt | spacer — PersonaPlex.swift:226-287).

        The prompt phases WRITE each frame's tokens at position
        ``t + delays[stream]`` (text/semantic 0, acoustic 1) and every step
        READS position step-1, so this materializes the write-side token
        cache on the host — including the voice delay-ring overlay at the
        voice boundary (PersonaPlex.swift:203-223) — then shifts by one.
        Returns (reads [17, PROMPT_CAP] int32 with -1 = no audio input,
        n_prompt valid steps)."""
        cfg = self.cfg
        k = cfg.temporal_codebooks
        sf = self._silence_spacer_frames()
        toks = self._prompt_tokens(system_prompt)
        n_text = len(toks)
        prompt_len = n_voice + 2 * sf + n_text
        sil = np.asarray(SILENCE_TOKENS[:k], np.int32)
        sine = np.asarray(SINE_TOKENS[:k], np.int32)

        cache = np.full((cfg.num_streams, prompt_len + 2), -1, np.int32)
        cache[0, :prompt_len] = cfg.text_pad
        ts = n_voice + sf
        cache[0, ts: ts + n_text] = toks
        cache[1, :prompt_len] = sil[0]                       # agent semantic, delay 0
        cache[2: 1 + k, 1: prompt_len + 1] = sil[1:, None]   # agent acoustic, delay 1
        cache[1 + k, :prompt_len] = sine[0]                  # user semantic, delay 0
        cache[2 + k: 1 + 2 * k, 1: prompt_len + 1] = sine[1:, None]
        if ring is not None and n_voice > 0:
            delays = [0, 0] + [1] * (k - 1) + [0] + [1] * (k - 1)
            for s in range(cfg.num_streams):
                for kk in range(delays[s] + 1):
                    cache[s, n_voice - 1 + kk] = ring[s, (n_voice + kk) % self.DELAY_RING]

        reads = np.full((cfg.num_streams, prompt_len), -1, np.int32)
        reads[0, 0] = cfg.text_pad  # step 0 has no previous position
        if prompt_len > 1:
            reads[:, 1:] = cache[:, : prompt_len - 1]
        nonvoice = reads[:, n_voice:]
        out = np.full((cfg.num_streams, self.PROMPT_CAP), -1, np.int32)
        out[0] = cfg.text_pad
        out[:, : nonvoice.shape[1]] = nonvoice
        return out, nonvoice.shape[1]

    def _run_converse(self, audio, sample_rate, sampling, max_extra_s, voice_prompt,
                      system_prompt=None, seed: int = 0, diag: bool = False):
        sr = self.cfg.mimi.sample_rate
        if sample_rate != sr:
            from ...audio.resample import resample

            audio = resample(audio.astype(np.float32), sample_rate, sr)
        spf = self.cfg.mimi.samples_per_frame
        n_frames = max(1, -(-len(audio) // spf))  # ceil: whole frames
        audio = np.pad(audio, (0, n_frames * spf - len(audio)))[: n_frames * spf]

        user_codes = self._mimi_encode(self.mimi_params, audio=jnp.asarray(audio)[None])
        voice_embeds, n_voice, ring = self._voice_inputs(voice_prompt)
        reads, n_prompt = self._prompt_reads(system_prompt, n_voice, ring)
        max_steps = min(sampling.max_steps,
                        n_frames + int(max_extra_s * self.cfg.mimi.frame_rate))
        agent, n_steps, dstats = self._converse(
            self.params, user_codes, voice_embeds, jnp.asarray(n_voice, jnp.int32),
            jnp.asarray(reads[None]), jnp.asarray(n_prompt, jnp.int32),
            jax.random.PRNGKey(seed),
            user_frames=n_frames, max_steps=max_steps, sampling=sampling, diag=diag)
        n_done = int(np.asarray(n_steps)[0])
        clipped = jnp.clip(agent, 0, self.cfg.mimi.codebook_size - 1)
        return clipped, n_frames, n_done, dstats

    def shard(self, mesh=None, dp: Optional[int] = None, tp: Optional[int] = None
              ) -> "PersonaPlex":
        """Distribute the temporal transformer + depformer over a device
        mesh (the 7B's d_model-4096 layers are the TP target; Mimi stays
        replicated — it is a small conv codec).  Returns self.

            model = PersonaPlex.from_pretrained(...).shard(tp=4)
        """
        from ...parallel import PERSONAPLEX_RULES, make_mesh, replicate, shard_pytree

        mesh = mesh or make_mesh(dp=dp, tp=tp)
        p = unfuse_temporal_params(self.params, self.cfg)
        p = shard_pytree(p, mesh, PERSONAPLEX_RULES)
        if mesh.shape.get("tp", 1) == 1:
            p = fuse_temporal_params(p)
        self.params = p
        self.mimi_params = replicate(self.mimi_params, mesh)
        return self

    def respond(self, audio: np.ndarray, sample_rate: int = 16000,
                sampling: Optional[PersonaSampling] = None, max_extra_s: float = 4.0,
                voice_prompt: Optional[np.ndarray] = None,
                system_prompt=None, seed: int = 0, **kwargs) -> AudioChunk:
        """``system_prompt``: None = the built-in assistant prompt; a str
        (SentencePiece'd) or pre-tokenized ids steer behavior
        (personaplex.md:124-128)."""
        t0 = time.perf_counter()
        sampling = sampling or PersonaSampling()
        sr = self.cfg.mimi.sample_rate
        agent, n_frames, n_done, dstats = self._run_converse(
            audio, sample_rate, sampling, max_extra_s, voice_prompt,
            system_prompt=system_prompt, seed=seed)
        self._set_text_outputs(dstats, n_done)
        # decode the full fixed-shape buffer (one compiled program), trim
        # the early-stopped tail on the host — Mimi is causal so the
        # leading n_done frames decode identically
        wav = self._mimi_decode(self.mimi_params, codes=agent)
        out = np.asarray(wav[0], np.float32)[: n_done * self.cfg.mimi.samples_per_frame]
        dur = len(out) / sr
        from ...core.logging import inference as log

        log.info("personaplex: %d user frames → %d agent frames, RTF %.2f",
                 n_frames, n_done, (time.perf_counter() - t0) / max(dur, 1e-6))
        return AudioChunk(out, sr)

    def _set_text_outputs(self, dstats, n_done: int) -> None:
        """Expose the conversation's sampled text stream (the reference's
        respond returns (audio, textTokens), and the server decodes a
        transcript from them — PersonaPlex.swift:57,
        AudioServer.swift:133-136): trimmed ids in ``last_text_tokens``,
        SentencePiece-decoded ``last_transcript`` when the tokenizer is
        loaded (None otherwise)."""
        toks = np.asarray(dstats["text_tokens"])[0, :n_done]
        self.last_text_tokens = toks
        self.last_transcript = (self.tokenizer.decode([int(t) for t in toks])
                                if self.tokenizer is not None else None)

    def respond_diagnostic(self, audio: np.ndarray, sample_rate: int = 16000,
                           sampling: Optional[PersonaSampling] = None,
                           max_extra_s: float = 4.0, voice_prompt=None,
                           system_prompt=None, seed: int = 0
                           ) -> Tuple[AudioChunk, dict]:
        """``respond`` plus per-step capture for debugging (the reference's
        respondDiagnostic / DiagnosticInfo, PersonaPlex.swift:1307-1318):
        returns ``(audio, diag)`` where ``diag`` holds, trimmed to the
        generated steps: sampled ``text_tokens`` [T], per-codebook
        ``agent_tokens`` [16, T], ``text_top_token``/``text_top_logit``/
        ``text_entropy`` [T], and ``hidden_stats`` [T, 4]
        (mean/std/min/max of the temporal hidden state)."""
        sampling = sampling or PersonaSampling()
        sr = self.cfg.mimi.sample_rate
        agent, _, n_done, dstats = self._run_converse(
            audio, sample_rate, sampling, max_extra_s, voice_prompt,
            system_prompt=system_prompt, seed=seed, diag=True)
        self._set_text_outputs(dstats, n_done)
        wav = self._mimi_decode(self.mimi_params, codes=agent)
        out = np.asarray(wav[0], np.float32)[: n_done * self.cfg.mimi.samples_per_frame]
        diag = {k: np.asarray(v)[0, :n_done] for k, v in dstats.items()}
        diag["agent_tokens"] = np.asarray(agent)[0, :, :n_done]
        return AudioChunk(out, sr), diag

    def respond_stream(self, audio: np.ndarray, sample_rate: int = 16000,
                       sampling: Optional[PersonaSampling] = None,
                       max_extra_s: float = 4.0,
                       voice_prompt: Optional[np.ndarray] = None,
                       system_prompt=None,
                       chunk_frames: int = 25, left_context: int = 25):
        """Streaming response: agent codes decode through Mimi in ~2 s
        chunks with left context, trimmed at the seam (reference:
        MimiStreamingDecoder 25-frame chunks, MimiCodec.swift:184-209).

        The windowed re-decode approximates the reference's carried-state
        streaming decoder; the seam error decays with ``left_context``
        (the decoder transformer attends over a 250-frame sliding window,
        so only full history is bit-exact — tests pin both the exactness
        at full context and the detectability of a starved one). 25
        frames of context ≈ 2 s doubles the decode work per chunk and
        keeps seams inaudible."""
        sampling = sampling or PersonaSampling()
        sr = self.cfg.mimi.sample_rate
        spf = self.cfg.mimi.samples_per_frame
        agent, _, n_done, dstats = self._run_converse(
            audio, sample_rate, sampling, max_extra_s, voice_prompt,
            system_prompt=system_prompt)
        self._set_text_outputs(dstats, n_done)
        agent = np.asarray(agent)
        emitted = 0
        while emitted < n_done:
            ctx = min(left_context, emitted)
            end = min(emitted + chunk_frames, n_done)
            piece = jnp.asarray(agent[:, :, emitted - ctx: end])
            wav = np.asarray(self._mimi_decode(self.mimi_params, codes=piece)[0],
                             np.float32)
            yield AudioChunk(wav[ctx * spf:], sr)
            emitted = end

    def realtime_session(self, sampling: Optional[PersonaSampling] = None,
                         context_frames: int = 8,
                         voice_prompt: Optional[np.ndarray] = None,
                         system_prompt=None,
                         seed: int = 0, batch: int = 1,
                         kv_dtype=None) -> "RealtimeSession":
        """Full-duplex frame loop: one user frame in → one agent frame out
        at 12.5 Hz (reference: realtime mode, PersonaPlex.swift:344-…).
        Every Mimi conv is causal, so windowed per-frame encode/decode with
        ``context_frames`` of carried left context is exact.

        ``batch`` > 1 steps N independent full-duplex sessions in ONE
        fused frame program (``push_frames``) — per-token cost is weight-
        read-bound, so N sessions cost barely more than one. This is the
        structural capability the reference cannot have (its single-stream
        realtime RTF is ~1.4, docs/models/personaplex.md:97-98).
        ``voice_prompt``/``system_prompt`` may be per-session lists.

        ``kv_dtype=jnp.int8`` quantizes the temporal KV cache (per-slot
        symmetric scales, ops/kv_cache.py). At the 7B config the bf16
        cache is ~1.6 GB/session (3096-slot context × 32 layers); int8
        halves that, which is what lets 4+ sessions share one 16 GB v5e
        chip alongside the ~8 GB int8 temporal stack."""
        return RealtimeSession(self, sampling or PersonaSampling(),
                               context_frames, voice_prompt, seed,
                               system_prompt=system_prompt, batch=batch,
                               kv_dtype=kv_dtype)

    def warm_up(self) -> None:
        self.respond(np.zeros(self.cfg.mimi.samples_per_frame * 2, np.float32),
                     self.cfg.mimi.sample_rate, max_extra_s=0.2)

    def unload(self) -> None:
        self.params = None
        self.mimi_params = None
        self._loaded = False

    @property
    def is_loaded(self) -> bool:
        return self._loaded


class RealtimeSession:
    """Full-duplex 12.5 Hz frame loop as ONE compiled program per frame:
    carried-state streaming Mimi encode (exact — mimi.py streaming ops) +
    temporal/depformer step + carried-state streaming Mimi decode fuse
    into a single jit with every carry — Mimi conv/KV streams, the
    temporal KV cache, code histories, PRNG key — device-resident
    (donated between frames). The host supplies 80 ms of PCM and fetches
    80 ms back: exactly one dispatch + one value fetch per frame, so the
    wire adds ONE round-trip, not three; and streaming Mimi does O(frame)
    work instead of re-encoding/decoding a context window every frame.
    Codes are exactly the offline _converse's under the same inputs
    (tested). (reference: MimiStreamingEncoder/Decoder + compiled
    temporal step, MimiCodec.swift:120-212, personaplex.md:224-243)."""

    def __init__(self, model: PersonaPlex, sampling: PersonaSampling,
                 context_frames: int, voice_prompt, seed: int,
                 system_prompt=None, batch: int = 1, kv_dtype=None):
        # context_frames is kept for API compatibility; carried-state
        # streaming is exact regardless, so no window sizing is needed.
        # batch > 1 steps N independent sessions in lockstep through the
        # same fused frame program (push_frames): every state leaf carries
        # a leading batch dim, sessions may differ in voice/system prompt
        # (per-row valid masks in the shared prefill), and sampling rows
        # draw independent noise from the shared key.
        self.model = model
        cfg = model.cfg
        self.cfg = cfg
        self.sampling = sampling
        self.batch = batch
        spf = cfg.mimi.samples_per_frame
        self._ctx = context_frames
        self.frames_done = 0

        k = cfg.temporal_codebooks

        @functools.partial(jax.jit, static_argnames=("sampling",),
                           donate_argnums=(2,))
        def _rt_frame(p, mimi_p, state, samples, *, sampling):
            """The whole frame on device. The temporal input honors the
            stream delays: user cb0 from the previous frame, cb1-7 from two
            frames back (Configuration.swift:18); the depformer's user
            steps are forced to cb0 of THIS frame + cb1-7 of the previous
            one."""
            (enc_st, u1, u2, agent_prev, text_prev, cache, dec_st,
             audio_hist, text_hist, key) = state
            b = samples.shape[0]
            enc, enc_st = mimi_encode_frame(
                mimi_p, cfg.mimi, enc_st, samples.astype(jnp.float32))
            enc = enc[:, :, 0]                                   # [B, 16]
            user_codes = enc[:, :k].astype(jnp.int32)
            user_read = jnp.concatenate([u1[:, :1], u2[:, 1:k]], axis=1)
            provided = jnp.concatenate(
                [jnp.full((b, cfg.num_codebooks - k), -1, jnp.int32),
                 enc[:, :1].astype(jnp.int32), u1[:, 1:k]], axis=1)
            embeds = embed_frame(p, cfg, text_prev, user_read, agent_prev)[:, None]
            hidden, cache = temporal_step(p, cfg, embeds.astype(model.dtype), cache)
            key, kt, kd = jax.random.split(key, 3)
            # realtime applies both repetition penalties over the session's
            # own rolling history every frame (PersonaPlex.swift:1230-1255
            # — unlike batch respond(), whose text history starts after the
            # user phase; realtime is all generation)
            rep_on = sampling.repetition_window > 0
            text_tok = _sample_topk(
                linear(hidden, p["text_head"]), kt,
                sampling.text_top_k, sampling.text_temperature,
                history=text_hist if rep_on else None,
                penalty=sampling.text_repetition_penalty)
            codes = depformer_generate(p, cfg, hidden, text_tok, kd, sampling,
                                       provided=provided,
                                       history=audio_hist if rep_on else None)
            audio_hist = jnp.concatenate([audio_hist[:, :, 1:], codes[:, :, None]],
                                         axis=2)
            text_hist = jnp.concatenate([text_hist[:, 1:], text_tok[:, None]], axis=1)
            wav, dec_st = mimi_decode_frame(
                mimi_p, cfg.mimi, dec_st,
                jnp.clip(codes, 0, cfg.mimi.codebook_size - 1)[:, :, None])
            new_state = (enc_st, user_codes, u1, codes[:, :k], text_tok,
                         cache, dec_st, audio_hist, text_hist, key)
            return wav, codes, new_state

        self._rt_frame = _rt_frame

        # 5-phase prefill, same layout as respond(): voice embeddings +
        # spacer/text-prompt/spacer reads (with ring overlay + delays).
        # Cache holds prefill caps + cfg.context frames of conversation.
        # Sessions may carry different prompts: the block layout
        # [voice_cap | prompt_cap] is shared, per-row validity masks
        # carry each session's true lengths (positions follow from the
        # cumsum of valid, so shorter prompts stay position-contiguous).
        @jax.jit
        def _prefill(p, voice_embeds, n_voice, prompt_reads, n_prompt):
            # the empty cache is built INSIDE the jit: an eager zeros
            # buffer closed over here would be captured as a compile-time
            # CONSTANT (3.35 GB at batch=4/7B — the zeros, the baked
            # constant, and the prefilled output all resident at once,
            # which OOMed a 16 GB chip); in-graph zeros cost nothing
            cache = init_cache(cfg.num_layers, batch, cfg.num_heads,
                               model.VOICE_PROMPT_CAP + model.PROMPT_CAP + cfg.context,
                               cfg.head_dim, kv_dtype or model.dtype)
            v_cap = voice_embeds.shape[1]
            p_cap = prompt_reads.shape[2]
            prompt_emb = jax.vmap(
                lambda t: embed_frame(p, cfg, prompt_reads[:, 0, t],
                                      prompt_reads[:, 1 + k:, t],
                                      prompt_reads[:, 1: 1 + k, t]),
                out_axes=1)(jnp.arange(p_cap))
            embeds = jnp.concatenate([voice_embeds.astype(model.dtype),
                                      prompt_emb.astype(model.dtype)], axis=1)
            valid = jnp.concatenate(
                [jnp.arange(v_cap)[None] < n_voice[:, None],
                 jnp.arange(p_cap)[None] < n_prompt[:, None]], axis=1)
            _, new_cache = temporal_prefill(p, cfg, embeds, valid, cache)
            return new_cache

        def _per_session(prompt):
            return prompt if isinstance(prompt, (list, tuple)) else [prompt] * batch

        v_embeds, n_voices, all_reads, n_prompts = [], [], [], []
        for vp, sp in zip(_per_session(voice_prompt), _per_session(system_prompt)):
            voice_embeds, n_voice, ring = model._voice_inputs(vp)
            reads, n_prompt = model._prompt_reads(sp, n_voice, ring)
            v_embeds.append(np.asarray(voice_embeds)[0])
            n_voices.append(n_voice)
            all_reads.append(reads)
            n_prompts.append(n_prompt)
        prefilled = _prefill(model.params, jnp.asarray(np.stack(v_embeds)),
                             jnp.asarray(n_voices, jnp.int32),
                             jnp.asarray(np.stack(all_reads)),
                             jnp.asarray(n_prompts, jnp.int32))
        # generation-start read state: agent silence; user history seeded
        # with sine tokens (the prompt phases' user-stream writes)
        # NB: u1/u2 must be DISTINCT buffers — the whole state is donated,
        # and donating one buffer twice is an XLA error
        sine = np.tile(np.asarray(SINE_TOKENS[:k], np.int32)[None], (batch, 1))
        mimi_dtype = jax.tree_util.tree_leaves(model.mimi_params)[0].dtype
        self._state = (
            init_mimi_encoder_stream(model.mimi_params, cfg.mimi, batch=batch,
                                     dtype=mimi_dtype),
            jnp.asarray(sine),                                      # user t-1
            jnp.asarray(sine.copy()),                               # user t-2
            jnp.asarray(np.tile(np.asarray(SILENCE_TOKENS[:k], np.int32)[None],
                                (batch, 1))),                       # agent
            jnp.full((batch,), cfg.text_pad, jnp.int32),            # text
            prefilled,                                              # KV cache
            init_mimi_decoder_stream(model.mimi_params, cfg.mimi, batch=batch,
                                     dtype=mimi_dtype),
            # rolling repetition-penalty histories; out-of-range init =
            # empty slots (audio card 2048, text vocab)
            jnp.full((batch, cfg.num_codebooks, max(sampling.repetition_window, 1)),
                     cfg.audio_pad, jnp.int32),
            jnp.full((batch, max(sampling.repetition_window, 1)), cfg.text_vocab,
                     jnp.int32),
            jax.random.PRNGKey(seed),
        )

    def push_frame(self, samples: np.ndarray) -> np.ndarray:
        """One 80 ms user frame (samples_per_frame samples @24 kHz) in →
        one agent frame of audio out: a single device program + a single
        value fetch (see class docstring for the on-device layout)."""
        spf = self.cfg.mimi.samples_per_frame
        if self.batch != 1:
            raise ValueError("batched session: use push_frames([B, spf])")
        if len(samples) != spf:
            raise ValueError(f"push_frame expects exactly {spf} samples")
        return self.push_frames(np.asarray(samples, np.float32)[None])[0]

    def push_frames(self, samples: np.ndarray) -> np.ndarray:
        """One 80 ms user frame per session in → one agent frame per
        session out, all sessions in ONE device program + ONE value fetch.
        ``samples``: [batch, samples_per_frame]."""
        return np.asarray(self.push_frames_async(samples), np.float32)

    def push_frames_async(self, samples: np.ndarray):
        """Like :meth:`push_frames` but returns the agent audio as a
        DEVICE array — no host fetch. The dispatch returns immediately;
        the caller fetches (``np.asarray``) when it needs the PCM.

        Serving use: a colocated pipeline keeps frames device-resident
        (e.g. feeding enhancement or a codec re-encode) and only the final
        consumer fetches. Benchmarking use: dispatching K frames
        back-to-back with one trailing fetch isolates the device+dispatch
        cost per frame from the tunnel's per-fetch round-trip — the
        device/tunnel split of docs/benchmarks.md §multi-session."""
        spf = self.cfg.mimi.samples_per_frame
        samples = np.asarray(samples, np.float32)
        if samples.shape != (self.batch, spf):
            raise ValueError(
                f"push_frames expects shape {(self.batch, spf)}, got {samples.shape}")
        wav, codes, self._state = self._rt_frame(
            self.model.params, self.model.mimi_params, self._state,
            jnp.asarray(samples), sampling=self.sampling)
        #: the frame's full 16-codebook agent codes (device array; fetch
        #: with np.asarray only if needed — the audio fetch already
        #: synchronizes the frame)
        self.last_codes = codes
        self.frames_done += 1
        return wav

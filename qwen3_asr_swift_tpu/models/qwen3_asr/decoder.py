"""Qwen3 text decoder (GQA + q/k-norm + RoPE), TPU-first.

Functional re-design of the reference decoder
(reference: Sources/Qwen3ASR/QuantizedTextDecoder.swift:9-252): 28 pre-norm
layers of [RMSNorm → GQA attention (per-head q/k RMSNorm, split-half RoPE
θ=1e6) → RMSNorm → SwiGLU MLP], final RMSNorm, tied-embedding LM head.

TPU-shaped differences:
- KV cache is a preallocated static buffer with a validity bitmap
  (ops/kv_cache.py) instead of per-step concatenation
  (QuantizedTextDecoder.swift:93-96). Prompt layouts keep padded audio
  blocks in place; invalid rows are masked, positions stay contiguous.
- Prefill and single-token decode are two static modes of the same layer
  math; the decode step runs inside ``lax.while_loop`` with no host sync
  (vs the asyncEval double-buffer pipeline of Qwen3ASR.swift:317-390 —
  on TPU the whole loop stays on device, strictly stronger overlap).
- Everything is batched [B, T] from the start.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import NEG_INF, sdpa
from ...ops.kv_cache import (KVCache, after_prefill, after_token, cache_kv,
                             init_cache, write_prompt, write_token)
from ...ops.nn import (embedding_lookup, fuse_qkv_gate_up, init_linear,
                       linear, rms_norm, swiglu_mlp, tied_lm_head,
                       unfuse_qkv_gate_up)
from ...ops.rope import apply_rope, rope_angles
from .config import TextDecoderConfig


def init_decoder_params(key, cfg: TextDecoderConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 2 + cfg.num_layers)
    params = {
        "embed_tokens": (jax.random.normal(keys[0], (cfg.vocab_size, cfg.hidden_size)) * 0.02).astype(dtype),
        "norm": {"weight": jnp.ones((cfg.hidden_size,), dtype)},
        "layers": [],
    }
    h, hd = cfg.hidden_size, cfg.head_dim
    for i in range(cfg.num_layers):
        k = jax.random.split(keys[2 + i], 7)
        params["layers"].append(
            {
                "q_proj": init_linear(k[0], h, cfg.num_heads * hd, bias=False, dtype=dtype),
                "k_proj": init_linear(k[1], h, cfg.num_kv_heads * hd, bias=False, dtype=dtype),
                "v_proj": init_linear(k[2], h, cfg.num_kv_heads * hd, bias=False, dtype=dtype),
                "o_proj": init_linear(k[3], cfg.num_heads * hd, h, bias=False, dtype=dtype),
                "q_norm": {"weight": jnp.ones((hd,), dtype)},
                "k_norm": {"weight": jnp.ones((hd,), dtype)},
                "input_layernorm": {"weight": jnp.ones((h,), dtype)},
                "post_attention_layernorm": {"weight": jnp.ones((h,), dtype)},
                "mlp": {
                    "gate_proj": init_linear(k[4], h, cfg.intermediate_size, bias=False, dtype=dtype),
                    "up_proj": init_linear(k[5], h, cfg.intermediate_size, bias=False, dtype=dtype),
                    "down_proj": init_linear(k[6], cfg.intermediate_size, h, bias=False, dtype=dtype),
                },
            }
        )
    return params


def fuse_for_inference(params, cfg: TextDecoderConfig) -> dict:
    """Fuse q/k/v → "qkv_proj" and gate/up → "gate_up_proj" along the
    output axis in every layer (ops.nn.fuse_qkv_gate_up; exact for both
    dense and group-quantized params).

    Why: the quantized decode step's cost is dominated by the per-call
    fixed work of 7 packed matmuls per layer (activation re-striding +
    per-tile scale expansion), not by the contraction FLOPs — measured
    bisect in docs/benchmarks.md. Fusing drops it to 5 calls per layer
    and lets q/k/v (and gate/up) share one activation pass.

    Only valid when the projections are unsharded or replicated — tensor
    parallelism partitions q/k/v along heads with per-projection rules, so
    TP meshes keep the unfused tree (Qwen3ASR gates on mesh shape)."""
    return fuse_qkv_gate_up(params)


def unfuse_for_sharding(params, cfg: TextDecoderConfig) -> dict:
    """Exact inverse of :func:`fuse_for_inference`: slice the fused rows
    back into separate q/k/v and gate/up projections so the per-projection
    TP partition rules (parallel/mesh.py QWEN3_DECODER_RULES) apply.
    No-op on an already-unfused tree."""
    hd = cfg.head_dim
    return unfuse_qkv_gate_up(params, cfg.num_heads * hd, cfg.num_kv_heads * hd)


def _qkv(p, h, positions, cfg: TextDecoderConfig):
    """Project + per-head RMS-normalize + rotate. h: [B, T, hidden];
    positions: [B, T] int32. Returns q [B,Hq,T,D], k,v [B,Hkv,T,D]."""
    b, t, _ = h.shape
    hd = cfg.head_dim
    if "qkv_proj" in p:
        nq, nkv = cfg.num_heads * hd, cfg.num_kv_heads * hd
        qkv = linear(h, p["qkv_proj"])
        q = qkv[..., :nq].reshape(b, t, cfg.num_heads, hd)
        k = qkv[..., nq:nq + nkv].reshape(b, t, cfg.num_kv_heads, hd)
        v = qkv[..., nq + nkv:].reshape(b, t, cfg.num_kv_heads, hd)
    else:
        q = linear(h, p["q_proj"]).reshape(b, t, cfg.num_heads, hd)
        k = linear(h, p["k_proj"]).reshape(b, t, cfg.num_kv_heads, hd)
        v = linear(h, p["v_proj"]).reshape(b, t, cfg.num_kv_heads, hd)
    q = rms_norm(q, p["q_norm"]["weight"], cfg.rms_norm_eps)
    k = rms_norm(k, p["k_norm"]["weight"], cfg.rms_norm_eps)
    cos, sin = rope_angles(positions, hd, cfg.rope_theta)  # [B, T, hd/2]
    cos, sin = cos[:, None], sin[:, None]  # broadcast over heads
    q = apply_rope(q.transpose(0, 2, 1, 3), cos, sin)
    k = apply_rope(k.transpose(0, 2, 1, 3), cos, sin)
    return q, k, v.transpose(0, 2, 1, 3)


def prefill(params, cfg: TextDecoderConfig, embeds, valid, cache: KVCache) -> Tuple[jax.Array, KVCache]:
    """Process full prompts.

    embeds: [B, T_bucket, hidden] — static prompt layout (may contain
    invalid rows inside, e.g. audio-bucket padding).
    valid: [B, T_bucket] bool — which rows are real tokens.
    Returns (hidden [B, T_bucket, hidden] after final norm, cache with the
    prompt written at rows [0, T_bucket)).
    """
    b, t, _ = embeds.shape
    # Contiguous positions over valid rows only (invalid rows consume none).
    positions = (jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1) * valid
    # causal-by-row + key-validity mask: [B, 1, T, T]
    rows = jnp.arange(t)[None, :, None]
    cols = jnp.arange(t)[None, None, :]
    causal = cols <= rows
    key_ok = valid[:, None, :]
    mask = jnp.where(causal & key_ok, 0.0, NEG_INF).astype(jnp.float32)[:, None]

    x = embeds
    new_layers = []
    for p in params["layers"]:
        h = rms_norm(x, p["input_layernorm"]["weight"], cfg.rms_norm_eps)
        q, k, v = _qkv(p, h, positions, cfg)
        new_layers.append(write_prompt(cache.layers[len(new_layers)], k, v))
        attn = sdpa(q, k, v, 1.0 / np.sqrt(cfg.head_dim), mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, -1)
        x = x + linear(attn, p["o_proj"])
        h2 = rms_norm(x, p["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
        x = x + swiglu_mlp(h2, p["mlp"])

    x = rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps)
    return x, after_prefill(cache, new_layers, valid, t)


def decode_step(params, cfg: TextDecoderConfig, token_ids, cache: KVCache) -> Tuple[jax.Array, KVCache]:
    """One decode step for every slot. token_ids: [B] int32.
    Returns (logits [B, vocab] fp32, advanced cache)."""
    b = token_ids.shape[0]
    x = embedding_lookup(params["embed_tokens"], token_ids, cfg.hidden_size)[:, None, :]  # [B,1,H]
    positions = cache.positions[:, None]  # [B,1]

    new_layers = []
    # Key mask: previously valid rows, plus the row being written this step.
    written = jnp.arange(cache.max_len)[None, :] == cache.cursor
    key_ok = cache.valid | written
    mask = jnp.where(key_ok, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]

    # int8 caches on a single TPU chip read through the Pallas decode
    # kernel (plain XLA materializes the dequantized cache, spending the
    # traffic saving — ops/attention_pallas.py)
    use_pallas_attn = cache.layers[0].k_scale is not None and _pallas_attn_ok()

    for p in params["layers"]:
        h = rms_norm(x, p["input_layernorm"]["weight"], cfg.rms_norm_eps)
        q, k, v = _qkv(p, h, positions, cfg)
        updated = write_token(cache.layers[len(new_layers)], k, v, cache.cursor)
        new_layers.append(updated)
        if use_pallas_attn:
            from ...ops.attention_pallas import decode_attention_int8

            attn = decode_attention_int8(
                q, updated.k, updated.k_scale, updated.v, updated.v_scale,
                key_ok).astype(x.dtype)
        else:
            k_all, v_all = cache_kv(updated, k.dtype)
            attn = sdpa(q, k_all, v_all, 1.0 / np.sqrt(cfg.head_dim), mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, -1)
        x = x + linear(attn, p["o_proj"])
        h2 = rms_norm(x, p["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
        x = x + swiglu_mlp(h2, p["mlp"])

    x = rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps)
    logits = tied_lm_head(x[:, 0], params["embed_tokens"])  # [B, vocab] fp32
    return logits, after_token(cache, new_layers)


def _pallas_attn_ok() -> bool:
    try:
        import jax as _jax

        return _jax.default_backend() == "tpu" and _jax.device_count() == 1
    except Exception:  # noqa: BLE001
        return False


def make_cache(cfg: TextDecoderConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    return init_cache(cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim, dtype)

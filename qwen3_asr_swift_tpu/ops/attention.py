"""Scaled dot-product attention with MHA/GQA/MQA and structured masks.

TPU-native analog of the reference's shared SDPA helper used by every
attention module (reference: Sources/MLXCommon/SDPA.swift:15-101). GQA is
handled natively by reshaping query heads into [kv_heads, group] — no KV
tiling, no materialized head repeats. Softmax statistics are fp32.

Masks are built as additive fp32 biases; the block-diagonal window mask of
the Qwen3 audio encoder is NOT materialized [T, T] — windows become a batch
dimension instead (see models/qwen3_asr/encoder.py), which is the
TPU-shaped equivalent of reference AudioEncoder.swift:337-357.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def sdpa(q, k, v, scale: float, mask=None):
    """Attention with grouped KV heads.

    q: [B, Hq, Tq, D]; k, v: [B, Hkv, Tk, D]; Hq must be a multiple of Hkv.
    mask: additive bias broadcastable to [B, 1, Tq, Tk] (or [B, Hq, Tq, Tk]),
    or None. Returns [B, Hq, Tq, D].
    """
    b, hq, tq, d = q.shape
    hkv = k.shape[1]
    group = hq // hkv

    # Inputs stay in their native dtype (bf16 params feed the MXU's
    # bf16×bf16→fp32 path — upcasting to f32 matmuls halves throughput and
    # doubles VMEM traffic without adding input precision); fp32 lives in
    # the ACCUMULATION (preferred_element_type) and the softmax, where it
    # matters. The scale folds into the fp32 scores, not the bf16 q.
    qg = q.reshape(b, hkv, group, tq, d)
    # scores: [B, Hkv, G, Tq, Tk] — fp32 out of the MXU accumulator
    scores = jnp.einsum("bhgqd,bhkd->bhgqk", qg, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        mb = mask.astype(jnp.float32)
        if mb.ndim == 4:  # [B, 1 or Hq, Tq, Tk]
            if mb.shape[1] == 1:
                mb = mb[:, :, None, :, :]
            else:
                mb = mb.reshape(b, hkv, group, tq, mb.shape[-1])
        scores = scores + mb
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", probs, v, preferred_element_type=jnp.float32)
    return out.reshape(b, hq, tq, d).astype(q.dtype)


def causal_mask(q_len: int, kv_len: int, q_offset=0):
    """Additive causal mask [1, 1, q_len, kv_len]: query i (at absolute
    position q_offset+i) attends to keys 0..q_offset+i
    (reference: QuantizedTextDecoder.swift:228-236)."""
    rows = jnp.arange(q_len)[:, None] + q_offset
    cols = jnp.arange(kv_len)[None, :]
    return jnp.where(cols > rows, NEG_INF, 0.0)[None, None].astype(jnp.float32)


def length_mask(kv_len: int, valid_len):
    """Additive key-validity mask [1, 1, 1, kv_len] masking keys >= valid_len."""
    cols = jnp.arange(kv_len)
    return jnp.where(cols >= valid_len, NEG_INF, 0.0)[None, None, None].astype(jnp.float32)


def decode_step_mask(kv_len: int, cache_len):
    """Mask for single-token decode against a preallocated KV cache:
    positions >= cache_len (unwritten slots) are invisible."""
    return length_mask(kv_len, cache_len)


def sdpa_reference(q, k, v, scale, mask=None):
    """Pure-numpy MHA/GQA attention for parity tests."""
    import numpy as np

    b, hq, tq, d = q.shape
    hkv = k.shape[1]
    group = hq // hkv
    q64 = q.astype(np.float64) * scale
    out = np.empty_like(q, dtype=np.float64)
    for bi in range(b):
        for h in range(hq):
            kvh = h // group
            s = q64[bi, h] @ k[bi, kvh].astype(np.float64).T
            if mask is not None:
                m = mask
                mb = m[bi if m.shape[0] > 1 else 0]
                mh = mb[h if mb.shape[0] == hq else 0]
                s = s + mh.astype(np.float64)
            s = s - s.max(axis=-1, keepdims=True)
            p = np.exp(s)
            p /= p.sum(axis=-1, keepdims=True)
            out[bi, h] = p @ v[bi, kvh].astype(np.float64)
    return out.astype(q.dtype)

"""Pallas decode attention over an int8 KV cache.

Why: decode is HBM-bound and the KV read is the max_len-scaling traffic
term (docs/benchmarks.md).  An int8 cache halves that traffic only if the
attention actually READS int8 — under plain XLA the ``convert·scale``
producer materializes a full bf16 cache every step, spending the saving
(measured: identical generate time).  This kernel loads the int8 codes +
per-slot scales into VMEM, dequantizes in-register, and runs the whole
single-token attention for one (batch, kv-head) per grid cell — the
entire KV for one head fits VMEM comfortably (max_len·D ≈ 136 KB int8),
so no online softmax is needed.

Layout per grid cell (b, h):
    q      [group, D]      — the GQA query heads sharing kv-head h
    k, v   [L, D] int8     + scales [L] f32 (per-slot symmetric)
    valid  [L] int8        — attendable-row mask (static-shape cache rows)
    out    [group, D] f32

The caller pads L to a multiple of 128 (lane tiling) with valid=0 rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def _decode_attn_kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, valid_ref, out_ref,
                        *, scale: float, hkv: int):
    # One grid cell per batch row; the (small, static) kv-head loop runs
    # inside the kernel to amortize grid-cell overhead.  All intermediates
    # stay rank-2 (Mosaic layouts) and the per-slot scales fold into the
    # scores/probabilities instead of dequantizing [L, D] buffers:
    # (q·k_j)·s_j ≡ q·(s_j k_j) and p@(diag(s_v)V) ≡ (p·s_v)@V.
    ok = valid_ref[0] != 0                                          # [1, L]
    for h in range(hkv):
        q = q_ref[0, h].astype(jnp.float32)                         # [G, D]
        k = k_ref[0, h].astype(jnp.float32)                         # [L, D]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale             # [G, L]
        scores = scores * ks_ref[0, h]                              # [1, L] bcast
        scores = jnp.where(ok, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)                                     # [G, L]
        v = v_ref[0, h].astype(jnp.float32)                         # [L, D]
        num = jax.lax.dot_general(
            p * vs_ref[0, h], v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                     # [G, D]
        out_ref[0, h] = num / jnp.sum(p, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_int8(q, k_codes, k_scale, v_codes, v_scale, valid,
                          interpret: bool = False):
    """Single-token GQA attention reading the int8 cache directly.

    q: [B, Hq, 1, D]; k_codes/v_codes: [B, Hkv, L, D] int8;
    k_scale/v_scale: [B, Hkv, L] f32; valid: [B, L] bool.
    Returns [B, Hq, 1, D] f32.
    """
    from jax.experimental import pallas as pl

    b, hq, one, d = q.shape
    _, hkv, l, _ = k_codes.shape
    group = hq // hkv
    scale = 1.0 / np.sqrt(d)

    pad = (-l) % 128
    if pad:
        k_codes = jnp.pad(k_codes, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v_codes = jnp.pad(v_codes, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k_scale = jnp.pad(k_scale, ((0, 0), (0, 0), (0, pad)))
        v_scale = jnp.pad(v_scale, ((0, 0), (0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
        l += pad

    # [B, Hq, 1, D] → [B, Hkv, group, D] (heads h*group..h*group+group-1
    # share kv-head h — the GQA repeat convention of ops.attention.sdpa)
    qg = q[:, :, 0, :].reshape(b, hkv, group, d)
    # scale/valid vectors carry L on the LAST axis with a unit sublane dim
    # (Mosaic requires the trailing two block dims be (8k, 128k) or full)
    ksr = k_scale[:, :, None, :]                                # [B, Hkv, 1, L]
    vsr = v_scale[:, :, None, :]
    valid8 = valid.astype(jnp.int8)[:, None, :]                  # [B, 1, L]

    out = pl.pallas_call(
        functools.partial(_decode_attn_kernel, scale=scale, hkv=hkv),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv, group, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, hkv, l, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, hkv, 1, l), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, hkv, l, d), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, hkv, 1, l), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, l), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hkv, group, d), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hkv, group, d), jnp.float32),
        interpret=interpret,
    )(qg, k_codes, ksr, v_codes, vsr, valid8)

    return out.reshape(b, hq, 1, d)

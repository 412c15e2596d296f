"""Preallocated static-shape KV caches.

TPU-native replacement for the reference's growing-concat caches
(reference: QuantizedTextDecoder.swift:93-96 concatenates along the time
axis every step — fine for a lazy-graph GPU runtime, hostile to XLA's
static shapes). Here each layer owns fixed [B, Hkv, max_len, D] buffers
written in place.

Design for fully-static prompt layouts: a prompt is laid out as
``prefix | padded-audio-block | suffix | padding`` at STATIC offsets, with
a per-slot boolean ``valid`` map marking which cache rows are real. Invalid
rows (audio-bucket padding) are never compacted away — they are masked at
attention time, which costs a bucket's worth of wasted dot products but
keeps every shape static (one compiled program per bucket, zero dynamic
concats). ``positions`` tracks each slot's next RoPE position (valid-token
count), so position ids stay contiguous across the gaps, matching the
reference's compacted sequence exactly.

``cursor`` is the shared write offset for decode steps (slots prefilled
together advance in lockstep; the continuous-batching layer manages slot
lifecycles at a higher level).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class LayerKV(NamedTuple):
    k: jax.Array  # [B, Hkv, max_len, D] (bf16/f32, or int8 when quantized)
    v: jax.Array  # [B, Hkv, max_len, D]
    k_scale: jax.Array | None = None  # [B, Hkv, max_len] f32 — int8 caches only
    v_scale: jax.Array | None = None


class KVCache(NamedTuple):
    layers: tuple           # tuple[LayerKV, ...]
    valid: jax.Array        # [B, max_len] bool — which rows are attendable
    positions: jax.Array    # [B] int32 — next RoPE position (valid count)
    cursor: jax.Array       # scalar int32 — next write row

    @property
    def max_len(self) -> int:
        return self.layers[0].k.shape[2]

    @property
    def batch(self) -> int:
        return self.layers[0].k.shape[0]


def init_cache(num_layers: int, batch: int, num_kv_heads: int, max_len: int, head_dim: int,
               dtype=jnp.bfloat16) -> KVCache:
    """``dtype=jnp.int8`` builds a quantized cache (per-slot symmetric
    scales): decode is HBM-bound and the KV read is the max_len-scaling
    traffic term (docs/benchmarks.md), so int8 halves it vs bf16."""
    quant = dtype == jnp.int8

    def layer():
        shape = (batch, num_kv_heads, max_len, head_dim)
        if quant:
            return LayerKV(
                k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
                k_scale=jnp.zeros(shape[:3], jnp.float32),
                v_scale=jnp.zeros(shape[:3], jnp.float32))
        return LayerKV(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    return KVCache(
        layers=tuple(layer() for _ in range(num_layers)),
        valid=jnp.zeros((batch, max_len), jnp.bool_),
        positions=jnp.zeros((batch,), jnp.int32),
        cursor=jnp.zeros((), jnp.int32),
    )


def _quantize(x):
    """[B, Hkv, T, D] → (int8 codes, f32 scale [B, Hkv, T])."""
    scale = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0
    safe = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / safe[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


def _write(layer: LayerKV, k_new, v_new, offset) -> LayerKV:
    if layer.k_scale is not None:
        kq, ks = _quantize(k_new)
        vq, vs = _quantize(v_new)
        return LayerKV(
            k=jax.lax.dynamic_update_slice_in_dim(layer.k, kq, offset, axis=2),
            v=jax.lax.dynamic_update_slice_in_dim(layer.v, vq, offset, axis=2),
            k_scale=jax.lax.dynamic_update_slice_in_dim(layer.k_scale, ks, offset, axis=2),
            v_scale=jax.lax.dynamic_update_slice_in_dim(layer.v_scale, vs, offset, axis=2),
        )
    k = jax.lax.dynamic_update_slice_in_dim(layer.k, k_new.astype(layer.k.dtype), offset, axis=2)
    v = jax.lax.dynamic_update_slice_in_dim(layer.v, v_new.astype(layer.v.dtype), offset, axis=2)
    return LayerKV(k, v)


def write_prompt(layer: LayerKV, k_new, v_new) -> LayerKV:
    """Batch-uniform prefill write of [B, Hkv, T_bucket, D] at offset 0."""
    return _write(layer, k_new, v_new, 0)


def write_token(layer: LayerKV, k_new, v_new, cursor) -> LayerKV:
    """Single-token write at the shared cursor: k_new [B, Hkv, 1, D]."""
    return _write(layer, k_new, v_new, cursor)


def cache_kv(layer: LayerKV, dtype=jnp.bfloat16):
    """Attendable (k, v): dequantizes int8 caches (the convert+scale fuses
    into the attention dots so HBM still reads int8), passthrough for fp."""
    if layer.k_scale is None:
        return layer.k, layer.v
    k = layer.k.astype(dtype) * layer.k_scale[..., None].astype(dtype)
    v = layer.v.astype(dtype) * layer.v_scale[..., None].astype(dtype)
    return k, v


def after_prefill(cache: KVCache, new_layers: Sequence[LayerKV], prompt_valid: jax.Array,
                  prompt_len: int) -> KVCache:
    """prompt_valid: [B, T_bucket] bool; prompt_len: static bucket size."""
    b = prompt_valid.shape[0]
    valid = jnp.zeros((b, cache.max_len), jnp.bool_).at[:, :prompt_len].set(prompt_valid)
    return KVCache(
        layers=tuple(new_layers),
        valid=valid,
        positions=prompt_valid.sum(axis=1).astype(jnp.int32),
        cursor=jnp.asarray(prompt_len, jnp.int32),
    )


def after_token(cache: KVCache, new_layers: Sequence[LayerKV]) -> KVCache:
    b = cache.batch
    valid = jax.lax.dynamic_update_slice_in_dim(
        cache.valid, jnp.ones((b, 1), jnp.bool_), cache.cursor, axis=1
    )
    return KVCache(
        layers=tuple(new_layers),
        valid=valid,
        positions=cache.positions + 1,
        cursor=cache.cursor + 1,
    )

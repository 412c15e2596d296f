"""Rotary position embeddings (split-half rotation).

TPU-native analog of the reference's MLXFast RoPE with traditional=false
(reference: Sources/Qwen3ASR/QuantizedTextDecoder.swift:51 — split-half,
base θ from config). Positions are explicit (no hidden offset state) so the
same function serves prefill, batched decode, and M-RoPE variants.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rope_angles(positions, head_dim: int, base: float = 1e6):
    """positions: int32 [...P]; returns (cos, sin) of shape [...P, head_dim/2]."""
    half = head_dim // 2
    inv_freq = 1.0 / (base ** (np.arange(0, half, dtype=np.float64) / half))
    angles = positions.astype(jnp.float32)[..., None] * jnp.asarray(inv_freq, jnp.float32)
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x, cos, sin):
    """Split-half rotation: for x = [x1, x2] (half split on last dim),
    out = [x1*cos - x2*sin, x2*cos + x1*sin].

    x: [..., T, head_dim]; cos/sin: broadcastable to [..., T, head_dim/2].
    """
    half = x.shape[-1] // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def rope_reference(x: np.ndarray, positions: np.ndarray, base: float = 1e6) -> np.ndarray:
    """Pure-numpy split-half RoPE for parity tests."""
    head_dim = x.shape[-1]
    half = head_dim // 2
    inv_freq = 1.0 / (base ** (np.arange(0, half, dtype=np.float64) / half))
    ang = positions[..., None].astype(np.float64) * inv_freq
    cos, sin = np.cos(ang), np.sin(ang)
    x1, x2 = x[..., :half], x[..., half:]
    return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1).astype(x.dtype)

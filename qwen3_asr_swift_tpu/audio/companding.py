"""µ-law companding for the host→device audio wire format.

The remote-TPU tunnel's bandwidth is the serving bottleneck for batched
ASR (docs/benchmarks.md): staging a batch's PCM costs more wall time than
the encode+decode device programs combined. G.711 µ-law companding packs
each sample into one byte — half of int16, a quarter of float32 — at
~38 dB SNR, which is transparent to ASR front-ends (log-mel quantizes far
more aggressively than that).

Encode runs on the host (numpy, one pass); decode runs on device inside
the jitted mel+encoder program (see Qwen3ASR._encode_audio), so the only
thing that crosses the wire is the int8 payload.

No reference counterpart: the reference runs model and audio I/O in one
process (Sources/Qwen3ASR/Qwen3ASR.swift) and never stages PCM over a
network hop.
"""

from __future__ import annotations

import numpy as np

MU = 255.0
#: int8 quantization range — symmetric so decode is sign-exact
_QMAX = 127.0


def mulaw_encode_np(x: np.ndarray, mu: float = MU) -> np.ndarray:
    """float32 PCM in [-1, 1] → µ-law int8 in [-127, 127] (host side)."""
    x = np.clip(x, -1.0, 1.0)
    y = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    return np.round(y * _QMAX).astype(np.int8)


def mulaw_decode(y, mu: float = MU):
    """µ-law int8 → float32 PCM. jnp-safe: call inside jit on device."""
    import jax.numpy as jnp

    yf = y.astype(jnp.float32) / _QMAX
    return jnp.sign(yf) * ((1.0 + mu) ** jnp.abs(yf) - 1.0) / mu


def mulaw_decode_np(y: np.ndarray, mu: float = MU) -> np.ndarray:
    """Host-side decode (tests, non-jit callers)."""
    yf = y.astype(np.float32) / _QMAX
    return np.sign(yf) * ((1.0 + mu) ** np.abs(yf) - 1.0) / mu

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

# -- native fast path --------------------------------------------------- #
# Encoding burns real host CPU (numpy: ~160 ms µ-law / ~90 ms pcm4 per
# 7.7M-sample batch on a 1-core host) and holds work the latency lane
# queues behind. runtime/wire_codec.cpp does the same transforms with the
# GIL released (ctypes); numpy remains the reference implementation and
# the fallback when g++ is unavailable. Threshold: tiny buffers stay in
# numpy (ctypes setup outweighs the loop).
_NATIVE_MIN_SAMPLES = 65536
_native_lib = None  # False = tried and unavailable


def _native():
    global _native_lib
    if _native_lib is None:
        try:
            import ctypes

            from ..pipeline.engine import _RUNTIME_DIR, ensure_library

            ensure_library()  # builds both .so targets via make
            lib = ctypes.CDLL(str(_RUNTIME_DIR / "build" / "libwirecodec.so"))
            lib.qs_mulaw_encode.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int8),
                ctypes.c_int64]
            lib.qs_pcm4_encode.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint16)]
            if hasattr(lib, "qs_dpcm4_encode"):  # absent in pre-dpcm4 builds
                lib.qs_dpcm4_encode.argtypes = list(lib.qs_pcm4_encode.argtypes)
            _native_lib = lib
        except Exception:  # noqa: BLE001 — fall back to numpy
            _native_lib = False
    return _native_lib or None


def mulaw_encode_np(x: np.ndarray, mu: float = MU) -> np.ndarray:
    """float32 PCM in [-1, 1] → µ-law int8 in [-127, 127] (host side)."""
    lib = _native() if (mu == MU and x.dtype == np.float32
                        and x.size >= _NATIVE_MIN_SAMPLES) else None
    if lib is not None:
        import ctypes

        x = np.ascontiguousarray(x)
        out = np.empty(x.shape, np.int8)
        lib.qs_mulaw_encode(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), x.size)
        return out
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


# --------------------------------------------------------------------- #
# 4-bit block-scaled PCM ("pcm4"): half of µ-law int8's wire bytes.
#
# Congested-tunnel arithmetic (docs/benchmarks.md): the steady-state floor
# is transfer-bound, so halving bytes/sample converts ~1:1 into floor
# throughput. Format: 2 samples/byte (signed nibbles, |q| <= 7, UNIFORM
# within a block) + one float16 max-|x| scale per 128-sample (8 ms) block
# (+3.1% overhead). Uniform-in-block beats µ-law-in-block (measured 21 vs
# 12 dB on speech-shaped signals): the per-block scale already absorbs
# the dynamic range µ-law's log curve exists for, and uniform spends its
# 15 levels on in-block resolution. Decode is pure elementwise + one
# broadcast multiply — fully parallel on device, no sequential state.
#
# "dpcm4" below is the better 4-bit codec at ~the same bytes: closed-loop
# first-order DPCM (the ADPCM family, G.726 class). The sequential
# feedback loop lives ONLY in the host encoder — with the predictor
# x̂[i] = r[i-1], the reconstruction is r[i] = r0 + Σ q[j]·s, so the
# DEVICE decode is a parallel per-block cumsum, not a serialized scan.
# Speech's sample-to-sample correlation makes the delta signal small, so
# the same 15 levels buy ~5-6 dB more SNR (measured 25.2 vs 19.8 dB on
# speech-shaped signals). Wire: packed nibbles (block's nibble 0 unused)
# + per-block (delta-scale, first-sample) float16 pairs — 0.547 B/sample
# vs pcm4's 0.531.
#
# Measured on speech-shaped signals (tests/test_companding.py): ~21 dB
# wave SNR, log-mel rms error ~0.05 log10 units (vs ~0.007 for 8-bit
# µ-law over a 1.8 dyn-range) — comparable bitrate and SNR class to
# G.726 toll-quality telephony, but still lossier than 8-bit: serving
# default remains "mulaw"; "pcm4" is the congested-wire opt-in.

PCM4_BLOCK = 128
_Q4MAX = 7.0


def pcm4_encode_np(x: np.ndarray):
    """float32 PCM [..., N] (N a multiple of 2*PCM4_BLOCK) → (packed
    uint8 [..., N//2], scales float16 [..., N//PCM4_BLOCK])."""
    n = x.shape[-1]
    if n % (2 * PCM4_BLOCK):
        raise ValueError(f"pcm4 length {n} not a multiple of {2 * PCM4_BLOCK}")
    lib = _native() if (x.dtype == np.float32
                        and x.size >= _NATIVE_MIN_SAMPLES) else None
    if lib is not None:
        import ctypes

        x2 = np.ascontiguousarray(x.reshape(-1, n))
        rows = x2.shape[0]
        packed = np.empty((rows, n // 2), np.uint8)
        scales = np.empty((rows, n // PCM4_BLOCK), np.uint16)
        lib.qs_pcm4_encode(
            x2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), rows, n,
            PCM4_BLOCK,
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            scales.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
        return (packed.reshape(*x.shape[:-1], n // 2),
                scales.view(np.float16).reshape(*x.shape[:-1], n // PCM4_BLOCK))
    blocks = x.reshape(*x.shape[:-1], n // PCM4_BLOCK, PCM4_BLOCK)
    scale = np.maximum(np.abs(blocks).max(axis=-1), 1e-5).astype(np.float16)
    # quantize against the float16-rounded scale the decoder will see, so
    # |q| <= 7 exactly and the roundtrip is centered
    y = blocks / scale[..., None].astype(np.float32)
    q = np.clip(np.round(y * _Q4MAX), -7, 7).astype(np.int8).reshape(*x.shape[:-1], n)
    packed = (q[..., 0::2] & 0xF) | ((q[..., 1::2] & 0xF) << 4)
    return packed.astype(np.uint8), scale


def pcm4_decode(packed, scales):
    """(uint8 [..., N//2], float16 [..., N//128]) → float32 PCM [..., N].
    jnp-safe: call inside jit on device."""
    import jax.numpy as jnp

    lo = (packed & 0xF).astype(jnp.int32)
    hi = ((packed >> 4) & 0xF).astype(jnp.int32)
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    q = jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)
    x = q.astype(jnp.float32) / _Q4MAX
    x = x.reshape(*x.shape[:-1], scales.shape[-1], PCM4_BLOCK)
    x = x * scales.astype(jnp.float32)[..., None]
    return x.reshape(*packed.shape[:-1], -1)


def pcm4_decode_np(packed: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Host-side decode (tests, non-jit callers)."""
    lo = (packed & 0xF).astype(np.int32)
    hi = ((packed >> 4) & 0xF).astype(np.int32)
    lo = np.where(lo > 7, lo - 16, lo)
    hi = np.where(hi > 7, hi - 16, hi)
    q = np.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)
    x = q.astype(np.float32) / _Q4MAX
    x = x.reshape(*x.shape[:-1], scales.shape[-1], PCM4_BLOCK)
    x = x * scales.astype(np.float32)[..., None]
    return x.reshape(*packed.shape[:-1], -1)


# --------------------------------------------------------------------- #
# 4-bit closed-loop DPCM ("dpcm4") — see the block comment above.


def dpcm4_encode_np(x: np.ndarray):
    """float32 PCM [..., N] (N a multiple of 2*PCM4_BLOCK) → (packed
    uint8 [..., N//2], scales2 float16 [..., 2*N//PCM4_BLOCK]).

    scales2 interleaves (delta_scale, first_sample) per block. The
    encoder quantizes each delta against the RECONSTRUCTED previous
    sample (closed loop), so quantization error never accumulates
    through the block's cumsum — the open-loop variant loses ~12 dB to
    exactly that accumulation."""
    n = x.shape[-1]
    if n % (2 * PCM4_BLOCK):
        raise ValueError(f"dpcm4 length {n} not a multiple of {2 * PCM4_BLOCK}")
    lib = _native() if (x.dtype == np.float32
                        and x.size >= _NATIVE_MIN_SAMPLES) else None
    if lib is not None and not hasattr(lib, "qs_dpcm4_encode"):
        lib = None  # stale pre-dpcm4 .so already loaded in this process
    if lib is not None:
        import ctypes

        x2 = np.ascontiguousarray(x.reshape(-1, n))
        rows = x2.shape[0]
        packed = np.empty((rows, n // 2), np.uint8)
        scales2 = np.empty((rows, 2 * n // PCM4_BLOCK), np.uint16)
        lib.qs_dpcm4_encode(
            x2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), rows, n,
            PCM4_BLOCK,
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            scales2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
        return (packed.reshape(*x.shape[:-1], n // 2),
                scales2.view(np.float16).reshape(*x.shape[:-1],
                                                 2 * n // PCM4_BLOCK))
    lead = x.shape[:-1]
    nb = n // PCM4_BLOCK
    blocks = x.reshape(*lead, nb, PCM4_BLOCK).astype(np.float32)
    d = np.diff(blocks, axis=-1)
    scale = np.maximum(np.abs(d).max(axis=-1) / _Q4MAX, 1e-6).astype(np.float16)
    x0 = blocks[..., 0].astype(np.float16)
    s = scale.astype(np.float32)
    r = x0.astype(np.float32)
    q = np.zeros(blocks.shape, np.int8)
    for i in range(1, PCM4_BLOCK):
        e = blocks[..., i] - r
        qi = np.clip(np.round(e / s), -7, 7)
        r = r + qi * s
        q[..., i] = qi
    qf = q.reshape(*lead, n)
    packed = (qf[..., 0::2] & 0xF) | ((qf[..., 1::2] & 0xF) << 4)
    scales2 = np.stack([scale, x0], axis=-1).reshape(*lead, 2 * nb)
    return packed.astype(np.uint8), scales2


def _unpack_nibbles(packed, xp):
    lo = (packed & 0xF).astype(xp.int32)
    hi = ((packed >> 4) & 0xF).astype(xp.int32)
    lo = xp.where(lo > 7, lo - 16, lo)
    hi = xp.where(hi > 7, hi - 16, hi)
    return xp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)


def dpcm4_decode(packed, scales2):
    """(uint8 [..., N//2], float16 [..., 2*N//128]) → float32 PCM.
    jnp-safe: the per-block reconstruction is ONE parallel cumsum."""
    import jax.numpy as jnp

    q = _unpack_nibbles(packed, jnp)
    nb = scales2.shape[-1] // 2
    pairs = scales2.reshape(*scales2.shape[:-1], nb, 2).astype(jnp.float32)
    scale, x0 = pairs[..., 0], pairs[..., 1]
    inc = q.reshape(*q.shape[:-1], nb, PCM4_BLOCK).astype(jnp.float32) \
        * scale[..., None]
    inc = inc.at[..., 0].set(0.0)
    x = x0[..., None] + jnp.cumsum(inc, axis=-1)
    return x.reshape(*packed.shape[:-1], -1)


def dpcm4_decode_np(packed: np.ndarray, scales2: np.ndarray) -> np.ndarray:
    """Host-side decode (tests, non-jit callers)."""
    q = _unpack_nibbles(packed, np)
    nb = scales2.shape[-1] // 2
    pairs = scales2.reshape(*scales2.shape[:-1], nb, 2).astype(np.float32)
    scale, x0 = pairs[..., 0], pairs[..., 1]
    inc = q.reshape(*q.shape[:-1], nb, PCM4_BLOCK).astype(np.float32) \
        * scale[..., None]
    inc[..., 0] = 0.0
    x = x0[..., None] + np.cumsum(inc, axis=-1)
    return x.reshape(*packed.shape[:-1], -1)

"""Sample-rate conversion.

TPU-native analog of the reference's AVAudioConverter / sinc resampler
(reference: Sources/AudioCommon/AudioFileLoader.swift:159-180). Host path
uses scipy's polyphase resampler; the JAX path resamples in the Fourier
domain (rfft → spectrum truncate/pad → irfft), which jits quickly on every
backend and keeps long-audio pipelines on device. (A time-domain FIR
formulation was rejected: XLA CPU compiles long-kernel convolutions
pathologically slowly, and FFT resampling is equally accurate for the
band-limited speech signals handled here.)
"""

from __future__ import annotations

import math

import numpy as np


def resample(samples: np.ndarray, from_rate: int, to_rate: int) -> np.ndarray:
    """Polyphase resample float32 mono audio (host, scipy)."""
    if from_rate == to_rate:
        return samples
    if from_rate <= 0 or to_rate <= 0:
        raise ValueError("sample rates must be positive")
    from scipy.signal import resample_poly

    g = math.gcd(from_rate, to_rate)
    up, down = to_rate // g, from_rate // g
    out = resample_poly(samples.astype(np.float64), up, down)
    return out.astype(np.float32)


def _fourier_resample(x, out_len: int):
    import jax.numpy as jnp

    n = x.shape[-1]
    spec = jnp.fft.rfft(x)
    n_out_bins = out_len // 2 + 1
    n_in_bins = spec.shape[-1]
    if n_out_bins <= n_in_bins:  # downsample: truncate spectrum
        spec = spec[..., :n_out_bins]
    else:  # upsample: zero-pad spectrum
        pad = [(0, 0)] * (spec.ndim - 1) + [(0, n_out_bins - n_in_bins)]
        spec = jnp.pad(spec, pad)
    out = jnp.fft.irfft(spec, n=out_len)
    return out * (out_len / n)


def resample_jax(samples, from_rate: int, to_rate: int, num_taps: int = 0):
    """Fourier-domain resampler (jit-able; TPU FFT via XLA).

    ``num_taps`` is accepted for API compatibility and ignored.
    """
    import jax.numpy as jnp

    if from_rate == to_rate:
        return jnp.asarray(samples, jnp.float32)
    x = jnp.asarray(samples, jnp.float32)
    g = math.gcd(from_rate, to_rate)
    up, down = to_rate // g, from_rate // g
    out_len = int(np.ceil(x.shape[-1] * up / down))
    return _fourier_resample(x, out_len)

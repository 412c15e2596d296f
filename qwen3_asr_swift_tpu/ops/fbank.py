"""Kaldi-style log-mel filterbank features as fused XLA matmuls.

TPU-native analog of the reference's Kaldi fbank
(reference: Sources/SpeechWakeWord/KaldiFbank.swift, used by the wake-word
model; WeSpeaker/CAM++ use the same family). Kaldi semantics:

- frames of 25 ms / 10 ms hop, snip-edges (no padding: frame i covers
  [i*hop, i*hop+win)), dither off for inference
- per-frame: remove DC offset, optional pre-emphasis 0.97 (with edge
  duplication), povey window (hann^0.85)
- FFT 512 (next pow2 of 400), power spectrum
- mel filterbank with KALDI HTK mel scale (2595 log10(1+f/700)),
  no filter-area normalization
- log(max(x, eps))
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def hz_to_mel_htk(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz, np.float64) / 700.0)


def mel_to_hz_htk(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def kaldi_mel_banks(num_bins: int = 80, n_fft: int = 512, sample_rate: int = 16000,
                    low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """[n_fft/2+1, num_bins] triangular filters on the HTK mel scale
    (Kaldi convention: bins exclude the Nyquist term handling differences;
    filters unnormalized)."""
    if high_freq <= 0.0:
        high_freq = sample_rate / 2.0 + high_freq
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.arange(n_freqs) * sample_rate / n_fft
    mel_lo, mel_hi = hz_to_mel_htk(low_freq), hz_to_mel_htk(high_freq)
    mel_pts = np.linspace(mel_lo, mel_hi, num_bins + 2)
    fmel = hz_to_mel_htk(fft_freqs)
    fb = np.zeros((n_freqs, num_bins))
    for m in range(num_bins):
        left, center, right = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        up = (fmel - left) / (center - left)
        down = (right - fmel) / (right - center)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _povey_dft(frame_len: int = 400, n_fft: int = 512, preemph: float = 0.97
               ) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) DFT bases with the povey window folded in; pre-emphasis
    is handled per frame before windowing (not foldable), so these carry
    the window only."""
    n = np.arange(frame_len, dtype=np.float64)
    povey = (0.5 - 0.5 * np.cos(2 * np.pi * n / (frame_len - 1))) ** 0.85
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)
    phase = 2 * np.pi * np.outer(n, k) / n_fft
    return (
        (povey[:, None] * np.cos(phase)).astype(np.float32),
        (povey[:, None] * -np.sin(phase)).astype(np.float32),
    )


def kaldi_fbank(audio, num_bins: int = 80, frame_len: int = 400, hop: int = 160,
                n_fft: int = 512, preemph: float = 0.97, remove_dc: bool = True,
                sample_rate: int = 16000):
    """audio: [T] float32 (Kaldi scale: ×32768 of [-1,1] — pass raw [-1,1];
    scaling only shifts the log by a constant which embedding models
    normalize away, but multiply by 32768 first for bit-parity).
    Returns [n_frames, num_bins] log-mel (snip-edges)."""
    t = audio.shape[-1]
    n_frames = max(0, 1 + (t - frame_len) // hop)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :]
    frames = audio[idx]  # [F, frame_len]

    if remove_dc:
        frames = frames - frames.mean(axis=-1, keepdims=True)
    if preemph > 0:
        shifted = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=-1)
        frames = frames - preemph * shifted

    cos_m, sin_m = _povey_dft(frame_len, n_fft, preemph)
    re = frames @ jnp.asarray(cos_m)
    im = frames @ jnp.asarray(sin_m)
    power = re * re + im * im

    fb = jnp.asarray(kaldi_mel_banks(num_bins, n_fft, sample_rate))
    mel = power @ fb
    return jnp.log(jnp.maximum(mel, 1.1921e-7))  # Kaldi epsilon (float32 eps)

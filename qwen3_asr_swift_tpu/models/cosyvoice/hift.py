"""CosyVoice3 HiFT vocoder (HiFi-GAN + iSTFT + neural source filter).

The published CausalHiFTGenerator topology: F0 predictor (5 causal convs +
ELU + |linear|), nearest ×480 F0 upsample, harmonic sine source (9
harmonics, tanh-merged), STFT(16/4)-as-conv of the source injected at each
decoder stage, conv_pre(80→512, 4-frame lookahead), 3 channel-halving
stages (nearest-upsample ×[8,5,3] + causal conv k=[16,11,7]) each with
source injection + 3-kernel MRF resblocks (Snake activations, raw alpha),
conv_post → 9 log-magnitude + 9 phase bins → iSTFT overlap-add → ±0.99.

Reference: Sources/CosyVoiceTTS/HiFiGAN.swift (Snake :10-26, ResBlock
:176-222, SineGenerator :229-291, SourceModuleHnNSF :297-329, F0Predictor
:336-374, stft/istft :399-620, HiFiGANGenerator :635-869). Checkpoint keys
per WeightLoading.swift:214-330 (handled by convert.py).

TPU shape: STFT is a single strided conv against a fused window·DFT
kernel; iSTFT is matmul + static segment overlap-add; everything jits into
one program per mel-length bucket.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.nn import init_linear, linear


@dataclasses.dataclass(frozen=True)
class CosyHiFTConfig:
    in_channels: int = 80
    base_channels: int = 512
    nb_harmonics: int = 8
    sample_rate: int = 24000
    nsf_alpha: float = 0.1        # sine amplitude
    nsf_sigma: float = 0.003      # additive noise std
    nsf_voiced_threshold: float = 10.0
    upsample_rates: Tuple[int, ...] = (8, 5, 3)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 11, 7)
    istft_n_fft: int = 16
    istft_hop_len: int = 4
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[int, ...] = (1, 3, 5)
    source_resblock_kernel_sizes: Tuple[int, ...] = (7, 7, 11)
    source_down_strides: Tuple[int, ...] = (15, 3, 1)
    source_down_kernels: Tuple[int, ...] = (30, 6, 1)
    lrelu_slope: float = 0.1
    audio_limit: float = 0.99
    conv_pre_kernel: int = 5      # right-padded (4-frame lookahead)
    f0_hidden: int = 512
    f0_layers: int = 5

    @property
    def total_upsample(self) -> int:
        return int(np.prod(self.upsample_rates))

    @property
    def samples_per_frame(self) -> int:
        return self.total_upsample * self.istft_hop_len  # 480


def hift_config_tiny() -> CosyHiFTConfig:
    return CosyHiFTConfig(
        in_channels=16, base_channels=32, upsample_rates=(2, 2), upsample_kernel_sizes=(4, 3),
        istft_n_fft=8, istft_hop_len=2, resblock_kernel_sizes=(3,),
        source_resblock_kernel_sizes=(3, 3), source_down_strides=(2, 1),
        source_down_kernels=(4, 1), f0_hidden=16, f0_layers=2)


# -- init ------------------------------------------------------------------------

def _conv_init(key, width, cin, cout, dtype=jnp.float32):
    scale = 1.0 / np.sqrt(width * cin)
    return {
        "kernel": (jax.random.normal(key, (width, cin, cout)) * scale).astype(dtype),
        "bias": jnp.zeros((cout,), dtype),
    }


def _resblock_init(key, channels, kernel, dilations, dtype=jnp.float32):
    ks = jax.random.split(key, 2 * len(dilations))
    return {
        "convs1": [_conv_init(ks[2 * j], kernel, channels, channels, dtype)
                   for j in range(len(dilations))],
        "convs2": [_conv_init(ks[2 * j + 1], kernel, channels, channels, dtype)
                   for j in range(len(dilations))],
        "alphas1": [jnp.ones((channels,), dtype) for _ in dilations],
        "alphas2": [jnp.ones((channels,), dtype) for _ in dilations],
    }


def init_hift_params(key, cfg: CosyHiFTConfig, dtype=jnp.float32) -> dict:
    n_stages = len(cfg.upsample_rates)
    ks = jax.random.split(key, 8 + cfg.f0_layers + 3 * n_stages
                          + n_stages * len(cfg.resblock_kernel_sizes))
    ki = iter(range(len(ks)))
    stft_ch = cfg.istft_n_fft + 2

    channels = [cfg.base_channels]
    for _ in range(n_stages):
        channels.append(channels[-1] // 2)

    p = {
        "f0_condnet": [], "f0_classifier": init_linear(ks[next(ki)], cfg.f0_hidden, 1, dtype=dtype),
        "source_linear": init_linear(ks[next(ki)], cfg.nb_harmonics + 1, 1, dtype=dtype),
        "conv_pre": _conv_init(ks[next(ki)], cfg.conv_pre_kernel, cfg.in_channels,
                               cfg.base_channels, dtype),
        "ups": [], "source_downs": [], "source_resblocks": [], "resblocks": [],
        "conv_post": _conv_init(ks[next(ki)], 7, channels[-1], stft_ch, dtype),
    }
    for i in range(cfg.f0_layers):
        cin = cfg.in_channels if i == 0 else cfg.f0_hidden
        kw = 4 if i == 0 else 3
        p["f0_condnet"].append(_conv_init(ks[next(ki)], kw, cin, cfg.f0_hidden, dtype))
    for i in range(n_stages):
        p["ups"].append(_conv_init(ks[next(ki)], cfg.upsample_kernel_sizes[i],
                                   channels[i], channels[i + 1], dtype))
        p["source_downs"].append(_conv_init(ks[next(ki)], cfg.source_down_kernels[i],
                                            stft_ch, channels[i + 1], dtype))
        p["source_resblocks"].append(_resblock_init(
            ks[next(ki)], channels[i + 1], cfg.source_resblock_kernel_sizes[i],
            cfg.resblock_dilations, dtype))
        for kernel in cfg.resblock_kernel_sizes:
            p["resblocks"].append(_resblock_init(ks[next(ki)], channels[i + 1], kernel,
                                                 cfg.resblock_dilations, dtype))
    return p


# -- primitives (all NLC: [B, T, C]) ----------------------------------------------

def _snake(x, alpha):
    """x + 1/(a+1e-9)·sin²(a·x), raw alpha (alpha_logscale=False —
    reference: HiFiGAN.swift:10-26)."""
    a = alpha.astype(jnp.float32)[None, None, :]
    xf = x.astype(jnp.float32)
    s = jnp.sin(a * xf)
    return (xf + (1.0 / (a + 1e-9)) * s * s).astype(x.dtype)


def _causal_conv(x, p, dilation=1, stride=1, pad_mode="left", pad_override=None):
    k = p["kernel"].shape[0]
    pad = (k - 1) * dilation if pad_override is None else pad_override
    padding = ((pad, 0),) if pad_mode == "left" else ((0, pad),)
    # inputs follow the param dtype (the source-STFT branch arrives fp32
    # regardless of model dtype); accumulation stays fp32 either way
    y = jax.lax.conv_general_dilated(
        x.astype(p["kernel"].dtype), p["kernel"], (stride,), padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"), preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(p["kernel"].dtype)


def _resblock(x, rp, dilations):
    """snake → dilated conv → snake → conv(d=1) → residual, per dilation
    (reference: HiFiGAN.swift:176-222)."""
    h = x
    for j, d in enumerate(dilations):
        xt = _snake(h, rp["alphas1"][j])
        xt = _causal_conv(xt, rp["convs1"][j], dilation=d)
        xt = _snake(xt, rp["alphas2"][j])
        xt = _causal_conv(xt, rp["convs2"][j], dilation=1)
        h = h + xt
    return h


def f0_predict(p, cfg: CosyHiFTConfig, mel):
    """mel [B, T, 80] → F0 [B, T] (Hz, non-negative). First conv k=4
    right-padded (lookahead), rest k=3 causal; ELU between
    (reference: HiFiGAN.swift:336-374)."""
    h = mel
    for i, cp in enumerate(p["f0_condnet"]):
        h = _causal_conv(h, cp, pad_mode="right" if i == 0 else "left")
        h = jnp.where(h > 0, h, jnp.exp(jnp.minimum(h, 0.0)) - 1.0)  # ELU
    return jnp.abs(linear(h, p["f0_classifier"])[..., 0])


def source_signal(p, cfg: CosyHiFTConfig, f0_up, key):
    """f0_up [B, S] (sample rate) → excitation [B, S]
    (reference: HiFiGAN.swift:229-329)."""
    k1, k2, k3 = jax.random.split(key, 3)
    b, s = f0_up.shape
    n_h = cfg.nb_harmonics + 1
    harmonics = jnp.arange(1, n_h + 1, dtype=jnp.float32)[None, None, :]
    freqs = f0_up[..., None] * harmonics / cfg.sample_rate          # [B, S, H]
    uv = (f0_up > cfg.nsf_voiced_threshold).astype(jnp.float32)[..., None]
    phase = jnp.cumsum(freqs * uv, axis=1) * (2.0 * np.pi)
    phase = phase + jax.random.uniform(k1, (b, 1, n_h), maxval=2.0 * np.pi)
    sines = cfg.nsf_alpha * jnp.sin(phase)
    noise = jax.random.normal(k2, sines.shape) * cfg.nsf_sigma
    sines = sines * uv + noise * (1.0 - uv)
    merged = jnp.tanh(linear(sines, p["source_linear"]))            # [B, S, 1]
    merged = merged + jax.random.normal(k3, merged.shape) * cfg.nsf_sigma
    return merged[..., 0]


def _stft_kernel(cfg: CosyHiFTConfig):
    """Fused hann-window · DFT kernel [n_fft, 1, n_fft+2] so STFT is one
    strided conv (real bins then imag bins)."""
    n, n_bins = cfg.istft_n_fft, cfg.istft_n_fft // 2 + 1
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))
    k_idx, n_idx = np.meshgrid(np.arange(n_bins), np.arange(n), indexing="ij")
    ang = 2.0 * np.pi * k_idx * n_idx / n
    real = (np.cos(ang) * w[None, :]).T                              # [n, n_bins]
    imag = (-np.sin(ang) * w[None, :]).T
    return jnp.asarray(np.concatenate([real, imag], axis=1)[:, None, :], jnp.float32)


def stft_source(sig, cfg: CosyHiFTConfig):
    """sig [B, S] → [B, T', n_fft+2] via reflect-pad + one strided conv."""
    n, hop = cfg.istft_n_fft, cfg.istft_hop_len
    c = n // 2
    sig = jnp.concatenate([sig[:, 1:c + 1][:, ::-1], sig, sig[:, -c - 1:-1][:, ::-1]], axis=1)
    y = jax.lax.conv_general_dilated(
        sig[..., None], _stft_kernel(cfg), (hop,), ((0, 0),),
        dimension_numbers=("NHC", "HIO", "NHC"), preferred_element_type=jnp.float32)
    return y


def istft(mag, phase, cfg: CosyHiFTConfig):
    """mag/phase [B, T', n_bins] → wav [B, (T'+n/hop-1)*hop] with hann
    window-sum normalization (reference: HiFiGAN.swift:502-620)."""
    n, hop = cfg.istft_n_fft, cfg.istft_hop_len
    n_bins = n // 2 + 1
    b, t = mag.shape[0], mag.shape[1]

    real = mag * jnp.cos(phase)
    imag = mag * jnp.sin(phase)
    # Fold conjugate symmetry into the IDFT matrices: bins 1..n_bins-2 count twice.
    mult = np.ones(n_bins); mult[1:n - n_bins + 1] = 2.0
    k_idx, n_idx = np.meshgrid(np.arange(n_bins), np.arange(n), indexing="ij")
    ang = 2.0 * np.pi * k_idx * n_idx / n
    a_mat = jnp.asarray(np.cos(ang) * mult[:, None] / n, jnp.float32)   # [n_bins, n]
    b_mat = jnp.asarray(-np.sin(ang) * mult[:, None] / n, jnp.float32)

    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))
    frames = (real.astype(jnp.float32) @ a_mat + imag.astype(jnp.float32) @ b_mat)
    frames = frames * jnp.asarray(w, jnp.float32)[None, None, :]     # [B, T', n]

    seg = n // hop
    out_len = (t + seg - 1) * hop
    segments = frames.reshape(b, t, seg, hop)
    acc = jnp.zeros((b, out_len), jnp.float32)
    for s in range(seg):
        flat = segments[:, :, s, :].reshape(b, t * hop)
        acc = acc.at[:, s * hop: s * hop + t * hop].add(flat)

    wsum = np.zeros(out_len, np.float32)
    for f in range(t):
        wsum[f * hop: f * hop + n] += (w * w).astype(np.float32)
    wsum = np.maximum(wsum, 1e-8)
    return acc / jnp.asarray(wsum)[None, :]


def hift_generate(p, cfg: CosyHiFTConfig, mel, key):
    """mel [B, T, 80] → wav [B, ~T*480] (reference: HiFiGAN.swift:755-858)."""
    f0 = f0_predict(p, cfg, mel)                                     # [B, T]
    factor = cfg.samples_per_frame
    f0_up = jnp.repeat(f0, factor, axis=1)                           # [B, T*480]
    src = source_signal(p, cfg, f0_up, key)                          # [B, T*480]
    src_stft = stft_source(src, cfg)                                 # [B, T'>=T*120, 18]

    x = _causal_conv(mel, p["conv_pre"], pad_mode="right")           # [B, T, 512]
    n_stages = len(cfg.upsample_rates)
    for i in range(n_stages):
        x = jnp.where(x > 0, x, cfg.lrelu_slope * x)
        r = cfg.upsample_rates[i]
        x = jnp.repeat(x, r, axis=1)                                 # nearest upsample
        x = _causal_conv(x, p["ups"][i])
        if i == n_stages - 1:
            x = jnp.concatenate([x[:, 1:2], x], axis=1)              # ReflectionPad1d((1,0))
        stride = cfg.source_down_strides[i]
        if stride > 1:
            s = _causal_conv(src_stft, p["source_downs"][i], stride=stride,
                             pad_override=stride - 1)
        else:
            s = _causal_conv(src_stft, p["source_downs"][i])
        s = _resblock(s, p["source_resblocks"][i], cfg.resblock_dilations)
        m = min(x.shape[1], s.shape[1])
        x = x[:, :m] + s[:, :m]
        n_k = len(cfg.resblock_kernel_sizes)
        fused = _resblock(x, p["resblocks"][i * n_k], cfg.resblock_dilations)
        for j in range(1, n_k):
            fused = fused + _resblock(x, p["resblocks"][i * n_k + j], cfg.resblock_dilations)
        x = fused / n_k

    x = jnp.where(x > 0, x, 0.01 * x)                                # final leaky (slope 0.01)
    x = _causal_conv(x, p["conv_post"])                              # [B, T_f, 18]
    n_bins = cfg.istft_n_fft // 2 + 1
    mag = jnp.exp(x[..., :n_bins].astype(jnp.float32))
    phase = jnp.sin(x[..., n_bins:2 * n_bins].astype(jnp.float32))
    wav = istft(mag, phase, cfg)
    return jnp.clip(wav, -cfg.audio_limit, cfg.audio_limit)

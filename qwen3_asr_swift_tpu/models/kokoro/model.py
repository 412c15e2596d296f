"""Kokoro-82M TTS — the real StyleTTS2-derived KModel graph.

BERT → duration → alignment → prosody (F0/N) → iSTFTNet decoder, matching
the published Kokoro-82M architecture (the reference runs this same graph
as one precompiled CoreML blob — Sources/KokoroTTS/KokoroModel.swift:5-8,
KokoroTTS.swift:43-130; the open checkpoint is hexgrad/Kokoro-82M
kokoro-v1_0.pth with module state-dicts bert / bert_encoder / predictor /
text_encoder / decoder — mapped in convert.py).

Pipeline (KModel.forward_with_tokens semantics):
  1. ALBERT over phoneme ids (albert.py) → bert_encoder Linear 768→512.
  2. ProsodyPredictor.text_encoder (DurationEncoder: 3× [BiLSTM(640→512),
     AdaLayerNorm(128,512)] with style re-append) → BiLSTM → sigmoid-sum
     duration head (50 bins) → round/clamp(min=1) / speed.
  3. Alignment: repeat-interleave token features by predicted durations —
     here a static-budget ``searchsorted`` gather (TPU-friendly: no
     data-dependent shapes; frames beyond the total are masked).
  4. F0/N: shared BiLSTM then 3 AdainResBlk1d towers (the middle one
     upsamples ×2) + 1×1 conv heads.
  5. Decoder: F0/N strided convs, AdainResBlk1d encode/decode stack with
     asr residual, then the iSTFTNet generator — harmonic source (NSF),
     noise convs/res, 2 ConvTranspose upsamples (×10, ×6), AdaIN Snake
     resblocks, conv_post → 11 mag + 11 phase bins → iSTFT (hop 5) ≈
     300 samples per frame @ 24 kHz.

Voice packs: [510, 1, 256] tensors indexed by phoneme count; first 128
dims condition the decoder, last 128 the prosody predictor.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import AudioChunk, SpeechGenerationModel
from ...ops.nn import init_linear, layer_norm, linear
from .albert import AlbertConfig, albert_config_tiny, albert_forward, init_albert_params
from .phonemizer import VOCAB_SIZE, phonemize, phonemes_to_ids

SAMPLE_RATE = 24000
MAX_PHONEMES = 510


@dataclasses.dataclass(frozen=True)
class KokoroConfig:
    vocab_size: int = 178
    hidden_dim: int = 512          # d_model
    style_dim: int = 128           # per-branch style (voice vector is 2×)
    n_dur_layers: int = 3
    max_dur: int = 50
    text_kernel: int = 5
    albert: AlbertConfig = dataclasses.field(default_factory=AlbertConfig)
    # decoder / iSTFTNet generator
    decoder_dim: int = 1024
    asr_res_dim: int = 64
    upsample_rates: Tuple[int, ...] = (10, 6)
    upsample_kernels: Tuple[int, ...] = (20, 12)
    upsample_initial: int = 512
    resblock_kernels: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[int, ...] = (1, 3, 5)
    gen_istft_n_fft: int = 20
    gen_istft_hop: int = 5
    nb_harmonics: int = 8
    voiced_threshold: float = 10.0
    sine_amp: float = 0.1
    noise_std: float = 0.003
    sample_rate: int = SAMPLE_RATE
    max_phonemes: int = MAX_PHONEMES

    @property
    def samples_per_frame(self) -> int:
        """Output samples per DURATION frame: the decoder's final
        AdainResBlk1d upsamples ×2 before the generator's upsample stack ×
        iSTFT hop (2·10·6·5 = 600 at 24 kHz — the published convention:
        hexgrad Kokoro emits duration.sum()·600 samples)."""
        return 2 * int(np.prod(self.upsample_rates)) * self.gen_istft_hop  # 600


CONFIG_82M = KokoroConfig()


def config_tiny() -> KokoroConfig:
    return KokoroConfig(
        vocab_size=VOCAB_SIZE, hidden_dim=16, style_dim=8, n_dur_layers=1, max_dur=6,
        text_kernel=3, albert=albert_config_tiny(),
        decoder_dim=16, asr_res_dim=4, upsample_rates=(2, 2), upsample_kernels=(4, 4),
        upsample_initial=16, resblock_kernels=(3,), resblock_dilations=(1, 2),
        gen_istft_n_fft=8, gen_istft_hop=2, max_phonemes=64)


# -- param init ------------------------------------------------------------------

def _lstm_init(key, i, h, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    s = 1.0 / np.sqrt(h)
    return {"wx": (jax.random.normal(k1, (i, 4 * h)) * s).astype(dtype),
            "wh": (jax.random.normal(k2, (h, 4 * h)) * s).astype(dtype),
            "bias": jnp.zeros((4 * h,), dtype)}


def _bilstm_init(key, i, h, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"fwd": _lstm_init(k1, i, h, dtype), "bwd": _lstm_init(k2, i, h, dtype)}


def _conv_init(key, width, cin, cout, bias=True, dtype=jnp.float32):
    scale = 1.0 / np.sqrt(width * cin)
    p = {"kernel": (jax.random.normal(key, (width, cin, cout)) * scale).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def _adain_init(key, style_dim, channels, dtype=jnp.float32):
    return {"fc": init_linear(key, style_dim, channels * 2, dtype=dtype)}


def _adain_resblk_init(key, cin, cout, style_dim, upsample=False, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    p = {
        "norm1": _adain_init(ks[0], style_dim, cin, dtype),
        "conv1": _conv_init(ks[1], 3, cin, cout, dtype=dtype),
        "norm2": _adain_init(ks[2], style_dim, cout, dtype),
        "conv2": _conv_init(ks[3], 3, cout, cout, dtype=dtype),
    }
    if cin != cout:
        p["conv1x1"] = _conv_init(ks[4], 1, cin, cout, bias=False, dtype=dtype)
    if upsample:
        # depthwise ConvTranspose1d(k=3, s=2, groups=cin) "pool"
        p["pool"] = _conv_init(ks[5], 3, 1, cin, dtype=dtype)
    return p


def _adain_resblock1_init(key, channels, kernel, dilations, style_dim, dtype=jnp.float32):
    n = len(dilations)
    ks = jax.random.split(key, 4 * n)
    return {
        "convs1": [_conv_init(ks[4 * j], kernel, channels, channels, dtype=dtype) for j in range(n)],
        "convs2": [_conv_init(ks[4 * j + 1], kernel, channels, channels, dtype=dtype) for j in range(n)],
        "adain1": [_adain_init(ks[4 * j + 2], style_dim, channels, dtype) for j in range(n)],
        "adain2": [_adain_init(ks[4 * j + 3], style_dim, channels, dtype) for j in range(n)],
        "alpha1": [jnp.ones((channels,), dtype) for _ in range(n)],
        "alpha2": [jnp.ones((channels,), dtype) for _ in range(n)],
    }


def init_kokoro_params(key, cfg: KokoroConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 64)
    ki = iter(range(64))
    d, sty = cfg.hidden_dim, cfg.style_dim

    # text encoder: embedding + 3 conv/LN blocks + BiLSTM
    text_encoder = {
        "embedding": (jax.random.normal(ks[next(ki)], (cfg.vocab_size, d)) * 0.02).astype(dtype),
        "cnn": [{"conv": _conv_init(ks[next(ki)], cfg.text_kernel, d, d, dtype=dtype),
                 "ln": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}}
                for _ in range(3)],
        "lstm": _bilstm_init(ks[next(ki)], d, d // 2, dtype),
    }

    # prosody predictor
    dur_encoder = []
    for _ in range(cfg.n_dur_layers):
        dur_encoder.append({
            "lstm": _bilstm_init(ks[next(ki)], d + sty, d // 2, dtype),
            "ada_ln": {"fc": init_linear(ks[next(ki)], sty, d * 2, dtype=dtype)},
        })
    predictor = {
        "dur_encoder": dur_encoder,
        "lstm": _bilstm_init(ks[next(ki)], d + sty, d // 2, dtype),
        "duration_proj": init_linear(ks[next(ki)], d, cfg.max_dur, dtype=dtype),
        "shared": _bilstm_init(ks[next(ki)], d + sty, d // 2, dtype),
        "F0": [_adain_resblk_init(ks[next(ki)], d, d, sty, dtype=dtype),
               _adain_resblk_init(ks[next(ki)], d, d // 2, sty, upsample=True, dtype=dtype),
               _adain_resblk_init(ks[next(ki)], d // 2, d // 2, sty, dtype=dtype)],
        "F0_proj": _conv_init(ks[next(ki)], 1, d // 2, 1, dtype=dtype),
        "N": [_adain_resblk_init(ks[next(ki)], d, d, sty, dtype=dtype),
              _adain_resblk_init(ks[next(ki)], d, d // 2, sty, upsample=True, dtype=dtype),
              _adain_resblk_init(ks[next(ki)], d // 2, d // 2, sty, dtype=dtype)],
        "N_proj": _conv_init(ks[next(ki)], 1, d // 2, 1, dtype=dtype),
    }

    # decoder
    dec = cfg.decoder_dim
    ch0 = cfg.upsample_initial
    n_up = len(cfg.upsample_rates)
    stft_ch = cfg.gen_istft_n_fft + 2
    gen = {
        "m_source": init_linear(ks[next(ki)], cfg.nb_harmonics + 1, 1, dtype=dtype),
        "noise_convs": [], "noise_res": [], "ups": [], "resblocks": [],
        "conv_post": _conv_init(ks[next(ki)], 7, ch0 // (2 ** n_up), stft_ch, dtype=dtype),
    }
    noise_kernels = list(cfg.resblock_kernels[-2:]) or [7]
    for i in range(n_up):
        c_cur = ch0 // (2 ** (i + 1))
        if i + 1 < n_up:
            stride_f0 = int(np.prod(cfg.upsample_rates[i + 1:]))
            gen["noise_convs"].append(_conv_init(ks[next(ki)], stride_f0 * 2, stft_ch, c_cur, dtype=dtype))
            nk = 7
        else:
            gen["noise_convs"].append(_conv_init(ks[next(ki)], 1, stft_ch, c_cur, dtype=dtype))
            nk = 11 if len(cfg.resblock_kernels) > 1 else cfg.resblock_kernels[-1]
        gen["noise_res"].append(_adain_resblock1_init(
            ks[next(ki)], c_cur, nk, cfg.resblock_dilations, sty, dtype))
        gen["ups"].append(_conv_init(ks[next(ki)], cfg.upsample_kernels[i],
                                     ch0 // (2 ** i), c_cur, dtype=dtype))
        for kern in cfg.resblock_kernels:
            gen["resblocks"].append(_adain_resblock1_init(
                ks[next(ki)], c_cur, kern, cfg.resblock_dilations, sty, dtype))

    decoder = {
        "F0_conv": _conv_init(ks[next(ki)], 3, 1, 1, dtype=dtype),
        "N_conv": _conv_init(ks[next(ki)], 3, 1, 1, dtype=dtype),
        "encode": _adain_resblk_init(ks[next(ki)], d + 2, dec, sty, dtype=dtype),
        "decode": [_adain_resblk_init(ks[next(ki)], dec + 2 + cfg.asr_res_dim, dec, sty, dtype=dtype)
                   for _ in range(3)]
                  + [_adain_resblk_init(ks[next(ki)], dec + 2 + cfg.asr_res_dim, ch0, sty,
                                        upsample=True, dtype=dtype)],
        "asr_res": _conv_init(ks[next(ki)], 1, d, cfg.asr_res_dim, dtype=dtype),
        "generator": gen,
    }

    return {
        "bert": init_albert_params(ks[next(ki)], cfg.albert, dtype),
        "bert_encoder": init_linear(ks[next(ki)], cfg.albert.hidden_size, d, dtype=dtype),
        "text_encoder": text_encoder,
        "predictor": predictor,
        "decoder": decoder,
    }


# -- primitives --------------------------------------------------------------------

def _lstm_scan(p, xs, reverse=False):
    """xs: [T, B, in] → [T, B, h]; torch gate order i,f,g,o."""
    h0 = jnp.zeros((xs.shape[1], p["wh"].shape[0]), jnp.float32)

    def step(carry, x):
        h, c = carry
        gates = (x.astype(jnp.float32) @ p["wx"].astype(jnp.float32)
                 + h @ p["wh"].astype(jnp.float32) + p["bias"].astype(jnp.float32))
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    _, ys = jax.lax.scan(step, (h0, h0), xs, reverse=reverse)
    return ys.astype(xs.dtype)


def _bilstm(p, x, n_valid):
    """Masked bidirectional LSTM over [B, T, C]. The backward direction
    starts at the last VALID step (torch packed-sequence semantics): the
    valid region is reversed via gather, scanned forward, un-gathered."""
    b, t, _ = x.shape
    xs = x.transpose(1, 0, 2)                                   # [T, B, C]
    fwd = _lstm_scan(p["fwd"], xs)
    idx = jnp.clip(n_valid - 1 - jnp.arange(t), 0, t - 1)
    bwd_in = xs[idx]
    bwd = _lstm_scan(p["bwd"], bwd_in)
    bwd = bwd[idx]                                              # involution: un-reverse
    return jnp.concatenate([fwd, bwd], axis=-1).transpose(1, 0, 2)


def _adain(x, p, s, n_valid=None, eps=1e-5):
    """Instance-norm over time then style scale/shift. x: [B, T, C],
    s: [B, sty]. ``n_valid`` restricts the statistics to the valid prefix
    — the buffers are padded to a static frame budget, and including the
    zero padding in mean/var would make the output depend on the bucket
    (the reference normalizes over the true length)."""
    h = linear(s, p["fc"])
    c = x.shape[-1]
    gamma, beta = h[:, :c], h[:, c:]
    xf = x.astype(jnp.float32)
    if n_valid is None:
        mean = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.var(xf, axis=1, keepdims=True)
    else:
        vm = (jnp.arange(x.shape[1]) < n_valid)[None, :, None].astype(jnp.float32)
        denom = jnp.maximum(vm.sum(axis=1, keepdims=True), 1.0)
        mean = (xf * vm).sum(axis=1, keepdims=True) / denom
        var = (jnp.square(xf - mean) * vm).sum(axis=1, keepdims=True) / denom
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return ((1 + gamma[:, None].astype(jnp.float32)) * normed
            + beta[:, None].astype(jnp.float32)).astype(x.dtype)


def _conv_same(x, p, dilation=1, stride=1):
    k = p["kernel"].shape[0]
    pad = (k - 1) * dilation // 2
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride,), ((pad, pad),), rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"), preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _conv_transpose_same(x, p, stride):
    """torch ConvTranspose1d(k, s, padding=(k-s)//2): trim (k-s)//2 per side."""
    k = p["kernel"].shape[0]
    y = jax.lax.conv_transpose(
        x, p["kernel"], (stride,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    trim = (k - stride) // 2
    if trim > 0:
        y = y[:, trim:-trim]
    return y.astype(x.dtype)


def _depthwise_convt_pool(x, p, cin):
    """The AdainResBlk1d 'pool' when upsampling: depthwise
    ConvTranspose1d(k=3, s=2, padding=1, output_padding=1) — output 2T.
    Expressed as an lhs-dilated grouped conv; convert.py stores the torch
    weight tap-flipped so no flip is needed here."""
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (1,), ((1, 2),), lhs_dilation=(2,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=cin, preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _lrelu(x, slope=0.2):
    return jnp.where(x > 0, x, slope * x)


def _adain_resblk(x, p, s, upsample=False, n_valid=None):
    """StyleTTS2 AdainResBlk1d: (residual + shortcut)/√2. x: [B, T, C].
    ``n_valid`` is the pre-upsample valid length (doubles internally)."""
    cin = x.shape[-1]
    n2 = None if n_valid is None else (2 * n_valid if upsample else n_valid)
    # residual
    h = _adain(x, p["norm1"], s, n_valid)
    h = _lrelu(h)
    if upsample:
        h = _depthwise_convt_pool(h, p["pool"], cin)
    h = _conv_same(h, p["conv1"])
    h = _adain(h, p["norm2"], s, n2)
    h = _lrelu(h)
    h = _conv_same(h, p["conv2"])
    # shortcut
    sc = x
    if upsample:
        sc = jnp.repeat(sc, 2, axis=1)  # nearest ×2
    if "conv1x1" in p:
        sc = _conv_same(sc, p["conv1x1"])
    return (h + sc) / np.sqrt(2.0)


def _snake(x, alpha):
    a = alpha.astype(jnp.float32)[None, None, :]
    xf = x.astype(jnp.float32)
    sn = jnp.sin(a * xf)
    return (xf + (1.0 / (a + 1e-9)) * sn * sn).astype(x.dtype)


def _adain_resblock1(x, p, s, dilations, n_valid=None):
    """iSTFTNet AdaINResBlock1: AdaIN → Snake → dilated conv → AdaIN →
    Snake → conv → residual, per dilation."""
    h = x
    for j, d in enumerate(dilations):
        xt = _adain(h, p["adain1"][j], s, n_valid)
        xt = _snake(xt, p["alpha1"][j])
        xt = _conv_same(xt, p["convs1"][j], dilation=d)
        xt = _adain(xt, p["adain2"][j], s, n_valid)
        xt = _snake(xt, p["alpha2"][j])
        xt = _conv_same(xt, p["convs2"][j], dilation=1)
        h = h + xt
    return h


# -- sub-modules --------------------------------------------------------------------

def text_encode(p, cfg: KokoroConfig, ids, n_valid, valid):
    """ids [B, T] → [B, T, d]. Conv/LN blocks with masking + BiLSTM."""
    x = jnp.take(p["embedding"], ids, axis=0)
    m = valid[..., None]
    x = jnp.where(m, x, 0.0)
    for blk in p["cnn"]:
        x = _conv_same(x, blk["conv"])
        x = layer_norm(x, blk["ln"]["weight"], blk["ln"]["bias"])
        x = _lrelu(x)
        x = jnp.where(m, x, 0.0)
    x = _bilstm(p["lstm"], x, n_valid)
    return jnp.where(m, x, 0.0)


def duration_encode(p, cfg: KokoroConfig, d_en, style, n_valid, valid):
    """DurationEncoder: per layer BiLSTM(d+sty → d) then AdaLayerNorm(d) and
    style re-append; returns [B, T, d+sty]."""
    b, t, _ = d_en.shape
    s_exp = jnp.broadcast_to(style[:, None, :], (b, t, style.shape[-1])).astype(d_en.dtype)
    m = valid[..., None]
    x = jnp.where(m, jnp.concatenate([d_en, s_exp], axis=-1), 0.0)
    for layer in p["dur_encoder"]:
        h = _bilstm(layer["lstm"], x, n_valid)                      # [B, T, d]
        # AdaLayerNorm: non-affine LN over channels + style scale/shift
        fc = linear(style, layer["ada_ln"]["fc"])
        c = h.shape[-1]
        gamma, beta = fc[:, :c], fc[:, c:]
        hf = h.astype(jnp.float32)
        mean = jnp.mean(hf, axis=-1, keepdims=True)
        var = jnp.var(hf, axis=-1, keepdims=True)
        h = ((1 + gamma[:, None]) * (hf - mean) * jax.lax.rsqrt(var + 1e-5)
             + beta[:, None]).astype(x.dtype)
        x = jnp.where(m, jnp.concatenate([h, s_exp], axis=-1), 0.0)
    return x


def prosody_f0n(p, cfg: KokoroConfig, en, style, n_frames=None):
    """en [B, F, d+sty] → (F0 [B, 2F], N [B, 2F])."""
    if n_frames is None:
        n_frames = jnp.asarray(en.shape[1], jnp.int32)
    x = _bilstm(p["shared"], en, n_frames)
    f0 = x
    nv = n_frames
    for i, blk in enumerate(p["F0"]):
        up = i == 1
        f0 = _adain_resblk(f0, blk, style, upsample=up, n_valid=nv)
        nv = 2 * nv if up else nv
    f0 = _conv_same(f0, p["F0_proj"])[..., 0]
    n = x
    nv = n_frames
    for i, blk in enumerate(p["N"]):
        up = i == 1
        n = _adain_resblk(n, blk, style, upsample=up, n_valid=nv)
        nv = 2 * nv if up else nv
    n = _conv_same(n, p["N_proj"])[..., 0]
    return f0, n


def _gen_istft(spec, phase, cfg: KokoroConfig):
    """mag/phase [B, T', bins] → wav [B, S] (hann, hop 5, n_fft 20)."""
    n, hop = cfg.gen_istft_n_fft, cfg.gen_istft_hop
    n_bins = n // 2 + 1
    b, t = spec.shape[0], spec.shape[1]
    real = spec * jnp.cos(phase)
    imag = spec * jnp.sin(phase)
    mult = np.ones(n_bins)
    mult[1:(n + 1) // 2] = 2.0
    k_idx, n_idx = np.meshgrid(np.arange(n_bins), np.arange(n), indexing="ij")
    ang = 2.0 * np.pi * k_idx * n_idx / n
    a_mat = jnp.asarray(np.cos(ang) * mult[:, None] / n, jnp.float32)
    b_mat = jnp.asarray(-np.sin(ang) * mult[:, None] / n, jnp.float32)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))
    frames = real.astype(jnp.float32) @ a_mat + imag.astype(jnp.float32) @ b_mat
    frames = frames * jnp.asarray(w, jnp.float32)[None, None, :]
    seg = n // hop
    out_len = (t + seg - 1) * hop
    segments = frames.reshape(b, t, seg, hop)
    acc = jnp.zeros((b, out_len), jnp.float32)
    for si in range(seg):
        acc = acc.at[:, si * hop: si * hop + t * hop].add(
            segments[:, :, si, :].reshape(b, t * hop))
    wsum = np.zeros(out_len, np.float32)
    for f in range(t):
        wsum[f * hop: f * hop + n] += (w * w).astype(np.float32)
    wsum = np.maximum(wsum, 1e-8)
    # torch.istft(center=True) trims n//2 from each end
    c = n // 2
    return (acc / jnp.asarray(wsum)[None, :])[:, c:-c] if out_len > 2 * c else acc


def _stft_kernel(cfg: KokoroConfig):
    n = cfg.gen_istft_n_fft
    n_bins = n // 2 + 1
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))
    k_idx, n_idx = np.meshgrid(np.arange(n_bins), np.arange(n), indexing="ij")
    ang = 2.0 * np.pi * k_idx * n_idx / n
    real = (np.cos(ang) * w[None, :]).T
    imag = (-np.sin(ang) * w[None, :]).T
    return jnp.asarray(np.concatenate([real, imag], axis=1)[:, None, :], jnp.float32)


def _harmonic_source(p, cfg: KokoroConfig, f0_frames, key):
    """f0 [B, F] (frame rate) → (mag, phase) STFT of the NSF excitation,
    each [B, F*spf/hop, bins] (reference harmonics recipe; StyleTTS2
    SourceModuleHnNSF + TorchSTFT)."""
    spf = cfg.samples_per_frame
    f0_up = jnp.repeat(f0_frames, spf, axis=1)                     # [B, S]
    k1, k2 = jax.random.split(key)
    b, s = f0_up.shape
    n_h = cfg.nb_harmonics + 1
    harmonics = jnp.arange(1, n_h + 1, dtype=jnp.float32)[None, None, :]
    rad = f0_up[..., None] * harmonics / cfg.sample_rate
    uv = (f0_up > cfg.voiced_threshold).astype(jnp.float32)[..., None]
    phase = jnp.cumsum(rad, axis=1) * (2.0 * np.pi)
    sines = cfg.sine_amp * jnp.sin(phase)
    noise_amp = uv * cfg.noise_std + (1.0 - uv) * cfg.sine_amp / 3.0
    sines = sines * uv + noise_amp * jax.random.normal(k1, sines.shape)
    har = jnp.tanh(linear(sines, p["m_source"]))[..., 0]           # [B, S]
    # STFT via fused window·DFT conv (center reflect pad)
    n, hop = cfg.gen_istft_n_fft, cfg.gen_istft_hop
    c = n // 2
    sig = jnp.concatenate([har[:, 1:c + 1][:, ::-1], har, har[:, -c - 1:-1][:, ::-1]], axis=1)
    y = jax.lax.conv_general_dilated(
        sig[..., None], _stft_kernel(cfg), (hop,), ((0, 0),),
        dimension_numbers=("NHC", "HIO", "NHC"), preferred_element_type=jnp.float32)
    n_bins = n // 2 + 1
    re, im = y[..., :n_bins], y[..., n_bins:]
    mag = jnp.sqrt(re * re + im * im + 1e-12)
    ph = jnp.arctan2(im, re)
    return jnp.concatenate([mag, ph], axis=-1)                     # [B, T', 2*bins]


def generator(p, cfg: KokoroConfig, x, style, f0_frames, key, n_valid=None):
    """iSTFTNet generator: x [B, F, upsample_initial] + style + F0 → wav.
    ``n_valid`` = valid length of x; scales with each upsample stage."""
    har = _harmonic_source(p, cfg, f0_frames, key)
    n_up = len(cfg.upsample_rates)
    n_k = len(cfg.resblock_kernels)
    for i in range(n_up):
        x = jnp.where(x > 0, x, 0.1 * x)                           # LRELU_SLOPE
        if i + 1 < n_up:
            stride_f0 = int(np.prod(cfg.upsample_rates[i + 1:]))
            pad = (stride_f0 + 1) // 2
            xs_k = p["noise_convs"][i]["kernel"]
            x_src = jax.lax.conv_general_dilated(
                har, xs_k, (stride_f0,), ((pad, pad),),
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=jnp.float32)
            x_src = (x_src + p["noise_convs"][i]["bias"].astype(jnp.float32)).astype(x.dtype)
        else:
            x_src = _conv_same(har.astype(x.dtype), p["noise_convs"][i])
        x = _conv_transpose_same(x, p["ups"][i], cfg.upsample_rates[i])
        if n_valid is not None:
            n_valid = n_valid * cfg.upsample_rates[i]
        if i == n_up - 1:
            x = jnp.concatenate([x[:, 1:2], x], axis=1)            # ReflectionPad1d((1,0))
            if n_valid is not None:
                n_valid = n_valid + 1
        x_src = _adain_resblock1(x_src, p["noise_res"][i], style,
                                 cfg.resblock_dilations, n_valid=n_valid)
        m = min(x.shape[1], x_src.shape[1])
        x = x[:, :m] + x_src[:, :m]
        acc = _adain_resblock1(x, p["resblocks"][i * n_k], style,
                               cfg.resblock_dilations, n_valid=n_valid)
        for j in range(1, n_k):
            acc = acc + _adain_resblock1(x, p["resblocks"][i * n_k + j], style,
                                         cfg.resblock_dilations, n_valid=n_valid)
        x = acc / n_k
    x = jnp.where(x > 0, x, 0.01 * x)
    x = _conv_same(x, p["conv_post"])
    n_bins = cfg.gen_istft_n_fft // 2 + 1
    spec = jnp.exp(x[..., :n_bins].astype(jnp.float32))
    phase = jnp.sin(x[..., n_bins:2 * n_bins].astype(jnp.float32))
    return _gen_istft(spec, phase, cfg)


def decode(p, cfg: KokoroConfig, asr, f0_curve, n_curve, style, key,
           n_frames=None):
    """StyleTTS2 istftnet Decoder.forward: asr [B, F, d], F0/N [B, 2F]."""
    f0 = _conv_same(f0_curve[..., None], p["F0_conv"], stride=2)    # [B, F, 1]
    nn_ = _conv_same(n_curve[..., None], p["N_conv"], stride=2)
    x = jnp.concatenate([asr, f0, nn_], axis=-1)
    x = _adain_resblk(x, p["encode"], style, n_valid=n_frames)
    asr_res = _conv_same(asr, p["asr_res"])
    res = True
    nv = n_frames
    for i, blk in enumerate(p["decode"]):
        up = (i == len(p["decode"]) - 1)
        if res:
            x = jnp.concatenate([x, asr_res, f0, nn_], axis=-1)
        x = _adain_resblk(x, blk, style, upsample=up, n_valid=nv)
        if up:
            res = False
            nv = None if nv is None else 2 * nv
    return generator(p["generator"], cfg, x, style, f0_curve, key, n_valid=nv)


# -- full forward --------------------------------------------------------------------

def kokoro_forward(params, cfg: KokoroConfig, ids, n_valid, ref_s, speed, key,
                   max_frames: int):
    """KModel.forward_with_tokens. ids [B=1, T] (0-padded), n_valid scalar,
    ref_s [B, 2*sty], speed scalar → (wav [B, S], total_frames, pred_dur)."""
    b, t = ids.shape
    valid = jnp.arange(t)[None, :] < n_valid
    s_pros = ref_s[:, cfg.style_dim:]
    s_dec = ref_s[:, :cfg.style_dim]

    bert_out = albert_forward(params["bert"], cfg.albert, ids, valid)
    d_en = linear(bert_out, params["bert_encoder"])                # [B, T, d]

    d = duration_encode(params["predictor"], cfg, d_en, s_pros, n_valid, valid)
    x = _bilstm(params["predictor"]["lstm"], d, n_valid)
    duration = linear(x, params["predictor"]["duration_proj"])    # [B, T, max_dur]
    duration = jnp.sum(jax.nn.sigmoid(duration.astype(jnp.float32)), axis=-1) / speed
    pred_dur = jnp.maximum(jnp.round(duration), 1.0).astype(jnp.int32)
    pred_dur = jnp.where(valid, pred_dur, 0)

    # alignment: frame f ← token searchsorted(cumsum(dur), f, 'right')
    cum = jnp.cumsum(pred_dur, axis=1)                             # [B, T]
    total = cum[:, -1]
    frames = jnp.arange(max_frames)
    tok_idx = jnp.searchsorted(cum[0], frames, side="right")
    tok_idx = jnp.clip(tok_idx, 0, t - 1)
    frame_valid = frames < total[0]

    fmask = frame_valid[None, :, None]
    en = jnp.where(fmask, d[:, tok_idx], 0.0)                      # [B, F, d+sty]
    f0_pred, n_pred = prosody_f0n(params["predictor"], cfg, en, s_pros, total[0])

    t_en = text_encode(params["text_encoder"], cfg, ids, n_valid, valid)
    asr = jnp.where(fmask, t_en[:, tok_idx], 0.0)
    wav = decode(params["decoder"], cfg, asr, f0_pred, n_pred, s_dec, key,
                 n_frames=total[0])
    return wav, total[0], pred_dur[0]


def trim_and_fade(wav: np.ndarray, sr: int = SAMPLE_RATE, window_s: float = 0.05,
                  silence_rms: float = 0.030, fade_s: float = 0.010) -> np.ndarray:
    """RMS-windowed trailing-artifact trim + fade
    (reference: KokoroTTS.swift:88-126 — 50 ms sustained-energy windows
    walked backwards, silenced tail, 10 ms linear fade)."""
    n = len(wav)
    if n == 0:
        return wav
    wav = wav.copy()
    win = max(1, int(window_s * sr))
    speech_end = n
    i = n - win
    while i > 0:
        rms = float(np.sqrt(np.mean(np.square(wav[i:i + win]))))
        if rms > silence_rms:
            speech_end = i + win
            break
        i -= win // 2
    if speech_end < n:
        wav[speech_end:] = 0.0
    fade = min(speech_end, int(fade_s * sr))
    if fade >= 2:
        wav[speech_end - fade:speech_end] *= np.linspace(1.0, 0.0, fade, dtype=np.float32)
    return wav


class KokoroTTS(SpeechGenerationModel):
    """Public surface mirrors the reference KokoroTTSModel
    (synthesize(text, voice, language, speed), available_voices, warm_up)."""

    def __init__(self, cfg: KokoroConfig, params,
                 voices: Optional[Dict[str, np.ndarray]] = None, dtype=jnp.float32,
                 lexicon=None):
        self.cfg = cfg
        self.params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
        self.voices = voices or {"af_heart": np.zeros((cfg.style_dim * 2,), np.float32)}
        # instance-scoped pronunciation overlay (None = embedded dictionary)
        self.lexicon = lexicon
        self._loaded = True
        self._fwd = jax.jit(functools.partial(kokoro_forward, cfg=cfg),
                            static_argnames=("max_frames",))

    @classmethod
    def init_random(cls, cfg: Optional[KokoroConfig] = None, seed: int = 0, **kw) -> "KokoroTTS":
        cfg = cfg or config_tiny()
        return cls(cfg, init_kokoro_params(jax.random.PRNGKey(seed), cfg), **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "hexgrad/Kokoro-82M", cache_dir=None,
                        offline_mode: bool = False, dtype=jnp.float32, **kw) -> "KokoroTTS":
        from ...core.hub import download_weights
        from .convert import convert_checkpoint, load_voices

        model_dir = download_weights(
            model_id, cache_dir=cache_dir, offline_mode=offline_mode,
            additional_patterns=["*.pth", "voices/*", "*_gold.json", "*_silver.json"])
        params = convert_checkpoint(model_dir)
        voices = load_voices(model_dir)
        # snapshot gold/silver pronunciation dictionaries overlay the
        # embedded one, scoped to THIS instance (reference:
        # Phonemizer.swift loadDictionaries)
        from .phonemizer import load_dictionaries

        lexicon = load_dictionaries(model_dir)
        return cls(CONFIG_82M, params, voices=voices or None, dtype=dtype,
                   lexicon=lexicon, **kw)

    @property
    def available_voices(self):
        return sorted(self.voices)

    def _ref_s(self, voice: str, n_tokens: int) -> np.ndarray:
        v = self.voices.get(voice)
        if v is None:
            raise KeyError(f"voice {voice!r} not found; available: {self.available_voices[:5]}")
        v = np.asarray(v, np.float32)
        if v.ndim >= 2:  # [510, 1, 256] published packs: index by token count
            v = v.reshape(v.shape[0], -1)[min(n_tokens - 1, v.shape[0] - 1)]
        return v[: self.cfg.style_dim * 2]

    def synthesize(self, text: str, voice: Optional[str] = None, language: str = "en",
                   speed: float = 1.0, seed: int = 0, **kwargs) -> AudioChunk:
        voice = voice or self.available_voices[0]
        ids = phonemes_to_ids(phonemize(text, language, lexicon=self.lexicon))[
            : self.cfg.max_phonemes - 2]
        n_phonemes = len(ids)
        ids = [0, *ids, 0]  # pad tokens bracket the sequence (kokoro convention)
        n = len(ids)
        bucket = max(16, int(2 ** np.ceil(np.log2(n))))
        arr = np.zeros(bucket, np.int32)
        arr[:n] = ids
        # published packs index the style row by PHONEME count
        # (hexgrad: pack[len(ps) - 1]), not the bracket-padded length
        ref_s = self._ref_s(voice, max(1, n_phonemes))
        # frame budget: per-token durations reach ~24 frames at speed 1
        # but scale by 1/speed — a fixed 24 silently truncated slow speech
        per_tok = min(self.cfg.max_dur, int(np.ceil(24 / max(float(speed), 0.25))))
        max_frames = bucket * per_tok
        wav, total, _ = self._fwd(self.params, ids=jnp.asarray(arr)[None],
                                  n_valid=jnp.asarray(n, jnp.int32),
                                  ref_s=jnp.asarray(ref_s)[None],
                                  speed=jnp.asarray(speed, jnp.float32),
                                  key=jax.random.PRNGKey(seed),
                                  max_frames=max_frames)
        n_samples = int(total) * self.cfg.samples_per_frame
        samples = np.asarray(wav[0][:n_samples], np.float32)
        return AudioChunk(trim_and_fade(samples, self.cfg.sample_rate), self.cfg.sample_rate)

    def warm_up(self) -> None:
        self.synthesize("hello")

    def unload(self) -> None:
        self.params = None
        self._loaded = False

    @property
    def is_loaded(self) -> bool:
        return self._loaded

"""VibeVoice σ-VAE acoustic tokenizer (encoder + streaming decoder).

Encodec-style causal conv stacks: an SConv stem, per-stage strided
downsamples (ratios reversed for the encoder), Block1D towers
(ConvRMSNorm → depthwise conv k7 → layer-scale γ; RMSNorm → GELU FFN →
γ_ffn) and a head conv to the 64-d latent (7.5 Hz at 24 kHz, total ratio
3200). The decoder mirrors with causal SConvTranspose upsamples
(trim-right). σ-VAE sampling adds ``fix_std``·noise to the mean latent.

Reference: Sources/VibeVoiceTTS/Models/AcousticTokenizerEncoder.swift,
AcousticTokenizerDecoder.swift, Layers/StreamingConv1d.swift:25-66
(padding arithmetic), AcousticTokenizerConfiguration.swift:47-68
(defaults). Checkpoint keys handled in convert.py.

Streaming on TPU: causal convs mean a chunked decode with a left-context
overlap ≥ the receptive field reproduces the full decode exactly — no
carried conv caches needed under jit (tested in test_cosyvoice_vibevoice).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.nn import init_linear, linear, rms_norm


@dataclasses.dataclass(frozen=True)
class TokenizerConfig:
    channels: int = 1
    vae_dim: int = 64
    n_filters: int = 32
    ratios: Tuple[int, ...] = (8, 5, 5, 4, 2, 2)       # decoder order
    depths: Tuple[int, ...] = (3, 3, 3, 3, 3, 3, 8)    # per stage
    kernel: int = 7
    layer_scale_init: float = 1e-6
    rms_eps: float = 1e-5
    fix_std: float = 0.5
    disable_last_norm: bool = True

    @property
    def total_ratio(self) -> int:
        return int(np.prod(self.ratios))

    @property
    def encoder_ratios(self) -> Tuple[int, ...]:
        return tuple(reversed(self.ratios))

    @property
    def decoder_latent_receptive(self) -> int:
        """Latent-domain left receptive field of the causal decoder: the
        minimum ``left_context`` for which chunked decode is exact. Each
        causal conv of kernel k holds k-1 left taps at its stage's rate;
        dividing by the cumulative upsample converts to latent frames."""
        k1 = self.kernel - 1
        rf = k1 * (1 + self.depths[0])       # stage-0 conv + its blocks
        u = 1
        for i in range(1, len(self.depths)):
            rf += int(np.ceil(k1 / u))       # upsample conv (pre-upsample rate)
            u *= self.ratios[i - 1]
            rf += self.depths[i] * int(np.ceil(k1 / u))
        rf += int(np.ceil(k1 / u))           # head conv
        return rf


def tokenizer_config_tiny() -> TokenizerConfig:
    return TokenizerConfig(vae_dim=8, n_filters=4, ratios=(4, 2), depths=(1, 1, 1),
                           kernel=3)


def _conv_init(key, width, cin, cout, dtype=jnp.float32):
    scale = 1.0 / np.sqrt(width * cin)
    return {"kernel": (jax.random.normal(key, (width, cin, cout)) * scale).astype(dtype),
            "bias": jnp.zeros((cout,), dtype)}


def _block_init(key, dim, kernel, scale_init, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return {
        "norm": {"weight": jnp.ones((dim,), dtype)},
        "mixer": _conv_init(ks[0], kernel, 1, dim, dtype),   # depthwise: [k, 1, dim]
        "gamma": jnp.full((dim,), scale_init, dtype),
        "ffn_norm": {"weight": jnp.ones((dim,), dtype)},
        "ffn1": init_linear(ks[1], dim, 4 * dim, dtype=dtype),
        "ffn2": init_linear(ks[2], 4 * dim, dim, dtype=dtype),
        "ffn_gamma": jnp.full((dim,), scale_init, dtype),
    }


def init_tokenizer_params(key, cfg: TokenizerConfig, dtype=jnp.float32) -> dict:
    n_stages = len(cfg.depths)
    n_down = len(cfg.ratios)
    ks = iter(jax.random.split(key, 4 + 2 * (n_stages + sum(cfg.depths))))

    def stage_ch_enc(i):
        return cfg.n_filters * (2 ** i)

    enc = {"downsample_layers": [], "stages": [], "head": None}
    enc["downsample_layers"].append(_conv_init(next(ks), cfg.kernel, cfg.channels,
                                               cfg.n_filters, dtype))
    enc_ratios = cfg.encoder_ratios
    for i in range(n_down):
        enc["downsample_layers"].append(
            _conv_init(next(ks), enc_ratios[i] * 2, stage_ch_enc(i), stage_ch_enc(i + 1), dtype))
    for i in range(n_stages):
        for _ in range(cfg.depths[i]):
            enc["stages"].append(_block_init(next(ks), stage_ch_enc(i), cfg.kernel,
                                             cfg.layer_scale_init, dtype))
    enc["head"] = _conv_init(next(ks), cfg.kernel, stage_ch_enc(n_stages - 1), cfg.vae_dim, dtype)

    def stage_ch_dec(i):  # decoder stage i channel (before stage blocks)
        return cfg.n_filters * (2 ** (n_stages - 1 - i))

    dec = {"upsample_layers": [], "stages": [], "head": None}
    dec["upsample_layers"].append(
        _conv_init(next(ks), cfg.kernel, cfg.vae_dim, stage_ch_dec(0), dtype))
    for i in range(n_down):
        dec["upsample_layers"].append(
            _conv_init(next(ks), cfg.ratios[i] * 2, stage_ch_dec(i), stage_ch_dec(i + 1), dtype))
    for i in range(n_stages):
        for _ in range(cfg.depths[i]):
            dec["stages"].append(_block_init(next(ks), stage_ch_dec(i), cfg.kernel,
                                             cfg.layer_scale_init, dtype))
    dec["head"] = _conv_init(next(ks), cfg.kernel, stage_ch_dec(n_stages - 1), cfg.channels, dtype)
    return {"encoder": enc, "decoder": dec}


def _sconv(x, p, stride=1):
    """Encodec SConv1d, causal: left pad (k-1)-(s-1), extra right pad to
    complete the last frame (reference: StreamingConv1d.swift:25-66,
    89-117). x: [B, T, C]."""
    k = p["kernel"].shape[0]
    pad_total = (k - 1) - (stride - 1)
    length = x.shape[1]
    n_frames = (length - k + pad_total) / stride + 1
    ideal = (int(np.ceil(n_frames)) - 1) * stride + (k - pad_total)
    extra = max(ideal - length, 0)
    y = jax.lax.conv_general_dilated(
        x.astype(p["kernel"].dtype), p["kernel"], (stride,), ((pad_total, extra),),
        dimension_numbers=("NHC", "HIO", "NHC"), preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(p["kernel"].dtype)


def _sconv_transpose(x, p, stride):
    """Causal SConvTranspose1d: full transpose then trim (k - s) from the
    RIGHT (trim_right_ratio=1 — reference: StreamingConv1d.swift:269-371)."""
    k = p["kernel"].shape[0]
    y = jax.lax.conv_transpose(
        x.astype(p["kernel"].dtype), p["kernel"], (stride,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"), preferred_element_type=jnp.float32)
    y = y + p["bias"].astype(jnp.float32)
    trim = k - stride
    if trim > 0:
        y = y[:, :-trim]
    return y.astype(p["kernel"].dtype)


def _block(x, p, cfg: TokenizerConfig):
    dim = x.shape[-1]
    h = rms_norm(x, p["norm"]["weight"], cfg.rms_eps)
    h = _sconv_depthwise(h, p["mixer"], dim)
    x = x + h * p["gamma"].astype(x.dtype)
    h = rms_norm(x, p["ffn_norm"]["weight"], cfg.rms_eps)
    h = linear(jax.nn.gelu(linear(h, p["ffn1"]), approximate=False), p["ffn2"])
    return x + h * p["ffn_gamma"].astype(x.dtype)


def _sconv_depthwise(x, p, dim):
    k = p["kernel"].shape[0]
    y = jax.lax.conv_general_dilated(
        x.astype(p["kernel"].dtype), p["kernel"], (1,), ((k - 1, 0),),
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=dim,
        preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(p["kernel"].dtype)


def encode(p, cfg: TokenizerConfig, audio):
    """audio [B, S] → mean latents [B, T_lat, vae_dim]."""
    x = audio[..., None]
    offsets = np.cumsum([0] + list(cfg.depths))
    enc_ratios = cfg.encoder_ratios
    for i in range(len(cfg.depths)):
        stride = 1 if i == 0 else enc_ratios[i - 1]
        x = _sconv(x, p["encoder"]["downsample_layers"][i], stride=stride)
        for j in range(offsets[i], offsets[i + 1]):
            x = _block(x, p["encoder"]["stages"][j], cfg)
    return _sconv(x, p["encoder"]["head"])


def sample_latents(latents, key, fix_std: float):
    """σ-VAE sampling: mean + fix_std·ε (reference:
    AcousticTokenizerDecoder.swift:261-271)."""
    return latents + fix_std * jax.random.normal(key, latents.shape, latents.dtype)


def decode(p, cfg: TokenizerConfig, latents):
    """latents [B, T_lat, vae_dim] → audio [B, T_lat * total_ratio]."""
    x = latents
    offsets = np.cumsum([0] + list(cfg.depths))
    for i in range(len(cfg.depths)):
        if i == 0:
            x = _sconv(x, p["decoder"]["upsample_layers"][0])
        else:
            x = _sconv_transpose(x, p["decoder"]["upsample_layers"][i], cfg.ratios[i - 1])
        for j in range(offsets[i], offsets[i + 1]):
            x = _block(x, p["decoder"]["stages"][j], cfg)
    return _sconv(x, p["decoder"]["head"])[..., 0]


def decode_chunked(p, cfg: TokenizerConfig, latents, chunk: int = 16,
                   left_context: int | None = None):
    """Chunked decode with left-context re-computation: every conv in the
    decoder is causal, so with left_context ≥ the latent-domain receptive
    field the emitted samples equal the full decode exactly. The default
    derives that field from the config (a fixed small context was exact
    only for tiny test configs — the 0.5B decoder needs ~45 latent
    frames, and short contexts put audible seams at every boundary)."""
    if left_context is None:
        left_context = cfg.decoder_latent_receptive
    b, t, _ = latents.shape
    spf = cfg.total_ratio
    outs = []
    start = 0
    while start < t:
        ctx = min(left_context, start)
        end = min(start + chunk, t)
        wav = decode(p, cfg, latents[:, start - ctx:end])
        outs.append(wav[:, ctx * spf:])
        start = end
    return jnp.concatenate(outs, axis=1)

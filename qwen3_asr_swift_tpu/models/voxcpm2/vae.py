"""VoxCPM2 AudioVAE — DAC-style causal codec (16 kHz in → 64-d latents @
25 Hz → 48 kHz out).

Faithful to the reference's AudioVAE (reference:
Sources/VoxCPM2TTS/AudioVAE.swift):

  * ``Snake1d`` activations ``x + sin²(αx)/α`` with per-channel α,
  * encoder: CausalConv(k7) → 4 blocks (3 dilated depthwise residual units
    d=1/3/9 → snake → strided CausalConv k=2s, channel doubling from
    encoder_dim) → fc_mu CausalConv(k3) to latent_dim
    (AudioVAE.swift:430-462),
  * decoder: ConvStack(k7 depthwise + k1) → per-rate blocks (sample-rate
    scale/bias conditioning table → snake → causal transpose conv k=2s →
    3 residual units, channel halving from decoder_dim) → snake → conv_out
    k7 → tanh (AudioVAE.swift:464-561),
  * causal padding semantics: left-pad ``2·pad − output_padding`` zeros
    then VALID conv; transpose convs trim the same amount from the right
    (AudioVAE.swift:99-158).

Everything is an XLA conv program; weight-norm fusion happens at
conversion (convert.py), mirroring AudioVAE.sanitize
(AudioVAE.swift:647-683).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class AudioVAEConfig:
    encoder_dim: int = 128
    encoder_rates: Tuple[int, ...] = (2, 5, 8, 8)
    latent_dim: int = 64
    decoder_dim: int = 2048
    decoder_rates: Tuple[int, ...] = (8, 6, 5, 2, 2, 2)
    depthwise: bool = True
    sample_rate: int = 16000
    out_sample_rate: int = 48000
    sr_bin_boundaries: Tuple[int, ...] = (20000, 30000, 40000)

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.encoder_rates))

    @property
    def decode_chunk_size(self) -> int:
        return int(np.prod(self.decoder_rates))


CONFIG_VAE = AudioVAEConfig()


def vae_config_tiny() -> AudioVAEConfig:
    return AudioVAEConfig(encoder_dim=4, encoder_rates=(2, 4), latent_dim=8,
                          decoder_dim=16, decoder_rates=(4, 3, 2),
                          sr_bin_boundaries=(20000,))


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def snake(x, alpha):
    """x [B, L, C]; alpha [C]."""
    a = alpha[None, None, :]
    s = jnp.sin(a * x)
    return x + s * s / (a + 1e-9)


def causal_conv(x, p, *, stride=1, dilation=1, padding=0, output_padding=0):
    """NLC causal conv: left-pad 2·padding − output_padding zeros, VALID.
    p["w"]: [k, in/groups, out]."""
    lead = max(0, 2 * padding - output_padding)
    if lead:
        x = jnp.pad(x, ((0, 0), (lead, 0), (0, 0)))
    groups = x.shape[-1] // p["w"].shape[1]
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,), padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        y = y + p["b"]
    return y


def causal_transpose_conv(x, p, *, stride, padding, output_padding):
    """NLC causal transpose conv, trimming 2·padding − output_padding from
    the right.  p["w"]: [k, in/groups, out] with taps already flipped for
    the lhs-dilated formulation (convert handles the torch reindex)."""
    k = p["w"].shape[0]
    groups = x.shape[-1] // p["w"].shape[1]
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding=((k - 1, k - 1),),
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        y = y + p["b"]
    trim = 2 * padding - output_padding
    if trim > 0:
        y = y[:, :-trim]
    return y


def _residual_unit(x, p, dilation):
    h = snake(x, p["snake1"])
    h = causal_conv(h, p["conv1"], dilation=dilation, padding=3 * dilation)
    h = snake(h, p["snake2"])
    h = causal_conv(h, p["conv2"])
    return x + h


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------

def vae_encode(p, cfg: AudioVAEConfig, wave):
    """wave [B, S] at cfg.sample_rate (padded to hop multiples by the
    caller) → latents [B, S/hop, latent_dim]."""
    x = wave[:, :, None]
    x = causal_conv(x, p["encoder"]["conv_in"], padding=3)
    for bi, stride in enumerate(cfg.encoder_rates):
        bp = p["encoder"]["blocks"][bi]
        for ri, dil in enumerate((1, 3, 9)):
            x = _residual_unit(x, bp["res"][ri], dil)
        x = snake(x, bp["snake"])
        x = causal_conv(x, bp["conv"], stride=stride,
                        padding=int(np.ceil(stride / 2)), output_padding=stride % 2)
    return causal_conv(x, p["encoder"]["fc_mu"], padding=1)


def vae_decode(p, cfg: AudioVAEConfig, latents, sr: int | None = None):
    """latents [B, T, latent_dim] → wave [B, T·decode_chunk] at
    cfg.out_sample_rate."""
    sr = sr if sr is not None else cfg.out_sample_rate
    sr_idx = int(np.sum(np.asarray(cfg.sr_bin_boundaries) <= sr))
    # clamp to the checkpoint's table size (bin count is shape-inferred)
    sr_idx = min(sr_idx, p["decoder"]["blocks"][0]["sr_scale"].shape[0] - 1)
    x = latents
    x = causal_conv(x, p["decoder"]["conv_in0"], padding=3)
    x = causal_conv(x, p["decoder"]["conv_in1"])
    for bi, stride in enumerate(cfg.decoder_rates):
        bp = p["decoder"]["blocks"][bi]
        x = x * bp["sr_scale"][sr_idx][None, None] + bp["sr_bias"][sr_idx][None, None]
        x = snake(x, bp["snake"])
        x = causal_transpose_conv(x, bp["conv_t"], stride=stride,
                                  padding=int(np.ceil(stride / 2)),
                                  output_padding=stride % 2)
        for ri, dil in enumerate((1, 3, 9)):
            x = _residual_unit(x, bp["res"][ri], dil)
    x = snake(x, p["decoder"]["snake_out"])
    x = causal_conv(x, p["decoder"]["conv_out"], padding=3)
    return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------------------
# init (random weights for tests / CLI)
# ---------------------------------------------------------------------------

def init_vae_params(key, cfg: AudioVAEConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 256))

    def conv(k_size, cin, cout, groups=1, bias=True):
        w = (jax.random.normal(next(keys), (k_size, cin // groups, cout))
             / np.sqrt(k_size * cin / groups)).astype(dtype)
        p = {"w": w}
        if bias:
            p["b"] = jnp.zeros((cout,), dtype)
        return p

    def res_unit(dim, groups):
        return {"snake1": jnp.ones((dim,), dtype),
                "conv1": conv(7, dim, dim, groups=groups),
                "snake2": jnp.ones((dim,), dtype),
                "conv2": conv(1, dim, dim)}

    enc_blocks = []
    d = cfg.encoder_dim
    for stride in cfg.encoder_rates:
        nxt = d * 2
        groups = nxt // 2 if cfg.depthwise else 1
        enc_blocks.append({
            "res": [res_unit(d, groups) for _ in range(3)],
            "snake": jnp.ones((d,), dtype),
            "conv": conv(2 * stride, d, nxt),
        })
        d = nxt
    encoder = {
        "conv_in": conv(7, 1, cfg.encoder_dim),
        "blocks": enc_blocks,
        "fc_mu": conv(3, d, cfg.latent_dim),
    }

    n_bins = len(cfg.sr_bin_boundaries) + 1
    dec_blocks = []
    for i, stride in enumerate(cfg.decoder_rates):
        din = cfg.decoder_dim // (1 << i)
        dout = cfg.decoder_dim // (1 << (i + 1))
        groups = dout if cfg.depthwise else 1
        dec_blocks.append({
            "sr_scale": jnp.ones((n_bins, din), dtype),
            "sr_bias": jnp.zeros((n_bins, din), dtype),
            "snake": jnp.ones((din,), dtype),
            "conv_t": conv(2 * stride, din, dout),
            "res": [res_unit(dout, groups) for _ in range(3)],
        })
    d_last = cfg.decoder_dim // (1 << len(cfg.decoder_rates))
    decoder = {
        "conv_in0": conv(7, cfg.latent_dim, cfg.latent_dim,
                         groups=cfg.latent_dim if cfg.depthwise else 1),
        "conv_in1": conv(1, cfg.latent_dim, cfg.decoder_dim),
        "blocks": dec_blocks,
        "snake_out": jnp.ones((d_last,), dtype),
        "conv_out": conv(7, d_last, 1),
    }
    return {"encoder": encoder, "decoder": decoder}

"""Mimi neural audio codec: 24 kHz ⇄ 16 codebooks @ 12.5 Hz.

TPU-native analog of the reference's Mimi implementation
(reference: Sources/PersonaPlex/MimiCodec.swift:10-212, Seanet.swift):
SEANet conv encoder (strides 4,5,6,8 → 960× with the 2× frame resample)
→ small transformer → split RVQ (1 semantic + 15 acoustic, dim 256) →
mirrored decoder. All convolutions causal (streaming decode = chunked
causal decode, reference MimiStreamingDecoder).

Compact faithful structure; exact channel plan follows the published Mimi
config (base 512 channels, ratios [8, 6, 5, 4], frame 1920 samples).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..qwen3_tts.codec import causal_conv1d, causal_transpose_conv1d, _conv_init
from ...ops.attention import NEG_INF, sdpa
from ...ops.nn import init_linear, linear, rms_norm
from ...ops.rope import apply_rope, rope_angles


@dataclasses.dataclass(frozen=True)
class MimiConfig:
    sample_rate: int = 24000
    frame_rate: float = 12.5
    channels: int = 512
    latent_dim: int = 512
    ratios: Tuple[int, ...] = (8, 6, 5, 4)  # encoder downsample per stage (×2 resample → 1920)
    num_quantizers: int = 16
    codebook_size: int = 2048
    codebook_dim: int = 256
    transformer_layers: int = 4
    transformer_heads: int = 8

    @property
    def samples_per_frame(self) -> int:
        out = 2  # extra 2× conv resample stage
        for r in self.ratios:
            out *= r
        return out  # 1920


def config_tiny() -> MimiConfig:
    return MimiConfig(channels=16, latent_dim=16, ratios=(4, 4, 2, 2),
                      codebook_dim=8, transformer_layers=1, transformer_heads=2)


def init_mimi_params(key, cfg: MimiConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 32)
    c = cfg.channels
    params = {
        "enc_in": _conv_init(ks[0], 7, 1, max(1, c >> len(cfg.ratios)), dtype=dtype),
        "enc_stages": [],
        "enc_out": _conv_init(ks[1], 3, c, cfg.latent_dim, dtype=dtype),
        "dec_in": _conv_init(ks[2], 7, cfg.latent_dim, c, dtype=dtype),
        "dec_stages": [],
        "dec_out": _conv_init(ks[3], 7, max(1, c >> len(cfg.ratios)), 1, dtype=dtype),
        "downsample": _conv_init(ks[4], 4, cfg.latent_dim, cfg.latent_dim, dtype=dtype),  # extra 2×
        "upsample": _conv_init(ks[5], 4, cfg.latent_dim, cfg.latent_dim, dtype=dtype),
        "rvq_first": {
            "codebook": (jax.random.normal(ks[6], (1, cfg.codebook_size, cfg.codebook_dim)) * 0.05).astype(dtype),
            "in_proj": init_linear(ks[7], cfg.latent_dim, cfg.codebook_dim, bias=False, dtype=dtype),
            "out_proj": init_linear(ks[8], cfg.codebook_dim, cfg.latent_dim, bias=False, dtype=dtype),
        },
        "rvq_rest": {
            "codebook": (jax.random.normal(ks[9], (cfg.num_quantizers - 1, cfg.codebook_size, cfg.codebook_dim)) * 0.05).astype(dtype),
            "in_proj": init_linear(ks[10], cfg.latent_dim, cfg.codebook_dim, bias=False, dtype=dtype),
            "out_proj": init_linear(ks[11], cfg.codebook_dim, cfg.latent_dim, bias=False, dtype=dtype),
        },
        "transformer": [],
    }
    ch = max(1, c >> len(cfg.ratios))
    for i, ratio in enumerate(cfg.ratios):
        k = jax.random.split(ks[12 + i], 3)
        mid = max(1, ch // 2)  # bottleneck floor for tiny test configs
        params["enc_stages"].append({
            "res_conv1": _conv_init(k[0], 3, ch, mid, dtype=dtype),
            "res_conv2": _conv_init(k[1], 1, mid, ch, dtype=dtype),
            "down": _conv_init(k[2], ratio * 2, ch, ch * 2, dtype=dtype),
        })
        ch *= 2
    for i, ratio in enumerate(reversed(cfg.ratios)):
        k = jax.random.split(ks[16 + i], 3)
        half = max(1, ch // 2)
        quarter = max(1, ch // 4)
        params["dec_stages"].append({
            "up": _conv_init(k[0], ratio * 2, ch, half, dtype=dtype),
            "res_conv1": _conv_init(k[1], 3, half, quarter, dtype=dtype),
            "res_conv2": _conv_init(k[2], 1, quarter, half, dtype=dtype),
        })
        ch //= 2
    hd = cfg.latent_dim // cfg.transformer_heads
    for i in range(cfg.transformer_layers):
        k = jax.random.split(ks[20 + i], 6)
        d = cfg.latent_dim
        params["transformer"].append({
            "norm1": {"weight": jnp.ones((d,), dtype)},
            "q": init_linear(k[0], d, d, bias=False, dtype=dtype),
            "k": init_linear(k[1], d, d, bias=False, dtype=dtype),
            "v": init_linear(k[2], d, d, bias=False, dtype=dtype),
            "o": init_linear(k[3], d, d, bias=False, dtype=dtype),
            "norm2": {"weight": jnp.ones((d,), dtype)},
            "ff1": init_linear(k[4], d, d * 4, bias=False, dtype=dtype),
            "ff2": init_linear(k[5], d * 4, d, bias=False, dtype=dtype),
        })
    return params


def _elu(x):
    return jax.nn.elu(x)


def _transformer(params, cfg: MimiConfig, x):
    b, t, d = x.shape
    hd = d // cfg.transformer_heads
    rows = jnp.arange(t)[:, None]
    cols = jnp.arange(t)[None, :]
    mask = jnp.where(cols <= rows, 0.0, NEG_INF)[None, None].astype(jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    for p in params["transformer"]:
        h = rms_norm(x, p["norm1"]["weight"])
        q = linear(h, p["q"]).reshape(b, t, cfg.transformer_heads, hd).transpose(0, 2, 1, 3)
        k = linear(h, p["k"]).reshape(b, t, cfg.transformer_heads, hd).transpose(0, 2, 1, 3)
        v = linear(h, p["v"]).reshape(b, t, cfg.transformer_heads, hd).transpose(0, 2, 1, 3)
        cos, sin = rope_angles(positions, hd, 10000.0)
        cos, sin = cos[:, None], sin[:, None]
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        a = sdpa(q, k, v, 1.0 / np.sqrt(hd), mask)
        x = x + linear(a.transpose(0, 2, 1, 3).reshape(b, t, d), p["o"])
        h = rms_norm(x, p["norm2"]["weight"])
        x = x + linear(jax.nn.gelu(linear(h, p["ff1"])), p["ff2"])
    return x


def mimi_encode_latent(params, cfg: MimiConfig, audio):
    """audio: [B, T] → latent [B, F, latent_dim]."""
    h = audio[:, :, None]
    h = causal_conv1d(h, params["enc_in"])
    for stage, ratio in zip(params["enc_stages"], cfg.ratios):
        r = h
        u = causal_conv1d(_elu(h), stage["res_conv1"])
        u = causal_conv1d(_elu(u), stage["res_conv2"])
        h = r + u
        h = causal_conv1d(_elu(h), stage["down"], stride=ratio)
    h = causal_conv1d(_elu(h), params["enc_out"])
    h = causal_conv1d(h, params["downsample"], stride=2)
    return _transformer(params, cfg, h)


def rvq_encode(params, cfg: MimiConfig, latent):
    """latent [B, F, D] → codes [B, 16, F]."""
    def quantize(books, x, in_proj, out_proj, n):
        resid = linear(x, in_proj)
        codes = []
        for i in range(n):
            book = books[i]
            d2 = (resid ** 2).sum(-1, keepdims=True) - 2 * resid @ book.T + (book ** 2).sum(-1)[None, None]
            idx = jnp.argmin(d2, axis=-1)
            codes.append(idx)
            resid = resid - jnp.take(book, idx, axis=0)
        return jnp.stack(codes, axis=1), resid

    first_codes, _ = quantize(params["rvq_first"]["codebook"], latent,
                              params["rvq_first"]["in_proj"], params["rvq_first"]["out_proj"], 1)
    first_q = jnp.take(params["rvq_first"]["codebook"][0], first_codes[:, 0], axis=0)
    first_dec = linear(first_q, params["rvq_first"]["out_proj"])
    rest_codes, _ = quantize(params["rvq_rest"]["codebook"], latent - first_dec,
                             params["rvq_rest"]["in_proj"], params["rvq_rest"]["out_proj"],
                             cfg.num_quantizers - 1)
    return jnp.concatenate([first_codes, rest_codes], axis=1)


def rvq_decode(params, cfg: MimiConfig, codes):
    """codes [B, 16, F] → latent [B, F, D]."""
    first = jnp.take(params["rvq_first"]["codebook"][0], codes[:, 0], axis=0)
    out = linear(first, params["rvq_first"]["out_proj"])
    rest = jax.vmap(lambda book, c: jnp.take(book, c, axis=0), in_axes=(0, 1))(
        params["rvq_rest"]["codebook"], codes[:, 1:]
    ).sum(axis=0)
    return out + linear(rest, params["rvq_rest"]["out_proj"])


def mimi_decode(params, cfg: MimiConfig, codes):
    """codes [B, 16, F] → audio [B, F*1920]."""
    h = rvq_decode(params, cfg, codes)
    h = _transformer(params, cfg, h)
    h = causal_transpose_conv1d(h, params["upsample"], 2)
    h = causal_conv1d(h, params["dec_in"])
    for stage, ratio in zip(params["dec_stages"], tuple(reversed(cfg.ratios))):
        h = causal_transpose_conv1d(_elu(h), stage["up"], ratio)
        r = h
        u = causal_conv1d(_elu(h), stage["res_conv1"])
        u = causal_conv1d(_elu(u), stage["res_conv2"])
        h = r + u
    h = causal_conv1d(_elu(h), params["dec_out"])
    return jnp.clip(h[..., 0], -1.0, 1.0)


def mimi_encode(params, cfg: MimiConfig, audio):
    """audio [B, T] → codes [B, 16, F]."""
    return rvq_encode(params, cfg, mimi_encode_latent(params, cfg, audio))

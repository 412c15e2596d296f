"""FastConformer encoder (NeMo-style), TPU-first.

The reference consumes this encoder as an opaque CoreML artifact
(reference: Sources/ParakeetASR/ParakeetASR.swift:223-232 runEncoder); the
architecture here follows the NeMo FastConformer-TDT recipe the published
Parakeet checkpoints were trained with:

- dw_striding 8× subsampling: conv2d(1→C,3,s2) → [depthwise(3,s2) →
  pointwise] ×2, ReLU between, then Linear(C·mel/8 → d_model);
- 24 conformer blocks: ½FF(swish) → rel-pos MHSA (Transformer-XL u/v
  biases + relative-shift) → conv module (pointwise→GLU→depthwise(k9)→
  norm→swish→pointwise) → ½FF → LayerNorm;
- batch norm in the conv module is folded to scale/shift at conversion
  (inference-only).

Everything is a static-shape batched program; valid frame lengths are
threaded as a mask (shape buckets replace the reference's CoreML
enumerated shapes, ParakeetASR.swift:155-221).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import NEG_INF
from ...ops.nn import conv1d, conv2d, init_conv2d, init_linear, layer_norm, linear
from .config import ParakeetConfig


def swish(x):
    return jax.nn.silu(x)


def subsampled_length(n_frames):
    """Valid frames after three stride-2 convs (k=3, p=1):
    L → (L-1)//2 + 1, applied three times."""
    l = n_frames
    for _ in range(3):
        l = (l - 1) // 2 + 1
    return l


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_encoder_params(key, cfg: ParakeetConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 6 + cfg.encoder_layers)
    c = cfg.subsampling_channels
    d = cfg.encoder_hidden
    f_sub = subsampled_length(cfg.num_mel_bins)  # mel axis also /8

    def dw(key, ch):
        scale = 1.0 / np.sqrt(9)
        return {
            "kernel": (jax.random.normal(key, (3, 3, 1, ch)) * scale).astype(dtype),
            "bias": jnp.zeros((ch,), dtype),
        }

    params = {
        "sub_conv1": init_conv2d(ks[0], 3, 3, 1, c, dtype=dtype),
        "sub_dw2": dw(ks[1], c),
        "sub_pw2": init_conv2d(ks[2], 1, 1, c, c, dtype=dtype),
        "sub_dw3": dw(ks[3], c),
        "sub_pw3": init_conv2d(ks[4], 1, 1, c, c, dtype=dtype),
        "sub_out": init_linear(ks[5], c * f_sub, d, dtype=dtype),
        "pos_u": jnp.zeros((cfg.num_heads, cfg.head_dim), dtype),
        "pos_v": jnp.zeros((cfg.num_heads, cfg.head_dim), dtype),
        "layers": [],
    }
    for i in range(cfg.encoder_layers):
        k = jax.random.split(ks[6 + i], 10)
        dff = d * cfg.ffn_expansion
        params["layers"].append(
            {
                "ff1": {"ln": _ln(d, dtype), "w1": init_linear(k[0], d, dff, dtype=dtype),
                        "w2": init_linear(k[1], dff, d, dtype=dtype)},
                "ff2": {"ln": _ln(d, dtype), "w1": init_linear(k[2], d, dff, dtype=dtype),
                        "w2": init_linear(k[3], dff, d, dtype=dtype)},
                "attn": {
                    "ln": _ln(d, dtype),
                    "q": init_linear(k[4], d, d, dtype=dtype),
                    "k": init_linear(k[5], d, d, dtype=dtype),
                    "v": init_linear(k[6], d, d, dtype=dtype),
                    "o": init_linear(k[7], d, d, dtype=dtype),
                    "pos": init_linear(k[8], d, d, bias=False, dtype=dtype),
                },
                "conv": {
                    "ln": _ln(d, dtype),
                    "pw1": init_linear(k[9], d, 2 * d, bias=True, dtype=dtype),
                    "dw": {"kernel": (jax.random.normal(k[4], (cfg.conv_kernel, 1, d)) * 0.1).astype(dtype),
                           "bias": jnp.zeros((d,), dtype)},
                    "norm_scale": jnp.ones((d,), dtype),
                    "norm_bias": jnp.zeros((d,), dtype),
                    "pw2": init_linear(k[6], d, d, bias=True, dtype=dtype),
                },
                "ln_out": _ln(d, dtype),
            }
        )
    return params


def _ln(d, dtype):
    return {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


# ---------------------------------------------------------------------------
# relative positional attention
# ---------------------------------------------------------------------------

def rel_pos_encoding(t: int, d_model: int) -> np.ndarray:
    """Sinusoidal embeddings for relative positions T-1 … -(T-1)
    ([2T-1, d_model], NeMo RelPositionalEncoding layout)."""
    positions = np.arange(t - 1, -t, -1, dtype=np.float64)  # [2T-1]
    inv = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(np.log(10000.0) / d_model))
    ang = positions[:, None] * inv[None, :]
    pe = np.zeros((len(positions), d_model))
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    return pe.astype(np.float32)


def _rel_shift(x):
    """[B, H, T, 2T-1] → [B, H, T, T]: row i keeps columns aligned so that
    entry j corresponds to relative offset (j - i)."""
    b, h, t, l = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # [B,H,T,2T]
    x = x.reshape(b, h, l + 1, t)
    x = x[:, :, 1:, :].reshape(b, h, t, l)
    return x[..., :t]


def rel_attention(p, x, pos_u, pos_v, mask, cfg: ParakeetConfig):
    """x: [B, T, d]; mask: [B, 1, 1, T] additive key mask."""
    b, t, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    q = linear(x, p["q"]).reshape(b, t, h, hd)
    k = linear(x, p["k"]).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    v = linear(x, p["v"]).reshape(b, t, h, hd).transpose(0, 2, 1, 3)

    pe = jnp.asarray(rel_pos_encoding(t, d), x.dtype)  # [2T-1, d]
    pos = linear(pe, p["pos"]).reshape(2 * t - 1, h, hd).transpose(1, 0, 2)  # [H, 2T-1, hd]

    q_u = (q + pos_u[None, None]).transpose(0, 2, 1, 3)  # [B,H,T,hd]
    q_v = (q + pos_v[None, None]).transpose(0, 2, 1, 3)

    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u.astype(jnp.float32), k.astype(jnp.float32))
    bd = jnp.einsum("bhqd,hld->bhql", q_v.astype(jnp.float32), pos.astype(jnp.float32))
    scores = (ac + _rel_shift(bd)) / np.sqrt(hd)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32))
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d).astype(x.dtype)
    return linear(out, p["o"])


# ---------------------------------------------------------------------------
# conformer block + encoder
# ---------------------------------------------------------------------------

def _feed_forward(p, x, eps=1e-5):
    h = layer_norm(x, p["ln"]["weight"], p["ln"]["bias"], eps)
    return linear(swish(linear(h, p["w1"])), p["w2"])


def _conv_module(p, x, valid, cfg: ParakeetConfig):
    h = layer_norm(x, p["ln"]["weight"], p["ln"]["bias"], 1e-5)
    h = linear(h, p["pw1"])  # [B,T,2d]
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g)  # GLU
    h = jnp.where(valid[..., None], h, 0.0)  # keep padding out of the conv
    pad = (cfg.conv_kernel - 1) // 2
    h = conv1d(h, p["dw"], padding=pad, groups=h.shape[-1])
    h = h * p["norm_scale"] + p["norm_bias"]  # folded batch norm
    h = swish(h)
    return linear(h, p["pw2"])


def encode(params, mel, n_valid_frames, cfg: ParakeetConfig):
    """mel: [B, T, n_mels] normalized log-mel (T static);
    n_valid_frames: [B]. Returns (encoded [B, T/8, d], n_valid_out [B])."""
    b, t, n_mels = mel.shape
    x = mel[..., None]  # [B, T(mel-time), n_mels, 1] — NHWC with H=time, W=mel

    def dw_conv(x, p):
        ch = x.shape[-1]
        y = jax.lax.conv_general_dilated(
            x, p["kernel"], (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=ch,
            preferred_element_type=jnp.float32,
        )
        return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)

    # dw_striding: conv → relu → (dw → pw → relu) ×2
    x = jax.nn.relu(conv2d(x, params["sub_conv1"], stride=(2, 2)))
    x = dw_conv(x, params["sub_dw2"])
    x = jax.nn.relu(conv2d(x, params["sub_pw2"], stride=(1, 1), padding=((0, 0), (0, 0))))
    x = dw_conv(x, params["sub_dw3"])
    x = jax.nn.relu(conv2d(x, params["sub_pw3"], stride=(1, 1), padding=((0, 0), (0, 0))))

    bb, tt, ff, cc = x.shape  # [B, T/8, mel/8, C]
    x = x.reshape(bb, tt, ff * cc)
    x = linear(x, params["sub_out"])  # [B, T/8, d]

    n_out = subsampled_length(n_valid_frames)
    valid = jnp.arange(tt)[None, :] < n_out[:, None]  # [B, T/8]
    mask = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]

    for lp in params["layers"]:
        x = x + 0.5 * _feed_forward(lp["ff1"], x)
        h = layer_norm(x, lp["attn"]["ln"]["weight"], lp["attn"]["ln"]["bias"], 1e-5)
        pos_u = lp["attn"].get("pos_u", params["pos_u"])
        pos_v = lp["attn"].get("pos_v", params["pos_v"])
        x = x + rel_attention(lp["attn"], h, pos_u, pos_v, mask, cfg)
        x = x + _conv_module(lp["conv"], x, valid, cfg)
        x = x + 0.5 * _feed_forward(lp["ff2"], x)
        x = layer_norm(x, lp["ln_out"]["weight"], lp["ln_out"]["bias"], 1e-5)

    x = jnp.where(valid[..., None], x, 0.0)
    return x, n_out

"""Qwen3-TTS speech tokenizer decoder: 16 codebooks → 24 kHz waveform.

Functional re-design of the reference codec decoder
(reference: Sources/Qwen3TTS/SpeechTokenizerDecoder.swift:11-753):
split RVQ (1 semantic + 15 acoustic codebooks, dim 256 → 512) →
causal pre-conv (512→1024) → 8-layer pre-transformer (1024→512
bottleneck, RoPE, LayerScale, SwiGLU) → 2×2 pre-upsample with ConvNeXt
blocks → input conv (1024→1536) → 4 decoder blocks (SnakeBeta + causal
transpose conv + 3 dilated residual units; strides 8,5,4,3) → SnakeBeta →
final conv → tanh-free clip. 1920 samples per 12.5 Hz frame.

All convolutions are causal (left-pad / right-trim), so chunked streaming
decode with left context is exact (reference chunkedDecode semantics:
chunk 25 frames + 10 left-context frames, keep the last chunk's samples).
Everything is one jitted conv graph per (chunk) shape.
"""

from __future__ import annotations

import functools
from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import NEG_INF, sdpa
from ...ops.nn import init_linear, layer_norm, linear, rms_norm
from ...ops.rope import apply_rope, rope_angles
from .config import CodecDecoderConfig


# -- primitive inits ---------------------------------------------------------

def _conv_init(key, width, cin, cout, bias=True, dtype=jnp.float32):
    scale = 1.0 / np.sqrt(width * cin)
    p = {"kernel": (jax.random.normal(key, (width, cin, cout)) * scale).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def causal_conv1d(x, p, stride=1, dilation=1, groups=1):
    """x: [B, T, C]; left-pad (k-1)*dilation (reference: CausalConv1d)."""
    k = p["kernel"].shape[0]
    pad = (k - 1) * dilation
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride,), ((pad, 0),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def causal_transpose_conv1d(x, p, stride):
    """Transposed conv, trimming kernel-stride samples on the right
    (reference: CausalTransposeConv1d)."""
    k = p["kernel"].shape[0]
    y = jax.lax.conv_transpose(
        x, p["kernel"], (stride,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    trim = k - stride
    if trim > 0:
        y = y[:, :-trim]
    return y.astype(x.dtype)


def snake_beta(x, p):
    """x + (1/exp(beta)) * sin²(exp(alpha)·x) (reference: SnakeBeta)."""
    a = jnp.exp(p["alpha"].astype(jnp.float32))
    b = jnp.exp(p["beta"].astype(jnp.float32))
    xf = x.astype(jnp.float32)
    s = jnp.sin(a * xf)
    return (xf + (1.0 / b) * s * s).astype(x.dtype)


def _snake_init(channels, dtype=jnp.float32):
    return {"alpha": jnp.zeros((channels,), dtype), "beta": jnp.zeros((channels,), dtype)}


def convnext_block(x, p):
    """dw conv → LN → pw1 → GELU → pw2 → LayerScale + residual."""
    h = causal_conv1d(x, p["dw"], groups=x.shape[-1])
    h = layer_norm(h, p["norm"]["weight"], p["norm"]["bias"], 1e-5)
    h = linear(h, p["pw1"])
    h = jax.nn.gelu(h, approximate=False)
    h = linear(h, p["pw2"])
    return x + h * p["layer_scale"]


def _convnext_init(key, dim, scale=4, kernel=7, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "dw": _conv_init(k1, kernel, 1, dim, dtype=dtype),  # depthwise: in/groups = 1
        "norm": {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)},
        "pw1": init_linear(k2, dim, dim * scale, dtype=dtype),
        "pw2": init_linear(k3, dim * scale, dim, dtype=dtype),
        "layer_scale": jnp.full((dim,), 0.01, dtype),
    }


# -- init --------------------------------------------------------------------

def init_codec_params(key, cfg: CodecDecoderConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 24)
    latent, hid = cfg.latent_dim, cfg.hidden_size
    params = {
        "rvq_first": {
            "codebook": (jax.random.normal(ks[0], (1, cfg.semantic_codebook_size, cfg.codebook_dim)) * 0.05).astype(dtype),
            "output_proj": _conv_init(ks[1], 1, cfg.codebook_dim, hid, bias=False, dtype=dtype),
        },
        "rvq_rest": {
            "codebook": (jax.random.normal(ks[2], (cfg.num_quantizers - 1, cfg.acoustic_codebook_size, cfg.codebook_dim)) * 0.05).astype(dtype),
            "output_proj": _conv_init(ks[3], 1, cfg.codebook_dim, hid, bias=False, dtype=dtype),
        },
        "pre_conv": _conv_init(ks[4], 3, hid, latent, dtype=dtype),
        "transformer": {
            "input_proj": init_linear(ks[5], latent, hid, dtype=dtype),
            "output_proj": init_linear(ks[6], hid, latent, dtype=dtype),
            "norm": {"weight": jnp.ones((hid,), dtype)},
            "layers": [],
        },
        "pre_upsample": [],
        "input_conv": _conv_init(ks[7], 7, latent, cfg.decoder_dim, dtype=dtype),
        "blocks": [],
    }
    for i in range(cfg.num_layers):
        k = jax.random.split(ks[8 + i % 8], 8)
        params["transformer"]["layers"].append({
            "norm1": {"weight": jnp.ones((hid,), dtype)},
            "norm2": {"weight": jnp.ones((hid,), dtype)},
            "q_proj": init_linear(k[0], hid, cfg.num_heads * cfg.head_dim, bias=False, dtype=dtype),
            "k_proj": init_linear(k[1], hid, cfg.num_heads * cfg.head_dim, bias=False, dtype=dtype),
            "v_proj": init_linear(k[2], hid, cfg.num_heads * cfg.head_dim, bias=False, dtype=dtype),
            "o_proj": init_linear(k[3], cfg.num_heads * cfg.head_dim, hid, bias=False, dtype=dtype),
            "gate_proj": init_linear(k[4], hid, hid * 2, bias=False, dtype=dtype),
            "up_proj": init_linear(k[5], hid, hid * 2, bias=False, dtype=dtype),
            "down_proj": init_linear(k[6], hid * 2, hid, bias=False, dtype=dtype),
            "attn_scale": jnp.full((hid,), 0.01, dtype),
            "mlp_scale": jnp.full((hid,), 0.01, dtype),
        })
    for i, ratio in enumerate(cfg.upsampling_ratios):
        k1, k2 = jax.random.split(ks[16 + i])
        params["pre_upsample"].append({
            "upsample": _conv_init(k1, ratio * 2, latent, latent, dtype=dtype),
            "convnext": _convnext_init(k2, latent, dtype=dtype),
        })
    dims = [cfg.decoder_dim]
    for _ in cfg.upsample_rates:
        dims.append(dims[-1] // 2)
    for i, rate in enumerate(cfg.upsample_rates):
        k = jax.random.split(ks[18 + i], 8)
        block = {
            "snake": _snake_init(dims[i], dtype),
            "upsample": _conv_init(k[0], rate * 2, dims[i], dims[i + 1], dtype=dtype),
            "units": [],
        }
        for u in range(3):
            block["units"].append({
                "snake1": _snake_init(dims[i + 1], dtype),
                "conv1": _conv_init(k[1 + 2 * u], 7, dims[i + 1], dims[i + 1], dtype=dtype),
                "snake2": _snake_init(dims[i + 1], dtype),
                "conv2": _conv_init(k[2 + 2 * u], 1, dims[i + 1], dims[i + 1], dtype=dtype),
            })
        params["blocks"].append(block)
    params["final_snake"] = _snake_init(dims[-1], dtype)
    params["final_conv"] = _conv_init(ks[23], 7, dims[-1], 1, dtype=dtype)
    return params


# -- forward -----------------------------------------------------------------

def rvq_decode(params, cfg: CodecDecoderConfig, codes):
    """codes: [B, 16, T] → [B, T, hidden_size] (split RVQ sum + 1×1 proj)."""
    first = jnp.take(params["rvq_first"]["codebook"][0], codes[:, 0], axis=0)  # [B,T,cd]
    first = causal_conv1d(first, params["rvq_first"]["output_proj"])

    rest_books = params["rvq_rest"]["codebook"]  # [15, V, cd]
    rest_codes = codes[:, 1:]  # [B, 15, T]
    summed = jnp.einsum(
        "qbtd->btd",
        jax.vmap(lambda book, c: jnp.take(book, c, axis=0), in_axes=(0, 1))(rest_books, rest_codes),
    )
    rest = causal_conv1d(summed, params["rvq_rest"]["output_proj"])
    return first + rest


def _pre_transformer(params, cfg: CodecDecoderConfig, x):
    p = params["transformer"]
    h = linear(x, p["input_proj"])
    b, t, _ = h.shape
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    rows = jnp.arange(t)[:, None]
    cols = jnp.arange(t)[None, :]
    mask = jnp.where(cols <= rows, 0.0, NEG_INF)[None, None].astype(jnp.float32)

    for lp in p["layers"]:
        hh = rms_norm(h, lp["norm1"]["weight"], cfg.rms_norm_eps)
        q = linear(hh, lp["q_proj"]).reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = linear(hh, lp["k_proj"]).reshape(b, t, cfg.num_heads, cfg.head_dim)
        v = linear(hh, lp["v_proj"]).reshape(b, t, cfg.num_heads, cfg.head_dim)
        cos, sin = rope_angles(positions, cfg.head_dim, 10000.0)
        cos, sin = cos[:, None], sin[:, None]
        q = apply_rope(q.transpose(0, 2, 1, 3), cos, sin)
        k = apply_rope(k.transpose(0, 2, 1, 3), cos, sin)
        attn = sdpa(q, k, v.transpose(0, 2, 1, 3), 1.0 / np.sqrt(cfg.head_dim), mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, -1)
        h = h + linear(attn, lp["o_proj"]) * lp["attn_scale"]
        hh = rms_norm(h, lp["norm2"]["weight"], cfg.rms_norm_eps)
        mlp = linear(jax.nn.silu(linear(hh, lp["gate_proj"])) * linear(hh, lp["up_proj"]), lp["down_proj"])
        h = h + mlp * lp["mlp_scale"]
    h = rms_norm(h, p["norm"]["weight"], cfg.rms_norm_eps)
    return linear(h, p["output_proj"])


def codec_decode(params, cfg: CodecDecoderConfig, codes):
    """codes: [B, 16, T] int32 → waveform [B, T*1920] float32."""
    h = rvq_decode(params, cfg, codes)
    h = causal_conv1d(h, params["pre_conv"])
    h = _pre_transformer(params, cfg, h)
    for stage, ratio in zip(params["pre_upsample"], cfg.upsampling_ratios):
        h = causal_transpose_conv1d(h, stage["upsample"], ratio)
        h = convnext_block(h, stage["convnext"])
    h = causal_conv1d(h, params["input_conv"])
    for block, rate in zip(params["blocks"], cfg.upsample_rates):
        h = snake_beta(h, block["snake"])
        h = causal_transpose_conv1d(h, block["upsample"], rate)
        for unit in block["units"]:
            r = h
            u = snake_beta(h, unit["snake1"])
            u = causal_conv1d(u, unit["conv1"], dilation=1)
            u = snake_beta(u, unit["snake2"])
            u = causal_conv1d(u, unit["conv2"])
            h = r + u
    h = snake_beta(h, params["final_snake"])
    h = causal_conv1d(h, params["final_conv"])
    return jnp.clip(h[..., 0], -1.0, 1.0).astype(jnp.float32)


class CodecDecoder:
    """Host wrapper with chunked streaming decode
    (reference: chunkedDecode chunk=25, left_context=10)."""

    def __init__(self, params, cfg: CodecDecoderConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
        self._jit = jax.jit(functools.partial(codec_decode, cfg=cfg))
        # frames-first entry: device-resident codes [B, T, 16] from the
        # generate loop decode without a host round-trip (the bucket slice
        # and transpose happen inside the one program)
        self._jit_frames = jax.jit(
            lambda params, codes, bucket: codec_decode(
                params, cfg, codes[:, :bucket].transpose(0, 2, 1)),
            static_argnames=("bucket",))

    #: frame-count bucketing quantum: the decoder graph is causal, so
    #: right-padding codes to a bucket and slicing the output is exact —
    #: and bounds recompilation to one program per bucket instead of one
    #: per distinct utterance length
    DECODE_BUCKET_FRAMES = 8

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """codes: [16, T] or [B, 16, T] → waveform [T*1920] / [B, T*1920]."""
        single = codes.ndim == 2
        if single:
            codes = codes[None]
        t = codes.shape[2]
        q = self.DECODE_BUCKET_FRAMES
        bucket = max(q, ((t + q - 1) // q) * q)
        if bucket != t:
            codes = np.pad(np.asarray(codes), ((0, 0), (0, 0), (0, bucket - t)))
        out = np.asarray(self._jit(self.params, codes=jnp.asarray(codes, jnp.int32)))
        out = out[:, : t * self.cfg.samples_per_frame]
        return out[0] if single else out

    def decode_frames(self, codes, n: int) -> np.ndarray:
        """Device-resident decode: codes [B, T_max, 16] (frames-first, as
        the generate loop emits), keep the first ``n`` frames. ONE device
        program (slice + transpose + conv graph); returns [B, n*1920]."""
        q = self.DECODE_BUCKET_FRAMES
        bucket = max(q, min((n + q - 1) // q * q, codes.shape[1]))
        wav = self._jit_frames(self.params, codes, bucket)
        return np.asarray(wav)[:, : n * self.cfg.samples_per_frame]

    def decode_stream(self, codes: np.ndarray, chunk: int = 25, left_context: int = 10
                      ) -> Iterator[np.ndarray]:
        """Yield waveform chunks. The graph is prefix-causal, so output is
        EXACT when ``left_context`` covers the full prefix; with a bounded
        left context it is the same approximation the reference's
        chunkedDecode makes (SpeechTokenizerDecoder.swift:696) — the
        pre-transformer's window re-anchors per chunk, decaying with more
        context (tests pin exact-at-full-context and first-chunk bounds)."""
        if codes.ndim == 2:
            codes = codes[None]
        if codes.shape[0] != 1:
            raise ValueError("decode_stream is single-utterance; decode() "
                             "handles batches")  # yielding row 0 silently
        t = codes.shape[2]
        spf = self.cfg.samples_per_frame
        pos = 0
        while pos < t:
            start = max(0, pos - left_context)
            end = min(t, pos + chunk)
            piece = codes[:, :, start:end]
            wav = np.asarray(self._jit(self.params, codes=jnp.asarray(piece, jnp.int32)))
            keep_from = (pos - start) * spf
            yield wav[0, keep_from : keep_from + (end - pos) * spf]
            pos = end

"""Functional NN primitives over param pytrees.

TPU-native analog of the reference's MLXNN layer zoo (Linear, LayerNorm,
RMSNorm, Conv, quantized layers — reference: Sources/MLXCommon/*.swift).
Params are plain dicts of jnp arrays; kernels are stored [in, out] (JAX
convention) so the hot path is a single dot with no transposes. Checkpoint
converters handle the [out, in] → [in, out] flip once at load time.

Compute dtype discipline: matmuls run in the params' dtype (bf16 on TPU)
with fp32 accumulation via ``preferred_element_type``; normalization
statistics are always fp32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def linear(x, p):
    """x @ kernel + bias. p: {"kernel": [in, out], optional "bias": [out]},
    or a group-quantized dict {"codes", "scales", "biases"} (dispatched to
    ops.quant — reference: MLX QuantizedLinear), or the load-time-unpacked
    group-dot layout {"gcodes", "gscales", "gbiases"} (native s8 MXU)."""
    if "gcodes" in p:
        from .quant import quant_matmul_groupdot

        y = quant_matmul_groupdot(x, p)
        if "bias" in p:
            y = y + p["bias"].astype(jnp.float32)
        return y.astype(x.dtype)
    if "codes" in p:
        from .quant import quant_linear

        return quant_linear(x, p)
    y = jax.lax.dot_general(
        x, p["kernel"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(x, weight, eps: float = 1e-6):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(x, weight, bias, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def gelu(x):
    """Exact (erf) GELU — what MLXNN's ``gelu`` computes."""
    return jax.nn.gelu(x, approximate=False)


def silu(x):
    return jax.nn.silu(x)


def swiglu_mlp(x, p):
    """down(silu(gate(x)) * up(x)) — the Qwen MLP
    (reference: QuantizedTextMLP, QuantizedTextDecoder.swift:132-137).

    Accepts either separate gate/up projections or a fused "gate_up_proj"
    (built by :func:`fuse_linears` — halves the projection call count,
    which is the fixed-cost term in quantized decode)."""
    if "gate_up_proj" in p:
        gu = linear(x, p["gate_up_proj"])
        gate, up = jnp.split(gu, 2, axis=-1)
        return linear(silu(gate) * up, p["down_proj"])
    return linear(silu(linear(x, p["gate_proj"])) * linear(x, p["up_proj"]), p["down_proj"])


def fuse_linears(ps):
    """Concatenate linear params (all fed the same input) along the output
    axis into one projection, so N matmuls become one wider matmul.

    For group-quantized params this is exact: codes/scales/biases rows are
    per-output, so row-concat is the fused weight. Returns None when the
    params are not uniformly fusable (mixed dense/quant, mixed bias)."""
    quant = [("codes" in p) for p in ps]
    has_bias = [("bias" in p) for p in ps]
    if any(has_bias) and not all(has_bias):
        return None
    if all(quant):
        fused = {k: jnp.concatenate([p[k] for p in ps], axis=0)
                 for k in ("codes", "scales", "biases")}
    elif not any(quant):
        fused = {"kernel": jnp.concatenate([p["kernel"] for p in ps], axis=1)}
    else:
        return None
    if all(has_bias):
        fused["bias"] = jnp.concatenate([p["bias"] for p in ps], axis=0)
    return fused


def split_linear(p, bounds):
    """Exact inverse of :func:`fuse_linears`: split a linear param at
    output-row ``bounds`` (ascending offsets). Quantized codes/scales/
    biases rows are per-output; dense kernels are [in, out]."""
    lo_hi = list(zip((0,) + tuple(bounds), tuple(bounds) + (None,)))
    if "codes" in p:
        parts = [{k: p[k][lo:hi] for k in ("codes", "scales", "biases")}
                 for lo, hi in lo_hi]
    else:
        parts = [{"kernel": p["kernel"][:, lo:hi]} for lo, hi in lo_hi]
    if "bias" in p:
        for part, (lo, hi) in zip(parts, lo_hi):
            part["bias"] = p["bias"][lo:hi]
    return parts


def fuse_qkv_gate_up(params) -> dict:
    """Fuse q/k/v → ``qkv_proj`` and gate/up → ``gate_up_proj`` in every
    entry of ``params["layers"]`` (exact output-row concat via
    :func:`fuse_linears`; works for dense and group-quantized params).
    Decode-step cost at batch 1 is dominated by per-call fixed work, not
    contraction FLOPs, so dropping 7 projections/layer to 4 wins. Only
    valid replicated/unsharded — TP rules partition per projection, so
    shard paths unfuse first. No-op on already-fused layers."""
    out = dict(params)
    layers = []
    for p in params["layers"]:
        p = dict(p)
        if "q_proj" in p:
            qkv = fuse_linears([p["q_proj"], p["k_proj"], p["v_proj"]])
            if qkv is not None:
                p["qkv_proj"] = qkv
                del p["q_proj"], p["k_proj"], p["v_proj"]
        mlp = dict(p["mlp"])
        if "gate_proj" in mlp:
            gu = fuse_linears([mlp["gate_proj"], mlp["up_proj"]])
            if gu is not None:
                mlp["gate_up_proj"] = gu
                del mlp["gate_proj"], mlp["up_proj"]
                p["mlp"] = mlp
        layers.append(p)
    out["layers"] = layers
    return out


def unfuse_qkv_gate_up(params, q_dim: int, kv_dim: int) -> dict:
    """Exact inverse of :func:`fuse_qkv_gate_up`: slice fused rows back
    into per-projection params (``q_dim`` query rows, ``kv_dim`` key and
    value rows each; the gate/up split is inferred from shapes). No-op on
    already-unfused layers."""
    out = dict(params)
    layers = []
    for p in params["layers"]:
        p = dict(p)
        if "qkv_proj" in p:
            p["q_proj"], p["k_proj"], p["v_proj"] = split_linear(
                p.pop("qkv_proj"), (q_dim, q_dim + kv_dim))
        mlp = dict(p["mlp"])
        if "gate_up_proj" in mlp:
            gu = mlp.pop("gate_up_proj")
            inter = (gu["codes"].shape[0] if "codes" in gu else gu["kernel"].shape[1]) // 2
            mlp["gate_proj"], mlp["up_proj"] = split_linear(gu, (inter,))
            p["mlp"] = mlp
        layers.append(p)
    out["layers"] = layers
    return out


def embedding_lookup(table, ids, dim: Optional[int] = None):
    """table: [vocab, dim] array, or a quantized table dict (then ``dim``
    is required); ids int32 [...]."""
    if isinstance(table, dict) and "codes" in table:
        from .quant import quant_embedding_lookup

        return quant_embedding_lookup(table, ids, dim)
    return jnp.take(table, ids, axis=0)


def tied_lm_head(hidden, table):
    """Embedding table reused as LM head (reference: PreQuantizedEmbedding
    .asLinear, Sources/MLXCommon/PreQuantizedEmbedding.swift)."""
    if isinstance(table, dict) and "codes" in table:
        from .quant import quant_tied_lm_head

        return quant_tied_lm_head(hidden, table)
    return jax.lax.dot_general(
        hidden, table,
        (((hidden.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def conv2d(x, p, stride=(1, 1), padding=((1, 1), (1, 1))):
    """NHWC conv. p: {"kernel": HWIO, optional "bias": [O]}."""
    y = jax.lax.conv_general_dilated(
        x, p["kernel"],
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def conv1d(x, p, stride=1, padding=0, groups=1, dilation=1):
    """NLC conv1d. p: {"kernel": [width, in//groups, out], optional bias}."""
    if isinstance(padding, int):
        padding = ((padding, padding),)
    y = jax.lax.conv_general_dilated(
        x, p["kernel"],
        window_strides=(stride,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# -- init helpers (random-weight tests / from-scratch models) ----------------

def init_linear(key, d_in: int, d_out: int, bias: bool = True, dtype=jnp.float32, scale=None):
    k1, _ = jax.random.split(key)
    scale = scale if scale is not None else 1.0 / np.sqrt(d_in)
    p = {"kernel": (jax.random.normal(k1, (d_in, d_out)) * scale).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p


def init_conv2d(key, kh, kw, c_in, c_out, bias=True, dtype=jnp.float32):
    scale = 1.0 / np.sqrt(kh * kw * c_in)
    p = {"kernel": (jax.random.normal(key, (kh, kw, c_in, c_out)) * scale).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((c_out,), dtype)
    return p

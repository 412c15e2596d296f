"""Group-quantized (int2/4/8) linear algebra for TPU.

TPU-native analog of the reference's MLX QuantizedLinear /
PreQuantizedEmbedding compute path (reference:
Sources/MLXCommon/PreQuantizedEmbedding.swift, QuantizedMLP.swift;
checkpoint format per mlx.core.quantize: group size 64, codes packed
little-endian into uint32 along the input axis, ``w = scale*code + bias``
per group).

Storage keeps the packed uint32 codes on device — 4-bit weights read 4×
less HBM than bf16, and decode-time GEMV is HBM-bandwidth-bound, so this
is where the reference's 4-bit RTF advantage comes from. Two compute
paths:

- :func:`quant_matmul_xla` — pure-XLA exact group decomposition. Used on
  CPU (tests) and as the universal fallback.
- :func:`quant_matmul_pallas` — a Pallas TPU kernel that streams packed
  code tiles HBM→VMEM, unpacks + dequantizes on the VPU, and feeds the
  MXU per bit-plane, never materializing the dense weight in HBM.

Both compute y = x @ dequant(W)^T exactly (same fp32 accumulation), so
they are interchangeable; :func:`quant_linear` picks per backend.

Param convention: a quantized linear is a plain dict
``{"codes": u32[out, in*bits/32], "scales": [out, in/gs],
"biases": [out, in/gs], optional "bias": [out]}``; ``bits`` and the group
size are inferred from shapes at trace time (static under jit).
``ops.nn.linear`` dispatches here when it sees ``"codes"``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# QUANT_TILE_OUT / QUANT_PATH=xla|pallas: perf-tuning overrides used by the
# bench harness to A/B the dispatch on real hardware (model-level staged
# timing is the only trustworthy measurement on the tunneled backend)
_DEFAULT_TILE_OUT = int(os.environ.get("QUANT_TILE_OUT", "128"))  # best v5e wall-clock in the 8k×8k GEMV sweep
_FORCE_PATH = os.environ.get("QUANT_PATH", "")


def infer_quant_dims(in_dim: int, codes_shape, scales_shape):
    """(bits, group_size) from static shapes. in_dim comes from the
    activation, codes [out, in*bits/32], scales [out, in/gs]."""
    packed = codes_shape[-1]
    groups = scales_shape[-1]
    bits = (32 * packed) // in_dim
    if bits not in (2, 4, 8) or (32 * packed) % in_dim:
        raise ValueError(f"cannot infer bits: in={in_dim} packed={packed}")
    if in_dim % groups:
        raise ValueError(f"cannot infer group size: in={in_dim} groups={groups}")
    return bits, in_dim // groups


def is_quantized(p) -> bool:
    return isinstance(p, dict) and "codes" in p


# ---------------------------------------------------------------------------
# XLA path
# ---------------------------------------------------------------------------

def unpack_codes(codes, bits: int, in_dim: int):
    """u32 [..., in*bits/32] → float32 codes [..., in] (LSB-first)."""
    per_word = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    shifts = (jnp.arange(per_word, dtype=jnp.uint32) * bits)
    u = (codes[..., :, None] >> shifts) & mask  # [..., packed, per_word]
    return u.reshape(*codes.shape[:-1], in_dim).astype(jnp.float32)


def dequantize(p, in_dim: int, dtype=jnp.float32):
    """Materialize the dense [out, in] weight (embedding tables, tests)."""
    bits, gs = infer_quant_dims(in_dim, p["codes"].shape, p["scales"].shape)
    c = unpack_codes(p["codes"], bits, in_dim)
    s = jnp.repeat(p["scales"].astype(jnp.float32), gs, axis=-1)
    b = jnp.repeat(p["biases"].astype(jnp.float32), gs, axis=-1)
    return (c * s + b).astype(dtype)


def quant_matmul_xla(x, p):
    """x [..., in] @ dequant(W)^T → [..., out], fp32 accumulation.

    Exact group decomposition — scales/biases are folded in *after* a
    per-group partial dot, so the big contraction runs on integer-exact
    code values and the dense weight is only ever [out, in] fp32 inside
    one fused op (no extra HBM round-trip at these sizes under jit).
    """
    in_dim = x.shape[-1]
    bits, gs = infer_quant_dims(in_dim, p["codes"].shape, p["scales"].shape)
    lead = x.shape[:-1]
    xf = x.reshape(-1, in_dim).astype(jnp.float32)
    n_groups = in_dim // gs

    codes = unpack_codes(p["codes"], bits, in_dim)       # [out, in]
    cg = codes.reshape(-1, n_groups, gs)                 # [out, G, gs]
    xg = xf.reshape(-1, n_groups, gs)                    # [B, G, gs]

    # partial[b, g, o] = x_g · c_g[o];  y = Σ_g s[o,g]·partial + Σ_g β[o,g]·Σx_g
    partial = jnp.einsum("bgi,ogi->bgo", xg, cg, preferred_element_type=jnp.float32)
    xsum = xg.sum(axis=-1)                               # [B, G]
    y = jnp.einsum("bgo,og->bo", partial, p["scales"].astype(jnp.float32))
    y = y + xsum @ p["biases"].astype(jnp.float32).T
    return y.reshape(*lead, -1)


# ---------------------------------------------------------------------------
# group-dot path: load-time-unpacked int8 codes on the native s8 MXU
# ---------------------------------------------------------------------------

def repack_groupdot(p) -> dict:
    """Packed MLX dict → the group-dot layout: codes unpacked ONCE at
    load time to int8 ``[groups, gs, out]`` (the EXACT same 2/4/8-bit
    values — int8 holds them losslessly), scales/biases ``[groups, out]``.

    Why: the packed paths pay per-call cost to reach the weights — the
    Pallas GEMV a kernel-launch per matmul (ruinous for the Qwen3-TTS CP
    chain: ~750 launches/frame), the XLA path an in-graph unpack that
    materializes a dense weight. Here the stored form IS a dot operand:
    the TPU consumes s8×s8→s32 natively, so weight traffic is exactly
    1 byte/param with zero per-call unpack work."""
    codes = np.asarray(p["codes"])
    scales = np.asarray(p["scales"], np.float32)
    biases = np.asarray(p["biases"], np.float32)
    out_dim, n_groups = scales.shape
    packed = codes.shape[-1]
    for gs in (64, 32, 128):
        in_dim = n_groups * gs
        if in_dim and (32 * packed) % in_dim == 0 and (32 * packed) // in_dim in (2, 4, 8):
            bits = (32 * packed) // in_dim
            break
    else:
        raise ValueError(f"cannot infer group layout: codes {codes.shape} scales {scales.shape}")
    per = 32 // bits
    shifts = (np.arange(per, dtype=np.uint32) * bits)[None, None]
    mask = np.uint32((1 << bits) - 1)
    dense = ((codes[:, :, None] >> shifts) & mask).reshape(out_dim, in_dim).astype(np.int32)
    if bits == 8:
        # 0..255 overflows int8: recenter to -128..127 and fold the
        # +128·scale shift into the (exact) group-sum bias term
        dense = dense - 128
        biases = biases + 128.0 * scales
    out = {
        "gcodes": np.ascontiguousarray(
            dense.astype(np.int8).T.reshape(n_groups, gs, out_dim)),
        "gscales": np.ascontiguousarray(scales.T),
        "gbiases": np.ascontiguousarray(biases.T),
    }
    if "bias" in p:
        out["bias"] = np.asarray(p["bias"])
    return out


def quant_matmul_groupdot(x, p):
    """x [..., in] @ dequant(W)^T via per-group native int8 dots.

    Weight values are EXACT (the checkpoint's own quantized codes);
    activations are dynamically quantized to int8 with a per-(row,group)
    scale — the only approximation (≈40 dB per 64-wide group; the
    group-sum bias term stays exact fp32). Per group g:
        y[b,o] += sx[b,g] · scale[g,o] · Σ_k xq[b,g,k]·code[g,k,o]
                + scale-exact Σ_k x[b,g,k] · bias-term
    """
    gcodes = p["gcodes"]                                   # [G, gs, out] int8
    n_groups, gs, out_dim = gcodes.shape
    in_dim = n_groups * gs
    lead = x.shape[:-1]
    xf = x.reshape(-1, n_groups, gs).astype(jnp.float32)   # [B, G, gs]
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-12) / 127.0  # [B, G]
    xq = jnp.clip(jnp.round(xf / sx[..., None]), -127, 127).astype(jnp.int8)
    partial = jax.lax.dot_general(
        xq.transpose(1, 0, 2), gcodes,
        (((2,), (1,)), ((0,), (0,))),                      # contract gs, batch G
        preferred_element_type=jnp.int32,
    )                                                      # [G, B, out]
    y = jnp.einsum("gbo,bg,go->bo", partial.astype(jnp.float32), sx,
                   p["gscales"].astype(jnp.float32))
    y = y + xf.sum(axis=-1) @ p["gbiases"].astype(jnp.float32)
    return y.reshape(*lead, out_dim)


def repack_tree_groupdot(tree):
    """Walk a quantized tree (quantize_tree / a converted 4-bit
    checkpoint) and repack every packed linear into the group-dot
    layout. Packed EMBEDDING tables (gathered, not matmul'd) stay
    packed — quant_embedding_lookup handles them."""
    def walk(node, is_embed=False):
        if isinstance(node, dict):
            if "codes" in node and not is_embed:
                return repack_groupdot(node)
            return {k: walk(v, is_embed=(k == "embed_tokens")) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(tree)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _quant_matmul_kernel(x_parts_ref, xsum_ref, codes_ref, scales_ref, biases_ref,
                         out_ref, *, bits: int, repeat: int):
    """One output tile: unpack packed codes per bit-plane and feed the MXU.

    x_parts [per_word, B, PK]: x_parts[j, b, p] = x[b, p*per_word + j] —
    the j-th bit-plane's activation columns, pre-strided on host so every
    plane's dot is a contiguous [B,PK]×[PK,TILE_O] contraction. Because
    per_word divides the group size, the group of input p*per_word+j is
    p // repeat for every j, so one scale/bias expansion serves all planes.
    """
    per_word = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    codes = codes_ref[:]                                   # [TILE_O, PK] u32
    # expand group scales/biases to per-packed-column [TILE_O, PK] with an
    # MXU matmul against a 0/1 expansion matrix (jnp.repeat lowers to an
    # unsupported shape cast in Mosaic)
    n_groups = scales_ref.shape[1]
    pk = codes.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_groups, pk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_groups, pk), 1)
    expand = (cols // repeat == rows).astype(jnp.float32)  # [G, PK]
    # bf16 dequant planes: codes (< 2^bits) are exact in bf16; fp16-scale
    # precision loss matches the reference's fp16 MLX compute. ~25% faster
    # than fp32 planes on v5e (measured).
    s_exp = jnp.dot(scales_ref[:].astype(jnp.float32), expand,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    b_exp = jnp.dot(biases_ref[:].astype(jnp.float32), expand,
                    preferred_element_type=jnp.float32)

    # bias term: Σ_i x[b,i]·β[o, g(i)] = xsum_p · b_exp^T
    acc = jax.lax.dot_general(
        xsum_ref[:], b_exp, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for j in range(per_word):
        # Mosaic has no uint32→f32 cast; codes are < 2^bits so int32 is safe
        wj = ((codes >> jnp.uint32(bits * j)) & mask).astype(jnp.int32).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            x_parts_ref[j].astype(jnp.bfloat16), wj * s_exp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc


def _quant_matmul_kernel_fused(x_perm_ref, xsum_ref, codes_ref, scales_ref,
                               biases_ref, out_ref, *, bits: int, repeat: int):
    """One output tile via ONE MXU contraction over the full input depth.

    The plane kernel above issues per_word shallow [B,PK]×[PK,T] dots whose
    PK-deep contraction underfills the MXU pipeline at decode batch sizes.
    Here the packed codes unpack into a PLANE-PERMUTED dense bf16 tile
    [T, per_word*PK] inside VMEM (column j*PK+p holds true input column
    p*per_word+j), the activations arrive pre-permuted to match, and a
    single [B, in]×[in, T] dot runs at full contraction depth. HBM traffic
    is still the packed codes (4× less than bf16 weights)."""
    per_word = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    codes = codes_ref[:]                                   # [T, PK] u32
    n_groups = scales_ref.shape[1]
    pk = codes.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_groups, pk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_groups, pk), 1)
    expand = (cols // repeat == rows).astype(jnp.float32)  # [G, PK]
    s_exp = jnp.dot(scales_ref[:].astype(jnp.float32), expand,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    b_exp = jnp.dot(biases_ref[:].astype(jnp.float32), expand,
                    preferred_element_type=jnp.float32)

    acc = jax.lax.dot_general(
        xsum_ref[:], b_exp, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    planes = []
    for j in range(per_word):
        wj = ((codes >> jnp.uint32(bits * j)) & mask).astype(jnp.int32).astype(jnp.bfloat16)
        planes.append(wj * s_exp)
    w = jnp.concatenate(planes, axis=1)                    # [T, pw*PK] permuted dense
    acc = acc + jax.lax.dot_general(
        x_perm_ref[:], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = acc


#: kernel strategy: "fused" (single deep dot, default) or "plane"
#: (per-bit-plane dots — the original layout, kept for A/B)
_KERNEL = os.environ.get("QUANT_KERNEL", "fused")


@functools.partial(jax.jit, static_argnames=("bits", "gs", "tile_out", "interpret"))
def _quant_matmul_pallas_2d(xf, codes, scales, biases, *, bits, gs, tile_out, interpret):
    from jax.experimental import pallas as pl

    b, in_dim = xf.shape
    out_dim = codes.shape[0]
    per_word = 32 // bits
    pk = in_dim // per_word
    repeat = gs // per_word

    # host-side (XLA) re-striding: plane j takes columns j, j+pw, j+2pw, …
    x_parts = xf.reshape(b, pk, per_word).transpose(2, 0, 1)   # [pw, B, PK]
    xsum = x_parts.sum(axis=0)                                  # [B, PK]

    n_tiles = pl.cdiv(out_dim, tile_out)
    if _KERNEL == "fused":
        x_perm = x_parts.transpose(1, 0, 2).reshape(b, in_dim).astype(jnp.bfloat16)
        kernel = functools.partial(_quant_matmul_kernel_fused, bits=bits, repeat=repeat)
        x_spec = pl.BlockSpec((b, in_dim), lambda i: (0, 0))
        x_in = x_perm
    else:
        kernel = functools.partial(_quant_matmul_kernel, bits=bits, repeat=repeat)
        x_spec = pl.BlockSpec((per_word, b, pk), lambda i: (0, 0, 0))
        x_in = x_parts
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            x_spec,
            pl.BlockSpec((b, pk), lambda i: (0, 0)),
            pl.BlockSpec((tile_out, pk), lambda i: (i, 0)),
            pl.BlockSpec((tile_out, scales.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((tile_out, biases.shape[1]), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((b, tile_out), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b, out_dim), jnp.float32),
        interpret=interpret,
    )(x_in, xsum, codes, scales, biases)


def quant_matmul_pallas(x, p, tile_out: int = _DEFAULT_TILE_OUT, interpret: bool = False):
    """x [..., in] @ dequant(W)^T via the Pallas kernel. Requires the out
    dim to divide into tiles; pads the tile dim otherwise."""
    in_dim = x.shape[-1]
    bits, gs = infer_quant_dims(in_dim, p["codes"].shape, p["scales"].shape)
    lead = x.shape[:-1]
    xf = x.reshape(-1, in_dim).astype(jnp.float32)

    out_dim = p["codes"].shape[0]
    tile = min(tile_out, out_dim)
    pad = (-out_dim) % tile
    codes, scales, biases = p["codes"], p["scales"], p["biases"]
    if pad:
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
        scales = jnp.pad(scales, ((0, pad), (0, 0)))
        biases = jnp.pad(biases, ((0, pad), (0, 0)))
    y = _quant_matmul_pallas_2d(xf, codes, scales, biases, bits=bits, gs=gs,
                                tile_out=tile, interpret=interpret)
    if pad:
        y = y[:, :out_dim]
    return y.reshape(*lead, out_dim)


# ---------------------------------------------------------------------------
# dispatch + layer-level ops
# ---------------------------------------------------------------------------

def _use_pallas() -> bool:
    # single-chip TPU only: pallas_call is not GSPMD-partitionable, so
    # sharded multi-chip params take the XLA group-decomposition path.
    # QUANT_PATH=pallas forces the kernel (still TPU-only — the kernel is
    # not built for other backends) past the chip-count and row-count
    # heuristics, for A/B benchmarking.
    if _FORCE_PATH == "xla":
        return False
    try:
        on_tpu = jax.default_backend() == "tpu"
        if _FORCE_PATH == "pallas":
            return on_tpu
        return on_tpu and jax.device_count() == 1
    except Exception:  # noqa: BLE001
        return False


# Above this many activation rows the Pallas kernel's whole-x-in-VMEM
# layout overflows (16 MB); prefill-shaped calls take the XLA path, which
# is MXU-bound (not bandwidth-bound) at high arithmetic intensity anyway.
_PALLAS_MAX_ROWS = 256


def _rows(x) -> int:
    n = 1
    for d in x.shape[:-1]:
        n *= int(d)
    return n


def _pallas_rows_ok(x) -> bool:
    return _FORCE_PATH == "pallas" or _rows(x) <= _PALLAS_MAX_ROWS


def quant_linear(x, p):
    """Quantized y = x @ W^T (+ bias). Backend- and shape-dispatched:
    Pallas for decode-shaped GEMV on a single chip, XLA group
    decomposition otherwise."""
    if _use_pallas() and _pallas_rows_ok(x):
        y = quant_matmul_pallas(x, p)
    else:
        y = quant_matmul_xla(x, p)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def quant_embedding_lookup(p, ids, dim: int, dtype=jnp.bfloat16):
    """Gather + dequantize rows of a quantized embedding table
    (reference: PreQuantizedEmbedding). ids int32 [...] → [..., dim].

    Only the gathered rows are dequantized — O(T·dim), not O(vocab·dim).
    ``dim`` (the embedding width) disambiguates bits vs group size."""
    bits, gs = infer_quant_dims(dim, p["codes"].shape, p["scales"].shape)
    c = unpack_codes(jnp.take(p["codes"], ids, axis=0), bits, dim)
    s = jnp.repeat(jnp.take(p["scales"], ids, axis=0).astype(jnp.float32), gs, axis=-1)
    b = jnp.repeat(jnp.take(p["biases"], ids, axis=0).astype(jnp.float32), gs, axis=-1)
    return (c * s + b).astype(dtype)


def cast_tree(tree, dtype):
    """Cast float leaves of a param tree to ``dtype``, preserving packed
    quantized tensors: codes stay uint32 and group scales/biases stay
    fp32 (they are 1/group_size the size of the codes — accuracy is free).
    Integer leaves are never cast."""

    def walk(node):
        if isinstance(node, dict):
            if "gcodes" in node:
                out = {"gcodes": jnp.asarray(node["gcodes"], jnp.int8),
                       "gscales": jnp.asarray(node["gscales"], jnp.float32),
                       "gbiases": jnp.asarray(node["gbiases"], jnp.float32)}
                if "bias" in node:
                    out["bias"] = jnp.asarray(node["bias"], dtype)
                return out
            if "codes" in node:
                out = {"codes": jnp.asarray(node["codes"], jnp.uint32),
                       "scales": jnp.asarray(node["scales"], jnp.float32),
                       "biases": jnp.asarray(node["biases"], jnp.float32)}
                if "bias" in node:
                    out["bias"] = jnp.asarray(node["bias"], dtype)
                return out
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            seq = [walk(v) for v in node]
            return type(node)(seq) if isinstance(node, tuple) else seq
        arr = jnp.asarray(node)
        return arr.astype(dtype) if jnp.issubdtype(arr.dtype, jnp.floating) else arr

    return walk(tree)


def quantize_tree(params, bits: int, group_size: int = 64,
                  embed_keys=("embed_tokens",), min_dim: int = 128):
    """Quantize every eligible linear/embedding in a dense param tree to
    the MLX packed format (host-side numpy; used by ``init_random`` bench
    paths and for on-the-fly quantization of fp checkpoints — the
    reference ships pre-quantized repos instead).

    Eligible: {"kernel": [in, out]} dicts with in % group == 0 and both
    dims ≥ min_dim, and arrays named in ``embed_keys`` ([vocab, dim] with
    dim % group == 0). Norm scales, conv kernels, small heads stay dense.
    """
    from ..core.weights import quantize_mlx

    def quantize_out_in(w_out_in):
        packed, scales, biases = quantize_mlx(np.asarray(w_out_in, np.float32),
                                              bits, group_size)
        return {"codes": packed, "scales": scales, "biases": biases}

    def walk(node, name=""):
        if isinstance(node, dict):
            k = node.get("kernel")
            if k is not None and getattr(k, "ndim", 0) == 2:
                d_in, d_out = k.shape
                if d_in % group_size == 0 and d_in >= min_dim and d_out >= min_dim:
                    q = quantize_out_in(np.asarray(k).T)  # [out, in]
                    if "bias" in node:
                        q["bias"] = node["bias"]
                    return q
                return node
            return {k2: walk(v, k2) for k2, v in node.items()}
        if isinstance(node, (list, tuple)):
            seq = [walk(v, name) for v in node]
            return type(node)(seq) if isinstance(node, tuple) else seq
        if (name in embed_keys and getattr(node, "ndim", 0) == 2
                and node.shape[1] % group_size == 0 and node.shape[1] >= min_dim):
            return quantize_out_in(node)  # rows = vocab, input axis = dim
        return node

    return walk(params)


def dequantize_tree(params, bits: int, group_size: int = 64,
                    dtype=jnp.bfloat16, embed_keys=("embed_tokens",)):
    """Materialize every packed quantized tensor back to a dense ``dtype``
    tree — the hybrid serving mode: 4/8-bit checkpoints keep their
    quantized VALUES (outputs are token-identical to the packed compute
    path — tests/test_quant.py int4≡dequant) but execute as ordinary
    dense matmuls, which win at batched decode shapes where the packed
    path's per-call fixed cost dominates (docs/benchmarks.md). The packed
    path remains the memory-bound win at GEMV/small batch and for HBM
    footprint.

    Packed linears become {"kernel": [in, out]}; arrays named in
    ``embed_keys`` become dense [vocab, dim]. ``bits`` must match the
    packing (it disambiguates in_dim, which packed shapes alone cannot);
    ``group_size`` is validated against each tensor's inferred group."""

    def walk(node, name=""):
        if isinstance(node, dict):
            if "codes" in node:
                in_dim = node["codes"].shape[-1] * 32 // bits
                got_bits, got_gs = infer_quant_dims(
                    in_dim, node["codes"].shape, node["scales"].shape)
                if (got_bits, got_gs) != (bits, group_size):
                    raise ValueError(
                        f"packing mismatch at {name!r}: tree is "
                        f"{got_bits}-bit group-{got_gs}, caller said "
                        f"{bits}-bit group-{group_size}")
                w = dequantize(node, in_dim, dtype)  # [rows, in_dim]
                if name in embed_keys:
                    return w
                out = {"kernel": w.T}
                if "bias" in node:
                    out["bias"] = jnp.asarray(node["bias"], dtype)
                return out
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            seq = [walk(v, name) for v in node]
            return type(node)(seq) if isinstance(node, tuple) else seq
        return node

    return walk(params)


def quant_tied_lm_head(hidden, p):
    """Quantized-embedding-as-LM-head (reference: PreQuantizedEmbedding
    .asLinear): logits = hidden @ dequant(table)^T — the same GEMV the
    Pallas kernel accelerates, with out = vocab."""
    if _use_pallas() and _pallas_rows_ok(hidden):
        return quant_matmul_pallas(hidden, p)
    return quant_matmul_xla(hidden, p)

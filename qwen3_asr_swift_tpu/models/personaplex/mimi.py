"""Mimi neural audio codec: 24 kHz ⇄ 16 codebooks @ 12.5 Hz.

TPU-native analog of the reference's Mimi implementation
(reference: Sources/PersonaPlex/MimiCodec.swift:10-212, Seanet.swift,
MimiTransformer.swift, Quantization.swift) — the full published topology,
matching ``transformers.MimiModel`` operation-for-operation so real
checkpoints load via convert.py and golden parity holds (see
tests/test_personaplex_convert.py):

- SEANet encoder: conv-in k7 → per stage (ratios applied reversed:
  4,5,6,8) a dilated residual unit (ELU→k3→ELU→k1, identity shortcut) and
  a stride-``r`` downsample conv k=2r, channel-doubling → ELU → conv k3 to
  ``hidden`` (512). All convs causal (left pad = kernel−stride, ceil-based
  extra right pad).
- 8-layer transformer bottlenecks on each side: LayerNorm(+bias), GQA
  attention with RoPE θ=10 4, sliding-window-250 causal mask, LayerScale
  residual gains, gelu MLP (fc1/fc2, no bias).
- learnt 2× down/upsample convs (k4 s2; upsample grouped per-channel).
- split residual VQ: 1 semantic + 15 acoustic codebooks (size 2048,
  dim 256) behind shared 1×1 in/out projections; codebooks stored as
  ``embed_sum``/``cluster_usage`` EMA stats (embedding = sum/usage).
- mirrored SEANet decoder with causal transpose convs (trim right).

Frame size = 2·(8·6·5·4) = 1920 samples (12.5 Hz at 24 kHz).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import NEG_INF, sdpa
from ...ops.nn import init_linear, layer_norm, linear
from ...ops.rope import apply_rope, rope_angles


@dataclasses.dataclass(frozen=True)
class MimiConfig:
    sample_rate: int = 24000
    frame_rate: float = 12.5
    hidden: int = 512                  # SEANet output / transformer width
    num_filters: int = 64
    ratios: Tuple[int, ...] = (8, 6, 5, 4)  # decoder order; encoder reversed
    kernel_size: int = 7
    last_kernel_size: int = 3
    residual_kernel_size: int = 3
    compress: int = 2
    num_quantizers: int = 16
    codebook_size: int = 2048
    codebook_dim: int = 256
    transformer_layers: int = 8
    num_heads: int = 8
    num_kv_heads: int = 8
    head_dim: int = 64
    intermediate: int = 2048
    sliding_window: int = 250
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5

    @property
    def latent_dim(self) -> int:
        return self.hidden

    @property
    def samples_per_frame(self) -> int:
        out = 2  # learnt 2x resample stage
        for r in self.ratios:
            out *= r
        return out  # 1920

    @property
    def num_stages(self) -> int:
        return len(self.ratios)


def config_tiny() -> MimiConfig:
    return MimiConfig(hidden=32, num_filters=8, ratios=(4, 4, 2, 2),
                      codebook_size=64, codebook_dim=16,
                      transformer_layers=1, num_heads=2, num_kv_heads=2,
                      head_dim=16, intermediate=64)


# ---------------------------------------------------------------------------
# causal conv helpers (MimiConv1d / MimiConvTranspose1d semantics)
# ---------------------------------------------------------------------------

def _causal_pad(length: int, kernel: int, stride: int, dilation: int = 1) -> Tuple[int, int]:
    """(left, right) padding: left = effective_kernel - stride; right =
    ceil-based extra so every sample is consumed (MimiConv1d
    _get_extra_padding_for_conv1d)."""
    eff_k = (kernel - 1) * dilation + 1
    pad_total = eff_k - stride
    n_frames = (length - eff_k + pad_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + eff_k - pad_total
    return pad_total, max(ideal - length, 0)


def causal_conv(x, p, stride: int = 1, dilation: int = 1, groups: int = 1,
                pad_mode: str = "constant"):
    """x: [B, T, C]; p["w"]: [K, in/groups, out]. ``pad_mode`` "edge" for
    the learnt 2x downsample (HF Mimi uses replicate padding there)."""
    k = p["w"].shape[0]
    left, right = _causal_pad(x.shape[1], k, stride, dilation)
    y = jax.lax.conv_general_dilated(
        jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode=pad_mode), p["w"],
        window_strides=(stride,), padding=((0, 0),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups)
    if "b" in p:
        y = y + p["b"]
    return y


def causal_conv_transpose(x, p, stride: int, groups: int = 1):
    """Causal transpose conv: full ("VALID") output then trim kernel-stride
    samples from the right (MimiConvTranspose1d, trim_right_ratio=1).
    p["w"]: [K, in/groups, out]."""
    k = p["w"].shape[0]
    if groups == 1:
        y = jax.lax.conv_transpose(
            x, p["w"], (stride,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))
    else:
        y = _grouped_conv_transpose(x, p, stride)
    if "b" in p:
        y = y + p["b"]
    trim = k - stride
    return y[:, :-trim] if trim > 0 else y


def _grouped_conv_transpose(x, p, stride: int):
    """Grouped transpose conv via per-group vmap (the 2x upsample is fully
    depthwise: groups == channels). Returns the untrimmed full output."""
    k, in_per, out_total = p["w"].shape
    b, t, c = x.shape
    groups = c // in_per
    out_per = out_total // groups
    w = p["w"].reshape(k, in_per, groups, out_per).transpose(2, 0, 1, 3)  # [G,K,in,out]
    xg = x.reshape(b, t, groups, in_per).transpose(2, 0, 1, 3)            # [G,B,T,in]

    def one(xi, wi):
        return jax.lax.conv_transpose(
            xi, wi, (stride,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))

    yg = jax.vmap(one)(xg, w)                                             # [G,B,T',out]
    return yg.transpose(1, 2, 0, 3).reshape(b, -1, groups * out_per)


# ---------------------------------------------------------------------------
# parameter init (canonical tree; convert.py maps HF MimiModel names)
# ---------------------------------------------------------------------------

def _conv_p(key, k, cin, cout, dtype, bias=True):
    w = jax.random.normal(key, (k, cin, cout), dtype) / np.sqrt(k * cin)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def _init_seanet_encoder(key, cfg: MimiConfig, dtype):
    ks = jax.random.split(key, 2 + 2 * cfg.num_stages)
    f = cfg.num_filters
    stages = []
    ch = f
    for i, ratio in enumerate(reversed(cfg.ratios)):
        k1, k2, k3 = jax.random.split(ks[2 + i], 3)
        stages.append({
            "res": {"conv1": _conv_p(k1, cfg.residual_kernel_size, ch, ch // cfg.compress, dtype),
                    "conv2": _conv_p(k2, 1, ch // cfg.compress, ch, dtype)},
            "down": _conv_p(k3, ratio * 2, ch, ch * 2, dtype),
        })
        ch *= 2
    return {
        "conv_in": _conv_p(ks[0], cfg.kernel_size, 1, f, dtype),
        "stages": stages,
        "conv_out": _conv_p(ks[1], cfg.last_kernel_size, ch, cfg.hidden, dtype),
    }


def _init_seanet_decoder(key, cfg: MimiConfig, dtype):
    ks = jax.random.split(key, 2 + 2 * cfg.num_stages)
    ch = cfg.num_filters * (2 ** cfg.num_stages)
    stages = []
    for i, ratio in enumerate(cfg.ratios):
        k1, k2, k3 = jax.random.split(ks[2 + i], 3)
        stages.append({
            "up": _conv_p(k1, ratio * 2, ch, ch // 2, dtype),
            "res": {"conv1": _conv_p(k2, cfg.residual_kernel_size, ch // 2, ch // (2 * cfg.compress), dtype),
                    "conv2": _conv_p(k3, 1, ch // (2 * cfg.compress), ch // 2, dtype)},
        })
        ch //= 2
    return {
        "conv_in": _conv_p(ks[0], cfg.kernel_size, cfg.hidden, cfg.num_filters * (2 ** cfg.num_stages), dtype),
        "stages": stages,
        "conv_out": _conv_p(ks[1], cfg.last_kernel_size, cfg.num_filters, 1, dtype),
    }


def _init_transformer(key, cfg: MimiConfig, dtype):
    layers = []
    d = cfg.hidden
    for i in range(cfg.transformer_layers):
        k = jax.random.split(jax.random.fold_in(key, i), 6)
        layers.append({
            "ln1": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "q": init_linear(k[0], d, cfg.num_heads * cfg.head_dim, bias=False, dtype=dtype),
            "k": init_linear(k[1], d, cfg.num_kv_heads * cfg.head_dim, bias=False, dtype=dtype),
            "v": init_linear(k[2], d, cfg.num_kv_heads * cfg.head_dim, bias=False, dtype=dtype),
            "o": init_linear(k[3], cfg.num_heads * cfg.head_dim, d, bias=False, dtype=dtype),
            "attn_scale": jnp.full((d,), 0.01, dtype),
            "ln2": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "fc1": init_linear(k[4], d, cfg.intermediate, bias=False, dtype=dtype),
            "fc2": init_linear(k[5], cfg.intermediate, d, bias=False, dtype=dtype),
            "mlp_scale": jnp.full((d,), 0.01, dtype),
        })
    return layers


def _init_rvq(key, cfg: MimiConfig, n: int, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "input_proj": _conv_p(k1, 1, cfg.hidden, cfg.codebook_dim, dtype, bias=False),
        "output_proj": _conv_p(k2, 1, cfg.codebook_dim, cfg.hidden, dtype, bias=False),
        # EMA codebook stats, embedding = embed_sum / max(cluster_usage, eps)
        "embed_sum": jax.random.normal(k3, (n, cfg.codebook_size, cfg.codebook_dim), dtype) * 0.05,
        "cluster_usage": jnp.ones((n, cfg.codebook_size), dtype),
    }


def init_mimi_params(key, cfg: MimiConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8)
    return {
        "encoder": _init_seanet_encoder(ks[0], cfg, dtype),
        "encoder_transformer": _init_transformer(ks[1], cfg, dtype),
        "downsample": _conv_p(ks[2], 4, cfg.hidden, cfg.hidden, dtype, bias=False),
        "quantizer": {
            "semantic": _init_rvq(ks[3], cfg, 1, dtype),
            "acoustic": _init_rvq(ks[4], cfg, cfg.num_quantizers - 1, dtype),
        },
        "upsample": _conv_p(ks[5], 4, 1, cfg.hidden, dtype, bias=False),  # depthwise: [K, in/groups=1, out=C]
        "decoder_transformer": _init_transformer(ks[6], cfg, dtype),
        "decoder": _init_seanet_decoder(ks[7], cfg, dtype),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _elu(x):
    return jax.nn.elu(x)


def _resblock(p, x, cfg: MimiConfig, dilation: int = 1):
    h = causal_conv(_elu(x), p["conv1"], dilation=dilation)
    h = causal_conv(_elu(h), p["conv2"])
    return x + h


def seanet_encode(p, cfg: MimiConfig, audio):
    """audio [B, T] → [B, T/960, hidden]."""
    h = causal_conv(audio[:, :, None], p["conv_in"])
    for stage, ratio in zip(p["stages"], reversed(cfg.ratios)):
        h = _resblock(stage["res"], h, cfg)
        h = causal_conv(_elu(h), stage["down"], stride=ratio)
    return causal_conv(_elu(h), p["conv_out"])


def seanet_decode(p, cfg: MimiConfig, h):
    """[B, F', hidden] → audio [B, T]."""
    h = causal_conv(h, p["conv_in"])
    for stage, ratio in zip(p["stages"], cfg.ratios):
        h = causal_conv_transpose(_elu(h), stage["up"], ratio)
        h = _resblock(stage["res"], h, cfg)
    return causal_conv(_elu(h), p["conv_out"])[..., 0]


def mimi_transformer(layers, cfg: MimiConfig, x):
    """Sliding-window causal transformer with LayerScale residuals."""
    b, t, d = x.shape
    rows = jnp.arange(t)[:, None]
    cols = jnp.arange(t)[None, :]
    mask = jnp.where((cols <= rows) & (cols > rows - cfg.sliding_window),
                     0.0, NEG_INF)[None, None].astype(jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    cos, sin = rope_angles(positions, cfg.head_dim, cfg.rope_theta)
    cos, sin = cos[:, None], sin[:, None]
    rep = cfg.num_heads // cfg.num_kv_heads
    for p in layers:
        h = layer_norm(x, p["ln1"]["weight"], p["ln1"]["bias"], eps=cfg.norm_eps)
        q = linear(h, p["q"]).reshape(b, t, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        k = linear(h, p["k"]).reshape(b, t, cfg.num_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        v = linear(h, p["v"]).reshape(b, t, cfg.num_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        if rep > 1:
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        a = sdpa(q, k, v, 1.0 / np.sqrt(cfg.head_dim), mask)
        a = a.transpose(0, 2, 1, 3).reshape(b, t, -1)
        x = x + linear(a, p["o"]) * p["attn_scale"]
        h = layer_norm(x, p["ln2"]["weight"], p["ln2"]["bias"], eps=cfg.norm_eps)
        x = x + linear(jax.nn.gelu(linear(h, p["fc1"]), approximate=False), p["fc2"]) * p["mlp_scale"]
    return x


def _codebooks(rvq):
    """EMA stats → embeddings [n, size, dim]."""
    usage = jnp.maximum(rvq["cluster_usage"], 1e-5)
    return rvq["embed_sum"] / usage[..., None]


def _rvq_encode(rvq, x, n: int):
    """x [B, F, hidden] → codes [B, n, F]."""
    resid = causal_conv(x, rvq["input_proj"])
    books = _codebooks(rvq)
    codes = []
    for i in range(n):
        book = books[i]
        d2 = ((resid ** 2).sum(-1, keepdims=True)
              - 2 * resid @ book.T
              + (book ** 2).sum(-1)[None, None])
        idx = jnp.argmin(d2, axis=-1)
        codes.append(idx)
        resid = resid - jnp.take(book, idx, axis=0)
    return jnp.stack(codes, axis=1)


def _rvq_decode(rvq, codes):
    """codes [B, n, F] → [B, F, hidden]."""
    books = _codebooks(rvq)
    summed = jax.vmap(lambda book, c: jnp.take(book, c, axis=0),
                      in_axes=(0, 1), out_axes=1)(books, codes).sum(axis=1)
    return causal_conv(summed, rvq["output_proj"])


def mimi_encode_latent(params, cfg: MimiConfig, audio):
    h = seanet_encode(params["encoder"], cfg, audio)
    h = mimi_transformer(params["encoder_transformer"], cfg, h)
    return causal_conv(h, params["downsample"], stride=2, pad_mode="edge")


def mimi_encode(params, cfg: MimiConfig, audio):
    """audio [B, T] → codes [B, num_quantizers, F] (semantic first)."""
    latent = mimi_encode_latent(params, cfg, audio)
    sem = _rvq_encode(params["quantizer"]["semantic"], latent, 1)
    aco = _rvq_encode(params["quantizer"]["acoustic"], latent, cfg.num_quantizers - 1)
    return jnp.concatenate([sem, aco], axis=1)


def rvq_decode(params, cfg: MimiConfig, codes):
    """codes [B, K, F] → latent [B, F, hidden]."""
    out = _rvq_decode(params["quantizer"]["semantic"], codes[:, :1])
    if codes.shape[1] > 1:
        out = out + _rvq_decode(params["quantizer"]["acoustic"], codes[:, 1:])
    return out


def mimi_decode(params, cfg: MimiConfig, codes):
    """codes [B, K, F] → audio [B, F*1920]."""
    h = rvq_decode(params, cfg, codes)
    h = causal_conv_transpose(h, params["upsample"], 2, groups=cfg.hidden)
    h = mimi_transformer(params["decoder_transformer"], cfg, h)
    return jnp.clip(seanet_decode(params["decoder"], cfg, h), -1.0, 1.0)


# ---------------------------------------------------------------------------
# Streaming (carried-state) encode/decode — the reference's
# MimiStreamingEncoder/MimiStreamingDecoder (MimiCodec.swift:120-212), done
# the JAX way: every conv carries its left context, every transpose conv
# carries its overlap-add tail, and both transformers carry a
# sliding-window KV ring. Frame-by-frame streaming is EXACT vs the batch
# mimi_encode/mimi_decode (tested) as long as the clip fits the 250-frame
# attention window — causal left-padding is zeros, which is exactly what
# the zero-initialized carries reproduce.
# ---------------------------------------------------------------------------

def _sconv_init(p, batch: int, dtype, stride: int = 1, dilation: int = 1):
    """Carry for a streaming causal conv: the last eff_k - stride inputs."""
    k, cin, _ = p["w"].shape
    n = (k - 1) * dilation + 1 - stride
    return jnp.zeros((batch, n, cin), dtype)


def _sconv(x, p, carry, stride: int = 1, dilation: int = 1):
    """Streaming causal_conv: x [B, L, C] with L % stride == 0.
    Equivalent to the batch op because its left pad is zeros — the carry's
    initial value — and divisible L needs no right pad."""
    xx = jnp.concatenate([carry, x], axis=1)
    y = jax.lax.conv_general_dilated(
        xx, p["w"], window_strides=(stride,), padding=((0, 0),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    if "b" in p:
        y = y + p["b"]
    return y, xx[:, x.shape[1]:]


def _sconv_edge(x, p, carry, first, stride: int):
    """Streaming conv with replicate ("edge") left padding: on the first
    chunk the pad replicates the chunk's first element (exactly what
    jnp.pad(mode="edge") does in the batch op); afterwards the carry holds
    real history."""
    n = carry.shape[1]
    edge = jnp.repeat(x[:, :1], n, axis=1)
    carry = jnp.where(first, edge, carry)
    return _sconv(x, p, carry, stride=stride)


def _stconv_init(p, batch: int, dtype, stride: int, groups: int = 1):
    """Carry for a streaming transpose conv: the k - stride output tail
    (bias excluded) that overlap-adds into the next chunk's head.
    Output channels = w.shape[2] for both dense ([K, in, out]) and the
    fully-depthwise grouped layout ([K, 1, out_total])."""
    k = p["w"].shape[0]
    return jnp.zeros((batch, k - stride, p["w"].shape[2]), dtype)


def _stconv(x, p, carry, stride: int, groups: int = 1):
    """Streaming causal_conv_transpose: emit L*stride samples, carry the
    k-stride overlap tail. The tail excludes the bias (each output gets
    bias exactly once); the final tail is never emitted — the batch op's
    right trim."""
    k = p["w"].shape[0]
    if groups == 1:
        y = jax.lax.conv_transpose(x, p["w"], (stride,), "VALID",
                                   dimension_numbers=("NWC", "WIO", "NWC"))
    else:
        y = _grouped_conv_transpose(x, p, stride)
    emit_len = x.shape[1] * stride
    tail = y[:, emit_len:]
    y = y[:, :emit_len]
    y = y.at[:, : k - stride].add(carry)
    if "b" in p:
        y = y + p["b"]
    return y, tail


def _sresblock(p, st, x, cfg: MimiConfig):
    h, c1 = _sconv(_elu(x), p["conv1"], st)
    h = causal_conv(_elu(h), p["conv2"])  # k1 — stateless
    return x + h, c1


def _xf_stream_init(cfg: MimiConfig, n_layers: int, batch: int, dtype):
    w = cfg.sliding_window
    kv = cfg.num_kv_heads * cfg.head_dim
    return {
        "k": jnp.zeros((n_layers, batch, w, kv), dtype),
        "v": jnp.zeros((n_layers, batch, w, kv), dtype),
        "pos": jnp.zeros((), jnp.int32),
    }


def _xf_stream(layers, cfg: MimiConfig, st, x):
    """Streaming mimi_transformer over t new positions with a KV ring of
    the last sliding_window positions (keys stored RoPE'd at absolute
    positions — rotary scores depend on both sides' absolute angles, so
    ring storage is exact)."""
    b, t, d = x.shape
    w = cfg.sliding_window
    pos0 = st["pos"]
    positions = jnp.broadcast_to(pos0 + jnp.arange(t)[None], (b, t))
    cos, sin = rope_angles(positions, cfg.head_dim, cfg.rope_theta)
    cos, sin = cos[:, None], sin[:, None]
    rep = cfg.num_heads // cfg.num_kv_heads

    # STATE slot j holds absolute position pos0 - w + j (the w positions
    # before this chunk); attention runs over [state || new] = w + t keys
    # so a chunk's FIRST query still sees its full window (pre-shifting
    # into w slots evicted up to t-1 still-in-window keys, silently
    # diverging from the batch op once the stream passed w positions)
    abs_key = pos0 - w + jnp.arange(w + t)              # [w+t]
    q_abs = pos0 + jnp.arange(t)                        # [t]
    ok = ((abs_key[None, :] <= q_abs[:, None])
          & (abs_key[None, :] > q_abs[:, None] - w)
          & (abs_key[None, :] >= 0))
    mask = jnp.where(ok, 0.0, NEG_INF)[None, None].astype(jnp.float32)

    s_len = w + t
    new_k = st["k"]
    new_v = st["v"]
    for li, p in enumerate(layers):
        h = layer_norm(x, p["ln1"]["weight"], p["ln1"]["bias"], eps=cfg.norm_eps)
        q = linear(h, p["q"]).reshape(b, t, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        k = linear(h, p["k"]).reshape(b, t, cfg.num_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        v = linear(h, p["v"]).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        k = k.transpose(0, 2, 1, 3).reshape(b, t, -1)   # [B, t, kv]
        v = v.reshape(b, t, -1)
        kbuf = jnp.concatenate([new_k[li], k], axis=1)          # [B, w+t, kv]
        vbuf = jnp.concatenate([new_v[li], v], axis=1)
        new_k = new_k.at[li].set(kbuf[:, t:])                   # keep last w
        new_v = new_v.at[li].set(vbuf[:, t:])
        kh = kbuf.reshape(b, s_len, cfg.num_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        vh = vbuf.reshape(b, s_len, cfg.num_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        if rep > 1:
            kh = jnp.repeat(kh, rep, axis=1)
            vh = jnp.repeat(vh, rep, axis=1)
        a = sdpa(q, kh, vh, 1.0 / np.sqrt(cfg.head_dim), mask)
        a = a.transpose(0, 2, 1, 3).reshape(b, t, -1)
        x = x + linear(a, p["o"]) * p["attn_scale"]
        h = layer_norm(x, p["ln2"]["weight"], p["ln2"]["bias"], eps=cfg.norm_eps)
        x = x + linear(jax.nn.gelu(linear(h, p["fc1"]), approximate=False), p["fc2"]) * p["mlp_scale"]
    return x, {"k": new_k, "v": new_v, "pos": pos0 + t}


def init_mimi_encoder_stream(params, cfg: MimiConfig, batch: int = 1,
                             dtype=jnp.float32) -> dict:
    enc = params["encoder"]
    return {
        "conv_in": _sconv_init(enc["conv_in"], batch, dtype),
        "stages": [{
            "res": _sconv_init(s["res"]["conv1"], batch, dtype),
            "down": _sconv_init(s["down"], batch, dtype, stride=r),
        } for s, r in zip(enc["stages"], reversed(cfg.ratios))],
        "conv_out": _sconv_init(enc["conv_out"], batch, dtype),
        "xf": _xf_stream_init(cfg, len(params["encoder_transformer"]), batch, dtype),
        "down2": _sconv_init(params["downsample"], batch, dtype, stride=2),
        "first": jnp.ones((), bool),
    }


def mimi_encode_frame(params, cfg: MimiConfig, st, audio) -> tuple:
    """One streaming step: audio [B, n*1920] → codes [B, K, n]; exact vs
    the batch mimi_encode on the concatenated stream."""
    enc = params["encoder"]
    st = dict(st)
    h, st["conv_in"] = _sconv(audio[:, :, None], enc["conv_in"], st["conv_in"])
    stages = []
    for s_p, s_st, r in zip(enc["stages"], st["stages"], reversed(cfg.ratios)):
        s_st = dict(s_st)
        h, s_st["res"] = _sresblock(s_p["res"], s_st["res"], h, cfg)
        h, s_st["down"] = _sconv(_elu(h), s_p["down"], s_st["down"], stride=r)
        stages.append(s_st)
    st["stages"] = stages
    h, st["conv_out"] = _sconv(_elu(h), enc["conv_out"], st["conv_out"])
    h, st["xf"] = _xf_stream(params["encoder_transformer"], cfg, st["xf"], h)
    latent, st["down2"] = _sconv_edge(h, params["downsample"], st["down2"],
                                      st["first"], stride=2)
    st["first"] = jnp.zeros((), bool)
    sem = _rvq_encode(params["quantizer"]["semantic"], latent, 1)
    aco = _rvq_encode(params["quantizer"]["acoustic"], latent, cfg.num_quantizers - 1)
    return jnp.concatenate([sem, aco], axis=1), st


def init_mimi_decoder_stream(params, cfg: MimiConfig, batch: int = 1,
                             dtype=jnp.float32) -> dict:
    dec = params["decoder"]
    return {
        "up2": _stconv_init(params["upsample"], batch, dtype, stride=2,
                            groups=cfg.hidden),
        "xf": _xf_stream_init(cfg, len(params["decoder_transformer"]), batch, dtype),
        "conv_in": _sconv_init(dec["conv_in"], batch, dtype),
        "stages": [{
            "up": _stconv_init(s["up"], batch, dtype, stride=r),
            "res": _sconv_init(s["res"]["conv1"], batch, dtype),
        } for s, r in zip(dec["stages"], cfg.ratios)],
        "conv_out": _sconv_init(dec["conv_out"], batch, dtype),
    }


def mimi_decode_frame(params, cfg: MimiConfig, st, codes) -> tuple:
    """One streaming step: codes [B, K, n] → audio [B, n*1920]; exact vs
    the batch mimi_decode on the concatenated stream."""
    dec = params["decoder"]
    st = dict(st)
    h = rvq_decode(params, cfg, codes)
    h, st["up2"] = _stconv(h, params["upsample"], st["up2"], stride=2,
                           groups=cfg.hidden)
    h, st["xf"] = _xf_stream(params["decoder_transformer"], cfg, st["xf"], h)
    h, st["conv_in"] = _sconv(h, dec["conv_in"], st["conv_in"])
    stages = []
    for s_p, s_st, r in zip(dec["stages"], st["stages"], cfg.ratios):
        s_st = dict(s_st)
        h, s_st["up"] = _stconv(_elu(h), s_p["up"], s_st["up"], stride=r)
        h, s_st["res"] = _sresblock(s_p["res"], s_st["res"], h, cfg)
        stages.append(s_st)
    st["stages"] = stages
    wav, st["conv_out"] = _sconv(_elu(h), dec["conv_out"], st["conv_out"])
    return jnp.clip(wav[..., 0], -1.0, 1.0), st

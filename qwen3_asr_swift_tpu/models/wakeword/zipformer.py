"""Streaming Zipformer2 transducer encoder for keyword spotting.

The reference's wake-word model is icefall's KWS Zipformer (gigaspeech,
3.49M params) exported to CoreML as three units — encoder / stateless
decoder / joiner — driven by a host-side modified beam search
(reference: Sources/SpeechWakeWord/SpeechWakeWord.swift:5-9,
Configuration.swift:57-96, StreamingSession.swift:130-144). This module is
the TPU-native equivalent: the real Zipformer2 topology (Conv2dSubsampling
with a ConvNeXt block, six encoder stacks at downsampling factors
1/2/4/8/4/2, shared relative-position attention weights per layer feeding
two self-attention modules and a nonlin-attention module, two chunk-causal
depthwise convolution modules, three feed-forwards, BiasNorm and learned
bypasses) implemented as a *streaming-first* JAX program: one jitted
``encode_chunk`` step consumes 32 fresh mel frames (a 45-frame window) and
carries all per-layer caches as an explicit pytree, so batch encoding is a
``lax.scan`` over chunk windows — the whole utterance stays on device.

Streaming semantics follow the reference export: chunk size 16 frames at
50 Hz (32 mel frames of stride), 64 frames of attention left context,
output at 25 Hz after the final 2x downsample, joiner-space projection
fused into the encoder (encoder_out is ``joiner_dim``-wide, matching the
CoreML export's ``encoder_out: (1, 8, 320)``).

Conventions that differ from icefall's torch code (handled by convert.py
so checkpoints load transparently): linear weights stored transposed
(in,out); conv weights HWIO/(width,in,out); attention q rows pre-scaled by
sqrt(query_head_dim) so the runtime uses a scaled dot product.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.nn import init_linear, linear


@dataclasses.dataclass(frozen=True)
class ZipformerConfig:
    """Hyperparameters of the KWS Zipformer (icefall gigaspeech recipe).

    Defaults reproduce the 3.49M-param wake-word checkpoint
    (reference: Configuration.swift:57-96 — chunk 16, left context 64,
    joiner_dim 320, vocab 500, context_size 2).
    """

    num_mel_bins: int = 80
    num_layers: Tuple[int, ...] = (1, 1, 1, 1, 1, 1)
    downsampling: Tuple[int, ...] = (1, 2, 4, 8, 4, 2)
    encoder_dim: Tuple[int, ...] = (128, 128, 128, 128, 128, 128)
    ff_dim: Tuple[int, ...] = (192, 192, 192, 192, 192, 192)
    num_heads: Tuple[int, ...] = (4, 4, 4, 8, 4, 4)
    cnn_kernel: Tuple[int, ...] = (31, 31, 15, 15, 15, 31)
    query_head_dim: int = 32
    pos_head_dim: int = 4
    value_head_dim: int = 12
    pos_dim: int = 48
    chunk_size: int = 16          # 50 Hz frames per streaming step
    left_context: int = 64        # 50 Hz frames of attention left context
    embed_channels: Tuple[int, int, int] = (8, 32, 128)
    joiner_dim: int = 320
    decoder_dim: int = 320
    vocab_size: int = 500
    context_size: int = 2
    blank_id: int = 0

    @property
    def output_dim(self) -> int:
        return max(self.encoder_dim)

    @property
    def mel_window(self) -> int:
        """Mel frames per streaming step: chunk*2 fresh + 13 overlap
        (7 subsampling + 2*3 ConvNeXt pad — Configuration.swift:77)."""
        return self.chunk_size * 2 + 13

    @property
    def mel_stride(self) -> int:
        return self.chunk_size * 2

    @property
    def embed_freq_out(self) -> int:
        f = self.num_mel_bins                      # conv0: pad 1, k 3 → same
        f = (f - 3) // 2 + 1                       # conv1: k 3 stride 2
        f = (f - 3) // 2 + 1                       # conv2: k 3 stride (1,2)
        return f


# ---------------------------------------------------------------------------
# Scheduled-nonlinearity primitives (inference forms; the training-time
# balancers/whiteners are parameter-free no-ops at inference)
# ---------------------------------------------------------------------------

def swoosh_l(x):
    return jnp.logaddexp(0.0, x - 4.0) - 0.08 * x - 0.035


def swoosh_r(x):
    return jnp.logaddexp(0.0, x - 1.0) - 0.08 * x - 0.313261687


def bias_norm(x, p):
    """BiasNorm: scale x by the inverse RMS of (x - bias); per-tensor
    learned log_scale."""
    d = x - p["bias"]
    rms = jnp.sqrt(jnp.mean(d * d, axis=-1, keepdims=True) + 1e-8)
    return x * (jnp.exp(p["log_scale"]) / rms)


def bypass(p, x_orig, x):
    scale = jnp.clip(p["bypass_scale"], 0.0, 1.0)
    return x_orig + (x - x_orig) * scale


# ---------------------------------------------------------------------------
# Parameter initialization (canonical tree; convert.py maps icefall names)
# ---------------------------------------------------------------------------

def _init_biasnorm(dim, dtype):
    return {"bias": jnp.zeros((dim,), dtype), "log_scale": jnp.zeros((), dtype)}


def _init_conv2d(key, kh, kw, cin, cout, dtype):
    fan_in = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout), dtype) / np.sqrt(fan_in)
    return {"w": w, "b": jnp.zeros((cout,), dtype)}


def init_embed_params(key, cfg: ZipformerConfig, dtype=jnp.float32) -> dict:
    """Conv2dSubsampling: 3 conv stages (T-7)//2 temporal, 80→19 freq,
    ConvNeXt block, linear out, BiasNorm."""
    c1, c2, c3 = cfg.embed_channels
    ks = jax.random.split(key, 7)
    f_out = cfg.embed_freq_out
    return {
        "conv0": _init_conv2d(ks[0], 3, 3, 1, c1, dtype),
        "conv1": _init_conv2d(ks[1], 3, 3, c1, c2, dtype),
        "conv2": _init_conv2d(ks[2], 3, 3, c2, c3, dtype),
        "convnext": {
            # depthwise 7x7 (time causal in streaming: 6 left pad cached=3 at
            # the exported rate — see encode_chunk), pointwise 1x1 pair
            "dw": {"w": jax.random.normal(ks[3], (7, 7, 1, c3), dtype) * 0.02,
                   "b": jnp.zeros((c3,), dtype)},
            "pw1": init_linear(ks[4], c3, 3 * c3, dtype=dtype),
            "pw2": init_linear(ks[5], 3 * c3, c3, dtype=dtype),
        },
        "out": init_linear(ks[6], f_out * c3, cfg.encoder_dim[0], dtype=dtype),
        "out_norm": _init_biasnorm(cfg.encoder_dim[0], dtype),
    }


def _init_ff(key, dim, hidden, dtype):
    k1, k2 = jax.random.split(key)
    return {"in_proj": init_linear(k1, dim, hidden, dtype=dtype),
            "out_proj": init_linear(k2, hidden, dim, dtype=dtype)}


def init_layer_params(key, cfg: ZipformerConfig, stack: int, dtype=jnp.float32) -> dict:
    d = cfg.encoder_dim[stack]
    ff = cfg.ff_dim[stack]
    h = cfg.num_heads[stack]
    qd, pd, vd = cfg.query_head_dim, cfg.pos_head_dim, cfg.value_head_dim
    kernel = cfg.cnn_kernel[stack]
    hidden = 3 * d // 4  # NonlinAttention hidden channels
    ks = jax.random.split(key, 12)

    def conv_module(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "in_proj": init_linear(k1, d, 2 * d, dtype=dtype),
            # chunk-causal depthwise conv: causal half + chunkwise full kernel
            "causal_w": jax.random.normal(k2, ((kernel + 1) // 2, 1, d), dtype) * 0.02,
            "causal_b": jnp.zeros((d,), dtype),
            "chunkwise_w": jax.random.normal(k3, (kernel, 1, d), dtype) * 0.02,
            "chunkwise_b": jnp.zeros((d,), dtype),
            "out_proj": init_linear(k4, d, d, dtype=dtype),
        }

    return {
        "attn_weights": {
            # packed q|k|p projection (icefall in_proj) and the relative
            # position projection (linear_pos)
            "in_proj": init_linear(ks[0], d, h * (2 * qd + pd), dtype=dtype),
            "linear_pos": init_linear(ks[1], cfg.pos_dim, h * pd, bias=False, dtype=dtype),
        },
        "self_attn1": {"in_proj": init_linear(ks[2], d, h * vd, dtype=dtype),
                       "out_proj": init_linear(ks[3], h * vd, d, dtype=dtype)},
        "self_attn2": {"in_proj": init_linear(ks[4], d, h * vd, dtype=dtype),
                       "out_proj": init_linear(ks[5], h * vd, d, dtype=dtype)},
        "nonlin_attention": {"in_proj": init_linear(ks[6], d, 3 * hidden, dtype=dtype),
                             "out_proj": init_linear(ks[7], hidden, d, dtype=dtype)},
        "conv_module1": conv_module(ks[8]),
        "conv_module2": conv_module(ks[9]),
        "feed_forward1": _init_ff(ks[10], d, (ff * 3) // 4, dtype),
        "feed_forward2": _init_ff(jax.random.fold_in(ks[10], 1), d, ff, dtype),
        "feed_forward3": _init_ff(jax.random.fold_in(ks[10], 2), d, (ff * 5) // 4, dtype),
        "norm": _init_biasnorm(d, dtype),
        "bypass": {"bypass_scale": jnp.full((d,), 0.5, dtype)},
        "bypass_mid": {"bypass_scale": jnp.full((d,), 0.5, dtype)},
    }


def init_zipformer_params(key, cfg: ZipformerConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8 + len(cfg.num_layers))
    stacks = []
    for i, n in enumerate(cfg.num_layers):
        layer_keys = jax.random.split(ks[2 + i], n)
        stack = {"layers": [init_layer_params(k, cfg, i, dtype) for k in layer_keys]}
        if cfg.downsampling[i] > 1:
            stack["downsample_bias"] = jnp.zeros((cfg.downsampling[i],), dtype)
            stack["out_combiner"] = {"bypass_scale": jnp.full((cfg.encoder_dim[i],), 0.5, dtype)}
        stacks.append(stack)
    n = len(cfg.num_layers)
    return {
        "embed": init_embed_params(ks[0], cfg, dtype),
        "stacks": stacks,
        "downsample_output_bias": jnp.zeros((2,), dtype),
        "encoder_proj": init_linear(ks[2 + n], cfg.output_dim, cfg.joiner_dim, dtype=dtype),
        # transducer head (decoder/joiner run host-side per beam hypothesis)
        "decoder": {
            "embedding": jax.random.normal(ks[3 + n], (cfg.vocab_size, cfg.decoder_dim), dtype) * 0.02,
            # groups = decoder_dim // 4, kernel = context_size, no bias
            "conv_w": jax.random.normal(
                ks[4 + n], (cfg.context_size, 4, cfg.decoder_dim), dtype) * 0.05,
        },
        "joiner": {
            "decoder_proj": init_linear(ks[5 + n], cfg.decoder_dim, cfg.joiner_dim, dtype=dtype),
            "output_linear": init_linear(ks[6 + n], cfg.joiner_dim, cfg.vocab_size, dtype=dtype),
        },
    }


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Streaming state
# ---------------------------------------------------------------------------

def init_states(cfg: ZipformerConfig, batch: int = 1, dtype=jnp.float32) -> dict:
    """Zeroed cache pytree, the analog of the CoreML export's named state
    tensors (StreamingSession.swift:39-55)."""
    layer_states = []
    for i, n in enumerate(cfg.num_layers):
        d = cfg.encoder_dim[i]
        h = cfg.num_heads[i]
        left = cfg.left_context // cfg.downsampling[i]
        hidden = 3 * d // 4
        for _ in range(n):
            layer_states.append({
                "cached_key": jnp.zeros((batch, left, h * cfg.query_head_dim), dtype),
                "cached_val1": jnp.zeros((batch, left, h * cfg.value_head_dim), dtype),
                "cached_val2": jnp.zeros((batch, left, h * cfg.value_head_dim), dtype),
                "cached_nonlin": jnp.zeros((batch, left, hidden), dtype),
                "cached_conv1": jnp.zeros((batch, (cfg.cnn_kernel[i] + 1) // 2 - 1, d), dtype),
                "cached_conv2": jnp.zeros((batch, (cfg.cnn_kernel[i] + 1) // 2 - 1, d), dtype),
            })
    return {
        # ConvNeXt causal left pad: 6 frames at the post-subsampling rate
        "cached_embed_left_pad": jnp.zeros((batch, 6, cfg.embed_freq_out, cfg.embed_channels[2]), dtype),
        "layers": layer_states,
        "processed": jnp.zeros((batch,), jnp.int32),
    }


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

def _conv2d(x, p, stride=(1, 1), pad=((0, 0), (0, 0))):
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride, padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


def embed_chunk(params, mel, left_pad):
    """Conv2dSubsampling over a mel window.

    mel: [B, T_mel, 80] → features [B, (T_mel-7)//2, d0] with the ConvNeXt
    block causal over time via the carried 6-frame left pad.
    Returns (features, new_left_pad).
    """
    x = mel[..., None].transpose(0, 1, 2, 3)  # [B, T, F, 1]
    x = swoosh_r(_conv2d(x, params["conv0"], pad=((0, 0), (1, 1))))
    x = swoosh_r(_conv2d(x, params["conv1"], stride=(2, 2)))
    x = swoosh_r(_conv2d(x, params["conv2"], stride=(1, 2)))
    # x: [B, T', 19, 128]
    cn = params["convnext"]
    padded = jnp.concatenate([left_pad, x], axis=1)            # causal time pad
    # consecutive windows overlap by 3 conv frames (19 produced, 16-frame
    # stride), so the next window's causal context is the 6 frames BEFORE
    # its first conv frame: padded[-9:-3], not the last 6 (which would
    # duplicate frames the next window recomputes and skip 3 older ones,
    # time-shifting every chunk's ConvNeXt receptive field)
    new_left_pad = padded[:, -9:-3]
    dw = jax.lax.conv_general_dilated(
        padded, cn["dw"]["w"], window_strides=(1, 1),
        padding=((0, 0), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1]) + cn["dw"]["b"]
    y = linear(swoosh_l(linear(dw, cn["pw1"])), cn["pw2"])
    x = x + y[:, : x.shape[1]]
    b, t, f, c = x.shape
    x = linear(x.reshape(b, t, f * c), params["out"])
    return bias_norm(x, params["out_norm"]), new_left_pad


def _rel_pos_embedding(rel: jnp.ndarray, pos_dim: int) -> jnp.ndarray:
    """Compact relative positional embedding: distances compressed
    logarithmically (CompactRelPositionalEncoding-style) then expanded in
    sinusoids. ``rel``: int array of relative distances (key - query)."""
    x = jnp.sign(rel).astype(jnp.float32) * jnp.log1p(jnp.abs(rel).astype(jnp.float32))
    half = pos_dim // 2
    freqs = jnp.exp(-jnp.arange(half, dtype=jnp.float32) * (np.log(100.0) / max(half - 1, 1)))
    ang = x[..., None] * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def attention_weights(p, x, cached_key, cfg: ZipformerConfig, n_heads: int):
    """Shared relative-position attention weights over (left | chunk).

    x: [B, T, D] current chunk at this stack's rate. Returns
    (weights [B, H, T, L+T], new_cached_key). Positional scores involve
    only the CURRENT chunk's query projections, so no positional state is
    cached.
    """
    qd, pd = cfg.query_head_dim, cfg.pos_head_dim
    b, t, _ = x.shape
    proj = linear(x, p["in_proj"])
    q, k, pq = jnp.split(proj, [n_heads * qd, 2 * n_heads * qd], axis=-1)
    keys = jnp.concatenate([cached_key, k], axis=1)    # [B, L+T, H*qd]
    s = keys.shape[1]
    left = s - t

    qh = q.reshape(b, t, n_heads, qd).transpose(0, 2, 1, 3)
    kh = keys.reshape(b, s, n_heads, qd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh) / np.sqrt(qd)

    # relative positional scores: p_i · emb(rel) with rel = key_pos - query_pos
    ph = pq.reshape(b, t, n_heads, pd).transpose(0, 2, 1, 3)   # [B,H,T,pd]
    rel = jnp.arange(s)[None, :] - (jnp.arange(t)[:, None] + left)  # [T, S]
    emb = _rel_pos_embedding(rel, cfg.pos_dim)                 # [T, S, pos_dim]
    pos_proj = linear(emb, p["linear_pos"]).reshape(t, s, n_heads, pd)
    pos_scores = jnp.einsum("bhtd,tshd->bhts", ph, pos_proj)
    weights = jax.nn.softmax(scores + pos_scores, axis=-1)

    new_key = keys[:, -left:] if left > 0 else keys[:, :0]
    return weights, new_key


def self_attention(p, x, cached_val, weights, n_heads: int, vd: int):
    b, t, _ = x.shape
    v = linear(x, p["in_proj"])
    vals = jnp.concatenate([cached_val, v], axis=1)
    s = vals.shape[1]
    left = s - t
    vh = vals.reshape(b, s, n_heads, vd).transpose(0, 2, 1, 3)
    out = jnp.einsum("bhts,bhsd->bhtd", weights, vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, n_heads * vd)
    new_cached = vals[:, -left:] if left > 0 else vals[:, :0]
    return linear(out, p["out_proj"]), new_cached


def nonlin_attention(p, x, cached, weights_head0):
    """NonlinAttention: gated value aggregation using the first attention
    head's weights. weights_head0: [B, T, L+T]."""
    b, t, _ = x.shape
    s_, xx, y = jnp.split(linear(x, p["in_proj"]), 3, axis=-1)
    xx = xx * jnp.tanh(s_)
    vals = jnp.concatenate([cached, xx], axis=1)
    left = vals.shape[1] - t
    agg = jnp.einsum("bts,bsd->btd", weights_head0, vals)
    new_cached = vals[:, -left:] if left > 0 else vals[:, :0]
    return linear(agg * y, p["out_proj"]), new_cached


def conv_module(p, x, cached):
    """Chunk-causal depthwise conv: a causal half-kernel conv (with carried
    left state) plus a chunk-internal full-kernel conv, as in icefall's
    ChunkCausalDepthwiseConv1d."""
    b, t, d = x.shape
    xx, s = jnp.split(linear(x, p["in_proj"]), 2, axis=-1)
    xx = xx * jax.nn.sigmoid(s)

    causal_in = jnp.concatenate([cached, xx], axis=1)
    new_cached = causal_in[:, -cached.shape[1]:] if cached.shape[1] > 0 else cached
    causal = jax.lax.conv_general_dilated(
        causal_in, p["causal_w"], window_strides=(1,), padding=((0, 0),),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=d) + p["causal_b"]
    kernel = p["chunkwise_w"].shape[0]
    chunkwise = jax.lax.conv_general_dilated(
        xx, p["chunkwise_w"], window_strides=(1,),
        padding=((kernel // 2, kernel // 2),),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=d) + p["chunkwise_b"]
    out = swoosh_r(causal + chunkwise)
    return linear(out, p["out_proj"]), new_cached


def feed_forward(p, x):
    return linear(swoosh_l(linear(x, p["in_proj"])), p["out_proj"])


def encoder_layer(p, x, state, cfg: ZipformerConfig, stack: int):
    """One Zipformer2 layer streaming step at this stack's frame rate."""
    n_heads = cfg.num_heads[stack]
    vd = cfg.value_head_dim
    src_orig = x
    weights, new_key = attention_weights(
        p["attn_weights"], x, state["cached_key"], cfg, n_heads)

    x = x + feed_forward(p["feed_forward1"], x)
    na, new_nonlin = nonlin_attention(p["nonlin_attention"], x, state["cached_nonlin"], weights[:, 0])
    x = x + na
    sa, new_val1 = self_attention(p["self_attn1"], x, state["cached_val1"], weights, n_heads, vd)
    x = x + sa
    cv, new_conv1 = conv_module(p["conv_module1"], x, state["cached_conv1"])
    x = x + cv
    x = x + feed_forward(p["feed_forward2"], x)
    x = bypass(p["bypass_mid"], src_orig, x)
    sa, new_val2 = self_attention(p["self_attn2"], x, state["cached_val2"], weights, n_heads, vd)
    x = x + sa
    cv, new_conv2 = conv_module(p["conv_module2"], x, state["cached_conv2"])
    x = x + cv
    x = x + feed_forward(p["feed_forward3"], x)
    x = bias_norm(x, p["norm"])
    x = bypass(p["bypass"], src_orig, x)
    new_state = {"cached_key": new_key,
                 "cached_val1": new_val1, "cached_val2": new_val2,
                 "cached_nonlin": new_nonlin,
                 "cached_conv1": new_conv1, "cached_conv2": new_conv2}
    return x, new_state


def simple_downsample(x, bias, ds: int):
    b, t, d = x.shape
    w = jax.nn.softmax(bias)
    return jnp.einsum("bkgd,g->bkd", x.reshape(b, t // ds, ds, d), w)


def encode_chunk(params, cfg: ZipformerConfig, mel_window, states):
    """One streaming step: 45-frame mel window → 8 joiner-space frames.

    mel_window: [B, cfg.mel_window, 80]. Returns (encoder_out
    [B, chunk//2, joiner_dim], new_states). jit-able; batch encode is a
    scan of this over chunk windows.
    """
    x, new_embed_pad = embed_chunk(params["embed"], mel_window, states["cached_embed_left_pad"])
    # keep the freshest chunk_size frames at 50 Hz (window overlap covers
    # the subsampling + ConvNeXt receptive field)
    x = x[:, -cfg.chunk_size:]

    new_layer_states: List[dict] = []
    li = 0
    for i in range(len(cfg.num_layers)):
        ds = cfg.downsampling[i]
        src = x
        if ds > 1:
            x = simple_downsample(x, params["stacks"][i]["downsample_bias"], ds)
        for j in range(cfg.num_layers[i]):
            x, ns = encoder_layer(params["stacks"][i]["layers"][j], x,
                                  states["layers"][li], cfg, i)
            new_layer_states.append(ns)
            li += 1
        if ds > 1:
            x = jnp.repeat(x, ds, axis=1)[:, : src.shape[1]]
            x = bypass(params["stacks"][i]["out_combiner"], src, x)

    # final 2x output downsample then the fused joiner-space projection
    x = simple_downsample(x, params["downsample_output_bias"], 2)
    out = linear(x, params["encoder_proj"])
    new_states = {"cached_embed_left_pad": new_embed_pad,
                  "layers": new_layer_states,
                  "processed": states["processed"] + cfg.mel_stride}
    return out, new_states


def encode_windows(params, cfg: ZipformerConfig, windows, states):
    """Scan ``encode_chunk`` over [N, B, mel_window, 80] chunk windows.
    Returns ([B, N*chunk//2, joiner_dim], final_states)."""

    def step(st, win):
        out, st = encode_chunk(params, cfg, win, st)
        return st, out

    final, outs = jax.lax.scan(step, states, windows)
    n, b, t, d = outs.shape
    return outs.transpose(1, 0, 2, 3).reshape(b, n * t, d), final


# ---------------------------------------------------------------------------
# Transducer head (host side: tiny matmuls driven by the beam search)
# ---------------------------------------------------------------------------

def decoder_out(params, context: Sequence[int], cfg: ZipformerConfig) -> np.ndarray:
    """Stateless decoder: embed ``context_size`` tokens, grouped conv over
    the context axis, ReLU, project to joiner space. Negative ids (initial
    padding) embed as zeros, matching icefall's padded start context."""
    emb_table = np.asarray(params["decoder"]["embedding"])
    ctx = list(context)[-cfg.context_size:]
    while len(ctx) < cfg.context_size:
        ctx.insert(0, -1)
    emb = np.stack([np.zeros(emb_table.shape[1], emb_table.dtype) if t < 0 else emb_table[t]
                    for t in ctx])                              # [ctx, D]
    w = np.asarray(params["decoder"]["conv_w"])                 # [ctx, D/groups→4, D]
    d = emb.shape[1]
    groups = d // (w.shape[1])
    per = d // groups
    out = np.zeros(d, emb.dtype)
    for g in range(groups):
        seg = emb[:, g * per:(g + 1) * per]                     # [ctx, per]
        out[g * per:(g + 1) * per] = np.einsum("ki,kio->o", seg, w[:, :, g * per:(g + 1) * per])
    out = np.maximum(out, 0.0)
    dp = params["joiner"]["decoder_proj"]
    return out @ np.asarray(dp["kernel"]) + np.asarray(dp["bias"])


def joiner_logits(params, enc_frame: np.ndarray, dec_out: np.ndarray) -> np.ndarray:
    """logits = output_linear(tanh(enc + dec)); encoder projection is fused
    into the encoder program."""
    ol = params["joiner"]["output_linear"]
    return np.tanh(enc_frame + dec_out) @ np.asarray(ol["kernel"]) + np.asarray(ol["bias"])

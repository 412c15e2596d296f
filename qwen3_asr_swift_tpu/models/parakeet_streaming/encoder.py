"""Cache-aware streaming conformer encoder.

TPU-native analog of the reference's cache-aware CoreML encoder
(reference: Sources/ParakeetStreamingASR/StreamingSession.swift:80-305 —
encoder takes pre_cache / cache_last_channel / cache_last_time /
cache_last_channel_len as model I/O and returns the advanced caches).
Here the caches are an explicit carry pytree and the whole chunk step is
ONE jitted program: mel chunk + caches → encoder frames + new caches.
Every shape is static, so the per-chunk latency path never recompiles.

Causality layout:
- subsampling: pre_cache (7 mel frames) ‖ chunk (8k frames) through three
  stride-2 k=3 VALID convs (receptive field 15, stride 8) → exactly k new
  frames; new pre_cache = last 7 mel frames.
- attention: keys/values are cache_channel (att_context tokens,
  right-aligned) ‖ current chunk; Transformer-XL u/v biases with a
  sinusoid relative-position table gathered per (query, key) offset.
- conv module: depthwise k=9 VALID over cache_time (8 tokens) ‖ chunk.
Cache updates shift left and append — pure jnp.roll/concat, no host.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import NEG_INF
from ...ops.nn import init_linear, layer_norm, linear
from .config import StreamingConformerConfig


def swish(x):
    return jax.nn.silu(x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EncoderCaches:
    """Streaming carry (reference: cacheLastChannel/Time/Len + preCache,
    StreamingSession.swift:20-24)."""

    pre_mel: jax.Array        # [B, pre_cache, mel]
    channel: jax.Array        # [L, B, att_context, D] cached attention keys input
    time: jax.Array           # [L, B, conv_cache, D] cached conv left context
    channel_len: jax.Array    # [B] int32 — valid entries in `channel`
    sample_tail: jax.Array    # [B, n_fft - hop] raw-sample left context for the
                              # streaming mel (the reference's StreamingMel
                              # loopback pre-cache)


def init_caches(cfg: StreamingConformerConfig, batch: int = 1, dtype=jnp.float32) -> EncoderCaches:
    return EncoderCaches(
        pre_mel=jnp.zeros((batch, cfg.pre_cache, cfg.num_mel_bins), dtype),
        channel=jnp.zeros((cfg.encoder_layers, batch, cfg.att_context, cfg.encoder_hidden), dtype),
        time=jnp.zeros((cfg.encoder_layers, batch, cfg.conv_cache, cfg.encoder_hidden), dtype),
        channel_len=jnp.zeros((batch,), jnp.int32),
        sample_tail=jnp.zeros((batch, cfg.n_fft - cfg.hop_length), dtype),
    )


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _ln(d, dtype):
    return {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def init_encoder_params(key, cfg: StreamingConformerConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8 + cfg.encoder_layers)
    c = cfg.subsampling_channels
    d = cfg.encoder_hidden
    h, hd = cfg.num_heads, cfg.head_dim
    mel_sub = cfg.num_mel_bins  # feature axis is NOT subsampled (1D convs)

    def conv1d_k3(key, cin, cout):
        scale = 1.0 / np.sqrt(3 * cin)
        return {"kernel": (jax.random.normal(key, (3, cin, cout)) * scale).astype(dtype),
                "bias": jnp.zeros((cout,), dtype)}

    params = {
        "sub1": conv1d_k3(ks[0], cfg.num_mel_bins, c),
        "sub2": conv1d_k3(ks[1], c, c),
        "sub3": conv1d_k3(ks[2], c, c),
        "sub_out": init_linear(ks[3], c, d, dtype=dtype),
        "pos_u": jnp.zeros((h, hd), dtype),
        "pos_v": jnp.zeros((h, hd), dtype),
        "layers": [],
    }
    ffn_dim = d * cfg.ffn_expansion
    for i in range(cfg.encoder_layers):
        k = jax.random.split(ks[8 + i], 12)
        params["layers"].append({
            "ff1_ln": _ln(d, dtype),
            "ff1_in": init_linear(k[0], d, ffn_dim, dtype=dtype),
            "ff1_out": init_linear(k[1], ffn_dim, d, dtype=dtype),
            "att_ln": _ln(d, dtype),
            "att": {
                "q": init_linear(k[2], d, d, dtype=dtype),
                "k": init_linear(k[3], d, d, dtype=dtype),
                "v": init_linear(k[4], d, d, dtype=dtype),
                "o": init_linear(k[5], d, d, dtype=dtype),
                "pos": init_linear(k[6], d, d, bias=False, dtype=dtype),
            },
            "conv_ln": _ln(d, dtype),
            "conv": {
                "pw1": init_linear(k[7], d, 2 * d, dtype=dtype),
                "dw": {"kernel": (jax.random.normal(k[8], (cfg.conv_kernel, 1, d))
                                  * (1.0 / np.sqrt(cfg.conv_kernel))).astype(dtype),
                       "bias": jnp.zeros((d,), dtype)},
                "norm": _ln(d, dtype),
                "pw2": init_linear(k[9], d, d, dtype=dtype),
            },
            "ff2_ln": _ln(d, dtype),
            "ff2_in": init_linear(k[10], d, ffn_dim, dtype=dtype),
            "ff2_out": init_linear(k[11], ffn_dim, d, dtype=dtype),
            "final_ln": _ln(d, dtype),
        })
    return params


# ---------------------------------------------------------------------------
# pieces
# ---------------------------------------------------------------------------

def _subsample(params, cfg: StreamingConformerConfig, pre_mel, mel_chunk):
    """pre_mel [B,P,mel] ‖ chunk [B,M,mel] → ([B, M/8, D], new pre_mel).

    Three k=3 s=2 VALID 1D convs (over time, features as channels): with
    P = 7 the output length is exactly M/8 and each output frame sees
    only current + past mel frames."""
    x = jnp.concatenate([pre_mel, mel_chunk], axis=1)  # [B, P+M, mel]
    new_pre = x[:, -cfg.pre_cache:]

    def s2(x, p):
        y = jax.lax.conv_general_dilated(
            x, p["kernel"], window_strides=(2,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32,
        ) + p["bias"].astype(jnp.float32)
        return jax.nn.relu(y).astype(x.dtype)

    x = s2(x, params["sub1"])
    x = s2(x, params["sub2"])
    x = s2(x, params["sub3"])
    return linear(x, params["sub_out"]), new_pre


def _rel_table(max_dist: int, d_model: int) -> np.ndarray:
    """Sinusoid embeddings for relative offsets -max_dist..+max_dist
    (row r ↔ offset r - max_dist)."""
    pos = np.arange(-max_dist, max_dist + 1, dtype=np.float32)
    inv = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * (-np.log(10000.0) / d_model))
    table = np.zeros((2 * max_dist + 1, d_model), np.float32)
    table[:, 0::2] = np.sin(pos[:, None] * inv)
    table[:, 1::2] = np.cos(pos[:, None] * inv)
    return table


def _cached_attention(p, pos_u, pos_v, x, cache_k, cache_len, cfg: StreamingConformerConfig):
    """x [B,T,D] attends over cache_k [B,C,D] ‖ x. Returns [B,T,D].

    Transformer-XL scoring: (q+u)·k + (q+v)·pos_emb[rel]; the relative-
    offset table is gathered explicitly — T is tiny (chunk frames), so
    the [T, C+T] gather is cheap and there is no rel-shift trick needed."""
    b, t, d = x.shape
    c = cfg.att_context
    h, hd = cfg.num_heads, cfg.head_dim
    kv_in = jnp.concatenate([cache_k, x], axis=1)            # [B, C+T, D]

    q = linear(x, p["q"]).reshape(b, t, h, hd)
    k = linear(kv_in, p["k"]).reshape(b, c + t, h, hd).transpose(0, 2, 1, 3)
    v = linear(kv_in, p["v"]).reshape(b, c + t, h, hd).transpose(0, 2, 1, 3)

    # relative offsets: query i sits at absolute C+i; key j at absolute j
    max_dist = c + t - 1
    table = jnp.asarray(_rel_table(max_dist, d), x.dtype)    # [2*max+1, D]
    pos = linear(table, p["pos"]).reshape(2 * max_dist + 1, h, hd)
    qi = jnp.arange(t)[:, None] + c
    kj = jnp.arange(c + t)[None, :]
    rel_idx = (qi - kj) + max_dist                            # [T, C+T] in [0, 2*max]
    pos_qk = jnp.take(pos, rel_idx.reshape(-1), axis=0).reshape(t, c + t, h, hd)

    q_u = (q + pos_u[None, None]).transpose(0, 2, 1, 3).astype(jnp.float32)
    q_v = (q + pos_v[None, None]).astype(jnp.float32)
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k.astype(jnp.float32))
    bd = jnp.einsum("bqhd,qkhd->bhqk", q_v, pos_qk.astype(jnp.float32))
    scores = (ac + bd) / np.sqrt(hd)

    # mask out unfilled cache slots (cache is right-aligned)
    slot = jnp.arange(c + t)[None, :]
    valid = (slot >= (c - cache_len[:, None])) | (slot >= c)
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32))
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d).astype(x.dtype)
    return linear(out, p["o"])


def _cached_conv(p, x, cache_t, cfg: StreamingConformerConfig):
    """Conv module with carried left context. x [B,T,D], cache_t
    [B,K-1,D] (the previous GLU outputs). Returns ([B,T,D], new cache)."""
    g = linear(x, p["pw1"])
    a, b_ = jnp.split(g, 2, axis=-1)
    g = a * jax.nn.sigmoid(b_)                                # GLU [B,T,D]
    full = jnp.concatenate([cache_t, g], axis=1)              # [B, K-1+T, D]
    new_cache = full[:, -cfg.conv_cache:]
    y = jax.lax.conv_general_dilated(
        full, p["dw"]["kernel"], window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=cfg.encoder_hidden,
        preferred_element_type=jnp.float32,
    ) + p["dw"]["bias"].astype(jnp.float32)
    # inference-folded batch norm: y*scale + shift (NeMo trains with BN;
    # running stats fold to an affine at conversion)
    y = (y * p["norm"]["weight"].astype(jnp.float32)
         + p["norm"]["bias"].astype(jnp.float32)).astype(x.dtype)
    return linear(swish(y), p["pw2"]), new_cache


def _ff(x, ln, fin, fout):
    h = layer_norm(x, ln["weight"], ln["bias"])
    return linear(swish(linear(h, fin)), fout)


# ---------------------------------------------------------------------------
# chunk step
# ---------------------------------------------------------------------------

def encode_chunk(params, cfg: StreamingConformerConfig, mel_chunk,
                 caches: EncoderCaches) -> Tuple[jax.Array, EncoderCaches]:
    """mel_chunk [B, mel_frames, mel] + caches → ([B, out_frames, D],
    advanced caches). One jit-able program with static shapes."""
    x, new_pre = _subsample(params, cfg, caches.pre_mel, mel_chunk)
    t = x.shape[1]

    new_channel, new_time = [], []
    for li, p in enumerate(params["layers"]):
        x = x + 0.5 * _ff(x, p["ff1_ln"], p["ff1_in"], p["ff1_out"])

        att_in = layer_norm(x, p["att_ln"]["weight"], p["att_ln"]["bias"])
        # cache the *layer input* tokens as future left context
        cat = jnp.concatenate([caches.channel[li], att_in], axis=1)
        new_channel.append(cat[:, -cfg.att_context:])
        pos_u = p["att"].get("pos_u", params["pos_u"])
        pos_v = p["att"].get("pos_v", params["pos_v"])
        x = x + _cached_attention(p["att"], pos_u, pos_v,
                                  att_in, caches.channel[li], caches.channel_len, cfg)

        conv_in = layer_norm(x, p["conv_ln"]["weight"], p["conv_ln"]["bias"])
        y, tc = _cached_conv(p["conv"], conv_in, caches.time[li], cfg)
        new_time.append(tc)
        x = x + y

        x = x + 0.5 * _ff(x, p["ff2_ln"], p["ff2_in"], p["ff2_out"])
        x = layer_norm(x, p["final_ln"]["weight"], p["final_ln"]["bias"])

    new_caches = EncoderCaches(
        pre_mel=new_pre,
        channel=jnp.stack(new_channel),
        time=jnp.stack(new_time),
        channel_len=jnp.minimum(caches.channel_len + t, cfg.att_context),
        sample_tail=caches.sample_tail,  # advanced by streaming_log_mel
    )
    return x, new_caches


# ---------------------------------------------------------------------------
# streaming mel (causal, unnormalized — NeMo streaming models are trained
# with normalize: NA; reference: StreamingSession.swift:253-258)
# ---------------------------------------------------------------------------

def streaming_log_mel(chunk, sample_tail, cfg: StreamingConformerConfig):
    """chunk [B, mel_frames*hop] raw samples + carried tail [B, n_fft-hop]
    → (log-mel [B, mel_frames, n_mels], new tail). Fully causal: frame t
    covers samples [t*hop, t*hop + n_fft) of tail ‖ chunk."""
    from ..parakeet.mel import nemo_windowed_dft
    from ...ops.mel import mel_filterbank

    x = jnp.concatenate([sample_tail, chunk], axis=1)          # [B, L]
    new_tail = x[:, -(cfg.n_fft - cfg.hop_length):]
    # pre-emphasis over the extended signal (first-ever sample uses x[0])
    y = jnp.concatenate([x[:, :1], x[:, 1:] - cfg.pre_emphasis * x[:, :-1]], axis=1)
    idx = (np.arange(cfg.mel_frames)[:, None] * cfg.hop_length
           + np.arange(cfg.n_fft)[None, :])                     # [F, n_fft]
    frames = y[:, idx]                                          # [B, F, n_fft]
    cos_m, sin_m = nemo_windowed_dft(cfg.n_fft, cfg.win_length)
    re = frames @ jnp.asarray(cos_m)
    im = frames @ jnp.asarray(sin_m)
    power = re * re + im * im
    fb = jnp.asarray(mel_filterbank(cfg.num_mel_bins, cfg.n_fft // 2 + 1,
                                    cfg.sample_rate, cfg.n_fft))
    return jnp.log(power @ fb + cfg.log_zero_guard), new_tail

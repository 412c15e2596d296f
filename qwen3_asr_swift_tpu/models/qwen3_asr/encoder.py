"""Qwen3-ASR audio encoder (audio_tower), TPU-first.

Functional re-design of the reference encoder
(reference: Sources/Qwen3ASR/AudioEncoder.swift:203-512):
mel → conv2d×3 (stride 2 ⇒ 8× time downsample, 128→16 mel positions) →
channels-major flatten (7680) → conv_out → +sinusoidal positions →
18 × [pre-LN MHA → pre-LN GELU-FFN] with 104-token windowed attention →
ln_post → proj1 → GELU → proj2.

TPU-shaped differences from the reference:
- The reference builds an O(T²) block-diagonal additive mask over the
  concatenated token sequence (AudioEncoder.swift:337-357). Chunks never
  attend across 104-token window boundaries, so here windows ARE the batch
  dimension: tokens reshape to [n_windows, 104, d] and attention is dense
  per window — linear memory in audio length, MXU-aligned shapes, no mask
  materialization. A per-window key-validity mask handles the ragged tail.
- Mel time is padded to a whole number of windows (800 mel frames); all
  chunks take the conv path as one batch (the reference stacks them the
  same way — AudioEncoder.swift:380-424).

Parity: for any input, valid output tokens equal the reference's because
only the final chunk can be partial, so valid tokens are a contiguous
prefix and window boundaries in grid space coincide with the reference's
boundaries in concatenated-valid-token space.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import NEG_INF, sdpa
from ...ops.nn import conv2d, gelu, init_conv2d, init_linear, layer_norm, linear
from .config import AudioEncoderConfig


def conv_output_length(cfg: AudioEncoderConfig, n_frames: int) -> int:
    """Valid encoder tokens for n_frames mel frames
    (reference: AudioEncoder.getOutputLength, AudioEncoder.swift:287-303)."""
    chunk = cfg.chunk_frames
    full = (n_frames // chunk) * cfg.tokens_per_chunk
    rem = n_frames % chunk
    if rem == 0:
        return full
    f = rem
    for _ in range(3):
        f = (f - 1) // 2 + 1
    return full + max(f, 1)


@functools.lru_cache(maxsize=4)
def sinusoidal_positions(seq_len: int, d_model: int) -> np.ndarray:
    """[seq_len, d_model] — sin/cos concatenated (NOT interleaved)
    (reference: AudioEncoder.swift:171-199)."""
    half = d_model // 2
    log_inc = np.log(10000.0) / (half - 1)
    inv = np.exp(-log_inc * np.arange(half, dtype=np.float64))
    scaled = np.arange(seq_len, dtype=np.float64)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def init_encoder_params(key, cfg: AudioEncoderConfig, dtype=jnp.float32) -> dict:
    """Random-init params (unit tests / from-scratch training)."""
    keys = jax.random.split(key, 8 + cfg.num_layers)
    ch = cfg.downsample_hidden
    params = {
        "conv1": init_conv2d(keys[0], 3, 3, 1, ch, dtype=dtype),
        "conv2": init_conv2d(keys[1], 3, 3, ch, ch, dtype=dtype),
        "conv3": init_conv2d(keys[2], 3, 3, ch, ch, dtype=dtype),
        "conv_out": init_linear(keys[3], cfg.conv_out_input_dim, cfg.d_model, bias=False, dtype=dtype),
        "ln_post": {"weight": jnp.ones((cfg.d_model,), dtype), "bias": jnp.zeros((cfg.d_model,), dtype)},
        "proj1": init_linear(keys[4], cfg.d_model, cfg.d_model, dtype=dtype),
        "proj2": init_linear(keys[5], cfg.d_model, cfg.output_dim, dtype=dtype),
        "layers": [],
    }
    d = cfg.d_model
    for i in range(cfg.num_layers):
        k = jax.random.split(keys[8 + i], 6)
        params["layers"].append(
            {
                "q_proj": init_linear(k[0], d, d, dtype=dtype),
                "k_proj": init_linear(k[1], d, d, dtype=dtype),
                "v_proj": init_linear(k[2], d, d, dtype=dtype),
                "out_proj": init_linear(k[3], d, d, dtype=dtype),
                "attn_ln": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
                "fc1": init_linear(k[4], d, cfg.ffn_dim, dtype=dtype),
                "fc2": init_linear(k[5], cfg.ffn_dim, d, dtype=dtype),
                "final_ln": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            }
        )
    return params


def _encoder_layer(p, x, mask, cfg: AudioEncoderConfig):
    """x: [n_win, 104, d]; mask: [n_win, 1, 1, 104] additive."""
    nw, t, d = x.shape
    h = layer_norm(x, p["attn_ln"]["weight"], p["attn_ln"]["bias"], cfg.layer_norm_eps)
    q = linear(h, p["q_proj"]).reshape(nw, t, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    k = linear(h, p["k_proj"]).reshape(nw, t, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    v = linear(h, p["v_proj"]).reshape(nw, t, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    attn = sdpa(q, k, v, scale=1.0 / np.sqrt(cfg.head_dim), mask=mask)
    attn = attn.transpose(0, 2, 1, 3).reshape(nw, t, d)
    x = x + linear(attn, p["out_proj"])

    h = layer_norm(x, p["final_ln"]["weight"], p["final_ln"]["bias"], cfg.layer_norm_eps)
    h = linear(gelu(linear(h, p["fc1"])), p["fc2"])
    return x + h


def _valid_tokens(n_valid_frames, cfg: AudioEncoderConfig):
    """mel-frame count → conv-token count, computed on device."""
    chunk = cfg.chunk_frames
    full_chunks = n_valid_frames // chunk
    rem = n_valid_frames % chunk
    rem_tokens = jnp.where(rem == 0, 0, (((rem - 1) // 2) // 2) // 2 + 1)
    return full_chunks * cfg.tokens_per_chunk + jnp.maximum(
        rem_tokens, jnp.where(rem > 0, 1, 0))


def _encode_core(params, mel, n_valid_tokens, cfg: AudioEncoderConfig,
                 token_offset=0):
    """conv stack → windows-as-batch attention → output projection over a
    contiguous span of mel frames.  ``token_offset`` is this span's first
    GLOBAL token index (nonzero under sequence parallelism, where each
    device owns whole 104-token windows)."""
    n_mels, t_frames = mel.shape
    chunk = cfg.chunk_frames
    n_chunks = t_frames // chunk
    tpc = cfg.tokens_per_chunk

    # [n_chunks, mel, 100, 1] — chunks as conv batch
    x = mel.reshape(n_mels, n_chunks, chunk).transpose(1, 0, 2)[..., None]
    x = gelu(conv2d(x, params["conv1"], stride=(2, 2)))
    x = gelu(conv2d(x, params["conv2"], stride=(2, 2)))
    x = gelu(conv2d(x, params["conv3"], stride=(2, 2)))
    # [n_chunks, 16, 13, 480] → channels-major flatten [n_chunks, 13, 480*16]
    nc, freq, tt, chans = x.shape
    x = x.transpose(0, 2, 3, 1).reshape(nc, tt, chans * freq)
    x = linear(x, params["conv_out"])  # [n_chunks, 13, d_model]

    pos = jnp.asarray(sinusoidal_positions(tpc, cfg.d_model), x.dtype)
    x = x + pos[None]

    # token grid → windows-as-batch
    n_tokens = nc * tpc
    n_win = n_tokens // cfg.window_tokens
    x = x.reshape(n_win, cfg.window_tokens, cfg.d_model)

    token_ids = token_offset + jnp.arange(n_tokens).reshape(n_win, cfg.window_tokens)
    key_valid = token_ids < n_valid_tokens
    mask = jnp.where(key_valid, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]

    for layer_params in params["layers"]:
        x = _encoder_layer(layer_params, x, mask, cfg)

    x = x.reshape(n_tokens, cfg.d_model)
    x = layer_norm(x, params["ln_post"]["weight"], params["ln_post"]["bias"], cfg.layer_norm_eps)
    x = linear(x, params["proj1"])
    x = gelu(x)
    x = linear(x, params["proj2"])  # [n_tokens, output_dim]
    return x


def encode(params, mel, n_valid_frames, cfg: AudioEncoderConfig,
           sp_mesh=None, sp_axis: str = "dp"):
    """Run the audio encoder.

    Args:
        params: encoder param tree.
        mel: [n_mels, T] with T a static multiple of cfg.n_window_infer (800).
        n_valid_frames: traced scalar int32 — valid mel frames (≤ T).
        sp_mesh: optional ``jax.sharding.Mesh`` — sequence parallelism for
            long audio.  The 104-token attention windows never attend
            across boundaries (reference AudioEncoder.swift:337-357), so
            whole windows are embarrassingly parallel: the computation is
            ``shard_map``ped over ``sp_axis`` with each device running the
            conv + attention stack on its own contiguous window span and
            zero collectives (SURVEY.md §2h).  Window counts that don't
            divide the axis are zero-padded up to the next multiple (the
            pad windows ride along on otherwise-idle devices; their tokens
            are sliced off and ``n_valid_tokens`` never reaches them).  (A
            plain sharding *constraint* on the conv batch is NOT used: the
            13-tokens-per-chunk → 104-token-window regroup only lines up
            with a chunk sharding when each shard holds a multiple of 8
            chunks, and off-alignment made the SPMD partitioner emit an
            involuntary full rematerialization.)
    Returns:
        (tokens [n_tokens, output_dim], n_valid_tokens scalar int32) where
        n_tokens = (T / 100) * 13; valid tokens are the prefix.
    """
    n_mels, t_frames = mel.shape
    assert t_frames % cfg.n_window_infer == 0, "pad mel to whole attention windows"
    n_valid_tokens = _valid_tokens(n_valid_frames, cfg)

    n_win = t_frames // cfg.n_window_infer
    if sp_mesh is not None:
        from jax.sharding import PartitionSpec as P

        sp_size = sp_mesh.shape[sp_axis]
        n_tokens = (t_frames // cfg.chunk_frames) * cfg.tokens_per_chunk
        pad_win = -n_win % sp_size
        if pad_win:
            mel = jnp.pad(mel, ((0, 0), (0, pad_win * cfg.n_window_infer)))
            t_frames += pad_win * cfg.n_window_infer

        frames_local = t_frames // sp_size
        tokens_local = (frames_local // cfg.chunk_frames) * cfg.tokens_per_chunk

        def body(p, mel_local, n_valid_tok):
            off = jax.lax.axis_index(sp_axis) * tokens_local
            return _encode_core(p, mel_local, n_valid_tok, cfg, off)

        kwargs = dict(mesh=sp_mesh, in_specs=(P(), P(None, sp_axis), P()),
                      out_specs=P(sp_axis, None))
        try:
            from jax import shard_map           # jax ≥ 0.6
            mapped = shard_map(body, **kwargs)
        except ImportError:
            from jax.experimental.shard_map import shard_map
            mapped = shard_map(body, check_rep=False, **kwargs)
        out = mapped(params, mel, n_valid_tokens)
        return out[:n_tokens], n_valid_tokens

    return _encode_core(params, mel, n_valid_tokens, cfg), n_valid_tokens

"""Qwen3-TTS Talker: autoregressive codec-token transformer with M-RoPE.

Functional re-design of the reference talker
(reference: Sources/Qwen3TTS/Talker.swift:14-280): 28-layer GQA decoder
(q/k RMSNorm, SwiGLU) over a 1024-d stream fed by element-wise sums of
text-side embeddings (151936-vocab text table → 2-layer projection MLP)
and codec-side embeddings (3072 vocab); multimodal RoPE splits each
head's frequencies into [24, 20, 20] sections driven by (t, h, w)
position streams (all equal for TTS); output head over the codec vocab.

Prefill and single-step decode both jit; the cache is the shared
static-shape KVCache (ops/kv_cache.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import NEG_INF, sdpa
from ...ops.kv_cache import KVCache, after_prefill, after_token, init_cache, write_prompt, write_token
from ...ops.nn import init_linear, linear, rms_norm, silu, swiglu_mlp
from ...ops.rope import apply_rope
from .config import TalkerConfig


def mrope_angles(positions, head_dim: int, sections: Tuple[int, ...], base: float):
    """Multimodal RoPE angles.

    positions: [3, B, T] int32 (t/h/w streams; equal for TTS).
    Frequencies are laid out per half-dim (head_dim/2 of them) and split
    into ``sections`` groups; group g takes its rotation position from
    positions[g]. Returns (cos, sin): [B, T, head_dim/2].
    """
    half = head_dim // 2
    assert sum(sections) == half, f"mrope sections {sections} != half dim {half}"
    inv_freq = 1.0 / (base ** (np.arange(0, half, dtype=np.float64) / half))
    section_of = np.repeat(np.arange(len(sections)), sections)  # [half]
    pos = positions.astype(jnp.float32)  # [3, B, T]
    pos_per_freq = pos[section_of]  # [half, B, T]
    angles = jnp.moveaxis(pos_per_freq, 0, -1) * jnp.asarray(inv_freq, jnp.float32)  # [B, T, half]
    return jnp.cos(angles), jnp.sin(angles)


def init_talker_params(key, cfg: TalkerConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 6 + cfg.num_layers)
    h, hd = cfg.hidden_size, cfg.head_dim
    params = {
        "text_embedding": (jax.random.normal(ks[0], (cfg.text_vocab_size, cfg.text_hidden_size)) * 0.02).astype(dtype),
        "codec_embedding": (jax.random.normal(ks[1], (cfg.codec_vocab_size, h)) * 0.02).astype(dtype),
        "text_projection": {
            "fc1": init_linear(ks[2], cfg.text_hidden_size, h, dtype=dtype),
            "fc2": init_linear(ks[3], h, h, dtype=dtype),
        },
        "codec_head": init_linear(ks[4], h, cfg.codec_vocab_size, bias=False, dtype=dtype),
        "norm": {"weight": jnp.ones((h,), dtype)},
        "layers": [],
    }
    for i in range(cfg.num_layers):
        k = jax.random.split(ks[6 + i], 7)
        params["layers"].append({
            "q_proj": init_linear(k[0], h, cfg.num_heads * hd, bias=False, dtype=dtype),
            "k_proj": init_linear(k[1], h, cfg.num_kv_heads * hd, bias=False, dtype=dtype),
            "v_proj": init_linear(k[2], h, cfg.num_kv_heads * hd, bias=False, dtype=dtype),
            "o_proj": init_linear(k[3], cfg.num_heads * hd, h, bias=False, dtype=dtype),
            "q_norm": {"weight": jnp.ones((hd,), dtype)},
            "k_norm": {"weight": jnp.ones((hd,), dtype)},
            "input_layernorm": {"weight": jnp.ones((h,), dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((h,), dtype)},
            "mlp": {
                "gate_proj": init_linear(k[4], h, cfg.intermediate_size, bias=False, dtype=dtype),
                "up_proj": init_linear(k[5], h, cfg.intermediate_size, bias=False, dtype=dtype),
                "down_proj": init_linear(k[6], cfg.intermediate_size, h, bias=False, dtype=dtype),
            },
        })
    return params


def embed_text(params, token_ids, cfg: TalkerConfig):
    """text token ids → projected hidden (text_embedding → SiLU-MLP
    projection, reference: TextProjectionMLP, Talker.swift:149-167)."""
    x = jnp.take(params["text_embedding"], token_ids, axis=0)
    p = params["text_projection"]
    return linear(silu(linear(x, p["fc1"])), p["fc2"])


def embed_codec(params, token_ids):
    return jnp.take(params["codec_embedding"], token_ids, axis=0)


def _layer(p, x, positions3, mask, cache_layer, cfg: TalkerConfig, decode: bool, cursor=None):
    b, t, _ = x.shape
    hd = cfg.head_dim
    h = rms_norm(x, p["input_layernorm"]["weight"], cfg.rms_norm_eps)
    if "qkv_proj" in p:  # fused projection (quantized frame loop)
        qd, kvd = cfg.num_heads * hd, cfg.num_kv_heads * hd
        qkv = linear(h, p["qkv_proj"])
        q = qkv[..., :qd].reshape(b, t, cfg.num_heads, hd)
        k = qkv[..., qd: qd + kvd].reshape(b, t, cfg.num_kv_heads, hd)
        v = qkv[..., qd + kvd:].reshape(b, t, cfg.num_kv_heads, hd)
    else:
        q = linear(h, p["q_proj"]).reshape(b, t, cfg.num_heads, hd)
        k = linear(h, p["k_proj"]).reshape(b, t, cfg.num_kv_heads, hd)
        v = linear(h, p["v_proj"]).reshape(b, t, cfg.num_kv_heads, hd)
    q = rms_norm(q, p["q_norm"]["weight"], cfg.rms_norm_eps)
    k = rms_norm(k, p["k_norm"]["weight"], cfg.rms_norm_eps)
    cos, sin = mrope_angles(positions3, hd, cfg.mrope_sections, cfg.rope_theta)
    cos, sin = cos[:, None], sin[:, None]
    q = apply_rope(q.transpose(0, 2, 1, 3), cos, sin)
    k = apply_rope(k.transpose(0, 2, 1, 3), cos, sin)
    v = v.transpose(0, 2, 1, 3)

    if decode:
        updated = write_token(cache_layer, k, v, cursor)
        attn = sdpa(q, updated.k, updated.v, 1.0 / np.sqrt(hd), mask)
    else:
        updated = write_prompt(cache_layer, k, v)
        attn = sdpa(q, k, v, 1.0 / np.sqrt(hd), mask)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, -1)
    x = x + linear(attn, p["o_proj"])
    h2 = rms_norm(x, p["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
    x = x + swiglu_mlp(h2, p["mlp"])
    return x, updated


def talker_prefill(params, cfg: TalkerConfig, embeds, valid, cache: KVCache):
    """embeds [B, T, H]; valid [B, T] bool. Returns (logits [B,T,V] fp32,
    hidden [B,T,H], cache)."""
    b, t, _ = embeds.shape
    positions = (jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1) * valid
    pos3 = jnp.broadcast_to(positions[None], (3, b, t))
    rows = jnp.arange(t)[None, :, None]
    cols = jnp.arange(t)[None, None, :]
    mask = jnp.where((cols <= rows) & valid[:, None, :], 0.0, NEG_INF).astype(jnp.float32)[:, None]

    x = embeds
    new_layers = []
    for p in params["layers"]:
        x, updated = _layer(p, x, pos3, mask, cache.layers[len(new_layers)], cfg, decode=False)
        new_layers.append(updated)
    x = rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps)
    logits = linear(x, params["codec_head"]).astype(jnp.float32)
    return logits, x, after_prefill(cache, new_layers, valid, t)


def talker_step(params, cfg: TalkerConfig, embeds, cache: KVCache):
    """embeds [B, 1, H]. Returns (logits [B,V] fp32, hidden [B,H], cache)."""
    b = embeds.shape[0]
    pos3 = jnp.broadcast_to(cache.positions[None, :, None], (3, b, 1))
    written = jnp.arange(cache.max_len)[None, :] == cache.cursor
    key_ok = cache.valid | written
    mask = jnp.where(key_ok, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]

    x = embeds
    new_layers = []
    for p in params["layers"]:
        x, updated = _layer(p, x, pos3, mask, cache.layers[len(new_layers)], cfg,
                            decode=True, cursor=cache.cursor)
        new_layers.append(updated)
    x = rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps)
    logits = linear(x[:, 0], params["codec_head"]).astype(jnp.float32)
    return logits, x[:, 0], after_token(cache, new_layers)


def make_talker_cache(cfg: TalkerConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    return init_cache(cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim, dtype)

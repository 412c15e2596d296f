"""PL-BERT (ALBERT) phoneme encoder for Kokoro-82M.

ALBERT with one shared layer group applied ``num_layers`` times:
factorized embedding (vocab 178 → 128 → hidden 768), 12 heads,
intermediate 2048, post-LN. The reference consumes this inside its
precompiled CoreML blob (Sources/KokoroTTS/KokoroModel.swift:5-8 — "BERT →
duration → alignment → prosody → decoder in one CoreML call"); here it is
an explicit JAX graph so checkpoints load from the published
kokoro-v1_0.pth key layout (see convert.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import sdpa
from ...ops.nn import init_linear, layer_norm, linear


@dataclasses.dataclass(frozen=True)
class AlbertConfig:
    vocab_size: int = 178
    embedding_size: int = 128
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 2048
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12


def albert_config_tiny() -> AlbertConfig:
    # vocab stays 178: tiny configs must still cover the full phonemizer range
    return AlbertConfig(vocab_size=178, embedding_size=8, hidden_size=16,
                        num_layers=2, num_heads=2, intermediate_size=32,
                        max_position_embeddings=512)


def init_albert_params(key, cfg: AlbertConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 12)
    e, h = cfg.embedding_size, cfg.hidden_size
    return {
        "word_embeddings": (jax.random.normal(ks[0], (cfg.vocab_size, e)) * 0.02).astype(dtype),
        "position_embeddings": (jax.random.normal(ks[1], (cfg.max_position_embeddings, e))
                                * 0.02).astype(dtype),
        "token_type_embeddings": (jax.random.normal(ks[2], (2, e)) * 0.02).astype(dtype),
        "embed_ln": {"weight": jnp.ones((e,), dtype), "bias": jnp.zeros((e,), dtype)},
        "embed_proj": init_linear(ks[3], e, h, dtype=dtype),
        # one shared layer (ALBERT weight sharing)
        "q": init_linear(ks[4], h, h, dtype=dtype),
        "k": init_linear(ks[5], h, h, dtype=dtype),
        "v": init_linear(ks[6], h, h, dtype=dtype),
        "attn_out": init_linear(ks[7], h, h, dtype=dtype),
        "attn_ln": {"weight": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
        "ffn": init_linear(ks[8], h, cfg.intermediate_size, dtype=dtype),
        "ffn_out": init_linear(ks[9], cfg.intermediate_size, h, dtype=dtype),
        "full_ln": {"weight": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
    }


def albert_forward(p, cfg: AlbertConfig, input_ids, attention_mask):
    """input_ids [B, T] int32, attention_mask [B, T] bool (True = valid)
    → last hidden state [B, T, hidden]."""
    b, t = input_ids.shape
    emb = (jnp.take(p["word_embeddings"], input_ids, axis=0)
           + p["position_embeddings"][None, :t]
           + p["token_type_embeddings"][0][None, None])
    emb = layer_norm(emb, p["embed_ln"]["weight"], p["embed_ln"]["bias"],
                     eps=cfg.layer_norm_eps)
    x = linear(emb, p["embed_proj"])

    hd = cfg.hidden_size // cfg.num_heads
    mask = jnp.where(attention_mask[:, None, None, :], 0.0, -1e9).astype(jnp.float32)
    for _ in range(cfg.num_layers):  # shared weights, repeated application
        q = linear(x, p["q"]).reshape(b, t, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        k = linear(x, p["k"]).reshape(b, t, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        v = linear(x, p["v"]).reshape(b, t, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        a = sdpa(q, k, v, 1.0 / np.sqrt(hd), mask)
        attn = linear(a.transpose(0, 2, 1, 3).reshape(b, t, -1), p["attn_out"])
        x = layer_norm(x + attn, p["attn_ln"]["weight"], p["attn_ln"]["bias"],
                       eps=cfg.layer_norm_eps)
        ff = linear(jax.nn.gelu(linear(x, p["ffn"]), approximate=False), p["ffn_out"])
        x = layer_norm(x + ff, p["full_ln"]["weight"], p["full_ln"]["bias"],
                       eps=cfg.layer_norm_eps)
    return x

"""Qwen3-TTS code predictor: per-frame residual-codebook completion.

Functional re-design of the reference code predictor
(reference: Sources/Qwen3TTS/CodePredictor.swift + Qwen3TTS.swift:1541-1585):
given the talker's hidden state and the frame's codebook-0 token, a
5-layer GQA transformer autoregressively predicts codebooks 1..15 — a
prefill of [hidden, code0_embed] followed by 14 cached steps, each with a
group-specific embedding table and LM head.

TPU shape: the 15-group chain is a ``lax.scan`` over stacked group
embeddings [15, V, D] and heads [15, D, V] with a fixed 17-slot KV cache
held in the scan carry — the whole frame completion is pure device
compute inside the outer generation loop (the reference needed one lazy
graph + one GPU sync per frame; here there is no sync at all).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import NEG_INF
from ...ops.nn import init_linear, linear, rms_norm, swiglu_mlp
from ...ops.rope import apply_rope, rope_angles
from .config import CodePredictorConfig

MAX_CP_LEN = 17  # prefill 2 + 15 groups


def init_cp_params(key, cfg: CodePredictorConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 5 + cfg.num_layers)
    h, hd = cfg.hidden_size, cfg.head_dim
    ng = cfg.num_code_groups - 1  # 15 predicted groups
    params = {
        # group-specific codec embeddings (reference: model.codec_embedding.{i})
        "group_embeds": (jax.random.normal(ks[0], (ng, cfg.vocab_size, cfg.embedding_dim)) * 0.02).astype(dtype),
        # group-specific LM heads (reference: lm_head.{i})
        "lm_heads": (jax.random.normal(ks[1], (ng, h, cfg.vocab_size)) * 0.02).astype(dtype),
        "norm": {"weight": jnp.ones((h,), dtype)},
        "layers": [],
    }
    if cfg.needs_projection:
        params["projection"] = init_linear(ks[2], cfg.embedding_dim, h, dtype=dtype)
    for i in range(cfg.num_layers):
        k = jax.random.split(ks[5 + i], 7)
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


def _maybe_project(params, cfg: CodePredictorConfig, emb):
    if cfg.needs_projection:
        return linear(emb, params["projection"])
    return emb


def _cp_forward(params, cfg: CodePredictorConfig, x, positions, k_caches, v_caches, start, kv_len):
    """Shared layer stack. x: [B, T, embedding_dim]; positions: [B, T];
    k_caches/v_caches: [L, B, Hkv, MAX_CP_LEN, D]; writes at ``start``.
    EVERY input projects embedding_dim → hidden first when the config
    needs it (the reference applies smallToMtpProjection at the top of
    each CP forward, CodePredictor.swift:191,233 — the 1.7B talker is
    2048-wide, the CP stack 1024). Returns (normed [B, T, H], caches)."""
    x = _maybe_project(params, cfg, x)
    b, t, _ = x.shape
    hd = cfg.head_dim
    cols = jnp.arange(MAX_CP_LEN)[None, None, None, :]
    rows = positions[:, None, :, None]  # absolute positions as causal bound
    mask = jnp.where((cols <= rows) & (cols < kv_len), 0.0, NEG_INF).astype(jnp.float32)

    for li, p in enumerate(params["layers"]):
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
        cos, sin = rope_angles(positions, hd, cfg.rope_theta)
        cos, sin = cos[:, None], sin[:, None]
        q = apply_rope(q.transpose(0, 2, 1, 3), cos, sin)
        k = apply_rope(k.transpose(0, 2, 1, 3), cos, sin)
        v = v.transpose(0, 2, 1, 3)

        # write at time offset `start`
        k_caches = k_caches.at[li].set(
            jax.lax.dynamic_update_slice_in_dim(k_caches[li], k.astype(k_caches.dtype), start, axis=2)
        )
        v_caches = v_caches.at[li].set(
            jax.lax.dynamic_update_slice_in_dim(v_caches[li], v.astype(v_caches.dtype), start, axis=2)
        )

        from ...ops.attention import sdpa

        attn = sdpa(q, k_caches[li], v_caches[li], 1.0 / np.sqrt(hd), mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, -1)
        x = x + linear(attn, p["o_proj"])
        h2 = rms_norm(x, p["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
        x = x + swiglu_mlp(h2, p["mlp"])

    return rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps), k_caches, v_caches




def predict_codebooks(params, cfg: CodePredictorConfig, hidden, code0_embed, key,
                      temperature: float = 0.0, top_k: int = 0):
    """Complete one frame: codebooks 1..15.

    hidden: [B, H] talker hidden at this frame; code0_embed: [B, H].
    Returns codes [B, 15] int32.
    """
    b = hidden.shape[0]
    nl = cfg.num_layers
    dtype = hidden.dtype
    k_caches = jnp.zeros((nl, b, cfg.num_kv_heads, MAX_CP_LEN, cfg.head_dim), dtype)
    v_caches = jnp.zeros_like(k_caches)

    # prefill [hidden, code0] at positions 0,1
    x0 = jnp.stack([hidden, code0_embed], axis=1)  # [B, 2, H]
    pos0 = jnp.broadcast_to(jnp.arange(2)[None], (b, 2))
    normed, k_caches, v_caches = _cp_forward(
        params, cfg, x0, pos0, k_caches, v_caches, jnp.asarray(0, jnp.int32), jnp.asarray(2, jnp.int32)
    )

    def sample(logits, k):
        lg = logits
        if top_k > 0:
            kth = jax.lax.top_k(lg, top_k)[0][..., -1:]
            lg = jnp.where(lg < kth, NEG_INF, lg)
        if temperature > 0.0:
            lg = lg / temperature + jax.random.gumbel(k, lg.shape, dtype=jnp.float32)
        return jnp.argmax(lg, axis=-1).astype(jnp.int32)

    head0 = params["lm_heads"][0]
    logits0 = (normed[:, 1] @ head0).astype(jnp.float32)
    key, k0 = jax.random.split(key)
    code = sample(logits0, k0)  # group 0 (codebook 1)

    def body(carry, group_idx):
        code_prev, k_caches, v_caches, key = carry
        emb_table = params["group_embeds"][group_idx - 1]  # previous group's table
        emb = jnp.take(emb_table, code_prev, axis=0)[:, None, :]  # projected in _cp_forward
        pos = jnp.broadcast_to((group_idx + 1)[None, None], (b, 1))
        normed, k_caches, v_caches = _cp_forward(
            params, cfg, emb.astype(dtype), pos, k_caches, v_caches,
            group_idx + 1, group_idx + 2,
        )
        head = params["lm_heads"][group_idx]
        logits = (normed[:, 0] @ head).astype(jnp.float32)
        key, kk = jax.random.split(key)
        code_next = sample(logits, kk)
        return (code_next, k_caches, v_caches, key), code_prev

    ng = cfg.num_code_groups - 1
    (last_code, _, _, _), codes_prev = jax.lax.scan(
        body, (code, k_caches, v_caches, key), jnp.arange(1, ng, dtype=jnp.int32)
    )
    # codes_prev holds groups 0..ng-2; append the final one
    codes = jnp.concatenate([codes_prev.T, last_code[:, None]], axis=1)  # [B, 15]
    return codes


def embed_all_groups(params, cfg: CodePredictorConfig, codes):
    """Sum of all 15 group embeddings for the next TALKER input
    (reference: batchEmbedAllGroups — talker-side sums stay at
    embedding_dim; the small_to_mtp projection exists only on the CP
    stack's input side). codes: [B, 15] → [B, embedding_dim]."""
    def one(group_idx, code):
        table = params["group_embeds"][group_idx]
        return jnp.take(table, code, axis=0)

    embs = jax.vmap(one, in_axes=(0, 1), out_axes=1)(
        jnp.arange(cfg.num_code_groups - 1), codes
    )  # [B, 15, H]
    return embs.sum(axis=1)

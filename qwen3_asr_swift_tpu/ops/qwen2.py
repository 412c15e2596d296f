"""Shared Qwen2 decoder layer.

Both CosyVoice's speech-token LLM (Qwen2.5-0.5B — reference:
Sources/CosyVoiceTTS/LLM.swift) and VibeVoice's language backbone
(Qwen2-0.5B — reference: Sources/VibeVoiceTTS/Models/VibeVoiceStreamModel.swift)
are plain HF-Qwen2 stacks: RMSNorm → biased q/k/v projections → RoPE →
GQA SDPA → unbiased o_proj residual → RMSNorm → SwiGLU MLP residual.
This module is the single implementation both models call, pinned against
transformers' Qwen2Model in tests/test_qwen2_parity.py (prefill and
incremental cached decode).

Layer params (HF naming, kernels stored [in, out]):
  input_layernorm.weight, post_attention_layernorm.weight,
  q_proj/k_proj/v_proj (kernel+bias), o_proj (kernel),
  mlp.{gate_proj,up_proj,down_proj} (kernel).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .attention import sdpa
from .nn import linear, rms_norm, swiglu_mlp
from .rope import apply_rope, rope_angles


def qwen2_decoder_layer(lp, x, positions, mask, *, num_heads: int,
                        num_kv_heads: int, head_dim: int, rope_theta: float,
                        rms_norm_eps: float, kc=None, vc=None, start=None):
    """One Qwen2 decoder layer.

    x: [B, T, H]; positions: [B, T] semantic (RoPE) positions; mask:
    additive bias broadcastable to [B, 1, T, Tk]. When ``kc``/``vc`` are
    given (shape [B, Hkv, Tk, D]), this step's K/V are written at cache
    slot ``start`` and attention reads the whole cache; otherwise the
    layer self-attends within x. Returns (x, kc, vc).
    """
    b, t, _ = x.shape
    hd = head_dim
    h = rms_norm(x, lp["input_layernorm"]["weight"], rms_norm_eps)
    q = linear(h, lp["q_proj"]).reshape(b, t, num_heads, hd)
    k = linear(h, lp["k_proj"]).reshape(b, t, num_kv_heads, hd)
    v = linear(h, lp["v_proj"]).reshape(b, t, num_kv_heads, hd)
    cos, sin = rope_angles(positions, hd, rope_theta)
    cos, sin = cos[:, None], sin[:, None]
    q = apply_rope(q.transpose(0, 2, 1, 3), cos, sin)
    k = apply_rope(k.transpose(0, 2, 1, 3), cos, sin)
    v = v.transpose(0, 2, 1, 3)
    if kc is not None:
        kc = jax.lax.dynamic_update_slice_in_dim(kc, k.astype(kc.dtype), start, axis=2)
        vc = jax.lax.dynamic_update_slice_in_dim(vc, v.astype(vc.dtype), start, axis=2)
        a = sdpa(q, kc, vc, 1.0 / np.sqrt(hd), mask)
    else:
        a = sdpa(q, k, v, 1.0 / np.sqrt(hd), mask)
    x = x + linear(a.transpose(0, 2, 1, 3).reshape(b, t, -1), lp["o_proj"])
    h2 = rms_norm(x, lp["post_attention_layernorm"]["weight"], rms_norm_eps)
    return x + swiglu_mlp(h2, lp["mlp"]), kc, vc

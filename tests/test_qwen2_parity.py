"""Golden parity of the shared Qwen2 decoder layer (ops/qwen2.py) against
transformers' Qwen2Model — the in-process upstream oracle standard
(same treatment as Mimi/Moshi in test_moshi_parity.py).

CosyVoice's speech LLM (reference: Sources/CosyVoiceTTS/LLM.swift) and
VibeVoice's backbone (reference: Sources/VibeVoiceTTS/Models/
VibeVoiceStreamModel.swift) both run this exact stack, so pinning the one
shared implementation pins both models' transformer math: RoPE convention,
GQA head grouping, biased q/k/v, RMSNorm placement, SwiGLU chunking.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers.models.qwen2.configuration_qwen2 import Qwen2Config
from transformers.models.qwen2.modeling_qwen2 import Qwen2Model

from qwen3_asr_swift_tpu.ops.attention import NEG_INF
from qwen3_asr_swift_tpu.ops.nn import rms_norm
from qwen3_asr_swift_tpu.ops.qwen2 import qwen2_decoder_layer

HIDDEN, LAYERS, HEADS, KV_HEADS, INTER, VOCAB = 32, 3, 2, 1, 64, 128
HEAD_DIM = HIDDEN // HEADS
ROPE_THETA = 10000.0
EPS = 1e-6


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    cfg = Qwen2Config(
        hidden_size=HIDDEN, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, num_key_value_heads=KV_HEADS,
        intermediate_size=INTER, vocab_size=VOCAB,
        rope_theta=ROPE_THETA, rms_norm_eps=EPS,
        attn_implementation="eager",
    )
    model = Qwen2Model(cfg).eval()
    # non-trivial norm weights so a norm-placement bug cannot hide
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith("norm.weight") and p.ndim == 1:
                p.add_(torch.randn_like(p) * 0.1)
    return model


def _to_tree(model):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    layers = []
    for i in range(LAYERS):
        p = f"layers.{i}."
        layers.append({
            "input_layernorm": {"weight": jnp.asarray(sd[p + "input_layernorm.weight"])},
            "post_attention_layernorm": {
                "weight": jnp.asarray(sd[p + "post_attention_layernorm.weight"])},
            "q_proj": {"kernel": jnp.asarray(sd[p + "self_attn.q_proj.weight"].T),
                       "bias": jnp.asarray(sd[p + "self_attn.q_proj.bias"])},
            "k_proj": {"kernel": jnp.asarray(sd[p + "self_attn.k_proj.weight"].T),
                       "bias": jnp.asarray(sd[p + "self_attn.k_proj.bias"])},
            "v_proj": {"kernel": jnp.asarray(sd[p + "self_attn.v_proj.weight"].T),
                       "bias": jnp.asarray(sd[p + "self_attn.v_proj.bias"])},
            "o_proj": {"kernel": jnp.asarray(sd[p + "self_attn.o_proj.weight"].T)},
            "mlp": {
                "gate_proj": {"kernel": jnp.asarray(sd[p + "mlp.gate_proj.weight"].T)},
                "up_proj": {"kernel": jnp.asarray(sd[p + "mlp.up_proj.weight"].T)},
                "down_proj": {"kernel": jnp.asarray(sd[p + "mlp.down_proj.weight"].T)},
            },
        })
    return layers, jnp.asarray(sd["norm.weight"])


def _run_ours_prefill(layers, final_norm, embeds):
    b, t, _ = embeds.shape
    positions = jnp.tile(jnp.arange(t)[None], (b, 1))
    mask = jnp.where(jnp.tril(jnp.ones((t, t), bool))[None, None], 0.0, NEG_INF)
    x = embeds
    for lp in layers:
        x, _, _ = qwen2_decoder_layer(
            lp, x, positions, mask, num_heads=HEADS, num_kv_heads=KV_HEADS,
            head_dim=HEAD_DIM, rope_theta=ROPE_THETA, rms_norm_eps=EPS)
    return rms_norm(x, final_norm, EPS)


class TestQwen2Parity:
    def test_prefill_matches_hf(self, oracle):
        layers, final_norm = _to_tree(oracle)
        rng = np.random.default_rng(1)
        embeds = rng.standard_normal((2, 9, HIDDEN)).astype(np.float32)
        with torch.no_grad():
            ref = oracle(inputs_embeds=torch.from_numpy(embeds)).last_hidden_state.numpy()
        ours = np.asarray(_run_ours_prefill(layers, final_norm, jnp.asarray(embeds)))
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=2e-5)

    def test_incremental_cache_matches_prefill(self, oracle):
        """Cached step-by-step decode ≡ the full prefill (and hence ≡ HF)."""
        layers, final_norm = _to_tree(oracle)
        rng = np.random.default_rng(2)
        t_total, t0 = 7, 3
        embeds = jnp.asarray(rng.standard_normal((1, t_total, HIDDEN)).astype(np.float32))
        full = _run_ours_prefill(layers, final_norm, embeds)

        max_len = t_total
        caches = [(jnp.zeros((1, KV_HEADS, max_len, HEAD_DIM), jnp.float32),) * 2
                  for _ in range(LAYERS)]
        caches = [list(c) for c in caches]

        def step(x_part, start, t_part):
            nonlocal caches
            positions = start + jnp.arange(t_part)[None]
            cols = jnp.arange(max_len)[None, None, None, :]
            rows = positions[:, None, :, None]
            mask = jnp.where(cols <= rows, 0.0, NEG_INF)
            x = x_part
            for i, lp in enumerate(layers):
                x, kc, vc = qwen2_decoder_layer(
                    lp, x, positions, mask, num_heads=HEADS, num_kv_heads=KV_HEADS,
                    head_dim=HEAD_DIM, rope_theta=ROPE_THETA, rms_norm_eps=EPS,
                    kc=caches[i][0], vc=caches[i][1], start=start)
                caches[i][0], caches[i][1] = kc, vc
            return rms_norm(x, final_norm, EPS)

        outs = [step(embeds[:, :t0], jnp.asarray(0), t0)]
        for t in range(t0, t_total):
            outs.append(step(embeds[:, t:t + 1], jnp.asarray(t), 1))
        inc = np.concatenate([np.asarray(o) for o in outs], axis=1)
        np.testing.assert_allclose(inc, np.asarray(full), atol=2e-5, rtol=2e-5)

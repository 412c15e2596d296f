"""PersonaPlex temporal + depformer logit parity vs transformers' Moshi.

PersonaPlex is the published Moshi architecture (reference:
Sources/PersonaPlex/TemporalTransformer.swift, Depformer.swift), and
transformers ships the same graph as ``MoshiModel`` /
``MoshiDepthDecoder`` — a real upstream oracle (the same gold standard
already used for Mimi in test_personaplex_convert.py). A tiny random HF
model's weights map into the canonical tree and the outputs must agree to
fp32 tolerance: attention/RoPE convention, gating-MLP chunk order,
RMS-norm placement, FlexibleLinear bank orientation, and the depformer's
windowed no-positional attention are all pinned here.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from qwen3_asr_swift_tpu.models.personaplex.mimi import config_tiny as mimi_tiny
from qwen3_asr_swift_tpu.models.personaplex.model import (
    PersonaPlexConfig,
    depformer_forward_logits,
    init_personaplex_params,
    temporal_prefill,
)
from qwen3_asr_swift_tpu.ops.kv_cache import init_cache

mm = pytest.importorskip("transformers.models.moshi.modeling_moshi")
from transformers import MoshiConfig, MoshiDepthConfig  # noqa: E402

D, L, H, HD, F = 32, 2, 2, 16, 48  # temporal dims (HF ffn_dim = 2*F)
DD, S, FF = 16, 8, 24              # depformer dims


def _t(w):
    return np.ascontiguousarray(w.T)


def _t3(w):  # FlexibleLinear bank [S, out, in] -> [S, in, out]
    return np.ascontiguousarray(np.transpose(w, (0, 2, 1)))


class TestMoshiParity:
    def test_temporal_stack_matches_hf_moshi(self):
        torch.manual_seed(0)
        cfg_hf = MoshiConfig(
            hidden_size=D, num_hidden_layers=L, num_attention_heads=H, head_dim=HD,
            num_key_value_heads=H, ffn_dim=2 * F, vocab_size=64, audio_vocab_size=48,
            rms_norm_eps=1e-8, rope_theta=10000.0, max_position_embeddings=64,
            sliding_window=64, num_codebooks=S)
        hf = mm.MoshiModel(cfg_hf).eval()
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

        cfg = PersonaPlexConfig(
            d_model=D, num_layers=L, num_heads=H, head_dim=HD, intermediate_size=F,
            context=64, text_vocab=64, audio_vocab=49, num_codebooks=S,
            temporal_codebooks=4, dep_d_model=DD, dep_layers=1, dep_heads=2,
            dep_ff=FF, mimi=mimi_tiny())
        params = jax.tree_util.tree_map(
            np.asarray, init_personaplex_params(jax.random.PRNGKey(0), cfg))
        for i in range(L):
            lp = params["layers"][i]
            for ours, theirs in (("q_proj", "q_proj"), ("k_proj", "k_proj"),
                                 ("v_proj", "v_proj"), ("o_proj", "o_proj")):
                lp[ours]["kernel"] = _t(sd[f"layers.{i}.self_attn.{theirs}.linear.weight"])
            fc1 = sd[f"layers.{i}.mlp.fc1.weight"]
            lp["mlp"]["gate_proj"]["kernel"] = _t(fc1[:F])
            lp["mlp"]["up_proj"]["kernel"] = _t(fc1[F:])
            lp["mlp"]["down_proj"]["kernel"] = _t(sd[f"layers.{i}.mlp.fc2.weight"])
            lp["input_layernorm"]["weight"] = sd[f"layers.{i}.input_layernorm.weight"]
            lp["post_attention_layernorm"]["weight"] = sd[f"layers.{i}.post_attention_layernorm.weight"]
        params["norm"]["weight"] = sd["norm.weight"]

        t = 7
        x = np.random.default_rng(0).standard_normal((1, t, D)).astype(np.float32)
        with torch.no_grad():
            out_hf = hf(inputs_embeds=torch.tensor(x)).last_hidden_state.numpy()

        cache = init_cache(cfg.num_layers, 1, cfg.num_heads, 16, cfg.head_dim, jnp.float32)
        hidden, _ = temporal_prefill(params, cfg, jnp.asarray(x),
                                     jnp.ones((1, t), bool), cache)
        np.testing.assert_allclose(np.asarray(hidden), out_hf, atol=2e-5,
                                   err_msg="temporal stack drifted from HF Moshi")

    def test_depformer_matches_hf_depth_decoder(self):
        torch.manual_seed(0)
        dcfg = MoshiDepthConfig(
            hidden_size=DD, input_size=D, num_hidden_layers=1, num_attention_heads=2,
            head_dim=DD // 2, num_key_value_heads=2, ffn_dim=2 * FF, vocab_size=64,
            audio_vocab_size=48, rms_norm_eps=1e-8, sliding_window=8,
            num_codebooks=S, max_position_embeddings=S)
        hf = mm.MoshiDepthDecoder(dcfg).eval()
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

        cfg = PersonaPlexConfig(
            d_model=D, num_layers=1, num_heads=2, head_dim=16, intermediate_size=64,
            context=64, text_vocab=65, audio_vocab=49, num_codebooks=S,
            temporal_codebooks=4, dep_d_model=DD, dep_layers=1, dep_heads=2,
            dep_ff=FF, mimi=mimi_tiny())
        params = jax.tree_util.tree_map(
            np.asarray, init_personaplex_params(jax.random.PRNGKey(0), cfg))
        params["dep_in"] = _t3(sd["input_projections.weight"])
        params["dep_text_emb"] = sd["text_embed_tokens.weight"]
        params["dep_embed"] = np.stack(
            [sd[f"embed_tokens.{k}.weight"] for k in range(S - 1)])
        params["dep_heads_bank"] = _t3(sd["lm_heads.weight"])
        lp = params["dep_layers"][0]
        q, k, v = (sd[f"layers.0.self_attn.{n}_proj.linear.weight"] for n in "qkv")
        lp["in_proj"] = np.concatenate([_t3(q), _t3(k), _t3(v)], axis=2)
        lp["out_proj"] = _t3(sd["layers.0.self_attn.o_proj.linear.weight"])
        lp["gating_in"] = _t3(sd["layers.0.mlp.fc1.weight"])
        lp["gating_out"] = _t3(sd["layers.0.mlp.fc2.weight"])
        lp["norm1"]["weight"] = sd["layers.0.input_layernorm.weight"]
        lp["norm2"]["weight"] = sd["layers.0.post_attention_layernorm.weight"]

        rng = np.random.default_rng(1)
        hidden = rng.standard_normal((1, D)).astype(np.float32)
        text_tok = np.asarray([7])
        audio = rng.integers(0, 48, (1, S - 1)).astype(np.int64)
        ids = np.concatenate([text_tok[:, None], audio], axis=1)  # [1, S]
        with torch.no_grad():
            out = hf(input_ids=torch.tensor(ids),
                     last_hidden_state=torch.tensor(np.repeat(hidden[:, None], S, 1)))
            hf_logits = (out.logits if hasattr(out, "logits") else out[0]).numpy()

        ours = np.asarray(depformer_forward_logits(
            params, cfg, jnp.asarray(hidden), jnp.asarray(text_tok, jnp.int32),
            jnp.asarray(audio, jnp.int32)))
        # random-init weights are unscaled -> logit magnitudes are large;
        # compare relative to the logit scale
        scale = np.abs(hf_logits).max()
        np.testing.assert_allclose(ours / scale, hf_logits / scale, atol=2e-5,
                                   err_msg="depformer drifted from HF MoshiDepthDecoder")

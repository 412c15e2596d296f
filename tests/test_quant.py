"""Quantized matmul tests: MLX pack/unpack round-trip, XLA group
decomposition vs dense-dequant reference, Pallas kernel (interpret mode)
vs XLA path, linear/embedding/LM-head dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_swift_tpu.core.weights import dequantize_mlx, quantize_mlx
from qwen3_asr_swift_tpu.ops.nn import embedding_lookup, linear, tied_lm_head
from qwen3_asr_swift_tpu.ops.quant import (
    dequantize,
    infer_quant_dims,
    quant_matmul_pallas,
    quant_matmul_xla,
    unpack_codes,
)

RNG = np.random.default_rng(42)


def make_q(out_dim, in_dim, bits, gs=64):
    w = RNG.standard_normal((out_dim, in_dim)).astype(np.float32)
    packed, scales, biases = quantize_mlx(w, bits, gs)
    w_ref = dequantize_mlx(packed, scales, biases, bits, gs)
    p = {"codes": jnp.asarray(packed), "scales": jnp.asarray(scales),
         "biases": jnp.asarray(biases)}
    return p, w_ref


class TestPacking:
    @pytest.mark.parametrize("bits", [2, 4, 8])
    def test_roundtrip_error_bounded(self, bits):
        w = RNG.standard_normal((16, 128)).astype(np.float32)
        packed, scales, biases = quantize_mlx(w, bits)
        w2 = dequantize_mlx(packed, scales, biases, bits)
        # max error ≤ half a quantization step per group
        step = scales[..., None].repeat(64, axis=-1).reshape(16, 128)
        assert (np.abs(w2 - w) <= step * 0.5 + 1e-6).all()

    @pytest.mark.parametrize("bits", [4, 8])
    def test_unpack_codes_matches_numpy(self, bits):
        p, w_ref = make_q(8, 128, bits)
        codes = np.asarray(unpack_codes(p["codes"], bits, 128))
        # codes*scale+bias must reproduce the dequantized matrix
        s = np.asarray(p["scales"]).repeat(64, axis=1)
        b = np.asarray(p["biases"]).repeat(64, axis=1)
        assert np.allclose(codes * s + b, w_ref, atol=1e-5)

    def test_infer_dims(self):
        p, _ = make_q(8, 256, 4, gs=64)
        assert infer_quant_dims(256, p["codes"].shape, p["scales"].shape) == (4, 64)
        p8, _ = make_q(8, 256, 8, gs=32)
        assert infer_quant_dims(256, p8["codes"].shape, p8["scales"].shape) == (8, 32)

    def test_dequantize_device(self):
        p, w_ref = make_q(8, 128, 4)
        assert np.allclose(np.asarray(dequantize(p, 128)), w_ref, atol=1e-5)


class TestMatmul:
    @pytest.mark.parametrize("bits", [2, 4, 8])
    def test_xla_matches_dense(self, bits):
        p, w_ref = make_q(32, 192, bits)
        x = RNG.standard_normal((4, 192)).astype(np.float32)
        y = np.asarray(quant_matmul_xla(jnp.asarray(x), p))
        assert np.allclose(y, x @ w_ref.T, rtol=1e-4, atol=1e-4)

    # The Pallas kernel dequantizes into bf16 planes (matching the
    # reference's fp16 MLX compute), so tolerance is bf16-level relative
    # to the magnitude of the result.
    @pytest.mark.parametrize("bits", [4, 8])
    def test_pallas_matches_xla(self, bits):
        p, w_ref = make_q(16, 128, bits)
        x = RNG.standard_normal((8, 128)).astype(np.float32)
        y_p = np.asarray(quant_matmul_pallas(jnp.asarray(x), p, tile_out=8, interpret=True))
        y_x = np.asarray(quant_matmul_xla(jnp.asarray(x), p))
        scale = np.abs(y_x).max()
        assert np.abs(y_p - y_x).max() / scale < 2e-2
        assert np.abs(y_p - x @ w_ref.T).max() / scale < 2e-2

    def test_pallas_pads_ragged_out_dim(self):
        p, w_ref = make_q(12, 128, 4)  # 12 not divisible by tile 8
        x = RNG.standard_normal((8, 128)).astype(np.float32)
        y = np.asarray(quant_matmul_pallas(jnp.asarray(x), p, tile_out=8, interpret=True))
        assert y.shape == (8, 12)
        truth = x @ w_ref.T
        assert np.abs(y - truth).max() / np.abs(truth).max() < 2e-2

    def test_batched_leading_dims(self):
        p, w_ref = make_q(8, 128, 4)
        x = RNG.standard_normal((2, 3, 128)).astype(np.float32)
        y = np.asarray(quant_matmul_xla(jnp.asarray(x), p))
        assert y.shape == (2, 3, 8)
        assert np.allclose(y, x @ w_ref.T, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("bits", [2, 4, 8])
    def test_groupdot_matches_dense(self, bits):
        """Load-time-unpacked native-s8 path: weight values EXACT, the
        only approximation is per-(row,group) int8 activation
        quantization (~40 dB) — tolerance scales with |y|."""
        from qwen3_asr_swift_tpu.ops.quant import (
            quant_matmul_groupdot, repack_groupdot)

        p, w_ref = make_q(32, 192, bits)
        gp = jax.tree_util.tree_map(jnp.asarray, repack_groupdot(p))
        assert gp["gcodes"].dtype == jnp.int8
        # repacked codes dequantize to exactly the packed reference weight
        g, gs, out = gp["gcodes"].shape
        dense = (np.asarray(gp["gcodes"], np.float32)
                 * np.asarray(gp["gscales"])[:, None, :]
                 + np.asarray(gp["gbiases"])[:, None, :]).reshape(g * gs, out)
        assert np.allclose(dense.T, w_ref, atol=1e-6)
        x = RNG.standard_normal((4, 192)).astype(np.float32)
        y = np.asarray(quant_matmul_groupdot(jnp.asarray(x), gp))
        truth = x @ w_ref.T
        assert np.abs(y - truth).max() / max(np.abs(truth).max(), 1e-9) < 2e-2

    def test_groupdot_linear_dispatch_and_cast(self):
        from qwen3_asr_swift_tpu.ops.nn import linear
        from qwen3_asr_swift_tpu.ops.quant import cast_tree, repack_groupdot

        p, w_ref = make_q(16, 128, 4)
        p["bias"] = RNG.standard_normal(16).astype(np.float32)
        gp = cast_tree(repack_groupdot(p), jnp.bfloat16)
        assert gp["gcodes"].dtype == jnp.int8  # cast preserves the layout
        x = RNG.standard_normal((2, 128)).astype(np.float32)
        y = np.asarray(linear(jnp.asarray(x), gp), np.float32)
        truth = x @ w_ref.T + p["bias"]
        assert np.abs(y - truth).max() / np.abs(truth).max() < 2e-2

    def test_repack_tree_skips_embeddings(self):
        from qwen3_asr_swift_tpu.ops.quant import repack_tree_groupdot

        p, _ = make_q(16, 128, 4)
        e, _ = make_q(64, 128, 4)
        tree = {"layers": [{"q_proj": p}], "embed_tokens": e}
        out = repack_tree_groupdot(tree)
        assert "gcodes" in out["layers"][0]["q_proj"]
        assert "codes" in out["embed_tokens"]  # gather path stays packed


class TestDispatch:
    def test_linear_dispatches_on_codes(self):
        p, w_ref = make_q(8, 128, 4)
        x = jnp.asarray(RNG.standard_normal((2, 128)).astype(np.float32))
        y = np.asarray(linear(x, p))
        assert np.allclose(y, np.asarray(x) @ w_ref.T, rtol=1e-4, atol=1e-4)

    def test_linear_quant_with_bias(self):
        p, w_ref = make_q(8, 128, 4)
        p = dict(p, bias=jnp.arange(8, dtype=jnp.float32))
        x = jnp.asarray(RNG.standard_normal((2, 128)).astype(np.float32))
        y = np.asarray(linear(x, p))
        assert np.allclose(y, np.asarray(x) @ w_ref.T + np.arange(8), rtol=1e-4, atol=1e-4)

    def test_quant_embedding_lookup(self):
        p, w_ref = make_q(50, 128, 4)  # 50-row vocab
        ids = jnp.asarray([0, 7, 49])
        rows = np.asarray(embedding_lookup(p, ids, dim=128), np.float32)
        assert np.allclose(rows, w_ref[[0, 7, 49]], atol=1e-2)

    def test_quant_tied_lm_head(self):
        p, w_ref = make_q(50, 128, 8)
        h = jnp.asarray(RNG.standard_normal((2, 128)).astype(np.float32))
        logits = np.asarray(tied_lm_head(h, p))
        assert logits.shape == (2, 50)
        assert np.allclose(logits, np.asarray(h) @ w_ref.T, rtol=1e-4, atol=1e-4)

    def test_dense_path_unchanged(self):
        x = jnp.ones((2, 4))
        p = {"kernel": jnp.eye(4)}
        assert np.allclose(np.asarray(linear(x, p)), np.ones((2, 4)))


class TestQuantizedASR:
    """End-to-end: a 4-bit Qwen3-ASR must produce exactly the tokens of a
    dense model built from its dequantized weights (same math, different
    storage/compute path)."""

    @pytest.fixture(scope="class")
    def pair(self):
        import dataclasses

        from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR, config_tiny
        from qwen3_asr_swift_tpu.models.qwen3_asr.decoder import init_decoder_params
        from qwen3_asr_swift_tpu.models.qwen3_asr.encoder import init_encoder_params
        from qwen3_asr_swift_tpu.ops.quant import dequantize, quantize_tree

        cfg = config_tiny()
        # group-64-compatible decoder dims
        cfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(
                cfg.decoder, hidden_size=128, intermediate_size=256,
                num_heads=4, num_kv_heads=2, head_dim=32),
            encoder=dataclasses.replace(cfg.encoder, output_dim=128),
        )
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        enc = init_encoder_params(k1, cfg.encoder, jnp.float32)
        dec = init_decoder_params(k2, cfg.decoder, jnp.float32)
        qdec = quantize_tree(dec, 4)

        def dequant_copy(node):
            if isinstance(node, dict):
                if "codes" in node:
                    in_dim = 32 * node["codes"].shape[1] // 4
                    w = dequantize(node, in_dim)  # [out, in]
                    out = {"kernel": jnp.asarray(np.asarray(w).T)}
                    if "bias" in node:
                        out["bias"] = node["bias"]
                    return out
                return {k: dequant_copy(v) for k, v in node.items()}
            if isinstance(node, list):
                return [dequant_copy(v) for v in node]
            return node

        ddec = dequant_copy(qdec)
        # embed table was quantized row-wise: dequant back to [vocab, dim]
        ddec["embed_tokens"] = dequantize(qdec["embed_tokens"], 128)
        q_model = Qwen3ASR(cfg, enc, qdec, dtype=jnp.float32, audio_buckets_s=(8,))
        d_model = Qwen3ASR(cfg, enc, ddec, dtype=jnp.float32, audio_buckets_s=(8,))
        return q_model, d_model

    def test_quantized_matches_dequantized_dense(self, pair):
        q_model, d_model = pair
        audio = (0.1 * np.sin(np.linspace(0, 300, 16000))).astype(np.float32)
        rq = q_model.transcribe(audio, max_tokens=6)
        rd = d_model.transcribe(audio, max_tokens=6)
        assert rq.text == rd.text

    def test_embed_table_is_packed(self, pair):
        q_model, _ = pair
        assert "codes" in q_model.decoder_params["embed_tokens"]
        assert q_model.decoder_params["embed_tokens"]["codes"].dtype == jnp.uint32
        # layer projections are packed AND fused (gate/up concat rows)
        assert "codes" in q_model.decoder_params["layers"][0]["mlp"]["gate_up_proj"]


class TestQuantComputeMode:
    """quant_compute="dequant" (hybrid serving mode: 4-bit values, dense
    execution) is token-identical to the packed path and actually runs
    dense kernels."""

    def test_dequant_mode_token_identical_and_dense(self):
        import dataclasses

        from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR, config_tiny

        cfg = config_tiny()
        cfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(
                cfg.decoder, hidden_size=128, intermediate_size=256,
                num_heads=4, num_kv_heads=2, head_dim=32),
            encoder=dataclasses.replace(cfg.encoder, output_dim=128),
        )
        mp = Qwen3ASR.init_random(cfg, quant_bits=4, dtype=jnp.float32,
                                  audio_buckets_s=(8,))
        md = Qwen3ASR.init_random(cfg, quant_bits=4, dtype=jnp.float32,
                                  audio_buckets_s=(8,), quant_compute="dequant")
        l0 = md.decoder_params["layers"][0]
        assert "kernel" in l0["mlp"]["gate_up_proj"] and "codes" not in l0["mlp"]["gate_up_proj"]
        assert getattr(md.decoder_params["embed_tokens"], "ndim", 0) == 2
        assert "codes" in mp.decoder_params["layers"][0]["mlp"]["gate_up_proj"]

        audio = (0.1 * np.sin(np.linspace(0, 300, 16000))).astype(np.float32)
        rp = mp.transcribe(audio, max_tokens=6)
        rd = md.transcribe(audio, max_tokens=6)
        assert rp.text == rd.text
        assert rp.confidence == pytest.approx(rd.confidence, abs=1e-4)

    def test_groupdot_mode_runs_and_guards_sharding(self):
        """quant_compute='groupdot': fused linears repack to the int8
        group-dot layout (exact weight values; int8 activation quant is
        the only approximation — tokens may legitimately differ from
        packed on near-tie logits), embeddings stay packed for the gather
        path, and shard() refuses with a clear error."""
        import dataclasses

        from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR, config_tiny

        cfg = config_tiny()
        cfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(
                cfg.decoder, hidden_size=128, intermediate_size=256,
                num_heads=4, num_kv_heads=2, head_dim=32),
            encoder=dataclasses.replace(cfg.encoder, output_dim=128),
        )
        mg = Qwen3ASR.init_random(cfg, quant_bits=4, dtype=jnp.float32,
                                  audio_buckets_s=(8,), quant_compute="groupdot")
        l0 = mg.decoder_params["layers"][0]
        assert "gcodes" in l0["mlp"]["gate_up_proj"]
        assert l0["mlp"]["gate_up_proj"]["gcodes"].dtype == jnp.int8
        assert "codes" in mg.decoder_params["embed_tokens"]  # gather stays packed

        audio = (0.1 * np.sin(np.linspace(0, 300, 16000))).astype(np.float32)
        r1 = mg.transcribe(audio, max_tokens=6)
        r2 = mg.transcribe(audio, max_tokens=6)
        assert r1.text == r2.text  # deterministic
        assert np.isfinite(r1.confidence)
        with pytest.raises(ValueError, match="groupdot"):
            mg.shard(dp=1, tp=1)


class TestQuantizedTensorParallel:
    def test_quantized_decoder_sharded_matches_replicated(self):
        """4-bit decoder params sharded by the TP rules over an 8-device
        mesh must transcribe identically to the unsharded model (XLA
        inserts the collectives from the shardings alone)."""
        import dataclasses

        import jax

        from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR, config_tiny
        from qwen3_asr_swift_tpu.parallel import (
            QWEN3_DECODER_RULES,
            make_mesh,
            shard_pytree,
        )

        cfg = config_tiny()
        cfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(
                cfg.decoder, hidden_size=128, intermediate_size=256,
                num_heads=4, num_kv_heads=2, head_dim=32),
            encoder=dataclasses.replace(cfg.encoder, output_dim=128),
        )
        model = Qwen3ASR.init_random(cfg, dtype=jnp.float32, quant_bits=4,
                                     audio_buckets_s=(8,))
        audio = (0.1 * np.sin(np.linspace(0, 500, 16000))).astype(np.float32)
        ref = model.transcribe(audio, max_tokens=4).text

        mesh = make_mesh(8, dp=4, tp=2)
        model.shard(mesh=mesh)  # unfuses qkv/gate_up, then applies TP rules
        # quantized leaves actually got a tp sharding (not just replicated)
        gate = model.decoder_params["layers"][0]["mlp"]["gate_proj"]["codes"]
        assert "tp" in str(gate.sharding.spec)
        got = model.transcribe(audio, max_tokens=4).text
        assert got == ref

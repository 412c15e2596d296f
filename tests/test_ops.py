"""Unit tests for core compute ops: RoPE, SDPA/GQA, sampling, KV cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_swift_tpu.ops.attention import causal_mask, sdpa, sdpa_reference
from qwen3_asr_swift_tpu.ops.kv_cache import (
    after_prefill,
    after_token,
    init_cache,
    write_prompt,
    write_token,
)
from qwen3_asr_swift_tpu.ops.rope import apply_rope, rope_angles, rope_reference
from qwen3_asr_swift_tpu.ops.sampling import (
    SamplingOptions,
    apply_no_repeat_ngram,
    apply_repetition_penalty,
    apply_top_k,
    sample_token,
)


class TestRope:
    def test_matches_reference(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 3, 5, 16)).astype(np.float32)  # [B,H,T,D]
        pos = np.arange(5, dtype=np.int32)[None, :].repeat(2, 0)  # [B,T]
        cos, sin = rope_angles(jnp.asarray(pos), 16, base=1e6)
        out = apply_rope(jnp.asarray(x), cos[:, None], sin[:, None])
        ref = rope_reference(x, pos[:, None, :, None][..., 0], base=1e6)
        assert np.allclose(np.asarray(out), ref, atol=1e-5)

    def test_position_zero_identity(self):
        x = np.random.default_rng(1).standard_normal((1, 2, 1, 8)).astype(np.float32)
        pos = np.zeros((1, 1), np.int32)
        cos, sin = rope_angles(jnp.asarray(pos), 8)
        out = apply_rope(jnp.asarray(x), cos[:, None], sin[:, None])
        assert np.allclose(np.asarray(out), x, atol=1e-6)

    def test_offset_consistency(self):
        # Rotating [t0, t1] together == rotating each at its own position.
        x = np.random.default_rng(2).standard_normal((1, 1, 2, 8)).astype(np.float32)
        pos = np.array([[3, 4]], np.int32)
        cos, sin = rope_angles(jnp.asarray(pos), 8)
        full = np.asarray(apply_rope(jnp.asarray(x), cos[:, None], sin[:, None]))
        for t in range(2):
            c1, s1 = rope_angles(jnp.asarray(pos[:, t : t + 1]), 8)
            single = np.asarray(apply_rope(jnp.asarray(x[:, :, t : t + 1]), c1[:, None], s1[:, None]))
            assert np.allclose(full[:, :, t : t + 1], single, atol=1e-6)


class TestSdpa:
    @pytest.mark.parametrize("hq,hkv", [(4, 4), (4, 2), (4, 1)])
    def test_matches_reference(self, hq, hkv):
        rng = np.random.default_rng(0)
        q = rng.standard_normal((2, hq, 5, 8)).astype(np.float32)
        k = rng.standard_normal((2, hkv, 7, 8)).astype(np.float32)
        v = rng.standard_normal((2, hkv, 7, 8)).astype(np.float32)
        out = sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 0.35)
        ref = sdpa_reference(q, k, v, 0.35)
        assert np.allclose(np.asarray(out), ref, atol=1e-5)

    def test_causal_mask(self):
        rng = np.random.default_rng(1)
        q = rng.standard_normal((1, 2, 4, 8)).astype(np.float32)
        k = rng.standard_normal((1, 2, 4, 8)).astype(np.float32)
        v = rng.standard_normal((1, 2, 4, 8)).astype(np.float32)
        mask = causal_mask(4, 4)
        out = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 0.35, mask))
        # Row 0 must equal attention over key 0 only → v[:, :, 0]
        assert np.allclose(out[:, :, 0], v[:, :, 0], atol=1e-5)

    def test_future_key_change_does_not_leak(self):
        rng = np.random.default_rng(2)
        q = rng.standard_normal((1, 2, 4, 8)).astype(np.float32)
        k = rng.standard_normal((1, 2, 4, 8)).astype(np.float32)
        v = rng.standard_normal((1, 2, 4, 8)).astype(np.float32)
        mask = causal_mask(4, 4)
        out1 = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 1.0, mask))
        k2, v2 = k.copy(), v.copy()
        k2[:, :, 3] += 100.0
        v2[:, :, 3] += 100.0
        out2 = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k2), jnp.asarray(v2), 1.0, mask))
        assert np.allclose(out1[:, :, :3], out2[:, :, :3], atol=1e-5)
        assert not np.allclose(out1[:, :, 3], out2[:, :, 3])


class TestSampling:
    def test_greedy_is_argmax(self):
        logits = jnp.asarray(np.random.default_rng(0).standard_normal((3, 50)).astype(np.float32))
        tok = sample_token(logits, jax.random.PRNGKey(0), SamplingOptions())
        assert (np.asarray(tok) == np.argmax(np.asarray(logits), -1)).all()
        assert tok.dtype == jnp.int32

    def test_repetition_penalty(self):
        logits = jnp.zeros((1, 10), jnp.float32).at[0, 3].set(2.0).at[0, 5].set(1.9)
        gen = jnp.asarray([[3, 0, 0]], jnp.int32)
        out = apply_repetition_penalty(logits, gen, jnp.asarray([1]), 2.0)
        # token 3 penalized 2.0 → 1.0; token 5 now wins
        assert np.asarray(out)[0, 3] == pytest.approx(1.0)
        assert np.argmax(np.asarray(out)[0]) == 5

    def test_repetition_penalty_negative_logits(self):
        logits = jnp.full((1, 4), -1.0, jnp.float32)
        gen = jnp.asarray([[2]], jnp.int32)
        out = apply_no_op = apply_repetition_penalty(logits, gen, jnp.asarray([1]), 2.0)
        assert np.asarray(out)[0, 2] == pytest.approx(-2.0)  # negative → multiplied

    def test_no_repeat_ngram(self):
        # history: 1 2 7 1 2 → next token completing (1,2,·)=7 must be banned
        gen = jnp.asarray([[1, 2, 7, 1, 2, 0, 0, 0]], jnp.int32)
        logits = jnp.zeros((1, 10), jnp.float32).at[0, 7].set(5.0).at[0, 4].set(1.0)
        out = apply_no_repeat_ngram(logits, gen, jnp.asarray([5]), 3)
        assert np.asarray(out)[0, 7] < -1e8
        assert np.argmax(np.asarray(out)[0]) == 4

    def test_top_k(self):
        logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0]], jnp.float32)
        out = np.asarray(apply_top_k(logits, 2))
        assert out[0, 1] == 5.0 and out[0, 2] == 3.0
        assert out[0, 0] < -1e8 and out[0, 3] < -1e8

    def test_temperature_sampling_distribution(self):
        logits = jnp.asarray([[0.0, 3.0]], jnp.float32)
        opts = SamplingOptions(temperature=1.0)
        counts = [0, 0]
        for i in range(200):
            t = int(sample_token(logits, jax.random.PRNGKey(i), opts)[0])
            counts[t] += 1
        # P(token1) = sigmoid(3) ≈ 0.95
        assert counts[1] > 160


class TestKVCache:
    def test_prefill_then_token_writes(self):
        cache = init_cache(num_layers=1, batch=2, num_kv_heads=2, max_len=8, head_dim=4, dtype=jnp.float32)
        k = jnp.ones((2, 2, 4, 4)) * 2.0
        v = jnp.ones((2, 2, 4, 4)) * 3.0
        layer = write_prompt(cache.layers[0], k, v)
        valid = jnp.asarray([[True, True, True, False], [True, True, False, False]])
        cache = after_prefill(cache, [layer], valid, 4)
        assert np.asarray(cache.positions).tolist() == [3, 2]
        assert int(cache.cursor) == 4
        assert np.asarray(cache.valid)[0].tolist() == [True, True, True, False] + [False] * 4

        k1 = jnp.ones((2, 2, 1, 4)) * 7.0
        layer = write_token(cache.layers[0], k1, k1, cache.cursor)
        cache = after_token(cache, [layer])
        assert int(cache.cursor) == 5
        assert np.asarray(cache.positions).tolist() == [4, 3]
        assert np.asarray(cache.valid)[0, 4] and np.asarray(cache.valid)[1, 4]
        assert np.asarray(cache.layers[0].k)[0, 0, 4, 0] == 7.0


class TestPallasDecodeAttention:
    def test_interpret_matches_sdpa_on_dequant(self):
        """decode_attention_int8 (interpret mode) ≡ sdpa over the
        dequantized cache — incl. GQA head grouping, row masking, and the
        L→128 padding path."""
        from qwen3_asr_swift_tpu.ops.attention import NEG_INF, sdpa
        from qwen3_asr_swift_tpu.ops.attention_pallas import decode_attention_int8
        from qwen3_asr_swift_tpu.ops.kv_cache import _quantize

        rng = np.random.default_rng(0)
        B, HQ, HKV, L, D = 2, 4, 2, 37, 16
        q = jnp.asarray(rng.standard_normal((B, HQ, 1, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, HKV, L, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, HKV, L, D)), jnp.float32)
        valid = jnp.asarray(rng.random((B, L)) > 0.3)

        kq, ks = _quantize(k)
        vq, vs = _quantize(v)
        kd = kq.astype(jnp.float32) * ks[..., None]
        vd = vq.astype(jnp.float32) * vs[..., None]
        mask = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]
        ref = np.asarray(sdpa(q, kd, vd, 1.0 / np.sqrt(D), mask))

        out = np.asarray(decode_attention_int8(q, kq, ks, vq, vs, valid,
                                               interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

"""Qwen3.5 chat tests: delta-rule state semantics, left-pad invariance,
prefill/decode parity, chat template, streaming generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_swift_tpu.models.chat import Qwen3Chat, config_tiny, init_chat_params
from qwen3_asr_swift_tpu.models.chat.model import (
    chat_forward,
    init_states,
)
from qwen3_asr_swift_tpu.tokenizers.bpe import BPETokenizer, _bytes_to_unicode

CFG = config_tiny()


@pytest.fixture(scope="module")
def params():
    return init_chat_params(jax.random.PRNGKey(0), CFG)


def byte_tokenizer():
    b2u = _bytes_to_unicode()
    vocab = {ch: i for i, ch in enumerate(b2u[b] for b in range(200))}
    return BPETokenizer(vocab, [], {"<|im_start|>": 200, "<|im_end|>": 201})


class TestForward:
    def test_prefill_decode_parity(self, params):
        """Running [t0..t4] at once must equal prefill [t0..t2] + 2 decode
        steps — both the DeltaNet state and the attention cache must be
        transparent."""
        ids = np.array([[3, 5, 7, 11, 13]], np.int32)
        states = init_states(CFG, 1, 16)
        pos = jnp.arange(5)[None]
        valid = jnp.ones((1, 5), bool)
        logits_full, _ = chat_forward(params, CFG, jnp.asarray(ids), states, pos, valid)

        states = init_states(CFG, 1, 16)
        l3, states = chat_forward(params, CFG, jnp.asarray(ids[:, :3]), states,
                                  jnp.arange(3)[None], jnp.ones((1, 3), bool))
        assert np.allclose(np.asarray(l3)[0, 2], np.asarray(logits_full)[0, 2], atol=2e-3)
        for t in range(3, 5):
            lt, states = chat_forward(params, CFG, jnp.asarray(ids[:, t : t + 1]), states,
                                      jnp.asarray([[t]]), jnp.ones((1, 1), bool))
            assert np.allclose(np.asarray(lt)[0, 0], np.asarray(logits_full)[0, t], atol=2e-3), t

    def test_left_pad_invariance(self, params):
        """A left-padded prompt must produce the same last-token logits as
        the unpadded prompt (validity gating keeps recurrent state clean)."""
        ids = np.array([[3, 5, 7]], np.int32)
        states = init_states(CFG, 1, 16)
        l_plain, _ = chat_forward(params, CFG, jnp.asarray(ids), states,
                                  jnp.arange(3)[None], jnp.ones((1, 3), bool))

        padded = np.array([[9, 9, 3, 5, 7]], np.int32)  # junk pad tokens
        states = init_states(CFG, 1, 16)
        valid = jnp.asarray([[False, False, True, True, True]])
        pos = jnp.asarray([[0, 0, 0, 1, 2]])
        l_pad, _ = chat_forward(params, CFG, jnp.asarray(padded), states, pos, valid)
        assert np.allclose(np.asarray(l_pad)[0, -1], np.asarray(l_plain)[0, -1], atol=2e-3)


class TestGeneration:
    def test_generate_ids_deterministic(self):
        model = Qwen3Chat.init_random(CFG)
        out1 = model.generate_ids([3, 5, 7], max_new=8)
        out2 = model.generate_ids([3, 5, 7], max_new=8)
        assert out1 == out2
        assert len(out1) <= 8

    def test_chat_streams_text(self):
        model = Qwen3Chat.init_random(CFG, tokenizer=byte_tokenizer())
        pieces = list(model.chat([{"role": "user", "content": "hi"}]))
        assert isinstance("".join(pieces), str)

    def test_stream_matches_monolithic(self):
        """generate_ids_stream (resumable chunked decode, true token
        streaming) yields exactly generate_ids' tokens for chunk sizes
        that divide, straddle, and exceed max_new."""
        model = Qwen3Chat.init_random(CFG)
        base = model.generate_ids([3, 5, 7], max_new=9)
        for chunk in (1, 4, 9, 100):
            got = list(model.generate_ids_stream([3, 5, 7], max_new=9, chunk=chunk))
            assert got == base, chunk

    def test_chat_template(self):
        text = Qwen3Chat.apply_chat_template(
            [{"role": "system", "content": "S"}, {"role": "user", "content": "U"}]
        )
        assert text == "<|im_start|>system\nS<|im_end|>\n<|im_start|>user\nU<|im_end|>\n<|im_start|>assistant\n"


class TestQuantizedChat:
    def test_4bit_chat_runs_and_packs(self):
        import dataclasses

        from qwen3_asr_swift_tpu.models.chat import Qwen3Chat, config_tiny

        cfg = dataclasses.replace(config_tiny(), hidden_size=128, intermediate_size=256)
        m = Qwen3Chat.init_random(cfg, quant_bits=4)
        assert "codes" in m.params["layers"][0]["mlp"]["gate_proj"]
        assert "codes" in m.params["embed_tokens"]
        ids = m.generate_ids([5, 9, 13], max_new=4)
        assert len(ids) == 4
        assert ids == m.generate_ids([5, 9, 13], max_new=4)  # deterministic


class TestChatSampling:
    """Reference ChatSampler parity (ChatSampler.swift:17-106) on device."""

    def test_top_p_nucleus_prefix(self):
        from qwen3_asr_swift_tpu.ops.sampling import apply_top_p

        # probs ~ [0.643, 0.237, 0.087, 0.032] for logits [3,2,1,0]:
        # p=0.7 keeps the prefix through the crossing token {3, 2}
        lg = jnp.asarray([[3.0, 2.0, 1.0, 0.0]])
        out = np.asarray(apply_top_p(lg, 0.7))[0]
        assert out[0] == 3.0 and out[1] == 2.0
        assert out[2] < -1e8 and out[3] < -1e8
        # p=0.5 keeps only the top token (it alone crosses 0.5)
        out = np.asarray(apply_top_p(lg, 0.5))[0]
        assert out[0] == 3.0 and (out[1:] < -1e8).all()
        # p>=1 is the identity
        np.testing.assert_array_equal(np.asarray(apply_top_p(lg, 1.0)), np.asarray(lg))

    def test_chat_sample_greedy_and_penalty(self):
        from qwen3_asr_swift_tpu.models.chat import ChatSamplingConfig, chat_sample

        key = jax.random.PRNGKey(0)
        lg = jnp.asarray([[0.5, 1.0, -2.0]])
        greedy = ChatSamplingConfig(temperature=0.0, repetition_penalty=1.0)
        assert int(chat_sample(lg, key, greedy, jnp.asarray([[-1]]))[0]) == 1
        # history with token 1 + penalty drops it below token 0
        pen = ChatSamplingConfig(temperature=0.0, repetition_penalty=4.0)
        assert int(chat_sample(lg, key, pen, jnp.asarray([[1]]))[0]) == 0
        # empty-slot sentinel is inert
        assert int(chat_sample(lg, key, pen, jnp.asarray([[-1]]))[0]) == 1

    def test_sampled_generation_deterministic_per_seed(self):
        from qwen3_asr_swift_tpu.models.chat import ChatSamplingConfig

        model = Qwen3Chat.init_random(config_tiny())
        s = ChatSamplingConfig()  # reference default: temp 0.7 top-k 50 top-p 0.9
        a = model.generate_ids([3, 5, 7], max_new=8, seed=1, sampling=s)
        b = model.generate_ids([3, 5, 7], max_new=8, seed=1, sampling=s)
        assert a == b
        # stream yields the same sequence as the monolithic call
        c = list(model.generate_ids_stream([3, 5, 7], max_new=8, seed=1,
                                           sampling=s, chunk=3))
        assert c == a
        # greedy path unchanged (None default)
        g1 = model.generate_ids([3, 5, 7], max_new=8)
        g2 = model.generate_ids([3, 5, 7], max_new=8, seed=9)
        assert g1 == g2  # greedy ignores the seed

    def test_presets(self):
        from qwen3_asr_swift_tpu.models.chat import ChatSamplingConfig

        assert ChatSamplingConfig.creative().temperature == 0.9
        assert ChatSamplingConfig.precise().top_k == 20

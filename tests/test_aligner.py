"""Forced aligner tests: text slotting, LIS monotonicity correction
(pure host logic — reference: TimestampCorrection tests), and the
non-autoregressive forward on a tiny random model."""

import dataclasses

import numpy as np
import pytest

from qwen3_asr_swift_tpu.models.qwen3_asr.aligner import (
    Qwen3ForcedAligner,
    enforce_monotonicity,
    lis_positions,
    slot_text,
    split_word_pairs,
)
from qwen3_asr_swift_tpu.tokenizers.bpe import BPETokenizer, _bytes_to_unicode


def byte_tokenizer():
    b2u = _bytes_to_unicode()
    vocab = {ch: i for i, ch in enumerate(b2u[b] for b in range(256))}
    return BPETokenizer(vocab, [])


class TestSplitting:
    def test_space_delimited(self):
        pairs = split_word_pairs("Hello, world! Test")
        assert [s for s, _ in pairs] == ["Hello,", "world!", "Test"]
        assert [c for _, c in pairs] == ["Hello", "world", "Test"]

    def test_cjk_per_character(self):
        pairs = split_word_pairs("你好。", language="Chinese")
        assert [c for _, c in pairs] == ["你", "好"]
        assert pairs[-1][0] == "好。"  # punctuation attaches to surface


class TestSlotting:
    def test_structure(self):
        tok = byte_tokenizer()
        slotted = slot_text("ab cd", tok, timestamp_id=999)
        # <ts> a b <ts> <ts> c d <ts>
        assert slotted.words == ["ab", "cd"]
        assert len(slotted.timestamp_positions) == 4
        for p in slotted.timestamp_positions:
            assert slotted.token_ids[p] == 999

    def test_unencodable_word_attaches(self):
        tok = byte_tokenizer()
        slotted = slot_text("ab !!! cd", tok, timestamp_id=999)
        # "!!!" cleans to empty → surface attaches to previous word
        assert slotted.words == ["ab!!!", "cd"]


class TestLIS:
    def test_monotonic_unchanged(self):
        assert enforce_monotonicity([1, 2, 5, 9]) == [1, 2, 5, 9]

    def test_single_outlier_repaired(self):
        out = enforce_monotonicity([1, 2, 50, 4, 5, 6])
        assert out == sorted(out)
        assert out[2] in (2, 3, 4)  # interpolated/nearest between anchors

    def test_lis_positions(self):
        arr = [3, 1, 2, 5, 4, 6]
        pos = lis_positions(arr)
        vals = [arr[p] for p in pos]
        assert vals == sorted(vals)
        assert len(pos) == 4  # e.g. 1,2,5,6 or 1,2,4,6

    def test_all_decreasing(self):
        out = enforce_monotonicity([5, 4, 3, 2])
        assert out == sorted(out)

    def test_empty_and_single(self):
        assert enforce_monotonicity([]) == []
        assert enforce_monotonicity([7]) == [7]


class TestAlignerForward:
    def test_align_runs_tiny(self):
        import jax.numpy as jnp

        tok = byte_tokenizer()
        model = Qwen3ForcedAligner.init_random(dtype=jnp.float32, tokenizer=tok)
        audio = (0.1 * np.random.default_rng(0).standard_normal(16000)).astype(np.float32)
        words = model.align(audio, "ab cd ef")
        assert len(words) == 3
        for w in words:
            assert w.end >= w.start >= 0.0
        # monotone across words
        starts = [w.start for w in words]
        assert starts == sorted(starts)

"""Kokoro TTS tests: phonemizer, duration/alignment, synthesis flow,
trim/fade postprocessing."""

import numpy as np
import pytest

from qwen3_asr_swift_tpu.models.kokoro import (
    KokoroTTS,
    config_tiny,
    phonemize,
    phonemes_to_ids,
    trim_and_fade,
)
from qwen3_asr_swift_tpu.models.kokoro.phonemizer import number_to_words


class TestPhonemizer:
    def test_dictionary_words(self):
        out = phonemize("hello world")
        assert "həlˈoʊ" in out
        assert "wɜːld" in out

    def test_rule_fallback_nonempty(self):
        out = phonemize("flibbertigibbet")
        assert len(out) > 5

    def test_numbers_expanded(self):
        assert "twɛnt" in phonemize("25 things")  # "twenty" through the rules
        assert number_to_words(125) == "one hundred twenty five"
        assert number_to_words(3000) == "three thousand"

    def test_punctuation_preserved(self):
        out = phonemize("stop. now!")
        assert "." in out and "!" in out

    def test_ids_in_vocab(self):
        ids = phonemes_to_ids(phonemize("test sentence"))
        assert ids and all(i >= 0 for i in ids)

    def test_cjk_passthrough(self):
        assert phonemize("你好", "zh") == "你 好"


class TestTrimFade:
    def test_trailing_silence_trimmed(self):
        sr = 24000
        speech = 0.5 * np.sin(np.arange(sr) * 0.1).astype(np.float32)
        silence = np.zeros(sr, np.float32)
        out = trim_and_fade(np.concatenate([speech, silence]), sr)
        assert len(out) < sr + 2000  # trailing second removed
        assert abs(out[-1]) < 1e-3  # fade to zero

    def test_empty_ok(self):
        assert len(trim_and_fade(np.zeros(0, np.float32))) == 0


class TestSynthesis:
    @pytest.fixture(scope="class")
    def model(self):
        return KokoroTTS.init_random(config_tiny())

    def test_synthesize_audio(self, model):
        out = model.synthesize("hello world")
        assert out.sample_rate == 24000
        assert len(out.samples) > 0
        assert np.abs(out.samples).max() <= 1.0

    def test_voices_differ(self, model):
        a = model.synthesize("hello", voice="af_default")
        b = model.synthesize("hello", voice="am_default")
        n = min(len(a.samples), len(b.samples))
        assert n == 0 or not np.allclose(a.samples[:n], b.samples[:n])

    def test_empty_text(self, model):
        assert len(model.synthesize("").samples) == 0

    def test_longer_text_longer_audio(self, model):
        short = model.synthesize("hi")
        long = model.synthesize("this is a much longer sentence with many words")
        assert len(long.samples) >= len(short.samples)

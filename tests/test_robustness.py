"""Degenerate-input robustness across model families: empty, single-sample,
and very short audio must return empty/benign results, never crash."""

import jax.numpy as jnp
import numpy as np
import pytest

EMPTY = np.zeros(0, np.float32)
ONE = np.zeros(1, np.float32)
SHORT = np.zeros(100, np.float32)
CASES = [EMPTY, ONE, SHORT]


class TestDegenerateAudio:
    def test_qwen3_asr(self):
        from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR, config_tiny

        m = Qwen3ASR.init_random(config_tiny(), dtype=jnp.float32, audio_buckets_s=(8,))
        for audio in CASES:
            r = m.transcribe(audio, max_tokens=2)
            assert isinstance(r.text, str)

    def test_vads(self):
        from qwen3_asr_swift_tpu.models.firered_vad import FireRedVAD
        from qwen3_asr_swift_tpu.models.firered_vad import config_tiny as fr_tiny
        from qwen3_asr_swift_tpu.models.pyannote import PyannoteVAD
        from qwen3_asr_swift_tpu.models.pyannote import config_tiny as py_tiny
        from qwen3_asr_swift_tpu.models.silero_vad import SileroVAD

        for model in (SileroVAD.init_random(), FireRedVAD.init_random(fr_tiny()),
                      PyannoteVAD.init_random(py_tiny())):
            for audio in CASES:
                segs = model.detect_speech(audio)
                assert isinstance(segs, list)

    def test_enhancement(self):
        from qwen3_asr_swift_tpu.models.enhancement import SpeechEnhancer

        se = SpeechEnhancer.init_random()
        for audio in CASES:
            out = se.enhance(audio, 48000)
            assert np.isfinite(out.samples).all()

    def test_speaker_embed(self):
        from qwen3_asr_swift_tpu.models.speaker import WeSpeaker

        ws = WeSpeaker.init_random()
        for audio in CASES:
            emb = ws.embed(audio)
            assert np.isfinite(emb).all()

    def test_streaming_asr(self):
        from qwen3_asr_swift_tpu.models.parakeet_streaming import (
            ParakeetStreamingASR,
            config_tiny,
        )

        m = ParakeetStreamingASR.init_random(config_tiny())
        for audio in CASES:
            r = m.transcribe(audio)
            assert isinstance(r.text, str)

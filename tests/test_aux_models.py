"""Tests for enhancement, separation, and wake word modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_swift_tpu.models.enhancement import SpeechEnhancer, erb_filterbank
from qwen3_asr_swift_tpu.models.separation import SourceSeparator, signal_to_distortion_ratio
from qwen3_asr_swift_tpu.models.separation.model import istft, stft
from qwen3_asr_swift_tpu.models.wakeword import (
    ContextGraph,
    Keyword,
    StreamingKeywordDecoder,
    WakeWordDetector,
)


class TestSeparationSTFT:
    def test_istft_inverts_stft(self):
        rng = np.random.default_rng(0)
        audio = rng.standard_normal((2, 44100 // 4)).astype(np.float32)
        n_frames = audio.shape[1] // 1024 + 1
        re, im = stft(jnp.asarray(audio), n_frames)
        out = np.asarray(istft(re, im, audio.shape[1]))
        # overlap-add reconstruction: interior must match closely
        err = np.abs(out[:, 2048:-2048] - audio[:, 2048:-2048]).max()
        assert err < 1e-3


class TestSeparator:
    def test_separate_shapes_and_mask_partition(self):
        model = SourceSeparator.init_random()
        audio = (0.1 * np.random.default_rng(0).standard_normal((2, 44100 // 2))).astype(np.float32)
        stems = model.separate(audio, 44100)
        assert set(stems) == {"vocals", "drums", "bass", "other"}
        for s in stems.values():
            assert s.shape == audio.shape
        # Wiener masks partition the mixture: stems sum ≈ mixture
        total = sum(stems.values())
        corr = np.corrcoef(total.ravel(), audio.ravel())[0, 1]
        assert corr > 0.95

    def test_sdr_helper(self):
        x = np.sin(np.arange(1000) * 0.1)
        assert signal_to_distortion_ratio(x, x) > 80
        assert signal_to_distortion_ratio(np.zeros_like(x), x) == pytest.approx(0.0, abs=0.1)


class TestEnhancer:
    def test_enhance_shape_and_stability(self):
        model = SpeechEnhancer.init_random()
        audio = (0.1 * np.random.default_rng(0).standard_normal(48000 // 2)).astype(np.float32)
        out = model.enhance(audio, 48000)
        assert out.sample_rate == 48000
        assert len(out.samples) == len(audio)
        assert np.isfinite(out.samples).all()

    def test_resamples_input(self):
        model = SpeechEnhancer.init_random()
        out = model.enhance(np.zeros(16000, np.float32), 16000)
        assert out.sample_rate == 48000

    def test_erb_filterbank(self):
        fb = erb_filterbank()
        assert fb.shape == (481, 32)
        assert np.allclose(fb.sum(axis=0), 1.0, atol=1e-3)


class TestContextGraph:
    def test_simple_match(self):
        graph = ContextGraph([Keyword("hey", [5, 6, 7], threshold=0.5)])
        dec = StreamingKeywordDecoder(graph)
        hits = [dec.step(t, 0.9, i * 0.02) for i, t in enumerate([0, 5, 6, 7, 0])]
        found = [h for h in hits if h]
        assert len(found) == 1
        assert found[0][0] == "hey"

    def test_below_threshold_rejected(self):
        graph = ContextGraph([Keyword("hey", [5, 6, 7], threshold=0.95)])
        dec = StreamingKeywordDecoder(graph)
        hits = [dec.step(t, 0.5, 0.0) for t in [5, 6, 7]]
        assert not any(hits)

    def test_overlapping_keywords_fail_links(self):
        # "ab" and "babc": feeding b a b c must fire both via fail links
        graph = ContextGraph([Keyword("ab", [1, 2], threshold=0.0),
                              Keyword("babc", [2, 1, 2, 3], threshold=0.0)])
        dec = StreamingKeywordDecoder(graph)
        names = []
        for i, t in enumerate([2, 1, 2, 3]):
            h = dec.step(t, 0.9, i * 0.02)
            if h:
                names.append(h[0])
        assert "ab" in names  # completed at step 3 via the trie path inside "babc"

    def test_repeated_token_collapsed(self):
        graph = ContextGraph([Keyword("aa", [4, 4], threshold=0.0)])
        dec = StreamingKeywordDecoder(graph)
        # consecutive identical frames collapse (CTC-style); need a blank between
        hits = [dec.step(t, 0.9, 0.0) for t in [4, 4, 4]]
        assert not any(hits)
        hits = [dec.step(t, 0.9, 0.0) for t in [0, 4, 0, 4]]
        assert any(hits)

    def test_detector_runs(self):
        det = WakeWordDetector.init_random([Keyword("kw", [3, 7], threshold=0.0)])
        audio = (0.2 * np.random.default_rng(0).standard_normal(16000)).astype(np.float32)
        hits = det.detect(audio)
        assert isinstance(hits, list)
        for name, t, score in hits:
            assert name == "kw" and t >= 0


class TestWakeWordSession:
    def _model(self):
        from qwen3_asr_swift_tpu.models.wakeword import Keyword, WakeWordDetector

        kws = [Keyword("hey tpu", [7, 9, 11], threshold=0.0)]
        return WakeWordDetector.init_random(kws)

    def test_single_push_matches_batch_detect(self):
        m = self._model()
        rng = np.random.default_rng(0)
        audio = (0.1 * rng.standard_normal(16000)).astype(np.float32)
        batch_hits = list(m.detect(audio))
        s = m.new_session()
        stream_hits = s.push(audio)
        assert [h[0] for h in stream_hits] == [h[0] for h in batch_hits]

    def test_chunked_pushes_carry_state(self):
        m = self._model()
        rng = np.random.default_rng(1)
        audio = (0.1 * rng.standard_normal(16000)).astype(np.float32)
        s = m.new_session()
        total = []
        for off in range(0, len(audio), 1111):
            total += s.push(audio[off:off + 1111])
        # frames progressed across pushes, tail stayed below one frame+hop
        assert s._frames_done > 0
        assert len(s._tail) < s.FRAME + s.HOP
        s.reset()
        assert s._frames_done == 0

    def test_tiny_pushes_buffer(self):
        m = self._model()
        s = m.new_session()
        assert s.push(np.zeros(100, np.float32)) == []
        assert len(s._tail) == 100


class TestStreamingEnhancer:
    def test_streamed_matches_batch_interior(self):
        """Chunked enhancement with carried state must reproduce the batch
        path on shared frames. The streamed output starts at the padded
        origin (includes the 480-sample reflect lead the batch trims) and
        differs only in the final window where the batch sees the right
        reflect pad."""
        from qwen3_asr_swift_tpu.models.enhancement import SpeechEnhancer
        from qwen3_asr_swift_tpu.models.enhancement.model import HOP, N_FFT, StreamingEnhancer

        model = SpeechEnhancer.init_random()
        rng = np.random.default_rng(0)
        t = HOP * 40  # 19200 samples = 0.4 s @48k
        audio = (0.1 * rng.standard_normal(t)).astype(np.float32)
        batch = model.enhance(audio, 48000).samples

        s = StreamingEnhancer(model, chunk_samples=HOP * 7)
        streamed = s.push(audio)
        streamed = np.concatenate([streamed, s.flush()])

        lead = HOP  # the batch trims the reflect lead; streaming emits it
        usable = min(len(batch), len(streamed) - lead) - N_FFT
        a = streamed[lead: lead + usable]
        b = batch[:usable]
        err = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
        assert err < 1e-3, f"interior mismatch {err}"

    def test_chunk_size_must_align(self):
        from qwen3_asr_swift_tpu.models.enhancement import SpeechEnhancer
        from qwen3_asr_swift_tpu.models.enhancement.model import StreamingEnhancer

        with pytest.raises(ValueError):
            StreamingEnhancer(SpeechEnhancer.init_random(), chunk_samples=333)

    def test_reset_and_reuse(self):
        from qwen3_asr_swift_tpu.models.enhancement import SpeechEnhancer
        from qwen3_asr_swift_tpu.models.enhancement.model import HOP, StreamingEnhancer

        model = SpeechEnhancer.init_random()
        s = StreamingEnhancer(model, chunk_samples=HOP * 4)
        audio = np.random.default_rng(1).standard_normal(HOP * 8).astype(np.float32)
        y1 = np.concatenate([s.push(audio), s.flush()])
        s.reset()
        y2 = np.concatenate([s.push(audio), s.flush()])
        assert np.allclose(y1, y2)

"""Mel frontend parity tests: the fused XLA kernel vs the step-by-step
numpy reference (the golden-fixture strategy — reference:
Tests/Qwen3ASRTests testFeatureExtractorWithSineWave and
Tests/SpeechWakeWordTests fbank bit-closeness)."""

import numpy as np
import pytest

from qwen3_asr_swift_tpu.ops.mel import (
    MelConfig,
    MelFrontend,
    log_mel_reference,
    mel_filterbank,
    num_frames,
    windowed_dft,
)


@pytest.fixture(scope="module")
def frontend():
    return MelFrontend()


def sine(freq, seconds, sr=16000, amp=0.5):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestFilterbank:
    def test_shape_and_partition(self):
        fb = mel_filterbank()
        assert fb.shape == (257, 128)
        assert fb.min() >= 0.0
        # Every mel filter must have some support.
        assert (fb.sum(axis=0) > 0).all()

    def test_slaney_breakpoint(self):
        from qwen3_asr_swift_tpu.ops.mel import hz_to_mel_slaney, mel_to_hz_slaney

        assert abs(hz_to_mel_slaney(np.array(1000.0)) - 15.0) < 1e-9
        assert abs(mel_to_hz_slaney(np.array(15.0)) - 1000.0) < 1e-6
        assert abs(hz_to_mel_slaney(np.array(200.0)) - 3.0) < 1e-9

    def test_dft_matrices_match_rfft(self):
        cos_m, sin_m = windowed_dft()
        rng = np.random.default_rng(0)
        frame = rng.standard_normal(400).astype(np.float32)
        window = 0.5 * (1 - np.cos(2 * np.pi * np.arange(400) / 400))
        ref = np.fft.rfft(frame * window, n=512)
        re = frame @ cos_m
        im = frame @ sin_m
        assert np.allclose(re, ref.real, atol=1e-2)
        assert np.allclose(im, ref.imag, atol=1e-2)


class TestLogMel:
    def test_frame_count_formula(self):
        cfg = MelConfig()
        # 1 s of audio: padded 16400 → (16400-400)/160+1 = 101 raw → 100 after drop
        assert num_frames(cfg, 16000) == 100
        assert num_frames(cfg, 16000 * 30) == 3000

    @pytest.mark.parametrize("seconds,freq", [(1.0, 440.0), (2.3, 1234.5)])
    def test_kernel_matches_reference(self, frontend, seconds, freq):
        audio = sine(freq, seconds)
        ours = frontend(audio)
        ref = log_mel_reference(audio)
        assert ours.shape == ref.shape == (128, num_frames(frontend.cfg, len(audio)))
        d = np.abs(ours - ref)
        # Bins with real energy must match tightly; bins at the silence clamp
        # floor may differ by fp32(DFT-matmul) vs fp64(FFT) leakage noise.
        assert d.max() < 2e-2
        energetic = ref > ref.min() + 0.05
        assert d[energetic].max() < 2e-3

    def test_noise_matches_reference(self, frontend):
        rng = np.random.default_rng(7)
        audio = (0.1 * rng.standard_normal(16000 + 321)).astype(np.float32)
        ours = frontend(audio)
        ref = log_mel_reference(audio)
        assert ours.shape == ref.shape
        assert np.max(np.abs(ours - ref)) < 2e-3

    def test_output_range(self, frontend):
        audio = sine(440.0, 1.0)
        out = frontend(audio)
        # (log10 clamped to max-8 then (x+4)/4) keeps a bounded dynamic range of 2.
        assert out.max() - out.min() <= 2.0 + 1e-5

    def test_sine_peak_bin(self, frontend):
        # Energy of a 440 Hz tone should concentrate in the mel band around 440.
        audio = sine(440.0, 1.0)
        out = frontend(audio)
        mean_per_mel = out.mean(axis=1)
        peak_mel = int(np.argmax(mean_per_mel))
        from qwen3_asr_swift_tpu.ops.mel import hz_to_mel_slaney, mel_to_hz_slaney

        mel_pts = np.linspace(0, hz_to_mel_slaney(np.array(8000.0)), 130)
        centers = mel_to_hz_slaney(mel_pts)[1:-1]
        assert abs(centers[peak_mel] - 440.0) < 120.0

    def test_bucketing_invariance(self):
        # Identical audio must produce identical valid frames regardless of
        # which frame-budget bucket the frontend compiles for.
        audio = sine(300.0, 0.9)
        fe_small = MelFrontend(buckets_s=(1, 30))
        fe_big = MelFrontend(buckets_s=(10, 30))
        out_small = fe_small(audio)
        out_big = fe_big(audio)
        assert out_small.shape == out_big.shape
        assert np.max(np.abs(out_small - out_big)) < 1e-5

    def test_short_audio(self, frontend):
        audio = sine(440.0, 0.05)  # 800 samples
        out = frontend(audio)
        assert out.shape[0] == 128 and out.shape[1] == num_frames(frontend.cfg, 800)

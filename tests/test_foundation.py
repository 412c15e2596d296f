"""Unit tests for the core foundation: types, WAV I/O, ring buffer,
resampler, hub hardening, quantization round-trip.

Mirrors the reference's unit tier: WAV parsing security tests
(reference: Tests/Qwen3ASRTests/SecurityHardeningTests.swift), download
path-traversal tests, PCM/resample helpers
(reference: Tests/AudioServerTests/WebSocketTests.swift:4-133).
"""

import struct

import numpy as np
import pytest

from qwen3_asr_swift_tpu.audio.io import WAVError, read_wav, wav_bytes, write_wav
from qwen3_asr_swift_tpu.audio.resample import resample, resample_jax
from qwen3_asr_swift_tpu.audio.ringbuffer import AudioRingBuffer
from qwen3_asr_swift_tpu.core.hub import sanitized_cache_key, validated_remote_file_name
from qwen3_asr_swift_tpu.core.types import to_float32, to_pcm16
from qwen3_asr_swift_tpu.core.weights import dequantize_mlx, quantize_mlx, unflatten, flatten


class TestWav:
    def test_roundtrip(self, tmp_path):
        sr = 16000
        t = np.arange(sr, dtype=np.float32) / sr
        sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        path = tmp_path / "tone.wav"
        write_wav(path, sig, sr)
        loaded, rate = read_wav(path)
        assert rate == sr
        assert len(loaded) == len(sig)
        assert np.max(np.abs(loaded - sig)) < 1e-3  # 16-bit quantization

    def test_wav_bytes_header(self):
        data = wav_bytes(np.zeros(10, dtype=np.float32), 16000)
        assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
        loaded, rate = read_wav(data)
        assert rate == 16000 and len(loaded) == 10

    def test_stereo_downmix(self, tmp_path):
        sr = 8000
        pcm = np.zeros(100 * 2, dtype=np.int16)
        pcm[0::2] = 10000   # L
        pcm[1::2] = -10000  # R
        body = pcm.tobytes()
        header = (
            b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 2, sr, sr * 4, 4, 16)
            + b"data" + struct.pack("<I", len(body))
        )
        loaded, rate = read_wav(header + body)
        assert rate == sr
        assert np.allclose(loaded, 0.0, atol=1e-4)

    def test_rejects_garbage(self):
        with pytest.raises(WAVError):
            read_wav(b"not a wav file at all, definitely not")

    def test_rejects_huge_chunk_size(self):
        # Malicious chunk size must not cause huge allocation
        header = (
            b"RIFF" + struct.pack("<I", 100) + b"WAVEfmt "
            + struct.pack("<I", 0xFFFFFFF0) + b"\x00" * 32
        )
        with pytest.raises(WAVError):
            read_wav(header)

    def test_truncated_data_chunk_clamped(self):
        sr = 8000
        pcm = np.ones(50, dtype=np.int16).tobytes()
        header = (
            b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
            + b"data" + struct.pack("<I", 100000)  # lies about size
        )
        loaded, _ = read_wav(header + pcm)
        assert len(loaded) == 50


class TestWavRegressions:
    def test_stereo_int16_downmix_scaled(self):
        """Multi-channel PCM must scale to [-1, 1] BEFORE downmixing —
        averaging integer channels first produced ±32768-range float."""
        import struct

        from qwen3_asr_swift_tpu.audio.io import read_wav

        left = np.full(100, 16384, np.int16)
        right = np.full(100, -16384, np.int16)
        pcm = np.stack([left, right], axis=1).tobytes()
        hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
               + struct.pack("<IHHIIHH", 16, 1, 2, 16000, 64000, 4, 16)
               + b"data" + struct.pack("<I", len(pcm)) + pcm)
        audio, rate = read_wav(hdr)
        assert rate == 16000
        assert np.abs(audio).max() <= 1.0
        np.testing.assert_allclose(audio, 0.0, atol=1e-4)  # L/R cancel

    def test_truncated_fmt_chunk_raises_waverror(self):
        import struct

        from qwen3_asr_swift_tpu.audio.io import WAVError, read_wav

        # fmt declares 16 bytes but the file ends 6 bytes in
        data = (b"RIFF" + struct.pack("<I", 100) + b"WAVEfmt "
                + struct.pack("<I", 16) + b"\x01\x00\x02\x00\x80\x3e")
        with pytest.raises(WAVError):
            read_wav(data)

    def test_partial_snapshot_not_treated_as_cached(self, tmp_path):
        """A lone config.json left by an interrupted download must not
        masquerade as a complete snapshot forever."""
        from qwen3_asr_swift_tpu.core.hub import _COMPLETE_MARKER, _have_local_snapshot

        snap = tmp_path / "m"
        snap.mkdir()
        (snap / "config.json").write_text("{}")
        pats = ("*.safetensors", "*.json")
        assert not _have_local_snapshot(snap, pats)
        (snap / "model.safetensors").write_bytes(b"x")  # pre-staged weights
        assert _have_local_snapshot(snap, pats)
        (snap / "model.safetensors").unlink()
        (snap / _COMPLETE_MARKER).touch()  # completed download marker
        assert _have_local_snapshot(snap, pats)

    def test_cjk_chunker_injects_no_spaces(self):
        from qwen3_asr_swift_tpu.core.text_chunker import chunk_text

        out = chunk_text("第一句话在这里。" * 30, max_chars=60)
        assert len(out) > 1
        assert all(" " not in c for c in out)
        # latin joins keep the space
        out = chunk_text("One sentence here. " * 20, max_chars=60)
        assert "here. One" in out[0]


class TestPcm:
    def test_int16_roundtrip(self):
        x = np.array([-32768, 0, 32767], dtype=np.int16)
        f = to_float32(x)
        assert f.dtype == np.float32
        assert f[0] == -1.0 and f[1] == 0.0
        back = to_pcm16(f)
        assert back[2] == 32766 or back[2] == 32767

    def test_clipping(self):
        assert to_pcm16(np.array([2.0], dtype=np.float32))[0] == 32767


class TestResample:
    def test_identity(self):
        x = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
        assert resample(x, 16000, 16000) is x

    def test_tone_preserved(self):
        sr_in, sr_out = 48000, 16000
        t = np.arange(sr_in, dtype=np.float64) / sr_in
        sig = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        out = resample(sig, sr_in, sr_out)
        assert abs(len(out) - sr_out) <= 2
        spec = np.abs(np.fft.rfft(out[: sr_out]))
        peak_hz = np.argmax(spec) * sr_out / sr_out
        assert abs(peak_hz - 440) < 5

    def test_jax_matches_scipy_shape(self):
        x = np.random.default_rng(1).standard_normal(4800).astype(np.float32)
        out_scipy = resample(x, 48000, 16000)
        out_jax = np.asarray(resample_jax(x, 48000, 16000))
        assert len(out_jax) == len(out_scipy)
        # Mid-band content should correlate strongly (different filters → not equal)
        c = np.corrcoef(out_scipy[10:-10], out_jax[10:-10])[0, 1]
        assert c > 0.98


class TestRingBuffer:
    def test_write_read(self):
        rb = AudioRingBuffer(8)
        rb.write(np.arange(5, dtype=np.float32))
        assert rb.available == 5
        out = rb.read(3)
        assert list(out) == [0, 1, 2]
        assert rb.available == 2

    def test_wraparound_overwrite(self):
        rb = AudioRingBuffer(4)
        rb.write(np.arange(6, dtype=np.float32))
        assert rb.available == 4
        assert list(rb.read(10)) == [2, 3, 4, 5]

    def test_peek_last(self):
        rb = AudioRingBuffer(10)
        rb.write(np.arange(7, dtype=np.float32))
        assert list(rb.peek_last(3)) == [4, 5, 6]
        assert rb.available == 7  # non-destructive


class TestHubHardening:
    def test_cache_key_sanitization(self):
        assert sanitized_cache_key("org/model") == "org/model"
        assert "/" not in sanitized_cache_key("../../etc").replace("etc", "")
        key = sanitized_cache_key("../evil/../../model")
        assert ".." not in key

    def test_remote_name_traversal_rejected(self):
        with pytest.raises(ValueError):
            validated_remote_file_name("../../../etc/passwd")
        with pytest.raises(ValueError):
            validated_remote_file_name("/etc/passwd")
        assert validated_remote_file_name("model.safetensors") == "model.safetensors"
        assert validated_remote_file_name("sub/dir/file.json") == "sub/dir/file.json"


class TestQuantization:
    @pytest.mark.parametrize("bits", [4, 8])
    def test_mlx_quant_roundtrip(self, bits):
        rng = np.random.default_rng(42)
        w = rng.standard_normal((32, 128)).astype(np.float32)
        packed, scales, biases = quantize_mlx(w, bits=bits, group_size=64)
        assert packed.dtype == np.uint32
        assert packed.shape == (32, 128 * bits // 32)
        deq = dequantize_mlx(packed, scales, biases, bits=bits, group_size=64)
        # Max quantization error is bounded by half a step per group.
        steps = (1 << bits) - 1
        group_range = (w.reshape(32, 2, 64).max(-1) - w.reshape(32, 2, 64).min(-1))
        max_err = (group_range / steps).max() * 0.5 + 1e-6
        assert np.abs(deq - w).max() <= max_err * 1.01


class TestTreeUtils:
    def test_flatten_unflatten(self):
        flat = {"a.b.c": np.zeros(1), "a.b.d": np.ones(1), "e": np.ones(2)}
        tree = unflatten(flat)
        assert set(tree) == {"a", "e"}
        assert set(flatten(tree)) == set(flat)


class TestObservabilityHelpers:
    def test_profile_trace_writes_and_times(self, tmp_path):
        import jax.numpy as jnp

        from qwen3_asr_swift_tpu.core.logging import profile_trace

        d = str(tmp_path / "trace")
        with profile_trace(d, "unit"):
            (jnp.ones((16, 16)) @ jnp.ones((16, 16))).block_until_ready()
        import os

        assert os.path.isdir(d)

    def test_enable_persistent_cache_sets_config(self, tmp_path):
        import jax

        from qwen3_asr_swift_tpu.core import enable_persistent_cache

        enable_persistent_cache(str(tmp_path / "cc"))
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")

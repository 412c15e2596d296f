"""E2E tier: real-weights tests, skipped unless checkpoints are cached.

Mirrors the reference's central two-tier convention (reference:
AGENTS.md:104-121 — classes prefixed E2E download real weights and assert
semantic output; CI skips them).  Here every test calls
``conftest.require_weights`` and is skipped (the XCTSkip pattern,
E2EQwen3ASRGreedyDeterminismTests.swift:20-22) when the snapshot is not in
the local cache; with cached weights each test exercises the family's real
``from_pretrained`` → convert → inference path.

Greedy-determinism / exact-transcript anchors follow
Tests/Qwen3ASRTests/E2EQwen3ASRGreedyDeterminismTests.swift:31-61 — the
reference locks the transcript "Can you guarantee that the replacement
part will be shipped tomorrow?" for its fixture clip; set
``QWEN3_E2E_WAV`` / ``QWEN3_E2E_TRANSCRIPT`` to pin the same kind of
snapshot here.
"""

import os

import numpy as np
import pytest

from conftest import require_weights

REFERENCE_FIXTURE_TRANSCRIPT = (
    "Can you guarantee that the replacement part will be shipped tomorrow?"
)


def _speechish(seconds=3.0, sr=16000, seed=0):
    """Synthetic voiced-ish audio (harmonic stack with AM) — enough to make
    real models produce non-degenerate, deterministic outputs."""
    r = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    f0 = 120 + 20 * np.sin(2 * np.pi * 2.1 * t)
    sig = sum(np.sin(2 * np.pi * f0 * k * t + r.uniform(0, 2 * np.pi)) / k
              for k in (1, 2, 3, 4))
    am = 0.6 + 0.4 * np.clip(np.sin(2 * np.pi * 3.0 * t), 0, 1)
    return (0.2 * am * sig).astype(np.float32)


class TestE2EQwen3ASR:
    MODEL_ID = "mlx-community/Qwen3-ASR-0.6B-4bit"

    def test_greedy_determinism(self):
        require_weights(self.MODEL_ID)
        import jax.numpy as jnp

        from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR

        model = Qwen3ASR.from_pretrained(self.MODEL_ID, dtype=jnp.bfloat16)
        audio = _speechish()
        a = model.transcribe(audio).text
        b = model.transcribe(audio).text
        assert a == b  # the asyncEval-bit-exactness invariant, greedy decode

    def test_exact_transcript_snapshot(self):
        require_weights(self.MODEL_ID)
        wav = os.environ.get("QWEN3_E2E_WAV")
        if not wav or not os.path.exists(wav):
            pytest.skip("set QWEN3_E2E_WAV to the reference fixture clip")
        import jax.numpy as jnp

        from qwen3_asr_swift_tpu.audio.io import load_audio
        from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR

        model = Qwen3ASR.from_pretrained(self.MODEL_ID, dtype=jnp.bfloat16)
        samples, rate = load_audio(wav)
        text = model.transcribe(samples, sample_rate=rate).text
        expected = os.environ.get("QWEN3_E2E_TRANSCRIPT", REFERENCE_FIXTURE_TRANSCRIPT)
        assert text == expected

    def test_int4_matches_dequantized(self):
        """int4 packed decode ≡ dequantized fp decode on real weights
        (the quantized-matmul correctness anchor)."""
        d = require_weights(self.MODEL_ID)
        import jax.numpy as jnp

        from qwen3_asr_swift_tpu.core.weights import load_safetensors
        from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR
        from qwen3_asr_swift_tpu.models.qwen3_asr.config import detect_config
        from qwen3_asr_swift_tpu.models.qwen3_asr.convert import (
            convert_decoder,
            convert_encoder,
        )
        from qwen3_asr_swift_tpu.tokenizers.bpe import BPETokenizer

        audio = _speechish(seconds=2.0)
        cfg = detect_config(self.MODEL_ID)
        flat = load_safetensors(d)
        tok = BPETokenizer.from_pretrained_dir(d)
        enc = convert_encoder(flat, cfg)
        packed = Qwen3ASR(cfg, enc, convert_decoder(flat, cfg, keep_quantized=True),
                          tokenizer=tok, dtype=jnp.bfloat16)
        deq = Qwen3ASR(cfg, enc, convert_decoder(flat, cfg, keep_quantized=False),
                       tokenizer=tok, dtype=jnp.bfloat16)
        assert packed.transcribe(audio).text == deq.transcribe(audio).text


class TestE2EConverts:
    """Every family's real checkpoint must load through its converter and
    run one inference — the gate that the key mappings match the published
    repos, not just our synthetic replicas."""

    def test_silero_vad(self):
        d = require_weights("onnx-community/silero-vad")
        from qwen3_asr_swift_tpu.models.silero_vad import SileroVAD

        m = SileroVAD.from_pretrained(str(d))
        probs = m.speech_probabilities(_speechish())
        assert len(probs) and np.isfinite(probs).all()

    def test_parakeet(self):
        d = require_weights("mlx-community/parakeet-tdt-0.6b-v2")
        import jax.numpy as jnp

        from qwen3_asr_swift_tpu.models.parakeet.model import ParakeetASR

        m = ParakeetASR.from_pretrained(str(d), dtype=jnp.bfloat16)
        r = m.transcribe(_speechish())
        assert isinstance(r.text, str)

    def test_enhancement_dfn3(self):
        d = require_weights("aufklarer/DeepFilterNet3")
        from qwen3_asr_swift_tpu.models.enhancement import SpeechEnhancer

        m = SpeechEnhancer.from_pretrained(str(d))
        out = m.enhance(_speechish(sr=48000, seconds=1.0), 48000)
        assert np.isfinite(out.samples).all()

    def test_firered_vad(self):
        d = require_weights("aufklarer/FireRedVAD")
        from qwen3_asr_swift_tpu.models.firered_vad import FireRedVAD

        m = FireRedVAD.from_pretrained(str(d))
        probs = m.frame_probabilities(_speechish())
        assert len(probs) and np.isfinite(probs).all()

    def test_sortformer(self):
        d = require_weights("nvidia/diar_streaming_sortformer_4spk-v2")
        from qwen3_asr_swift_tpu.models.diarization import SortformerDiarizer

        m = SortformerDiarizer.from_pretrained(str(d))
        segs = m.diarize(_speechish(seconds=8.0))
        assert isinstance(segs, list)

    def test_campplus(self):
        d = require_weights("iic/speech_campplus_sv_zh-cn_16k-common")
        from qwen3_asr_swift_tpu.models.speaker import CampPlusSpeaker

        m = CampPlusSpeaker.from_pretrained(str(d))
        e = m.embed(_speechish())
        assert e.shape == (192,) and np.isfinite(e).all()

    def test_kokoro(self):
        d = require_weights("hexgrad/Kokoro-82M")
        from qwen3_asr_swift_tpu.models.kokoro import KokoroTTS

        m = KokoroTTS.from_pretrained(str(d))
        out = m.synthesize("hello world")
        assert len(out.samples) > 1000 and np.isfinite(out.samples).all()

    def test_cosyvoice(self):
        d = require_weights("FunAudioLLM/CosyVoice3-0.5B")
        from qwen3_asr_swift_tpu.models.cosyvoice import CosyVoiceTTS

        m = CosyVoiceTTS.from_pretrained(str(d))
        out = m.synthesize("hello")
        assert np.isfinite(out.samples).all()

    def test_voxcpm2(self):
        d = require_weights("openbmb/VoxCPM2")
        from qwen3_asr_swift_tpu.models.voxcpm2 import VoxCPM2TTS

        m = VoxCPM2TTS.from_pretrained(str(d))
        out = m.synthesize("hello", max_tokens=20)
        assert np.isfinite(out.samples).all()

    def test_personaplex_mimi(self):
        d = require_weights("kyutai/moshiko-pytorch-bf16")
        import jax.numpy as jnp

        from qwen3_asr_swift_tpu.core.weights import load_safetensors
        from qwen3_asr_swift_tpu.models.personaplex import MimiConfig
        from qwen3_asr_swift_tpu.models.personaplex.convert import convert_mimi_tree
        from qwen3_asr_swift_tpu.models.personaplex.mimi import mimi_decode, mimi_encode

        cfg = MimiConfig()
        params = convert_mimi_tree(load_safetensors(d), cfg)
        audio = jnp.asarray(_speechish(sr=24000, seconds=1.0))[None]
        codes = mimi_encode(params, cfg, audio)
        out = np.asarray(mimi_decode(params, cfg, codes))
        assert np.isfinite(out).all()


class TestE2EQuality:
    """WER measurement hook (reference publishes 3.34% on LibriSpeech
    test-clean for 0.6B 4-bit — docs/benchmarks/asr-wer.md:16).  Gated on
    both the checkpoint and a local LibriSpeech sample dir."""

    def test_librispeech_wer_smoke(self):
        require_weights(TestE2EQwen3ASR.MODEL_ID)
        ls_dir = os.environ.get("LIBRISPEECH_DIR")
        if not ls_dir or not os.path.isdir(ls_dir):
            pytest.skip("set LIBRISPEECH_DIR to a LibriSpeech test-clean subset")
        import subprocess
        import sys

        r = subprocess.run(
            [sys.executable, "scripts/benchmark_asr_wer.py", "--data", ls_dir,
             "--limit", "16"],
            capture_output=True, text=True, timeout=1800)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "wer" in r.stdout.lower()


class TestE2EConvertsMore:
    """Remaining families' real-checkpoint load gates."""

    def test_qwen3_tts(self):
        d = require_weights("aufklarer/Qwen3-TTS-0.6B-MLX-4bit")
        import jax.numpy as jnp

        from qwen3_asr_swift_tpu.models.qwen3_tts import Qwen3TTS

        m = Qwen3TTS.from_pretrained(str(d), dtype=jnp.bfloat16)
        out = m.synthesize("hello there", max_frames=50)
        assert len(out.samples) > 1000 and np.isfinite(out.samples).all()

    def test_chat(self):
        d = require_weights("mlx-community/Qwen3.5-0.8B-4bit")
        import jax.numpy as jnp

        from qwen3_asr_swift_tpu.models.chat import Qwen3Chat

        import itertools

        m = Qwen3Chat.from_pretrained(str(d), dtype=jnp.bfloat16)
        pieces = list(itertools.islice(
            m.chat([{"role": "user", "content": "Say hi."}]), 16))
        assert pieces and all(isinstance(t, str) for t in pieces)

    def test_translation(self):
        d = require_weights("mlx-community/madlad400-3b-mt-4bit")
        import jax.numpy as jnp

        from qwen3_asr_swift_tpu.models.translation import MADLADTranslator

        m = MADLADTranslator.from_pretrained(str(d), dtype=jnp.bfloat16)
        out = m.translate("hello world", target_lang="de")
        assert isinstance(out, str) and out

    def test_omnilingual(self):
        d = require_weights("facebook/omnilingual-asr-300m")
        from qwen3_asr_swift_tpu.models.omnilingual import OmnilingualASR

        m = OmnilingualASR.from_pretrained(str(d))
        r = m.transcribe(_speechish())
        assert isinstance(r.text, str)

    def test_pyannote(self):
        d = require_weights("pyannote/segmentation-3.0")
        from qwen3_asr_swift_tpu.models.pyannote import PyannoteSegmentation

        m = PyannoteSegmentation.from_pretrained(str(d))
        tracks = m.speaker_activity(_speechish(seconds=5.0))
        assert tracks.shape[1] >= 1 and np.isfinite(tracks).all()

    def test_wespeaker(self):
        d = require_weights("wespeaker/resnet34")
        from qwen3_asr_swift_tpu.models.speaker import WeSpeaker

        m = WeSpeaker.from_pretrained(str(d))
        e = m.embed(_speechish())
        assert len(e) >= 128 and np.isfinite(e).all()

    def test_separation(self):
        d = require_weights("open-unmix/umxhq")
        from qwen3_asr_swift_tpu.models.separation import SourceSeparator

        m = SourceSeparator.from_pretrained(str(d))
        audio = np.stack([_speechish(sr=44100)] * 2)
        stems = m.separate(audio, 44100)
        assert set(stems) >= {"vocals"}

    def test_vibevoice(self):
        d = require_weights("microsoft/VibeVoice-Realtime-0.5B")
        import jax.numpy as jnp

        from qwen3_asr_swift_tpu.models.vibevoice import VibeVoiceTTS

        m = VibeVoiceTTS.from_pretrained(str(d), dtype=jnp.bfloat16)
        out = m.synthesize("hello", max_frames=20)
        assert np.isfinite(out.samples).all()

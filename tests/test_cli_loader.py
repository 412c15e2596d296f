"""CLI smoke tests (--random-weights path), ModelLoader group/progress
semantics, MemoryTier ladder, and text chunker behavior."""

import json

import numpy as np
import pytest

from qwen3_asr_swift_tpu.core import (
    MemoryTier,
    ModelLoader,
    ModelSpec,
    can_fit,
    chunk_text,
)


class TestTextChunker:
    def test_short_passthrough(self):
        assert chunk_text("hello world") == ["hello world"]

    def test_empty(self):
        assert chunk_text("  ") == []

    def test_sentence_boundaries_respected(self):
        text = "First sentence here. Second one follows. Third closes it."
        chunks = chunk_text(text, max_chars=30)
        assert all(len(c) <= 30 for c in chunks)
        assert " ".join(chunks) == text

    def test_long_unbroken_sentence_splits_on_words(self):
        text = "word " * 100
        chunks = chunk_text(text.strip(), max_chars=40)
        assert all(len(c) <= 40 for c in chunks)
        assert " ".join(chunks) == text.strip()

    def test_cjk_punctuation(self):
        text = "第一句话。第二句话。"
        chunks = chunk_text(text, max_chars=6)
        assert chunks == ["第一句话。", "第二句话。"]


class TestModelLoader:
    def test_parallel_group0_sequential_group1(self):
        order = []

        def make(name, group):
            def load(progress):
                progress(0.5, "halfway")
                order.append(name)
                return name.upper()

            return ModelSpec(name, load, weight=1.0, group=group)

        events = []
        result = ModelLoader.load(
            [make("vad", 0), make("stt", 0), make("tts", 1)],
            progress_handler=lambda frac, msg: events.append((frac, msg)),
        )
        assert result == {"vad": "VAD", "stt": "STT", "tts": "TTS"}
        assert order[-1] == "tts"  # group 1 strictly after group 0
        assert events[-1] == (1.0, "all models ready")
        fracs = [f for f, _ in events]
        assert all(0 <= f <= 1 for f in fracs)

    def test_error_propagates(self):
        def boom(progress):
            raise ValueError("nope")

        with pytest.raises(RuntimeError, match="failed to load bad"):
            ModelLoader.load([ModelSpec("bad", boom)])

    def test_spec_presets(self):
        spec = ModelSpec.tts(lambda p: None)
        assert spec.group == 1 and spec.name == "tts"
        assert ModelSpec.vad(lambda p: None).group == 0


class TestMemoryTier:
    def test_ladder(self):
        assert MemoryTier.detect(4 << 30) is MemoryTier.LOW
        assert MemoryTier.detect(12 << 30) is MemoryTier.MEDIUM
        assert MemoryTier.detect(24 << 30) is MemoryTier.HIGH
        assert MemoryTier.detect(64 << 30) is MemoryTier.MAX

    def test_model_ids(self):
        for tier in MemoryTier:
            assert tier.asr_model_id.startswith("aufklarer/")

    def test_can_fit(self):
        assert can_fit(1 << 20)
        assert not can_fit(1 << 50)


@pytest.fixture()
def wav_file(tmp_path):
    from qwen3_asr_swift_tpu.audio.io import write_wav

    path = tmp_path / "in.wav"
    t = np.linspace(0, 1.0, 16000, endpoint=False)
    write_wav(str(path), (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), 16000)
    return str(path)


class TestCLI:
    """Each command runs end-to-end with --random-weights (tiny configs)."""

    def run(self, capsys, *argv):
        from qwen3_asr_swift_tpu.cli import main

        main(list(argv))
        return capsys.readouterr().out

    def test_vad(self, capsys, wav_file):
        out = self.run(capsys, "vad", wav_file, "--random-weights")
        json.loads(out)

    def test_embed_speaker(self, capsys, wav_file):
        out = self.run(capsys, "embed-speaker", wav_file, "--random-weights")
        assert json.loads(out)["dim"] > 0

    def test_translate(self, capsys):
        out = self.run(capsys, "translate", "hello", "--random-weights")
        assert "ids" in json.loads(out)

    def test_wake(self, capsys, wav_file):
        out = self.run(capsys, "wake", wav_file, "--random-weights",
                       "--keywords", "hey tpu")
        json.loads(out)

    def test_vibevoice_encode_voice(self, capsys, wav_file, tmp_path):
        out = self.run(capsys, "vibevoice-encode-voice", wav_file, "--random-weights",
                       "--output", str(tmp_path / "voice.npz"))
        assert "voice_cache" in json.loads(out)

    def test_kokoro(self, capsys, tmp_path):
        out_wav = str(tmp_path / "k.wav")
        out = self.run(capsys, "kokoro", "hi there", "--random-weights",
                       "--output", out_wav)
        assert json.loads(out)["seconds"] >= 0

    def test_parser_covers_reference_subcommands(self):
        from qwen3_asr_swift_tpu.cli import build_parser

        parser = build_parser()
        sub = next(a for a in parser._actions
                   if a.__class__.__name__ == "_SubParsersAction")
        commands = set(sub.choices)
        # the reference's 17 subcommands (AudioCLI.swift:3-29), with
        # qwen3-tts-coreml folded into qwen3-tts, plus serve/chat
        expected = {"transcribe", "transcribe-batch", "align", "speak", "respond",
                    "vad", "vad-stream", "diarize", "embed-speaker", "denoise",
                    "separate", "kokoro", "qwen3-tts", "vibevoice",
                    "vibevoice-encode-voice", "translate", "wake", "serve", "chat",
                    "qwen3-tts-coreml", "voxcpm2"}
        assert expected <= commands

    def test_tier_model_ladders(self):
        assert MemoryTier.LOW.tts_model_id.startswith("hexgrad/")
        assert "1.7B" in MemoryTier.MAX.tts_model_id
        assert MemoryTier.LOW.s2s_model_id is None
        assert MemoryTier.MAX.s2s_model_id is not None
        for tier in MemoryTier:
            assert tier.vad_model_id


class TestCLIRemaining:
    """Smoke the subcommands not covered above (every one of the 19 ends
    up exercised end-to-end with --random-weights)."""

    def run(self, capsys, *argv):
        from qwen3_asr_swift_tpu.cli import main

        main(list(argv))
        return capsys.readouterr().out

    def test_transcribe(self, capsys, wav_file):
        out = self.run(capsys, "transcribe", wav_file, "--random-weights",
                       "--max-tokens", "3")
        assert "text" in json.loads(out)

    def test_transcribe_batch(self, capsys, wav_file):
        out = self.run(capsys, "transcribe-batch", wav_file, wav_file,
                       "--random-weights", "--max-tokens", "3")
        assert len(json.loads(out)) == 2

    def test_align(self, capsys, wav_file):
        out = self.run(capsys, "align", wav_file, "hello world", "--random-weights")
        words = json.loads(out)
        assert all("start" in w and "end" in w for w in words)

    def test_speak_and_qwen3_tts(self, capsys, tmp_path):
        out = self.run(capsys, "speak", "hi", "--random-weights",
                       "--output", str(tmp_path / "s.wav"))
        assert json.loads(out)["seconds"] >= 0

    def test_vad_stream(self, capsys, wav_file):
        self.run(capsys, "vad-stream", wav_file, "--random-weights")

    def test_diarize(self, capsys, wav_file):
        out = self.run(capsys, "diarize", wav_file, "--random-weights")
        json.loads(out)

    def test_denoise(self, capsys, wav_file, tmp_path):
        out = self.run(capsys, "denoise", wav_file, "--random-weights",
                       "--output", str(tmp_path / "d.wav"))
        assert "output" in json.loads(out)

    def test_separate(self, capsys, wav_file, tmp_path):
        out = self.run(capsys, "separate", wav_file, "--random-weights",
                       "--output-prefix", str(tmp_path / "stem"))
        assert len(json.loads(out)) >= 1

    def test_chat(self, capsys):
        self.run(capsys, "chat", "hello", "--random-weights")

    def test_vibevoice(self, capsys, tmp_path):
        out = self.run(capsys, "vibevoice", "hi", "--random-weights",
                       "--output", str(tmp_path / "v.wav"))
        assert "seconds" in json.loads(out)

    def test_voxcpm2(self, capsys, tmp_path):
        out = self.run(capsys, "voxcpm2", "hi", "--random-weights",
                       "--output", str(tmp_path / "x.wav"))
        assert "seconds" in json.loads(out)

    def test_respond(self, capsys, tmp_path):
        from qwen3_asr_swift_tpu.audio.io import write_wav

        path = str(tmp_path / "u.wav")
        write_wav(path, np.zeros(2048, np.float32), 24000)
        out = self.run(capsys, "respond", path, "--random-weights",
                       "--output", str(tmp_path / "r.wav"))
        assert "seconds" in json.loads(out)

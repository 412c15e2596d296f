"""Voice pipeline engine tests: builds the C++ library, drives the full
VAD→STT→LLM→TTS turn loop with fake models, exercises barge-in, tool
calls with cooldown, push_text, and state transitions."""

import queue
import shutil
import time

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="needs g++")

from qwen3_asr_swift_tpu.pipeline import (  # noqa: E402
    PipelineConfig,
    PipelineEventType,
    PipelineState,
    VoicePipeline,
    tool_call,
)


def fake_vad(threshold=0.05):
    def vad(chunk):
        return 0.9 if np.abs(chunk).mean() > threshold else 0.05

    return vad


def wait_for(pipeline, etype, timeout=10.0):
    # Pull one event at a time: draining in bulk and returning early would
    # silently discard events that arrived in the same burst.
    deadline = time.time() + timeout
    seen = []
    while time.time() < deadline:
        try:
            ev = pipeline.events.get(timeout=0.1)
        except queue.Empty:
            continue
        seen.append(ev)
        if ev.type == etype:
            return ev, seen
    raise AssertionError(f"no {etype} within {timeout}s; saw {[e.type for e in seen]}")


def make_pipeline(**kw):
    cfg = PipelineConfig(min_speech_s=0.05, min_silence_s=0.1, pre_speech_s=0.1,
                         tool_cooldown_s=0.5, eager_stt=False)
    defaults = dict(
        vad=fake_vad(),
        stt=lambda audio: f"heard {len(audio)}",
        llm=lambda text: f"reply to [{text}]",
        tts=lambda text: np.zeros(8000, np.int16),
        config=cfg,
    )
    defaults.update(kw)
    return VoicePipeline(**defaults)


SPEECH = (0.5 * np.ones(512 * 12)).astype(np.float32)
SILENCE = np.zeros(512 * 12, np.float32)


class TestEngine:
    def test_full_turn(self):
        with make_pipeline() as p:
            assert p.is_running
            p.push_audio(SPEECH)
            wait_for(p, PipelineEventType.SPEECH_STARTED)
            p.push_audio(SILENCE)
            ev, _ = wait_for(p, PipelineEventType.FINAL_TRANSCRIPT)
            assert ev.text.startswith("heard ")
            ev, _ = wait_for(p, PipelineEventType.RESPONSE_TEXT)
            assert ev.text.startswith("reply to [heard")
            ev, _ = wait_for(p, PipelineEventType.AUDIO_CHUNK)
            assert ev.pcm is not None and len(ev.pcm) > 0
        assert not p.is_running

    def test_push_text_bypasses_stt(self):
        with make_pipeline() as p:
            p.push_text("typed input")
            ev, _ = wait_for(p, PipelineEventType.RESPONSE_TEXT)
            assert ev.text == "reply to [typed input]"

    def test_echo_mode_without_llm(self):
        with make_pipeline(llm=None) as p:
            p.push_text("echo me")
            ev, _ = wait_for(p, PipelineEventType.RESPONSE_TEXT)
            assert ev.text == "echo me"

    def test_tool_call_and_cooldown(self):
        with make_pipeline(llm=lambda text: tool_call("lights", "on")) as p:
            p.add_tool("lights", "control lights")
            p.push_text("turn on the lights")
            ev, _ = wait_for(p, PipelineEventType.TOOL_CALL)
            assert ev.text == "lights" and ev.aux == "on"
            # immediate second call hits the cooldown → error event
            p.push_text("again")
            ev, _ = wait_for(p, PipelineEventType.ERROR)
            assert "cooldown" in ev.aux
            # after cooldown expires it works again
            time.sleep(0.6)
            p.push_text("once more")
            wait_for(p, PipelineEventType.TOOL_CALL)

    def test_unknown_tool_rejected(self):
        with make_pipeline(llm=lambda text: tool_call("nuke", "now")) as p:
            p.push_text("hi")
            ev, _ = wait_for(p, PipelineEventType.ERROR)
            assert ev.text == "nuke"

    def test_transcribe_only_mode(self):
        # no TTS, no LLM → final transcript then back to listening
        with make_pipeline(llm=None, tts=None) as p:
            p.push_audio(SPEECH)
            p.push_audio(SILENCE)
            wait_for(p, PipelineEventType.FINAL_TRANSCRIPT)
            deadline = time.time() + 5
            while time.time() < deadline and p.state != PipelineState.LISTENING:
                time.sleep(0.05)
            assert p.state == PipelineState.LISTENING

    def test_state_property(self):
        p = make_pipeline()
        assert p.state == PipelineState.IDLE
        p.start()
        time.sleep(0.2)
        assert p.state == PipelineState.LISTENING
        p.stop()
        p.close()


class TestRealModelAdapters:
    """Drive the C++ engine with REAL (tiny random) JAX models, covering
    the protocol-object adapter branches in engine.py (_vad_cb
    process_chunk path, _stt_cb transcribe path, _tts_cb synthesize path,
    _llm_cb chat path)."""

    def test_full_stack_with_tiny_models(self):
        import jax.numpy as jnp

        from qwen3_asr_swift_tpu.models.kokoro import KokoroTTS
        from qwen3_asr_swift_tpu.models.kokoro import config_tiny as kokoro_tiny
        from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR
        from qwen3_asr_swift_tpu.models.qwen3_asr import config_tiny as asr_tiny
        from qwen3_asr_swift_tpu.models.silero_vad import SileroVAD
        from qwen3_asr_swift_tpu.tokenizers.bpe import BPETokenizer, _bytes_to_unicode

        b2u = _bytes_to_unicode()
        tok = BPETokenizer({ch: i for i, ch in enumerate(b2u[b] for b in range(256))}, [])

        class DeterministicVAD(SileroVAD):
            """Runs the real jitted Silero chunk program (exercising the
            process_chunk adapter), but random weights give arbitrary
            probabilities — overlay an energy decision for the test."""

            def process_chunk(self, state, samples):
                state, _ = super().process_chunk(state, samples)
                return state, (0.9 if np.abs(samples).mean() > 0.05 else 0.05)

        vad = DeterministicVAD.init_random()
        stt = Qwen3ASR.init_random(asr_tiny(), dtype=jnp.float32, tokenizer=tok,
                                   audio_buckets_s=(8,))
        tts = KokoroTTS.init_random(kokoro_tiny())

        class EchoLLM:
            def chat(self, messages, tools=()):
                yield "ok: "
                yield messages[-1]["content"][:20]

        cfg = PipelineConfig(min_speech_s=0.05, min_silence_s=0.1, pre_speech_s=0.1,
                             vad_onset=0.3, vad_offset=0.2, eager_stt=True)
        with VoicePipeline(stt=stt, tts=tts, vad=vad, llm=EchoLLM(), config=cfg) as p:
            rng = np.random.default_rng(0)
            p.push_audio((0.5 * rng.standard_normal(512 * 16)).astype(np.float32))
            p.push_audio(np.zeros(512 * 16, np.float32))
            ev, seen = wait_for(p, PipelineEventType.FINAL_TRANSCRIPT, timeout=120)
            assert ev.text is not None
            ev, _ = wait_for(p, PipelineEventType.RESPONSE_TEXT, timeout=120)
            assert ev.text.startswith("ok: ")
            ev, _ = wait_for(p, PipelineEventType.AUDIO_CHUNK, timeout=120)
            assert ev.pcm is not None and ev.pcm.dtype == np.int16

    def test_eager_stt_emits_partial(self):
        cfg = PipelineConfig(min_speech_s=0.05, min_silence_s=0.4, pre_speech_s=0.1,
                             eager_stt=True)
        with VoicePipeline(vad=fake_vad(), stt=lambda a: f"heard {len(a)}",
                           llm=None, tts=None, config=cfg) as p:
            p.push_audio(SPEECH)
            wait_for(p, PipelineEventType.SPEECH_STARTED)
            p.push_audio(np.zeros(512 * 20, np.float32))
            ev, _ = wait_for(p, PipelineEventType.PARTIAL_TRANSCRIPT)
            assert ev.text.startswith("heard ")
            ev, _ = wait_for(p, PipelineEventType.FINAL_TRANSCRIPT)
            assert ev.text == ev.text  # final follows the partial


class TestBargeIn:
    def test_speech_during_speaking_interrupts(self):
        """Audio queued while the engine speaks is drained through VAD
        between TTS chunks; an onset raises INTERRUPTED and truncates the
        emission (the advertised barge-in path)."""
        cfg = PipelineConfig(min_speech_s=0.05, min_silence_s=0.1,
                             pre_speech_s=0.1, eager_stt=False,
                             allow_interruption=True, speak_chunk=2048)
        with VoicePipeline(vad=fake_vad(), stt=lambda a: "hi",
                           llm=lambda t: "a long reply",
                           tts=lambda t: np.zeros(320000, np.int16),  # ~156 chunks
                           config=cfg) as p:
            # text first: if audio were pushed before the text turn, the
            # engine could consume it as a user utterance in LISTENING
            # before the turn starts (race). Pushed right after, it queues
            # during THINKING/SPEAKING and the speaking loop drains it.
            p.push_text("user turn")
            p.push_audio(SPEECH)
            ev, seen = wait_for(p, PipelineEventType.INTERRUPTED, timeout=20)
            chunks = [e for e in seen if e.type == PipelineEventType.AUDIO_CHUNK]
            assert len(chunks) < 156  # emission was truncated

    def test_no_interruption_when_disabled(self):
        cfg = PipelineConfig(min_speech_s=0.05, min_silence_s=0.1,
                             pre_speech_s=0.1, eager_stt=False,
                             allow_interruption=False, speak_chunk=4096)
        with VoicePipeline(vad=fake_vad(), stt=lambda a: "hi",
                           llm=lambda t: "reply",
                           tts=lambda t: np.zeros(40960, np.int16),  # 10 chunks
                           config=cfg) as p:
            p.push_text("user turn")
            p.push_audio(SPEECH)
            deadline = time.time() + 10
            chunks, interrupted = 0, False
            while time.time() < deadline and chunks < 10:
                try:
                    ev = p.events.get(timeout=0.1)
                except queue.Empty:
                    continue
                if ev.type == PipelineEventType.AUDIO_CHUNK:
                    chunks += 1
                if ev.type == PipelineEventType.INTERRUPTED:
                    interrupted = True
            assert chunks == 10 and not interrupted


class TestTurnAudioIntegrity:
    def test_transcribe_only_emits_no_errors(self):
        """transcribe-only mode (no llm/tts) must not emit spurious ERROR
        events ('tts failed') after each turn — absent models pass NULL
        callbacks so the engine takes its optional paths."""
        with make_pipeline(llm=None, tts=None) as p:
            p.push_audio(SPEECH)
            p.push_audio(SILENCE)
            _, seen = wait_for(p, PipelineEventType.FINAL_TRANSCRIPT)
            time.sleep(0.5)
            try:
                while True:
                    seen.append(p.events.get_nowait())
            except queue.Empty:
                pass
            errors = [e for e in seen if e.type == PipelineEventType.ERROR]
            assert not errors, [e.aux for e in errors]

    def test_onset_chunk_not_duplicated(self):
        """The utterance passed to STT starts with the pre-speech ring,
        which already ends with the onset chunk — it must not be appended
        twice (an audible ~32 ms stutter at every turn start)."""
        lens = []
        with make_pipeline(stt=lambda a: (lens.append(len(a)), "t")[1],
                           llm=None, tts=None) as p:
            p.push_audio(SPEECH)
            p.push_audio(SILENCE)
            wait_for(p, PipelineEventType.FINAL_TRANSCRIPT)
        assert lens, "stt never called"
        # 12 loud chunks (onset chunk arrives via the pre-speech ring,
        # capped at 0.1 s = 3 chunks) + the quiet chunks of the silence
        # confirmation window; a duplicated onset chunk would add 512
        assert lens[0] % 512 == 0
        n_chunks = lens[0] // 512
        assert n_chunks <= 12 + 4  # never more than pushed speech + tail

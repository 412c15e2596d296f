"""Voice-agent demo: the C++ pipeline engine driving VAD→STT→LLM→TTS.

Analog of the reference's SpeechDemo / iOSEchoDemo apps (reference:
Examples/SpeechDemo — VoicePipeline with real models). Models here are
pluggable; by default tiny random-weight stand-ins demonstrate the event
flow, including a tool call.

    python examples/voice_agent_demo.py [audio.wav]
"""

import sys
import time

import numpy as np

from qwen3_asr_swift_tpu.pipeline import (
    PipelineConfig,
    PipelineEventType,
    VoicePipeline,
    tool_call,
)


def energy_vad(chunk: np.ndarray) -> float:
    return 0.95 if np.abs(chunk).mean() > 0.02 else 0.05


def fake_stt(audio: np.ndarray) -> str:
    return f"utterance of {len(audio) / 16000:.2f}s"


def fake_llm(text: str) -> str:
    if "light" in text:
        return tool_call("lights", "on")
    return f"you said: {text}"


def fake_tts(text: str) -> np.ndarray:
    t = np.linspace(0, 0.4, 6400, endpoint=False)
    return (0.2 * 32767 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)


def main():
    cfg = PipelineConfig(min_speech_s=0.1, min_silence_s=0.3, eager_stt=True)
    with VoicePipeline(vad=energy_vad, stt=fake_stt, llm=fake_llm, tts=fake_tts,
                       config=cfg) as pipe:
        pipe.add_tool("lights", "control the lights")

        if len(sys.argv) > 1:
            from qwen3_asr_swift_tpu.audio.io import load_audio

            audio, _ = load_audio(sys.argv[1], target_rate=16000)
        else:
            rng = np.random.default_rng(0)
            speech = 0.3 * rng.standard_normal(16000)
            audio = np.concatenate([speech, np.zeros(8000)]).astype(np.float32)

        step = 1600
        for off in range(0, len(audio), step):
            pipe.push_audio(audio[off: off + step].astype(np.float32))

        deadline = time.time() + 10
        while time.time() < deadline:
            for ev in pipe.drain_events(timeout=0.2):
                detail = ev.text or (f"{len(ev.pcm)} pcm" if ev.pcm is not None else "")
                print(f"[{ev.type.name:>16}] {detail}")
                if ev.type == PipelineEventType.AUDIO_CHUNK:
                    deadline = time.time() + 1


if __name__ == "__main__":
    main()

"""Streaming dictation demo: VAD-gated streaming ASR over a WAV file.

Analog of the reference's DictateDemo app (reference: Examples/DictateDemo
— live microphone → VAD → partial + final transcripts). Here the "mic" is
a WAV file streamed in 250 ms chunks; partials print in-place, finals on
their own line.

    python examples/dictate_demo.py path/to/audio.wav [--random-weights]
"""

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("audio")
    ap.add_argument("--random-weights", action="store_true")
    ap.add_argument("--model", default="aufklarer/Qwen3-ASR-0.6B-MLX-4bit")
    args = ap.parse_args()

    from qwen3_asr_swift_tpu.audio.io import load_audio
    from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR, config_tiny
    from qwen3_asr_swift_tpu.models.qwen3_asr.streaming import StreamingASR
    from qwen3_asr_swift_tpu.models.silero_vad import SileroVAD

    if args.random_weights:
        asr = Qwen3ASR.init_random(config_tiny(), audio_buckets_s=(8,))
        vad = SileroVAD.init_random()
    else:
        asr = Qwen3ASR.from_pretrained(args.model)
        vad = SileroVAD.from_pretrained()
    streamer = StreamingASR(asr, vad)

    audio, rate = load_audio(args.audio, target_rate=16000)
    chunk = rate // 4

    def show(partials):
        for partial in partials:
            if partial.is_final:
                sys.stdout.write(f"\r{partial.text}\n")
            else:
                sys.stdout.write(f"\r… {partial.text[:100]}")
            sys.stdout.flush()

    for off in range(0, len(audio), chunk):
        show(streamer.push(audio[off: off + chunk]))
    show(streamer.finish())
    print("done")


if __name__ == "__main__":
    main()

"""PersonaPlex full-duplex speech-to-speech demo.

Analog of the reference's PersonaPlexDemo app (reference:
Examples/PersonaPlexDemo — push-to-talk conversation with the 7B
full-duplex model; README.md:219 reports demo RTF ≈0.94).  Here the user
turn comes from a WAV file (or synthetic speech with --synthetic); the
model's streamed agent audio chunks are written to an output WAV, with
per-chunk RTF printed as they emit.

    python examples/personaplex_demo.py user_turn.wav [--random-weights]
    python examples/personaplex_demo.py --synthetic --random-weights
"""

import argparse
import sys
import time

import numpy as np


def synthetic_turn(seconds: float = 2.0, sr: int = 24000) -> np.ndarray:
    t = np.arange(int(seconds * sr)) / sr
    f0 = 130 + 25 * np.sin(2 * np.pi * 1.7 * t)
    sig = sum(np.sin(2 * np.pi * f0 * k * t) / k for k in (1, 2, 3))
    return (0.2 * sig).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("audio", nargs="?", help="user-turn WAV (24 kHz preferred)")
    ap.add_argument("--synthetic", action="store_true", help="use a synthetic user turn")
    ap.add_argument("--random-weights", action="store_true")
    ap.add_argument("--model", default="nvidia/personaplex-7b-v1")
    ap.add_argument("--voice", default=None, help="voice prompt (.npz / .safetensors)")
    ap.add_argument("--output", default="agent_reply.wav")
    ap.add_argument("--max-steps", type=int, default=None)
    args = ap.parse_args()

    from qwen3_asr_swift_tpu.audio.io import load_audio, write_wav
    from qwen3_asr_swift_tpu.models.personaplex import PersonaPlex, config_tiny

    if args.random_weights:
        model = PersonaPlex.init_random(config_tiny())
    else:
        model = PersonaPlex.from_pretrained(args.model)
    sr = model.cfg.mimi.sample_rate

    if args.synthetic or not args.audio:
        user_audio = synthetic_turn(sr=sr)
        print(f"user turn: synthetic {len(user_audio) / sr:.1f}s")
    else:
        user_audio, in_rate = load_audio(args.audio)
        if in_rate != sr:
            from qwen3_asr_swift_tpu.audio.resample import resample

            user_audio = resample(user_audio.astype(np.float32), in_rate, sr)
        print(f"user turn: {args.audio} ({len(user_audio) / sr:.1f}s)")

    kw = {}
    if args.voice:
        kw["voice_prompt"] = model.load_voice_prompt(args.voice)
    if args.max_steps is not None:
        kw["max_extra_s"] = 0.0

    print("responding (streamed)...")
    t0 = time.perf_counter()
    chunks = []
    emitted_s = 0.0
    for chunk in model.respond_stream(user_audio, **kw):
        samples = np.asarray(chunk.samples if hasattr(chunk, "samples") else chunk,
                             np.float32)
        chunks.append(samples)
        emitted_s += len(samples) / sr
        wall = time.perf_counter() - t0
        rtf = wall / max(emitted_s, 1e-6)
        print(f"\r  agent audio {emitted_s:5.2f}s | wall {wall:5.2f}s | RTF {rtf:4.2f}",
              end="", flush=True)
    print()

    if not chunks:
        print("no agent audio emitted")
        return 1
    agent = np.concatenate(chunks)
    write_wav(args.output, agent, sr)
    print(f"wrote {args.output} ({len(agent) / sr:.2f}s @ {sr} Hz)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

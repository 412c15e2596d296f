"""TTS engine RTF on real TPU hardware (random weights, published configs).

Measures synthesis real-time factor (wall seconds per generated audio
second; RTF < 1 = faster than real time) for each TTS family at its
published model size, mirroring the reference's round-trip speed table
(reference: docs/benchmarks/tts-roundtrip.md — Kokoro RTF 0.17, CosyVoice3
0.59, Qwen3-TTS 0.79, VibeVoice 0.68; M2 Max).

Random weights time the same compiled programs as real checkpoints (same
shapes, same step counts); engines whose stopping decision is a learned
binary head (VibeVoice EOS classifier, VoxCPM2 stop head) have that head
biased off so random weights cannot stop generation after one frame —
frame budgets are pinned instead, like the reference's fixed-sentence set.

Timing closes with the host-side numpy conversion of the waveform
(synthesize returns host arrays), so tunnel RPC and device→host transfer
are included — consistent with bench.py's timing-honesty convention.

Usage: python scripts/benchmark_tts.py [--engine all|kokoro|qwen3_tts|
       cosyvoice|vibevoice|voxcpm2] [--runs N] [--frames N]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

TEXT = ("The quick brown fox jumps over the lazy dog near the river bank "
        "every sunny morning before the town wakes up.")


class _StubTokenizer:
    """Deterministic text→id stub for random-weight benches (ids stay well
    inside every engine's text vocab)."""

    def encode(self, s: str):
        return [(ord(c) * 31 + i) % 5000 for i, c in enumerate(s)]

    def decode(self, ids):
        return "".join(chr(97 + (i % 26)) for i in ids)


def _bench(name, synth, runs):
    """Warm up (compile), then time `runs` calls; report p50 RTF."""
    t0 = time.perf_counter()
    chunk = synth()
    compile_s = time.perf_counter() - t0
    if chunk.duration <= 0:
        print(f"{name}: produced no audio (duration 0) — skipped", file=sys.stderr)
        return None
    walls, durs = [], []
    for _ in range(runs):
        t0 = time.perf_counter()
        chunk = synth()
        np.asarray(chunk.samples)  # value fetch closes the timing
        walls.append(time.perf_counter() - t0)
        durs.append(chunk.duration)
    rtfs = sorted(w / d for w, d in zip(walls, durs))
    p50 = rtfs[len(rtfs) // 2]
    best = rtfs[0]
    print(f"{name}: RTF p50 {p50:.3f} best {best:.3f} "
          f"(audio {np.median(durs):.1f}s, wall p50 {sorted(walls)[len(walls)//2]:.2f}s, "
          f"compile+warmup {compile_s:.0f}s, {runs} runs)", file=sys.stderr)
    return {"engine": name, "rtf_p50": round(p50, 4), "rtf_best": round(best, 4),
            "audio_s": round(float(np.median(durs)), 2), "runs": runs}


def bench_kokoro(runs):
    from qwen3_asr_swift_tpu.models.kokoro import CONFIG_82M, KokoroTTS

    model = KokoroTTS.init_random(CONFIG_82M)
    return _bench("kokoro_82m", lambda: model.synthesize(TEXT), runs)


def bench_qwen3_tts(runs, frames, quant=4, quant_compute="groupdot"):
    import jax.numpy as jnp

    from qwen3_asr_swift_tpu.models.qwen3_tts import Qwen3TTS

    # published checkpoint is 4-bit (MLX); groupdot executes those values
    # as native-s8 group dots (1 B/param traffic) — the 12.5 Hz talker+CP
    # frame loop re-reads the CP stack ~16×/frame and is HBM-bound, so
    # measured on-chip: bf16 0.0795, int4 Pallas GEMV 0.0996, groupdot
    # 0.0573 RTF. --quant 0 opts back into dense bf16.
    model = Qwen3TTS.init_random(dtype=jnp.bfloat16, tokenizer=_StubTokenizer(),
                                 quant_bits=quant or None,
                                 quant_compute=quant_compute)
    # pin the frame budget: random weights rarely emit codec EOS, but a fixed
    # budget makes run-to-run audio length identical (125 frames = 10 s)
    name = f"qwen3_tts_0.6b{f'_int{quant}_{quant_compute}' if quant else ''}"
    return _bench(name,
                  lambda: model.synthesize(TEXT, max_frames=frames, seed=1), runs)


def bench_cosyvoice(runs):
    import jax.numpy as jnp

    from qwen3_asr_swift_tpu.models.cosyvoice import CONFIG_05B, CosyVoiceTTS

    model = CosyVoiceTTS.init_random(CONFIG_05B, dtype=jnp.bfloat16)
    return _bench("cosyvoice3_0.5b", lambda: model.synthesize(TEXT, seed=1), runs)


def bench_vibevoice(runs, frames):
    import jax.numpy as jnp

    from qwen3_asr_swift_tpu.models.vibevoice import CONFIG_05B, VibeVoiceTTS

    model = VibeVoiceTTS.init_random(CONFIG_05B, dtype=jnp.bfloat16)
    # random weights would trip the sigmoid EOS classifier ~50%/frame;
    # bias it hard off so the full frame budget is timed
    p = dict(model.params)
    eos = dict(p["eos_classifier"])
    fc2 = dict(eos["fc2"])
    fc2["bias"] = fc2["bias"] - 30.0
    eos["fc2"] = fc2
    p["eos_classifier"] = eos
    model.params = p
    return _bench("vibevoice_0.5b",
                  lambda: model.synthesize(TEXT, max_frames=frames, seed=1), runs)


def bench_voxcpm2(runs, frames):
    import jax.numpy as jnp

    from qwen3_asr_swift_tpu.models.voxcpm2 import CONFIG_2B, VoxCPM2TTS

    model = VoxCPM2TTS.init_random(CONFIG_2B, dtype=jnp.bfloat16)
    # the stop head is a learned 2-class argmax: zero it so random weights
    # never stop, and pin the budget via max_tokens (25 Hz patches: the
    # default 125-frame budget = 5 s of 48 kHz audio)
    p = dict(model.params)
    sh = dict(p["stop_head"])
    sh["kernel"] = jnp.zeros_like(sh["kernel"])
    p["stop_head"] = sh
    model.params = p
    return _bench("voxcpm2_2b",
                  lambda: model.synthesize(TEXT, seed=1, max_tokens=frames), runs)


def bench_ttspool(runs, frames, quant=4, quant_compute="groupdot"):
    """Frame-level continuous batching (SlotPoolTTS) at 1/2/4 concurrent
    syntheses: the pool shares ONE talker-step + CP-chain program per
    12.5 Hz frame across all live slots, so the talker/CP weight read is
    paid once per frame regardless of concurrency.  Reports pool-wide
    frames/s and per-synthesis RTF (wall until ALL N complete, including
    the finisher-thread codec decode).  Reference being beaten: strictly
    one-at-a-time synthesize (Sources/Qwen3TTS/Qwen3TTS.swift:107-180)."""
    import os

    import jax.numpy as jnp

    from qwen3_asr_swift_tpu.models.qwen3_tts import Qwen3TTS
    from qwen3_asr_swift_tpu.models.qwen3_tts.model import TTSSamplingConfig
    from qwen3_asr_swift_tpu.serving.ttspool import SlotPoolTTS

    if os.environ.get("BENCH_TINY") == "1":  # control-flow smoke on CPU
        import jax

        jax.config.update("jax_platforms", "cpu")
        from qwen3_asr_swift_tpu.models.qwen3_tts.config import config_tiny

        tcfg = config_tiny()

        class _TinyTok(_StubTokenizer):
            def encode(self, s, _v=tcfg.talker.text_vocab_size):
                return [i % (_v // 2) for i in super().encode(s)]

        model = Qwen3TTS.init_random(tcfg, dtype=jnp.float32,
                                     tokenizer=_TinyTok())
    else:
        model = Qwen3TTS.init_random(dtype=jnp.bfloat16,
                                     tokenizer=_StubTokenizer(),
                                     quant_bits=quant or None,
                                     quant_compute=quant_compute)
    sampling = TTSSamplingConfig(max_frames=frames)
    pool = SlotPoolTTS(model, slots=4, tick_frames=5, sampling=sampling,
                       max_frames=frames, oversize="fallback")
    t0 = time.perf_counter()
    pool.synthesize(TEXT, timeout=1200)  # compile admit/insert/tick/codec
    print(f"ttspool warmup (incl. compile): {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)

    out = []
    for n in (1, 2, 4):
        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            futs = [pool.submit(TEXT, max_frames=frames) for _ in range(n)]
            chunks = [f.result(timeout=1200) for f in futs]
            for c in chunks:
                np.asarray(c.samples)  # value fetch closes the timing
            walls.append(time.perf_counter() - t0)
        wall = sorted(walls)[len(walls) // 2]
        audio = frames / 12.5
        fps = n * frames / wall
        rtf = wall / audio
        print(f"ttspool n={n}: {fps:.0f} frames/s pool-wide, per-synthesis "
              f"RTF {rtf:.3f}, pool xRT {n * audio / wall:.1f}x "
              f"(wall p50 {wall:.2f}s for {n}×{audio:.0f}s, {runs} runs)",
              file=sys.stderr)
        out.append({"engine": f"ttspool_n{n}", "frames_per_s": round(fps, 1),
                    "rtf_p50": round(rtf, 4), "runs": runs})
    print(f"ttspool stats: {pool.stats}", file=sys.stderr)
    pool.close()
    return out


ENGINES = {
    "kokoro": lambda a: bench_kokoro(a.runs),
    "qwen3_tts": lambda a: bench_qwen3_tts(a.runs, a.frames, a.quant, a.quant_compute),
    "cosyvoice": lambda a: bench_cosyvoice(a.runs),
    "vibevoice": lambda a: bench_vibevoice(a.runs, a.frames),
    "voxcpm2": lambda a: bench_voxcpm2(a.runs, a.frames),
    "ttspool": lambda a: bench_ttspool(a.runs, a.frames, a.quant, a.quant_compute),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", default="all", choices=["all", *ENGINES])
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--frames", type=int, default=125,
                    help="AR frame budget (12.5 Hz engines: 125 = 10 s)")
    ap.add_argument("--quant", type=int, default=4,
                    help="qwen3_tts weight bits (0 = dense bf16)")
    ap.add_argument("--quant-compute", default="groupdot",
                    choices=["groupdot", "packed", "dequant"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    print(f"devices: {jax.devices()}", file=sys.stderr)

    names = list(ENGINES) if args.engine == "all" else [args.engine]
    results = []
    for name in names:
        try:
            r = ENGINES[name](args)
        except Exception as e:  # keep going: one engine's OOM shouldn't kill the sweep
            print(f"{name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
            r = None
        if r:
            results.extend(r) if isinstance(r, list) else results.append(r)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Auxiliary-family RTF/latency on real TPU hardware (random weights).

Covers the reference's remaining published speed tables — VAD detection
(reference: docs/benchmarks/vad-detection.md — Silero CoreML RTF 0.022,
FireRedVAD 0.007), Parakeet TDT (asr-wer.md:14 — RTF 0.089), speaker
embedding (speaker-embeddings.md:17-19 — WeSpeaker 65 ms MLX / 148 ms
CoreML per 20 s clip), source separation (source-separation.md:25 — RTF
0.23), KWS (docs/models/kws-zipformer.md:5 — RTF ~0.04), and DFN3
enhancement (no published RTF; reported for completeness).

Random weights time the same compiled programs as real checkpoints: every
workload here is input-shape-driven (fixed frame loops, conv/LSTM stacks),
so weight values change outputs, not wall time. Accuracy columns (F1, EER,
SDR, WER) need real checkpoints — see scripts/benchmark_asr_wer.py and the
E2E tier.

Timing closes with the host-side numpy result (all these APIs return host
arrays), so tunnel RPC and device→host transfer are included — bench.py's
timing-honesty convention.

Usage: python scripts/benchmark_aux.py [--engine all|parakeet|silero|
       firered|enhance|separate|speaker|kws] [--runs N]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _audio(seconds: float, rate: int, seed: int = 0, channels: int = 1):
    rng = np.random.default_rng(seed)
    shape = (int(seconds * rate),) if channels == 1 else (channels, int(seconds * rate))
    return (0.1 * rng.standard_normal(shape)).astype(np.float32)


def _bench(name, fn, audio_s, runs, ref_rtf=None):
    """Warm up (compile), then time `runs` calls; report p50 RTF."""
    t0 = time.perf_counter()
    fn()
    compile_s = time.perf_counter() - t0
    walls = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    walls.sort()
    p50, best = walls[len(walls) // 2], walls[0]
    rtf = p50 / audio_s
    vs = f", reference {ref_rtf:.3f} ({ref_rtf / rtf:.1f}x faster)" if ref_rtf else ""
    print(f"{name}: RTF p50 {rtf:.4f} best {best / audio_s:.4f} "
          f"(audio {audio_s:.0f}s, wall p50 {p50 * 1000:.0f} ms, "
          f"compile+warmup {compile_s:.0f}s, {runs} runs{vs})", file=sys.stderr)
    return {"engine": name, "rtf_p50": round(rtf, 5),
            "rtf_best": round(best / audio_s, 5), "audio_s": audio_s,
            "wall_p50_ms": round(p50 * 1000, 1), "runs": runs,
            **({"ref_rtf": ref_rtf} if ref_rtf else {})}


def bench_parakeet(runs):
    from qwen3_asr_swift_tpu.models.parakeet import CONFIG_06B, ParakeetASR

    import jax.numpy as jnp

    model = ParakeetASR.init_random(CONFIG_06B, dtype=jnp.bfloat16)
    audio = _audio(30, 16000)
    return _bench("parakeet_tdt_0.6b", lambda: model.transcribe(audio), 30.0,
                  runs, ref_rtf=0.089)


def bench_silero(runs):
    from qwen3_asr_swift_tpu.models.silero_vad import SileroVAD

    model = SileroVAD.init_random()
    audio = _audio(60, 16000)
    return _bench("silero_vad_v5", lambda: model.detect_speech(audio), 60.0,
                  runs, ref_rtf=0.022)


def bench_firered(runs):
    from qwen3_asr_swift_tpu.models.firered_vad import CONFIG_FIRERED, FireRedVAD

    model = FireRedVAD.init_random(CONFIG_FIRERED)
    audio = _audio(60, 16000)
    return _bench("firered_vad", lambda: model.detect_speech(audio), 60.0,
                  runs, ref_rtf=0.007)


def bench_enhance(runs):
    from qwen3_asr_swift_tpu.models.enhancement import SpeechEnhancer

    model = SpeechEnhancer.init_random()
    audio = _audio(10, 48000)
    return _bench("dfn3_enhance", lambda: model.enhance(audio, 48000), 10.0, runs)


def bench_separate(runs):
    from qwen3_asr_swift_tpu.models.separation import SourceSeparator

    model = SourceSeparator.init_random()
    audio = _audio(10, 44100, channels=2)
    return _bench("umx_separate_4stem", lambda: model.separate(audio, 44100),
                  10.0, runs, ref_rtf=0.23)


def bench_speaker(runs):
    from qwen3_asr_swift_tpu.models.speaker import WeSpeaker

    model = WeSpeaker.init_random()
    audio = _audio(20, 16000)
    r = _bench("wespeaker_resnet34_embed", lambda: model.embed(audio), 20.0, runs)
    if r:
        print(f"  per-20s-clip: {r['wall_p50_ms']:.0f} ms "
              f"(reference MLX 65 ms / CoreML 148 ms)", file=sys.stderr)
    # batched path (the diarization window sweep): one program for 8
    # clips — the per-clip cost at which a sweep actually runs
    clips = [_audio(20, 16000, seed=i) for i in range(8)]
    rb = _bench("wespeaker_embed_batch8", lambda: model.embed_batch(clips),
                8 * 20.0, runs)
    if rb:
        print(f"  per-20s-clip batched: {rb['wall_p50_ms'] / 8:.0f} ms "
              f"(reference MLX 65 ms / CoreML 148 ms per clip)", file=sys.stderr)
        r["batch8_per_clip_ms"] = round(rb["wall_p50_ms"] / 8, 1)
        r["batch8_rtf_p50"] = rb["rtf_p50"]
    return r


def bench_kws(runs):
    from qwen3_asr_swift_tpu.models.wakeword import Keyword, WakeWordDetector

    model = WakeWordDetector.init_random(
        [Keyword("hey assistant", (12, 34, 56, 78)),
         Keyword("light up", (9, 87, 65))])
    audio = _audio(10, 16000)
    return _bench("kws_zipformer_3m", lambda: model.detect(audio), 10.0, runs,
                  ref_rtf=0.04)


ENGINES = {
    "parakeet": bench_parakeet,
    "silero": bench_silero,
    "firered": bench_firered,
    "enhance": bench_enhance,
    "separate": bench_separate,
    "speaker": bench_speaker,
    "kws": bench_kws,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", default="all", choices=["all", *ENGINES])
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    print(f"devices: {jax.devices()}", file=sys.stderr)

    names = list(ENGINES) if args.engine == "all" else [args.engine]
    results = []
    for name in names:
        try:
            r = ENGINES[name](args.runs)
        except Exception as e:  # keep going: one engine's failure shouldn't kill the sweep
            print(f"{name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
            r = None
        if r:
            results.append(r)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Device-headroom sweep: quant_compute x batch x KV dtype for batched decode.

VERDICT r4 Weak #5: the benched decode config reads ~205 GB/s ~= 25% of
v5e HBM; native-s8 group-dot execution (the Qwen3-TTS RTF winner) halves
decoder weight bytes but was never A/B'd in the batched bench, and batch
32's higher device ceiling was left on the table for tunnel weather.

This script measures the DEVICE-PROGRAM xRT (encode+generate with sync,
excluding tunnel RPC + host prep — the chip-isolation number) across the
config grid, so the serving default can be chosen from data:

    python scripts/benchmark_decode_sweep.py             # full grid
    BENCH_SWEEP="dequant:16,groupdot:32:int8" python ... # subset

Each cell: build the 0.6B model with random weights at that config,
warm up, then 5 staged runs (per-stage sync timings) + 5 natural runs
(pipelined wall). Prints one table row per cell and a JSON tail.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

    from qwen3_asr_swift_tpu.models.qwen3_asr import CONFIG_SMALL, Qwen3ASR
    from qwen3_asr_swift_tpu.ops.sampling import SamplingOptions

    if os.environ.get("BENCH_TINY") == "1":
        from qwen3_asr_swift_tpu.models.qwen3_asr.config import config_tiny
        cfg = config_tiny()
    else:
        cfg = CONFIG_SMALL

    spec = os.environ.get(
        "BENCH_SWEEP",
        "dequant:16,dequant:32,groupdot:16,groupdot:32,groupdot:64,"
        "groupdot:32:int8,groupdot:64:int8")
    cells = []
    for item in spec.split(","):
        parts = item.strip().split(":")
        qc, batch = parts[0], int(parts[1])
        kv = parts[2] if len(parts) > 2 else ""
        cells.append((qc, batch, kv))

    clip_s = int(os.environ.get("BENCH_CLIP_S", "30"))
    max_tokens = int(os.environ.get("BENCH_TOKENS", "100"))
    quant = int(os.environ.get("BENCH_QUANT_BITS", "4"))
    n_runs = int(os.environ.get("BENCH_RUNS", "5"))
    sr = 16000
    rng = np.random.default_rng(0)
    opts = SamplingOptions(max_tokens=max_tokens)

    rows = []
    for qc, batch, kv in cells:
        label = f"{qc} b{batch} kv={kv or 'bf16'}"
        print(f"=== {label}: building...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        model = Qwen3ASR.init_random(
            cfg, dtype=jnp.bfloat16, audio_buckets_s=(8, 16, 32, 64),
            wire_dtype="pcm4", quant_bits=quant or None,
            kv_dtype=jnp.int8 if kv == "int8" else None,
            decode_chunk_tokens=int(os.environ.get("BENCH_DECODE_CHUNK", "15")) or None,
            quant_compute=qc)
        clips = [(0.1 * rng.standard_normal(clip_s * sr)).astype(np.float32)
                 for _ in range(batch)]
        model.transcribe_batch(clips, options=opts)  # compile + warm
        print(f"  build+warmup {time.perf_counter()-t0:.1f}s", file=sys.stderr,
              flush=True)

        dev, wall, gen = [], [], []
        for _ in range(n_runs):
            timings = {}
            model.transcribe_batch(clips, options=opts, timings=timings)
            dev.append(timings.get("encode", 0.0) + timings.get("generate", 0.0))
            gen.append(timings.get("generate", 0.0))
        for _ in range(n_runs):
            t0 = time.perf_counter()
            model.transcribe_batch(clips, options=opts)
            wall.append(time.perf_counter() - t0)

        audio_s = batch * clip_s
        p50 = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        row = {
            "config": label, "qcompute": qc, "batch": batch, "kv": kv or "bf16",
            "dev_xrt_p50": round(audio_s / p50(dev), 1),
            "dev_xrt_best": round(audio_s / min(dev), 1),
            "wall_xrt_p50": round(audio_s / p50(wall), 1),
            "gen_s_p50": round(p50(gen), 3),
            "ms_per_tok": round(p50(gen) / max_tokens * 1000, 2),
        }
        rows.append(row)
        print(f"  device xRT p50 {row['dev_xrt_p50']}x (best {row['dev_xrt_best']}x), "
              f"wall p50 {row['wall_xrt_p50']}x, generate {row['gen_s_p50']}s "
              f"({row['ms_per_tok']} ms/tok-step)", file=sys.stderr, flush=True)
        del model

    print(f"\n{'config':<28}{'dev p50':>9}{'dev best':>10}{'wall p50':>10}"
          f"{'ms/tok':>8}", file=sys.stderr)
    for r in rows:
        print(f"{r['config']:<28}{r['dev_xrt_p50']:>9}{r['dev_xrt_best']:>10}"
              f"{r['wall_xrt_p50']:>10}{r['ms_per_tok']:>8}", file=sys.stderr)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()

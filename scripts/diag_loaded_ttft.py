"""Decompose loaded first-token latency: where do the milliseconds go?

Runs the bench's steady-state fixture (4 submitters, continuous flow,
dispatch gate) and probes with per-stage timings (host_prep / encode /
generate / postprocess, device-synced at boundaries), plus a GIL-echo
measurement (time for a no-op Python roundtrip under load) so host
scheduling delay is visible separately from device/RPC time.
"""

import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def p(xs, q):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(q * len(xs)))]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from qwen3_asr_swift_tpu.models.qwen3_asr import CONFIG_SMALL, Qwen3ASR
    from qwen3_asr_swift_tpu.ops.sampling import SamplingOptions
    from qwen3_asr_swift_tpu.serving.dispatch import LATENCY, DispatchGate

    batch, clip_s, sr = 16, 30, 16000
    model = Qwen3ASR.init_random(
        CONFIG_SMALL, dtype=jnp.bfloat16, audio_buckets_s=(8, 16, 32, 64),
        wire_dtype="pcm4", quant_bits=4, quant_compute="dequant",
        decode_chunk_tokens=int(os.environ.get("DIAG_CHUNK", "25")))
    rng = np.random.default_rng(0)
    clips = [(0.1 * rng.standard_normal(clip_s * sr)).astype(np.float32) for _ in range(batch)]
    short = (0.1 * rng.standard_normal(8 * sr)).astype(np.float32)
    opts = SamplingOptions(max_tokens=100)
    ft_opts = SamplingOptions(max_tokens=1)

    model.transcribe_batch(clips, options=opts)
    model.transcribe(short, options=ft_opts)
    print("warm", file=sys.stderr)

    model.dispatch_gate = DispatchGate(
        slots=int(os.environ.get("DIAG_SLOTS", "3")),
        reserve_latency=int(os.environ.get("DIAG_RESERVE", "1")))

    stop = threading.Event()

    def submit_loop():
        nxt = model.prestage(clips)
        while not stop.is_set():
            cur, nxt = nxt, model.prestage(clips)
            model.transcribe_batch(prestaged=cur, options=opts)

    subs = [threading.Thread(target=submit_loop, daemon=True) for _ in range(4)]
    for t in subs:
        t.start()
    time.sleep(3)

    # GIL echo: how long does a trivial pure-Python turn take under load?
    gil = []
    for _ in range(200):
        t0 = time.perf_counter()
        sum(range(100))
        gil.append(time.perf_counter() - t0)
        time.sleep(0.01)
    print(f"gil echo: p50 {p(gil,0.5)*1e6:.0f} us p95 {p(gil,0.95)*1e6:.0f} us "
          f"max {max(gil)*1e3:.1f} ms", file=sys.stderr)

    n = int(os.environ.get("DIAG_PROBES", "25"))

    # fused fast path (what serving probes actually take: one fused
    # program dispatch + one done fetch + one packed output fetch)
    fused = []
    for i in range(n):
        t0 = time.perf_counter()
        model.transcribe(short, options=ft_opts, priority=LATENCY)
        fused.append(time.perf_counter() - t0)
        time.sleep(1.0)
    print(f"fused probe  : p50 {p(fused,0.5)*1e3:7.1f} ms  "
          f"p90 {p(fused,0.9)*1e3:7.1f} ms max {max(fused)*1e3:7.1f} ms",
          file=sys.stderr)

    # staged decomposition (timings= path — NOT fused; shows where the
    # multi-sync path pays)
    stages = {k: [] for k in ("host_prep", "encode", "generate", "postprocess", "total")}
    for i in range(n):
        tm = {}
        t0 = time.perf_counter()
        model.transcribe(short, options=ft_opts, priority=LATENCY, timings=tm)
        tm["total"] = time.perf_counter() - t0
        for k in stages:
            stages[k].append(tm.get(k, 0.0))
        time.sleep(1.0)

    stop.set()
    for t in subs:
        t.join(timeout=120)
    for k, xs in stages.items():
        print(f"{k:12s}: p50 {p(xs,0.5)*1e3:7.1f} ms  p90 {p(xs,0.9)*1e3:7.1f} ms "
              f"max {max(xs)*1e3:7.1f} ms", file=sys.stderr)
    print(f"gate: {model.dispatch_gate.stats}", file=sys.stderr)


if __name__ == "__main__":
    main()

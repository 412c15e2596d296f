"""Characterize the host↔device link (RTT, bandwidth, device_put asynchrony).

The steady-state serving floor is transfer-bound over the tunneled TPU
backend (docs/benchmarks.md): this script measures the primitives that
bound it so staging design follows data, not guesswork:

- RTT: tiny transfer + value fetch round trip;
- single-stream H2D bandwidth (one device_put at a time);
- N-stream H2D bandwidth (concurrent device_puts from N threads) — if the
  link aggregates, double-buffered staging converts directly into floor
  throughput; if it serializes, only fewer wire bytes help;
- device_put call-return vs completion: how much of the transfer is
  already asynchronous (call returns early) vs blocking in the caller.

No reference counterpart: the reference runs model and audio I/O in one
process on unified memory (Sources/Qwen3ASR/Qwen3ASR.swift).
"""

import os
import sys
import threading
import time

import numpy as np


def p50(xs):
    return sorted(xs)[len(xs) // 2]


def main():
    import jax

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    # RTT: 8-byte put + fetch
    tiny = np.zeros((2,), np.float32)
    rtts = []
    for _ in range(15):
        t0 = time.perf_counter()
        a = jax.device_put(tiny, dev)
        np.asarray(a)
        rtts.append(time.perf_counter() - t0)
    print(f"RTT (8B put+fetch): p50 {p50(rtts)*1e3:.1f} ms, "
          f"min {min(rtts)*1e3:.1f} ms, max {max(rtts)*1e3:.1f} ms")

    mb = float(os.environ.get("XFER_MB", "8"))
    buf = np.random.default_rng(0).integers(-127, 127, size=int(mb * 1e6), dtype=np.int8)

    # single-stream: call-return vs completed
    for _ in range(2):  # warm
        jax.block_until_ready(jax.device_put(buf, dev))
    call_ts, done_ts = [], []
    for _ in range(6):
        t0 = time.perf_counter()
        a = jax.device_put(buf, dev)
        call_ts.append(time.perf_counter() - t0)
        jax.block_until_ready(a)
        done_ts.append(time.perf_counter() - t0)
        del a
    bw = mb / p50(done_ts)
    print(f"single-stream {mb:.0f}MB: call-return p50 {p50(call_ts)*1e3:.0f} ms, "
          f"completed p50 {p50(done_ts)*1e3:.0f} ms -> {bw:.1f} MB/s "
          f"(async fraction {1 - p50(call_ts)/p50(done_ts):.0%})")

    # N-stream concurrent
    for n in (2, 4):
        walls = []
        for _ in range(4):
            done = [None] * n

            def put(i):
                a = jax.device_put(buf, dev)
                jax.block_until_ready(a)
                done[i] = a

            ths = [threading.Thread(target=put, args=(i,)) for i in range(n)]
            t0 = time.perf_counter()
            for t in ths:
                t.start()
            for t in ths:
                t.join()
            walls.append(time.perf_counter() - t0)
            del done
        print(f"{n}-stream {n}x{mb:.0f}MB concurrent: wall p50 {p50(walls)*1e3:.0f} ms "
              f"-> aggregate {n*mb/p50(walls):.1f} MB/s")

    # overlap: does a transfer ride under a running device program?
    import jax.numpy as jnp

    m = jax.device_put(np.random.default_rng(1).standard_normal((4096, 4096)).astype(np.float32), dev)

    @jax.jit
    def burn(x):
        def body(i, y):
            return y @ x / 65.0
        return jax.lax.fori_loop(0, 40, body, x)

    jax.block_until_ready(burn(m))
    t0 = time.perf_counter()
    jax.block_until_ready(burn(m))
    t_burn = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = burn(m)  # dispatched async
    a = jax.device_put(buf, dev)
    jax.block_until_ready(a)
    t_put_under = time.perf_counter() - t0
    jax.block_until_ready(out)
    t_both = time.perf_counter() - t0
    print(f"overlap: burn alone {t_burn*1e3:.0f} ms; put-under-burn done at "
          f"{t_put_under*1e3:.0f} ms; both {t_both*1e3:.0f} ms "
          f"(serial would be {(t_burn + p50(done_ts))*1e3:.0f} ms)")


if __name__ == "__main__":
    main()

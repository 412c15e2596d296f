"""Probe: does s4-stored weight halve HBM traffic for the group-dot path?

The Qwen3-TTS CP chain is weight-traffic-bound (~60 MB/step x 14 steps).
groupdot stores codes as int8 (1 B/param). The published checkpoint is
4-bit, so int4 storage is LOSSLESS; the question is whether XLA on this
backend fuses the s4->s8 convert into the dot operand load (traffic
halves) or materializes a dense int8 copy per call (no win, extra work).

Method: a CP-shaped sequential chain (14 steps x 5 "layers" x one
[1,1024]x[1024,3072] groupdot each + [1024,2048] head), s8-stored vs
s4-stored, timed on-chip with value-fetch closure.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    G, GS, OUT, H = 16, 64, 3072, 1024  # one mlp-ish groupdot: in=1024, out=3072
    NLAYER, NSTEP = 5, 14

    rng = np.random.default_rng(0)
    codes_np = rng.integers(-8, 8, size=(NLAYER, G, GS, OUT), dtype=np.int8)
    scales_np = rng.standard_normal((NLAYER, G, OUT)).astype(np.float32) * 0.01

    def chain(codes, scales, x0):
        def step(x, _):
            def layer(x, ln):
                c = codes[ln].astype(jnp.int8)  # no-op for s8; convert for s4
                xf = x.reshape(-1, G, GS).astype(jnp.float32)
                sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-12) / 127.0
                xq = jnp.clip(jnp.round(xf / sx[..., None]), -127, 127).astype(jnp.int8)
                partial = jax.lax.dot_general(
                    xq.transpose(1, 0, 2), c,
                    (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32)
                y = jnp.einsum("gbo,bg,go->bo", partial.astype(jnp.float32), sx,
                               scales[ln].astype(jnp.float32))
                return jnp.tanh(y[:, :H])  # keep shape, force dependency
            for ln in range(NLAYER):
                x = layer(x, ln)
            return x, ()
        xN, _ = jax.lax.scan(step, x0, None, length=NSTEP)
        return xN

    fn = jax.jit(chain)
    x0 = jax.random.normal(key, (1, H), jnp.float32)

    import ml_dtypes

    for name, dt in (("s8", np.int8), ("s4", ml_dtypes.int4)):
        # host-side ml_dtypes conversion + device_put: an eager
        # jnp.asarray(..., jnp.int4) recursively re-enters jit on this
        # backend (convert dispatches a jit from inside apply_primitive)
        codes = jax.device_put(codes_np.astype(dt))
        scales = jnp.asarray(scales_np)
        bytes_w = NLAYER * G * GS * OUT * (1 if name == "s8" else 0.5)
        out = fn(codes, scales, x0)
        np.asarray(out)  # warm compile + fetch
        walls = []
        for _ in range(20):
            t0 = time.perf_counter()
            np.asarray(fn(codes, scales, x0))
            walls.append((time.perf_counter() - t0) * 1e3)
        walls.sort()
        p50 = walls[len(walls) // 2]
        ideal = NSTEP * bytes_w / 819e9 * 1e3  # v5e ~819 GB/s
        print(f"{name}: p50 {p50:.2f} ms  best {walls[0]:.2f}  "
              f"(weights {bytes_w/1e6:.0f} MB/step, bw-ideal {ideal:.2f} ms)")


if __name__ == "__main__":
    main()

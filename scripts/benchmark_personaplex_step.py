"""PersonaPlex 7B single-chip step latency on real TPU hardware.

Times the compiled temporal+depformer frame step (one 80 ms conversation
frame: 17-stream embed → 32-layer d4096 temporal step → text sample →
16-step depformer) at the published 7B config with random bf16 weights —
the number the reference reports as ~112 ms/step on M2 Max 8-bit
(reference: docs/models/personaplex.md:97-98). RTF < 1 requires
< 80 ms/step.

Usage:  python scripts/benchmark_personaplex_step.py [--layers N] [--steps N]
(--layers trims the temporal stack when the full 7B does not fit the
chip's HBM; the per-layer cost is uniform so ms/step extrapolates
linearly in the layer count.)
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cache-frames", type=int, default=750)  # 60 s conversation
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import dataclasses

    from qwen3_asr_swift_tpu.models.personaplex.model import (
        CONFIG_7B,
        PersonaSampling,
        _sample_topk,
        depformer_generate,
        embed_frame,
        init_personaplex_params,
        temporal_step,
    )
    from qwen3_asr_swift_tpu.ops.kv_cache import init_cache
    from qwen3_asr_swift_tpu.ops.nn import linear

    cfg = dataclasses.replace(CONFIG_7B, num_layers=args.layers)
    print(f"init 7B-config params (layers={cfg.num_layers}, d={cfg.d_model}) in bf16...",
          file=sys.stderr)
    t0 = time.perf_counter()
    params = init_personaplex_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params = jax.tree_util.tree_map(jax.block_until_ready, params)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    print(f"  {n_params/1e9:.2f}B params in {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    sampling = PersonaSampling()
    k = cfg.temporal_codebooks
    cache = init_cache(cfg.num_layers, 1, cfg.num_heads, args.cache_frames,
                       cfg.head_dim, jnp.bfloat16)

    import functools

    @functools.partial(jax.jit, static_argnames=("s",))
    def frame_step(p, cache, user_read, agent_prev, text_prev, key, *, s):
        embeds = embed_frame(p, cfg, text_prev, user_read, agent_prev)[:, None]
        hidden, cache = temporal_step(p, cfg, embeds.astype(jnp.bfloat16), cache)
        key, kt, kd = jax.random.split(key, 3)
        text_tok = _sample_topk(linear(hidden, p["text_head"]), kt,
                                s.text_top_k, s.text_temperature)
        codes = depformer_generate(p, cfg, hidden, text_tok, kd, s)
        return codes, text_tok, cache

    user = jnp.zeros((1, k), jnp.int32)
    agent = jnp.zeros((1, k), jnp.int32)
    text = jnp.zeros((1,), jnp.int32)
    key = jax.random.PRNGKey(1)

    print("compiling frame step...", file=sys.stderr)
    t0 = time.perf_counter()
    codes, text, cache = frame_step(params, cache, user, agent, text, key, s=sampling)
    jax.block_until_ready(codes)
    print(f"  compile+first step {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    times = []
    for i in range(args.steps):
        key, kf = jax.random.split(key)
        t0 = time.perf_counter()
        codes, text, cache = frame_step(params, cache, codes[:, :k], codes[:, :k],
                                        text, kf, s=sampling)
        jax.block_until_ready(codes)
        times.append(time.perf_counter() - t0)
    times = sorted(times)
    p50 = times[len(times) // 2] * 1e3
    best = times[0] * 1e3
    frame_ms = 1000.0 / cfg.mimi.frame_rate
    scale = 32 / cfg.num_layers
    print(f"step latency: best {best:.1f} ms, p50 {p50:.1f} ms "
          f"({args.steps} steps, layers={cfg.num_layers})", file=sys.stderr)
    if cfg.num_layers != 32:
        print(f"  extrapolated to 32 layers: ~{p50*scale:.1f} ms/step", file=sys.stderr)
    print(f"RTF: {p50/frame_ms:.2f} (reference M2 Max 8-bit: ~1.4, "
          f"112 ms/step — personaplex.md:97)", file=sys.stderr)
    import json

    print(json.dumps({"metric": "personaplex_7b_step_ms_p50",
                      "value": round(p50, 1), "unit": "ms/step",
                      "layers": cfg.num_layers,
                      "vs_reference_112ms": round(112.0 / (p50 * scale), 2)}))


if __name__ == "__main__":
    main()

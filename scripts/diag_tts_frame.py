"""Decompose the Qwen3-TTS 12.5 Hz frame cost: talker step vs CP chain.

The frame loop (talker step → sample code0 → 15-group CP completion →
embed feedback) runs fused inside one lax.while_loop in production; this
diagnostic jits each piece separately to attribute per-frame
milliseconds, under each quantization mode. RTF target ≤0.05 = 4.0 ms
per 80 ms frame.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


REPS = 50  # loop reps inside ONE program — amortizes the ~30 ms tunnel RPC


def bench(fn, *args, n=7):
    """Median wall / REPS for a jitted fn that loops REPS times on device.
    A single dispatch per measurement: the tunnel RPC (~30 ms) would
    otherwise dwarf per-frame device costs in the 1-5 ms range."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / REPS


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from qwen3_asr_swift_tpu.models.qwen3_tts import Qwen3TTS
    from qwen3_asr_swift_tpu.models.qwen3_tts.code_predictor import (
        embed_all_groups, predict_codebooks)
    from qwen3_asr_swift_tpu.models.qwen3_tts.talker import (
        embed_codec, make_talker_cache, talker_step)

    mode = os.environ.get("TTS_MODE", "groupdot")
    quant = int(os.environ.get("TTS_QUANT", "4"))
    model = Qwen3TTS.init_random(dtype=jnp.bfloat16,
                                 quant_bits=quant or None, quant_compute=mode)
    cfg = model.cfg
    tcfg, cpcfg = cfg.talker, cfg.code_predictor
    dtype = model.dtype
    b = int(os.environ.get("TTS_BATCH", "1"))

    cache = make_talker_cache(tcfg, b, 640, dtype)
    # warm the cache state: pretend 100 frames in
    step_embeds = jnp.zeros((b, 1, tcfg.hidden_size), dtype)

    @jax.jit
    def talker_only(tp, emb, cache):
        def body(c, _):
            emb, cache = c
            logits, hidden, cache = talker_step(tp, tcfg, emb, cache)
            return (emb, cache), (logits, hidden)

        (_, cache), (logits, hidden) = jax.lax.scan(
            body, (emb, cache), None, length=REPS)
        return logits[-1], hidden[-1], cache

    logits, hidden, cache = talker_only(model.talker_params, step_embeds, cache)
    t_talker = bench(talker_only, model.talker_params, step_embeds, cache)

    key = jax.random.PRNGKey(0)

    @jax.jit
    def cp_only(cpp, tp, hidden, code0, key):
        def body(c, _):
            code0, key = c
            key, k = jax.random.split(key)
            codes = predict_codebooks(cpp, cpcfg, hidden.astype(dtype),
                                      embed_codec(tp, code0).astype(dtype), k,
                                      temperature=0.9, top_k=50)
            return (codes[:, 0], key), codes

        (_, _), codes = jax.lax.scan(body, (code0, key), None, length=REPS)
        return codes[-1]

    code0 = jnp.zeros((b,), jnp.int32)
    h0 = hidden  # talker_step already returns [B, H]
    t_cp = bench(cp_only, model.cp_params, model.talker_params, h0, code0, key)

    @jax.jit
    def embed_only(tp, cpp, code0, cp_codes):
        def body(c, _):
            code0, cp_codes = c
            e = embed_codec(tp, code0) + embed_all_groups(cpp, cpcfg, cp_codes)
            # derive next indices from e so XLA cannot hoist the body
            nxt0 = jnp.abs(e[:, 0]).astype(jnp.int32) % 16
            nxt = (cp_codes + nxt0[:, None]) % 64
            return (nxt0, nxt), e

        _, es = jax.lax.scan(body, (code0, cp_codes), None, length=REPS)
        return es[-1]

    cp_codes = jnp.zeros((b, 15), jnp.int32)
    t_embed = bench(embed_only, model.talker_params, model.cp_params, code0, cp_codes)

    total = t_talker + t_cp + t_embed
    print(f"mode={mode} quant={quant} batch={b}: talker {t_talker*1e3:.2f} ms, "
          f"cp-chain {t_cp*1e3:.2f} ms, embeds {t_embed*1e3:.2f} ms "
          f"-> frame {total*1e3:.2f} ms (RTF ~{total/0.080:.4f}; "
          f"jit-boundary overhead excluded)", file=sys.stderr)


if __name__ == "__main__":
    main()

"""Multi-host dryrun: 2 processes × N virtual CPU devices, dp over DCN.

Proves the SURVEY §2h multi-host half without pod hardware: the parent
spawns two child processes; each initializes ``jax.distributed`` against a
shared coordinator, builds ONE GLOBAL (dp, tp) mesh whose dp axis splits
on the process boundary (the DCN axis), shards a tiny Qwen3-ASR over it,
and runs ``transcribe_batch`` on the same global batch. Each process
stages only its addressable dp rows (parallel.mesh.put_global); outputs
return over a cross-host all-gather. The parent asserts:

- both processes report the SAME transcripts (SPMD consistency over DCN);
- those transcripts equal a single-process reference run with the same
  seeds (multi-host sharding changes placement, not results);
- the batch sharding really spans both processes (addressable rows <
  global rows in each child).

Usage:  python scripts/multihost_dryrun.py            # parent: spawn+verify
        python scripts/multihost_dryrun.py --child I  # internal
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_PROC = 2
DEV_PER_PROC = 4
BATCH = 8
MAX_TOKENS = 5


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _child(args) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR, config_tiny
    from qwen3_asr_swift_tpu.parallel import init_distributed, make_mesh

    init_distributed(coordinator_address=args.coordinator,
                     num_processes=N_PROC, process_id=args.child)
    assert jax.process_count() == N_PROC, jax.process_count()
    n_global = N_PROC * DEV_PER_PROC
    assert jax.device_count() == n_global, jax.device_count()

    # dp=4 × tp=2 over 8 global devices: device order is process-major, so
    # dp rows 0-1 live on process 0 and rows 2-3 on process 1 — dp IS the
    # process/DCN axis; tp pairs stay within one process (ICI analog)
    mesh = make_mesh(n_global, dp=4, tp=2)
    procs_on_dp = {d.process_index for d in mesh.devices[:, 0].flat}
    assert len(procs_on_dp) == N_PROC, f"dp axis does not span processes: {procs_on_dp}"

    model = Qwen3ASR.init_random(config_tiny(), dtype=np.float32,
                                 audio_buckets_s=(8,))
    model.shard(mesh=mesh)

    rng = np.random.default_rng(0)
    audios = [(0.1 * rng.standard_normal(16000)).astype(np.float32)
              for _ in range(BATCH)]
    results = model.transcribe_batch(audios, max_tokens=MAX_TOKENS)

    stag = model.last_staging
    local_rows = stag["per_device_shape"][0] * DEV_PER_PROC // mesh.shape["tp"]
    out = {
        "process": args.child,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": len(jax.local_devices()),
        "mesh": dict(mesh.shape),
        "staged_batch": stag["batch"],
        "per_device_rows": stag["per_device_shape"][0],
        "local_rows": local_rows,
        "texts": [r.text for r in results],
    }
    print("CHILD_RESULT " + json.dumps(out), flush=True)


def _reference_texts() -> list:
    """Single-process reference run (same seeds, no distributed init)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR, config_tiny

    model = Qwen3ASR.init_random(config_tiny(), dtype=np.float32,
                                 audio_buckets_s=(8,))
    rng = np.random.default_rng(0)
    audios = [(0.1 * rng.standard_normal(16000)).astype(np.float32)
              for _ in range(BATCH)]
    return [r.text for r in model.transcribe_batch(audios, max_tokens=MAX_TOKENS)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--coordinator", type=str, default=None)
    args = ap.parse_args()
    if args.child is not None:
        _child(args)
        return

    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                   + f" --xla_force_host_platform_device_count={DEV_PER_PROC}").strip(),
    )
    env.pop("JAX_PLATFORM_NAME", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(Path(__file__).resolve()),
             "--child", str(i), "--coordinator", coordinator],
            env=env, cwd=str(REPO),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(N_PROC)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    failed = [i for i, p in enumerate(procs) if p.returncode != 0]
    if failed:
        for i, out in enumerate(outs):
            print(f"--- child {i} output ---\n{out}", file=sys.stderr)
        raise SystemExit(f"multihost children failed: {failed}")

    results = {}
    for i, out in enumerate(outs):
        for line in out.splitlines():
            if line.startswith("CHILD_RESULT "):
                results[i] = json.loads(line[len("CHILD_RESULT "):])
    assert set(results) == set(range(N_PROC)), f"missing child results: {results.keys()}"

    r0, r1 = results[0], results[1]
    assert r0["process_count"] == N_PROC and r0["global_devices"] == N_PROC * DEV_PER_PROC
    assert r0["local_devices"] == DEV_PER_PROC
    assert r0["texts"] == r1["texts"], "processes disagree on transcripts"
    # each process only held half the dp rows
    assert r0["local_rows"] == BATCH // N_PROC, r0
    ref = _reference_texts()
    assert r0["texts"] == ref, f"multi-host texts diverge from single-process: {r0['texts']} vs {ref}"
    print(f"multihost dryrun OK: {N_PROC} processes x {DEV_PER_PROC} devices, "
          f"mesh {r0['mesh']}, batch {BATCH} -> {r0['local_rows']} rows/process "
          f"(dp across DCN), transcripts identical across processes and to "
          f"single-process")


if __name__ == "__main__":
    main()

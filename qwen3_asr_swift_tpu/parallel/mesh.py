"""Device mesh construction and parameter sharding rules.

NEW subsystem with no reference counterpart — the reference is single-
process single-device (SURVEY.md §2h). Scaling here is jax.sharding-native:

- ``dp`` axis: data parallelism over batch slots (continuous batching packs
  independent utterances; weights replicated across dp).
- ``tp`` axis: tensor parallelism over ICI for the larger decoders —
  attention heads and MLP intermediate dims are sharded column/row-wise so
  each layer needs exactly one psum (inserted automatically by XLA from the
  shardings).
- ``sp`` (design note): the Qwen3 audio encoder's 104-token attention
  windows never attend across window boundaries, so its window dimension is
  embarrassingly sequence-parallel — it rides the dp axis here (windows are
  the batch dim of the encoder), no ring attention needed until a single
  window exceeds chip HBM, which cannot happen at 104 tokens.

Sharding is applied by path-pattern rules with divisibility fallback:
a rule only applies if the named axis divides the dimension; otherwise the
leaf is replicated (e.g. the 0.6B encoder's 14 attention heads don't
divide tp=4 — its FFN still shards).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime (SURVEY §2h: DCN for multi-host DP).

    On a real TPU pod slice the three arguments come from the launcher env
    and may all be None (jax auto-detects); for CPU-simulated multi-host
    tests pass them explicitly (scripts/multihost_dryrun.py). After this,
    ``jax.devices()`` is the GLOBAL device list and ``make_mesh`` builds a
    process-spanning mesh: lay out ``dp`` so its rows split on process
    boundaries (jax device order is process-major, so any dp that is a
    multiple of the per-process row count does) — dp gradients/batches then
    ride DCN between hosts while tp collectives stay on intra-host ICI.

    Idempotent: a second call is a no-op (jax.distributed raises on
    re-initialization; serving respawn paths re-enter this)."""
    if getattr(init_distributed, "_done", False):
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    init_distributed._done = True


def spans_processes(mesh: Mesh) -> bool:
    """True when the mesh includes devices of other processes (multi-host)."""
    pid = jax.process_index()
    return any(d.process_index != pid for d in mesh.devices.flat)


def put_global(x, sharding: NamedSharding):
    """``device_put`` that also works on process-spanning shardings.

    Single-process: plain ``jax.device_put``. Multi-host: every process
    calls this with the same global value (SPMD discipline) and each
    process materializes only its addressable shards — the per-shard
    callback slices the host array, so non-local rows are never
    transferred by this process."""
    if not spans_processes(sharding.mesh):
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: Optional[int] = None, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. Defaults: all devices on dp.

    After ``init_distributed`` the default device list is global
    (process-major order), so dp rows split on process boundaries and the
    dp axis becomes the DCN axis of SURVEY §2h."""
    if devices is None:
        devices = jax.devices()
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(
            f"make_mesh needs {n} devices but only {len(devices)} are visible; "
            "for CPU simulation set JAX_PLATFORMS=cpu and "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} before jax initializes"
        )
    devices = devices[:n]
    if tp is None and dp is None:
        dp, tp = n, 1
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != devices({n})")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


# (path regex, PartitionSpec) — first match wins. Paths are "/"-joined key
# sequences like "layers/3/mlp/gate_proj/kernel".
QWEN3_DECODER_RULES: Sequence[Tuple[str, P]] = (
    (r".*(q_proj|k_proj|v_proj)/kernel$", P(None, "tp")),   # col-parallel
    (r".*o_proj/kernel$", P("tp", None)),                    # row-parallel
    (r".*(gate_proj|up_proj)/kernel$", P(None, "tp")),
    (r".*down_proj/kernel$", P("tp", None)),
    (r".*embed_tokens$", P("tp", None)),                     # vocab-sharded
    # group-quantized variants (ops/quant dicts): codes/scales/biases are
    # [out, packed_in] / [out, groups] — column-parallel shards OUT (dim 0),
    # row-parallel shards the packed input axis (dim 1)
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)/(codes|scales|biases)$", P("tp", None)),
    (r".*(o_proj|down_proj)/(codes|scales|biases)$", P(None, "tp")),
    (r".*embed_tokens/(codes|scales|biases)$", P("tp", None)),  # vocab-sharded
    (r".*", P()),                                            # replicate rest
)

# PersonaPlex 7B (d_model 4096 — the family that actually needs TP over ICI).
# Temporal layers share the q/k/v/o + gate/up/down naming; the depformer's
# per-step MultiLinear banks are [steps, in, out] — column-parallel shards
# the out axis (dim 2), row-parallel the in axis (dim 1).
PERSONAPLEX_RULES: Sequence[Tuple[str, P]] = (
    (r".*(q_proj|k_proj|v_proj)/kernel$", P(None, "tp")),
    (r".*o_proj/kernel$", P("tp", None)),
    (r".*(gate_proj|up_proj)/kernel$", P(None, "tp")),
    (r".*down_proj/kernel$", P("tp", None)),
    (r".*text_head/kernel$", P(None, "tp")),
    (r".*dep_layers/\d+/(in_proj|gating_in)$", P(None, None, "tp")),
    (r".*dep_layers/\d+/(out_proj|gating_out)$", P(None, "tp", None)),
    (r".*dep_heads_bank$", P(None, None, "tp")),
    (r".*", P()),
)

QWEN3_ENCODER_RULES: Sequence[Tuple[str, P]] = (
    (r".*fc1/kernel$", P(None, "tp")),
    (r".*fc2/kernel$", P("tp", None)),
    (r".*(q_proj|k_proj|v_proj)/kernel$", P(None, "tp")),
    (r".*out_proj/kernel$", P("tp", None)),
    (r".*conv_out/kernel$", P(None, "tp")),
    (r".*proj1/kernel$", P(None, "tp")),
    (r".*proj2/kernel$", P("tp", None)),
    (r".*", P()),
)


def _spec_fits(spec: P, shape, mesh: Mesh) -> bool:
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        axes = (axis,) if isinstance(axis, str) else tuple(axis)
        size = int(np.prod([mesh.shape[a] for a in axes]))
        if dim >= len(shape) or shape[dim] % size != 0:
            return False
    return True


def shard_pytree(tree, mesh: Mesh, rules: Sequence[Tuple[str, P]]):
    """Place every leaf according to the first matching rule whose
    sharding divides the leaf's shape (replicate otherwise). Works on
    process-spanning meshes: each process stores only its addressable
    shards (put_global)."""
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def place(path, leaf):
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        for pat, spec in compiled:
            if pat.match(name):
                if _spec_fits(spec, getattr(leaf, "shape", ()), mesh):
                    return put_global(leaf, NamedSharding(mesh, spec))
                break
        return put_global(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda leaf: put_global(leaf, NamedSharding(mesh, P())), tree
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over dp."""
    return NamedSharding(mesh, P("dp"))

"""Device mesh + sharding (DP/TP over ICI; window-dim sequence parallelism)."""

from .mesh import (  # noqa: F401
    PERSONAPLEX_RULES,
    QWEN3_DECODER_RULES,
    QWEN3_ENCODER_RULES,
    batch_sharding,
    init_distributed,
    make_mesh,
    put_global,
    replicate,
    shard_pytree,
    spans_processes,
)

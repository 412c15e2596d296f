"""Device mesh + sharding (DP/TP over ICI; window-dim sequence parallelism)."""

from .mesh import (  # noqa: F401
    PERSONAPLEX_RULES,
    QWEN3_DECODER_RULES,
    QWEN3_ENCODER_RULES,
    batch_sharding,
    make_mesh,
    replicate,
    shard_pytree,
)

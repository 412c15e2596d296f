"""Speaker diarization pipeline + DER scoring."""

from .pipeline import (  # noqa: F401
    DiarizationConfig,
    DiarizationPipeline,
    agglomerative_cluster,
    diarization_error_rate,
)

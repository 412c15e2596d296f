"""Voice-agent pipeline: C++ engine + Python bindings."""

from .engine import (  # noqa: F401
    PipelineConfig,
    PipelineEvent,
    PipelineEventType,
    PipelineState,
    VoicePipeline,
    ensure_library,
    tool_call,
)

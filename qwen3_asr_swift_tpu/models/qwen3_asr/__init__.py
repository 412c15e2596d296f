"""Qwen3-ASR: encoder-decoder ASR (0.6B/1.7B), forced aligner, streaming."""

from .config import (  # noqa: F401
    CONFIG_LARGE,
    CONFIG_SMALL,
    AudioEncoderConfig,
    Qwen3ASRConfig,
    TextDecoderConfig,
    config_tiny,
    detect_config,
)
from .model import Qwen3ASR  # noqa: F401
from .aligner import Qwen3ForcedAligner, enforce_monotonicity, slot_text  # noqa: F401
from .streaming import StreamingASR, StreamingASRConfig, longest_common_prefix  # noqa: F401

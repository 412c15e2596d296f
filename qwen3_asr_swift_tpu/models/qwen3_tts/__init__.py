"""Qwen3-TTS: talker + code predictor + speech tokenizer decoder."""

from .config import (  # noqa: F401
    CONFIG_06B,
    CONFIG_17B,
    CodecTokens,
    Qwen3TTSConfig,
    config_tiny,
)
from .codec import CodecDecoder, codec_decode, init_codec_params  # noqa: F401
from .model import Qwen3TTS, TTSSamplingConfig  # noqa: F401

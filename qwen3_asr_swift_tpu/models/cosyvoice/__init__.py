"""CosyVoice3 TTS: LLM → flow-matching DiT → HiFi-GAN, voice cloning, dialogue."""

from .model import (  # noqa: F401
    CONFIG_05B,
    CosyVoiceConfig,
    CosyVoiceTTS,
    config_tiny,
    parse_dialogue,
)

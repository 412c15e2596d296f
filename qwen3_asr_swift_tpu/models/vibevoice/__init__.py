"""VibeVoice TTS: LM + DPM-Solver diffusion head over acoustic VAE latents."""

from .model import (  # noqa: F401
    CONFIG_05B,
    VibeVoiceConfig,
    VibeVoiceTTS,
    config_tiny,
)

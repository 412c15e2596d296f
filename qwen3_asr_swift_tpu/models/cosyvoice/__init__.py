"""CosyVoice3 TTS: LLM → flow-matching DiT → HiFT vocoder, voice cloning, dialogue."""

from .dit import (  # noqa: F401
    CosyDiTConfig,
    CosyFlowConfig,
    dit_forward,
    flow_generate,
    init_flow_params,
)
from .hift import CosyHiFTConfig, hift_generate, init_hift_params  # noqa: F401
from .model import (  # noqa: F401
    CONFIG_05B,
    CosyVoiceConfig,
    CosyVoiceTTS,
    Voice,
    config_tiny,
    parse_dialogue,
)

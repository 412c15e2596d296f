"""Speech enhancement (DeepFilterNet3-style)."""

from .model import (  # noqa: F401
    SpeechEnhancer,
    StreamingEnhancer,
    erb_filterbank,
    init_dfn_params,
)

"""Speech enhancement (DeepFilterNet3-style)."""

from .model import SpeechEnhancer, erb_filterbank, init_dfn_params  # noqa: F401

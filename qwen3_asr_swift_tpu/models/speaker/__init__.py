"""Speaker embedding models (WeSpeaker ResNet34)."""

from .model import WeSpeaker, init_wespeaker_params, wespeaker_forward  # noqa: F401

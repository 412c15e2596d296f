"""Serving: continuous batching + REST/WebSocket server."""

from .batching import ContinuousBatcher  # noqa: F401
from .server import ModelRegistry, SpeechServer, build_default_registry  # noqa: F401

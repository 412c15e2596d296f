"""Qwen3.5 hybrid chat LLM (DeltaNet + gated attention)."""

from .model import CONFIG_08B, ChatConfig, Qwen3Chat, config_tiny, init_chat_params  # noqa: F401

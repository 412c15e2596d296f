"""Keyword spotting: streaming encoder + Aho-Corasick context graph."""

from .context_graph import ContextGraph, Keyword, StreamingKeywordDecoder  # noqa: F401
from .model import WakeWordDetector, init_kws_params  # noqa: F401

"""Tokenizers: Qwen byte-level BPE and SentencePiece reader."""

from .bpe import BPETokenizer, StreamingDecoder  # noqa: F401
from .sentencepiece_model import SentencePieceModel  # noqa: F401

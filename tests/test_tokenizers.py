"""Tokenizer unit tests: BPE merge logic, byte-level round-trips across
UTF-8/CJK boundaries, streaming decoder, SentencePiece protobuf parsing.

Mirrors the reference's 34 tokenizer decode cases
(reference: Tests/Qwen3ASRTests/Qwen3ASRTests.swift:296-453).
"""

import struct

import numpy as np
import pytest

from qwen3_asr_swift_tpu.tokenizers.bpe import BPETokenizer, StreamingDecoder, _bytes_to_unicode
from qwen3_asr_swift_tpu.tokenizers.sentencepiece_model import SentencePieceModel


def make_byte_tokenizer(extra_specials=None):
    """A tokenizer whose vocab is exactly the 256 byte symbols (no merges):
    every string round-trips through per-byte tokens."""
    b2u = _bytes_to_unicode()
    vocab = {ch: i for i, ch in enumerate(b2u[b] for b in range(256))}
    specials = {}
    base = 256
    for i, tok in enumerate(extra_specials or []):
        specials[tok] = base + i
    return BPETokenizer(vocab, [], specials)


class TestBPE:
    def test_ascii_roundtrip(self):
        tok = make_byte_tokenizer()
        text = "Hello, world! 123"
        assert tok.decode(tok.encode(text)) == text

    @pytest.mark.parametrize(
        "text",
        [
            "你好世界",                 # CJK
            "日本語のテスト",            # Japanese
            "한국어 테스트",             # Korean
            "Привет мир",             # Cyrillic
            "éàüßñ",                  # Latin accents
            "🎤 emoji test 🔊",        # astral-plane emoji
            "mixed 中文 and English",
        ],
    )
    def test_unicode_roundtrip(self, text):
        tok = make_byte_tokenizer()
        assert tok.decode(tok.encode(text)) == text

    def test_merges_apply_in_rank_order(self):
        vocab = {"a": 0, "b": 1, "c": 2, "ab": 3, "abc": 4, "bc": 5}
        merges = [("a", "b"), ("ab", "c")]
        tok = BPETokenizer(vocab, merges)
        assert tok._bpe("abc") == ["abc"]
        merges2 = [("b", "c"), ("a", "b")]
        tok2 = BPETokenizer(vocab, merges2)
        assert tok2._bpe("abc") == ["a", "bc"]

    def test_special_tokens_not_split(self):
        tok = make_byte_tokenizer(["<|im_start|>", "<|im_end|>"])
        ids = tok.encode("<|im_start|>hi<|im_end|>")
        assert ids[0] == tok.special_tokens["<|im_start|>"]
        assert ids[-1] == tok.special_tokens["<|im_end|>"]
        assert tok.decode(ids) == "<|im_start|>hi<|im_end|>"
        assert tok.decode(ids, skip_special=True) == "hi"

    def test_invalid_bytes_replaced_not_raised(self):
        tok = make_byte_tokenizer()
        b2u = _bytes_to_unicode()
        # A lone continuation byte is invalid UTF-8.
        bad_id = tok.vocab[b2u[0x80]]
        out = tok.decode([bad_id])
        assert "�" in out


class TestStreamingDecoder:
    def test_cjk_split_across_pushes(self):
        tok = make_byte_tokenizer()
        text = "中文流式"
        ids = tok.encode(text)  # one token per UTF-8 byte here
        dec = StreamingDecoder(tok)
        pieces = [dec.push(i) for i in ids]
        pieces.append(dec.finish())
        joined = "".join(pieces)
        assert joined == text
        # No replacement chars mid-stream: bytes were withheld until complete.
        assert "�" not in joined

    def test_ascii_immediate(self):
        tok = make_byte_tokenizer()
        dec = StreamingDecoder(tok)
        out = dec.push(tok.encode("a")[0])
        assert out == "a"


def _varint(value: int) -> bytes:
    out = b""
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def _sp_piece(piece: str, score: float, ptype: int) -> bytes:
    body = b"\x0a" + _varint(len(piece.encode())) + piece.encode()
    body += b"\x15" + struct.pack("<f", score)
    body += b"\x18" + _varint(ptype)
    return b"\x0a" + _varint(len(body)) + body


class TestSentencePiece:
    def build(self, tmp_path):
        data = b"".join(
            [
                _sp_piece("<unk>", 0.0, SentencePieceModel.UNKNOWN),
                _sp_piece("<s>", 0.0, SentencePieceModel.CONTROL),
                _sp_piece("▁hello", -1.0, SentencePieceModel.NORMAL),
                _sp_piece("▁world", -1.5, SentencePieceModel.NORMAL),
                _sp_piece("ing", -2.0, SentencePieceModel.NORMAL),
                _sp_piece("<0xE4>", -3.0, SentencePieceModel.BYTE),
                _sp_piece("<0xB8>", -3.0, SentencePieceModel.BYTE),
                _sp_piece("<0xAD>", -3.0, SentencePieceModel.BYTE),
            ]
        )
        path = tmp_path / "test.model"
        path.write_bytes(data)
        return SentencePieceModel.load(path)

    def test_parse(self, tmp_path):
        sp = self.build(tmp_path)
        assert len(sp.pieces) == 8
        assert sp.pieces[2][0] == "▁hello"
        assert abs(sp.pieces[2][1] + 1.0) < 1e-6
        assert sp.unk_id == 0

    def test_decode_with_byte_pieces(self, tmp_path):
        sp = self.build(tmp_path)
        # "中" = E4 B8 AD
        ids = [sp.piece_to_id["▁hello"], sp.piece_to_id["<0xE4>"],
               sp.piece_to_id["<0xB8>"], sp.piece_to_id["<0xAD>"]]
        assert sp.decode(ids) == "hello中"

    def test_encode_greedy(self, tmp_path):
        sp = self.build(tmp_path)
        ids = sp.encode("hello world")
        assert ids[0] == sp.piece_to_id["▁hello"]
        assert ids[1] == sp.piece_to_id["▁world"]
        assert sp.decode(ids) == "hello world"


class TestPretokenizeRegressions:
    def test_digit_runs_split_in_threes(self):
        """Qwen2 splits number runs into 1-3 digit groups; folding digits
        into \\w merged whole runs into one pretoken."""
        from qwen3_asr_swift_tpu.tokenizers.bpe import _PRETOKENIZE

        assert _PRETOKENIZE.findall("12345") == ["123", "45"]
        assert _PRETOKENIZE.findall("abc123def") == ["abc", "123", "def"]
        assert _PRETOKENIZE.findall("a1b2") == ["a", "1", "b", "2"]

    def test_spm_byte_fallback_is_utf8(self):
        """Out-of-vocab chars fall back to their UTF-8 bytes as <0xXX>
        pieces (masking the codepoint corrupted all non-latin1 text)."""
        from qwen3_asr_swift_tpu.tokenizers.sentencepiece_model import SentencePieceModel as M

        pieces = ([("<unk>", 0.0, M.UNKNOWN)]
                  + [(f"<0x{b:02X}>", -1.0, M.BYTE) for b in range(256)]
                  + [("▁hi", -1.0, M.NORMAL)])
        m = M(pieces)
        assert m.decode(m.encode("hi 中")) == "hi 中"
        assert m.decode(m.encode("héllo")) == "héllo"

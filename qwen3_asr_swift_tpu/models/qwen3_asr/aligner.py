"""Qwen3 forced aligner: non-autoregressive word-level timestamps.

TPU-native re-design of the reference aligner
(reference: Sources/Qwen3ASR/ForcedAligner.swift:226-331,
TextPreprocessing.swift:48-87, TimestampCorrection.swift:15-144):

- text is slotted with a ``<|timestamp|>`` token before and after each
  word; the prompt is [chat prefix | audio block | slotted text];
- ONE non-autoregressive forward (the 5000-class timestamp head applies to
  hidden states at the slot positions; each class = 80 ms);
- argmax per slot → LIS-based monotonicity correction with interpolation
  (pure numpy, host side);
- ``align_long`` re-chunks audio beyond ``max_chunk_s`` and detects
  trailing timestamp plateaus (the model saturating at its usable horizon),
  realigning the remaining words against the remaining audio
  (reference: ForcedAligner.alignLong, :100-216).

TPU shape: the forward reuses the decoder ``prefill`` program (causal
attention, static [prefix | audio-bucket | text-bucket] layout with a
validity mask); timestamp-slot gathers are host-known indices.
"""

from __future__ import annotations

import dataclasses
import re
import unicodedata
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import AlignedWord, ForcedAlignmentModel
from ...ops.nn import init_linear, linear
from ...tokenizers.bpe import BPETokenizer
from .config import ENCODER_ALIGNER, Qwen3ASRConfig, config_tiny
from .decoder import init_decoder_params, make_cache, prefill
from .encoder import encode, init_encoder_params
from .model import Qwen3ASR, _round_block


# ---------------------------------------------------------------------------
# Text slotting (host)
# ---------------------------------------------------------------------------

_CJK_LANGS = ("chinese", "zh", "japanese", "ja", "korean", "ko", "thai", "th")


def split_word_pairs(text: str, language: str = "English") -> List[Tuple[str, str]]:
    """(surface, cleaned) pairs. Whitespace-split for space-delimited
    scripts; per-character for CJK. Surface keeps punctuation, cleaned is
    what the tokenizer sees (reference: TextPreprocessing.splitIntoWordPairs)."""
    lang = language.lower()
    pairs: List[Tuple[str, str]] = []
    if any(l in lang for l in _CJK_LANGS):
        for ch in text:
            if ch.isspace():
                continue
            cleaned = ch if not unicodedata.category(ch).startswith("P") else ""
            if cleaned:
                pairs.append((ch, cleaned))
            elif pairs:
                pairs[-1] = (pairs[-1][0] + ch, pairs[-1][1])
        return pairs
    for word in text.split():
        cleaned = re.sub(r"^[\W_]+|[\W_]+$", "", word, flags=re.UNICODE)
        pairs.append((word, cleaned))
    return pairs


@dataclasses.dataclass(frozen=True)
class SlottedText:
    token_ids: List[int]
    timestamp_positions: List[int]  # indices into token_ids
    words: List[str]                # surface forms


def slot_text(text: str, tokenizer: BPETokenizer, timestamp_id: int,
              language: str = "English") -> SlottedText:
    """<|timestamp|> word <|timestamp|> per word; unencodable words attach
    their surface to the previous word (reference: TextPreprocessing:60-80)."""
    token_ids: List[int] = []
    ts_positions: List[int] = []
    words: List[str] = []
    for surface, cleaned in split_word_pairs(text, language):
        word_tokens = tokenizer.encode(cleaned) if cleaned else []
        if not word_tokens:
            if words:
                words[-1] += surface
            continue
        ts_positions.append(len(token_ids))
        token_ids.append(timestamp_id)
        token_ids.extend(word_tokens)
        ts_positions.append(len(token_ids))
        token_ids.append(timestamp_id)
        words.append(surface)
    return SlottedText(token_ids, ts_positions, words)


# ---------------------------------------------------------------------------
# Monotonicity correction (host)
# ---------------------------------------------------------------------------

def lis_positions(arr: Sequence[int]) -> List[int]:
    """Positions of a longest (strictly) increasing subsequence, O(n log n)
    (reference: TimestampCorrection.longestIncreasingSubsequencePositions)."""
    n = len(arr)
    if n == 0:
        return []
    tails: List[int] = []
    tail_idx: List[int] = []
    parent = [-1] * n
    import bisect

    for i, x in enumerate(arr):
        lo = bisect.bisect_left(tails, x)
        if lo == len(tails):
            tails.append(x)
            tail_idx.append(i)
        else:
            tails[lo] = x
            tail_idx[lo] = i
        parent[i] = tail_idx[lo - 1] if lo > 0 else -1

    out = []
    idx = tail_idx[len(tails) - 1]
    while idx != -1:
        out.append(idx)
        idx = parent[idx]
    out.reverse()
    return out


def enforce_monotonicity(raw: Sequence[int]) -> List[int]:
    """Keep the LIS as anchors; repair outliers by nearest-anchor (gaps ≤3)
    or linear interpolation, then clamp to non-decreasing
    (reference: TimestampCorrection.enforceMonotonicity)."""
    raw = list(raw)
    if len(raw) <= 1:
        return raw
    anchors_pos = lis_positions(raw)
    anchor_set = set(anchors_pos)
    if len(anchors_pos) == len(raw):
        return raw
    anchors = [(p, raw[p]) for p in anchors_pos]
    corrected = raw[:]

    for i in range(len(raw)):
        if i in anchor_set:
            continue
        prev = None
        nxt = None
        for p, v in anchors:
            if p < i:
                prev = (p, v)
            elif p > i and nxt is None:
                nxt = (p, v)
        if prev and nxt:
            gap = nxt[0] - prev[0]
            if gap <= 3:
                corrected[i] = prev[1] if (i - prev[0]) <= (nxt[0] - i) else nxt[1]
            else:
                t = (i - prev[0]) / (nxt[0] - prev[0])
                corrected[i] = prev[1] + int(t * (nxt[1] - prev[1]))
        elif prev:
            corrected[i] = prev[1]
        elif nxt:
            corrected[i] = nxt[1]

    for i in range(1, len(corrected)):
        if corrected[i] < corrected[i - 1]:
            corrected[i] = corrected[i - 1]
    return corrected


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

class Qwen3ForcedAligner(ForcedAlignmentModel):
    """Non-autoregressive forced alignment with the Qwen3-ASR backbone."""

    def __init__(self, cfg: Qwen3ASRConfig, encoder_params, decoder_params,
                 classify_params, tokenizer: Optional[BPETokenizer] = None,
                 dtype=jnp.bfloat16, max_chunk_s: float = 240.0):
        base_buckets = (8, 16, 32, 64, 128, 320)
        self._asr = Qwen3ASR(cfg, encoder_params, decoder_params, tokenizer,
                             dtype=dtype, audio_buckets_s=base_buckets)
        self.cfg = cfg
        self.dtype = dtype
        self.tokenizer = tokenizer
        self.classify_params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), classify_params)
        self.max_chunk_s = max_chunk_s

        import functools

        @functools.partial(jax.jit, static_argnames=("a_pad", "prefix_block", "text_block"))
        def _align_forward(dec_params, cls_params, prefix_ids, prefix_len,
                           text_ids, text_len, audio_tokens, n_audio, ts_pos,
                           *, a_pad, prefix_block, text_block):
            dcfg = cfg.decoder
            from ...ops.nn import embedding_lookup

            table = dec_params["embed_tokens"]
            emb_prefix = embedding_lookup(table, prefix_ids, dcfg.hidden_size)
            embeds = jnp.concatenate(
                [
                    emb_prefix,
                    audio_tokens.astype(emb_prefix.dtype),
                    embedding_lookup(table, text_ids, dcfg.hidden_size),
                ],
                axis=0,
            )[None]
            valid = jnp.concatenate(
                [
                    jnp.arange(prefix_block) < prefix_len,
                    jnp.arange(a_pad) < n_audio,
                    jnp.arange(text_block) < text_len,
                ]
            )[None]
            t = embeds.shape[1]
            cache = make_cache(dcfg, 1, t, self.dtype)
            hidden, _ = prefill(dec_params, dcfg, embeds, valid, cache)
            # gather hidden at absolute timestamp positions [n_ts_pad]
            slots = hidden[0, prefix_block + a_pad + ts_pos]  # [n_ts_pad, hidden]
            logits = linear(slots, cls_params)  # [n_ts_pad, classify_num]
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        self._align_forward = _align_forward

    # -- constructors --------------------------------------------------------

    @classmethod
    def init_random(cls, cfg: Optional[Qwen3ASRConfig] = None, seed: int = 0,
                    dtype=jnp.bfloat16, tokenizer=None, **kw) -> "Qwen3ForcedAligner":
        if cfg is None:
            cfg = dataclasses.replace(config_tiny(), classify_num=100)
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        enc = init_encoder_params(k1, cfg.encoder, jnp.float32)
        dec = init_decoder_params(k2, cfg.decoder, jnp.float32)
        head = init_linear(k3, cfg.decoder.hidden_size, cfg.classify_num, bias=False, dtype=jnp.float32)
        return cls(cfg, enc, dec, head, tokenizer=tokenizer, dtype=dtype, **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "aufklarer/Qwen3-ForcedAligner-0.6B-4bit",
                        cache_dir=None, offline_mode: bool = False,
                        progress_handler=None, dtype=jnp.bfloat16, **kw) -> "Qwen3ForcedAligner":
        import dataclasses as dc

        from ...core.hub import download_weights
        from ...core.weights import load_safetensors, dequantize_mlx
        from .config import CONFIG_SMALL, detect_config
        from .convert import convert_decoder, convert_encoder, strip_prefixes

        cfg = dc.replace(detect_config(model_id), encoder=ENCODER_ALIGNER)
        model_dir = download_weights(
            model_id, cache_dir=cache_dir, offline_mode=offline_mode,
            additional_files=("vocab.json", "merges.txt", "tokenizer_config.json"),
        )
        tokenizer = BPETokenizer.from_pretrained_dir(model_dir)
        flat = strip_prefixes(load_safetensors(model_dir))
        enc = convert_encoder(flat, cfg)
        dec = convert_decoder(flat, cfg)
        head_w = flat["lm_head.weight"]
        if "lm_head.scales" in flat:
            head_w = dequantize_mlx(head_w, flat["lm_head.scales"], flat["lm_head.biases"],
                                    bits=cfg.decoder.bits, group_size=cfg.decoder.group_size)
        head = {"kernel": np.ascontiguousarray(head_w.T)}
        return cls(cfg, enc, dec, head, tokenizer=tokenizer, dtype=dtype, **kw)

    # -- alignment -----------------------------------------------------------

    def _raw_indices(self, audio: np.ndarray, slotted: SlottedText) -> List[int]:
        asr = self._asr
        padded, n_valid, bucket = asr._prepare_audio(audio, 16000)
        audio_tokens, n_audio = asr._encode_audio_batch(
            asr.encoder_params, jnp.asarray(padded)[None], jnp.asarray([n_valid], np.int32), bucket
        )
        a_pad = audio_tokens.shape[1]

        c = self.cfg
        prefix = [c.im_start_id, c.system_id, c.newline_id, c.eos_id, c.newline_id,
                  c.im_start_id, c.user_id, c.newline_id, c.audio_start_id]
        # audio_end + im_end + \n + im_start assistant \n then slotted text
        text_ids = [c.audio_end_id, c.eos_id, c.newline_id,
                    c.im_start_id, c.assistant_id, c.newline_id] + slotted.token_ids
        text_offset = 6

        pb = _round_block(len(prefix))
        tb = _round_block(len(text_ids), 128)
        prefix_arr = np.zeros(pb, np.int32)
        prefix_arr[: len(prefix)] = prefix
        text_arr = np.zeros(tb, np.int32)
        text_arr[: len(text_ids)] = text_ids

        ts_pos = np.asarray([p + text_offset for p in slotted.timestamp_positions], np.int32)
        ts_block = _round_block(len(ts_pos), 64)
        ts_padded = np.zeros(ts_block, np.int32)
        ts_padded[: len(ts_pos)] = ts_pos

        idx = self._align_forward(
            self._asr.decoder_params, self.classify_params,
            jnp.asarray(prefix_arr), jnp.asarray(len(prefix), jnp.int32),
            jnp.asarray(text_arr), jnp.asarray(len(text_ids), jnp.int32),
            audio_tokens[0], n_audio[0], jnp.asarray(ts_padded),
            a_pad=a_pad, prefix_block=pb, text_block=tb,
        )
        return np.asarray(idx)[: len(ts_pos)].tolist()

    def align(self, audio: np.ndarray, text: str, sample_rate: int = 16000,
              language: str = "English", **kwargs) -> Sequence[AlignedWord]:
        if self.tokenizer is None:
            raise RuntimeError("aligner requires a tokenizer")
        if sample_rate != 16000:
            from ...audio.resample import resample

            audio = resample(audio.astype(np.float32), sample_rate, 16000)
        duration = len(audio) / 16000.0
        if duration > self.max_chunk_s:
            return self.align_long(audio, text, language=language)

        slotted = slot_text(text, self.tokenizer, self.cfg.timestamp_id, language)
        if not slotted.words:
            return []
        raw = self._raw_indices(audio, slotted)
        corrected = enforce_monotonicity(raw)

        seg = self.cfg.timestamp_segment_time
        out: List[AlignedWord] = []
        for wi, word in enumerate(slotted.words):
            si, ei = 2 * wi, 2 * wi + 1
            if ei >= len(corrected):
                break
            start = corrected[si] * seg
            end = max(corrected[ei] * seg, start)
            out.append(AlignedWord(word=word, start=start, end=end))
        return out

    def align_long(self, audio: np.ndarray, text: str, language: str = "English",
                   plateau_window: int = 6) -> Sequence[AlignedWord]:
        """Chunked alignment for audio beyond the model's usable horizon:
        align a chunk, drop trailing plateau words (timestamps saturated at
        the chunk edge), then realign the remaining words against the
        remaining audio (reference: ForcedAligner.alignLong :100-216)."""
        sr = 16000
        chunk_samples = int(self.max_chunk_s * sr)
        # advance over slot_text's MERGED word list (punct-only and
        # unencodable tokens attach to the previous word), the same units
        # align() returns — advancing the raw split_word_pairs surfaces by
        # merged-word counts duplicated or skipped words across chunks.
        # The merge is stable under re-joining: slot_text(" ".join(words))
        # regroups to the same list.
        surfaces = slot_text(text, self.tokenizer, self.cfg.timestamp_id,
                             language).words
        aligned: List[AlignedWord] = []
        offset_s = 0.0
        pos = 0

        while pos < len(audio) and surfaces:
            chunk = audio[pos : pos + chunk_samples]
            chunk_words = self.align(chunk, " ".join(surfaces), language=language)
            if not chunk_words:
                break
            is_last_chunk = pos + chunk_samples >= len(audio)
            if is_last_chunk:
                keep = len(chunk_words)
            else:
                # trailing plateau: last words stuck at ~the same timestamp
                keep = len(chunk_words)
                if len(chunk_words) > plateau_window:
                    tail = chunk_words[-plateau_window:]
                    if tail[-1].end - tail[0].start < 0.2:
                        while keep > 1 and chunk_words[keep - 1].start >= tail[0].start:
                            keep -= 1
            for w in chunk_words[:keep]:
                aligned.append(AlignedWord(w.word, w.start + offset_s, w.end + offset_s, w.confidence))
            surfaces = surfaces[keep:]
            if not surfaces:
                break
            # resume audio just after the last kept word
            resume_s = max(chunk_words[keep - 1].end, 0.0)
            advance = int(resume_s * sr)
            if advance <= 0:
                advance = chunk_samples
            pos += min(advance, chunk_samples)
            offset_s = pos / sr
        return aligned

"""Streaming RNNT ASR: cache-aware conformer + LSTM prediction net +
on-device greedy decode + <EOU> turn detection.

TPU-native analog of the reference's ParakeetStreamingASR (EOU 120M) and
NemotronStreamingASR (reference:
Sources/ParakeetStreamingASR/StreamingSession.swift:10-397 — encoder
caches + LSTM h/c as session state, per-chunk RNNT greedy, <EOU> with
1280 ms debounce splitting finals from partials;
Sources/NemotronStreamingASR/NemotronStreamingASR.swift:13-137 — same
pattern, English 0.6B). The reference drives the RNNT loop on the host
with one ANE call per joint step; here the whole chunk —
subsample → 17-layer conformer → per-frame RNNT greedy with
max-symbols-per-frame cap — is ONE jitted program, and only the emitted
token ids (a few int32s) cross back to the host per chunk.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...core import PartialTranscription, SpeechRecognitionModel, TranscriptionResult
from ...core.logging import inference as log
from ..parakeet.model import lstm_step
from .config import CONFIG_EOU_120M, CONFIG_NEMOTRON_06B, StreamingConformerConfig, config_tiny
from .encoder import (
    EncoderCaches,
    encode_chunk,
    init_caches,
    init_encoder_params,
    streaming_log_mel,
)


@dataclasses.dataclass(frozen=True)
class StreamingResult:
    """Per-chunk decode outcome surfaced to the session."""

    text: str
    is_final: bool
    confidence: float
    eou_detected: bool
    segment_index: int


def init_decoder_params(key, cfg: StreamingConformerConfig, dtype=jnp.float32) -> dict:
    from ...ops.nn import init_linear

    ks = jax.random.split(key, 4 + cfg.decoder_layers)
    dh = cfg.decoder_hidden
    layers = []
    for i in range(cfg.decoder_layers):
        k1, k2 = jax.random.split(ks[4 + i])
        d_in = dh
        layers.append({
            "wx": (jax.random.normal(k1, (d_in, 4 * dh)) * 0.02).astype(dtype),
            "wh": (jax.random.normal(k2, (dh, 4 * dh)) * 0.02).astype(dtype),
            "bias": jnp.zeros((4 * dh,), dtype),
        })
    return {
        "embed": (jax.random.normal(ks[0], (cfg.vocab_size + 1, cfg.decoder_hidden)) * 0.02).astype(dtype),
        "lstm": layers,
        "joint_enc": init_linear(ks[1], cfg.encoder_hidden, cfg.joint_hidden, dtype=dtype),
        "joint_pred": init_linear(ks[2], cfg.decoder_hidden, cfg.joint_hidden, dtype=dtype),
        "joint_out": init_linear(ks[3], cfg.joint_hidden, cfg.vocab_size + 1, dtype=dtype),
    }


def rnnt_chunk_decode(dec_params, cfg: StreamingConformerConfig, encoded,
                      h, c, last_token):
    """Greedy RNNT over one chunk's encoder frames, fully on device.

    encoded: [T, D] (batch 1). Carry: LSTM (h, c) [L, 1, dh] and the last
    non-blank token. Returns (tokens [T*max_sym], logprobs, n_emitted,
    eou_seen, h, c, last_token). Blank advances the frame; a non-blank
    token re-runs the joint on the same frame up to max_symbols_per_frame
    (reference: RNNTGreedyDecoder semantics)."""
    from ...ops.nn import linear

    t_frames = encoded.shape[0]
    max_out = t_frames * cfg.max_symbols_per_frame
    blank = cfg.vocab_size  # last joint logit

    def pred_out(token, h, c):
        emb = jnp.take(dec_params["embed"], token[None], axis=0)  # [1, dh]
        return lstm_step(dec_params["lstm"], emb, h, c)

    def joint(enc_t, dec_o):
        hid = jax.nn.relu(linear(enc_t[None], dec_params["joint_enc"])
                          + linear(dec_o, dec_params["joint_pred"]))
        return linear(hid, dec_params["joint_out"])[0].astype(jnp.float32)

    dec_o, h, c = pred_out(last_token, h, c)

    def cond(s):
        return (s[0] < t_frames) & (s[2] < max_out)

    def body(s):
        t, sym, n, tokens, logps, eou, dec_o, h, c, last = s
        logits = joint(encoded[t], dec_o)
        logp = jax.nn.log_softmax(logits)
        tok = jnp.argmax(logits).astype(jnp.int32)
        is_blank = tok == blank
        is_eou = tok == cfg.eou_token_id

        # the cap EMITS the max_symbols-th token then forces the frame
        # advance (reference: `for _ in 0..<maxSymbolsPerStep` — up to max
        # tokens per frame, RNNTGreedyDecoder.swift:81); treating the cap
        # as blank dropped the capping token and its LSTM update
        emit = (~is_blank) & (~is_eou)
        capped = emit & (sym + 1 >= cfg.max_symbols_per_frame)
        tokens = tokens.at[n].set(jnp.where(emit, tok, tokens[n]))
        logps = logps.at[n].set(jnp.where(emit, logp[tok], logps[n]))
        n = n + emit.astype(jnp.int32)
        eou = eou | is_eou

        dec_o2, h2, c2 = pred_out(tok, h, c)
        dec_o = jnp.where(emit, dec_o2, dec_o)
        h = jnp.where(emit, h2, h)
        c = jnp.where(emit, c2, c)
        last = jnp.where(emit, tok, last)
        adv = is_blank | is_eou | capped
        t = t + adv.astype(jnp.int32)
        sym = jnp.where(adv, 0, sym + 1)
        return t, sym, n, tokens, logps, eou, dec_o, h, c, last

    state = (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
             jnp.asarray(0, jnp.int32),
             jnp.zeros((max_out,), jnp.int32), jnp.zeros((max_out,), jnp.float32),
             jnp.asarray(False), dec_o, h, c, last_token)
    s = jax.lax.while_loop(cond, body, state)
    _, _, n, tokens, logps, eou, _, h, c, last = s
    return tokens, logps, n, eou, h, c, last


class StreamingSession:
    """One streaming utterance pipeline: sample buffering, jitted chunk
    step, <EOU> debounce, partial/final split (reference:
    StreamingSession.swift:133-397)."""

    def __init__(self, model: "ParakeetStreamingASR", eou_debounce_ms: int = 1280):
        self.model = model
        self.cfg = model.cfg
        self.eou_debounce_ms = eou_debounce_ms
        self._buffer = np.zeros((0,), np.float32)
        self._caches = init_caches(self.cfg, 1, jnp.float32)
        dh, dl = self.cfg.decoder_hidden, self.cfg.decoder_layers
        self._h = jnp.zeros((dl, 1, dh), jnp.float32)
        self._c = jnp.zeros((dl, 1, dh), jnp.float32)
        self._last_token = jnp.asarray(self.cfg.vocab_size, jnp.int32)  # blank
        self._tokens: List[int] = []
        self._logprobs: List[float] = []
        self._segment = 0
        self._eou_offset = 0
        self._eou_first_at: Optional[int] = None
        self._samples_done = 0
        self._last_final = ""

    # -- push / finalize ------------------------------------------------

    def push_audio(self, samples: np.ndarray) -> List[StreamingResult]:
        self._buffer = np.concatenate([self._buffer, np.asarray(samples, np.float32)])
        spc = self.cfg.samples_per_chunk
        out = []
        while len(self._buffer) >= spc:
            chunk, self._buffer = self._buffer[:spc], self._buffer[spc:]
            res = self._process(chunk)
            if res is not None:
                out.append(res)
        return out

    def finalize(self) -> List[StreamingResult]:
        spc = self.cfg.samples_per_chunk
        out: List[StreamingResult] = []
        if len(self._buffer):
            chunk = np.zeros(spc, np.float32)
            chunk[: len(self._buffer)] = self._buffer[:spc]
            self._buffer = np.zeros((0,), np.float32)
            # the flushed tail can itself confirm an EOU and emit a final
            # segment (which advances _eou_offset past its tokens) —
            # dropping it would lose the last segment's text
            res = self._process(chunk)
            if res is not None:
                out.append(res)
        pending = self._tokens[self._eou_offset:]
        if not pending:
            return out
        text = self.model.decode_tokens(pending)
        conf = self._confidence(self._logprobs[self._eou_offset:])
        self._eou_offset = len(self._tokens)
        out.append(StreamingResult(text, True, conf, False, self._segment))
        return out

    def force_end_of_utterance(self) -> Optional[StreamingResult]:
        """External boundary (e.g. VAD silence) — emit pending text as
        final, keep all streaming state (reference: forceEndOfUtterance)."""
        pending = self._tokens[self._eou_offset:]
        logps = self._logprobs[self._eou_offset:]
        self._eou_offset = len(self._tokens)
        self._eou_first_at = None
        if not pending:
            return None
        text = self.model.decode_tokens(pending)
        if not text:
            return None
        seg = self._segment
        self._segment += 1
        self._last_final = text
        return StreamingResult(text, True, self._confidence(logps), True, seg)

    # -- internals --------------------------------------------------------

    @staticmethod
    def _confidence(logps: Sequence[float]) -> float:
        return float(min(1.0, np.exp(np.mean(logps)))) if len(logps) else 0.0

    def _process(self, chunk: np.ndarray) -> Optional[StreamingResult]:
        tokens, logps, n, eou, caches, h, c, last = self.model._chunk_step(
            self.model.encoder_params, self.model.decoder_params,
            jnp.asarray(chunk), self._caches, self._h, self._c, self._last_token,
        )
        self._caches, self._h, self._c, self._last_token = caches, h, c, last
        n = int(n)
        new_tokens = [int(t) for t in np.asarray(tokens[:n])]
        self._tokens.extend(new_tokens)
        self._logprobs.extend(float(x) for x in np.asarray(logps[:n]))

        # EOU debounce (reference: StreamingSession.swift:327-345)
        self._samples_done += len(chunk)
        eou_confirmed = False
        if bool(eou):
            if new_tokens:
                self._eou_first_at = None
            elif self._eou_first_at is None:
                self._eou_first_at = self._samples_done
            if self._eou_first_at is not None:
                elapsed_ms = (self._samples_done - self._eou_first_at) * 1000 // self.cfg.sample_rate
                if elapsed_ms >= self.eou_debounce_ms:
                    eou_confirmed = True
        else:
            self._eou_first_at = None

        pending = self._tokens[self._eou_offset:]
        text = self.model.decode_tokens(pending)
        if not text:
            if eou_confirmed:
                self._eou_offset = len(self._tokens)
                self._segment += 1
                self._eou_first_at = None
            return None
        conf = self._confidence(self._logprobs[self._eou_offset:])
        if eou_confirmed:
            self._eou_offset = len(self._tokens)
            seg = self._segment
            self._segment += 1
            self._eou_first_at = None
            if text == self._last_final:
                return None
            self._last_final = text
            return StreamingResult(text, True, conf, True, seg)
        return StreamingResult(text, False, conf, False, self._segment)


class ParakeetStreamingASR(SpeechRecognitionModel):
    """Cache-aware streaming RNNT (EOU 120M preset)."""

    DEFAULT_CONFIG = CONFIG_EOU_120M
    DEFAULT_MODEL_ID = "nvidia/parakeet-rnnt-eou-120m"

    def __init__(self, cfg: StreamingConformerConfig, encoder_params, decoder_params,
                 vocabulary: Optional[Sequence[str]] = None,
                 dtype=jnp.float32):
        import functools

        self.cfg = cfg
        self.vocabulary = list(vocabulary) if vocabulary else None
        from ...ops.quant import cast_tree

        self.encoder_params = cast_tree(encoder_params, dtype)
        self.decoder_params = cast_tree(decoder_params, dtype)
        self._loaded = True

        @jax.jit
        def _chunk_step(enc_p, dec_p, chunk_samples, caches, h, c, last_token):
            mel, new_tail = streaming_log_mel(chunk_samples[None], caches.sample_tail, cfg)
            encoded, caches = encode_chunk(enc_p, cfg, mel.astype(jnp.float32), caches)
            caches = dataclasses.replace(caches, sample_tail=new_tail)
            tokens, logps, n, eou, h, c, last = rnnt_chunk_decode(
                dec_p, cfg, encoded[0], h, c, last_token)
            return tokens, logps, n, eou, caches, h, c, last

        self._chunk_step = _chunk_step

    # -- constructors -----------------------------------------------------

    @classmethod
    def init_random(cls, cfg: Optional[StreamingConformerConfig] = None, seed: int = 0, **kw):
        cfg = cfg or config_tiny()
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        return cls(cfg, init_encoder_params(k1, cfg), init_decoder_params(k2, cfg), **kw)

    @classmethod
    def from_pretrained(cls, model_id: Optional[str] = None, cache_dir=None,
                        offline_mode: bool = False, **kw):
        from ...core.hub import download_weights
        from .convert import convert_streaming_checkpoint, load_vocabulary

        model_id = model_id or cls.DEFAULT_MODEL_ID
        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode,
                                     additional_files=("vocab.txt", "tokenizer.model"))
        cfg = cls.DEFAULT_CONFIG
        enc, dec = convert_streaming_checkpoint(model_dir, cfg)
        vocab = load_vocabulary(model_dir)
        return cls(cfg, enc, dec, vocabulary=vocab, **kw)

    # -- API ----------------------------------------------------------------

    def new_session(self, eou_debounce_ms: int = 1280) -> StreamingSession:
        return StreamingSession(self, eou_debounce_ms)

    def decode_tokens(self, ids: Sequence[int]) -> str:
        if not ids:
            return ""
        if self.vocabulary:
            pieces = [self.vocabulary[i] for i in ids if 0 <= i < len(self.vocabulary)]
            return "".join(pieces).replace("▁", " ").strip()
        return " ".join(str(i) for i in ids)

    def transcribe(self, audio: np.ndarray, sample_rate: int = 16000, **kw) -> TranscriptionResult:
        """Batch entry point: stream the whole clip through one session."""
        import time

        from ...audio.resample import resample

        t0 = time.perf_counter()
        if sample_rate != self.cfg.sample_rate:
            audio = resample(np.asarray(audio, np.float32), sample_rate, self.cfg.sample_rate)
        session = self.new_session()
        events = session.push_audio(np.asarray(audio, np.float32))
        events += session.finalize()
        finals = [r for r in events if r.is_final]
        if finals:
            text = " ".join(r.text for r in finals)
        else:
            text = events[-1].text if events else ""
        dur = len(audio) / self.cfg.sample_rate
        wall = time.perf_counter() - t0
        conf = float(np.mean([r.confidence for r in (finals or events)])) if events else 0.0
        return TranscriptionResult(text=text.strip(), confidence=conf, duration=dur,
                                   processing_time=wall)

    def transcribe_stream(self, chunks, sample_rate: int = 16000):
        """Generator: audio chunks in → PartialTranscription events out."""
        session = self.new_session()
        t = 0.0
        for chunk in chunks:
            t_start = t
            t += len(chunk) / sample_rate
            for r in session.push_audio(np.asarray(chunk, np.float32)):
                yield PartialTranscription(text=r.text, is_final=r.is_final,
                                           segment_start=t_start, segment_end=t)
        for r in session.finalize():
            yield PartialTranscription(text=r.text, is_final=True,
                                       segment_start=t, segment_end=t)

    def warm_up(self) -> None:
        s = self.new_session()
        s.push_audio(np.zeros(self.cfg.samples_per_chunk, np.float32))

    def unload(self) -> None:
        self.encoder_params = None
        self.decoder_params = None
        self._loaded = False

    @property
    def is_loaded(self) -> bool:
        return self._loaded


class NemotronStreamingASR(ParakeetStreamingASR):
    """English streaming 0.6B with native punctuation/caps (reference:
    Sources/NemotronStreamingASR/NemotronStreamingASR.swift:13-137 — the
    identical cache-aware session pattern at a larger size)."""

    DEFAULT_CONFIG = CONFIG_NEMOTRON_06B
    DEFAULT_MODEL_ID = "nvidia/nemotron-streaming-asr-0.6b"

"""Wake-word / keyword spotting: streaming Zipformer transducer.

TPU-native analog of the reference's KWS module
(reference: Sources/SpeechWakeWord/SpeechWakeWord.swift:14-320 — icefall's
KWS Zipformer, gigaspeech, 3.49M params, as CoreML encoder/decoder/joiner
units driven by a modified beam search with an Aho-Corasick context
graph). Here the encoder is the real Zipformer2 topology (zipformer.py)
run as one jitted streaming step per 320 ms chunk — batch mode is a
``lax.scan`` over chunk windows so a whole utterance is a single device
program — and the stateless-decoder/joiner beam search runs host-side over
the returned joiner-space frames (kws_decoder.py), mirroring the
reference's host-driven CoreML loop (StreamingSession.swift:130-144).
"""

from __future__ import annotations

import functools
import json
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import WakeWordModel
from ...ops.fbank import kaldi_fbank
from .context_graph import ContextGraph, Keyword
from .kws_decoder import KeywordDetection, StreamingKwsDecoder
from .zipformer import (ZipformerConfig, decoder_out, encode_chunk,
                        encode_windows, init_states, init_zipformer_params,
                        joiner_logits, param_count)

# mel frames fed per chunk window / consumed per step (Configuration.swift:77)
_PAD_MEL = -15.0  # ~kaldi log-energy of silence (StreamingSession.swift:110)


class WakeWordDetector(WakeWordModel):
    """Batch + streaming keyword detection (SpeechWakeWord.swift:14-89)."""

    def __init__(self, params: dict, keywords: Sequence[Keyword],
                 config: Optional[ZipformerConfig] = None,
                 context_score: float = 0.5, ac_threshold: float = 0.15,
                 num_trailing_blanks: int = 1, auto_reset_seconds: float = 1.5,
                 dtype=jnp.float32):
        self.config = config or ZipformerConfig()
        self.params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
        self.graph = ContextGraph(keywords, context_score=context_score,
                                  ac_threshold=ac_threshold)
        self.keywords = list(keywords)
        self.num_trailing_blanks = num_trailing_blanks
        self.auto_reset_seconds = auto_reset_seconds
        self._loaded = True
        cfg = self.config
        self._encode_chunk = jax.jit(functools.partial(encode_chunk, cfg=cfg))
        self._encode_windows = jax.jit(functools.partial(encode_windows, cfg=cfg))

        @functools.partial(jax.jit, static_argnames=("n_frames", "n_bucket"))
        def _detect_program(p, audio, n_valid_frames, *, n_frames, n_bucket):
            """fbank + window building + scanned encoder in ONE dispatch
            (batch detect): mel rows at/after ``n_valid_frames`` become
            kaldi-silence (_PAD_MEL), reproducing the session's tail and
            bucket padding; windows gather from the shared mel array.
            Per-dispatch round-trips dominate this 3.5M-param model, so
            one program per clip is the FireRedVAD lesson applied here."""
            fb = kaldi_fbank(audio * 32768.0)                      # [F, 80]
            fb = jnp.where((jnp.arange(n_frames) < n_valid_frames)[:, None],
                           fb, _PAD_MEL)
            idx = (jnp.arange(n_bucket) * cfg.mel_stride)[:, None] \
                + jnp.arange(cfg.mel_window)[None]
            wins = fb[idx]                         # [n_bucket, mel_window, 80]
            out, _ = encode_windows(p, cfg=cfg, windows=wins[:, None],
                                    states=init_states(cfg))
            return out[0]

        self._detect_program = _detect_program

    # -- loading ----------------------------------------------------------

    @classmethod
    def init_random(cls, keywords: Sequence[Keyword], seed: int = 0,
                    config: Optional[ZipformerConfig] = None, **kw) -> "WakeWordDetector":
        cfg = config or ZipformerConfig()
        params = init_zipformer_params(jax.random.PRNGKey(seed), cfg)
        return cls(params, keywords, config=cfg, **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "kws-zipformer",
                        keywords: Sequence[Keyword] = (),
                        cache_dir=None, offline_mode: bool = False,
                        progress_handler=None, **kw) -> "WakeWordDetector":
        """Load a converted checkpoint directory: ``model.safetensors`` in
        the canonical tree (see convert.py for the icefall mapping) plus
        ``config.json`` hyperparameters."""
        from pathlib import Path

        from ...core.hub import download_weights
        from ...core.weights import load_safetensors, relist, unflatten

        model_dir = Path(download_weights(model_id, cache_dir=cache_dir,
                                          offline_mode=offline_mode,
                                          progress_handler=progress_handler))
        cfg = ZipformerConfig()
        cfg_path = model_dir / "config.json"
        if cfg_path.exists():
            raw = json.loads(cfg_path.read_text())
            fields = {f.name for f in __import__("dataclasses").fields(ZipformerConfig)}
            cfg = ZipformerConfig(**{k: (tuple(v) if isinstance(v, list) else v)
                                     for k, v in raw.items() if k in fields})
        flat = load_safetensors(model_dir)
        if any(k.startswith("encoder_embed.") or k.startswith("encoder.encoders.")
               for k in flat):
            from .convert import convert_icefall_tree
            params = convert_icefall_tree(flat, cfg)
        else:
            params = relist(unflatten(flat))
        return cls(params, keywords, config=cfg, **kw)

    # -- inference --------------------------------------------------------

    def detect(self, audio: np.ndarray, sample_rate: int = 16000
               ) -> Sequence[Tuple[str, float, float]]:
        """Batch detection: (keyword, time_s, mean_token_prob) tuples
        (protocol surface); the richer KeywordDetection list is available
        via ``detect_keywords``."""
        hits = self.detect_keywords(audio, sample_rate)
        return [(h.phrase, h.time(), h.score) for h in hits]

    def detect_keywords(self, audio: np.ndarray, sample_rate: int = 16000
                        ) -> List[KeywordDetection]:
        """Batch detection: one fbank program + one scanned-encoder program
        over ALL chunk windows (the streaming session's per-window dispatch
        costs a host↔device round-trip every 0.32 s of audio), then the host
        beam search over the full 25 Hz frame sequence. Window/tail
        semantics are exactly WakeWordSession's — windows of ``mel_window``
        frames advancing ``mel_stride``, the tail (≥1 frame) padded with
        kaldi-silence frames — and kaldi_fbank is per-frame stateless, so
        sliced full-utterance fbank ≡ the session's per-window fbank."""
        if sample_rate != 16000:
            audio = _resample(audio, sample_rate)
        frames = self._batch_encoder_frames(np.asarray(audio, np.float32))
        if frames is None:
            return []
        return self.make_kws_decoder().step_chunk(frames)

    def _batch_encoder_frames(self, audio: np.ndarray):
        """Joiner-space frames for a whole utterance in ONE fused
        fbank+window+scanned-encoder program; None if the audio is shorter
        than one fbank frame. Tested equal to WakeWordSession's per-window
        frames. The window COUNT pads to a power-of-2 bucket (bounded
        compiles for the static scan length); padded windows come after
        all real ones in a causal scan, so their frames are dropped."""
        cfg = self.config
        if len(audio) < WakeWordSession.FRAME:
            return None
        hop, flen = WakeWordSession.HOP, WakeWordSession.FRAME
        f_real = 1 + (len(audio) - flen) // hop
        # window starts advance mel_stride while start+window <= f_real,
        # plus one tail window if frames remain past the last full window
        n_full = max(0, (f_real - cfg.mel_window) // cfg.mel_stride + 1)
        n_real = n_full + (1 if n_full * cfg.mel_stride < f_real else 0)
        n_bucket = 1 << (n_real - 1).bit_length()
        f_need = (n_bucket - 1) * cfg.mel_stride + cfg.mel_window
        need_samples = (f_need - 1) * hop + flen
        padded = np.zeros(need_samples, np.float32)
        padded[: min(len(audio), need_samples)] = audio[:need_samples]
        out = self._detect_program(
            self.params, jnp.asarray(padded),
            jnp.asarray(min(f_real, f_need), jnp.int32),
            n_frames=f_need, n_bucket=n_bucket)
        frames = np.asarray(out)
        return frames[: n_real * (frames.shape[0] // n_bucket)]

    def new_session(self) -> "WakeWordSession":
        return WakeWordSession(self)

    def make_kws_decoder(self, beam: int = 4) -> StreamingKwsDecoder:
        """Beam-search decoder wired to this model's transducer head
        (SpeechWakeWord.swift:95-147 — used by parity tests to drive the
        search with external encoder frames)."""
        cfg = self.config
        host_params = jax.tree_util.tree_map(np.asarray, self.params)
        return StreamingKwsDecoder(
            decoder_fn=lambda ctx: decoder_out(host_params, ctx, cfg),
            joiner_fn=lambda enc, dec: joiner_logits(host_params, enc, dec),
            context_graph=self.graph, blank_id=cfg.blank_id,
            context_size=cfg.context_size, beam=beam,
            num_trailing_blanks=self.num_trailing_blanks,
            auto_reset_seconds=self.auto_reset_seconds)

    def num_params(self) -> int:
        return param_count(self.params)

    def warm_up(self) -> None:
        self.detect(np.zeros(16000, np.float32))

    def unload(self) -> None:
        self.params = None
        self._loaded = False

    @property
    def is_loaded(self) -> bool:
        return self._loaded


class WakeWordSession:
    """Streaming detection over pushed audio (StreamingSession.swift:9-144).

    Raw samples accrue in a buffer; whenever a full encoder window's worth
    is available — 45 kaldi-fbank frames = 7440 samples at the 25 ms/10 ms
    framing — one jitted encoder chunk consumes it (advancing 5120
    samples = 32 frames of stride) and emits 8 joiner-space frames at
    25 Hz into the beam search. The fbank always runs on this one fixed
    window shape, so streaming output is bit-identical no matter how the
    audio is partitioned across pushes. Encoder caches and the beam
    persist across pushes: keywords spanning chunk boundaries fire."""

    HOP = 160
    FRAME = 400

    def __init__(self, model: WakeWordDetector, collect_encoder: bool = False):
        self.model = model
        cfg = model.config
        self.window_samples = (cfg.mel_window - 1) * self.HOP + self.FRAME
        self.stride_samples = cfg.mel_stride * self.HOP
        self._buf = np.zeros(0, np.float32)
        self._states = init_states(cfg)
        self._decoder = model.make_kws_decoder()
        # parity hook: retain joiner-space encoder frames (tests only)
        self.collect_encoder = collect_encoder
        self.encoder_frames: List[np.ndarray] = []

    def push(self, samples: np.ndarray) -> List[KeywordDetection]:
        self._buf = np.concatenate([self._buf, np.asarray(samples, np.float32)])
        return self._drain()

    def finalize(self) -> List[KeywordDetection]:
        """Encode the remaining tail: compute its mel frames and pad up to
        a full window with kaldi-silence frames
        (StreamingSession.swift:101-117)."""
        cfg = self.model.config
        hits: List[KeywordDetection] = self._drain()
        if len(self._buf) >= self.FRAME:
            fb = np.asarray(kaldi_fbank(jnp.asarray(self._buf * 32768.0, jnp.float32)))
            pad = np.full((cfg.mel_window - fb.shape[0], cfg.num_mel_bins),
                          _PAD_MEL, np.float32)
            window = np.concatenate([fb, pad]) if pad.shape[0] > 0 else fb[: cfg.mel_window]
            hits.extend(self._encode_window(jnp.asarray(window)[None]))
            self._buf = np.zeros(0, np.float32)
        return hits

    def _drain(self) -> List[KeywordDetection]:
        hits: List[KeywordDetection] = []
        while len(self._buf) >= self.window_samples:
            piece = self._buf[: self.window_samples]
            window = kaldi_fbank(jnp.asarray(piece * 32768.0, jnp.float32))[None]
            hits.extend(self._encode_window(window))
            self._buf = self._buf[self.stride_samples:]
        return hits

    def _encode_window(self, window) -> List[KeywordDetection]:
        out, self._states = self.model._encode_chunk(
            self.model.params, mel_window=window, states=self._states)
        frames = np.asarray(out[0])
        if self.collect_encoder:
            self.encoder_frames.append(frames)
        return self._decoder.step_chunk(frames)

    def reset(self) -> None:
        self._buf = np.zeros(0, np.float32)
        self._states = init_states(self.model.config)
        self._decoder.reset()


def _resample(audio: np.ndarray, sample_rate: int) -> np.ndarray:
    from ...audio.resample import resample

    return resample(np.asarray(audio, np.float32), sample_rate, 16000)

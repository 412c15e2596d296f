"""Keyword spotting: streaming encoder + context-graph decoder.

TPU-native analog of the reference's KWS module
(reference: Sources/SpeechWakeWord/SpeechWakeWord.swift:14-258 — a 3M-param
Zipformer streaming encoder on ANE feeding an Aho-Corasick keyword
decoder). Here the encoder is a compact streaming transformer over Kaldi
fbank chunks with carried state, run as one ``lax.scan`` per utterance for
batch mode; the decoder is the ContextGraph (context_graph.py).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import WakeWordModel
from ...ops.fbank import kaldi_fbank
from ...ops.nn import init_linear, layer_norm, linear
from .context_graph import ContextGraph, Keyword, StreamingKeywordDecoder

CHUNK_FRAMES = 16   # fbank frames per streaming step
LEFT_CONTEXT = 32   # carried frames of left context
N_MELS = 80


def init_kws_params(key, d_model: int = 128, num_layers: int = 2, num_heads: int = 4,
                    vocab_size: int = 500, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 3 + num_layers)
    params = {
        "proj_in": init_linear(ks[0], N_MELS * 2, d_model, dtype=dtype),  # pairwise frame concat (2× subsample)
        "out": init_linear(ks[1], d_model, vocab_size, dtype=dtype),
        "layers": [],
    }
    for i in range(num_layers):
        k = jax.random.split(ks[3 + i], 6)
        params["layers"].append({
            "ln1": {"weight": jnp.ones((d_model,), dtype), "bias": jnp.zeros((d_model,), dtype)},
            "q": init_linear(k[0], d_model, d_model, dtype=dtype),
            "k": init_linear(k[1], d_model, d_model, dtype=dtype),
            "v": init_linear(k[2], d_model, d_model, dtype=dtype),
            "o": init_linear(k[3], d_model, d_model, dtype=dtype),
            "ln2": {"weight": jnp.ones((d_model,), dtype), "bias": jnp.zeros((d_model,), dtype)},
            "ff1": init_linear(k[4], d_model, d_model * 4, dtype=dtype),
            "ff2": init_linear(k[5], d_model * 4, d_model, dtype=dtype),
        })
    params["num_heads"] = num_heads
    return params


def kws_encode(params, fbank, n_heads: int):
    """fbank: [T, 80] → log-softmax posteriors [T//2, vocab]. Causal
    attention limited to LEFT_CONTEXT frames (streaming-equivalent)."""
    t = fbank.shape[0] // 2 * 2
    x = fbank[:t].reshape(t // 2, N_MELS * 2)  # 2× temporal subsample
    x = linear(x, params["proj_in"])[None]  # [1, T2, D]
    b, t2, d = x.shape
    hd = d // n_heads

    rows = jnp.arange(t2)[:, None]
    cols = jnp.arange(t2)[None, :]
    mask = jnp.where((cols <= rows) & (cols > rows - LEFT_CONTEXT), 0.0, -1e9)[None, None]

    from ...ops.attention import sdpa

    for p in params["layers"]:
        h = layer_norm(x, p["ln1"]["weight"], p["ln1"]["bias"])
        q = linear(h, p["q"]).reshape(b, t2, n_heads, hd).transpose(0, 2, 1, 3)
        k = linear(h, p["k"]).reshape(b, t2, n_heads, hd).transpose(0, 2, 1, 3)
        v = linear(h, p["v"]).reshape(b, t2, n_heads, hd).transpose(0, 2, 1, 3)
        a = sdpa(q, k, v, 1.0 / np.sqrt(hd), mask.astype(jnp.float32))
        x = x + linear(a.transpose(0, 2, 1, 3).reshape(b, t2, d), p["o"])
        h = layer_norm(x, p["ln2"]["weight"], p["ln2"]["bias"])
        x = x + linear(jax.nn.relu(linear(h, p["ff1"])), p["ff2"])

    logits = linear(x[0], params["out"])
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


class WakeWordDetector(WakeWordModel):
    def __init__(self, params, keywords: Sequence[Keyword], blank_id: int = 0, dtype=jnp.float32):
        self.num_heads = int(params.pop("num_heads", 4)) if isinstance(params.get("num_heads", None), (int, np.integer)) else 4
        self.params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
        self.graph = ContextGraph(keywords)
        self.blank_id = blank_id
        self._loaded = True
        self._encode = jax.jit(functools.partial(kws_encode, n_heads=self.num_heads))

    @classmethod
    def init_random(cls, keywords: Sequence[Keyword], seed: int = 0, **kw) -> "WakeWordDetector":
        return cls(init_kws_params(jax.random.PRNGKey(seed)), keywords, **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "kws-zipformer", keywords: Sequence[Keyword] = (),
                        cache_dir=None, offline_mode: bool = False,
                        progress_handler=None, **kw) -> "WakeWordDetector":
        from ...core.hub import download_weights
        from ...core.weights import load_safetensors, unflatten

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode)
        params = unflatten(load_safetensors(model_dir))
        return cls(params, keywords, **kw)

    def detect(self, audio: np.ndarray, sample_rate: int = 16000
               ) -> Sequence[Tuple[str, float, float]]:
        if sample_rate != 16000:
            from ...audio.resample import resample

            audio = resample(audio.astype(np.float32), sample_rate, 16000)
        fb = kaldi_fbank(jnp.asarray(audio * 32768.0, jnp.float32))
        if fb.shape[0] < 2:
            return []
        logp = np.asarray(self._encode(self.params, fb))
        tokens = logp.argmax(axis=-1)
        probs = np.exp(logp.max(axis=-1))
        decoder = StreamingKeywordDecoder(self.graph, self.blank_id)
        hits = []
        frame_s = 0.02  # 2× subsampled 10 ms frames
        for t, (tok, p) in enumerate(zip(tokens, probs)):
            hit = decoder.step(int(tok), float(p), t * frame_s)
            if hit:
                hits.append(hit)
        return hits

    def new_session(self) -> "WakeWordSession":
        """Streaming detection: push audio chunks, keyword hits emit as
        they fire (reference: StreamingKwsDecoder — the streaming encoder
        + incremental context-graph decode)."""
        return WakeWordSession(self)

    def warm_up(self) -> None:
        self.detect(np.zeros(16000, np.float32))

    def unload(self) -> None:
        self.params = None
        self._loaded = False

    @property
    def is_loaded(self) -> bool:
        return self._loaded


class WakeWordSession:
    """Incremental keyword spotting over pushed audio.

    Frames are Kaldi fbank (25 ms / 10 ms, snip-edges): a chunk of audio
    yields exactly the frames whose windows it completes; a 400-sample
    tail carries to the next push, and the context-graph decoder state
    persists across pushes — a keyword spanning a chunk boundary still
    fires (reference: Sources/SpeechWakeWord streaming path)."""

    HOP = 160
    FRAME = 400

    def __init__(self, model: WakeWordDetector):
        self.model = model
        self._tail = np.zeros(0, np.float32)
        self._decoder = StreamingKeywordDecoder(model.graph, model.blank_id)
        self._frames_done = 0

    def push(self, samples: np.ndarray) -> List[Tuple[str, float, float]]:
        audio = np.concatenate([self._tail, np.asarray(samples, np.float32)])
        n_frames = max(0, 1 + (len(audio) - self.FRAME) // self.HOP)
        if n_frames < 2:  # encoder subsamples by 2 — need ≥2 new frames
            self._tail = audio
            return []
        consumed = n_frames * self.HOP
        piece, self._tail = audio[: consumed + (self.FRAME - self.HOP)], audio[consumed:]
        fb = kaldi_fbank(jnp.asarray(piece * 32768.0, jnp.float32))
        logp = np.asarray(self.model._encode(self.model.params, fb))
        tokens = logp.argmax(axis=-1)
        probs = np.exp(logp.max(axis=-1))
        hits = []
        frame_s = 0.02
        for t, (tok, p) in enumerate(zip(tokens, probs)):
            hit = self._decoder.step(int(tok), float(p),
                                     (self._frames_done + t) * frame_s)
            if hit:
                hits.append(hit)
        self._frames_done += len(tokens)
        return hits

    def reset(self) -> None:
        self._tail = np.zeros(0, np.float32)
        self._decoder = StreamingKeywordDecoder(self.model.graph, self.model.blank_id)
        self._frames_done = 0

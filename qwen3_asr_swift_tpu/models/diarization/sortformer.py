"""Sortformer streaming end-to-end diarizer.

TPU-native analog of the reference's SortformerDiarizer (reference:
Sources/SpeechVAD/SortformerDiarizer.swift:19-360 — NeMo streaming
Sortformer consumed as an opaque CoreML artifact: 112-mel-frame chunks
(left 1 + core 6 + right 7 encoder frames × subsampling 8), a 188-frame
speaker cache and 40-frame FIFO carried between chunks, per-frame
4-speaker sigmoid predictions; SortformerConfig.swift:69-73). The
NeMo FIFO→spkcache streaming-update semantics are reproduced exactly
(SortformerDiarizer.swift:284-360).

TPU shape: one jitted chunk program — mel chunk → conv subsample →
conformer-lite encoder → [spkcache ‖ fifo ‖ chunk] through transformer
layers → sigmoid speaker probabilities + chunk embeddings. The ragged
cache/fifo lengths are handled by masks over fixed-capacity buffers, so
one compiled program serves the whole stream.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core import DiarizedSegment
from ...ops.attention import NEG_INF
from ...ops.nn import init_linear, layer_norm, linear


@dataclasses.dataclass(frozen=True)
class SortformerConfig:
    n_mels: int = 128
    sample_rate: int = 16000
    n_fft: int = 512
    hop_length: int = 160
    win_length: int = 400
    # streaming chunking (reference: SortformerConfig.default)
    chunk_frames: int = 112        # fixed mel input per chunk
    core_frames: int = 6           # encoder frames kept per chunk
    left_context: int = 1          # encoder frames
    right_context: int = 7
    subsampling: int = 8
    # state
    spkcache_len: int = 188
    fifo_len: int = 40
    d_model: int = 512
    max_speakers: int = 4
    # network
    encoder_layers: int = 4
    head_layers: int = 4
    num_heads: int = 8
    # post
    onset: float = 0.5
    offset: float = 0.35
    min_speech_s: float = 0.2
    min_silence_s: float = 0.2


CONFIG_SORTFORMER = SortformerConfig()


def config_tiny() -> SortformerConfig:
    return SortformerConfig(n_mels=20, chunk_frames=32, core_frames=2,
                            left_context=1, right_context=1, spkcache_len=12,
                            fifo_len=4, d_model=16, encoder_layers=1,
                            head_layers=1, num_heads=2, max_speakers=3)


def init_sortformer_params(key, cfg: SortformerConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 6 + cfg.encoder_layers + cfg.head_layers)
    d = cfg.d_model

    def conv_k3s2(key, cin, cout):
        s = 1.0 / np.sqrt(3 * cin)
        return {"kernel": (jax.random.normal(key, (3, cin, cout)) * s).astype(dtype),
                "bias": jnp.zeros((cout,), dtype)}

    def block(key):
        k = jax.random.split(key, 6)
        return {
            "ln1": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "q": init_linear(k[0], d, d, dtype=dtype), "k": init_linear(k[1], d, d, dtype=dtype),
            "v": init_linear(k[2], d, d, dtype=dtype), "o": init_linear(k[3], d, d, dtype=dtype),
            "ln2": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "ff1": init_linear(k[4], d, 4 * d, dtype=dtype),
            "ff2": init_linear(k[5], 4 * d, d, dtype=dtype),
        }

    hidden = max(d // 4, 8)
    return {
        "sub1": conv_k3s2(ks[0], cfg.n_mels, hidden),
        "sub2": conv_k3s2(ks[1], hidden, hidden),
        "sub3": conv_k3s2(ks[2], hidden, hidden),
        "sub_out": init_linear(ks[3], hidden, d, dtype=dtype),
        "encoder": [block(ks[6 + i]) for i in range(cfg.encoder_layers)],
        "head": [block(ks[6 + cfg.encoder_layers + i]) for i in range(cfg.head_layers)],
        "classifier": init_linear(ks[4], d, cfg.max_speakers, dtype=dtype),
    }


def _attn_block(p, x, mask, num_heads):
    b, t, d = x.shape
    hd = d // num_heads
    h = layer_norm(x, p["ln1"]["weight"], p["ln1"]["bias"])
    q = linear(h, p["q"]).reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    k = linear(h, p["k"]).reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    v = linear(h, p["v"]).reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / np.sqrt(hd)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32))
    x = x + linear(o.transpose(0, 2, 1, 3).reshape(b, t, d).astype(x.dtype), p["o"])
    h2 = layer_norm(x, p["ln2"]["weight"], p["ln2"]["bias"])
    return x + linear(jax.nn.gelu(linear(h2, p["ff1"])), p["ff2"])


def sortformer_chunk(params, cfg: SortformerConfig, chunk_mel, chunk_len,
                     spkcache, spk_len, fifo, fifo_len):
    """One streaming chunk.

    chunk_mel [chunk_frames, mels]; chunk_len scalar (valid mel frames);
    spkcache [spkcache_len, D]; fifo [fifo_len, D]; lengths int32.
    Returns (preds [total, max_speakers] fp32 sigmoid, embs [emb_cap, D],
    n_emb) where total = spkcache_len + fifo_len + emb_cap."""

    def s2(x, p):
        y = jax.lax.conv_general_dilated(
            x, p["kernel"], window_strides=(2,), padding="SAME",
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32) + p["bias"]
        return jax.nn.relu(y).astype(x.dtype)

    x = chunk_mel[None]
    x = s2(x, params["sub1"])
    x = s2(x, params["sub2"])
    x = s2(x, params["sub3"])
    embs = linear(x, params["sub_out"])                      # [1, emb_cap, D]
    emb_cap = embs.shape[1]
    n_emb = jnp.minimum((chunk_len + cfg.subsampling - 1) // cfg.subsampling, emb_cap)

    emb_valid = jnp.arange(emb_cap) < n_emb
    mask = jnp.where(emb_valid[None, None, None, :], 0.0, NEG_INF).astype(jnp.float32)
    for p in params["encoder"]:
        embs = _attn_block(p, embs, mask, cfg.num_heads)

    seq = jnp.concatenate([spkcache[None], fifo[None], embs], axis=1)
    valid = jnp.concatenate([
        jnp.arange(cfg.spkcache_len) < spk_len,
        jnp.arange(cfg.fifo_len) < fifo_len,
        emb_valid,
    ])
    mask = jnp.where(valid[None, None, None, :], 0.0, NEG_INF).astype(jnp.float32)
    h = seq
    for p in params["head"]:
        h = _attn_block(p, h, mask, cfg.num_heads)
    preds = jax.nn.sigmoid(linear(h, params["classifier"]).astype(jnp.float32))[0]
    return preds, embs[0], n_emb


class SortformerDiarizer:
    """Streaming end-to-end diarization (no separate embedding model)."""

    def __init__(self, cfg: SortformerConfig, params, dtype=jnp.float32):
        from ...ops.quant import cast_tree

        self.cfg = cfg
        self.params = cast_tree(params, dtype)
        self._loaded = True
        self._chunk = jax.jit(functools.partial(sortformer_chunk, cfg=cfg))
        self.reset_state()

    @classmethod
    def init_random(cls, cfg: Optional[SortformerConfig] = None, seed: int = 0, **kw):
        cfg = cfg or config_tiny()
        return cls(cfg, init_sortformer_params(jax.random.PRNGKey(seed), cfg), **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "nvidia/diar_streaming_sortformer_4spk-v2",
                        cache_dir=None, offline_mode: bool = False, **kw):
        from ...core.hub import download_weights
        from ...core.weights import load_safetensors, unflatten

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode)
        return cls(CONFIG_SORTFORMER, unflatten(load_safetensors(model_dir)), **kw)

    def reset_state(self):
        cfg = self.cfg
        self._spkcache = np.zeros((cfg.spkcache_len, cfg.d_model), np.float32)
        self._spk_len = 0
        self._fifo = np.zeros((cfg.fifo_len, cfg.d_model), np.float32)
        self._fifo_len = 0

    # -- NeMo streaming_update (reference: SortformerDiarizer.swift:284-360)

    def _update_state(self, embs: np.ndarray):
        n = len(embs)
        if n == 0:
            return
        cap_f, cap_c = self.cfg.fifo_len, self.cfg.spkcache_len
        if self._fifo_len + n <= cap_f:
            self._fifo[self._fifo_len:self._fifo_len + n] = embs
            self._fifo_len += n
            return
        overflow = self._fifo_len + n - cap_f
        moved = self._fifo[:overflow].copy()
        if self._spk_len + overflow <= cap_c:
            self._spkcache[self._spk_len:self._spk_len + overflow] = moved
            self._spk_len += overflow
        else:
            cache_overflow = self._spk_len + overflow - cap_c
            keep = self._spk_len - cache_overflow
            if keep > 0:
                self._spkcache[:keep] = self._spkcache[cache_overflow:self._spk_len]
            self._spkcache[max(keep, 0):max(keep, 0) + overflow] = moved[:cap_c - max(keep, 0)]
            self._spk_len = min(cap_c, max(keep, 0) + overflow)
        remaining = self._fifo_len - overflow
        if remaining > 0:
            self._fifo[:remaining] = self._fifo[overflow:self._fifo_len]
        self._fifo_len = remaining
        self._fifo[self._fifo_len:self._fifo_len + n] = embs
        self._fifo_len += n

    # -- public API -----------------------------------------------------------

    def diarize(self, audio: np.ndarray, sample_rate: int = 16000,
                progress_handler=None) -> List[DiarizedSegment]:
        from ...audio.resample import resample
        from ...ops.mel import mel_filterbank

        cfg = self.cfg
        if sample_rate != cfg.sample_rate:
            audio = resample(np.asarray(audio, np.float32), sample_rate, cfg.sample_rate)
        audio = np.asarray(audio, np.float32)
        if len(audio) == 0:
            return []
        self.reset_state()

        # mel for the whole clip (host-side framing, device matmuls)
        n_frames = max(1, 1 + (len(audio) - cfg.win_length) // cfg.hop_length)
        idx = np.arange(n_frames)[:, None] * cfg.hop_length + np.arange(cfg.n_fft)[None, :]
        padded = np.pad(audio, (0, max(0, idx.max() + 1 - len(audio))))
        frames = padded[idx] * np.hanning(cfg.n_fft)
        spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
        fb = mel_filterbank(cfg.n_mels, cfg.n_fft // 2 + 1, cfg.sample_rate, cfg.n_fft)
        mel = np.log(spec @ fb + 1e-10).astype(np.float32)   # [T, mels]

        sub = cfg.subsampling
        core_mel = cfg.core_frames * sub
        all_probs: List[np.ndarray] = []
        stt = 0
        chunk_i = 0
        total_chunks = max(1, (n_frames + core_mel - 1) // core_mel)
        while stt < n_frames:
            chunk_i += 1
            if progress_handler:
                progress_handler(chunk_i / total_chunks, f"Diarizing {chunk_i}/{total_chunks}")
            left = min(cfg.left_context * sub, stt)
            end = min(stt + core_mel, n_frames)
            right = min(cfg.right_context * sub, n_frames - end)
            piece = mel[stt - left: end + right]
            chunk = np.zeros((cfg.chunk_frames, cfg.n_mels), np.float32)
            chunk[: min(len(piece), cfg.chunk_frames)] = piece[: cfg.chunk_frames]

            preds, embs, n_emb = self._chunk(
                self.params, chunk_mel=jnp.asarray(chunk),
                chunk_len=jnp.asarray(min(len(piece), cfg.chunk_frames), jnp.int32),
                spkcache=jnp.asarray(self._spkcache), spk_len=jnp.asarray(self._spk_len, jnp.int32),
                fifo=jnp.asarray(self._fifo), fifo_len=jnp.asarray(self._fifo_len, jnp.int32))
            preds, embs, n_emb = np.asarray(preds), np.asarray(embs), int(n_emb)

            lc = (left + sub - 1) // sub if left else 0
            rc = (right + sub - 1) // sub if right else 0
            core_len = max(0, n_emb - lc - rc)
            off = cfg.spkcache_len + cfg.fifo_len + lc
            all_probs.append(preds[off: off + core_len])
            self._update_state(embs[:n_emb])
            stt = end

        probs = np.concatenate(all_probs) if all_probs else np.zeros((0, cfg.max_speakers))
        frame_s = sub * cfg.hop_length / cfg.sample_rate
        return self._binarize(probs, frame_s)

    def _binarize(self, probs: np.ndarray, frame_s: float) -> List[DiarizedSegment]:
        from ..pyannote.model import binarize

        out: List[DiarizedSegment] = []
        for spk in range(probs.shape[1] if probs.size else 0):
            for s, e in binarize(probs[:, spk], frame_s, self.cfg.onset, self.cfg.offset,
                                 self.cfg.min_speech_s, self.cfg.min_silence_s):
                out.append(DiarizedSegment(start=s, end=e, speaker=spk))
        out.sort(key=lambda d: (d.start, d.speaker))
        return out

    def unload(self):
        self.params = None
        self._loaded = False

    @property
    def is_loaded(self):
        return self._loaded

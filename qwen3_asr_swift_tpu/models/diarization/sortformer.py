"""Sortformer streaming end-to-end diarizer — the published NeMo topology.

TPU-native analog of the reference's SortformerDiarizer (reference:
Sources/SpeechVAD/SortformerDiarizer.swift:19-360 — NeMo streaming
Sortformer consumed as an opaque CoreML artifact; chunking 6 s core /
1 s left / 7 s right, a 188-frame speaker cache and 40-frame FIFO carried
between chunks at the FastConformer embedding width, per-frame 4-speaker
sigmoid predictions — SortformerConfig.swift:65-70).  The NeMo
FIFO→spkcache streaming-update semantics are reproduced exactly
(SortformerDiarizer.swift:284-360).

Network (the published NeMo Sortformer graph):

  NeMo log-mel (shared with Parakeet, models/parakeet/mel.py)
  → FastConformer encoder (shared implementation with ParakeetASR —
    models/parakeet/encoder.py: dw_striding 8× subsampling, rel-pos MHSA,
    conv modules) → 512-d frame embeddings (these are what the spkcache /
    FIFO hold)
  → encoder_proj Linear 512→192 over [spkcache ‖ fifo ‖ chunk]
  → 18-layer post-LN Transformer (d=192, ff=768 ReLU, 8 heads, no
    positional encoding — arrival-order invariance is the point of the
    sort objective)
  → ReLU → first_hidden_to_hidden 192→192 → ReLU → single_hidden_to_spks
  → sigmoid speaker probabilities.

TPU shape: one jitted chunk program; the ragged cache/fifo lengths are
masks over fixed-capacity buffers, so one compiled executable serves the
whole stream.
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
from ..parakeet.config import ParakeetConfig
from ..parakeet.encoder import encode as fastconformer_encode
from ..parakeet.encoder import init_encoder_params, subsampled_length


@dataclasses.dataclass(frozen=True)
class SortformerConfig:
    n_mels: int = 128
    sample_rate: int = 16000
    n_fft: int = 512
    hop_length: int = 160
    win_length: int = 400
    # FastConformer encoder (NeMo sortformer recipe)
    encoder_layers: int = 18
    encoder_hidden: int = 512
    num_heads: int = 8
    ffn_expansion: int = 4
    conv_kernel: int = 9
    subsampling_channels: int = 256
    subsampling: int = 8
    # transformer head
    tf_layers: int = 18
    tf_hidden: int = 192
    tf_ff: int = 768
    tf_heads: int = 8
    max_speakers: int = 4
    # streaming chunking in seconds (reference SortformerConfig.swift:65-70)
    chunk_len_s: float = 6.0
    left_context_s: float = 1.0
    right_context_s: float = 7.0
    spkcache_len: int = 188
    fifo_len: int = 40
    # post
    onset: float = 0.5
    offset: float = 0.35
    min_speech_s: float = 0.2
    min_silence_s: float = 0.2

    @property
    def core_mel(self) -> int:
        return int(self.chunk_len_s * self.sample_rate / self.hop_length)

    @property
    def left_mel(self) -> int:
        return int(self.left_context_s * self.sample_rate / self.hop_length)

    @property
    def right_mel(self) -> int:
        return int(self.right_context_s * self.sample_rate / self.hop_length)

    @property
    def chunk_mel(self) -> int:
        return self.core_mel + self.left_mel + self.right_mel

    @property
    def d_model(self) -> int:
        """Cache/FIFO embedding width = FastConformer output width."""
        return self.encoder_hidden

    def encoder_config(self) -> ParakeetConfig:
        return ParakeetConfig(
            num_mel_bins=self.n_mels, sample_rate=self.sample_rate,
            n_fft=self.n_fft, hop_length=self.hop_length, win_length=self.win_length,
            encoder_hidden=self.encoder_hidden, encoder_layers=self.encoder_layers,
            num_heads=self.num_heads, ffn_expansion=self.ffn_expansion,
            conv_kernel=self.conv_kernel, subsampling_channels=self.subsampling_channels)


CONFIG_SORTFORMER = SortformerConfig()


def config_tiny() -> SortformerConfig:
    return SortformerConfig(
        n_mels=32, encoder_layers=1, encoder_hidden=16, num_heads=2,
        ffn_expansion=2, conv_kernel=5, subsampling_channels=8,
        tf_layers=1, tf_hidden=16, tf_ff=32, tf_heads=2, max_speakers=3,
        chunk_len_s=0.16, left_context_s=0.08, right_context_s=0.08,
        spkcache_len=12, fifo_len=4)


def init_sortformer_params(key, cfg: SortformerConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 5 + cfg.tf_layers)
    d = cfg.tf_hidden

    def tf_block(key):
        k = jax.random.split(key, 6)
        return {
            "ln1": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "q": init_linear(k[0], d, d, dtype=dtype),
            "k": init_linear(k[1], d, d, dtype=dtype),
            "v": init_linear(k[2], d, d, dtype=dtype),
            "o": init_linear(k[3], d, d, dtype=dtype),
            "ln2": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "ff1": init_linear(k[4], d, cfg.tf_ff, dtype=dtype),
            "ff2": init_linear(k[5], cfg.tf_ff, d, dtype=dtype),
        }

    return {
        "encoder": init_encoder_params(ks[0], cfg.encoder_config(), dtype=dtype),
        "encoder_proj": init_linear(ks[1], cfg.encoder_hidden, d, dtype=dtype),
        "transformer": [tf_block(ks[5 + i]) for i in range(cfg.tf_layers)],
        "head": {
            "hidden": init_linear(ks[2], d, d, dtype=dtype),
            "spks": init_linear(ks[3], d, cfg.max_speakers, dtype=dtype),
        },
    }


def _tf_block(p, x, mask, num_heads):
    """NeMo post-LN Transformer block: attn → +res → LN1 → ReLU-FFN → +res
    → LN2 (nemo TransformerEncoderBlock, pre_ln=False)."""
    b, t, d = x.shape
    hd = d // num_heads
    q = linear(x, p["q"]).reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    k = linear(x, p["k"]).reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    v = linear(x, p["v"]).reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / np.sqrt(hd)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32))
    attn = linear(o.transpose(0, 2, 1, 3).reshape(b, t, d).astype(x.dtype), p["o"])
    x = layer_norm(x + attn, p["ln1"]["weight"], p["ln1"]["bias"])
    ff = linear(jax.nn.relu(linear(x, p["ff1"])), p["ff2"])
    return layer_norm(x + ff, p["ln2"]["weight"], p["ln2"]["bias"])


def sortformer_chunk(params, cfg: SortformerConfig, chunk_mel, chunk_len,
                     spkcache, spk_len, fifo, fifo_len):
    """One streaming chunk.

    chunk_mel [chunk_mel_frames, mels] (normalized NeMo log-mel);
    chunk_len scalar (valid mel frames); spkcache [spkcache_len, D];
    fifo [fifo_len, D]; lengths int32.  Returns (preds [total, max_speakers]
    fp32 sigmoid, embs [emb_cap, D], n_emb) where
    total = spkcache_len + fifo_len + emb_cap."""
    embs, n_out = fastconformer_encode(
        params["encoder"], chunk_mel[None], jnp.asarray(chunk_len)[None],
        cfg.encoder_config())
    emb_cap = embs.shape[1]
    n_emb = jnp.minimum(n_out[0], emb_cap)
    emb_valid = jnp.arange(emb_cap) < n_emb

    seq = jnp.concatenate([spkcache[None], fifo[None], embs], axis=1)
    x = linear(seq, params["encoder_proj"])
    valid = jnp.concatenate([
        jnp.arange(cfg.spkcache_len) < spk_len,
        jnp.arange(cfg.fifo_len) < fifo_len,
        emb_valid,
    ])
    mask = jnp.where(valid[None, None, None, :], 0.0, NEG_INF).astype(jnp.float32)
    for p in params["transformer"]:
        x = _tf_block(p, x, mask, cfg.tf_heads)

    # forward_speaker_sigmoids: ReLU → hidden → ReLU → spks → sigmoid
    h = jax.nn.relu(x)
    h = linear(h, params["head"]["hidden"])
    h = jax.nn.relu(h)
    preds = jax.nn.sigmoid(linear(h, params["head"]["spks"]).astype(jnp.float32))[0]
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
        from .sortformer_convert import convert_checkpoint

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode)
        cfg, params = convert_checkpoint(model_dir)
        return cls(cfg, params, **kw)

    def reset_state(self):
        cfg = self.cfg
        self._spkcache = np.zeros((cfg.spkcache_len, cfg.d_model), np.float32)
        self._spk_len = 0
        self._fifo = np.zeros((cfg.fifo_len, cfg.d_model), np.float32)
        self._fifo_len = 0

    # -- NeMo streaming_update (reference: SortformerDiarizer.swift:284-360)

    def _update_state(self, embs: np.ndarray):
        """Append a chunk's embeddings to the FIFO; overflow (oldest
        first) moves into the speaker cache, which itself drops its
        oldest rows past capacity. Handles chunks LARGER than the FIFO
        (the pretrained config's 75-frame chunks vs fifo_len 40 — the
        old in-place shuffle read stale rows and over-wrote capacity
        there)."""
        n = len(embs)
        if n == 0:
            return
        cap_f = self.cfg.fifo_len
        stream = np.concatenate([self._fifo[: self._fifo_len], embs])  # oldest..newest
        if len(stream) > cap_f:
            split = len(stream) - cap_f
            self._push_spkcache(stream[:split])
            stream = stream[split:]
        self._fifo[: len(stream)] = stream
        self._fifo_len = len(stream)

    def _push_spkcache(self, moved: np.ndarray):
        cap_c = self.cfg.spkcache_len
        if len(moved) >= cap_c:
            self._spkcache[:] = moved[-cap_c:]
            self._spk_len = cap_c
            return
        total = self._spk_len + len(moved)
        if total <= cap_c:
            self._spkcache[self._spk_len : total] = moved
            self._spk_len = total
            return
        drop = total - cap_c
        keep = self._spk_len - drop
        self._spkcache[:keep] = self._spkcache[drop : self._spk_len]
        self._spkcache[keep : keep + len(moved)] = moved
        self._spk_len = cap_c

    # -- public API -----------------------------------------------------------

    def diarize(self, audio: np.ndarray, sample_rate: int = 16000,
                progress_handler=None) -> List[DiarizedSegment]:
        from ...audio.resample import resample
        from ..parakeet.mel import nemo_log_mel_reference

        cfg = self.cfg
        if sample_rate != cfg.sample_rate:
            audio = resample(np.asarray(audio, np.float32), sample_rate, cfg.sample_rate)
        audio = np.asarray(audio, np.float32)
        if len(audio) == 0:
            return []
        self.reset_state()

        mel = np.asarray(nemo_log_mel_reference(audio, cfg.encoder_config()))  # [T, mels]
        n_frames = mel.shape[0]

        sub = cfg.subsampling
        core_mel = cfg.core_mel
        all_probs: List[np.ndarray] = []
        stt = 0
        chunk_i = 0
        total_chunks = max(1, (n_frames + core_mel - 1) // core_mel)
        while stt < n_frames:
            chunk_i += 1
            if progress_handler:
                progress_handler(chunk_i / total_chunks, f"Diarizing {chunk_i}/{total_chunks}")
            left = min(cfg.left_mel, stt)
            end = min(stt + core_mel, n_frames)
            right = min(cfg.right_mel, n_frames - end)
            piece = mel[stt - left: end + right]
            chunk = np.zeros((cfg.chunk_mel, cfg.n_mels), np.float32)
            chunk[: min(len(piece), cfg.chunk_mel)] = piece[: cfg.chunk_mel]

            preds, embs, n_emb = self._chunk(
                self.params, chunk_mel=jnp.asarray(chunk),
                chunk_len=jnp.asarray(min(len(piece), cfg.chunk_mel), jnp.int32),
                spkcache=jnp.asarray(self._spkcache), spk_len=jnp.asarray(self._spk_len, jnp.int32),
                fifo=jnp.asarray(self._fifo), fifo_len=jnp.asarray(self._fifo_len, jnp.int32))
            preds, embs, n_emb = np.asarray(preds), np.asarray(embs), int(n_emb)

            lc = subsampled_length(left) if left else 0
            rc = n_emb - subsampled_length(left + (end - stt)) if right else 0
            core_len = max(0, n_emb - lc - rc)
            off = cfg.spkcache_len + cfg.fifo_len + lc
            all_probs.append(preds[off: off + core_len])
            self._update_state(embs[lc: lc + core_len])
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

"""FireRedVAD: FSMN voice activity detection.

TPU-native analog of the reference's FireRedVAD module (reference:
Sources/SpeechVAD/FireRedVAD.swift:9-330 — a ~588K-param FSMN network on
80-dim Kaldi log-mel fbank (25 ms / 10 ms, snip_edges), consumed there as
an opaque CoreML artifact; post-processing: probability smoothing over a
5-frame window, 0.4 threshold, 0.2 s min-speech / min-silence —
FireRedVAD.swift:31-35, 417; 6000-frame chunking for long audio —
FireRedVAD.swift:130-152).

The network is the published FSMN-VAD topology (the FunASR/DFSMN recipe
FireRedVAD derives from):

  fbank [T,80] → LFR stack (m=5,n=1, first-frame left padding) [T,400]
  → affine 400→140 → affine 140→250 → ReLU
  → N × BasicBlock( linear 250→128 (no bias)
                    → depthwise causal memory Conv(lorder [+rorder]) + skip
                    → affine 128→250 → ReLU )
  → affine 250→140 → affine 140→output_pdfs → softmax
  speech prob = 1 − P(silence pdfs)

All dims are inferred from the checkpoint shapes at conversion time
(convert.py), so size variants load without config edits.  The memory
convs are plain depthwise 1-D convolutions, so the entire utterance
scores in one jitted program — no recurrence.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import SpeechSegment, VoiceActivityDetectionModel
from ...ops.fbank import kaldi_fbank
from ...ops.nn import init_linear, linear


@dataclasses.dataclass(frozen=True)
class FireRedVADConfig:
    num_mels: int = 80
    sample_rate: int = 16000
    frame_len: int = 400        # 25 ms
    hop: int = 160              # 10 ms
    lfr_m: int = 5              # stacked frames (input dim = num_mels * lfr_m)
    lfr_n: int = 1              # frame subsampling
    in_affine: int = 140
    linear_dim: int = 250
    proj_dim: int = 128
    num_blocks: int = 4
    lorder: int = 20            # causal memory taps
    rorder: int = 0             # lookahead taps
    out_affine: int = 140
    output_dim: int = 248       # senone pdfs; pdf 0 = silence
    sil_pdfs: Tuple[int, ...] = (0,)
    # post-processing (reference: FireRedVAD.swift:31-35)
    speech_threshold: float = 0.4
    smooth_window: int = 5
    min_speech_s: float = 0.2
    min_silence_s: float = 0.2
    max_frames: int = 6000      # long-audio chunking (FireRedVAD.swift:130)


CONFIG_FIRERED = FireRedVADConfig()


def config_tiny() -> FireRedVADConfig:
    return FireRedVADConfig(num_mels=20, lfr_m=3, in_affine=12, linear_dim=16,
                            proj_dim=8, num_blocks=2, lorder=4, rorder=1,
                            output_dim=4)


def init_firered_params(key, cfg: FireRedVADConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 4 + cfg.num_blocks)
    params = {
        "in1": init_linear(ks[0], cfg.num_mels * cfg.lfr_m, cfg.in_affine, dtype=dtype),
        "in2": init_linear(ks[1], cfg.in_affine, cfg.linear_dim, dtype=dtype),
        "blocks": [],
        "out1": init_linear(ks[2], cfg.linear_dim, cfg.out_affine, dtype=dtype),
        "out2": init_linear(ks[3], cfg.out_affine, cfg.output_dim, dtype=dtype),
    }
    for i in range(cfg.num_blocks):
        k = jax.random.split(ks[4 + i] if 4 + i < len(ks) else ks[-1], 4)
        block = {
            "linear": init_linear(k[0], cfg.linear_dim, cfg.proj_dim, bias=False, dtype=dtype),
            "conv_left": (jax.random.normal(k[1], (cfg.lorder, 1, cfg.proj_dim))
                          / cfg.lorder).astype(dtype),
            "affine": init_linear(k[2], cfg.proj_dim, cfg.linear_dim, dtype=dtype),
        }
        if cfg.rorder > 0:
            block["conv_right"] = (jax.random.normal(k[3], (cfg.rorder, 1, cfg.proj_dim))
                                   / max(1, cfg.rorder)).astype(dtype)
        params["blocks"].append(block)
    return params


def lfr_stack(feats, m: int, n: int):
    """Low-frame-rate stacking: frame t ← concat(feats[t-(m-1)//2 … ]),
    left-padded by repeating the first frame (the FunASR LFR convention).
    feats [T, D] → [ceil(T/n), D*m]."""
    t = feats.shape[0]
    left = (m - 1) // 2
    padded = jnp.concatenate([jnp.repeat(feats[:1], left, axis=0), feats,
                              jnp.repeat(feats[-1:], m, axis=0)], axis=0)
    idx = np.arange(0, t, n)[:, None] + np.arange(m)[None, :]
    return padded[idx].reshape(len(range(0, t, n)), -1)


def _memory_conv(x, w, causal: bool):
    """Depthwise memory conv over time.  w [taps, 1, D].  ``causal`` reads
    frames t-taps+1 … t (history incl. current); otherwise frames
    t+1 … t+taps (pure lookahead — the FSMN conv_right convention skips the
    current frame)."""
    taps = w.shape[0]
    if causal:
        xp = jnp.pad(x, ((0, 0), (taps - 1, 0), (0, 0)))
    else:
        xp = jnp.pad(x, ((0, 0), (0, taps), (0, 0)))[:, 1:, :]
    y = jax.lax.conv_general_dilated(
        xp, w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=w.shape[-1],
        preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def fsmn_forward(params, cfg: FireRedVADConfig, feats, valid_rows=None):
    """feats [B, T, mels*lfr_m] → speech prob [B, T].

    ``valid_rows`` (traced scalar): when feats is right-padded to a static
    bucket, memory-conv inputs are zeroed beyond the valid rows so padding
    contributes exactly what the unpadded path's zero conv-padding would —
    valid-row outputs are identical to running on the unpadded sequence."""
    x = linear(feats, params["in1"])
    x = linear(x, params["in2"])
    x = jax.nn.relu(x)
    mask = None
    if valid_rows is not None:
        mask = jnp.arange(feats.shape[1])[None, :, None] < valid_rows
    for p in params["blocks"]:
        h = linear(x, p["linear"])                       # [B,T,proj]
        if mask is not None:
            h = jnp.where(mask, h, jnp.zeros((), h.dtype))
        mem = h + _memory_conv(h, p["conv_left"], causal=True)
        if "conv_right" in p:
            mem = mem + _memory_conv(h, p["conv_right"], causal=False)
        x = jax.nn.relu(linear(mem, p["affine"]))
    x = linear(x, params["out1"])
    logits = linear(x, params["out2"]).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    sil = probs[..., jnp.asarray(cfg.sil_pdfs)].sum(-1)
    return 1.0 - sil


def fused_vad_forward(params, audio, n_samples, *, cfg: FireRedVADConfig):
    """fbank → LFR stack → FSMN in ONE jitted program (audio bucket-padded
    to a static length, ``n_samples`` the traced valid count).

    Eagerly dispatching the frontend op-by-op costs dozens of device
    round-trips per call (3.2 s p50 for 60 s audio over the tunnel vs
    ~0.1 s fused); the reference runs the whole network as one compiled
    CoreML artifact (FireRedVAD.swift:31-35) and this is the XLA analog.
    The LFR repeat-padding convention is reproduced with clamped gather
    indices, and padded rows are masked inside fsmn_forward, so valid
    outputs equal the unpadded eager path."""
    feats = kaldi_fbank(audio, num_bins=cfg.num_mels, frame_len=cfg.frame_len,
                        hop=cfg.hop, sample_rate=cfg.sample_rate)
    t_max = feats.shape[0]
    t_valid = jnp.maximum(1 + (n_samples - cfg.frame_len) // cfg.hop, 0)
    left = (cfg.lfr_m - 1) // 2
    starts = np.arange(0, t_max, cfg.lfr_n)
    idx = starts[:, None] + np.arange(cfg.lfr_m)[None, :] - left
    idx = jnp.clip(jnp.asarray(idx), 0, jnp.maximum(t_valid - 1, 0))
    stacked = feats[idx].reshape(len(starts), -1)
    rows_valid = (t_valid + cfg.lfr_n - 1) // cfg.lfr_n
    return fsmn_forward(params, cfg, stacked[None], valid_rows=rows_valid)[0]


DEFAULT_BUCKETS_S = (1, 2, 5, 10, 20, 30, 60)


class FireRedVAD(VoiceActivityDetectionModel):
    def __init__(self, cfg: FireRedVADConfig, params, dtype=jnp.float32,
                 buckets_s=DEFAULT_BUCKETS_S):
        from ...ops.quant import cast_tree

        self.cfg = cfg
        self.params = cast_tree(params, dtype)
        self._loaded = True
        self._buckets_s = tuple(sorted(buckets_s))
        self._forward = jax.jit(functools.partial(fsmn_forward, cfg=cfg))
        self._fused = jax.jit(functools.partial(fused_vad_forward, cfg=cfg))

    @classmethod
    def init_random(cls, cfg: Optional[FireRedVADConfig] = None, seed: int = 0, **kw):
        cfg = cfg or config_tiny()
        return cls(cfg, init_firered_params(jax.random.PRNGKey(seed), cfg), **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "aufklarer/FireRedVAD",
                        cache_dir=None, offline_mode: bool = False, **kw):
        from ...core.hub import download_weights
        from .convert import convert_checkpoint

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode)
        cfg, params = convert_checkpoint(model_dir)
        return cls(cfg, params, **kw)

    # -- inference -----------------------------------------------------------

    def _bucket_samples(self, n: int) -> Optional[int]:
        for s in self._buckets_s:
            if n <= s * self.cfg.sample_rate:
                return s * self.cfg.sample_rate
        return None

    def frame_probabilities(self, audio: np.ndarray, sample_rate: int = 16000) -> np.ndarray:
        from ...audio.resample import resample

        audio = np.asarray(audio, np.float32)
        if sample_rate != self.cfg.sample_rate:
            audio = resample(audio, sample_rate, self.cfg.sample_rate)
        n_samp = int(audio.shape[0])
        t_valid = max(0, 1 + (n_samp - self.cfg.frame_len) // self.cfg.hop)
        rows_valid = -(-t_valid // self.cfg.lfr_n)
        if rows_valid == 0:
            return np.zeros(0, np.float32)
        bucket = self._bucket_samples(n_samp)
        if bucket is not None and rows_valid <= self.cfg.max_frames:
            staged = np.zeros(bucket, np.float32)
            staged[:n_samp] = audio
            probs = np.asarray(self._fused(self.params, staged, n_samp))
            return probs[:rows_valid]
        feats = kaldi_fbank(jnp.asarray(audio, jnp.float32), num_bins=self.cfg.num_mels,
                            frame_len=self.cfg.frame_len, hop=self.cfg.hop)
        stacked = lfr_stack(feats, self.cfg.lfr_m, self.cfg.lfr_n)
        # long-audio chunking (reference FireRedVAD.swift:130-152).  Unlike
        # the reference's hard cuts, chunks overlap by the network's total
        # receptive extent and the overlap is discarded, so chunked scores
        # equal the single-pass scores.
        n = stacked.shape[0]
        if n <= self.cfg.max_frames:
            return np.asarray(self._forward(self.params, feats=stacked[None])[0])
        left = self.cfg.lorder * self.cfg.num_blocks
        right = self.cfg.rorder * self.cfg.num_blocks
        out = []
        for off in range(0, n, self.cfg.max_frames):
            lo = max(0, off - left)
            hi = min(n, off + self.cfg.max_frames + right)
            probs = np.asarray(self._forward(self.params, feats=stacked[lo:hi][None])[0])
            out.append(probs[off - lo: off - lo + self.cfg.max_frames])
        return np.concatenate(out)

    def detect_speech(self, audio: np.ndarray, sample_rate: int = 16000) -> List[SpeechSegment]:
        probs = self.frame_probabilities(audio, sample_rate)
        if len(probs) == 0:
            return []
        # moving-average smoothing (reference: smoothWindowSize=5)
        w = self.cfg.smooth_window
        if w > 1:
            kernel = np.ones(w) / w
            probs = np.convolve(probs, kernel, mode="same")
        frame_s = self.cfg.hop * self.cfg.lfr_n / self.cfg.sample_rate
        # shared hysteresis/merge/min-duration machinery (onset == offset =
        # the plain threshold this model uses); one implementation with
        # silero/pyannote/sortformer instead of a third hand-rolled copy
        from ..pyannote.model import binarize

        segs = binarize(probs, frame_s,
                        onset=self.cfg.speech_threshold,
                        offset=self.cfg.speech_threshold,
                        min_speech_s=self.cfg.min_speech_s,
                        min_silence_s=self.cfg.min_silence_s)
        return [SpeechSegment(start=s, end=e) for s, e in segs]

    def speech_probabilities(self, audio: np.ndarray, sample_rate: int = 16000) -> np.ndarray:
        return self.frame_probabilities(np.asarray(audio, np.float32), sample_rate)

    def warm_up(self):
        self.detect_speech(np.zeros(self.cfg.sample_rate, np.float32))

    def unload(self):
        self.params = None
        self._loaded = False

    @property
    def is_loaded(self):
        return self._loaded

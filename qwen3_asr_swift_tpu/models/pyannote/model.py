"""Pyannote segmentation-3.0: SincNet → BiLSTM → powerset speakers.

TPU-native analog of the reference's Pyannote stack (reference:
Sources/SpeechVAD/SincNet.swift:15-80 — InstanceNorm(1) →
Conv1d(1,80,k251,s10) → |·| → MaxPool3 → IN → LeakyReLU, then two
Conv1d(k5)+Pool3+IN+LeakyReLU stages; BiLSTM.swift:9-60 — 4-layer
bidirectional LSTM, 128/direction; Segmentation.swift:23-57 — 2×Linear128
→ 7-class powerset classifier; PowersetDecoder.swift:16-33 — class sums
→ per-speaker probabilities; VADPipeline.swift:5-60 — sliding 10 s
windows, overlap aggregation, hysteresis binarization).

TPU shape: the whole window forward (conv stack + both LSTM directions
as ``lax.scan`` + heads) is one jitted program over a batch of windows —
the sliding-window loop of the reference becomes a single batched call.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import SpeechSegment, VoiceActivityDetectionModel
from ...ops.nn import init_linear, linear


@dataclasses.dataclass(frozen=True)
class SegmentationConfig:
    sample_rate: int = 16000
    sincnet_filters: Tuple[int, ...] = (80, 60, 60)
    sincnet_kernels: Tuple[int, ...] = (251, 5, 5)
    sincnet_strides: Tuple[int, ...] = (10, 1, 1)
    sincnet_pools: Tuple[int, ...] = (3, 3, 3)
    lstm_hidden: int = 128
    lstm_layers: int = 4
    linear_hidden: int = 128
    linear_layers: int = 2
    num_classes: int = 7          # powerset for ≤3 speakers
    num_speakers: int = 3
    window_s: float = 10.0
    step_ratio: float = 0.5


SEGMENTATION_30 = SegmentationConfig()


def config_tiny() -> SegmentationConfig:
    return SegmentationConfig(
        sincnet_filters=(8, 6, 6), sincnet_kernels=(65, 5, 5),
        lstm_hidden=8, lstm_layers=1, linear_hidden=8, linear_layers=1,
        window_s=1.0,
    )


# powerset classes: 0=∅, 1..3 = solo speakers, 4=(1,2), 5=(1,3), 6=(2,3)
_POWERSET = [(), (0,), (1,), (2,), (0, 1), (0, 2), (1, 2)]


def powerset_to_speakers(posteriors):
    """[..., 7] softmax → [..., 3] per-speaker probabilities
    (reference: PowersetDecoder.speakerProbabilities)."""
    mapping = np.zeros((7, 3), np.float32)
    for cls, members in enumerate(_POWERSET):
        for m in members:
            mapping[cls, m] = 1.0
    return posteriors @ jnp.asarray(mapping)


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def _lstm_init(key, d_in, d_h, dtype):
    k1, k2 = jax.random.split(key)
    s = 1.0 / np.sqrt(d_h)
    return {
        "wx": (jax.random.uniform(k1, (d_in, 4 * d_h), minval=-s, maxval=s)).astype(dtype),
        "wh": (jax.random.uniform(k2, (d_h, 4 * d_h), minval=-s, maxval=s)).astype(dtype),
        "bias": jnp.zeros((4 * d_h,), dtype),
    }


def init_segmentation_params(key, cfg: SegmentationConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8 + 2 * cfg.lstm_layers + cfg.linear_layers)
    chans = (1,) + cfg.sincnet_filters[:-1]
    params = {"conv": [], "lstm_fwd": [], "lstm_bwd": [], "linear": []}
    for i, (cin, cout, k) in enumerate(zip(chans, cfg.sincnet_filters, cfg.sincnet_kernels)):
        scale = 1.0 / np.sqrt(k * cin)
        params["conv"].append({
            "kernel": (jax.random.normal(ks[i], (k, cin, cout)) * scale).astype(dtype),
            "bias": jnp.zeros((cout,), dtype),
        })
    d_in = cfg.sincnet_filters[-1]
    for i in range(cfg.lstm_layers):
        src = d_in if i == 0 else 2 * cfg.lstm_hidden
        params["lstm_fwd"].append(_lstm_init(ks[4 + 2 * i], src, cfg.lstm_hidden, dtype))
        params["lstm_bwd"].append(_lstm_init(ks[5 + 2 * i], src, cfg.lstm_hidden, dtype))
    src = 2 * cfg.lstm_hidden
    for i in range(cfg.linear_layers):
        params["linear"].append(init_linear(ks[4 + 2 * cfg.lstm_layers + i], src,
                                            cfg.linear_hidden, dtype=dtype))
        src = cfg.linear_hidden
    params["classifier"] = init_linear(ks[-1], src, cfg.num_classes, dtype=dtype)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _instance_norm(x, p=None, eps=1e-5):
    """Per-channel normalization over time with optional affine params
    (pyannote's SincNet uses InstanceNorm1d(affine=True) for the wave norm
    and after every conv). x: [B, T, C]; p: {"scale","bias"} or None."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if p is not None:
        y = y * p["scale"] + p["bias"]
    return y


def _max_pool_t(x, k):
    """[B, T, C] → [B, T//k, C] max pooling over time."""
    t = (x.shape[1] // k) * k
    return jnp.max(x[:, :t].reshape(x.shape[0], t // k, k, x.shape[2]), axis=2)


def sincnet(params, cfg: SegmentationConfig, wave):
    """wave [B, S] → features [B, frames, 60]."""
    x = _instance_norm(wave[:, :, None], params.get("wav_norm"))
    for i, p in enumerate(params["conv"]):
        x = jax.lax.conv_general_dilated(
            x, p["kernel"], window_strides=(cfg.sincnet_strides[i],), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32,
        ) + p["bias"]
        if i == 0:
            x = jnp.abs(x)
        x = _max_pool_t(x, cfg.sincnet_pools[i])
        x = jax.nn.leaky_relu(_instance_norm(x, p.get("norm")), 0.01)
    return x


def _lstm_scan(p, xs, reverse=False):
    """xs [B, T, D] → hidden sequence [B, T, H] via lax.scan."""
    b = xs.shape[0]
    h0 = jnp.zeros((b, p["wh"].shape[0]), xs.dtype)
    c0 = jnp.zeros_like(h0)

    def step(carry, x_t):
        h, c = carry
        gates = x_t @ p["wx"] + h @ p["wh"] + p["bias"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    seq = xs.transpose(1, 0, 2)
    _, hs = jax.lax.scan(step, (h0, c0), seq, reverse=reverse)
    return hs.transpose(1, 0, 2)


def segmentation_forward(params, cfg: SegmentationConfig, wave):
    """wave [B, S] → powerset posteriors [B, frames, num_classes]."""
    x = sincnet(params, cfg, wave)
    for pf, pb in zip(params["lstm_fwd"], params["lstm_bwd"]):
        fwd = _lstm_scan(pf, x)
        bwd = _lstm_scan(pb, x, reverse=True)
        x = jnp.concatenate([fwd, bwd], axis=-1)
    for p in params["linear"]:
        x = jax.nn.leaky_relu(linear(x, p), 0.01)
    return jax.nn.softmax(linear(x, params["classifier"]).astype(jnp.float32), axis=-1)


# ---------------------------------------------------------------------------
# models
# ---------------------------------------------------------------------------

class PyannoteSegmentation:
    """Speaker segmentation: windows → per-speaker activity tracks."""

    def __init__(self, cfg: SegmentationConfig, params, dtype=jnp.float32):
        from ...ops.quant import cast_tree

        self.cfg = cfg
        self.params = cast_tree(params, dtype)
        self._loaded = True
        self._forward = jax.jit(functools.partial(segmentation_forward, cfg=cfg))

    @classmethod
    def init_random(cls, cfg: Optional[SegmentationConfig] = None, seed: int = 0, **kw):
        cfg = cfg or config_tiny()
        return cls(cfg, init_segmentation_params(jax.random.PRNGKey(seed), cfg), **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "pyannote/segmentation-3.0",
                        cache_dir=None, offline_mode: bool = False, **kw):
        from ...core.hub import download_weights
        from ...core.weights import load_safetensors
        from .convert import convert_segmentation

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode)
        return cls(SEGMENTATION_30, convert_segmentation(load_safetensors(model_dir),
                                                         SEGMENTATION_30), **kw)

    def frames_per_window(self, window_samples: int) -> int:
        t = window_samples
        for i in range(len(self.cfg.sincnet_kernels)):
            t = (t - self.cfg.sincnet_kernels[i]) // self.cfg.sincnet_strides[i] + 1
            t = t // self.cfg.sincnet_pools[i]
        return t

    def speaker_activity(self, audio: np.ndarray, sample_rate: int = 16000) -> np.ndarray:
        """Sliding-window inference + overlap aggregation → [frames, 3]
        per-speaker probabilities (reference: VADPipeline sliding windows,
        batched through the jit in one call)."""
        from ...audio.resample import resample

        if sample_rate != self.cfg.sample_rate:
            audio = resample(np.asarray(audio, np.float32), sample_rate, self.cfg.sample_rate)
        audio = np.asarray(audio, np.float32)
        win = int(self.cfg.window_s * self.cfg.sample_rate)
        step = max(1, int(win * self.cfg.step_ratio))
        starts = list(range(0, max(1, len(audio) - win + 1), step))
        if not starts or (starts[-1] + win < len(audio)):
            starts.append(max(0, len(audio) - win))
        windows = np.zeros((len(starts), win), np.float32)
        for i, s in enumerate(starts):
            seg = audio[s: s + win]
            windows[i, : len(seg)] = seg

        post = np.asarray(self._forward(self.params, wave=jnp.asarray(windows)))
        speakers = np.asarray(powerset_to_speakers(jnp.asarray(post)))  # [W, F, 3]

        f_per_win = speakers.shape[1]
        frame_hop = win / f_per_win
        total_frames = int(np.ceil(len(audio) / frame_hop))
        acc = np.zeros((total_frames, self.cfg.num_speakers), np.float64)
        cnt = np.zeros((total_frames, 1), np.float64)
        for i, s in enumerate(starts):
            f0 = int(round(s / frame_hop))
            f1 = min(f0 + f_per_win, total_frames)
            acc[f0:f1] += speakers[i, : f1 - f0]
            cnt[f0:f1] += 1
        return (acc / np.maximum(cnt, 1)).astype(np.float32)

    @property
    def frame_duration(self) -> float:
        win = int(self.cfg.window_s * self.cfg.sample_rate)
        return self.cfg.window_s / self.frames_per_window(win)

    def unload(self):
        self.params = None
        self._loaded = False

    @property
    def is_loaded(self):
        return self._loaded


def binarize(probs: np.ndarray, frame_duration: float, onset: float = 0.5,
             offset: float = 0.35, min_speech_s: float = 0.0,
             min_silence_s: float = 0.0) -> List[Tuple[float, float]]:
    """Hysteresis binarization (reference: PowersetDecoder.binarize)."""
    segments: List[Tuple[float, float]] = []
    active = False
    start = 0.0
    for i, p in enumerate(np.asarray(probs, np.float32)):
        t = i * frame_duration
        if not active and p >= onset:
            active, start = True, t
        elif active and p < offset:
            segments.append((start, t))
            active = False
    if active:
        segments.append((start, len(probs) * frame_duration))
    # merge short silences, drop short speech
    if min_silence_s > 0 and segments:
        merged = [segments[0]]
        for s, e in segments[1:]:
            if s - merged[-1][1] < min_silence_s:
                merged[-1] = (merged[-1][0], e)
            else:
                merged.append((s, e))
        segments = merged
    if min_speech_s > 0:
        segments = [(s, e) for s, e in segments if e - s >= min_speech_s]
    return segments


class PyannoteVAD(VoiceActivityDetectionModel):
    """VAD on top of segmentation: any-speaker activity → speech segments
    (reference: Sources/SpeechVAD/VADPipeline.swift)."""

    def __init__(self, segmentation: PyannoteSegmentation,
                 onset: float = 0.5, offset: float = 0.35,
                 min_speech_s: float = 0.1, min_silence_s: float = 0.1):
        self.segmentation = segmentation
        self.onset, self.offset = onset, offset
        self.min_speech_s, self.min_silence_s = min_speech_s, min_silence_s

    @classmethod
    def init_random(cls, cfg: Optional[SegmentationConfig] = None, **kw):
        return cls(PyannoteSegmentation.init_random(cfg), **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "pyannote/segmentation-3.0", **kw):
        return cls(PyannoteSegmentation.from_pretrained(model_id), **kw)

    def detect_speech(self, audio: np.ndarray, sample_rate: int = 16000) -> List[SpeechSegment]:
        tracks = self.segmentation.speaker_activity(audio, sample_rate)
        any_speaker = tracks.max(axis=-1)
        segs = binarize(any_speaker, self.segmentation.frame_duration,
                        self.onset, self.offset, self.min_speech_s, self.min_silence_s)
        return [SpeechSegment(start=s, end=e) for s, e in segs]

    def speech_probabilities(self, audio: np.ndarray, sample_rate: int = 16000) -> np.ndarray:
        """Per-frame any-speaker probabilities."""
        tracks = self.segmentation.speaker_activity(audio, sample_rate)
        return tracks.max(axis=-1) if len(tracks) else np.zeros(0, np.float32)

    def warm_up(self):
        self.detect_speech(np.zeros(int(self.segmentation.cfg.window_s
                                        * self.segmentation.cfg.sample_rate), np.float32))

    def unload(self):
        self.segmentation.unload()

    @property
    def is_loaded(self):
        return self.segmentation.is_loaded

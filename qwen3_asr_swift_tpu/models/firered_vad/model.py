"""FireRedVAD: DFSMN voice activity detection.

TPU-native analog of the reference's FireRedVAD module (reference:
Sources/SpeechVAD/FireRedVAD.swift:9-330 — a ~588K-param DFSMN network on
80-dim Kaldi log-mel fbank (25 ms / 10 ms, snip_edges), consumed there as
an opaque CoreML artifact; post-processing: probability smoothing over a
5-frame window, 0.4 threshold, 0.2 s min-speech / min-silence —
FireRedVAD.swift:31-35, 417).

Architecture (standard DFSMN-VAD recipe): input linear → N DFSMN blocks,
each = LayerNorm → ReLU(hidden linear) → projection linear → depthwise
"memory" conv over time (lookback+lookahead taps, dilation 1) with skip
connection from the previous projection → classifier → softmax(2).
The memory convs are plain depthwise 1-D convolutions, so the entire
utterance scores in one jitted program — no recurrence.
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
from ...ops.nn import init_linear, layer_norm, linear


@dataclasses.dataclass(frozen=True)
class FireRedVADConfig:
    num_mels: int = 80
    sample_rate: int = 16000
    frame_len: int = 400        # 25 ms
    hop: int = 160              # 10 ms
    hidden: int = 256
    proj: int = 128
    num_blocks: int = 6
    lookback: int = 10
    lookahead: int = 2
    # post-processing (reference: FireRedVAD.swift:31-35)
    speech_threshold: float = 0.4
    smooth_window: int = 5
    min_speech_s: float = 0.2
    min_silence_s: float = 0.2


CONFIG_FIRERED = FireRedVADConfig()


def config_tiny() -> FireRedVADConfig:
    return FireRedVADConfig(num_mels=20, hidden=16, proj=8, num_blocks=2,
                            lookback=3, lookahead=1)


def init_firered_params(key, cfg: FireRedVADConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 3 + cfg.num_blocks)
    params = {
        "input": init_linear(ks[0], cfg.num_mels, cfg.proj, dtype=dtype),
        "blocks": [],
        "classifier": init_linear(ks[1], cfg.proj, 2, dtype=dtype),
    }
    taps = cfg.lookback + cfg.lookahead + 1
    for i in range(cfg.num_blocks):
        k = jax.random.split(ks[3 + i], 3)
        params["blocks"].append({
            "ln": {"weight": jnp.ones((cfg.proj,), dtype), "bias": jnp.zeros((cfg.proj,), dtype)},
            "hidden": init_linear(k[0], cfg.proj, cfg.hidden, dtype=dtype),
            "proj": init_linear(k[1], cfg.hidden, cfg.proj, bias=False, dtype=dtype),
            "memory": (jax.random.normal(k[2], (taps, 1, cfg.proj)) / taps).astype(dtype),
        })
    return params


def dfsmn_forward(params, cfg: FireRedVADConfig, feats):
    """feats [B, T, mels] → speech prob [B, T] (class-1 softmax)."""
    x = linear(feats, params["input"])
    for p in params["blocks"]:
        h = layer_norm(x, p["ln"]["weight"], p["ln"]["bias"])
        h = jax.nn.relu(linear(h, p["hidden"]))
        proj = linear(h, p["proj"])
        # depthwise memory conv: pad lookback on the left, lookahead right
        padded = jnp.pad(proj, ((0, 0), (cfg.lookback, cfg.lookahead), (0, 0)))
        mem = jax.lax.conv_general_dilated(
            padded, p["memory"], window_strides=(1,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=cfg.proj,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        x = x + proj + mem   # DFSMN skip: input + projection + memory
    logits = linear(x, params["classifier"]).astype(jnp.float32)
    return jax.nn.softmax(logits, axis=-1)[..., 1]


class FireRedVAD(VoiceActivityDetectionModel):
    def __init__(self, cfg: FireRedVADConfig, params, dtype=jnp.float32):
        from ...ops.quant import cast_tree

        self.cfg = cfg
        self.params = cast_tree(params, dtype)
        self._loaded = True
        self._forward = jax.jit(functools.partial(dfsmn_forward, cfg=cfg))

    @classmethod
    def init_random(cls, cfg: Optional[FireRedVADConfig] = None, seed: int = 0, **kw):
        cfg = cfg or config_tiny()
        return cls(cfg, init_firered_params(jax.random.PRNGKey(seed), cfg), **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "aufklarer/FireRedVAD",
                        cache_dir=None, offline_mode: bool = False, **kw):
        from ...core.hub import download_weights
        from ...core.weights import load_safetensors, unflatten

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode)
        return cls(CONFIG_FIRERED, unflatten(load_safetensors(model_dir)), **kw)

    # -- inference -----------------------------------------------------------

    def frame_probabilities(self, audio: np.ndarray, sample_rate: int = 16000) -> np.ndarray:
        from ...audio.resample import resample

        if sample_rate != self.cfg.sample_rate:
            audio = resample(np.asarray(audio, np.float32), sample_rate, self.cfg.sample_rate)
        feats = kaldi_fbank(jnp.asarray(audio, jnp.float32), num_bins=self.cfg.num_mels,
                            frame_len=self.cfg.frame_len, hop=self.cfg.hop)
        probs = self._forward(self.params, feats=feats[None])
        return np.asarray(probs[0])

    def detect_speech(self, audio: np.ndarray, sample_rate: int = 16000) -> List[SpeechSegment]:
        probs = self.frame_probabilities(audio, sample_rate)
        if len(probs) == 0:
            return []
        # moving-average smoothing (reference: smoothWindowSize=5)
        w = self.cfg.smooth_window
        if w > 1:
            kernel = np.ones(w) / w
            probs = np.convolve(probs, kernel, mode="same")
        frame_s = self.cfg.hop / self.cfg.sample_rate
        speech = probs >= self.cfg.speech_threshold
        segs: List[Tuple[float, float]] = []
        start = None
        for i, s in enumerate(speech):
            if s and start is None:
                start = i * frame_s
            elif not s and start is not None:
                segs.append((start, i * frame_s))
                start = None
        if start is not None:
            segs.append((start, len(speech) * frame_s))
        # merge short silences, drop short speech
        merged: List[Tuple[float, float]] = []
        for s, e in segs:
            if merged and s - merged[-1][1] < self.cfg.min_silence_s:
                merged[-1] = (merged[-1][0], e)
            else:
                merged.append((s, e))
        return [SpeechSegment(start=s, end=e) for s, e in merged
                if e - s >= self.cfg.min_speech_s]

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

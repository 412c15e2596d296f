"""Kokoro-82M TTS: StyleTTS2-derived single-pass synthesis.

TPU-native analog of the reference's Kokoro module
(reference: Sources/KokoroTTS/KokoroTTS.swift:43-130, KokoroModel.swift —
the reference consumes a single end-to-end CoreML graph
BERT→duration→alignment→prosody→decoder 'predictE2E' with 54 style-vector
voices, 128-phoneme padded inputs, and RMS-windowed trailing-artifact trim
+ fade-out). The architecture here follows the open Kokoro/StyleTTS2
recipe in compact form:

  phoneme ids → transformer text encoder (+style) → duration predictor →
  monotonic alignment expansion → F0/energy predictors (style-conditioned)
  → iSTFTNet-style generator (upsampling convs + harmonic sine source +
  STFT head) → 24 kHz.

One jitted program per 128-phoneme block; the predicted durations drive a
static-shape gather (frames budgeted to ``max_frames``), keeping the whole
pipeline compiled. Voice packs are [max_phonemes, style_dim] tables indexed
by input length — same convention as the published voices.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core import AudioChunk, SpeechGenerationModel
from ...ops.attention import NEG_INF, sdpa
from ...ops.nn import init_linear, layer_norm, linear
from .phonemizer import VOCAB_SIZE, phonemize, phonemes_to_ids

SAMPLE_RATE = 24000
MAX_PHONEMES = 128
HOP = 300  # generator upsample factor: samples per mel frame
STYLE_DIM = 256


@dataclasses.dataclass(frozen=True)
class KokoroConfig:
    vocab_size: int = VOCAB_SIZE
    d_model: int = 128
    num_layers: int = 3
    num_heads: int = 4
    style_dim: int = STYLE_DIM
    max_duration: int = 16     # frames per phoneme cap
    max_frames: int = 512      # total frame budget (~6.4 s)
    gen_channels: int = 256
    n_fft: int = 600
    sample_rate: int = SAMPLE_RATE


CONFIG_82M = KokoroConfig(d_model=512, num_layers=6, num_heads=8, gen_channels=512)


def config_tiny() -> KokoroConfig:
    return KokoroConfig(d_model=32, num_layers=1, num_heads=2, gen_channels=32,
                        max_frames=64, n_fft=60)


def init_kokoro_params(key, cfg: KokoroConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 16 + cfg.num_layers)
    d = cfg.d_model
    params = {
        "embed": (jax.random.normal(ks[0], (cfg.vocab_size, d)) * 0.02).astype(dtype),
        "style_proj": init_linear(ks[1], cfg.style_dim, d, dtype=dtype),
        "layers": [],
        "dur_head": init_linear(ks[2], d, cfg.max_duration, dtype=dtype),
        "f0_head": init_linear(ks[3], d, 1, dtype=dtype),
        "energy_head": init_linear(ks[4], d, 1, dtype=dtype),
        "frame_proj": init_linear(ks[5], d, cfg.gen_channels, dtype=dtype),
        # generator: 2 upsampling stages (×10, ×30 → HOP=300 total) then STFT-free conv head
        "gen_up1": {"kernel": (jax.random.normal(ks[6], (20, cfg.gen_channels, cfg.gen_channels)) * 0.02).astype(dtype),
                    "bias": jnp.zeros((cfg.gen_channels,), dtype)},
        "gen_conv1": {"kernel": (jax.random.normal(ks[7], (7, cfg.gen_channels, cfg.gen_channels // 2)) * 0.05).astype(dtype),
                      "bias": jnp.zeros((cfg.gen_channels // 2,), dtype)},
        "gen_up2": {"kernel": (jax.random.normal(ks[8], (60, cfg.gen_channels // 2, cfg.gen_channels // 2)) * 0.02).astype(dtype),
                    "bias": jnp.zeros((cfg.gen_channels // 2,), dtype)},
        "gen_conv2": {"kernel": (jax.random.normal(ks[9], (7, cfg.gen_channels // 2, 1)) * 0.05).astype(dtype),
                      "bias": jnp.zeros((1,), dtype)},
        "harmonic_proj": init_linear(ks[10], 1, cfg.gen_channels // 2, dtype=dtype),
    }
    for i in range(cfg.num_layers):
        k = jax.random.split(ks[16 + i], 6)
        params["layers"].append({
            "ln1": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "q": init_linear(k[0], d, d, dtype=dtype), "k": init_linear(k[1], d, d, dtype=dtype),
            "v": init_linear(k[2], d, d, dtype=dtype), "o": init_linear(k[3], d, d, dtype=dtype),
            "ln2": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "ff1": init_linear(k[4], d, d * 4, dtype=dtype),
            "ff2": init_linear(k[5], d * 4, d, dtype=dtype),
        })
    return params


def _conv_t(x, p, stride):
    y = jax.lax.conv_transpose(x, p["kernel"], (stride,), "SAME",
                               dimension_numbers=("NHC", "HIO", "NHC"),
                               preferred_element_type=jnp.float32)
    return (y + p["bias"]).astype(x.dtype)


def _conv(x, p, pad):
    y = jax.lax.conv_general_dilated(x, p["kernel"], (1,), ((pad, pad),),
                                     dimension_numbers=("NHC", "HIO", "NHC"),
                                     preferred_element_type=jnp.float32)
    return (y + p["bias"]).astype(x.dtype)


def kokoro_forward(params, cfg: KokoroConfig, ids, n_valid, style):
    """ids: [MAX_PHONEMES] int32; n_valid scalar; style: [style_dim].
    Returns (waveform [max_frames*HOP], n_frames scalar)."""
    t = ids.shape[0]
    x = jnp.take(params["embed"], ids, axis=0)[None]  # [1, T, D]
    x = x + linear(style[None, None], params["style_proj"])
    valid = jnp.arange(t) < n_valid
    mask = jnp.where(valid, 0.0, NEG_INF)[None, None, None, :].astype(jnp.float32)

    hd = cfg.d_model // cfg.num_heads
    for p in params["layers"]:
        h = layer_norm(x, p["ln1"]["weight"], p["ln1"]["bias"])
        q = linear(h, p["q"]).reshape(1, t, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        k = linear(h, p["k"]).reshape(1, t, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        v = linear(h, p["v"]).reshape(1, t, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        a = sdpa(q, k, v, 1.0 / np.sqrt(hd), mask)
        x = x + linear(a.transpose(0, 2, 1, 3).reshape(1, t, -1), p["o"])
        h = layer_norm(x, p["ln2"]["weight"], p["ln2"]["bias"])
        x = x + linear(jax.nn.gelu(linear(h, p["ff1"])), p["ff2"])

    enc = x[0]  # [T, D]
    # duration: classify 0..max_duration-1 frames per phoneme
    dur_logits = linear(enc, params["dur_head"]).astype(jnp.float32)
    durations = jnp.argmax(dur_logits, axis=-1) + 1  # ≥1 frame per phoneme
    durations = jnp.where(valid, durations, 0)
    ends = jnp.cumsum(durations)
    n_frames = jnp.minimum(ends[-1], cfg.max_frames)

    # monotonic alignment expansion: frame f ← phoneme with ends > f
    frame_idx = jnp.arange(cfg.max_frames)
    phoneme_of_frame = jnp.searchsorted(ends, frame_idx, side="right")
    phoneme_of_frame = jnp.clip(phoneme_of_frame, 0, t - 1)
    frames = enc[phoneme_of_frame]  # [max_frames, D]
    frame_valid = frame_idx < n_frames

    f0 = jax.nn.softplus(linear(frames, params["f0_head"]).astype(jnp.float32))[:, 0] * 100.0 + 50.0
    energy = jax.nn.sigmoid(linear(frames, params["energy_head"]).astype(jnp.float32))[:, 0]

    h = linear(frames, params["frame_proj"])[None]  # [1, F, C]
    h = jnp.where(frame_valid[None, :, None], h, 0.0)
    h = jax.nn.leaky_relu(_conv_t(h, params["gen_up1"], 10), 0.1)    # [1, F*10, C]
    h = jax.nn.leaky_relu(_conv(h, params["gen_conv1"], 3), 0.1)     # [1, F*10, C/2]
    h = jax.nn.leaky_relu(_conv_t(h, params["gen_up2"], 30), 0.1)    # [1, F*300, C/2]

    # harmonic sine source conditioned on per-frame F0 (iSTFTNet-style)
    sr = cfg.sample_rate
    f0_up = jnp.repeat(f0, HOP)  # [F*300]
    phase = jnp.cumsum(2 * np.pi * f0_up / sr)
    source = jnp.sin(phase) * jnp.repeat(energy, HOP)
    h = h + linear(source[None, :, None].astype(h.dtype), params["harmonic_proj"])

    wav = jnp.tanh(_conv(h, params["gen_conv2"], 3))[0, :, 0]
    wav = wav * jnp.repeat(frame_valid, HOP)
    return wav.astype(jnp.float32), n_frames


def trim_and_fade(wav: np.ndarray, sr: int = SAMPLE_RATE, window_s: float = 0.02,
                  threshold: float = 5e-3, fade_s: float = 0.05) -> np.ndarray:
    """RMS-windowed trailing-silence/artifact trim + linear fade-out
    (reference: KokoroTTS.swift postprocessing)."""
    if len(wav) == 0:
        return wav
    win = max(1, int(window_s * sr))
    n_win = len(wav) // win
    if n_win == 0:
        return wav
    rms = np.sqrt(np.mean(wav[: n_win * win].reshape(n_win, win) ** 2, axis=1))
    last = n_win
    while last > 1 and rms[last - 1] < threshold:
        last -= 1
    end = min(len(wav), last * win)
    out = wav[:end].copy()
    fade = min(len(out), int(fade_s * sr))
    if fade > 0:
        out[-fade:] *= np.linspace(1.0, 0.0, fade, dtype=np.float32)
    return out


class KokoroTTS(SpeechGenerationModel):
    def __init__(self, cfg: KokoroConfig, params, voices: Optional[Dict[str, np.ndarray]] = None,
                 dtype=jnp.float32):
        self.cfg = cfg
        self.params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
        # voice packs: name → [MAX_PHONEMES, style_dim] (style row picked by
        # phoneme count — the published voices' convention)
        self.voices = voices or {"af_default": np.zeros((MAX_PHONEMES, cfg.style_dim), np.float32)}
        self._loaded = True
        self._jit = jax.jit(functools.partial(kokoro_forward, cfg=cfg))

    @classmethod
    def init_random(cls, cfg: Optional[KokoroConfig] = None, seed: int = 0, **kw) -> "KokoroTTS":
        cfg = cfg or config_tiny()
        rng = np.random.default_rng(seed)
        voices = {
            "af_default": (0.1 * rng.standard_normal((MAX_PHONEMES, cfg.style_dim))).astype(np.float32),
            "am_default": (0.1 * rng.standard_normal((MAX_PHONEMES, cfg.style_dim))).astype(np.float32),
        }
        return cls(cfg, init_kokoro_params(jax.random.PRNGKey(seed), cfg), voices, **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "hexgrad/Kokoro-82M", cache_dir=None,
                        offline_mode: bool = False, **kw) -> "KokoroTTS":
        from ...core.hub import download_weights
        from ...core.weights import load_safetensors, unflatten

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode,
                                     patterns=("*.safetensors", "*.json", "*.npy", "voices/*"))
        flat = load_safetensors(model_dir)
        voices = {}
        from pathlib import Path

        for npy in Path(model_dir).glob("voices/*.npy"):
            voices[npy.stem] = np.load(npy).reshape(-1, STYLE_DIM)[:MAX_PHONEMES]
        return cls(CONFIG_82M, unflatten(flat), voices or None, **kw)

    @property
    def available_voices(self):
        return sorted(self.voices)

    def synthesize(self, text: str, voice: Optional[str] = None, language: str = "en",
                   speed: float = 1.0, **kwargs) -> AudioChunk:
        phonemes = phonemize(text, language)
        ids = phonemes_to_ids(phonemes)[:MAX_PHONEMES]
        n = len(ids)
        if n == 0:
            return AudioChunk(np.zeros(0, np.float32), self.cfg.sample_rate)
        arr = np.zeros(MAX_PHONEMES, np.int32)
        arr[:n] = ids
        pack = self.voices.get(voice or "", next(iter(self.voices.values())))
        style = pack[min(n, len(pack) - 1)]
        wav, n_frames = self._jit(self.params, ids=jnp.asarray(arr),
                                  n_valid=jnp.asarray(n, jnp.int32),
                                  style=jnp.asarray(style, jnp.float32))
        wav = np.asarray(wav)[: int(n_frames) * HOP]
        if speed != 1.0 and len(wav):
            from ...audio.resample import resample

            wav = resample(wav, int(self.cfg.sample_rate * speed), self.cfg.sample_rate)
        return AudioChunk(trim_and_fade(wav, self.cfg.sample_rate), self.cfg.sample_rate)

    def warm_up(self) -> None:
        self.synthesize("hi")

    def unload(self) -> None:
        self.params = None
        self._loaded = False

    @property
    def is_loaded(self) -> bool:
        return self._loaded

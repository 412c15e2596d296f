"""Silero VAD v5 (~309K params), TPU-first.

Functional re-design of the reference implementation
(reference: Sources/SpeechVAD/SileroModel.swift:30-149, SileroVAD.swift):
512-sample chunks + 64 carried context samples → right reflect-pad 64 →
256-point DFT (stored as conv weights in the checkpoint) → magnitude →
4× Conv1d+ReLU encoder → 1-layer LSTM(128) with explicit h/c state →
ReLU → 1×1 conv → sigmoid probability.

TPU-shaped differences:
- batch mode runs the WHOLE clip in one jitted ``lax.scan`` over chunks
  (the carried context + LSTM state is the scan carry) — one program, no
  per-chunk host loop (the reference calls the network per chunk);
- the strided STFT conv becomes a frame-gather + matmul (2 frames of 256
  with hop 128 → [4, 256] @ basisᵀ), which is both MXU-shaped and avoids
  XLA CPU's pathological strided-conv path;
- streaming mode exposes the carry explicitly (StreamingVADProvider).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import SpeechSegment, StreamingVADProvider, VoiceActivityDetectionModel
from ...ops.nn import conv1d

SAMPLE_RATE = 16000
CHUNK = 512
CONTEXT = 64
STFT_LEN = 256
STFT_HOP = 128
N_BINS = 129


@dataclasses.dataclass(frozen=True)
class VADConfig:
    """Hysteresis thresholds (reference: SpeechVAD/Configuration.swift:84-91
    sileroDefault)."""

    onset: float = 0.5
    offset: float = 0.35
    min_speech_duration: float = 0.25
    min_silence_duration: float = 0.1

    @property
    def chunk_duration(self) -> float:
        return CHUNK / SAMPLE_RATE  # 32 ms


def dft_basis() -> np.ndarray:
    """[258, 256] windowed DFT basis (cos rows then -sin rows) used when no
    checkpoint provides ``stft.weight``. Magnitude is sign-invariant."""
    n = np.arange(STFT_LEN)
    k = np.arange(N_BINS)
    phase = 2.0 * np.pi * np.outer(k, n) / STFT_LEN
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / STFT_LEN))
    return np.concatenate([np.cos(phase) * window, -np.sin(phase) * window]).astype(np.float32)


def init_params(key=None) -> dict:
    """Random-init params with the exact Silero v5 topology."""
    key = key if key is not None else jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    def conv(k, width, cin, cout):
        scale = 1.0 / np.sqrt(width * cin)
        return {
            "kernel": (jax.random.normal(k, (width, cin, cout)) * scale).astype(jnp.float32),
            "bias": jnp.zeros((cout,), jnp.float32),
        }

    return {
        "stft_basis": jnp.asarray(dft_basis()),  # [258, 256]
        "encoder": [
            conv(ks[0], 3, N_BINS, 128),
            conv(ks[1], 3, 128, 64),
            conv(ks[2], 3, 64, 64),
            conv(ks[3], 3, 64, 128),
        ],
        "lstm": {
            "wx": (jax.random.normal(ks[4], (128, 512)) * 0.06).astype(jnp.float32),
            "wh": (jax.random.normal(ks[5], (128, 512)) * 0.06).astype(jnp.float32),
            "bias": jnp.zeros((512,), jnp.float32),
        },
        "decoder": conv(ks[6], 1, 128, 1),
    }


def convert_checkpoint(flat: dict) -> dict:
    """Map the published MLX-converted checkpoint (keys: stft.weight
    [258,256,1], encoder.{0-3}.weight/bias, lstm.Wx/Wh/bias,
    decoder.weight/bias — reference SileroModel.swift:27-35) into our tree."""
    def conv_from(prefix, strides=None):
        w = flat[f"{prefix}.weight"]  # MLX conv1d layout [out, width, in]
        return {
            "kernel": np.transpose(w, (1, 2, 0)).astype(np.float32),  # [width, in, out]
            "bias": flat[f"{prefix}.bias"].astype(np.float32),
        }

    stft = flat["stft.weight"]
    if stft.ndim == 3:
        stft = stft[:, :, 0] if stft.shape[1] == STFT_LEN else stft[:, 0, :]
    return {
        "stft_basis": stft.astype(np.float32),  # [258, 256]
        "encoder": [conv_from(f"encoder.{i}") for i in range(4)],
        "lstm": {
            "wx": np.ascontiguousarray(flat["lstm.Wx"].T).astype(np.float32)
            if flat["lstm.Wx"].shape[0] == 512 else flat["lstm.Wx"].astype(np.float32),
            "wh": np.ascontiguousarray(flat["lstm.Wh"].T).astype(np.float32)
            if flat["lstm.Wh"].shape[0] == 512 else flat["lstm.Wh"].astype(np.float32),
            "bias": flat["lstm.bias"].astype(np.float32),
        },
        "decoder": conv_from("decoder"),
    }


def convert_torchscript(path) -> dict:
    """Load the ORIGINAL Silero v5 TorchScript archive (silero_vad.jit —
    the upstream distribution format, reference: SileroVAD.swift loads the
    MLX re-export of the same tensors) and map its state dict into our
    tree. Key layout (v5, 16 kHz branch):

    - ``_model.stft.forward_basis_buffer`` [258, 1, 256] — windowed DFT
      basis (cos ‖ -sin rows)
    - ``_model.encoder.{0-3}.reparam_conv.weight`` [out, in, 3] + bias
    - ``_model.decoder.rnn.weight_ih/weight_hh`` [512, 128] +
      ``bias_ih/bias_hh`` [512] (torch gate order i,f,g,o — ours matches;
      the two biases sum)
    - ``_model.decoder.decoder.2.weight`` [1, 128, 1] + bias

    torch.jit.load parses the archive, so a cached checkpoint converts
    fully offline."""
    import torch

    sd = {k: v.detach().cpu().numpy()
          for k, v in torch.jit.load(str(path), map_location="cpu").state_dict().items()}

    def conv_from(prefix):
        w = sd[f"{prefix}.weight"]              # torch conv1d [out, in, width]
        return {
            "kernel": np.transpose(w, (2, 1, 0)).astype(np.float32),
            "bias": sd[f"{prefix}.bias"].astype(np.float32),
        }

    stft = sd["_model.stft.forward_basis_buffer"]
    if stft.ndim == 3:
        stft = stft[:, 0, :]
    dec = sd["_model.decoder.decoder.2.weight"]  # [1, 128, 1]
    return {
        "stft_basis": stft.astype(np.float32),   # [258, 256]
        "encoder": [conv_from(f"_model.encoder.{i}.reparam_conv")
                    for i in range(4)],
        "lstm": {
            "wx": np.ascontiguousarray(sd["_model.decoder.rnn.weight_ih"].T).astype(np.float32),
            "wh": np.ascontiguousarray(sd["_model.decoder.rnn.weight_hh"].T).astype(np.float32),
            "bias": (sd["_model.decoder.rnn.bias_ih"]
                     + sd["_model.decoder.rnn.bias_hh"]).astype(np.float32),
        },
        "decoder": {
            "kernel": np.transpose(dec, (2, 1, 0)).astype(np.float32),  # [1, 128, 1]
            "bias": sd["_model.decoder.decoder.2.bias"].astype(np.float32),
        },
    }


def forward_chunk(params, samples, h, c):
    """One VAD step.

    samples: [B, 576] (64 context + 512 new); h, c: [B, 128].
    Returns (prob [B], h', c').
    """
    # right reflect-pad 64: [a..z] → [a..z, y, x, ...]
    t = samples.shape[-1]
    pad_idx = t - 2 - np.arange(CONTEXT)
    x = jnp.concatenate([samples, samples[:, pad_idx]], axis=-1)  # [B, 640]

    # STFT as frame-gather + matmul: frames [B, 4, 256]
    n_frames = (x.shape[-1] - STFT_LEN) // STFT_HOP + 1
    idx = np.arange(n_frames)[:, None] * STFT_HOP + np.arange(STFT_LEN)[None, :]
    frames = x[:, idx]  # [B, 4, 256]
    spec = jnp.einsum("bfs,ks->bfk", frames, params["stft_basis"],
                      preferred_element_type=jnp.float32)  # [B, 4, 258]
    real, imag = spec[..., :N_BINS], spec[..., N_BINS:]
    mag = jnp.sqrt(real * real + imag * imag + 1e-12)  # [B, 4, 129]

    y = mag
    strides = (1, 2, 2, 1)
    for conv_p, s in zip(params["encoder"], strides):
        y = jax.nn.relu(conv1d(y, conv_p, stride=s, padding=1))
    # y: [B, 1, 128] — single timestep into the LSTM
    xt = y[:, 0, :]

    gates = xt @ params["lstm"]["wx"] + h @ params["lstm"]["wh"] + params["lstm"]["bias"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)

    d = params["decoder"]
    logit = jax.nn.relu(h_new) @ d["kernel"][0] + d["bias"]
    prob = jax.nn.sigmoid(logit)[:, 0]
    return prob, h_new, c_new


@functools.partial(jax.jit, static_argnames=())
def scan_probs(params, chunks):
    """All chunk probabilities in one program.

    chunks: [N, 512] → probs [N]. Carry = (context [64], h, c).
    """
    def step(carry, chunk):
        ctx, h, c = carry
        samples = jnp.concatenate([ctx, chunk])[None]  # [1, 576]
        prob, h, c = forward_chunk(params, samples, h, c)
        return (chunk[-CONTEXT:], h, c), prob[0]

    init = (jnp.zeros((CONTEXT,), jnp.float32),
            jnp.zeros((1, 128), jnp.float32),
            jnp.zeros((1, 128), jnp.float32))
    _, probs = jax.lax.scan(step, init, chunks)
    return probs


def binarize(probs: np.ndarray, cfg: VADConfig) -> List[SpeechSegment]:
    """Hysteresis thresholding + duration filtering
    (reference: VADPipeline.binarize/filterDurations)."""
    dt = cfg.chunk_duration
    segments: List[SpeechSegment] = []
    in_speech = False
    start = 0.0
    for i, p in enumerate(probs):
        t = i * dt
        if not in_speech and p >= cfg.onset:
            in_speech = True
            start = t
        elif in_speech and p < cfg.offset:
            in_speech = False
            segments.append(SpeechSegment(start, t))
    if in_speech:
        segments.append(SpeechSegment(start, len(probs) * dt))

    # merge close segments, then drop short ones
    merged: List[SpeechSegment] = []
    for seg in segments:
        if merged and seg.start - merged[-1].end < cfg.min_silence_duration:
            merged[-1] = SpeechSegment(merged[-1].start, seg.end)
        else:
            merged.append(seg)
    return [s for s in merged if s.duration >= cfg.min_speech_duration]


class SileroVAD(VoiceActivityDetectionModel, StreamingVADProvider):
    """Host-facing Silero VAD."""

    def __init__(self, params):
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self._loaded = True
        self._forward = jax.jit(forward_chunk)

    @classmethod
    def init_random(cls, seed: int = 0) -> "SileroVAD":
        return cls(init_params(jax.random.PRNGKey(seed)))

    @classmethod
    def from_pretrained(cls, model_id: str = "silero-vad-v5", cache_dir=None,
                        offline_mode: bool = False, progress_handler=None, **kw) -> "SileroVAD":
        """Accepts either a snapshot with the MLX-converted safetensors or
        the upstream TorchScript archive itself (a ``*.jit`` file path or a
        snapshot containing one) — the original distribution format."""
        from pathlib import Path

        if str(model_id).endswith(".jit") and Path(model_id).exists():
            return cls(convert_torchscript(model_id))
        from ...core.hub import download_weights
        from ...core.weights import load_safetensors

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode)
        jits = sorted(Path(model_dir).glob("*.jit"))
        if jits and not any(Path(model_dir).glob("*.safetensors")):
            return cls(convert_torchscript(jits[0]))
        flat = load_safetensors(model_dir)
        return cls(convert_checkpoint(flat))

    # -- batch ---------------------------------------------------------------

    def speech_probabilities(self, audio: np.ndarray, sample_rate: int = 16000) -> np.ndarray:
        if sample_rate != SAMPLE_RATE:
            from ...audio.resample import resample

            audio = resample(audio.astype(np.float32), sample_rate, SAMPLE_RATE)
        n = len(audio)
        n_chunks = max(1, (n + CHUNK - 1) // CHUNK)
        padded = np.zeros(n_chunks * CHUNK, np.float32)
        padded[:n] = audio
        chunks = jnp.asarray(padded.reshape(n_chunks, CHUNK))
        return np.asarray(scan_probs(self.params, chunks))

    def detect_speech(self, audio: np.ndarray, sample_rate: int = 16000,
                      config: Optional[VADConfig] = None, **kwargs) -> Sequence[SpeechSegment]:
        probs = self.speech_probabilities(audio, sample_rate)
        return binarize(probs, config or VADConfig())

    # -- streaming -----------------------------------------------------------

    @property
    def chunk_size(self) -> int:
        return CHUNK

    def new_stream(self):
        return (
            np.zeros(CONTEXT, np.float32),
            jnp.zeros((1, 128), jnp.float32),
            jnp.zeros((1, 128), jnp.float32),
        )

    def process_chunk(self, state, samples: np.ndarray) -> Tuple[object, float]:
        ctx, h, c = state
        if len(samples) < CHUNK:
            samples = np.pad(samples, (0, CHUNK - len(samples)))
        full = np.concatenate([ctx, samples[:CHUNK]]).astype(np.float32)
        prob, h, c = self._forward(self.params, jnp.asarray(full)[None], h, c)
        return (samples[CHUNK - CONTEXT : CHUNK], h, c), float(prob[0])

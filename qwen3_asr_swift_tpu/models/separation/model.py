"""Music source separation: Open-Unmix (UMX) + Wiener post-filter.

TPU-native analog of the reference's separation module
(reference: Sources/SourceSeparation/SourceSeparation.swift:15-179,
OpenUnmixModel.swift, STFT.swift, WienerFilter(MLX).swift):
44.1 kHz stereo → STFT (4096/1024, centered Hann) → per-stem spectrogram
model (input scale/mean → fc1+BN+tanh → 3-layer BiLSTM(+skip) →
fc2+BN+ReLU → fc3+BN → output scale → ReLU mask) → magnitude estimates →
expectation-maximization-free Wiener soft mask across stems → iSTFT.

TPU shape: STFT/iSTFT are framed matmuls (MXU); the BiLSTM runs as two
``lax.scan``s; all four stems batch through one compiled program.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...core import SourceSeparationModel

STEMS = ("vocals", "drums", "bass", "other")
N_FFT = 4096
HOP = 1024
SR = 44100


# -- STFT as matmul ----------------------------------------------------------

@functools.lru_cache(maxsize=2)
def _dft(n_fft=N_FFT):
    n = np.arange(n_fft)
    window = np.hanning(n_fft + 1)[:-1]
    k = np.arange(n_fft // 2 + 1)
    phase = 2 * np.pi * np.outer(n, k) / n_fft
    return (
        (window[:, None] * np.cos(phase)).astype(np.float32),
        (window[:, None] * -np.sin(phase)).astype(np.float32),
        window.astype(np.float32),
    )


def stft(x, n_frames: int):
    """x: [C, T] → (re, im): [C, F, bins]."""
    cos_m, sin_m, _ = _dft()
    pad = N_FFT // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    idx = np.arange(n_frames)[:, None] * HOP + np.arange(N_FFT)[None, :]
    frames = xp[:, idx]  # [C, F, n_fft]
    return frames @ jnp.asarray(cos_m), frames @ jnp.asarray(sin_m)


def istft(re, im, out_len: int):
    """(re, im): [C, F, bins] → [C, out_len] via overlap-add (inverse DFT
    as matmul + synthesis window)."""
    _, _, window = _dft()
    bins = re.shape[-1]
    # inverse real DFT (bases WITHOUT the analysis window): recovers the
    # windowed frame w[n]·x[n]; overlap-add with synthesis window w and
    # Σw² normalization then reconstructs x.
    n = np.arange(N_FFT)
    k = np.arange(bins)
    phase = 2 * np.pi * np.outer(k, n) / N_FFT
    scale = np.ones(bins, np.float32) * 2.0
    scale[0] = 1.0
    scale[-1] = 1.0
    icos = (np.cos(phase) / N_FFT).astype(np.float32)  # [bins, n_fft]
    isin = (np.sin(phase) / N_FFT).astype(np.float32)
    frames = (re * scale) @ jnp.asarray(icos) - (im * scale) @ jnp.asarray(isin)
    c, f, _ = frames.shape
    t_total = (f - 1) * HOP + N_FFT
    out = jnp.zeros((c, t_total))
    norm = jnp.zeros((t_total,))
    win = jnp.asarray(window)
    idx = np.arange(f)[:, None] * HOP + np.arange(N_FFT)[None, :]
    out = out.at[:, idx.reshape(-1)].add((frames * win).reshape(c, -1))
    norm = norm.at[idx.reshape(-1)].add(jnp.tile(win * win, (f,)))
    out = out / jnp.maximum(norm, 1e-8)[None]
    pad = N_FFT // 2
    return out[:, pad : pad + out_len]


# -- UMX stem model ----------------------------------------------------------

def init_umx_params(key, nb_bins: int = 1487, hidden: int = 512, channels: int = 2,
                    max_bins: Optional[int] = None, dtype=jnp.float32) -> dict:
    """One stem's network. nb_bins = cropped frequency bins (UMX-HQ: 1487
    of 2049 ≈ 16 kHz bandwidth)."""
    ks = jax.random.split(key, 12)
    lstm_hidden = hidden // 2
    in_dim = nb_bins * channels

    def lin(k, i, o):
        return {"kernel": (jax.random.normal(k, (i, o)) / np.sqrt(i)).astype(dtype)}

    def lstm(k, i, h):
        k1, k2 = jax.random.split(k)
        return {
            "wx": (jax.random.normal(k1, (i, 4 * h)) / np.sqrt(i)).astype(dtype),
            "wh": (jax.random.normal(k2, (h, 4 * h)) / np.sqrt(h)).astype(dtype),
            "bias": jnp.zeros((4 * h,), dtype),
        }

    params = {
        "input_mean": jnp.zeros((nb_bins,), dtype),
        "input_scale": jnp.ones((nb_bins,), dtype),
        "fc1": lin(ks[0], in_dim, hidden),
        "bn1": {"scale": jnp.ones((hidden,), dtype), "bias": jnp.zeros((hidden,), dtype)},
        "lstm_fwd": [lstm(ks[1 + i], hidden if i == 0 else hidden, lstm_hidden) for i in range(3)],
        "lstm_bwd": [lstm(ks[4 + i], hidden if i == 0 else hidden, lstm_hidden) for i in range(3)],
        "fc2": lin(ks[7], hidden * 2, hidden),
        "bn2": {"scale": jnp.ones((hidden,), dtype), "bias": jnp.zeros((hidden,), dtype)},
        "fc3": lin(ks[8], hidden, 2049 * channels),
        "bn3": {"scale": jnp.ones((2049 * channels,), dtype), "bias": jnp.zeros((2049 * channels,), dtype)},
        "output_scale": jnp.ones((2049,), dtype),
        "output_mean": jnp.zeros((2049,), dtype),
    }
    return params


def _lstm_scan(p, xs, reverse=False):
    h0 = jnp.zeros((xs.shape[1], p["wh"].shape[0]), xs.dtype)

    def step(carry, x):
        h, c = carry
        gates = x @ p["wx"] + h @ p["wh"] + p["bias"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    _, ys = jax.lax.scan(step, (h0, h0), xs, reverse=reverse)
    return ys


def umx_forward(params, mag, nb_bins: int = 1487):
    """mag: [F, bins, C] magnitude spectrogram → mask-applied magnitude
    estimate [F, 2049, C] (UMX applies ReLU mask output directly)."""
    f, bins, c = mag.shape
    x = mag[:, :nb_bins, :]
    # upstream convention: the checkpoint stores the NEGATED mean and the
    # reciprocal std, applied as (x + input_mean) * input_scale
    x = (x + params["input_mean"][None, :, None]) * params["input_scale"][None, :, None]
    x = x.transpose(0, 2, 1).reshape(f, c * nb_bins)
    h = jnp.tanh((x @ params["fc1"]["kernel"]) * params["bn1"]["scale"] + params["bn1"]["bias"])

    # 3-layer bidirectional LSTM: each layer consumes the concat of the
    # previous layer's two directions (torch BiLSTM semantics).
    seq = h[:, None, :]  # [F, 1, hidden]
    for lf, lb in zip(params["lstm_fwd"], params["lstm_bwd"]):
        fwd = _lstm_scan(lf, seq)
        bwd = _lstm_scan(lb, seq, reverse=True)
        seq = jnp.concatenate([fwd, bwd], axis=-1)
    lstm_out = seq[:, 0, :]  # [F, hidden] (2×256)
    # UMX skip connection: concat(input, lstm_out) → fc2
    h = jnp.concatenate([h, lstm_out], axis=-1)[:, : params["fc2"]["kernel"].shape[0]]
    if h.shape[-1] < params["fc2"]["kernel"].shape[0]:
        h = jnp.pad(h, ((0, 0), (0, params["fc2"]["kernel"].shape[0] - h.shape[-1])))

    h = jax.nn.relu((h @ params["fc2"]["kernel"]) * params["bn2"]["scale"] + params["bn2"]["bias"])
    h = (h @ params["fc3"]["kernel"]) * params["bn3"]["scale"] + params["bn3"]["bias"]
    full_bins = params["output_scale"].shape[0]
    h = h.reshape(f, c, full_bins).transpose(0, 2, 1)
    h = h * params["output_scale"][None, :, None] + params["output_mean"][None, :, None]
    return jax.nn.relu(h) * mag


def wiener_masks(estimates, eps=1e-10):
    """Single-iteration Wiener soft mask: power-ratio of stem estimates
    (reference: WienerFilter). estimates: [S, F, bins, C]."""
    power = estimates ** 2
    total = power.sum(axis=0) + eps
    return power / total[None]


class SourceSeparator(SourceSeparationModel):
    def __init__(self, stem_params: Dict[str, dict], dtype=jnp.float32):
        self.stem_params = {
            k: jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), v)
            for k, v in stem_params.items()
        }
        self._loaded = True

        @functools.partial(jax.jit, static_argnames=("n_frames", "out_len"))
        def _separate(params_list, audio, *, n_frames, out_len):
            re, im = stft(audio, n_frames)  # [C, F, bins]
            mag = jnp.sqrt(re ** 2 + im ** 2).transpose(1, 2, 0)  # [F, bins, C]
            ests = jnp.stack([umx_forward(p, mag) for p in params_list])  # [S, F, bins, C]
            masks = wiener_masks(ests)
            outs = []
            for s in range(ests.shape[0]):
                m = masks[s].transpose(2, 0, 1)  # [C, F, bins]
                outs.append(istft(re * m, im * m, out_len))
            return jnp.stack(outs)  # [S, C, T]

        self._separate_jit = _separate

    @classmethod
    def init_random(cls, seed: int = 0, stems: Sequence[str] = STEMS, **kw) -> "SourceSeparator":
        keys = jax.random.split(jax.random.PRNGKey(seed), len(stems))
        return cls({s: init_umx_params(k) for s, k in zip(stems, keys)}, **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "open-unmix/umxhq", cache_dir=None,
                        offline_mode: bool = False, **kw) -> "SourceSeparator":
        from ...core.hub import download_weights
        from .convert import load_umx_checkpoint

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode,
                                     patterns=("*.pth", "*.safetensors", "*.json"))
        return cls(load_umx_checkpoint(model_dir), **kw)

    def separate(self, audio: np.ndarray, sample_rate: int,
                 stems: Optional[Sequence[str]] = None) -> dict:
        """audio: [T] mono or [C, T] stereo. Returns {stem: [C, T]}."""
        if audio.ndim == 1:
            audio = np.stack([audio, audio])
        if sample_rate != SR:
            from ...audio.resample import resample

            audio = np.stack([resample(ch.astype(np.float32), sample_rate, SR) for ch in audio])
        want = list(stems or self.stem_params.keys())
        t = audio.shape[1]
        n_frames = t // HOP + 1
        params_list = tuple(self.stem_params[s] for s in want)
        outs = self._separate_jit(params_list, jnp.asarray(audio, jnp.float32),
                                  n_frames=n_frames, out_len=t)
        return {s: np.asarray(outs[i]) for i, s in enumerate(want)}

    def warm_up(self) -> None:
        self.separate(np.zeros((2, SR), np.float32), SR)

    def unload(self) -> None:
        self.stem_params = None
        self._loaded = False

    @property
    def is_loaded(self) -> bool:
        return self._loaded


def signal_to_distortion_ratio(estimate: np.ndarray, target: np.ndarray, eps=1e-10) -> float:
    """Simple SDR in dB (reference: SourceSeparationMetrics.swift)."""
    num = float(np.sum(target ** 2))
    den = float(np.sum((target - estimate) ** 2))
    return 10.0 * np.log10((num + eps) / (den + eps))

"""Speaker embedding: WeSpeaker ResNet34 with statistics pooling.

TPU-native analog of the reference's WeSpeaker module
(reference: Sources/SpeechVAD/WeSpeaker.swift:36-178, WeSpeakerModel.swift):
80-mel Kaldi fbank (mean-normalized over time) → ResNet34 (2D convs over
[time, mel], channels 32/64/128/256) → temporal statistics pooling
(mean ‖ std per channel×mel) → linear → 256-d embedding.

One jitted program per fbank-length bucket; embeddings L2-normalize for
cosine scoring (reference: SpeakerEmbeddingModel.cosineSimilarity).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...core import SpeakerEmbeddingModel
from ...ops.fbank import kaldi_fbank
from ...ops.nn import conv2d


def _conv_init(key, kh, kw, cin, cout, dtype=jnp.float32):
    scale = 1.0 / np.sqrt(kh * kw * cin)
    return {"kernel": (jax.random.normal(key, (kh, kw, cin, cout)) * scale).astype(dtype)}


def _bn_init(c, dtype=jnp.float32):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def init_wespeaker_params(key, embed_dim: int = 256, channels=(32, 64, 128, 256),
                          blocks=(3, 4, 6, 3), n_mels: int = 80, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 64)
    ki = iter(range(64))
    params = {
        "stem": {"conv": _conv_init(ks[next(ki)], 3, 3, 1, channels[0], dtype), "bn": _bn_init(channels[0], dtype)},
        "stages": [],
    }
    cin = channels[0]
    for si, (c, nb) in enumerate(zip(channels, blocks)):
        stage = []
        for bi in range(nb):
            stride = 2 if (bi == 0 and si > 0) else 1
            blk = {
                "conv1": _conv_init(ks[next(ki) % 64], 3, 3, cin, c, dtype),
                "bn1": _bn_init(c, dtype),
                "conv2": _conv_init(ks[next(ki) % 64], 3, 3, c, c, dtype),
                "bn2": _bn_init(c, dtype),
            }
            if stride != 1 or cin != c:
                blk["down"] = _conv_init(ks[next(ki) % 64], 1, 1, cin, c, dtype)
                blk["down_bn"] = _bn_init(c, dtype)
            stage.append(blk)
            cin = c
        params["stages"].append(stage)
    mel_out = n_mels // 8  # three stride-2 stages
    pool_dim = channels[-1] * mel_out * 2  # mean ‖ std
    k = ks[next(ki) % 64]
    params["embed"] = {
        "kernel": (jax.random.normal(k, (pool_dim, embed_dim)) / np.sqrt(pool_dim)).astype(dtype),
        "bias": jnp.zeros((embed_dim,), dtype),
    }
    return params


def _bn(x, p):
    return x * p["scale"] + p["bias"]


def _basic_block(x, p, stride):
    h = jax.nn.relu(_bn(conv2d(x, p["conv1"], stride=(stride, stride)), p["bn1"]))
    h = _bn(conv2d(h, p["conv2"], stride=(1, 1)), p["bn2"])
    if "down" in p:
        x = _bn(conv2d(x, p["down"], stride=(stride, stride), padding=((0, 0), (0, 0))), p["down_bn"])
    return jax.nn.relu(x + h)


def wespeaker_forward(params, fbank, n_valid_frames):
    """fbank: [T, n_mels] (padded); n_valid_frames scalar.
    Returns embedding [embed_dim]."""
    t, n_mels = fbank.shape
    valid = jnp.arange(t) < n_valid_frames
    # cepstral mean normalization over valid frames
    cnt = jnp.maximum(n_valid_frames, 1).astype(jnp.float32)
    mean = jnp.sum(jnp.where(valid[:, None], fbank, 0.0), axis=0, keepdims=True) / cnt
    x = jnp.where(valid[:, None], fbank - mean, 0.0)

    h = x[None, :, :, None]  # [1, T, mel, 1]
    h = jax.nn.relu(_bn(conv2d(h, params["stem"]["conv"], stride=(1, 1)), params["stem"]["bn"]))
    for si, stage in enumerate(params["stages"]):
        for bi, blk in enumerate(stage):
            h = _basic_block(h, blk, stride=2 if (bi == 0 and si > 0) else 1)
    # h: [1, T', mel', C] — stats pooling over valid time. The valid
    # output length follows the convs' own length transform (k=3 s=2 p=1
    # → (n-1)//2 + 1, three stride-2 stages) — a t//t_out quotient
    # over-counts for short audio in long padding buckets, letting
    # pad-derived frames into the mean/std
    t_out = h.shape[1]
    nv = n_valid_frames
    for _ in range(3):
        nv = (nv - 1) // 2 + 1
    valid_out = jnp.arange(t_out) < jnp.maximum(nv, 1)
    m = valid_out[None, :, None, None]
    cnt = jnp.maximum(valid_out.sum(), 1).astype(jnp.float32)
    mu = jnp.sum(jnp.where(m, h, 0.0), axis=1) / cnt  # [1, mel', C]
    var = jnp.sum(jnp.where(m, (h - mu[:, None]) ** 2, 0.0), axis=1) / cnt
    sd = jnp.sqrt(var + 1e-7)
    pooled = jnp.concatenate([mu.reshape(1, -1), sd.reshape(1, -1)], axis=-1)
    emb = pooled @ params["embed"]["kernel"] + params["embed"]["bias"]
    return emb[0]


class WeSpeaker(SpeakerEmbeddingModel):
    FBANK_BUCKETS_S = (2, 5, 10, 20, 30)

    def __init__(self, params, dtype=jnp.float32):
        self.params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
        self._loaded = True

        @functools.partial(jax.jit, static_argnames=("n_frames",))
        def _embed(p, audio, n_valid_samples, *, n_frames):
            fb = kaldi_fbank(audio * 32768.0)
            pad = n_frames - fb.shape[0]
            fb = jnp.pad(fb, ((0, max(pad, 0)), (0, 0)))[:n_frames]
            n_valid = jnp.maximum(1 + (n_valid_samples - 400) // 160, 1)
            return wespeaker_forward(p, fb, n_valid)

        self._embed_jit = _embed
        # batched variant: N clips share one bucket → ONE dispatch for a
        # whole diarization window sweep (per-dispatch round-trips, not
        # compute, dominate this model — same lesson as FireRedVAD)
        self._embed_batch_jit = jax.jit(
            jax.vmap(lambda p, a, n, nf: _embed(p, a, n, n_frames=nf),
                     in_axes=(None, 0, 0, None)),
            static_argnums=(3,))

    @classmethod
    def init_random(cls, seed: int = 0, **kw) -> "WeSpeaker":
        return cls(init_wespeaker_params(jax.random.PRNGKey(seed)), **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "wespeaker-resnet34", cache_dir=None,
                        offline_mode: bool = False, progress_handler=None, **kw) -> "WeSpeaker":
        from ...core.hub import download_weights
        from ...core.weights import load_safetensors
        from .convert import convert_wespeaker

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode)
        return cls(convert_wespeaker(load_safetensors(model_dir)), **kw)

    def embed(self, audio: np.ndarray, sample_rate: int = 16000) -> np.ndarray:
        if sample_rate != 16000:
            from ...audio.resample import resample

            audio = resample(audio.astype(np.float32), sample_rate, 16000)
        n = len(audio)
        bucket = next((s * 16000 for s in self.FBANK_BUCKETS_S if n <= s * 16000),
                      self.FBANK_BUCKETS_S[-1] * 16000)
        padded = np.zeros(bucket, np.float32)
        padded[: min(n, bucket)] = audio[:bucket]
        n_frames = 1 + (bucket - 400) // 160
        emb = self._embed_jit(self.params, jnp.asarray(padded),
                              jnp.asarray(min(n, bucket), jnp.int32), n_frames=n_frames)
        emb = np.asarray(emb)
        return emb / (np.linalg.norm(emb) + 1e-12)

    def embed_batch(self, audios, sample_rate: int = 16000) -> np.ndarray:
        """Embed N clips in ONE batched program (all clips share the
        largest needed bucket). Row-for-row equal to embed(); returns
        [N, embed_dim] L2-normalized."""
        if not len(audios):
            return np.zeros((0, int(self.params["embed"]["kernel"].shape[1])),
                            np.float32)
        from ...audio.resample import resample

        clips = []
        for a in audios:
            a = np.asarray(a, np.float32)
            if sample_rate != 16000:
                a = resample(a, sample_rate, 16000)
            clips.append(a)
        longest = max(len(a) for a in clips)
        bucket = next((s * 16000 for s in self.FBANK_BUCKETS_S
                       if longest <= s * 16000), self.FBANK_BUCKETS_S[-1] * 16000)
        stage = np.zeros((len(clips), bucket), np.float32)
        n_valid = np.zeros(len(clips), np.int32)
        for i, a in enumerate(clips):
            n = min(len(a), bucket)
            stage[i, :n] = a[:n]
            n_valid[i] = n
        n_frames = 1 + (bucket - 400) // 160
        embs = np.asarray(self._embed_batch_jit(
            self.params, jnp.asarray(stage), jnp.asarray(n_valid), n_frames))
        return embs / (np.linalg.norm(embs, axis=1, keepdims=True) + 1e-12)

    def warm_up(self) -> None:
        self.embed(np.zeros(16000, np.float32))

    def unload(self) -> None:
        self.params = None
        self._loaded = False

    @property
    def is_loaded(self) -> bool:
        return self._loaded

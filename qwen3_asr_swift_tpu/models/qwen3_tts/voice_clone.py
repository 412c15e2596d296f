"""Qwen3-TTS voice cloning: x-vector speaker encoder, speech-tokenizer
encoder (wave → 16 RVQ codes) for in-context cloning, LRU reference cache.

TPU-native analog of the reference's cloning stack (reference:
Sources/Qwen3TTS/SpeakerEncoder.swift — ECAPA-TDNN x-vector;
Qwen3TTS+ICL.swift:16-243 — reference audio is codec-encoded by
``SpeechTokenizerEncoder`` and its frames spliced into the talker
prefill together with the reference transcript;
ReferenceAudioCache.swift — LRU cache of processed references).

The codec encoder mirrors the decoder (codec.py) in reverse: strided
causal convs downsample 1920× to 12.5 Hz, a small transformer refines,
and residual nearest-neighbour quantization against the *decoder's own
codebooks* yields the 16 codes — guaranteeing encode/decode consistency.
"""

from __future__ import annotations

import collections
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.fbank import kaldi_fbank
from ...ops.nn import init_linear, layer_norm, linear
from .config import CodecDecoderConfig
from .codec import _conv_init, causal_conv1d


# ---------------------------------------------------------------------------
# ECAPA-lite speaker encoder (x-vector)
# ---------------------------------------------------------------------------

def init_speaker_encoder(key, num_mels: int = 80, hidden: int = 192,
                         out_dim: int = 192, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8)
    return {
        "in": _conv_init(ks[0], 5, num_mels, hidden, dtype=dtype),
        "block1": _conv_init(ks[1], 3, hidden, hidden, dtype=dtype),
        "block2": _conv_init(ks[2], 3, hidden, hidden, dtype=dtype),
        "attn": init_linear(ks[3], hidden, 1, dtype=dtype),
        "out": init_linear(ks[4], 2 * hidden, out_dim, dtype=dtype),
    }


def speaker_embed(params, audio, sample_rate: int = 16000) -> jnp.ndarray:
    """audio [S] @16 kHz → unit-norm x-vector [out_dim] (reference:
    SpeakerEncoder ECAPA-TDNN with attentive stats pooling)."""
    feats = kaldi_fbank(jnp.asarray(audio, jnp.float32))[None]  # [1, T, 80]
    x = jax.nn.relu(causal_conv1d(feats, params["in"]))
    x = x + jax.nn.relu(causal_conv1d(x, params["block1"], dilation=2))
    x = x + jax.nn.relu(causal_conv1d(x, params["block2"], dilation=3))
    w = jax.nn.softmax(linear(x, params["attn"]).astype(jnp.float32), axis=1)  # [1,T,1]
    mean = jnp.sum(x * w, axis=1)
    var = jnp.sum((x - mean[:, None]) ** 2 * w, axis=1)
    stats = jnp.concatenate([mean, jnp.sqrt(var + 1e-6)], axis=-1)
    emb = linear(stats, params["out"])[0]
    return emb / (jnp.linalg.norm(emb) + 1e-8)


# ---------------------------------------------------------------------------
# speech tokenizer encoder (wave → 16 codes @12.5 Hz)
# ---------------------------------------------------------------------------

def init_codec_encoder(key, cfg: CodecDecoderConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8)
    h = cfg.codebook_dim * 2
    # factor the 1920× downsample into strides (e.g. 8·8·6·5 = 1920)
    strides = _factor_strides(cfg.samples_per_frame)
    convs = []
    cin = 1
    for i, s in enumerate(strides):
        cout = h if i == len(strides) - 1 else max(16, h // 2)
        # stride is encoded in the kernel width (k = 2·stride) so the
        # params tree stays homogeneous for dtype casts
        convs.append(_conv_init(ks[i % 6], 2 * s, cin, cout, dtype=dtype))
        cin = cout
    return {
        "convs": convs,
        "ln": {"weight": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
        "proj": init_linear(ks[6], h, cfg.codebook_dim, dtype=dtype),
    }


def _factor_strides(total: int):
    """Greedy factorization of the per-frame sample count into conv strides."""
    strides = []
    rest = total
    for f in (8, 8, 6, 5, 4, 3, 2):
        while rest % f == 0 and rest > 1 and len(strides) < 5:
            strides.append(f)
            rest //= f
        if rest == 1:
            break
    if rest != 1:
        strides.append(rest)
    return strides


def codec_encode(enc_params, codec_params, cfg: CodecDecoderConfig, wave) -> jnp.ndarray:
    """wave [S] @24 kHz → codes [T, num_quantizers] by residual nearest-
    neighbour quantization against the decoder's RVQ codebooks."""
    s = wave.shape[0]
    frame = cfg.samples_per_frame
    pad = (-s) % frame
    x = jnp.pad(wave, (0, pad))[None, :, None]
    for c in enc_params["convs"]:
        k = int(c["kernel"].shape[0])
        stride = k // 2
        xp = jnp.pad(x, ((0, 0), (k - stride, 0), (0, 0)))
        x = jax.nn.gelu(jax.lax.conv_general_dilated(
            xp, c["kernel"], window_strides=(stride,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32).astype(wave.dtype) + c["bias"])
    z = linear(layer_norm(x, enc_params["ln"]["weight"], enc_params["ln"]["bias"]),
               enc_params["proj"])[0]                      # [T, codebook_dim]

    def nearest(resid, book):
        d = jnp.sum(resid ** 2, -1, keepdims=True) - 2 * resid @ book.T \
            + jnp.sum(book ** 2, -1)[None]
        return jnp.argmin(d, axis=-1)

    sem_book = codec_params["rvq_first"]["codebook"][0].astype(jnp.float32)
    zf = z.astype(jnp.float32)
    codes = [nearest(zf, sem_book)]
    resid = zf - jnp.take(sem_book, codes[0], axis=0)
    rest = codec_params["rvq_rest"]["codebook"].astype(jnp.float32)
    for q in range(cfg.num_quantizers - 1):
        idx = nearest(resid, rest[q])
        codes.append(idx)
        resid = resid - jnp.take(rest[q], idx, axis=0)
    return jnp.stack(codes, axis=-1).astype(jnp.int32)     # [T, 16]


# ---------------------------------------------------------------------------
# reference cache
# ---------------------------------------------------------------------------

class ReferenceAudioCache:
    """LRU cache of processed voice references (reference:
    ReferenceAudioCache.swift)."""

    def __init__(self, max_entries: int = 8):
        self.max_entries = max_entries
        self._store: "collections.OrderedDict[str, Tuple[np.ndarray, str]]" = \
            collections.OrderedDict()

    def put(self, name: str, codes: np.ndarray, text: str) -> None:
        if name in self._store:
            self._store.pop(name)
        self._store[name] = (np.asarray(codes), text)
        while len(self._store) > self.max_entries:
            self._store.popitem(last=False)

    def get(self, name: str) -> Optional[Tuple[np.ndarray, str]]:
        if name not in self._store:
            return None
        self._store.move_to_end(name)
        return self._store[name]

    def __contains__(self, name: str) -> bool:
        return name in self._store

    def __len__(self) -> int:
        return len(self._store)

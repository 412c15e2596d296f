"""Omnilingual ASR: wav2vec2 encoder + CTC head, 1,672 languages.

TPU-native analog of the reference's Omnilingual module
(reference: Sources/OmnilingualASR/OmnilingualASR.swift:25-300,
MLX/OmnilingualMLXModel.swift:19-140, Wav2Vec2Encoder/Frontend,
CTCGreedyDecoder.swift): utterance-level layer-norm of the raw waveform →
wav2vec2 conv feature extractor (7 strided convs, 512 ch, 20 ms frames) →
feature projection → transformer encoder with convolutional relative
position embeddings → CTC head over a 10,288-piece SentencePiece vocab →
greedy CTC collapse. 40 s input cap (reference: OmnilingualASR.swift).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...core import SpeechRecognitionModel, TranscriptionResult
from ...ops.attention import NEG_INF, sdpa
from ...ops.nn import init_linear, layer_norm, linear

MAX_SECONDS = 40.0

# wav2vec2 conv feature extractor: (channels, kernel, stride) ×7 → 320× downsample
CONV_SPEC = ((512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
             (512, 3, 2), (512, 2, 2), (512, 2, 2))


@dataclasses.dataclass(frozen=True)
class OmniConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    ffn_dim: int = 4096
    conv_pos_kernel: int = 128
    conv_pos_groups: int = 16
    vocab_size: int = 10288
    blank_id: int = 0
    layer_norm_eps: float = 1e-5


CONFIG_300M = OmniConfig(hidden_size=1024, num_layers=24)
CONFIG_1B = OmniConfig(hidden_size=1280, num_layers=48, num_heads=20, ffn_dim=5120)


def config_tiny(vocab: int = 40) -> OmniConfig:
    return OmniConfig(hidden_size=32, num_layers=2, num_heads=2, ffn_dim=64,
                      conv_pos_kernel=16, conv_pos_groups=2, vocab_size=vocab)


def conv_output_length(n_samples: int) -> int:
    l = n_samples
    for _, k, s in CONV_SPEC:
        l = (l - k) // s + 1
    return l


def init_omni_params(key, cfg: OmniConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 12 + cfg.num_layers)
    params = {"feature_extractor": [], "layers": []}
    cin = 1
    for i, (c, k, s) in enumerate(CONV_SPEC):
        params["feature_extractor"].append({
            "kernel": (jax.random.normal(ks[i % 8], (k, cin, c)) / np.sqrt(k * cin)).astype(dtype),
            "ln": {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)},
        })
        cin = c
    h = cfg.hidden_size
    params["feature_projection"] = {
        "ln": {"weight": jnp.ones((512,), dtype), "bias": jnp.zeros((512,), dtype)},
        "proj": init_linear(ks[8], 512, h, dtype=dtype),
    }
    params["pos_conv"] = {
        "kernel": (jax.random.normal(ks[9], (cfg.conv_pos_kernel, h // cfg.conv_pos_groups, h)) * 0.02).astype(dtype),
        "bias": jnp.zeros((h,), dtype),
    }
    params["encoder_ln"] = {"weight": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)}
    for i in range(cfg.num_layers):
        k = jax.random.split(ks[12 + i], 6)
        params["layers"].append({
            "attn": {"q": init_linear(k[0], h, h, dtype=dtype), "k": init_linear(k[1], h, h, dtype=dtype),
                     "v": init_linear(k[2], h, h, dtype=dtype), "o": init_linear(k[3], h, h, dtype=dtype)},
            "ln1": {"weight": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
            "ff1": init_linear(k[4], h, cfg.ffn_dim, dtype=dtype),
            "ff2": init_linear(k[5], cfg.ffn_dim, h, dtype=dtype),
            "ln2": {"weight": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
        })
    params["ctc_head"] = init_linear(ks[10], h, cfg.vocab_size, dtype=dtype)
    return params


def omni_forward(params, cfg: OmniConfig, audio, n_valid_samples):
    """audio: [T] (padded); returns (log-probs [F, vocab], n_valid_frames)."""
    # utterance-level layer norm of the waveform (reference preprocessing)
    t = audio.shape[0]
    valid = jnp.arange(t) < n_valid_samples
    cnt = jnp.maximum(n_valid_samples, 1).astype(jnp.float32)
    mean = jnp.sum(jnp.where(valid, audio, 0.0)) / cnt
    var = jnp.sum(jnp.where(valid, (audio - mean) ** 2, 0.0)) / cnt
    x = jnp.where(valid, (audio - mean) * jax.lax.rsqrt(var + 1e-7), 0.0)

    h = x[None, :, None]  # [1, T, 1]
    for i, ((c, k, s), p) in enumerate(zip(CONV_SPEC, params["feature_extractor"])):
        h = jax.lax.conv_general_dilated(
            h, p["kernel"], (s,), ((0, 0),),
            dimension_numbers=("NHC", "HIO", "NHC"), preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        h = layer_norm(h, p["ln"]["weight"], p["ln"]["bias"], cfg.layer_norm_eps)
        h = jax.nn.gelu(h, approximate=False)

    fp = params["feature_projection"]
    h = layer_norm(h, fp["ln"]["weight"], fp["ln"]["bias"], cfg.layer_norm_eps)
    h = linear(h, fp["proj"])  # [1, F, H]

    # convolutional position embeddings (grouped conv, same-pad, gelu)
    pc = params["pos_conv"]
    kk = pc["kernel"].shape[0]
    pos = jax.lax.conv_general_dilated(
        h, pc["kernel"], (1,), ((kk // 2, kk - 1 - kk // 2),),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=cfg.conv_pos_groups, preferred_element_type=jnp.float32,
    ).astype(h.dtype) + pc["bias"]
    h = h + jax.nn.gelu(pos, approximate=False)
    # NOTE: stable-layer-norm wav2vec2 applies encoder.layer_norm AFTER the
    # transformer stack (HF Wav2Vec2EncoderStableLayerNorm.forward), not
    # before it — the CTC head reads normalized states

    f = h.shape[1]
    n_valid_f = conv_output_length(n_valid_samples) if isinstance(n_valid_samples, int) else _conv_len_device(n_valid_samples)
    key_ok = jnp.arange(f)[None, :] < n_valid_f
    mask = jnp.where(key_ok, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]
    hd = cfg.hidden_size // cfg.num_heads
    for p in params["layers"]:
        hh = layer_norm(h, p["ln1"]["weight"], p["ln1"]["bias"], cfg.layer_norm_eps)
        q = linear(hh, p["attn"]["q"]).reshape(1, f, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        k = linear(hh, p["attn"]["k"]).reshape(1, f, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        v = linear(hh, p["attn"]["v"]).reshape(1, f, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        a = sdpa(q, k, v, 1.0 / np.sqrt(hd), mask)
        h = h + linear(a.transpose(0, 2, 1, 3).reshape(1, f, -1), p["attn"]["o"])
        hh = layer_norm(h, p["ln2"]["weight"], p["ln2"]["bias"], cfg.layer_norm_eps)
        h = h + linear(jax.nn.gelu(linear(hh, p["ff1"]), approximate=False), p["ff2"])

    h = layer_norm(h, params["encoder_ln"]["weight"], params["encoder_ln"]["bias"], cfg.layer_norm_eps)
    logits = linear(h[0], params["ctc_head"]).astype(jnp.float32)
    return jax.nn.log_softmax(logits, axis=-1), n_valid_f


def _conv_len_device(n):
    l = n
    for _, k, s in CONV_SPEC:
        l = (l - k) // s + 1
    return l


def ctc_greedy_collapse(tokens: np.ndarray, blank_id: int) -> List[int]:
    """Collapse repeats then remove blanks (reference: CTCGreedyDecoder)."""
    out: List[int] = []
    prev = -1
    for t in tokens:
        if t != prev and t != blank_id:
            out.append(int(t))
        prev = t
    return out


class OmnilingualASR(SpeechRecognitionModel):
    BUCKETS_S = (5, 10, 20, 40)

    def __init__(self, cfg: OmniConfig, params, tokenizer=None, dtype=jnp.bfloat16):
        self.cfg = cfg
        self.tokenizer = tokenizer  # SentencePieceModel
        self.params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
        self._loaded = True
        self._jit = jax.jit(functools.partial(omni_forward, cfg=cfg))

    @classmethod
    def init_random(cls, cfg: Optional[OmniConfig] = None, seed: int = 0,
                    dtype=jnp.float32, **kw) -> "OmnilingualASR":
        cfg = cfg or config_tiny()
        return cls(cfg, init_omni_params(jax.random.PRNGKey(seed), cfg), dtype=dtype, **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "facebook/omnilingual-asr-300m", cache_dir=None,
                        offline_mode: bool = False, dtype=jnp.bfloat16, **kw) -> "OmnilingualASR":
        from pathlib import Path

        from ...core.hub import download_weights
        from ...core.weights import load_safetensors
        from ...tokenizers.sentencepiece_model import SentencePieceModel
        from .convert import convert_wav2vec2

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode)
        cfg = CONFIG_300M
        params = convert_wav2vec2(load_safetensors(model_dir), cfg)
        spm = sorted(Path(model_dir).glob("*.model"))
        tokenizer = SentencePieceModel.load(spm[0]) if spm else None
        return cls(cfg, params, tokenizer=tokenizer, dtype=dtype, **kw)

    def transcribe(self, audio: np.ndarray, sample_rate: int = 16000,
                   language: Optional[str] = None, **kwargs) -> TranscriptionResult:
        t0 = time.perf_counter()
        if sample_rate != 16000:
            from ...audio.resample import resample

            audio = resample(audio.astype(np.float32), sample_rate, 16000)
        audio = audio[: int(MAX_SECONDS * 16000)]  # 40 s cap
        duration = len(audio) / 16000
        bucket = next((s * 16000 for s in self.BUCKETS_S if len(audio) <= s * 16000),
                      self.BUCKETS_S[-1] * 16000)
        padded = np.zeros(bucket, np.float32)
        padded[: len(audio)] = audio
        logp, n_f = self._jit(self.params, audio=jnp.asarray(padded),
                              n_valid_samples=jnp.asarray(len(audio), jnp.int32))
        logp = np.asarray(logp)[: int(n_f)]
        tokens = logp.argmax(axis=-1)
        ids = ctc_greedy_collapse(tokens, self.cfg.blank_id)
        text = self.tokenizer.decode(ids) if self.tokenizer else " ".join(map(str, ids))
        conf = float(np.exp(logp.max(axis=-1).mean())) if len(logp) else 0.0
        return TranscriptionResult(text=text, language=language, confidence=conf,
                                   duration=duration, processing_time=time.perf_counter() - t0)

    def warm_up(self) -> None:
        self.transcribe(np.zeros(16000, np.float32))

    def unload(self) -> None:
        self.params = None
        self._loaded = False

    @property
    def is_loaded(self) -> bool:
        return self._loaded

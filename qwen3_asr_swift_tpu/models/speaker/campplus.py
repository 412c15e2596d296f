"""CAM++ speaker embedding — the published 3D-Speaker D-TDNN topology.

TPU-native analog of the reference's CamPlusPlusSpeaker (reference:
Sources/CosyVoiceTTS/CamPlusPlusSpeaker.swift:13-155 — consumed there as
an opaque CoreML artifact producing 192-d embeddings for CosyVoice3 voice
cloning; mel frontend spec in CamPlusPlusMelExtractor.swift:9-218).

Frontend (CamPlusPlusMelExtractor.swift): Kaldi fbank with Povey window,
pre-emphasis 0.97, 400/160 framing zero-padded to a 512 FFT, 80 HTK-mel
bins (fmin 20) with Slaney area normalization, log(max(x, 1e-10)), then
per-bin temporal mean subtraction (CMN).  Input policy: tile short audio /
center-crop long audio to 500 frames (CamPlusPlusSpeaker.swift:108-133).

Network (3D-Speaker CAM++ recipe):
  FCM head: Conv2d(3×3) → 2+2 BasicResBlocks (stride 2 on the mel axis) →
    Conv2d stride (2,1) → flatten to 32·(F/8) channels,
  TDNN layer (k5, stride 2),
  3 CAM-dense blocks (12/24/16 layers, growth 32, bottleneck 128,
    dilations 1/2/2) — each dense layer: bn-relu → 1×1 → bn-relu →
    CAM layer (local conv masked by sigmoid gates from global mean +
    100-frame segment pooling) with dense concatenation,
  transit layers halving channels, bn-relu,
  stats pooling (mean‖std) → dense 1×1 → bn (no affine) → 192-d.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import SpeakerEmbeddingModel


@dataclasses.dataclass(frozen=True)
class CampPlusConfig:
    feat_dim: int = 80
    embedding_size: int = 192
    growth_rate: int = 32
    bn_size: int = 4            # bottleneck = bn_size * growth_rate
    init_channels: int = 128
    m_channels: int = 32        # FCM width
    block_layers: Tuple[int, ...] = (12, 24, 16)
    block_dilations: Tuple[int, ...] = (1, 2, 2)
    kernel_size: int = 3
    seg_len: int = 100
    target_frames: int = 500
    sample_rate: int = 16000

    @property
    def head_out(self) -> int:
        return self.m_channels * (self.feat_dim // 8)


CONFIG_CAMPPLUS = CampPlusConfig()


def config_tiny() -> CampPlusConfig:
    return CampPlusConfig(feat_dim=16, embedding_size=8, growth_rate=4,
                          bn_size=2, init_channels=8, m_channels=4,
                          block_layers=(2, 2), block_dilations=(1, 2),
                          seg_len=5, target_frames=40)


# ---------------------------------------------------------------------------
# frontend
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=2)
def _campplus_dft(frame_len=400, n_fft=512):
    i = np.arange(frame_len, dtype=np.float64)
    povey = (0.5 - 0.5 * np.cos(2 * np.pi * i / (frame_len - 1))) ** 0.85
    n = np.arange(frame_len)
    k = np.arange(n_fft // 2 + 1)
    phase = 2 * np.pi * np.outer(n, k) / n_fft
    return ((povey[:, None] * np.cos(phase)).astype(np.float32),
            (povey[:, None] * -np.sin(phase)).astype(np.float32))


@functools.lru_cache(maxsize=2)
def _htk_mel_banks(n_mels=80, n_fft=512, sr=16000, fmin=20.0):
    """HTK mel triangles with Slaney 2/(f_hi−f_lo) area normalization
    (CamPlusPlusMelExtractor.swift:44-96)."""
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    n_bins = n_fft // 2 + 1
    freqs = np.arange(n_bins) * sr / n_fft
    pts = mel2hz(np.linspace(hz2mel(fmin), hz2mel(sr / 2), n_mels + 2))
    fb = np.zeros((n_bins, n_mels))
    for m in range(n_mels):
        lo, c, hi = pts[m], pts[m + 1], pts[m + 2]
        up = (freqs - lo) / max(c - lo, 1e-9)
        down = (hi - freqs) / max(hi - c, 1e-9)
        tri = np.maximum(0.0, np.minimum(up, down))
        fb[:, m] = tri * (2.0 / (hi - lo))
    return fb.astype(np.float32)


def campplus_fbank(audio, n_valid_samples=None, cfg: CampPlusConfig = CONFIG_CAMPPLUS):
    """audio [T] at 16 kHz → [n_frames, feat_dim] CMN'd log-mel.

    ``n_valid_samples`` (traced scalar) supports length-bucketed calls:
    the audio is padded to a bucket so ONE compiled program serves a
    range of durations (instead of recompiling per clip length); CMN
    statistics cover only the valid frames and padded rows return 0."""
    frame_len, hop = 400, 160
    t = audio.shape[-1]
    n_frames = max(0, 1 + (t - frame_len) // hop)
    if n_frames == 0:
        return jnp.zeros((0, cfg.feat_dim))
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :]
    frames = audio[idx]
    shifted = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=-1)
    frames = frames - 0.97 * shifted
    cos_m, sin_m = _campplus_dft(frame_len)
    re = frames @ jnp.asarray(cos_m)
    im = frames @ jnp.asarray(sin_m)
    power = re * re + im * im
    n_fft = 512
    fb = jnp.asarray(_htk_mel_banks(cfg.feat_dim, n_fft, cfg.sample_rate))
    mel = jnp.log(jnp.maximum(power @ fb, 1e-10))
    if n_valid_samples is None:
        return mel - mel.mean(axis=0, keepdims=True)    # CMN
    nvf = jnp.maximum(1 + (n_valid_samples - frame_len) // hop, 1)
    valid = (jnp.arange(n_frames) < nvf)[:, None]
    mean = jnp.sum(jnp.where(valid, mel, 0.0), axis=0, keepdims=True) / nvf
    return jnp.where(valid, mel - mean, 0.0)            # CMN over valid rows


def prepare_frames(mel: np.ndarray, target: int) -> np.ndarray:
    """Tile short / center-crop long to ``target`` frames
    (CamPlusPlusSpeaker.swift:108-133)."""
    n = len(mel)
    if n >= target:
        off = (n - target) // 2
        return mel[off: off + target]
    reps = int(np.ceil(target / n))
    return np.tile(mel, (reps, 1))[:target]


# ---------------------------------------------------------------------------
# network
# ---------------------------------------------------------------------------

def _bn(x, p, axis=-1):
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    inv = jax.lax.rsqrt(p["var"] + 1e-5)
    y = (x - p["mean"].reshape(shape)) * inv.reshape(shape)
    if "scale" in p:
        y = y * p["scale"].reshape(shape) + p["bias"].reshape(shape)
    return y


def _conv2d(x, w, stride=(1, 1)):
    """NCHW conv, torch OIHW weights, padding 1 (all FCM convs are 3×3 p1)."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)


def _conv1d(x, p, stride=1, dilation=1, padding=0):
    """NCL conv, torch [out, in, k] weights."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,), padding=((padding, padding),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"][None, :, None]
    return y


def _res_block(x, p, stride):
    h = jax.nn.relu(_bn(_conv2d(x, p["conv1"], (stride, 1)), p["bn1"], axis=1))
    h = _bn(_conv2d(h, p["conv2"]), p["bn2"], axis=1)
    if "shortcut_w" in p:
        s = jax.lax.conv_general_dilated(
            x, p["shortcut_w"], window_strides=(stride, 1), padding=((0, 0), (0, 0)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32)
        x = _bn(s, p["shortcut_bn"], axis=1)
    return jax.nn.relu(h + x)


def _fcm(p, mel):
    """mel [T, F] → [C·F/8, T'] (T unchanged; freq strided 2·2·2)."""
    x = mel.T[None, None]                                  # [1,1,F,T]
    x = jax.nn.relu(_bn(_conv2d(x, p["conv1"]), p["bn1"], axis=1))
    for i, blk in enumerate(p["layer1"]):
        x = _res_block(x, blk, 2 if i == 0 else 1)
    for i, blk in enumerate(p["layer2"]):
        x = _res_block(x, blk, 2 if i == 0 else 1)
    x = jax.nn.relu(_bn(_conv2d(x, p["conv2"], (2, 1)), p["bn2"], axis=1))
    b, c, f, t = x.shape
    return x.reshape(b, c * f, t)


def _bn_relu(x, p):
    return jax.nn.relu(_bn(x, p, axis=1))


def _seg_pool(x, seg_len):
    """avg_pool1d(kernel=seg, stride=seg, ceil_mode) then nearest-repeat
    back to T (CAMLayer.seg_pooling)."""
    b, c, t = x.shape
    n_seg = -(-t // seg_len)
    pad = n_seg * seg_len - t
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    seg = xp.reshape(b, c, n_seg, seg_len)
    counts = jnp.minimum(seg_len, t - jnp.arange(n_seg) * seg_len)
    means = seg.sum(-1) / counts[None, None, :]
    rep = jnp.repeat(means, seg_len, axis=-1)
    return rep[..., :t]


def _cam_layer(x, p, cfg, dilation):
    pad = (cfg.kernel_size - 1) // 2 * dilation
    y = _conv1d(x, p["linear_local"], dilation=dilation, padding=pad)
    context = x.mean(-1, keepdims=True) + _seg_pool(x, cfg.seg_len)
    context = jax.nn.relu(_conv1d(context, p["linear1"]))
    m = jax.nn.sigmoid(_conv1d(context, p["linear2"]))
    return y * m


def _dense_layer(x, p, cfg, dilation):
    h = _bn_relu(x, p["nonlinear1"])
    h = _conv1d(h, {"w": p["linear1"]})
    h = _bn_relu(h, p["nonlinear2"])
    return _cam_layer(h, p["cam"], cfg, dilation)


def campplus_forward(params, cfg: CampPlusConfig, mel):
    """mel [T, feat_dim] (CMN'd) → embedding [embedding_size]."""
    x = _fcm(params["head"], mel)
    x = _conv1d(x, params["tdnn"]["linear"], stride=2, padding=2)
    x = _bn_relu(x, params["tdnn"]["nonlinear"])
    for bi, n_layers in enumerate(cfg.block_layers):
        dil = cfg.block_dilations[bi]
        for layer in params["blocks"][bi]:
            x = jnp.concatenate([x, _dense_layer(x, layer, cfg, dil)], axis=1)
        tr = params["transits"][bi]
        x = _conv1d(_bn_relu(x, tr["nonlinear"]), {"w": tr["linear"]})
    x = _bn_relu(x, params["out_nonlinear"])
    mean = x.mean(-1)
    std = jnp.sqrt(jnp.clip(x.var(-1), 1e-8))
    stats = jnp.concatenate([mean, std], axis=1)            # [1, 2C]
    emb = _conv1d(stats[..., None], params["dense"]["linear"])[..., 0]
    emb = _bn(emb, params["dense"]["nonlinear"], axis=1)    # affine-free bn
    return emb[0]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_campplus_params(key, cfg: CampPlusConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 1024))

    def conv2(o, i, k=3):
        return (jax.random.normal(next(keys), (o, i, k, k)) / np.sqrt(i * k * k)).astype(dtype)

    def bn(c, affine=True):
        p = {"mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}
        if affine:
            p["scale"] = jnp.ones((c,), dtype)
            p["bias"] = jnp.zeros((c,), dtype)
        return p

    def conv1(o, i, k=1, bias=False):
        p = {"w": (jax.random.normal(next(keys), (o, i, k)) / np.sqrt(i * k)).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((o,), dtype)
        return p

    m = cfg.m_channels

    def res(first):
        p = {"conv1": conv2(m, m), "bn1": bn(m), "conv2": conv2(m, m), "bn2": bn(m)}
        if first:
            p["shortcut_w"] = conv2(m, m, 1)
            p["shortcut_bn"] = bn(m)
        return p

    head = {"conv1": conv2(m, 1), "bn1": bn(m),
            "layer1": [res(True), res(False)], "layer2": [res(True), res(False)],
            "conv2": conv2(m, m), "bn2": bn(m)}

    channels = cfg.init_channels
    bn_ch = cfg.bn_size * cfg.growth_rate
    blocks, transits = [], []
    for n_layers in cfg.block_layers:
        block = []
        for _ in range(n_layers):
            block.append({
                "nonlinear1": bn(channels),
                "linear1": conv1(bn_ch, channels)["w"],
                "nonlinear2": bn(bn_ch),
                "cam": {"linear_local": conv1(cfg.growth_rate, bn_ch, cfg.kernel_size),
                        "linear1": conv1(bn_ch // 2, bn_ch, bias=True),
                        "linear2": conv1(cfg.growth_rate, bn_ch // 2, bias=True)},
            })
            channels += cfg.growth_rate
        blocks.append(block)
        transits.append({"nonlinear": bn(channels),
                         "linear": conv1(channels // 2, channels)["w"]})
        channels //= 2

    return {
        "head": head,
        "tdnn": {"linear": conv1(cfg.init_channels, cfg.head_out, 5, bias=True),
                 "nonlinear": bn(cfg.init_channels)},
        "blocks": blocks,
        "transits": transits,
        "out_nonlinear": bn(channels),
        "dense": {"linear": conv1(cfg.embedding_size, channels * 2, bias=True),
                  "nonlinear": bn(cfg.embedding_size, affine=False)},
    }


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

class CampPlusSpeaker(SpeakerEmbeddingModel):
    """192-d CAM++ speaker embeddings (not L2-normalized — the CosyVoice
    flow normalizes internally, CamPlusPlusSpeaker.swift:82)."""

    FBANK_BUCKETS_S = (2, 5, 10, 20, 30)

    def __init__(self, cfg: CampPlusConfig, params, dtype=jnp.float32):
        from ...ops.quant import cast_tree

        self.cfg = cfg
        self.params = cast_tree(params, dtype)
        self._loaded = True
        self._forward = jax.jit(functools.partial(campplus_forward, cfg=cfg))
        self._fbank = jax.jit(functools.partial(campplus_fbank, cfg=cfg))
        # batched variants (embed_batch): the D-TDNN forward dominates —
        # N dispatches collapse to 1 for a diarization window sweep
        self._forward_batch = jax.jit(jax.vmap(
            lambda p, m: campplus_forward(p, cfg, m), in_axes=(None, 0)))
        self._fbank_batch = jax.jit(jax.vmap(
            functools.partial(campplus_fbank, cfg=cfg), in_axes=(0, 0)))

    @classmethod
    def init_random(cls, cfg: CampPlusConfig | None = None, seed: int = 0, **kw):
        cfg = cfg or config_tiny()
        return cls(cfg, init_campplus_params(jax.random.PRNGKey(seed), cfg), **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "aufklarer/CamPlusPlus-Speaker-CoreML",
                        cache_dir=None, offline_mode: bool = False, **kw):
        from ...core.hub import download_weights
        from .campplus_convert import convert_checkpoint

        model_dir = download_weights(model_id, cache_dir=cache_dir,
                                     offline_mode=offline_mode)
        cfg, params = convert_checkpoint(model_dir)
        return cls(cfg, params, **kw)

    @property
    def embedding_dim(self) -> int:
        return self.cfg.embedding_size

    def embed(self, audio: np.ndarray, sample_rate: int = 16000) -> np.ndarray:
        from ...audio.resample import resample

        if sample_rate != self.cfg.sample_rate:
            audio = resample(np.asarray(audio, np.float32), sample_rate,
                             self.cfg.sample_rate)
        if len(audio) < 1600:
            raise ValueError(
                f"Audio too short for speaker embedding ({len(audio)} samples, need >= 1600)")
        # pad to a seconds bucket so one compiled fbank program serves a
        # range of clip lengths (voice-cloning prompts are arbitrary)
        frame_len, hop = 400, 160
        n_real = len(audio)
        for bucket_s in self.FBANK_BUCKETS_S:
            if n_real <= bucket_s * self.cfg.sample_rate:
                break
        target = max(bucket_s * self.cfg.sample_rate, n_real)
        padded = np.pad(np.asarray(audio, np.float32), (0, target - n_real))
        mel = np.asarray(self._fbank(jnp.asarray(padded),
                                     jnp.asarray(n_real, jnp.int32)))
        mel = mel[: max(1 + (n_real - frame_len) // hop, 0)]
        if len(mel) < 10:
            raise ValueError(f"Too few mel frames ({len(mel)}, need >= 10)")
        mel = prepare_frames(mel, self.cfg.target_frames)
        return np.asarray(self._forward(self.params, mel=jnp.asarray(mel)),
                          np.float32)

    def embed_batch(self, audios, sample_rate: int = 16000) -> np.ndarray:
        """Embed N clips with ONE batched fbank program per shared bucket
        and ONE batched D-TDNN forward for the whole set. Row-for-row
        equal to embed(); returns [N, embedding_size]."""
        from ...audio.resample import resample

        if not len(audios):
            return np.zeros((0, self.cfg.embedding_size), np.float32)
        frame_len, hop = 400, 160
        clips = []
        for a in audios:
            a = np.asarray(a, np.float32)
            if sample_rate != self.cfg.sample_rate:
                a = resample(a, sample_rate, self.cfg.sample_rate)
            if len(a) < 1600:
                raise ValueError(
                    f"Audio too short for speaker embedding ({len(a)} samples, need >= 1600)")
            clips.append(a)
        longest = max(len(a) for a in clips)
        bucket = next((s * self.cfg.sample_rate for s in self.FBANK_BUCKETS_S
                       if longest <= s * self.cfg.sample_rate), longest)
        target = max(bucket, longest)
        stage = np.zeros((len(clips), target), np.float32)
        n_real = np.zeros(len(clips), np.int32)
        for i, a in enumerate(clips):
            stage[i, : len(a)] = a
            n_real[i] = len(a)
        mels = np.asarray(self._fbank_batch(jnp.asarray(stage), jnp.asarray(n_real)))
        prepped = []
        for i in range(len(clips)):
            mel = mels[i][: max(1 + (n_real[i] - frame_len) // hop, 0)]
            if len(mel) < 10:
                raise ValueError(f"Too few mel frames ({len(mel)}, need >= 10)")
            prepped.append(prepare_frames(mel, self.cfg.target_frames))
        return np.asarray(self._forward_batch(self.params,
                                              jnp.asarray(np.stack(prepped))),
                          np.float32)

    def warm_up(self):
        self.embed(np.zeros(self.cfg.sample_rate, np.float32))

    def unload(self):
        self.params = None
        self._loaded = False

    @property
    def is_loaded(self):
        return self._loaded

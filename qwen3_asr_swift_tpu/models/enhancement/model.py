"""Speech enhancement: DeepFilterNet3 denoiser at 48 kHz.

TPU-native implementation of the reference's enhancement module
(reference: Sources/SpeechEnhancement/SpeechEnhancement.swift:79-212,
AudioProcessing.swift, Configuration.swift:53-73).  The DSP follows the
reference bit-for-bit in structure:

  * Vorbis window ``sin(pi/2 · sin²(pi(n+0.5)/N))`` (AudioProcessing.swift:10-19)
    — satisfies the Princen-Bradley condition at 50% overlap, so the iSTFT
    overlap-add needs no window-power normalization,
  * rectangular ERB filterbank with per-band widths, min 2 bins, forward
    1/width / inverse 1.0 (AudioProcessing.swift:27-106),
  * ERB features in dB ``10·log10(x+1e-10)`` with exponential mean-norm
    ``(x−state)/40`` and complex-spec unit-norm ``x/sqrt(state)`` where the
    state tracks magnitude, alpha = exp(−hop/sr/τ), τ=1 s
    (AudioProcessing.swift:285-371, Configuration.swift:48-50),
  * order-5 deep filtering over the lowest 96 bins with 2-frame lookahead
    and clamped frame indexing; DF output REPLACES the low bins, the ERB
    mask covers the rest (AudioProcessing.swift:393-435,
    SpeechEnhancement.swift:176-199),
  * STFT framing with a 480-sample zero analysis memory and a trailing hop
    of zero padding; output trimmed by one hop (SpeechEnhancement.swift:87-208).

The network itself is the published DeepFilterNet3 topology in ``dfn3.py``
(the reference consumes it as an opaque CoreML artifact).  The whole
utterance runs as one jitted program per frame-count bucket.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...core import AudioChunk, SpeechEnhancementModel
from .dfn3 import (
    DF_ORDER,
    LOOKAHEAD,
    NB_DF,
    NB_ERB,
    DfnState,
    dfn3_step,
    init_dfn3_params,
    init_state,
)

SR = 48000
N_FFT = 960
HOP = 480
N_BINS = N_FFT // 2 + 1  # 481
N_ERB = NB_ERB
N_DF_BINS = NB_DF
NORM_TAU = 1.0
NORM_ALPHA = float(np.exp(-HOP / SR / NORM_TAU))  # ≈0.99005


def vorbis_window(n: int = N_FFT) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    return np.sin(np.pi / 2 * np.sin(np.pi * (i + 0.5) / n) ** 2).astype(np.float32)


@functools.lru_cache(maxsize=1)
def _dft():
    n = np.arange(N_FFT)
    window = vorbis_window().astype(np.float64)
    k = np.arange(N_BINS)
    phase = 2 * np.pi * np.outer(n, k) / N_FFT
    return (
        (window[:, None] * np.cos(phase)).astype(np.float32),
        (window[:, None] * -np.sin(phase)).astype(np.float32),
        window.astype(np.float32),
    )


@functools.lru_cache(maxsize=1)
def _idft():
    n = np.arange(N_FFT)
    k = np.arange(N_BINS)
    phase = 2 * np.pi * np.outer(k, n) / N_FFT
    scale = np.full(N_BINS, 2.0, np.float64)
    scale[0] = scale[-1] = 1.0
    icos = (scale[:, None] * np.cos(phase) / N_FFT).astype(np.float32)
    isin = (scale[:, None] * np.sin(phase) / N_FFT).astype(np.float32)
    return icos, isin


@functools.lru_cache(maxsize=1)
def _erb_fb_widths():
    """Rectangular ERB bands (reference AudioProcessing.swift:27-106)."""
    def freq2erb(f):
        return 9.265 * np.log(1.0 + f / (24.7 * 9.265))

    def erb2freq(e):
        return 24.7 * 9.265 * (np.exp(e / 9.265) - 1.0)

    erb_low, erb_high = freq2erb(0.0), freq2erb(SR / 2)
    step = (erb_high - erb_low) / N_ERB
    widths = np.zeros(N_ERB, np.int64)
    total = 0
    for band in range(N_ERB):
        f_lo = erb2freq(erb_low + band * step)
        f_hi = erb2freq(erb_low + (band + 1) * step)
        b_lo = int(round(f_lo * N_FFT / SR))
        b_hi = int(round(f_hi * N_FFT / SR))
        w = max(2, b_hi - b_lo)
        if band == N_ERB - 1:
            w = N_BINS - total
        widths[band] = w
        total += w
    if total != N_BINS:
        widths[-1] += N_BINS - total

    fwd = np.zeros((N_BINS, N_ERB), np.float32)
    inv = np.zeros((N_ERB, N_BINS), np.float32)
    off = 0
    for band in range(N_ERB):
        w = int(widths[band])
        fwd[off:off + w, band] = 1.0 / w
        inv[band, off:off + w] = 1.0
        off += w
    return fwd, inv, widths


def erb_filterbank() -> np.ndarray:
    """Forward ERB filterbank [N_BINS, N_ERB]."""
    return _erb_fb_widths()[0]


def erb_inverse_filterbank() -> np.ndarray:
    """Inverse ERB filterbank [N_ERB, N_BINS]."""
    return _erb_fb_widths()[1]


# libDF default normalization-state initializers (overridden by the
# checkpoint's auxiliary.npz states when present — the reference loads
# mean_norm_state/unit_norm_state from auxiliary.npz, WeightLoading.swift:43-62).
def default_mean_norm_init() -> np.ndarray:
    return np.linspace(-60.0, -90.0, N_ERB).astype(np.float32)


def default_unit_norm_init() -> np.ndarray:
    return np.linspace(0.001, 0.0001, N_DF_BINS).astype(np.float32)


def init_dfn_params(key, dtype=jnp.float32) -> dict:
    return init_dfn3_params(key, dtype=dtype)


# ---------------------------------------------------------------------------
# feature extraction (shared batch/streaming math)
# ---------------------------------------------------------------------------

def _featurize(frames, mean_state, unit_state):
    """Windowed DFT + ERB dB mean-norm features + unit-normalized low-band
    complex spectrum.  Taking raw frames (not spectra) keeps the DFT matmul
    inside one XLA program for both the batch and streaming paths — the
    unit-norm warm-up divides by sqrt(≈1e-4), so host-vs-device matmul
    codegen differences would otherwise be amplified ~100× into the features.

    frames: [F, N_FFT] raw signal frames (the Vorbis analysis window is
    folded into the DFT matrices).  Returns (erb_n [F,32], spec_n [F,96,2],
    re, im, mean_state, unit_state)."""
    cos_m, sin_m, _ = _dft()
    re = frames @ jnp.asarray(cos_m)
    im = frames @ jnp.asarray(sin_m)
    power = re * re + im * im
    fb = jnp.asarray(erb_filterbank())
    erb_db = 10.0 * jnp.log10(power @ fb + 1e-10)

    def mean_step(state, x):
        state = x * (1 - NORM_ALPHA) + state * NORM_ALPHA
        return state, (x - state) / 40.0

    mean_state, erb_n = jax.lax.scan(mean_step, mean_state, erb_db)

    lo_re, lo_im = re[:, :N_DF_BINS], im[:, :N_DF_BINS]
    mag = jnp.sqrt(lo_re * lo_re + lo_im * lo_im)

    def unit_step(state, x):
        m, r, i = x
        state = m * (1 - NORM_ALPHA) + state * NORM_ALPHA
        norm = jnp.sqrt(jnp.maximum(state, 1e-10))
        return state, (r / norm, i / norm)

    unit_state, (nre, nim) = jax.lax.scan(unit_step, unit_state, (mag, lo_re, lo_im))
    spec_n = jnp.stack([nre, nim], axis=-1)
    return erb_n, spec_n, re, im, mean_state, unit_state


def _istft_ola(re, im, synthesis_mem):
    """Inverse DFT → synthesis window → overlap-add.  Emits hop samples per
    frame (reference AudioProcessing.swift:208-270); Vorbis COLA means no
    normalization divide.  Returns (samples [F*HOP], new synthesis_mem)."""
    icos, isin = _idft()
    _, _, window = _dft()
    frames = re @ jnp.asarray(icos) - im @ jnp.asarray(isin)   # [F, N_FFT]
    frames = frames * jnp.asarray(window)

    def ola_step(mem, frame):
        frame = frame.at[: N_FFT - HOP].add(mem)
        return frame[HOP:], frame[:HOP]

    mem, hops = jax.lax.scan(ola_step, synthesis_mem, frames)
    return hops.reshape(-1), mem


class SpeechEnhancer(SpeechEnhancementModel):
    """DeepFilterNet3 at 48 kHz (reference SpeechEnhancement.swift:16-280).

    The batch ``enhance`` drives the same three compiled programs as the
    streaming session (featurize → net step → mask/DF/iSTFT), pushing the
    whole utterance as one chunk — so streamed output is bit-equal to the
    batch output on shared samples by construction."""

    def __init__(self, params, dtype=jnp.float32,
                 mean_norm_init=None, unit_norm_init=None):
        self.params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
        self.mean_norm_init = np.asarray(
            mean_norm_init if mean_norm_init is not None else default_mean_norm_init(),
            np.float32)
        self.unit_norm_init = np.asarray(
            unit_norm_init if unit_norm_init is not None else default_unit_norm_init(),
            np.float32)
        self._loaded = True

    @classmethod
    def init_random(cls, seed: int = 0, **kw) -> "SpeechEnhancer":
        return cls(init_dfn3_params(jax.random.PRNGKey(seed)), **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "aufklarer/DeepFilterNet3-CoreML",
                        cache_dir=None, offline_mode: bool = False, **kw) -> "SpeechEnhancer":
        from ...core.hub import download_weights
        from .convert import convert_checkpoint

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode)
        params, aux = convert_checkpoint(model_dir)
        return cls(params,
                   mean_norm_init=aux.get("mean_norm_state"),
                   unit_norm_init=aux.get("unit_norm_state"), **kw)

    def enhance(self, audio: np.ndarray, sample_rate: int) -> AudioChunk:
        if sample_rate != SR:
            from ...audio.resample import resample

            audio = resample(audio.astype(np.float32), sample_rate, SR)
        if len(audio) == 0:
            return AudioChunk(np.zeros(0, np.float32), SR)
        t_in = len(audio)
        # the (batch-exact) streaming path, fed greedily through a geometric
        # chunk ladder: compiled shapes stay bounded (3 ladder bucket
        # programs, plus small per-tail-length flush variants and the
        # first-chunk lookahead-skip variants) while a 10 s clip is ~2
        # dispatches, not ~200 — per-dispatch host↔device round-trips, not
        # compute, dominate this 2.1M-param model
        session = StreamingEnhancer(self)
        parts = []
        buf = np.asarray(audio, np.float32)
        for mult in (1000, 100, 10):
            bucket = mult * HOP
            while len(buf) >= bucket:
                parts.append(session.push_exact(buf[:bucket]))
                buf = buf[bucket:]
        session.push_tail(buf)  # tail < 10 hops: flush pads and drains it
        parts.append(session.flush())
        out = np.concatenate(parts)
        out = np.pad(out, (0, max(0, t_in - len(out))))[:t_in]
        return AudioChunk(out.astype(np.float32), SR)

    def warm_up(self) -> None:
        self.enhance(np.zeros(SR, np.float32), SR)

    def unload(self) -> None:
        self.params = None
        self._loaded = False

    @property
    def is_loaded(self) -> bool:
        return self._loaded


# ---------------------------------------------------------------------------
# streaming (reference carries STFT analysis/synthesis memories and the
# normalization state across pushes — SpeechEnhancement.swift:61-94; here the
# network's conv/GRU state is an explicit DfnState carry as well, so chunked
# output equals the batch pass exactly on shared samples)
# ---------------------------------------------------------------------------

def _streaming_net_step(params, net_erb, net_spec, spec_re, spec_im, dfn_state,
                        synthesis_mem):
    """Emit F frames: net inputs are the lookahead-shifted features, spec_re/
    spec_im are [F+DF_ORDER-1, N_BINS] raw spectra covering taps t-2..t+2 of
    every emitted frame.  Returns (samples [F*HOP], new state, new synth mem)."""
    mask, coefs, _lsnr, dfn_state = dfn3_step(params, net_erb, net_spec, dfn_state)
    n_frames = mask.shape[0]
    pad_before = DF_ORDER - 1 - LOOKAHEAD

    cur_re = spec_re[pad_before: pad_before + n_frames]
    cur_im = spec_im[pad_before: pad_before + n_frames]
    inv = jnp.asarray(erb_inverse_filterbank())
    full_mask = mask @ inv
    out_re = cur_re * full_mask
    out_im = cur_im * full_mask

    df_re = jnp.zeros((n_frames, N_DF_BINS))
    df_im = jnp.zeros((n_frames, N_DF_BINS))
    for n in range(DF_ORDER):
        xr = jax.lax.dynamic_slice_in_dim(spec_re[:, :N_DF_BINS], n, n_frames, axis=0)
        xi = jax.lax.dynamic_slice_in_dim(spec_im[:, :N_DF_BINS], n, n_frames, axis=0)
        wr, wi = coefs[:, :, n, 0], coefs[:, :, n, 1]
        df_re += xr * wr - xi * wi
        df_im += xi * wr + xr * wi
    out_re = out_re.at[:, :N_DF_BINS].set(df_re)
    out_im = out_im.at[:, :N_DF_BINS].set(df_im)

    samples, synthesis_mem = _istft_ola(out_re, out_im, synthesis_mem)
    return samples, dfn_state, synthesis_mem


# module-level compiled entry points shared by every session/batch call, so
# executable caching works across instances
_FEAT_JIT = jax.jit(_featurize)
_STEP_JIT = jax.jit(_streaming_net_step)


class StreamingEnhancer:
    """Chunked 48 kHz enhancement with carried state.  Output equals the
    batch path on shared samples; the algorithmic delay is one hop (STFT)
    plus the 2-frame network lookahead = 30 ms.

    Alignment bookkeeping: with the batch path's lookahead shift
    (AudioProcessing.swift:473-489), the net input for OUTPUT frame ``t`` is
    FEATURE frame ``t+2`` — features 0 and 1 are never net inputs, and every
    newly arrived feature frame ``f ≥ 2`` immediately drives the emission of
    frame ``f−2``.  ``flush`` feeds the two trailing zero net inputs to emit
    the last two frames, with DF taps clamped to the final raw spectrum."""

    def __init__(self, model: SpeechEnhancer, chunk_samples: int = 10 * HOP):
        if chunk_samples % HOP:
            raise ValueError("chunk_samples must be a multiple of the 480-sample hop")
        self.model = model
        self.chunk = chunk_samples
        self._feat = _FEAT_JIT
        self._step = _STEP_JIT
        self.reset()

    def reset(self):
        self._buf = np.zeros(0, np.float32)
        self._analysis_mem = np.zeros(N_FFT - HOP, np.float32)
        self._mean = jnp.asarray(self.model.mean_norm_init)
        self._unit = jnp.asarray(self.model.unit_norm_init)
        self._dfn = init_state()
        self._synth = jnp.zeros(N_FFT - HOP)
        self._to_skip_feats = LOOKAHEAD   # leading features that are not net inputs
        self._spec_hist_re = None         # raw spectra the DF taps still need
        self._spec_hist_im = None
        self._skipped = 0                 # leading hop samples dropped (batch trim)

    def push(self, samples: np.ndarray) -> np.ndarray:
        self._buf = np.concatenate([self._buf, np.asarray(samples, np.float32)])
        out = np.zeros(0, np.float32)
        while len(self._buf) >= self.chunk:
            piece, self._buf = self._buf[: self.chunk], self._buf[self.chunk:]
            out = np.concatenate([out, self._ingest(piece)])
        return out

    def push_exact(self, piece: np.ndarray) -> np.ndarray:
        """Process a hop-multiple piece immediately, bypassing the chunk
        re-buffering of push(). Public contract for batch enhance()'s
        ladder: requires an empty internal buffer (no partial hop pending)
        and ``len(piece) % HOP == 0`` — asserted, so a future change to
        push()'s buffering cannot silently desynchronize the batch path."""
        if len(self._buf):
            raise ValueError("push_exact requires an empty stream buffer "
                             f"({len(self._buf)} samples pending)")
        if len(piece) % HOP:
            raise ValueError(f"push_exact piece must be a hop multiple, got {len(piece)}")
        return self._ingest(np.asarray(piece, np.float32))

    def push_tail(self, piece: np.ndarray) -> None:
        """Buffer a final sub-hop tail for flush() (batch enhance())."""
        if len(self._buf):
            raise ValueError("push_tail requires an empty stream buffer")
        self._buf = np.asarray(piece, np.float32)

    def flush(self) -> np.ndarray:
        """Drain: mirror the batch path's trailing hop of zero samples, then
        the 2-frame zero-feature lookahead pad (emitting the last 2 frames)."""
        rem = len(self._buf)
        pad = (-rem) % HOP
        piece = np.pad(self._buf, (0, pad + HOP))
        self._buf = np.zeros(0, np.float32)
        out = self._ingest(piece)

        if self._spec_hist_re is None:
            return out
        n_emit = LOOKAHEAD
        net_erb = np.zeros((n_emit, N_ERB), np.float32)
        net_spec = np.zeros((n_emit, N_DF_BINS, 2), np.float32)
        # DF taps past the end clamp to the last raw frame (edge padding)
        pad_re = np.repeat(self._spec_hist_re[-1:], LOOKAHEAD, axis=0)
        pad_im = np.repeat(self._spec_hist_im[-1:], LOOKAHEAD, axis=0)
        need = n_emit + DF_ORDER - 1
        spec_re = np.concatenate([self._spec_hist_re, pad_re])[-need:]
        spec_im = np.concatenate([self._spec_hist_im, pad_im])[-need:]
        if len(spec_re) < need:   # degenerate sub-2-frame streams
            spec_re = np.concatenate([np.repeat(spec_re[:1], need - len(spec_re), 0), spec_re])
            spec_im = np.concatenate([np.repeat(spec_im[:1], need - len(spec_im), 0), spec_im])
        samples, self._dfn, self._synth = self._step(
            self.model.params, jnp.asarray(net_erb), jnp.asarray(net_spec),
            jnp.asarray(spec_re), jnp.asarray(spec_im), self._dfn, self._synth)
        return np.concatenate([out, self._trim(np.asarray(samples, np.float32))])

    def _trim(self, samples: np.ndarray) -> np.ndarray:
        """Drop the leading hop of output (the batch path's latency trim)."""
        if self._skipped < HOP:
            take = min(HOP - self._skipped, len(samples))
            self._skipped += take
            samples = samples[take:]
        return samples

    def _ingest(self, piece: np.ndarray) -> np.ndarray:
        n_new = len(piece) // HOP
        if n_new == 0:
            return np.zeros(0, np.float32)
        signal = np.concatenate([self._analysis_mem, piece])
        idx = np.arange(n_new)[:, None] * HOP + np.arange(N_FFT)[None, :]
        frames = signal[idx]
        self._analysis_mem = signal[n_new * HOP:]

        erb_n, spec_n, re, im, self._mean, self._unit = self._feat(
            jnp.asarray(frames), self._mean, self._unit)
        erb_n = np.asarray(erb_n, np.float32)
        spec_n = np.asarray(spec_n, np.float32)
        re = np.asarray(re, np.float32)
        im = np.asarray(im, np.float32)

        if self._spec_hist_re is None:
            # DF taps for the first frames clamp to frame 0 (edge padding)
            pb = DF_ORDER - 1 - LOOKAHEAD
            self._spec_hist_re = np.repeat(re[:1], pb, axis=0)
            self._spec_hist_im = np.repeat(im[:1], pb, axis=0)
        self._spec_hist_re = np.concatenate([self._spec_hist_re, re])
        self._spec_hist_im = np.concatenate([self._spec_hist_im, im])

        # the first LOOKAHEAD features of the stream are trimmed from the
        # net-input sequence, but seed the input-conv histories (the batch
        # path's frame 0 sees features 0..2 — see dfn3_forward)
        skip = min(self._to_skip_feats, n_new)
        if skip:
            pos = LOOKAHEAD - self._to_skip_feats
            eh = np.array(self._dfn.erb_conv0_hist)
            sh = np.array(self._dfn.df_conv0_hist)
            eh[0, 0, pos: pos + skip, :] = erb_n[:skip]
            sh[0, :, pos: pos + skip, :] = np.moveaxis(spec_n[:skip], -1, 0)
            self._dfn = self._dfn._replace(
                erb_conv0_hist=jnp.asarray(eh), df_conv0_hist=jnp.asarray(sh))
            self._to_skip_feats -= skip
        net_erb = erb_n[skip:]
        net_spec = spec_n[skip:]
        n_emit = len(net_erb)
        if n_emit == 0:
            return np.zeros(0, np.float32)

        # emitted frames t..t+n_emit-1 need raw spectra t-2 .. t+n_emit+1,
        # which are exactly the newest (n_emit + DF_ORDER - 1) history rows
        need = n_emit + DF_ORDER - 1
        spec_re = self._spec_hist_re[-need:]
        spec_im = self._spec_hist_im[-need:]
        samples, self._dfn, self._synth = self._step(
            self.model.params, jnp.asarray(net_erb), jnp.asarray(net_spec),
            jnp.asarray(spec_re), jnp.asarray(spec_im), self._dfn, self._synth)

        # future frame t+n_emit needs spectra from t+n_emit-2 on → last 4 rows
        keep = DF_ORDER - 1
        self._spec_hist_re = self._spec_hist_re[-keep:]
        self._spec_hist_im = self._spec_hist_im[-keep:]
        return self._trim(np.asarray(samples, np.float32))

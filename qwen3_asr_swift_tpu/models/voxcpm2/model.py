"""VoxCPM2 studio TTS: dual MiniCPM4 LMs + FSQ bottleneck + patch-level
conditional-flow-matching LocDiT + DAC-style AudioVAE (16 kHz analysis /
48 kHz synthesis).

TPU-native implementation of the reference's VoxCPM2TTS module, component
for component (reference: Sources/VoxCPM2TTS/VoxCPM2TTS.swift:29-1450,
MiniCPM4.swift, AudioVAE.swift, Configuration.swift:36-250):

- **AudioVAE** (vae.py): causal Snake/residual-unit encoder (strides
  2·5·8·8 at 16 kHz → 64-d latents @25 Hz) and transpose-conv decoder with
  per-sample-rate scale/bias tables (strides 8·6·5·2·2·2 → 48 kHz).
- **LocEnc**: MiniCPM transformer over each patch of 4 latents plus a
  learned special token; the special-token output is the patch embedding
  (reference: VoxCPMLocEnc, MiniCPM4.swift:480-540).
- **base_lm / residual_lm**: MiniCPM4 transformers with µP scaling
  (scale_emb=12 on embeddings, scale_depth/√L residuals —
  MiniCPM4.swift:346-390); the residual LM runs without RoPE
  (Configuration.swift:239 residualLMNoRope).  Audio positions of the base
  LM output pass through the **FSQ scalar-quantization layer** (512-d
  in_proj → tanh → round to a (2·9+1)-level grid → out_proj —
  ScalarQuantizationLayer, VoxCPM2TTS.swift:11-27).
- **UnifiedCFM / LocDiTV2**: per step the DiT consumes the token sequence
  [mu(2 tokens from lm/res projections), time token (t-emb + Δt-emb),
  cond patch tokens, noisy patch tokens] through a bidirectional MiniCPM
  decoder and returns the velocity for the x tokens
  (MiniCPM4.swift:577-651).  The Euler solver uses the sway-shaped time
  span ``t + (cos(πt/2) − 1 + t)`` and **CFG-Zero*** (zero velocity on the
  first ~4% of steps, guidance projected onto the negative branch —
  MiniCPM4.swift:152-166, 675-730).
- **stop head**: 2-class linear over silu(stop_proj(h)), checked before
  each LM advance (VoxCPM2TTS.swift:1394-1399).
- Voice cloning: reference audio is VAE-encoded and spliced into the
  prefix between tokens 103/104 with complementary text/audio masks
  (VoxCPM2TTS.swift:1160-1260).

TPU shape: prefill + the whole AR loop (CFM scan nested inside a
``lax.while_loop`` with static KV caches) is ONE jitted program; the VAE
encode/decode are separate conv programs.  maxTokens is a static bucket.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core import AudioChunk, SpeechGenerationModel
from ...ops.attention import NEG_INF, sdpa
from ...ops.kv_cache import after_prefill, after_token, init_cache, write_prompt, write_token
from ...ops.nn import init_linear, linear, rms_norm, swiglu_mlp
from .vae import (
    AudioVAEConfig,
    CONFIG_VAE,
    init_vae_params,
    vae_config_tiny,
    vae_decode,
    vae_encode,
)


class ModDims(NamedTuple):
    """Per-transformer geometry (base/residual/enc/dit differ only here —
    the reference builds them all from one LMConfig, VoxCPM2TTS.swift:75-110)."""
    layers: int
    hidden: int
    heads: int
    kv_heads: int
    head_dim: int
    inter: int
    rope: bool


@dataclasses.dataclass(frozen=True)
class VoxCPM2Config:
    # base LM (MiniCPM4 — Configuration.swift:39-57)
    hidden_size: int = 2048
    num_layers: int = 28
    num_heads: int = 16
    num_kv_heads: int = 2
    head_dim: int = 128          # kv_channels
    intermediate_size: int = 6144
    vocab_size: int = 73448
    rope_theta: float = 1e4
    rms_norm_eps: float = 1e-5
    scale_emb: float = 12.0
    scale_depth: float = 1.4
    # residual LM (Configuration.swift:238-239)
    res_layers: int = 8
    # patching / latents (Configuration.swift:234-237)
    latent_dim: int = 64
    patch_size: int = 4
    fsq_latent: int = 512
    fsq_scale: int = 9
    # LocEnc / LocDiT (EncoderConfig/DiTConfig defaults)
    enc_hidden: int = 1024
    enc_layers: int = 12
    enc_heads: int = 16
    enc_inter: int = 4096
    dit_hidden: int = 1024
    dit_layers: int = 12
    dit_heads: int = 16
    #: per-tower head dims (the reference honors per-tower kv_channels;
    #: None = inherit the base LM's head_dim — the published default is a
    #: uniform 128)
    enc_head_dim: Optional[int] = None
    dit_head_dim: Optional[int] = None
    dit_inter: int = 4096
    cfm_steps: int = 10
    cfg_value: float = 2.0
    # AudioVAE
    vae: AudioVAEConfig = CONFIG_VAE
    max_tokens: int = 500
    min_tokens: int = 2
    # special ids (reference: VoxCPM2TTS.swift:1170-1232)
    audio_start_id: int = 103
    audio_end_id: int = 104
    text_end_id: int = 101

    @property
    def sample_rate(self) -> int:
        return self.vae.out_sample_rate

    @property
    def chunk_size(self) -> int:
        return self.vae.hop_length

    def dims(self, which: str) -> ModDims:
        if which == "base":
            return ModDims(self.num_layers, self.hidden_size, self.num_heads,
                           self.num_kv_heads, self.head_dim, self.intermediate_size, True)
        if which == "residual":
            return ModDims(self.res_layers, self.hidden_size, self.num_heads,
                           self.num_kv_heads, self.head_dim, self.intermediate_size, False)
        if which == "enc":
            return ModDims(self.enc_layers, self.enc_hidden, self.enc_heads,
                           self.enc_heads, self.enc_head_dim or self.head_dim,
                           self.enc_inter, True)
        if which == "dit":
            return ModDims(self.dit_layers, self.dit_hidden, self.dit_heads,
                           self.dit_heads, self.dit_head_dim or self.head_dim,
                           self.dit_inter, True)
        raise KeyError(which)


CONFIG_2B = VoxCPM2Config()


def config_tiny() -> VoxCPM2Config:
    return VoxCPM2Config(hidden_size=32, num_layers=2, num_heads=2, num_kv_heads=1,
                         head_dim=16, intermediate_size=64, vocab_size=300,
                         res_layers=1, latent_dim=8, patch_size=2, fsq_latent=8,
                         enc_hidden=16, enc_layers=1, enc_heads=2, enc_inter=32,
                         dit_hidden=16, dit_layers=1, dit_heads=2, dit_inter=32,
                         cfm_steps=2, vae=vae_config_tiny(), max_tokens=6)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _lm_init(key, dims: ModDims, dtype):
    layers = []
    for i in range(dims.layers):
        k = jax.random.split(jax.random.fold_in(key, i), 7)
        layers.append({
            "input_layernorm": {"weight": jnp.ones((dims.hidden,), dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((dims.hidden,), dtype)},
            "q_proj": init_linear(k[0], dims.hidden, dims.heads * dims.head_dim,
                                  bias=False, dtype=dtype),
            "k_proj": init_linear(k[1], dims.hidden, dims.kv_heads * dims.head_dim,
                                  bias=False, dtype=dtype),
            "v_proj": init_linear(k[2], dims.hidden, dims.kv_heads * dims.head_dim,
                                  bias=False, dtype=dtype),
            "o_proj": init_linear(k[3], dims.heads * dims.head_dim, dims.hidden,
                                  bias=False, dtype=dtype),
            "mlp": {"gate_proj": init_linear(k[4], dims.hidden, dims.inter, bias=False, dtype=dtype),
                    "up_proj": init_linear(k[5], dims.hidden, dims.inter, bias=False, dtype=dtype),
                    "down_proj": init_linear(k[6], dims.inter, dims.hidden, bias=False, dtype=dtype)},
        })
    return {"layers": layers, "norm": {"weight": jnp.ones((dims.hidden,), dtype)}}


def init_voxcpm2_params(key, cfg: VoxCPM2Config, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 24)
    h, d_lat = cfg.hidden_size, cfg.latent_dim
    base = _lm_init(ks[1], cfg.dims("base"), dtype)
    base["embed_tokens"] = (jax.random.normal(ks[0], (cfg.vocab_size, h)) * 0.02).astype(dtype)
    return {
        "base_lm": base,
        "residual_lm": _lm_init(ks[2], cfg.dims("residual"), dtype),
        "feat_encoder": {
            "special_token": jnp.zeros((cfg.enc_hidden,), dtype),
            "in_proj": init_linear(ks[3], d_lat, cfg.enc_hidden, dtype=dtype),
            "encoder": _lm_init(ks[4], cfg.dims("enc"), dtype),
        },
        "enc_to_lm_proj": init_linear(ks[6], cfg.enc_hidden, h, dtype=dtype),
        "fsq_layer": {"in_proj": init_linear(ks[7], h, cfg.fsq_latent, dtype=dtype),
                      "out_proj": init_linear(ks[8], cfg.fsq_latent, h, dtype=dtype)},
        "fusion_concat_proj": init_linear(ks[9], 2 * h, h, dtype=dtype),
        "lm_to_dit_proj": init_linear(ks[10], h, cfg.dit_hidden, dtype=dtype),
        "res_to_dit_proj": init_linear(ks[11], h, cfg.dit_hidden, dtype=dtype),
        "stop_proj": init_linear(ks[12], h, h, dtype=dtype),
        "stop_head": init_linear(ks[13], h, 2, bias=False, dtype=dtype),
        "feat_decoder": {"estimator": {
            "in_proj": init_linear(ks[14], d_lat, cfg.dit_hidden, dtype=dtype),
            "cond_proj": init_linear(ks[15], d_lat, cfg.dit_hidden, dtype=dtype),
            "out_proj": init_linear(ks[16], cfg.dit_hidden, d_lat, dtype=dtype),
            "time_mlp": {"linear_1": init_linear(ks[17], cfg.dit_hidden, 4 * cfg.dit_hidden, dtype=dtype),
                         "linear_2": init_linear(ks[18], 4 * cfg.dit_hidden, cfg.dit_hidden, dtype=dtype)},
            "delta_time_mlp": {"linear_1": init_linear(ks[19], cfg.dit_hidden, 4 * cfg.dit_hidden, dtype=dtype),
                               "linear_2": init_linear(ks[20], 4 * cfg.dit_hidden, cfg.dit_hidden, dtype=dtype)},
            "decoder": _lm_init(ks[21], cfg.dims("dit"), dtype),
        }},
        "audio_vae": init_vae_params(ks[22], cfg.vae, dtype=jnp.float32),
    }


# ---------------------------------------------------------------------------
# MiniCPM core
# ---------------------------------------------------------------------------

def _rope_cos_sin(lm, positions, dims: ModDims, cfg):
    """LongRoPE cos/sin [..., P, head_dim/2].  Factors/scaling come from the
    checkpoint when present (MiniCPM4.swift:36-92); with max==original
    position embeddings the scaling factor is 1 and factors default to 1."""
    half = dims.head_dim // 2
    inv = lm.get("rope_inv_freq")
    if inv is None:
        inv = jnp.asarray(1.0 / (cfg.rope_theta ** (np.arange(half) / half)), jnp.float32)
    scale = lm.get("rope_scale", 1.0)
    ang = positions.astype(jnp.float32)[..., None] * inv
    return jnp.cos(ang) * scale, jnp.sin(ang) * scale


def _apply_rope(x, cos, sin):
    half = x.shape[-1] // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1).astype(x.dtype)


def _minicpm_layer(p, x, cos_sin, mask, dims: ModDims, cfg, cache_layer=None,
                   decode=False, cursor=None):
    b, t, _ = x.shape
    hd = dims.head_dim
    res_scale = cfg.scale_depth / np.sqrt(dims.layers)
    h = rms_norm(x, p["input_layernorm"]["weight"], cfg.rms_norm_eps)
    q = linear(h, p["q_proj"]).reshape(b, t, dims.heads, hd).transpose(0, 2, 1, 3)
    k = linear(h, p["k_proj"]).reshape(b, t, dims.kv_heads, hd).transpose(0, 2, 1, 3)
    v = linear(h, p["v_proj"]).reshape(b, t, dims.kv_heads, hd).transpose(0, 2, 1, 3)
    if cos_sin is not None:
        cos, sin = cos_sin
        q = _apply_rope(q, cos[:, None], sin[:, None])
        k = _apply_rope(k, cos[:, None], sin[:, None])
    upd = None
    if cache_layer is not None:
        if decode:
            upd = write_token(cache_layer, k, v, cursor)
            a = sdpa(q, upd.k, upd.v, 1.0 / np.sqrt(hd), mask)
        else:
            upd = write_prompt(cache_layer, k, v)
            a = sdpa(q, k, v, 1.0 / np.sqrt(hd), mask)
    else:
        a = sdpa(q, k, v, 1.0 / np.sqrt(hd), mask)
    x = x + linear(a.transpose(0, 2, 1, 3).reshape(b, t, -1), p["o_proj"]) * res_scale
    h2 = rms_norm(x, p["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
    return x + swiglu_mlp(h2, p["mlp"]) * res_scale, upd


def _lm_forward(lm, x, positions, mask, cache, dims: ModDims, cfg, decode=False,
                cursor=None):
    """Causal cached forward for base/residual LMs."""
    cos_sin = _rope_cos_sin(lm, positions, dims, cfg) if dims.rope else None
    new_layers = []
    for li, p in enumerate(lm["layers"]):
        x, upd = _minicpm_layer(p, x, cos_sin, mask, dims, cfg,
                                cache.layers[li], decode, cursor)
        new_layers.append(upd)
    return rms_norm(x, lm["norm"]["weight"], cfg.rms_norm_eps), new_layers


def _bidir_forward(lm, x, dims: ModDims, cfg):
    """Non-causal cacheless forward (LocEnc / LocDiT decoders run with
    isCausal=false — MiniCPM4.swift:534, 645)."""
    b, t, _ = x.shape
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    cos_sin = _rope_cos_sin(lm, positions, dims, cfg) if dims.rope else None
    for p in lm["layers"]:
        x, _ = _minicpm_layer(p, x, cos_sin, None, dims, cfg)
    return rms_norm(x, lm["norm"]["weight"], cfg.rms_norm_eps)


# ---------------------------------------------------------------------------
# sub-modules
# ---------------------------------------------------------------------------

def loc_enc(p, cfg: VoxCPM2Config, patches):
    """patches [B, T, patch, latent] → patch embeddings [B, T, enc_hidden]
    (special-token readout — VoxCPMLocEnc, MiniCPM4.swift:505-540)."""
    b, t, ps, dl = patches.shape
    x = linear(patches.reshape(b * t, ps, dl), p["in_proj"])
    tok = jnp.broadcast_to(p["special_token"][None, None], (b * t, 1, x.shape[-1]))
    x = jnp.concatenate([tok, x], axis=1)
    x = _bidir_forward(p["encoder"], x, cfg.dims("enc"), cfg)
    return x[:, 0].reshape(b, t, -1)


def fsq(p, cfg: VoxCPM2Config, x):
    """Scalar quantization: in_proj → tanh → round to (2·scale+1) levels →
    out_proj (reference: ScalarQuantizationLayer, VoxCPM2TTS.swift:11-27)."""
    z = jnp.tanh(linear(x, p["in_proj"]).astype(jnp.float32))
    z = jnp.round(z * cfg.fsq_scale) / cfg.fsq_scale
    return linear(z.astype(x.dtype), p["out_proj"])


def _sinusoid(t, dim, scale=1000.0):
    """SinusoidalPosEmb (MiniCPM4.swift:568-584): concat(sin, cos) halves."""
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) / (half - 1) * jnp.arange(half))
    emb = scale * t.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], -1)


def _time_mlp(p, emb):
    return linear(jax.nn.silu(linear(emb, p["linear_1"])), p["linear_2"])


def dit_velocity(p, cfg: VoxCPM2Config, x, mu, cond, t, dt):
    """LocDiTV2 (MiniCPM4.swift:611-651).

    x, cond: [B, patch, latent]; mu [B, 2·dit_hidden]; t, dt [B].
    Token sequence: [mu tokens, time token, cond tokens, x tokens] through
    the bidirectional decoder; returns velocity [B, patch, latent]."""
    est = p["estimator"]
    b = x.shape[0]
    x_tok = linear(x, est["in_proj"])
    c_tok = linear(cond, est["cond_proj"])
    t_emb = _time_mlp(est["time_mlp"], _sinusoid(t, cfg.dit_hidden).astype(x_tok.dtype))
    dt_emb = _time_mlp(est["delta_time_mlp"], _sinusoid(dt, cfg.dit_hidden).astype(x_tok.dtype))
    time_tok = (t_emb + dt_emb)[:, None]
    mu_tok = mu.reshape(b, -1, cfg.dit_hidden)
    hidden = jnp.concatenate([mu_tok, time_tok, c_tok, x_tok], axis=1)
    decoded = _bidir_forward(est["decoder"], hidden, cfg.dims("dit"), cfg)
    trimmed = decoded[:, mu_tok.shape[1] + 1 + c_tok.shape[1]:]
    return linear(trimmed, est["out_proj"])


def cfm_time_span(n: int) -> np.ndarray:
    """Sway-shaped span (MiniCPM4.swift:152-166): linspace 1→0, then
    t + (cos(π/2·t) − 1 + t) with sway coefficient 1."""
    t = 1.0 - np.arange(n + 1) / n
    return (t + (np.cos(np.pi / 2 * t) - 1.0 + t)).astype(np.float32)


def cfm_sample(p, cfg: VoxCPM2Config, mu, cond, key):
    """Euler ODE noise→patch with CFG-Zero* (UnifiedCFM.solveEuler,
    MiniCPM4.swift:675-730): zero velocity on the first max(1, 4%) steps,
    then projected classifier-free guidance; Δt conditioning is zero in
    non-mean mode."""
    b = mu.shape[0]
    x = jax.random.normal(key, (b, cfg.patch_size, cfg.latent_dim), jnp.float32)
    n = cfg.cfm_steps
    t_span = jnp.asarray(cfm_time_span(n))
    zero_init = max(1, int(n * 0.04))

    def body(x, i):
        t = t_span[i]
        dt = t_span[i] - t_span[i + 1]
        x2 = jnp.concatenate([x, x], axis=0)
        mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
        cond2 = jnp.concatenate([cond, cond], axis=0)
        out = dit_velocity(p, cfg, x2.astype(mu.dtype), mu2, cond2,
                           jnp.full((2 * b,), t), jnp.zeros((2 * b,))).astype(jnp.float32)
        pos, neg = out[:b], out[b:]
        pf, nf = pos.reshape(b, -1), neg.reshape(b, -1)
        st = (jnp.sum(pf * nf, 1) / (jnp.sum(nf * nf, 1) + 1e-8)).reshape(b, 1, 1)
        dphi = neg * st + cfg.cfg_value * (pos - neg * st)
        dphi = jnp.where(i < zero_init, 0.0, dphi)
        return x - dt * dphi, None

    x, _ = jax.lax.scan(body, x, jnp.arange(n))
    return x


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

class VoxCPM2TTS(SpeechGenerationModel):
    def __init__(self, cfg: VoxCPM2Config, params, tokenizer=None, dtype=jnp.float32):
        from ...ops.quant import cast_tree

        self.cfg = cfg
        self.tokenizer = tokenizer
        params = dict(params)  # don't mutate the caller's tree
        vae_params = params.pop("audio_vae") if "audio_vae" in params else None
        self.params = cast_tree(params, dtype)
        if vae_params is not None:
            # the reference promotes the VAE to float32 after load
            # (AudioVAE.swift:691-696)
            self.params["audio_vae"] = cast_tree(vae_params, jnp.float32)
        self.dtype = dtype
        self._loaded = True
        d_base = cfg.dims("base")
        d_res = cfg.dims("residual")

        @functools.partial(jax.jit, static_argnames=("t_bucket", "max_tokens"))
        def _generate(p, ids, n_valid, ref_patches, n_ref, key, *, t_bucket, max_tokens):
            b = 1
            ref_cap = ref_patches.shape[0]
            total = t_bucket + ref_cap + 2  # [103] ref [104] text
            cache_b = init_cache(cfg.num_layers, b, cfg.num_kv_heads,
                                 total + max_tokens, cfg.head_dim, dtype)
            cache_r = init_cache(cfg.res_layers, b, cfg.num_kv_heads,
                                 total + max_tokens, cfg.head_dim, dtype)

            # prefix: [103] + ref zeros + [104] + text ids (reference splice)
            tok_ids = jnp.concatenate([
                jnp.asarray([cfg.audio_start_id], jnp.int32),
                jnp.zeros((ref_cap,), jnp.int32),
                jnp.asarray([cfg.audio_end_id], jnp.int32),
                ids,
            ])
            patches = jnp.concatenate([
                jnp.zeros((1, cfg.patch_size, cfg.latent_dim), jnp.float32),
                ref_patches,
                jnp.zeros((1, cfg.patch_size, cfg.latent_dim), jnp.float32),
                jnp.zeros((t_bucket, cfg.patch_size, cfg.latent_dim), jnp.float32),
            ])[None]
            idx = jnp.arange(total)
            text_mask = ((idx == 0) | (idx == ref_cap + 1)
                         | ((idx >= ref_cap + 2) & (idx < ref_cap + 2 + n_valid)))
            audio_mask = (idx >= 1) & (idx < 1 + n_ref)
            valid = text_mask | audio_mask

            feat_embed = linear(loc_enc(p["feat_encoder"], cfg, patches.astype(dtype)),
                                p["enc_to_lm_proj"])
            text_embed = jnp.take(p["base_lm"]["embed_tokens"], tok_ids,
                                  axis=0)[None] * cfg.scale_emb
            embeds = jnp.where(text_mask[None, :, None], text_embed,
                               jnp.where(audio_mask[None, :, None], feat_embed, 0.0))

            positions = (jnp.cumsum(valid.astype(jnp.int32)) - 1)[None] * valid[None]
            rows = jnp.arange(total)[None, :, None]
            cols = jnp.arange(total)[None, None, :]
            mask = jnp.where((cols <= rows) & valid[None, None, :], 0.0,
                             NEG_INF).astype(jnp.float32)[:, None]

            h_base, nl = _lm_forward(p["base_lm"], embeds, positions, mask,
                                     cache_b, d_base, cfg)
            cache_b = after_prefill(cache_b, nl, valid[None], total)
            enc_fsq = fsq(p["fsq_layer"], cfg, h_base)
            masked = jnp.where(audio_mask[None, :, None], enc_fsq, h_base)

            res_in = linear(jnp.concatenate(
                [masked, jnp.where(audio_mask[None, :, None], feat_embed, 0.0)], -1),
                p["fusion_concat_proj"])
            h_res, nl = _lm_forward(p["residual_lm"], res_in, positions, mask,
                                    cache_r, d_res, cfg)
            cache_r = after_prefill(cache_r, nl, valid[None], total)

            last = jnp.sum(valid.astype(jnp.int32)) - 1
            lm_hidden = masked[:, last]
            res_hidden = h_res[:, last]
            # initial CFM cond: last valid ref patch or zeros
            ref_last = jnp.where(n_ref > 0,
                                 jnp.clip(n_ref, 1, ref_cap),
                                 jnp.asarray(1, jnp.int32))
            prefix_cond = patches[0, ref_last].astype(jnp.float32)[None]

            out = jnp.zeros((max_tokens, cfg.patch_size, cfg.latent_dim), jnp.float32)

            def cond_fn(s):
                step, _, _, _, _, _, _, done, _ = s
                return (step < max_tokens) & ~done

            def body(s):
                step, out, cache_b, cache_r, lm_hidden, res_hidden, prefix_cond, done, key = s
                key, kd = jax.random.split(key)
                mu = jnp.concatenate([linear(lm_hidden, p["lm_to_dit_proj"]),
                                      linear(res_hidden, p["res_to_dit_proj"])], -1)
                patch = cfm_sample(p["feat_decoder"], cfg, mu, prefix_cond, kd)

                out = out.at[step].set(patch[0])

                stop_logits = linear(jax.nn.silu(linear(lm_hidden, p["stop_proj"])),
                                     p["stop_head"]).astype(jnp.float32)
                done = (step > cfg.min_tokens) & (jnp.argmax(stop_logits[0]) == 1)

                cur = linear(loc_enc(p["feat_encoder"], cfg, patch[:, None].astype(dtype)),
                             p["enc_to_lm_proj"])
                pos = cache_b.positions[:, None]
                written = jnp.arange(cache_b.max_len)[None, :] == cache_b.cursor
                m = jnp.where(cache_b.valid | written, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]
                hb, nl = _lm_forward(p["base_lm"], cur, pos, m, cache_b, d_base, cfg,
                                     True, cache_b.cursor)
                cache_b = after_token(cache_b, nl)
                lm_hidden = fsq(p["fsq_layer"], cfg, hb[:, 0])

                res_in = linear(jnp.concatenate([lm_hidden[:, None], cur], -1),
                                p["fusion_concat_proj"])
                hr, nl = _lm_forward(p["residual_lm"], res_in, pos, m, cache_r, d_res,
                                     cfg, True, cache_r.cursor)
                cache_r = after_token(cache_r, nl)
                res_hidden = hr[:, 0]
                return (step + 1, out, cache_b, cache_r, lm_hidden, res_hidden,
                        patch.astype(jnp.float32), done, key)

            state = (jnp.asarray(0, jnp.int32), out, cache_b, cache_r,
                     lm_hidden, res_hidden, prefix_cond, jnp.asarray(False), key)
            n_steps, out, *_ = jax.lax.while_loop(cond_fn, body, state)
            return out, n_steps

        self._generate = _generate
        self._vae_decode = jax.jit(functools.partial(vae_decode, cfg=cfg.vae))
        self._vae_encode = jax.jit(functools.partial(vae_encode, cfg=cfg.vae))

    # -- constructors ----------------------------------------------------

    @classmethod
    def init_random(cls, cfg: Optional[VoxCPM2Config] = None, seed: int = 0, **kw):
        cfg = cfg or config_tiny()
        return cls(cfg, init_voxcpm2_params(jax.random.PRNGKey(seed), cfg), **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "openbmb/VoxCPM2", cache_dir=None,
                        offline_mode: bool = False, dtype=jnp.bfloat16, **kw):
        from ...core.hub import download_weights
        from ...tokenizers.bpe import BPETokenizer
        from .convert import convert_checkpoint

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode)
        tokenizer = None
        try:
            tokenizer = BPETokenizer.from_pretrained_dir(model_dir)
        except FileNotFoundError:
            pass
        cfg, params = convert_checkpoint(model_dir)
        return cls(cfg, params, tokenizer=tokenizer, dtype=dtype, **kw)

    # -- API ----------------------------------------------------------------

    def encode_reference(self, audio: np.ndarray, sample_rate: int = 48000) -> np.ndarray:
        """Reference audio → patch latents [T, patch, latent] for cloning
        (reference: encodeAudio — resampled to the VAE's 16 kHz analysis
        rate, right-padded to patch multiples)."""
        from ...audio.resample import resample

        cfg = self.cfg
        if sample_rate != cfg.vae.sample_rate:
            audio = resample(np.asarray(audio, np.float32), sample_rate, cfg.vae.sample_rate)
        patch_len = cfg.patch_size * cfg.chunk_size
        if len(audio) % patch_len:
            audio = np.pad(audio, (0, patch_len - len(audio) % patch_len))
        lat = np.asarray(self._vae_encode(self.params["audio_vae"],
                                          wave=jnp.asarray(audio, jnp.float32)[None]))[0]
        t = len(lat) // cfg.patch_size
        return lat[: t * cfg.patch_size].reshape(t, cfg.patch_size, cfg.latent_dim)

    def synthesize(self, text: str, voice: Optional[np.ndarray] = None,
                   instruct: Optional[str] = None, max_tokens: Optional[int] = None,
                   seed: int = 0, **kwargs) -> AudioChunk:
        """voice: raw reference audio at 48 kHz (cloning); instruct: voice-
        design instruction prepended to the text (reference: instruct path)."""
        cfg = self.cfg
        full_text = f"{instruct} {text}" if instruct else text
        ids = (self.tokenizer.encode(full_text) if self.tokenizer
               else [5 + (ord(c) % 90) for c in full_text])[:256]
        ids.append(cfg.text_end_id % cfg.vocab_size)
        n = len(ids)
        bucket = max(16, ((n + 15) // 16) * 16)
        arr = np.zeros(bucket, np.int32)
        arr[:n] = ids

        if voice is not None and len(voice):
            ref = self.encode_reference(np.asarray(voice, np.float32))[:32]
        else:
            ref = np.zeros((0, cfg.patch_size, cfg.latent_dim), np.float32)
        ref_cap = 32
        ref_pad = np.zeros((ref_cap, cfg.patch_size, cfg.latent_dim), np.float32)
        ref_pad[: len(ref)] = ref

        patches, n_steps = self._generate(
            self.params, jnp.asarray(arr), jnp.asarray(n, jnp.int32),
            jnp.asarray(ref_pad), jnp.asarray(len(ref), jnp.int32),
            jax.random.PRNGKey(seed), t_bucket=bucket,
            max_tokens=max_tokens or cfg.max_tokens)
        n_steps = int(n_steps)
        if n_steps == 0:
            return AudioChunk(np.zeros(0, np.float32), cfg.sample_rate)
        lat = np.asarray(patches[:n_steps]).reshape(-1, cfg.latent_dim)
        wav = self._vae_decode(self.params["audio_vae"], latents=jnp.asarray(lat)[None])
        return AudioChunk(np.asarray(wav[0], np.float32), cfg.sample_rate)

    def warm_up(self):
        self.synthesize("hi", max_tokens=2)

    def unload(self):
        self.params = None
        self._loaded = False

    @property
    def is_loaded(self):
        return self._loaded

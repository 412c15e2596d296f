"""VoxCPM2 studio TTS: dual MiniCPM4 LMs + FSQ bottleneck + patch-level
conditional-flow-matching DiT + AudioVAE, 48 kHz.

TPU-native analog of the reference's VoxCPM2TTS module (reference:
Sources/VoxCPM2TTS/VoxCPM2TTS.swift:29-1450, MiniCPM4.swift:1-760,
AudioVAE.swift). Architecture mirrored:

- **AudioVAE**: strided causal conv encoder wave→latents (latent_dim per
  ``chunk_size`` samples) and transpose-conv decoder back to 48 kHz
  (reference: AudioVAE.swift; encodeAudio pads to patch multiples —
  VoxCPM2TTS.swift:1040-1073).
- **LocEnc**: per-patch transformer with a learned special token; the
  special-token output embeds a patch of ``patch_size`` latents
  (reference: VoxCPMLocEnc, VoxCPM2TTS.swift:94-95).
- **base_lm / residual_lm**: MiniCPM4 transformers with µP scaling
  (scale_emb on embeddings, scale_depth/√L on residuals — reference:
  MiniCPM4.swift:346-390) over text+audio-patch embeddings; the base
  LM's audio positions pass through an **FSQ scalar-quantization layer**
  (in_proj → round to a (2·scale+1)-level grid → out_proj — reference:
  ScalarQuantizationLayer, VoxCPM2TTS.swift:15-27).
- **UnifiedCFM / LocDiT**: per-step the concatenated [base, residual]
  hidden conditions a patch DiT; Euler ODE with **CFG-Zero***: the first
  ~4% steps take zero velocity, and guidance projects the positive
  branch onto the negative one (reference: MiniCPM4.swift:675-730).
- **stop head**: 2-class linear over silu(stop_proj(h)) checked each
  step (reference: VoxCPM2TTS.swift:1394-1399).
- Voice cloning: reference audio is VAE-encoded and spliced into the
  prefix between tokens 103/104 with complementary text/audio masks
  (reference: VoxCPM2TTS.swift:1160-1260).

TPU shape: prefill + the whole AR loop (CFM scan nested inside a
``lax.while_loop`` with static KV caches) is ONE jitted program; the VAE
decode is a second. maxTokens is a static bucket.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core import AudioChunk, SpeechGenerationModel
from ...ops.attention import NEG_INF, sdpa
from ...ops.kv_cache import after_prefill, after_token, init_cache, write_prompt, write_token
from ...ops.nn import init_linear, linear, rms_norm, swiglu_mlp
from ...ops.rope import apply_rope, rope_angles
from ..qwen3_tts.codec import _conv_init, causal_transpose_conv1d


@dataclasses.dataclass(frozen=True)
class VoxCPM2Config:
    # base LM (MiniCPM4-ish)
    hidden_size: int = 2048
    num_layers: int = 24
    num_heads: int = 16
    num_kv_heads: int = 2
    head_dim: int = 128
    intermediate_size: int = 6144
    vocab_size: int = 73448
    rope_theta: float = 1e5
    rms_norm_eps: float = 1e-6
    scale_emb: float = 12.0
    scale_depth: float = 1.4
    # residual LM
    res_layers: int = 6
    # patching / latents
    latent_dim: int = 64
    patch_size: int = 2
    fsq_latent: int = 64
    fsq_scale: int = 9
    # LocEnc / DiT
    enc_hidden: int = 512
    enc_layers: int = 4
    enc_heads: int = 8
    dit_hidden: int = 512
    dit_layers: int = 6
    dit_heads: int = 8
    cfm_steps: int = 10
    cfg_value: float = 2.0
    # AudioVAE
    vae_strides: tuple = (16, 20)   # chunk_size = 320 samples / latent @48k
    sample_rate: int = 48000
    max_tokens: int = 500
    # special ids (reference: VoxCPM2TTS.swift:1170-1232)
    audio_start_id: int = 103
    audio_end_id: int = 104
    text_end_id: int = 101

    @property
    def chunk_size(self) -> int:
        return int(np.prod(self.vae_strides))


CONFIG_2B = VoxCPM2Config()


def config_tiny() -> VoxCPM2Config:
    return VoxCPM2Config(hidden_size=32, num_layers=2, num_heads=2, num_kv_heads=1,
                         head_dim=16, intermediate_size=64, vocab_size=300,
                         res_layers=1, latent_dim=8, patch_size=2, fsq_latent=8,
                         enc_hidden=16, enc_layers=1, enc_heads=2, dit_hidden=16,
                         dit_layers=1, dit_heads=2, cfm_steps=2,
                         vae_strides=(4, 8), max_tokens=6)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _lm_layers_init(key, n_layers, h, inter, n_heads, n_kv, hd, dtype):
    layers = []
    for i in range(n_layers):
        k = jax.random.split(jax.random.fold_in(key, i), 7)
        layers.append({
            "input_layernorm": {"weight": jnp.ones((h,), dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((h,), dtype)},
            "q_proj": init_linear(k[0], h, n_heads * hd, bias=False, dtype=dtype),
            "k_proj": init_linear(k[1], h, n_kv * hd, bias=False, dtype=dtype),
            "v_proj": init_linear(k[2], h, n_kv * hd, bias=False, dtype=dtype),
            "o_proj": init_linear(k[3], n_heads * hd, h, bias=False, dtype=dtype),
            "mlp": {
                "gate_proj": init_linear(k[4], h, inter, bias=False, dtype=dtype),
                "up_proj": init_linear(k[5], h, inter, bias=False, dtype=dtype),
                "down_proj": init_linear(k[6], inter, h, bias=False, dtype=dtype),
            },
        })
    return layers


def _block_init(key, d, heads, dtype):
    k = jax.random.split(key, 6)
    return {
        "ln1": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "q": init_linear(k[0], d, d, dtype=dtype), "k": init_linear(k[1], d, d, dtype=dtype),
        "v": init_linear(k[2], d, d, dtype=dtype), "o": init_linear(k[3], d, d, dtype=dtype),
        "ln2": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "ff1": init_linear(k[4], d, 4 * d, dtype=dtype),
        "ff2": init_linear(k[5], 4 * d, d, dtype=dtype),
    }


def init_voxcpm2_params(key, cfg: VoxCPM2Config, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 24)
    h, d_lat = cfg.hidden_size, cfg.latent_dim
    return {
        "embed_tokens": (jax.random.normal(ks[0], (cfg.vocab_size, h)) * 0.02).astype(dtype),
        "base_lm": {"layers": _lm_layers_init(ks[1], cfg.num_layers, h, cfg.intermediate_size,
                                              cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, dtype),
                    "norm": {"weight": jnp.ones((h,), dtype)}},
        "residual_lm": {"layers": _lm_layers_init(ks[2], cfg.res_layers, h, cfg.intermediate_size,
                                                  cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, dtype),
                        "norm": {"weight": jnp.ones((h,), dtype)}},
        "feat_encoder": {
            "in_proj": init_linear(ks[3], d_lat, cfg.enc_hidden, dtype=dtype),
            "special_token": (jax.random.normal(ks[4], (cfg.enc_hidden,)) * 0.02).astype(dtype),
            "blocks": [_block_init(jax.random.fold_in(ks[5], i), cfg.enc_hidden, cfg.enc_heads, dtype)
                       for i in range(cfg.enc_layers)],
        },
        "enc_to_lm_proj": init_linear(ks[6], cfg.enc_hidden, h, dtype=dtype),
        "fsq": {"in_proj": init_linear(ks[7], h, cfg.fsq_latent, dtype=dtype),
                "out_proj": init_linear(ks[8], cfg.fsq_latent, h, dtype=dtype)},
        "fusion_concat_proj": init_linear(ks[9], 2 * h, h, dtype=dtype),
        "lm_to_dit_proj": init_linear(ks[10], h, cfg.dit_hidden, dtype=dtype),
        "res_to_dit_proj": init_linear(ks[11], h, cfg.dit_hidden, dtype=dtype),
        "stop_proj": init_linear(ks[12], h, h, dtype=dtype),
        "stop_head": init_linear(ks[13], h, 2, bias=False, dtype=dtype),
        "dit": {
            "in_proj": init_linear(ks[14], d_lat, cfg.dit_hidden, dtype=dtype),
            "cond_proj": init_linear(ks[15], d_lat, cfg.dit_hidden, dtype=dtype),
            "mu_proj": init_linear(ks[16], 2 * cfg.dit_hidden, cfg.dit_hidden, dtype=dtype),
            "time_mlp": {"w1": init_linear(ks[17], cfg.dit_hidden, cfg.dit_hidden, dtype=dtype),
                         "w2": init_linear(ks[18], cfg.dit_hidden, cfg.dit_hidden, dtype=dtype)},
            "blocks": [_block_init(jax.random.fold_in(ks[19], i), cfg.dit_hidden, cfg.dit_heads, dtype)
                       for i in range(cfg.dit_layers)],
            "out_proj": init_linear(ks[20], cfg.dit_hidden, d_lat, dtype=dtype),
        },
        "audio_vae": {
            "enc1": _conv_init(ks[21], cfg.vae_strides[0] * 2, 1, 32, dtype=dtype),
            "enc2": _conv_init(ks[22], cfg.vae_strides[1] * 2, 32, d_lat, dtype=dtype),
            "dec1": _conv_init(ks[23], cfg.vae_strides[1] * 2, d_lat, 32, dtype=dtype),
            "dec2": _conv_init(jax.random.fold_in(ks[23], 1), cfg.vae_strides[0] * 2, 32, 1, dtype=dtype),
        },
    }


# ---------------------------------------------------------------------------
# sub-modules
# ---------------------------------------------------------------------------

def vae_encode(p, cfg: VoxCPM2Config, wave):
    """wave [B, S] → latents [B, S/chunk, latent_dim] (strided causal convs)."""
    x = wave[:, :, None]
    x = jax.nn.gelu(_strided_conv(x, p["enc1"], cfg.vae_strides[0]))
    return _strided_conv(x, p["enc2"], cfg.vae_strides[1])


def _strided_conv(x, p, stride):
    k = p["kernel"].shape[0]
    x = jnp.pad(x, ((0, 0), (k - stride, 0), (0, 0)))
    return jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(stride,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + p.get("bias", 0)


def vae_decode(p, cfg: VoxCPM2Config, latents):
    """latents [B, T, latent_dim] → wave [B, T*chunk]."""
    h = jax.nn.gelu(causal_transpose_conv1d(latents, p["dec1"], cfg.vae_strides[1]))
    return jnp.tanh(causal_transpose_conv1d(h, p["dec2"], cfg.vae_strides[0]))[..., 0]


def _transformer(blocks, x, heads, mask=None):
    from ...ops.nn import layer_norm

    b, t, d = x.shape
    hd = d // heads
    for p in blocks:
        h = layer_norm(x, p["ln1"]["weight"], p["ln1"]["bias"])
        q = linear(h, p["q"]).reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
        k = linear(h, p["k"]).reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
        v = linear(h, p["v"]).reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
        a = sdpa(q, k, v, 1.0 / np.sqrt(hd), mask)
        x = x + linear(a.transpose(0, 2, 1, 3).reshape(b, t, d), p["o"])
        h2 = layer_norm(x, p["ln2"]["weight"], p["ln2"]["bias"])
        x = x + linear(jax.nn.gelu(linear(h2, p["ff1"])), p["ff2"])
    return x


def loc_enc(p, cfg: VoxCPM2Config, patches):
    """patches [B, T, patch, latent] → patch embeddings [B, T, enc_hidden]
    (special-token readout)."""
    b, t, ps, dl = patches.shape
    x = linear(patches.reshape(b * t, ps, dl), p["in_proj"])
    tok = jnp.broadcast_to(p["special_token"][None, None], (b * t, 1, x.shape[-1]))
    x = jnp.concatenate([tok, x], axis=1)
    x = _transformer(p["blocks"], x, cfg.enc_heads)
    return x[:, 0].reshape(b, t, -1)


def fsq(p, cfg: VoxCPM2Config, x):
    """Scalar quantization: in_proj → round to (2·scale+1) levels → out_proj
    (reference: ScalarQuantizationLayer)."""
    z = jnp.tanh(linear(x, p["in_proj"]).astype(jnp.float32))
    z = jnp.round(z * cfg.fsq_scale) / cfg.fsq_scale
    return linear(z.astype(x.dtype), p["out_proj"])


def _minicpm_layer(p, x, positions, mask, cache_layer, cfg, decode, cursor=None):
    b, t, _ = x.shape
    hd = cfg.head_dim
    res_scale = cfg.scale_depth / np.sqrt(cfg.num_layers)
    h = rms_norm(x, p["input_layernorm"]["weight"], cfg.rms_norm_eps)
    q = linear(h, p["q_proj"]).reshape(b, t, cfg.num_heads, hd)
    k = linear(h, p["k_proj"]).reshape(b, t, cfg.num_kv_heads, hd)
    v = linear(h, p["v_proj"]).reshape(b, t, cfg.num_kv_heads, hd)
    cos, sin = rope_angles(positions, hd, cfg.rope_theta)
    cos, sin = cos[:, None], sin[:, None]
    q = apply_rope(q.transpose(0, 2, 1, 3), cos, sin)
    k = apply_rope(k.transpose(0, 2, 1, 3), cos, sin)
    v = v.transpose(0, 2, 1, 3)
    if decode:
        upd = write_token(cache_layer, k, v, cursor)
        a = sdpa(q, upd.k, upd.v, 1.0 / np.sqrt(hd), mask)
    else:
        upd = write_prompt(cache_layer, k, v)
        a = sdpa(q, k, v, 1.0 / np.sqrt(hd), mask)
    x = x + linear(a.transpose(0, 2, 1, 3).reshape(b, t, -1), p["o_proj"]) * res_scale
    h2 = rms_norm(x, p["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
    return x + swiglu_mlp(h2, p["mlp"]) * res_scale, upd


def _lm_forward(lm, x, positions, mask, cache, cfg, decode, cursor=None):
    new_layers = []
    for li, p in enumerate(lm["layers"]):
        x, upd = _minicpm_layer(p, x, positions, mask, cache.layers[li], cfg, decode, cursor)
        new_layers.append(upd)
    return rms_norm(x, lm["norm"]["weight"], cfg.rms_norm_eps), new_layers


def _time_embed(p, t, d):
    """Sinusoid(t) → MLP (reference: timeMlp)."""
    half = d // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / half)
    emb = jnp.concatenate([jnp.sin(t[..., None] * freqs), jnp.cos(t[..., None] * freqs)], -1)
    return linear(jax.nn.silu(linear(emb, p["w1"])), p["w2"])


def dit_velocity(p, cfg: VoxCPM2Config, x, mu, cond, t):
    """x [B, patch, latent] noisy; mu [B, 2*dit_hidden]; cond [B, patch,
    latent] previous patch; t [B]. Returns velocity [B, patch, latent]."""
    h = linear(x, p["in_proj"]) + linear(cond, p["cond_proj"])
    h = h + linear(mu, p["mu_proj"])[:, None]
    h = h + _time_embed(p["time_mlp"], t.astype(jnp.float32), cfg.dit_hidden)[:, None].astype(h.dtype)
    h = _transformer(p["blocks"], h, cfg.dit_heads)
    return linear(h, p["out_proj"])


def cfm_sample(p, cfg: VoxCPM2Config, mu, cond, key):
    """Euler ODE noise→patch with CFG-Zero* (reference:
    UnifiedCFM.solveEuler — zero velocity on the first ~4% of steps, then
    projected classifier-free guidance)."""
    b = mu.shape[0]
    x = jax.random.normal(key, (b, cfg.patch_size, cfg.latent_dim), jnp.float32)
    n = cfg.cfm_steps
    t_span = 1.0 - jnp.arange(n + 1, dtype=jnp.float32) / n  # 1 → 0
    zero_init = max(1, int(n * 0.04))

    def body(x, i):
        t = t_span[i]
        dt = t_span[i] - t_span[i + 1]
        x2 = jnp.concatenate([x, x], axis=0)
        mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
        cond2 = jnp.concatenate([cond, cond], axis=0)
        out = dit_velocity(p, cfg, x2.astype(mu.dtype), mu2, cond2,
                           jnp.full((2 * b,), t)).astype(jnp.float32)
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
        self.params = cast_tree(params, dtype)
        self.dtype = dtype
        self._loaded = True

        @functools.partial(jax.jit, static_argnames=("t_bucket", "max_tokens"))
        def _generate(p, ids, n_valid, ref_patches, n_ref, key, *, t_bucket, max_tokens):
            b = 1
            h_dim = cfg.hidden_size
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
            text_embed = jnp.take(p["embed_tokens"], tok_ids, axis=0)[None] * cfg.scale_emb
            embeds = jnp.where(text_mask[None, :, None], text_embed,
                               jnp.where(audio_mask[None, :, None], feat_embed, 0.0))

            positions = (jnp.cumsum(valid.astype(jnp.int32)) - 1)[None] * valid[None]
            rows = jnp.arange(total)[None, :, None]
            cols = jnp.arange(total)[None, None, :]
            mask = jnp.where((cols <= rows) & valid[None, None, :], 0.0,
                             NEG_INF).astype(jnp.float32)[:, None]

            h_base, nl = _lm_forward(p["base_lm"], embeds, positions, mask, cache_b, cfg, False)
            cache_b = after_prefill(cache_b, nl, valid[None], total)
            enc_fsq = fsq(p["fsq"], cfg, h_base)
            masked = jnp.where(audio_mask[None, :, None], enc_fsq, h_base)

            res_in = linear(jnp.concatenate(
                [masked, jnp.where(audio_mask[None, :, None], feat_embed, 0.0)], -1),
                p["fusion_concat_proj"])
            rcfg = dataclasses.replace(cfg, num_layers=cfg.res_layers)
            h_res, nl = _lm_forward(p["residual_lm"], res_in, positions, mask, cache_r, rcfg, False)
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
                patch = cfm_sample(p["dit"], cfg, mu, prefix_cond, kd)  # [1, ps, lat]
                out = out.at[step].set(patch[0])

                stop_logits = linear(jax.nn.silu(linear(lm_hidden, p["stop_proj"])),
                                     p["stop_head"]).astype(jnp.float32)
                done = (step > 1) & (jnp.argmax(stop_logits[0]) == 1)

                cur = linear(loc_enc(p["feat_encoder"], cfg, patch[:, None].astype(dtype)),
                             p["enc_to_lm_proj"])
                pos = cache_b.positions[:, None]
                written = jnp.arange(cache_b.max_len)[None, :] == cache_b.cursor
                m = jnp.where(cache_b.valid | written, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]
                hb, nl = _lm_forward(p["base_lm"], cur, pos, m, cache_b, cfg, True, cache_b.cursor)
                cache_b = after_token(cache_b, nl)
                lm_hidden = fsq(p["fsq"], cfg, hb[:, 0])

                res_in = linear(jnp.concatenate([lm_hidden[:, None], cur], -1),
                                p["fusion_concat_proj"])
                hr, nl = _lm_forward(p["residual_lm"], res_in, pos, m, cache_r, rcfg, True,
                                     cache_r.cursor)
                cache_r = after_token(cache_r, nl)
                res_hidden = hr[:, 0]
                return (step + 1, out, cache_b, cache_r, lm_hidden, res_hidden,
                        patch.astype(jnp.float32), done, key)

            state = (jnp.asarray(0, jnp.int32), out, cache_b, cache_r,
                     lm_hidden, res_hidden, prefix_cond, jnp.asarray(False), key)
            n_steps, out, *_ = jax.lax.while_loop(cond_fn, body, state)
            return out, n_steps

        self._generate = _generate
        self._vae_decode = jax.jit(functools.partial(vae_decode, cfg=cfg))
        self._vae_encode = jax.jit(functools.partial(vae_encode, cfg=cfg))

    # -- constructors ----------------------------------------------------

    @classmethod
    def init_random(cls, cfg: Optional[VoxCPM2Config] = None, seed: int = 0, **kw):
        cfg = cfg or config_tiny()
        return cls(cfg, init_voxcpm2_params(jax.random.PRNGKey(seed), cfg), **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "openbmb/VoxCPM2", cache_dir=None,
                        offline_mode: bool = False, dtype=jnp.bfloat16, **kw):
        from ...core.hub import download_weights
        from ...core.weights import load_safetensors, unflatten
        from ...tokenizers.bpe import BPETokenizer

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode)
        tokenizer = None
        try:
            tokenizer = BPETokenizer.from_pretrained_dir(model_dir)
        except FileNotFoundError:
            pass
        return cls(CONFIG_2B, unflatten(load_safetensors(model_dir)),
                   tokenizer=tokenizer, dtype=dtype, **kw)

    # -- API ----------------------------------------------------------------

    def encode_reference(self, audio: np.ndarray, sample_rate: int = 48000) -> np.ndarray:
        """Reference audio → patch latents [T, patch, latent] for cloning
        (reference: encodeAudio, right-padded to patch multiples)."""
        from ...audio.resample import resample

        cfg = self.cfg
        if sample_rate != cfg.sample_rate:
            audio = resample(np.asarray(audio, np.float32), sample_rate, cfg.sample_rate)
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

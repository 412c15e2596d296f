"""VibeVoice diffusion head + DPM-Solver++ (2M) sampler.

The per-frame latent sampler: a 4-layer AdaLN-modulated SwiGLU head
(hidden 896, latent 64, ffn ratio 3) conditioned on the LM hidden state +
sinusoidal timestep embedding, driven by a v-prediction DPM-Solver++
multistep scheduler (cosine ᾱ schedule, 1000 train steps) with
classifier-free guidance.

Reference: Sources/VibeVoiceTTS/Models/DiffusionHead.swift:64-229,
Inference/DPMSolver.swift:31-356, Layers/TimestepEmbedder.swift.

TPU shape: the whole K-step solve is a ``lax.scan`` whose per-step
α/σ/λ coefficients are precomputed host-side (they depend only on the
step count) — zero data-dependent control flow, so the sampler fuses into
the surrounding generation while-loop.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.nn import init_linear, linear, rms_norm


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    hidden_size: int = 896
    latent_size: int = 64
    head_layers: int = 4
    head_ffn_ratio: float = 3.0
    rms_norm_eps: float = 1e-5
    ddpm_num_steps: int = 1000
    ddpm_num_inference_steps: int = 20
    freq_embed_size: int = 256
    cfg_scale: float = 1.5

    @property
    def ffn_dim(self) -> int:
        return int(self.hidden_size * self.head_ffn_ratio)


def diffusion_config_tiny() -> DiffusionConfig:
    return DiffusionConfig(hidden_size=16, latent_size=8, head_layers=2,
                           ddpm_num_steps=50, ddpm_num_inference_steps=4,
                           freq_embed_size=8)


def init_diffusion_params(key, cfg: DiffusionConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 6 + cfg.head_layers)
    h = cfg.hidden_size
    p = {
        "noisy_proj": init_linear(ks[0], cfg.latent_size, h, bias=False, dtype=dtype),
        "cond_proj": init_linear(ks[1], h, h, bias=False, dtype=dtype),
        "t_mlp1": init_linear(ks[2], cfg.freq_embed_size, h, bias=False, dtype=dtype),
        "t_mlp2": init_linear(ks[3], h, h, bias=False, dtype=dtype),
        "final_ada": init_linear(ks[4], h, 2 * h, bias=False, dtype=dtype),
        "final_norm": {"weight": jnp.ones((h,), dtype)},
        "final_linear": init_linear(ks[5], h, cfg.latent_size, bias=False, dtype=dtype),
        "layers": [],
    }
    for i in range(cfg.head_layers):
        k = jax.random.split(jax.random.fold_in(key, 100 + i), 5)
        p["layers"].append({
            "ada": init_linear(k[0], h, 3 * h, bias=False, dtype=dtype),
            "norm": {"weight": jnp.ones((h,), dtype)},
            "gate_proj": init_linear(k[1], h, cfg.ffn_dim, bias=False, dtype=dtype),
            "up_proj": init_linear(k[2], h, cfg.ffn_dim, bias=False, dtype=dtype),
            "down_proj": init_linear(k[3], cfg.ffn_dim, h, bias=False, dtype=dtype),
        })
    return p


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """[B] → [B, dim]; cos‖sin order (reference: TimestepEmbedder.swift)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def diffusion_head(p, cfg: DiffusionConfig, noisy, t, condition):
    """noisy [B, latent], t [B] (train-step indices), condition [B, hidden]
    → v-prediction [B, latent] (reference: DiffusionHead.swift:211-228)."""
    x = linear(noisy, p["noisy_proj"])
    t_emb = linear(jax.nn.silu(linear(
        timestep_embedding(t, cfg.freq_embed_size), p["t_mlp1"])), p["t_mlp2"])
    c = linear(condition, p["cond_proj"]) + t_emb
    c_act = jax.nn.silu(c)
    for lp in p["layers"]:
        mod = linear(c_act, lp["ada"])
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        h = rms_norm(x, lp["norm"]["weight"], cfg.rms_norm_eps)
        h = h * (1 + scale) + shift
        h = linear(jax.nn.silu(linear(h, lp["gate_proj"])) * linear(h, lp["up_proj"]),
                   lp["down_proj"])
        x = x + gate * h
    mod = linear(c_act, p["final_ada"])
    shift, scale = jnp.split(mod, 2, axis=-1)
    h = rms_norm(x, p["final_norm"]["weight"], cfg.rms_norm_eps)
    return linear(h * (1 + scale) + shift, p["final_linear"])


def _alphas_cumprod(num_steps: int) -> np.ndarray:
    """Cosine ᾱ schedule via betas_for_alpha_bar
    (reference: DPMSolver.swift:31-57)."""
    t = np.arange(num_steps + 1) / num_steps
    alpha_bar = np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
    betas = np.minimum(1 - alpha_bar[1:] / alpha_bar[:-1], 0.999)
    return np.cumprod(1.0 - betas)


def solver_coefficients(cfg: DiffusionConfig, num_inference_steps: int = None):
    """Precompute per-step (timestep, α_t, σ_t, λ) tables for the K+1 grid
    (reference: DPMSolver.swift:140-181). Returns numpy arrays."""
    k = num_inference_steps or cfg.ddpm_num_inference_steps
    n = cfg.ddpm_num_steps
    acp = _alphas_cumprod(n)
    timesteps = np.array([int(round((n - 1) * (1.0 - i / k))) for i in range(k)])
    alpha_t_train = np.sqrt(acp)
    sigmas = np.sqrt((1 - alpha_t_train[timesteps] ** 2) / (alpha_t_train[timesteps] ** 2))
    alpha_t = 1.0 / np.sqrt(sigmas ** 2 + 1.0)
    sigma_t = sigmas * alpha_t
    lam = np.log(alpha_t) - np.log(sigma_t)
    # append the final (σ=0) grid point
    alpha_t = np.append(alpha_t, 1.0)
    sigma_t = np.append(sigma_t, 0.0)
    lam = np.append(lam, np.inf)
    return timesteps.astype(np.int32), alpha_t.astype(np.float64), \
        sigma_t.astype(np.float64), lam.astype(np.float64)


def dpm_solve(p, cfg: DiffusionConfig, condition, key, neg_condition=None,
              num_inference_steps: int = None, cfg_scale: float = None):
    """Sample a latent [B, latent_size] by DPM-Solver++ 2M with
    v-prediction and CFG (reference: DPMSolver.swift:205-248 stepGPU).

    The per-step scalar coefficients are Python floats → the K-step loop
    unrolls into one fused XLA region.
    """
    k_steps = num_inference_steps or cfg.ddpm_num_inference_steps
    scale = cfg.cfg_scale if cfg_scale is None else cfg_scale
    timesteps, alpha_t, sigma_t, lam = solver_coefficients(cfg, k_steps)
    b = condition.shape[0]
    x = jax.random.normal(key, (b, cfg.latent_size), jnp.float32)

    use_cfg = neg_condition is not None and scale != 1.0
    if use_cfg:
        cond_in = jnp.concatenate([condition, neg_condition], axis=0)

    prev_x0 = jnp.zeros_like(x)
    for i in range(k_steps):
        t_vec = jnp.full((b,), int(timesteps[i]), jnp.float32)
        if use_cfg:
            out = diffusion_head(p, cfg, jnp.concatenate([x, x], axis=0),
                                 jnp.concatenate([t_vec, t_vec], axis=0), cond_in)
            eps_c, eps_u = out[:b], out[b:]
            model_out = eps_u + scale * (eps_c - eps_u)
        else:
            model_out = diffusion_head(p, cfg, x, t_vec, condition)
        model_out = model_out.astype(jnp.float32)
        # v-prediction → x0
        a_s, s_s = float(alpha_t[i]), float(sigma_t[i])
        x0 = a_s * x - s_s * model_out
        a_next, s_next = float(alpha_t[i + 1]), float(sigma_t[i + 1])
        h = float(lam[i + 1] - lam[i])
        lower_order_final = (i == k_steps - 1)
        if (not lower_order_final) and i > 0:
            h0 = float(lam[i] - lam[i - 1])
            r0 = h0 / h
            d1 = (x0 - prev_x0) / r0
            sigma_ratio = s_next / s_s
            x = (sigma_ratio * x - a_next * (np.exp(-h) - 1.0) * x0
                 - 0.5 * a_next * (np.exp(-h) - 1.0) * d1)
        else:
            if s_s == 0.0 or not np.isfinite(h):
                x = x0
            else:
                sigma_ratio = s_next / s_s
                x = sigma_ratio * x - a_next * (np.exp(-h) - 1.0) * x0
        prev_x0 = x0
    return x

"""CosyVoice3 flow-matching DiT — the published topology.

22-layer AdaLN-Zero diffusion transformer (dim 1024, 16 heads × 64,
ff_mult 2) with a causal grouped-conv position embedding, RoPE applied to
the first ``dim_head`` features of the flat Q/K (i.e. head 0 only — the
x_transformers convention), classifier-free-guidance Euler ODE with a
cosine timestep schedule, and the token encoder (FSQ embedding →
pre-lookahead causal convs → ×2 repeat-interleave to mel rate).

Reference: Sources/CosyVoiceTTS/DiT.swift (AdaLayerNormZero :66-124,
DiTAttention :130-190, ConvPositionEmbedding :280-319, DiT :384-480),
FlowMatching.swift (ConditionalFlowMatching :41-192, PreLookaheadLayer
:199-222, CosyVoiceFlowModel :236-372). Upstream checkpoint key names are
documented in WeightLoading.swift:112-212 and handled by convert.py.

TPU shape: the whole ODE is a ``lax.scan`` over 10 steps of one jitted
doubled-batch DiT forward — the reference's per-step ``compile`` +
``eval`` loop collapses into a single XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import sdpa
from ...ops.nn import init_linear, linear


@dataclasses.dataclass(frozen=True)
class CosyDiTConfig:
    dim: int = 1024
    depth: int = 22
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 2
    mel_dim: int = 80
    mu_dim: int = 80
    spk_dim: int = 80            # projected speaker dim fed to the DiT
    freq_embed_dim: int = 256
    conv_pos_kernel: int = 31
    conv_pos_groups: Optional[int] = None  # default dim // 64
    rope_base: float = 10000.0

    @property
    def inner_dim(self) -> int:
        return self.heads * self.dim_head

    @property
    def pos_groups(self) -> int:
        return self.conv_pos_groups or max(1, self.dim // 64)


@dataclasses.dataclass(frozen=True)
class CosyFlowConfig:
    vocab_size: int = 6561       # FSQ codes
    output_size: int = 80        # mel dim
    spk_embed_dim: int = 192     # raw CAM++ x-vector
    token_mel_ratio: int = 2     # 25 Hz tokens → 50 Hz mel
    pre_lookahead_hidden: int = 1024
    n_timesteps: int = 10
    cfg_rate: float = 0.7
    dit: CosyDiTConfig = dataclasses.field(default_factory=CosyDiTConfig)


def flow_config_tiny() -> CosyFlowConfig:
    return CosyFlowConfig(
        vocab_size=40, output_size=16, spk_embed_dim=8, pre_lookahead_hidden=32,
        n_timesteps=2,
        dit=CosyDiTConfig(dim=64, depth=2, heads=2, dim_head=16, ff_mult=2,
                          mel_dim=16, mu_dim=16, spk_dim=16, freq_embed_dim=16,
                          conv_pos_kernel=7, conv_pos_groups=2),
    )


# -- init ----------------------------------------------------------------------

def _conv_init(key, width, cin, cout, dtype=jnp.float32):
    scale = 1.0 / np.sqrt(width * cin)
    return {
        "kernel": (jax.random.normal(key, (width, cin, cout)) * scale).astype(dtype),
        "bias": jnp.zeros((cout,), dtype),
    }


def init_dit_params(key, cfg: CosyDiTConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8 + cfg.depth)
    d, inner = cfg.dim, cfg.inner_dim
    in_dim = cfg.mel_dim * 2 + cfg.mu_dim + cfg.spk_dim
    p = {
        "time_mlp1": init_linear(ks[0], cfg.freq_embed_dim, d, dtype=dtype),
        "time_mlp2": init_linear(ks[1], d, d, dtype=dtype),
        "input_proj": init_linear(ks[2], in_dim, d, dtype=dtype),
        "conv_pos1": _conv_init(ks[3], cfg.conv_pos_kernel, d // cfg.pos_groups, d, dtype),
        "conv_pos2": _conv_init(ks[4], cfg.conv_pos_kernel, d // cfg.pos_groups, d, dtype),
        "norm_out_linear": init_linear(ks[5], d, d * 2, dtype=dtype),
        "proj_out": init_linear(ks[6], d, cfg.mel_dim, dtype=dtype),
        "blocks": [],
    }
    for i in range(cfg.depth):
        k = jax.random.split(ks[8 + i], 7)
        p["blocks"].append({
            "ada_linear": init_linear(k[0], d, d * 6, dtype=dtype),
            "to_q": init_linear(k[1], d, inner, dtype=dtype),
            "to_k": init_linear(k[2], d, inner, dtype=dtype),
            "to_v": init_linear(k[3], d, inner, dtype=dtype),
            "to_out": init_linear(k[4], inner, d, dtype=dtype),
            "ff1": init_linear(k[5], d, d * cfg.ff_mult, dtype=dtype),
            "ff2": init_linear(k[6], d * cfg.ff_mult, d, dtype=dtype),
        })
    return p


def init_flow_params(key, cfg: CosyFlowConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 5)
    return {
        "input_embedding": (jax.random.normal(ks[0], (cfg.vocab_size, cfg.output_size))
                            * 0.02).astype(dtype),
        "spk_affine": init_linear(ks[1], cfg.spk_embed_dim, cfg.output_size, dtype=dtype),
        "pre_lookahead": {
            "conv1": _conv_init(ks[2], 4, cfg.output_size, cfg.pre_lookahead_hidden, dtype),
            "conv2": _conv_init(ks[3], 3, cfg.pre_lookahead_hidden, cfg.output_size, dtype),
        },
        "dit": init_dit_params(ks[4], cfg.dit, dtype),
    }


# -- building blocks -------------------------------------------------------------

def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _layer_norm_nonaffine(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def timestep_embedding(t, p, freq_dim: int):
    """t: [B] in [0,1] → [B, dim]. Sinusoid (scale 1000) → linear → SiLU →
    linear (reference: DiT.swift:11-57)."""
    half = freq_dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-np.log(10000.0) / (half - 1)))
    angles = 1000.0 * t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)
    return linear(jax.nn.silu(linear(emb, p["time_mlp1"])), p["time_mlp2"])


def _rope_interleaved(x, dim_head: int, base: float):
    """Rotate the FIRST dim_head features of x [B, T, inner] with
    traditional (interleaved-pair) RoPE — after the head reshape this
    touches head 0 only (reference: DiT.swift:159-173, 405-409)."""
    b, t, inner = x.shape
    rot, rest = x[..., :dim_head], x[..., dim_head:]
    half = dim_head // 2
    inv = base ** (-jnp.arange(half, dtype=jnp.float32) / half)
    ang = jnp.arange(t, dtype=jnp.float32)[:, None] * inv[None, :]   # [T, half]
    cos, sin = jnp.cos(ang)[None], jnp.sin(ang)[None]                # [1, T, half]
    pairs = rot.astype(jnp.float32).reshape(b, t, half, 2)
    even, odd = pairs[..., 0], pairs[..., 1]
    r_even = even * cos - odd * sin
    r_odd = even * sin + odd * cos
    rot_out = jnp.stack([r_even, r_odd], axis=-1).reshape(b, t, dim_head).astype(x.dtype)
    return jnp.concatenate([rot_out, rest], axis=-1)


def conv_pos_embed(x, p, cfg: CosyDiTConfig):
    """Two causal grouped convs + Mish, NO internal residual
    (reference: DiT.swift:280-319)."""
    from ..qwen3_tts.codec import causal_conv1d

    h = _mish(causal_conv1d(x, p["conv_pos1"], groups=cfg.pos_groups))
    return _mish(causal_conv1d(h, p["conv_pos2"], groups=cfg.pos_groups))


def dit_block(x, bp, t_emb, mask, cfg: CosyDiTConfig):
    """x: [B,T,D], t_emb: [B,D], mask additive [B,1,1,T]."""
    mod = linear(jax.nn.silu(t_emb), bp["ada_linear"])
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)
    h = _layer_norm_nonaffine(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]

    b, t, _ = x.shape
    q = _rope_interleaved(linear(h, bp["to_q"]), cfg.dim_head, cfg.rope_base)
    k = _rope_interleaved(linear(h, bp["to_k"]), cfg.dim_head, cfg.rope_base)
    v = linear(h, bp["to_v"])
    q = q.reshape(b, t, cfg.heads, cfg.dim_head).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, cfg.heads, cfg.dim_head).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, cfg.heads, cfg.dim_head).transpose(0, 2, 1, 3)
    a = sdpa(q, k, v, 1.0 / np.sqrt(cfg.dim_head), mask)
    attn = linear(a.transpose(0, 2, 1, 3).reshape(b, t, -1), bp["to_out"])
    x = x + gate_msa[:, None] * attn

    h2 = _layer_norm_nonaffine(x) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
    ff = linear(jax.nn.gelu(linear(h2, bp["ff1"]), approximate=True), bp["ff2"])
    return x + gate_mlp[:, None] * ff


def dit_forward(p, cfg: CosyDiTConfig, x, mu, t, spks=None, cond=None, seq_mask=None):
    """Predict velocity. All time-major [B, T, C] (the reference transposes
    NCL↔NLC at its edges; we stay NLC throughout).

    x/mu/cond: [B, T, mel]; t: [B]; spks: [B, spk_dim] or None;
    seq_mask: [B, T] bool or None. Returns [B, T, mel].
    """
    b, t_len, _ = x.shape
    if cond is None:
        cond = jnp.zeros_like(x)
    if spks is None:
        spks_exp = jnp.zeros((b, t_len, cfg.spk_dim), x.dtype)
    else:
        spks_exp = jnp.broadcast_to(spks[:, None, :], (b, t_len, cfg.spk_dim)).astype(x.dtype)

    t_emb = timestep_embedding(t, p, cfg.freq_embed_dim).astype(x.dtype)

    h = linear(jnp.concatenate([x, cond, mu, spks_exp], axis=-1), p["input_proj"])
    h = conv_pos_embed(h, p, cfg) + h

    if seq_mask is not None:
        attn_mask = jnp.where(seq_mask[:, None, None, :], 0.0, -1e9).astype(jnp.float32)
    else:
        attn_mask = None
    for bp in p["blocks"]:
        h = dit_block(h, bp, t_emb, attn_mask, cfg)

    mod = linear(jax.nn.silu(t_emb), p["norm_out_linear"])
    scale, shift = jnp.split(mod, 2, axis=-1)
    h = _layer_norm_nonaffine(h) * (1 + scale[:, None]) + shift[:, None]
    return linear(h, p["proj_out"])


# -- token encoder + CFM solver ----------------------------------------------

def encode_mu(p, cfg: CosyFlowConfig, tokens):
    """tokens [B, T] → mu [B, T*ratio, mel]: embed → pre-lookahead convs
    (conv1 k=4 right-pad lookahead, ReLU, conv2 k=3 causal) →
    repeat-interleave ×ratio (reference: FlowMatching.swift:199-222,288-316)."""
    from ..qwen3_tts.codec import causal_conv1d

    mu = jnp.take(p["input_embedding"], tokens, axis=0)          # [B, T, mel]
    # conv1: right-padding (look-ahead) — pad the END of time
    k1 = p["pre_lookahead"]["conv1"]["kernel"].shape[0]
    h = jnp.pad(mu, ((0, 0), (0, k1 - 1), (0, 0)))
    h = jax.lax.conv_general_dilated(
        h, p["pre_lookahead"]["conv1"]["kernel"], (1,), ((0, 0),),
        dimension_numbers=("NHC", "HIO", "NHC"), preferred_element_type=jnp.float32)
    h = (h + p["pre_lookahead"]["conv1"]["bias"].astype(jnp.float32)).astype(mu.dtype)
    h = jax.nn.relu(h)
    mu = causal_conv1d(h, p["pre_lookahead"]["conv2"])
    b, t, c = mu.shape
    return jnp.repeat(mu, cfg.token_mel_ratio, axis=1)


def project_speaker(p, spk_embedding):
    """L2-normalize the raw x-vector then affine 192→80
    (reference: FlowMatching.swift:327-331)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(spk_embedding), axis=-1, keepdims=True)) + 1e-8
    return linear(spk_embedding / norm, p["spk_affine"])


def solve_flow(p, cfg: CosyFlowConfig, mu, key, spks=None, cond=None,
               temperature: float = 1.0, n_timesteps: Optional[int] = None):
    """Euler CFM with CFG batch-doubling and cosine t-schedule
    (reference: FlowMatching.swift:107-191). mu: [B, T, mel] →
    mel [B, T, mel]. The whole solve is one lax.scan."""
    steps = n_timesteps or cfg.n_timesteps
    b = mu.shape[0]
    x0 = jax.random.normal(key, mu.shape, jnp.float32).astype(mu.dtype) * temperature

    ts = 1.0 - jnp.cos(jnp.linspace(0.0, 1.0, steps + 1) * 0.5 * jnp.pi)
    t_starts, dts = ts[:-1], ts[1:] - ts[:-1]

    mu_in = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks_in = None if spks is None else jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond_in = None if cond is None else jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)

    def body(x, t_dt):
        t, dt = t_dt
        x_in = jnp.concatenate([x, x], axis=0)
        t_in = jnp.full((2 * b,), t, jnp.float32)
        v = dit_forward(p["dit"], cfg.dit, x_in, mu_in, t_in, spks_in, cond_in)
        v_cond, v_uncond = v[:b], v[b:]
        v_cfg = (1.0 + cfg.cfg_rate) * v_cond - cfg.cfg_rate * v_uncond
        return x + dt.astype(x.dtype) * v_cfg.astype(x.dtype), None

    x, _ = jax.lax.scan(body, x0, (t_starts, dts))
    return x


def flow_generate(p, cfg: CosyFlowConfig, tokens, key, spk_embedding=None,
                  prompt_tokens=None, prompt_feat=None, temperature: float = 1.0):
    """Full flow stage: [B, T] speech tokens (+ optional cloning prompt)
    → [B, T_mel, mel]. prompt_feat [B, T_prompt*ratio, mel] fills the cond
    slot frame-aligned (reference: FlowMatching.swift:288-371). The caller
    slices off the first prompt-mel frames."""
    if prompt_tokens is not None:
        tokens = jnp.concatenate([prompt_tokens, tokens], axis=1)
    mu = encode_mu(p, cfg, tokens)
    spks = None if spk_embedding is None else project_speaker(p, spk_embedding).astype(mu.dtype)
    cond = None
    if prompt_feat is not None:
        pad = mu.shape[1] - prompt_feat.shape[1]
        cond = jnp.pad(prompt_feat, ((0, 0), (0, pad), (0, 0))).astype(mu.dtype)
    return solve_flow(p, cfg, mu, key, spks=spks, cond=cond, temperature=temperature)

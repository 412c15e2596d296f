"""Qwen3.5 hybrid chat LLM: DeltaNet linear attention + gated full attention.

TPU-native re-design of the reference chat module
(reference: Sources/Qwen3Chat/Qwen35Model.swift:28-520,
Qwen35PipelineLLM.swift): most layers use the gated delta rule (O(1)
recurrent state [B, H, Dk, Dv] — ideal for TPU decode: no KV growth),
every ``full_attention_interval``-th layer is gated full attention
(8 q-heads × 256, 2 kv-heads, partial RoPE over the first 64 dims,
sigmoid output gate), SwiGLU MLPs, tied embeddings.

DeltaNet recurrence (reference lines 171-199):
    S ← g·S;  Δ = (v − S·k)·β;  S ← S + k⊗Δ;  y = S·q
with g = exp(−exp(A_log)·softplus(a + dt_bias)), β = sigmoid(b),
q/k L2-normalized with 1/√D scalings, a depthwise causal conv (k=4) + SiLU
on the fused QKV stream, and RMSNorm-gated output ``norm(y)·silu(z)``.

Prefill runs the recurrence as ``lax.scan`` over time; decode is a single
recurrence step — the whole generate loop lives in ``lax.while_loop``.
Implements the PipelineLLM protocol for the voice agent.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import PipelineLLM
from ...ops.attention import NEG_INF, sdpa
from ...ops.nn import embedding_lookup, init_linear, linear, rms_norm, swiglu_mlp, tied_lm_head
from ...ops.rope import apply_rope, rope_angles


@dataclasses.dataclass(frozen=True)
class ChatConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    # full attention
    num_heads: int = 8
    num_kv_heads: int = 2
    head_dim: int = 256
    partial_rotary_factor: float = 0.25
    rope_theta: float = 1e6
    # DeltaNet
    linear_num_heads: int = 16
    linear_head_dim: int = 128
    conv_kernel: int = 4
    full_attention_interval: int = 4
    intermediate_size: int = 3072
    vocab_size: int = 151936
    rms_norm_eps: float = 1e-6
    eos_token_id: int = 151645

    def layer_type(self, i: int) -> str:
        return "full" if (i + 1) % self.full_attention_interval == 0 else "linear"


@dataclasses.dataclass(frozen=True)
class ChatSamplingConfig:
    """Chat sampling knobs, reference defaults and presets
    (reference: Qwen3ChatConfig.swift:121-146 ChatSamplingConfig;
    sampler semantics ChatSampler.swift:17-106 — repetition penalty over
    the last 64 prompt+generated tokens, temperature<=0 = greedy, then
    temperature → top-k → nucleus top-p → categorical sample)."""

    temperature: float = 0.7
    top_k: int = 50
    top_p: float = 0.9
    max_tokens: int = 256
    repetition_penalty: float = 1.1

    #: history window of the repetition penalty (ChatSampler.swift:26)
    REP_WINDOW = 64

    @classmethod
    def creative(cls) -> "ChatSamplingConfig":
        return cls(temperature=0.9, top_p=0.95)

    @classmethod
    def precise(cls) -> "ChatSamplingConfig":
        return cls(temperature=0.3, top_k=20, top_p=0.8)


def chat_sample(logits, key, scfg: ChatSamplingConfig, history):
    """On-device ChatSampler.sample: logits [B, V], history [B, W] int32
    (out-of-range/negative = empty slot) → int32 [B]. Filter order matches
    the reference; top-k/top-p renormalizations are rank-preserving, so
    Gumbel-max over the masked, temperature-scaled logits samples the same
    distribution."""
    from ...ops.sampling import (apply_repetition_penalty, apply_top_k,
                                 apply_top_p)

    lg = logits.astype(jnp.float32)
    if scfg.repetition_penalty > 1.0:
        safe = jnp.where(history < 0, lg.shape[-1], history)
        lg = apply_repetition_penalty(lg, safe, safe.shape[-1],
                                      scfg.repetition_penalty)
    if scfg.temperature <= 0:
        return jnp.argmax(lg, axis=-1).astype(jnp.int32)
    # temperature scales BEFORE the filters: the nucleus set is defined on
    # the temperature-scaled distribution (ChatSampler.swift:52-95)
    lg = lg / scfg.temperature
    lg = apply_top_k(lg, scfg.top_k)
    lg = apply_top_p(lg, scfg.top_p)
    g = jax.random.gumbel(key, lg.shape, dtype=jnp.float32)
    return jnp.argmax(lg + g, axis=-1).astype(jnp.int32)


CONFIG_08B = ChatConfig()


def config_tiny(vocab: int = 256) -> ChatConfig:
    return ChatConfig(
        hidden_size=32, num_layers=4, num_heads=2, num_kv_heads=1, head_dim=16,
        linear_num_heads=2, linear_head_dim=16, intermediate_size=64,
        vocab_size=vocab, eos_token_id=vocab - 1,
    )


def init_chat_params(key, cfg: ChatConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 2 + cfg.num_layers)
    h = cfg.hidden_size
    params = {
        "embed_tokens": (jax.random.normal(ks[0], (cfg.vocab_size, h)) * 0.02).astype(dtype),
        "norm": {"weight": jnp.ones((h,), dtype)},
        "layers": [],
    }
    for i in range(cfg.num_layers):
        k = jax.random.split(ks[2 + i], 9)
        layer = {
            "input_layernorm": {"weight": jnp.ones((h,), dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((h,), dtype)},
            "mlp": {
                "gate_proj": init_linear(k[0], h, cfg.intermediate_size, bias=False, dtype=dtype),
                "up_proj": init_linear(k[1], h, cfg.intermediate_size, bias=False, dtype=dtype),
                "down_proj": init_linear(k[2], cfg.intermediate_size, h, bias=False, dtype=dtype),
            },
        }
        if cfg.layer_type(i) == "linear":
            nh, hd = cfg.linear_num_heads, cfg.linear_head_dim
            qkv = 3 * nh * hd
            layer["deltanet"] = {
                "in_proj_qkv": init_linear(k[3], h, qkv, bias=False, dtype=dtype),
                "in_proj_z": init_linear(k[4], h, nh * hd, bias=False, dtype=dtype),
                "in_proj_b": init_linear(k[5], h, nh, bias=False, dtype=dtype),
                "in_proj_a": init_linear(k[6], h, nh, bias=False, dtype=dtype),
                "conv_weight": (jax.random.normal(k[7], (qkv, cfg.conv_kernel)) * 0.2).astype(dtype),
                "dt_bias": jnp.zeros((nh,), dtype),
                "A_log": jnp.zeros((nh,), dtype),
                "norm": {"weight": jnp.ones((hd,), dtype)},
                "out_proj": init_linear(k[8], nh * hd, h, bias=False, dtype=dtype),
            }
        else:
            qd = cfg.num_heads * cfg.head_dim
            layer["attn"] = {
                "q_proj": init_linear(k[3], h, 2 * qd, bias=False, dtype=dtype),  # Q + gate
                "k_proj": init_linear(k[4], h, cfg.num_kv_heads * cfg.head_dim, bias=False, dtype=dtype),
                "v_proj": init_linear(k[5], h, cfg.num_kv_heads * cfg.head_dim, bias=False, dtype=dtype),
                "o_proj": init_linear(k[6], qd, h, bias=False, dtype=dtype),
                "q_norm": {"weight": jnp.ones((cfg.head_dim,), dtype)},
                "k_norm": {"weight": jnp.ones((cfg.head_dim,), dtype)},
            }
        params["layers"].append(layer)
    return params


# -- DeltaNet ----------------------------------------------------------------

def _l2_norm(x, eps=1e-6):
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)


def deltanet_forward(p, x, cfg: ChatConfig, state, valid=None):
    """x: [B, T, H]; state: (S [B,Hh,Dv,Dk], conv [B, C, K-1]);
    valid: [B, T] bool — invalid (pad) steps are identity on the recurrent
    state (g=1, β=0) and contribute zeros to the conv ring, so left-padded
    prompts leave the state exactly as the unpadded prompt would.
    Returns (out [B, T, H], new_state)."""
    b, t, _ = x.shape
    nh, hd = cfg.linear_num_heads, cfg.linear_head_dim
    kdim = nh * hd

    qkv = linear(x, p["in_proj_qkv"])        # [B, T, 3*kdim]
    z = linear(x, p["in_proj_z"])            # [B, T, kdim]
    b_raw = linear(x, p["in_proj_b"])        # [B, T, nh]
    a_raw = linear(x, p["in_proj_a"])        # [B, T, nh]

    s_prev, conv_prev = state
    if valid is not None:
        qkv = jnp.where(valid[..., None], qkv, 0.0)
    # depthwise causal conv over time on the qkv stream
    kk = cfg.conv_kernel
    qkv_t = qkv.transpose(0, 2, 1)           # [B, C, T]
    padded = jnp.concatenate([conv_prev, qkv_t], axis=2)  # [B, C, T+K-1]
    new_conv = padded[:, :, -(kk - 1):]
    w = p["conv_weight"]                     # [C, K]
    conv_out = sum(padded[:, :, i : i + t] * w[None, :, i : i + 1] for i in range(kk))
    qkv_act = jax.nn.silu(conv_out.transpose(0, 2, 1))  # [B, T, 3*kdim]

    q = qkv_act[..., :kdim].reshape(b, t, nh, hd)
    k = qkv_act[..., kdim : 2 * kdim].reshape(b, t, nh, hd)
    v = qkv_act[..., 2 * kdim :].reshape(b, t, nh, hd)
    inv = 1.0 / np.sqrt(hd)
    q = (inv * inv) * _l2_norm(q)
    k = inv * _l2_norm(k)

    dt = jax.nn.softplus(a_raw.astype(jnp.float32) + p["dt_bias"].astype(jnp.float32))
    g = jnp.exp(-jnp.exp(p["A_log"].astype(jnp.float32)) * dt)  # [B, T, nh]
    beta = jax.nn.sigmoid(b_raw.astype(jnp.float32))
    if valid is not None:
        vf = valid[..., None].astype(jnp.float32)
        g = g * vf + (1.0 - vf)      # invalid: no decay
        beta = beta * vf             # invalid: no update

    def step(s, inputs):
        qs, ks, vs, gs, bs = inputs  # [B, nh, hd] ×3, [B, nh] ×2
        s = s * gs[..., None, None]
        kv_mem = jnp.einsum("bhvk,bhk->bhv", s, ks)
        delta = (vs - kv_mem) * bs[..., None]
        s = s + jnp.einsum("bhk,bhv->bhvk", ks, delta)
        y = jnp.einsum("bhvk,bhk->bhv", s, qs)
        return s, y

    seq = (
        q.transpose(1, 0, 2, 3).astype(jnp.float32),
        k.transpose(1, 0, 2, 3).astype(jnp.float32),
        v.transpose(1, 0, 2, 3).astype(jnp.float32),
        g.transpose(1, 0, 2),
        beta.transpose(1, 0, 2),
    )
    s_new, ys = jax.lax.scan(step, s_prev.astype(jnp.float32), seq)
    y = ys.transpose(1, 0, 2, 3).astype(x.dtype)  # [B, T, nh, hd]

    z_heads = z.reshape(b, t, nh, hd)
    gated = rms_norm(y, p["norm"]["weight"], cfg.rms_norm_eps) * jax.nn.silu(z_heads)
    out = linear(gated.reshape(b, t, kdim), p["out_proj"])
    return out, (s_new.astype(x.dtype), new_conv)


def init_deltanet_state(cfg: ChatConfig, batch: int, dtype=jnp.float32):
    nh, hd = cfg.linear_num_heads, cfg.linear_head_dim
    return (
        jnp.zeros((batch, nh, hd, hd), dtype),
        jnp.zeros((batch, 3 * nh * hd, cfg.conv_kernel - 1), dtype),
    )


# -- Gated full attention -----------------------------------------------------

def gated_attention_forward(p, x, cfg: ChatConfig, kv_state, positions, valid=None):
    """kv_state: (k_cache [B,Hkv,L,D], v_cache, key_valid [B, L], length).
    Returns (out, new_kv_state)."""
    b, t, _ = x.shape
    hd = cfg.head_dim
    rope_dims = int(hd * cfg.partial_rotary_factor)

    qg = linear(x, p["q_proj"]).reshape(b, t, cfg.num_heads, 2 * hd)
    q, gate = qg[..., :hd], qg[..., hd:]  # interleaved per head
    k = linear(x, p["k_proj"]).reshape(b, t, cfg.num_kv_heads, hd)
    v = linear(x, p["v_proj"]).reshape(b, t, cfg.num_kv_heads, hd)
    q = rms_norm(q, p["q_norm"]["weight"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
    k = rms_norm(k, p["k_norm"]["weight"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    cos, sin = rope_angles(positions, rope_dims, cfg.rope_theta)
    cos, sin = cos[:, None], sin[:, None]
    q = jnp.concatenate([apply_rope(q[..., :rope_dims], cos, sin), q[..., rope_dims:]], axis=-1)
    k = jnp.concatenate([apply_rope(k[..., :rope_dims], cos, sin), k[..., rope_dims:]], axis=-1)

    k_cache, v_cache, key_valid, length = kv_state
    k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k.astype(k_cache.dtype), length, axis=2)
    v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v.astype(v_cache.dtype), length, axis=2)
    step_valid = valid if valid is not None else jnp.ones((b, t), bool)
    key_valid = jax.lax.dynamic_update_slice_in_dim(key_valid, step_valid, length, axis=1)
    total = length + t
    lmax = k_cache.shape[2]
    cols = jnp.arange(lmax)[None, None, None, :]
    # causal by write order: key j visible to query i (at write row length+i)
    rows = (length + jnp.arange(t))[None, None, :, None]
    mask = jnp.where((cols <= rows) & key_valid[:, None, None, :], 0.0, NEG_INF).astype(jnp.float32)
    attn = sdpa(q, k_cache, v_cache, 1.0 / np.sqrt(hd), mask)
    attn = attn * jax.nn.sigmoid(gate.transpose(0, 2, 1, 3))
    out = linear(attn.transpose(0, 2, 1, 3).reshape(b, t, -1), p["o_proj"])
    return out, (k_cache, v_cache, key_valid, total)


# -- full model ---------------------------------------------------------------

def chat_forward(params, cfg: ChatConfig, token_ids, states, positions, valid=None):
    """token_ids: [B, T]; states: list per layer (deltanet tuple or kv tuple).
    Returns (logits [B, T, V], new_states)."""
    x = embedding_lookup(params["embed_tokens"], token_ids, cfg.hidden_size)
    new_states = []
    for i, p in enumerate(params["layers"]):
        h = rms_norm(x, p["input_layernorm"]["weight"], cfg.rms_norm_eps)
        if cfg.layer_type(i) == "linear":
            out, st = deltanet_forward(p["deltanet"], h, cfg, states[i], valid)
        else:
            out, st = gated_attention_forward(p["attn"], h, cfg, states[i], positions, valid)
        new_states.append(st)
        x = x + out
        h2 = rms_norm(x, p["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
        x = x + swiglu_mlp(h2, p["mlp"])
    x = rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps)
    return tied_lm_head(x, params["embed_tokens"]), new_states


def init_states(cfg: ChatConfig, batch: int, max_len: int, dtype=jnp.float32):
    states = []
    for i in range(cfg.num_layers):
        if cfg.layer_type(i) == "linear":
            states.append(init_deltanet_state(cfg, batch, dtype))
        else:
            states.append((
                jnp.zeros((batch, cfg.num_kv_heads, max_len, cfg.head_dim), dtype),
                jnp.zeros((batch, cfg.num_kv_heads, max_len, cfg.head_dim), dtype),
                jnp.zeros((batch, max_len), bool),
                jnp.zeros((), jnp.int32),
            ))
    return states


class Qwen3Chat(PipelineLLM):
    """Chat LLM with streaming generation (PipelineLLM for the voice agent)."""

    def __init__(self, cfg: ChatConfig, params, tokenizer=None, dtype=jnp.float32):
        from ...ops.quant import cast_tree

        self.cfg = cfg
        self.tokenizer = tokenizer
        self.params = cast_tree(params, dtype)
        self.dtype = dtype

        @functools.partial(jax.jit,
                           static_argnames=("t_bucket", "max_new", "max_len", "sampling"))
        def _gen_start(p, ids, n_valid, key, *, t_bucket, max_new, max_len,
                       sampling: Optional[ChatSamplingConfig] = None):
            """Prefill + first token. ids are LEFT-padded: the prompt
            occupies the last n_valid slots. ``sampling`` None = greedy;
            a ChatSamplingConfig runs the reference sampler on device
            with a prompt+generated history ring for the repetition
            penalty. Returns the resumable decode state consumed by
            ``_gen_chunk``."""
            b = ids.shape[0]
            states = init_states(cfg, b, max_len, dtype)
            pad = t_bucket - n_valid  # [B]
            valid = jnp.arange(t_bucket)[None] >= pad[:, None]
            positions = jnp.maximum(jnp.arange(t_bucket)[None] - pad[:, None], 0)
            logits, states = chat_forward(p, cfg, ids, states, positions, valid)
            last = logits[:, -1]
            # penalty history seeds from the prompt tail (the reference
            # passes promptTokens + generatedTokens, MLXGenerator.swift:230)
            W = ChatSamplingConfig.REP_WINDOW
            w = min(W, t_bucket)
            hist = jnp.where(valid[:, -w:], ids[:, -w:], -1)
            if w < W:
                hist = jnp.concatenate(
                    [jnp.full((b, W - w), -1, jnp.int32), hist], axis=1)
            if sampling is None:
                tok = jnp.argmax(last, axis=-1).astype(jnp.int32)
            else:
                key, k0 = jax.random.split(key)
                tok = chat_sample(last, k0, sampling, hist)
            hist = jnp.concatenate([hist[:, 1:], tok[:, None]], axis=1)
            out = jnp.full((b, max_new), cfg.eos_token_id, jnp.int32).at[:, 0].set(tok)
            done = tok == cfg.eos_token_id
            return (jnp.asarray(1, jnp.int32), out, states, done, tok, hist, key)

        @functools.partial(jax.jit, donate_argnums=(1,), static_argnames=("sampling",))
        def _gen_chunk(p, s, n_valid, end,
                       sampling: Optional[ChatSamplingConfig] = None):
            """Decode up to step ``end`` (dynamic) and return the carried
            state — the resumable-decode chunk, same design as the ASR
            path: per-chunk host fetch gives true token streaming and
            cross-chunk EOS early-exit; a chunk dispatched after all rows
            hit EOS exits its while_loop immediately."""

            def cond(s):
                step, _, _, done, _, _, _ = s
                return (step < end) & ~jnp.all(done)

            def body(s):
                step, out, states, done, tok, hist, key = s
                # position = true prompt length + generated so far
                pos = (n_valid + step - 1)[:, None]
                logits, states = chat_forward(p, cfg, tok[:, None], states, pos)
                if sampling is None:
                    tok = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                else:
                    key, kk = jax.random.split(key)
                    tok = chat_sample(logits[:, 0], kk, sampling, hist)
                tok = jnp.where(done, cfg.eos_token_id, tok)
                # finished rows stop accumulating history
                hist = jnp.where(done[:, None], hist,
                                 jnp.concatenate([hist[:, 1:], tok[:, None]], axis=1))
                out = out.at[:, step].set(tok)
                done = done | (tok == cfg.eos_token_id)
                return step + 1, out, states, done, tok, hist, key

            return jax.lax.while_loop(cond, body, s)

        def _generate(p, ids, n_valid, key, *, t_bucket, max_new, max_len,
                      sampling=None):
            s = _gen_start(p, ids, n_valid, key, t_bucket=t_bucket,
                           max_new=max_new, max_len=max_len, sampling=sampling)
            s = _gen_chunk(p, s, n_valid, jnp.asarray(max_new, jnp.int32),
                           sampling=sampling)
            return s[1]

        self._gen_start = _gen_start
        self._gen_chunk = _gen_chunk
        self._generate = _generate

    @classmethod
    def init_random(cls, cfg: Optional[ChatConfig] = None, seed: int = 0,
                    quant_bits: Optional[int] = None, **kw) -> "Qwen3Chat":
        """quant_bits packs eligible linears/embeddings into the MLX
        group-64 format (the reference ships INT4 MLX and INT8 CoreML
        chat paths — Sources/Qwen3Chat)."""
        cfg = cfg or CONFIG_08B
        params = init_chat_params(jax.random.PRNGKey(seed), cfg)
        if quant_bits:
            from ...ops.quant import quantize_tree

            params = quantize_tree(params, quant_bits)
        return cls(cfg, params, **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "Qwen/Qwen3.5-0.8B", cache_dir=None,
                        offline_mode: bool = False, dtype=jnp.bfloat16, **kw) -> "Qwen3Chat":
        from ...core.hub import download_weights
        from ...core.weights import load_safetensors
        from ...tokenizers.bpe import BPETokenizer
        from .convert import convert_chat_checkpoint

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode,
                                     additional_files=("vocab.json", "merges.txt", "tokenizer_config.json"))
        tokenizer = BPETokenizer.from_pretrained_dir(model_dir)
        cfg = CONFIG_08B
        params = convert_chat_checkpoint(load_safetensors(model_dir), cfg)
        return cls(cfg, params, tokenizer=tokenizer, dtype=dtype, **kw)

    # -- chat API ------------------------------------------------------------

    @staticmethod
    def apply_chat_template(messages: Sequence[dict]) -> str:
        """reference: ChatTemplate.swift — <|im_start|>role\\n…<|im_end|>."""
        parts = []
        for m in messages:
            parts.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
        parts.append("<|im_start|>assistant\n")
        return "".join(parts)

    def generate_ids(self, prompt_ids: Sequence[int], max_new: int = 128, seed: int = 0,
                     sampling: Optional[ChatSamplingConfig] = None) -> List[int]:
        """``sampling`` None = greedy (deterministic); a
        :class:`ChatSamplingConfig` (e.g. ``ChatSamplingConfig()`` — the
        reference's default temp 0.7 / top-k 50 / top-p 0.9 / rep 1.1 —
        or the ``creative()``/``precise()`` presets) samples on device."""
        n = len(prompt_ids)
        t_bucket = max(32, ((n + 31) // 32) * 32)
        ids = np.zeros((1, t_bucket), np.int32)
        ids[0, t_bucket - n :] = prompt_ids  # left-padded
        out = self._generate(
            self.params, jnp.asarray(ids), jnp.asarray([n], jnp.int32),
            jax.random.PRNGKey(seed), t_bucket=t_bucket, max_new=max_new,
            max_len=t_bucket + max_new, sampling=sampling,
        )
        toks = []
        for t in np.asarray(out)[0].tolist():
            if t == self.cfg.eos_token_id:
                break
            toks.append(t)
        return toks

    def generate_ids_stream(self, prompt_ids: Sequence[int], max_new: int = 128,
                            seed: int = 0, chunk: int = 16,
                            sampling: Optional[ChatSamplingConfig] = None) -> Iterator[int]:
        """Yield token ids AS THEY DECODE: the resumable-chunk decode
        (``chunk`` tokens per device round-trip) gives true streaming —
        first token after prefill+1 step, then a bounded wait per chunk —
        plus cross-chunk EOS early-exit (the monolithic program's on-device
        early-exit, recovered at chunk granularity). Token sequence is
        identical to :meth:`generate_ids` (greedy, same programs)."""
        n = len(prompt_ids)
        t_bucket = max(32, ((n + 31) // 32) * 32)
        ids = np.zeros((1, t_bucket), np.int32)
        ids[0, t_bucket - n :] = prompt_ids  # left-padded
        n_valid = jnp.asarray([n], jnp.int32)
        s = self._gen_start(
            self.params, jnp.asarray(ids), n_valid, jax.random.PRNGKey(seed),
            t_bucket=t_bucket, max_new=max_new, max_len=t_bucket + max_new,
            sampling=sampling,
        )
        tok0 = int(np.asarray(s[4])[0])
        if tok0 == self.cfg.eos_token_id:
            return
        yield tok0
        step = 1
        while step < max_new:
            end = min(step + chunk, max_new)
            s = self._gen_chunk(self.params, s, n_valid,
                                jnp.asarray(end, jnp.int32), sampling=sampling)
            out = np.asarray(s[1])[0]
            for i in range(step, end):
                t = int(out[i])
                if t == self.cfg.eos_token_id:
                    return
                yield t
            step = end

    def chat(self, messages: Sequence[dict], tools: Sequence[dict] = (),
             sampling: Optional[ChatSamplingConfig] = None) -> Iterator[str]:
        """``sampling`` None = greedy; pass ``ChatSamplingConfig()`` for
        the reference server's default sampled decoding."""
        if self.tokenizer is None:
            raise RuntimeError("chat requires a tokenizer")
        prompt = self.apply_chat_template(messages)
        ids = self.tokenizer.encode(prompt)
        from ...tokenizers.bpe import StreamingDecoder

        dec = StreamingDecoder(self.tokenizer)
        for t in self.generate_ids_stream(ids, sampling=sampling):
            piece = dec.push(t)
            if piece:
                yield piece
        tail = dec.finish()
        if tail:
            yield tail

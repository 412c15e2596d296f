"""PersonaPlex 7B: Moshi-architecture full-duplex speech-to-speech.

TPU-native re-design of the reference module
(reference: Sources/PersonaPlex/PersonaPlex.swift:51-1318,
TemporalTransformer.swift:185-335, Depformer.swift:187-249,
Configuration.swift:29-123):

- 17 token streams (1 text + 8 user-audio + 8 agent-audio codebooks),
  embedded and SUMMED into the temporal transformer input each 80 ms frame;
- TemporalTransformer: 32 layers, d=4096, RoPE base 1e4, context 3000;
- Depformer: 6 layers, d=1024, with PER-CODEBOOK input-embedding and
  output-head weight banks (the reference's MultiLinear) generating the
  16 agent codebooks sequentially within each frame — implemented as a
  ``lax.scan`` over stacked banks (same shape as Qwen3-TTS's code
  predictor);
- stream delay pattern: semantic codebook delay 0, acoustic delay 1
  (agent audio written into the input ring with a 1-frame lag);
- sampling: audio top-k 250 / T 0.8 / repetition 1.2; text top-k 25 /
  T 0.7 (reference docs/models/personaplex.md:130-135).

The whole conversation loop (temporal step → text+audio sampling →
depformer completion → delayed ring write) runs inside ``lax.while_loop``.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...core import AudioChunk, SpeechToSpeechModel
from ...ops.attention import NEG_INF, sdpa
from ...ops.kv_cache import KVCache, after_prefill, after_token, init_cache, write_prompt, write_token
from ...ops.nn import init_linear, linear, rms_norm, swiglu_mlp
from ...ops.rope import apply_rope, rope_angles
from .mimi import MimiConfig, init_mimi_params, mimi_decode, mimi_encode
from .mimi import config_tiny as mimi_tiny


@dataclasses.dataclass(frozen=True)
class PersonaPlexConfig:
    d_model: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    head_dim: int = 128
    intermediate_size: int = 11264
    rope_theta: float = 1e4
    context: int = 3000
    text_vocab: int = 32001   # sentencepiece + pad
    audio_vocab: int = 2049   # 2048 codes + initial/pad token
    num_codebooks: int = 16   # depformer output
    temporal_codebooks: int = 8  # per side in the temporal input
    dep_d_model: int = 1024
    dep_layers: int = 6
    dep_heads: int = 16
    dep_ff: int = 2816        # depformer gating feed-forward width
    dep_context: int = 8      # depformer attention context (Configuration.swift:154)
    rms_norm_eps: float = 1e-8
    text_pad: int = 3         # silence/pad text token
    audio_pad: int = 2048     # initial audio token
    mimi: MimiConfig = MimiConfig()

    @property
    def num_streams(self) -> int:
        return 1 + 2 * self.temporal_codebooks  # 17

    @property
    def audio_card(self) -> int:
        """Audio head output size: card (2048); the +1 initial token exists
        only in embeddings (Depformer.swift:231)."""
        return self.audio_vocab - 1


CONFIG_7B = PersonaPlexConfig()


def config_tiny() -> PersonaPlexConfig:
    return PersonaPlexConfig(
        d_model=32, num_layers=2, num_heads=2, head_dim=16, intermediate_size=64,
        context=64, text_vocab=64, audio_vocab=2049, num_codebooks=16,
        temporal_codebooks=8, dep_d_model=32, dep_layers=2, dep_heads=2,
        dep_ff=48, mimi=mimi_tiny(),
    )


@dataclasses.dataclass(frozen=True)
class PersonaSampling:
    """reference: docs/models/personaplex.md:130-135."""

    audio_top_k: int = 250
    audio_temperature: float = 0.8
    audio_repetition_penalty: float = 1.2
    text_top_k: int = 25
    text_temperature: float = 0.7
    max_steps: int = 500


def init_personaplex_params(key, cfg: PersonaPlexConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 12 + cfg.num_layers + cfg.dep_layers)
    d = cfg.d_model
    params = {
        "text_embed": (jax.random.normal(ks[0], (cfg.text_vocab, d)) * 0.02).astype(dtype),
        # user + agent audio stream embeddings: [2*K, audio_vocab, d]
        "audio_embed": (jax.random.normal(ks[1], (2 * cfg.temporal_codebooks, cfg.audio_vocab, d)) * 0.02).astype(dtype),
        "text_head": init_linear(ks[2], d, cfg.text_vocab, bias=False, dtype=dtype),
        "norm": {"weight": jnp.ones((d,), dtype)},
        "layers": [],
        # depformer (reference: Depformer.swift:187-237 — every projection
        # is a per-step MultiLinear weight bank, stored here [steps, in, out])
        "dep_in": (jax.random.normal(ks[3], (cfg.num_codebooks, d, cfg.dep_d_model)) * 0.02).astype(dtype),
        "dep_text_emb": (jax.random.normal(ks[6], (cfg.text_vocab, cfg.dep_d_model)) * 0.02).astype(dtype),
        "dep_embed": (jax.random.normal(ks[4], (cfg.num_codebooks - 1, cfg.audio_vocab, cfg.dep_d_model)) * 0.02).astype(dtype),
        "dep_heads_bank": (jax.random.normal(ks[5], (cfg.num_codebooks, cfg.dep_d_model, cfg.audio_card)) * 0.02).astype(dtype),
        "dep_layers": [],
    }
    hd = cfg.head_dim
    for i in range(cfg.num_layers):
        k = jax.random.split(ks[12 + i], 7)
        params["layers"].append({
            "input_layernorm": {"weight": jnp.ones((d,), dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((d,), dtype)},
            "q_proj": init_linear(k[0], d, cfg.num_heads * hd, bias=False, dtype=dtype),
            "k_proj": init_linear(k[1], d, cfg.num_heads * hd, bias=False, dtype=dtype),
            "v_proj": init_linear(k[2], d, cfg.num_heads * hd, bias=False, dtype=dtype),
            "o_proj": init_linear(k[3], cfg.num_heads * hd, d, bias=False, dtype=dtype),
            "mlp": {
                "gate_proj": init_linear(k[4], d, cfg.intermediate_size, bias=False, dtype=dtype),
                "up_proj": init_linear(k[5], d, cfg.intermediate_size, bias=False, dtype=dtype),
                "down_proj": init_linear(k[6], cfg.intermediate_size, d, bias=False, dtype=dtype),
            },
        })
    dd = cfg.dep_d_model
    s = cfg.num_codebooks
    for i in range(cfg.dep_layers):
        k = jax.random.split(ks[12 + cfg.num_layers + i], 4)
        scale = 0.02
        params["dep_layers"].append({
            "norm1": {"weight": jnp.ones((dd,), dtype)},
            "norm2": {"weight": jnp.ones((dd,), dtype)},
            # per-step banks: QKV packed [S, dd, 3dd], out [S, dd, dd],
            # gated FFN in [S, dd, 2ff] (gate | value halves), out [S, ff, dd]
            "in_proj": (jax.random.normal(k[0], (s, dd, 3 * dd)) * scale).astype(dtype),
            "out_proj": (jax.random.normal(k[1], (s, dd, dd)) * scale).astype(dtype),
            "gating_in": (jax.random.normal(k[2], (s, dd, 2 * cfg.dep_ff)) * scale).astype(dtype),
            "gating_out": (jax.random.normal(k[3], (s, cfg.dep_ff, dd)) * scale).astype(dtype),
        })
    return params


def embed_frame(params, cfg: PersonaPlexConfig, text_tok, user_codes, agent_codes):
    """Sum the 17 stream embeddings for one frame.
    text_tok: [B]; user_codes, agent_codes: [B, K]. → [B, d]."""
    e = jnp.take(params["text_embed"], text_tok, axis=0)
    k = cfg.temporal_codebooks

    def gather(stream_idx, code):
        return jnp.take(params["audio_embed"][stream_idx], code, axis=0)

    user = jax.vmap(gather, in_axes=(0, 1), out_axes=1)(jnp.arange(k), user_codes)  # [B,K,d]
    agent = jax.vmap(gather, in_axes=(0, 1), out_axes=1)(jnp.arange(k, 2 * k), agent_codes)
    return e + user.sum(axis=1) + agent.sum(axis=1)


def _temporal_layer(p, x, positions, mask, cache_layer, cfg, decode, cursor=None):
    b, t, _ = x.shape
    hd = cfg.head_dim
    h = rms_norm(x, p["input_layernorm"]["weight"], cfg.rms_norm_eps)
    q = linear(h, p["q_proj"]).reshape(b, t, cfg.num_heads, hd)
    k = linear(h, p["k_proj"]).reshape(b, t, cfg.num_heads, hd)
    v = linear(h, p["v_proj"]).reshape(b, t, cfg.num_heads, hd)
    cos, sin = rope_angles(positions, hd, cfg.rope_theta)
    cos, sin = cos[:, None], sin[:, None]
    q = apply_rope(q.transpose(0, 2, 1, 3), cos, sin)
    k = apply_rope(k.transpose(0, 2, 1, 3), cos, sin)
    v = v.transpose(0, 2, 1, 3)
    if decode:
        updated = write_token(cache_layer, k, v, cursor)
        attn = sdpa(q, updated.k, updated.v, 1.0 / np.sqrt(hd), mask)
    else:
        updated = write_prompt(cache_layer, k, v)
        attn = sdpa(q, k, v, 1.0 / np.sqrt(hd), mask)
    x = x + linear(attn.transpose(0, 2, 1, 3).reshape(b, t, -1), p["o_proj"])
    h2 = rms_norm(x, p["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
    return x + swiglu_mlp(h2, p["mlp"]), updated


def temporal_prefill(params, cfg, embeds, valid, cache: KVCache):
    b, t, _ = embeds.shape
    positions = (jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1) * valid
    rows = jnp.arange(t)[None, :, None]
    cols = jnp.arange(t)[None, None, :]
    mask = jnp.where((cols <= rows) & valid[:, None, :], 0.0, NEG_INF).astype(jnp.float32)[:, None]
    x = embeds
    new_layers = []
    for p in params["layers"]:
        x, upd = _temporal_layer(p, x, positions, mask, cache.layers[len(new_layers)], cfg, False)
        new_layers.append(upd)
    x = rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps)
    return x, after_prefill(cache, new_layers, valid, t)


def temporal_step(params, cfg, embeds, cache: KVCache):
    b = embeds.shape[0]
    positions = cache.positions[:, None]
    written = jnp.arange(cache.max_len)[None, :] == cache.cursor
    mask = jnp.where(cache.valid | written, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]
    x = embeds
    new_layers = []
    for p in params["layers"]:
        x, upd = _temporal_layer(p, x, positions, mask, cache.layers[len(new_layers)], cfg,
                                 True, cache.cursor)
        new_layers.append(upd)
    x = rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps)
    return x[:, 0], after_token(cache, new_layers)


def _sample_topk(logits, key, top_k: int, temperature: float):
    lg = logits.astype(jnp.float32)
    if top_k > 0:
        top = min(top_k, lg.shape[-1])
        kth = jnp.sort(lg, axis=-1)[..., -top][..., None]
        lg = jnp.where(lg < kth, NEG_INF, lg)
    if temperature > 0:
        lg = lg / temperature + jax.random.gumbel(key, lg.shape, dtype=jnp.float32)
    return jnp.argmax(lg, axis=-1).astype(jnp.int32)


def depformer_generate(params, cfg: PersonaPlexConfig, temporal_hidden, text_token,
                       key, sampling: PersonaSampling):
    """Generate 16 agent codebooks for one frame
    (reference: Depformer.swift:249-296). Step k input =
    ``dep_in[k](temporal_hidden) + emb(prev_token)`` where prev is the
    sampled TEXT token at k=0 (dep_text_emb) and the previous audio code
    after; every layer projection is a per-step weight bank; attention has
    no positional encoding and a ``dep_context``-step window; heads apply
    directly on the hidden state (no final norm).

    temporal_hidden: [B, d_model]; text_token: [B] → codes [B, 16]."""
    b = temporal_hidden.shape[0]
    dd, nl, nh = cfg.dep_d_model, cfg.dep_layers, cfg.dep_heads
    dh = dd // nh
    s_total = cfg.num_codebooks
    dtype = temporal_hidden.dtype

    k_caches = jnp.zeros((nl, b, nh, s_total, dh), dtype)
    v_caches = jnp.zeros_like(k_caches)

    def forward(x, step, k_caches, v_caches):
        """One depformer step (t=1) at codebook position ``step``."""
        cols = jnp.arange(s_total)[None, None, None, :]
        mask = jnp.where((cols <= step) & (cols > step - cfg.dep_context),
                         0.0, NEG_INF).astype(jnp.float32)
        for li, p in enumerate(params["dep_layers"]):
            h = rms_norm(x, p["norm1"]["weight"], cfg.rms_norm_eps)
            qkv = jnp.einsum("bti,io->bto", h, p["in_proj"][step]).reshape(b, 1, 3, nh, dh)
            q = qkv[:, :, 0].transpose(0, 2, 1, 3)
            kk = qkv[:, :, 1].transpose(0, 2, 1, 3)
            vv = qkv[:, :, 2].transpose(0, 2, 1, 3)
            k_caches = k_caches.at[li].set(jax.lax.dynamic_update_slice_in_dim(
                k_caches[li], kk.astype(k_caches.dtype), step, axis=2))
            v_caches = v_caches.at[li].set(jax.lax.dynamic_update_slice_in_dim(
                v_caches[li], vv.astype(v_caches.dtype), step, axis=2))
            attn = sdpa(q, k_caches[li], v_caches[li], 1.0 / np.sqrt(dh), mask)
            attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, dd)
            x = x + jnp.einsum("bti,io->bto", attn, p["out_proj"][step])
            h2 = rms_norm(x, p["norm2"]["weight"], cfg.rms_norm_eps)
            gv = jnp.einsum("bti,io->bto", h2, p["gating_in"][step])
            gate, value = jnp.split(gv, 2, axis=-1)
            x = x + jnp.einsum("bti,io->bto", jax.nn.silu(gate) * value,
                               p["gating_out"][step])
        return x, k_caches, v_caches

    def step_input(step, prev_emb):
        cond = jnp.einsum("bi,io->bo", temporal_hidden, params["dep_in"][step])
        return (cond + prev_emb)[:, None].astype(dtype)

    # step 0: conditioned on the sampled text token
    zero = jnp.asarray(0, jnp.int32)
    x0 = step_input(zero, jnp.take(params["dep_text_emb"], text_token, axis=0))
    h0, k_caches, v_caches = forward(x0, zero, k_caches, v_caches)
    key, k0 = jax.random.split(key)
    code = _sample_topk(h0[:, 0] @ params["dep_heads_bank"][0], k0,
                        sampling.audio_top_k, sampling.audio_temperature)

    def body(carry, cb_idx):
        code_prev, k_caches, v_caches, key = carry
        emb = jnp.take(params["dep_embed"][cb_idx - 1], code_prev, axis=0)
        x, k_caches, v_caches = forward(step_input(cb_idx, emb), cb_idx,
                                        k_caches, v_caches)
        key, kk = jax.random.split(key)
        code_next = _sample_topk(x[:, 0] @ params["dep_heads_bank"][cb_idx], kk,
                                 sampling.audio_top_k, sampling.audio_temperature)
        return (code_next, k_caches, v_caches, key), code_prev

    (last, _, _, _), prev = jax.lax.scan(
        body, (code, k_caches, v_caches, key),
        jnp.arange(1, cfg.num_codebooks, dtype=jnp.int32))
    return jnp.concatenate([prev.T, last[:, None]], axis=1)  # [B, 16]


class PersonaPlex(SpeechToSpeechModel):
    def __init__(self, cfg: PersonaPlexConfig, params, mimi_params, tokenizer=None,
                 dtype=jnp.bfloat16):
        self.cfg = cfg
        self.tokenizer = tokenizer  # SentencePieceModel for text stream
        cast = lambda t: jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), t)
        self.params = cast(params)
        self.mimi_params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), mimi_params)
        self.dtype = dtype
        self._loaded = True

        self._mimi_encode = jax.jit(functools.partial(mimi_encode, cfg=cfg.mimi))
        self._mimi_decode = jax.jit(functools.partial(mimi_decode, cfg=cfg.mimi))

        @jax.jit
        def _embed_voice_codes(p, codes):
            """agent-stream code prefix [1, 16, T] → temporal-input
            embeddings [1, T, d] (text/user streams padded)."""
            k = cfg.temporal_codebooks

            def one(t):
                return embed_frame(p, cfg, jnp.full((1,), cfg.text_pad, jnp.int32),
                                   jnp.full((1, k), cfg.audio_pad, jnp.int32),
                                   codes[:, :k, t])

            return jax.vmap(one, out_axes=1)(jnp.arange(codes.shape[2]))

        self._embed_voice_codes = _embed_voice_codes

        @functools.partial(jax.jit, static_argnames=("user_frames", "max_steps", "sampling"))
        def _converse(p, user_codes, voice_embeds, n_voice, agent_init, key, *,
                      user_frames, max_steps, sampling: PersonaSampling):
            """user_codes: [1, 16, user_frames]; voice_embeds [1, V_cap, d]
            precomputed temporal-input embeddings for the voice-prompt
            prefix with n_voice valid frames, and agent_init [1, 16] the
            delay-ring snapshot's newest agent codes (reference: voice
            .safetensors ``embeddings`` + ``cache``,
            PersonaPlex.swift:131-223, 289-342). Returns agent codes
            [1, 16, max_steps]."""
            b = 1
            k = cfg.temporal_codebooks
            cache = init_cache(cfg.num_layers, b, cfg.num_heads, cfg.context, cfg.head_dim, self.dtype)

            agent_out = jnp.full((b, cfg.num_codebooks, max_steps), cfg.audio_pad, jnp.int32)
            agent_prev = agent_init
            text_prev = jnp.full((b,), cfg.text_pad, jnp.int32)

            def body(s):
                step, cache, agent_prev, text_prev, agent_out, key = s
                user_frame = jnp.where(
                    step < user_frames,
                    user_codes[:, :k, jnp.clip(step, 0, user_frames - 1)],
                    jnp.full((b, k), cfg.audio_pad, jnp.int32),
                )
                # delay pattern: agent semantic (cb0) from current frame,
                # acoustic (1..7) delayed one frame — both read from agent_prev
                # which holds last frame's codes (1-frame ring).
                embeds = embed_frame(p, cfg, text_prev, user_frame,
                                     agent_prev[:, :k])[:, None].astype(self.dtype)
                hidden, cache = temporal_step(p, cfg, embeds, cache)
                key, kt, kd = jax.random.split(key, 3)
                text_tok = _sample_topk(linear(hidden, p["text_head"]), kt,
                                        sampling.text_top_k, sampling.text_temperature)
                codes = depformer_generate(p, cfg, hidden, text_tok, kd, sampling)
                agent_out = agent_out.at[:, :, step].set(codes)
                return step + 1, cache, codes, text_tok, agent_out, key

            def cond(s):
                step, *_ = s
                return step < max_steps

            # prefill: voice-prompt embeddings then one pad frame
            v_cap = voice_embeds.shape[1]
            pad0 = embed_frame(p, cfg, jnp.full((b,), cfg.text_pad, jnp.int32),
                               jnp.full((b, k), cfg.audio_pad, jnp.int32),
                               jnp.full((b, k), cfg.audio_pad, jnp.int32))[:, None]
            embeds0 = jnp.concatenate([voice_embeds.astype(self.dtype), pad0.astype(self.dtype)], axis=1)
            valid0 = jnp.concatenate([jnp.arange(v_cap)[None] < n_voice,
                                      jnp.ones((b, 1), bool)], axis=1)
            _, cache = temporal_prefill(p, cfg, embeds0, valid0, cache)

            state = (jnp.asarray(0, jnp.int32), cache, agent_prev, text_prev, agent_out, key)
            _, _, _, _, agent_out, _ = jax.lax.while_loop(cond, body, state)
            return agent_out

        self._converse = _converse

    @classmethod
    def init_random(cls, cfg: Optional[PersonaPlexConfig] = None, seed: int = 0,
                    dtype=jnp.float32, **kw) -> "PersonaPlex":
        cfg = cfg or config_tiny()
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        return cls(cfg, init_personaplex_params(k1, cfg),
                   init_mimi_params(k2, cfg.mimi), dtype=dtype, **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "nvidia/personaplex-7b-v1", cache_dir=None,
                        offline_mode: bool = False, dtype=jnp.bfloat16,
                        cfg: Optional[PersonaPlexConfig] = None, **kw) -> "PersonaPlex":
        """Load the upstream split-safetensors layout: ``temporal.safetensors``
        (4-bit MLX-quantized), ``embeddings.safetensors``,
        ``depformer.safetensors``, ``mimi.safetensors``
        (reference: Sources/PersonaPlex/WeightLoading.swift:12-90)."""
        from pathlib import Path

        from safetensors import safe_open

        from ...core.hub import download_weights
        from .convert import convert_mimi_tree, convert_moshi_tree, dequantize_state_dict

        cfg = cfg or CONFIG_7B
        model_dir = Path(download_weights(
            model_id, cache_dir=cache_dir, offline_mode=offline_mode,
            additional_patterns=["voices/*"]))

        def read(name):
            path = model_dir / name
            if not path.exists():
                raise FileNotFoundError(f"missing {name} in {model_dir}")
            with safe_open(str(path), framework="np") as f:
                return {k: f.get_tensor(k) for k in f.keys()}

        lm_sd = dequantize_state_dict({**read("temporal.safetensors"),
                                       **read("embeddings.safetensors"),
                                       **read("depformer.safetensors")})
        params = convert_moshi_tree(lm_sd, cfg)
        mimi_params = convert_mimi_tree(read("mimi.safetensors"), cfg.mimi)
        return cls(cfg, params, mimi_params, dtype=dtype, **kw)

    VOICE_PROMPT_CAP = 32  # frames; fixed so one compiled program serves all prompts
    DELAY_RING = 4         # maxDelay + 3 (PersonaPlex.swift:210)

    def make_voice_prompt(self, audio: np.ndarray, sample_rate: int = 24000,
                          path: Optional[str] = None) -> dict:
        """Reference audio → voice prompt in the upstream format
        (reference: voice .safetensors with ``embeddings`` [T, 1, 1, d]
        temporal-input embeddings + ``cache`` [1, 17, 4] delay-ring token
        snapshot, PersonaPlex.swift:131-223). The embeddings carry the
        voice audio on the agent stream (text/user streams padded)."""
        cfg = self.cfg
        sr = cfg.mimi.sample_rate
        if sample_rate != sr:
            from ...audio.resample import resample

            audio = resample(np.asarray(audio, np.float32), sample_rate, sr)
        spf = cfg.mimi.samples_per_frame
        n = max(1, -(-len(audio) // spf))  # ceil: pad the tail to a whole frame
        audio = np.pad(audio, (0, n * spf - len(audio)))[: n * spf]
        codes = np.asarray(self._mimi_encode(self.mimi_params,
                                             audio=jnp.asarray(audio, jnp.float32)[None]))
        codes = codes[:, :, : self.VOICE_PROMPT_CAP]
        embeds = np.asarray(self._embed_voice_codes(self.params, jnp.asarray(codes)))  # [1,T,d]
        t = embeds.shape[1]
        ring = np.full((1, cfg.num_streams, self.DELAY_RING), cfg.text_pad, np.float32)
        for j in range(self.DELAY_RING):
            src = max(0, codes.shape[2] - self.DELAY_RING + j)
            ring[0, 1: 1 + cfg.num_codebooks, j] = codes[0, :, min(src, codes.shape[2] - 1)]
        out = {"embeddings": embeds.transpose(1, 0, 2)[:, :, None].astype(np.float32),
               "cache": ring}
        if path:
            from safetensors.numpy import save_file

            save_file(out, path)
        return out

    @staticmethod
    def load_voice_prompt(path: str) -> dict:
        """Load an upstream-format voice .safetensors (or a legacy .npz code
        prefix, converted lazily at use)."""
        if str(path).endswith(".npz"):
            return {"codes": np.load(path)["codes"]}
        from safetensors import safe_open

        with safe_open(str(path), framework="np") as f:
            return {k: f.get_tensor(k) for k in f.keys()}

    def _voice_inputs(self, voice_prompt):
        """voice_prompt (dict with 'embeddings'+'cache', dict with 'codes',
        raw code array, or None) → (voice_embeds [1, CAP, d], n_voice,
        agent_init [1, 16])."""
        cfg = self.cfg
        cap = self.VOICE_PROMPT_CAP
        d = cfg.d_model
        embeds = np.zeros((1, cap, d), np.float32)
        agent_init = np.full((1, cfg.num_codebooks), cfg.audio_pad, np.int32)
        n_voice = 0
        if voice_prompt is None:
            return jnp.asarray(embeds), jnp.asarray(0, jnp.int32), jnp.asarray(agent_init)
        vp = voice_prompt if isinstance(voice_prompt, dict) else {"codes": np.asarray(voice_prompt)}
        if "embeddings" in vp:
            e = np.asarray(vp["embeddings"], np.float32)   # [T, 1, 1, d]
            e = e.reshape(e.shape[0], -1)[:, -d:]
            n_voice = min(e.shape[0], cap)
            embeds[0, :n_voice] = e[:n_voice]
            ring = vp.get("cache")
            if ring is not None:
                agent_init[0] = np.asarray(ring, np.float32)[0, 1: 1 + cfg.num_codebooks, -1].astype(np.int32)
        else:
            codes = np.asarray(vp["codes"], np.int32)
            n_voice = min(codes.shape[2], cap)
            e = np.asarray(self._embed_voice_codes(self.params,
                                                   jnp.asarray(codes[:, :, :n_voice])))
            embeds[0, :n_voice] = e[0]
            agent_init[0, : codes.shape[1]] = codes[0, :, n_voice - 1]
        agent_init = np.clip(agent_init, 0, cfg.audio_vocab - 1)
        return jnp.asarray(embeds), jnp.asarray(n_voice, jnp.int32), jnp.asarray(agent_init)

    def _run_converse(self, audio, sample_rate, sampling, max_extra_s, voice_prompt):
        sr = self.cfg.mimi.sample_rate
        if sample_rate != sr:
            from ...audio.resample import resample

            audio = resample(audio.astype(np.float32), sample_rate, sr)
        spf = self.cfg.mimi.samples_per_frame
        n_frames = max(1, -(-len(audio) // spf))  # ceil: whole frames
        audio = np.pad(audio, (0, n_frames * spf - len(audio)))[: n_frames * spf]

        user_codes = self._mimi_encode(self.mimi_params, audio=jnp.asarray(audio)[None])
        voice_embeds, n_voice, agent_init = self._voice_inputs(voice_prompt)
        max_steps = min(sampling.max_steps,
                        n_frames + int(max_extra_s * self.cfg.mimi.frame_rate))
        agent = self._converse(self.params, user_codes, voice_embeds, n_voice,
                               agent_init, jax.random.PRNGKey(0),
                               user_frames=n_frames, max_steps=max_steps, sampling=sampling)
        return jnp.clip(agent, 0, self.cfg.mimi.codebook_size - 1), n_frames, max_steps

    def shard(self, mesh=None, dp: Optional[int] = None, tp: Optional[int] = None
              ) -> "PersonaPlex":
        """Distribute the temporal transformer + depformer over a device
        mesh (the 7B's d_model-4096 layers are the TP target; Mimi stays
        replicated — it is a small conv codec).  Returns self.

            model = PersonaPlex.from_pretrained(...).shard(tp=4)
        """
        from ...parallel import PERSONAPLEX_RULES, make_mesh, replicate, shard_pytree

        mesh = mesh or make_mesh(dp=dp, tp=tp)
        self.params = shard_pytree(self.params, mesh, PERSONAPLEX_RULES)
        self.mimi_params = replicate(self.mimi_params, mesh)
        return self

    def respond(self, audio: np.ndarray, sample_rate: int = 16000,
                sampling: Optional[PersonaSampling] = None, max_extra_s: float = 4.0,
                voice_prompt: Optional[np.ndarray] = None, **kwargs) -> AudioChunk:
        t0 = time.perf_counter()
        sampling = sampling or PersonaSampling()
        sr = self.cfg.mimi.sample_rate
        agent, n_frames, max_steps = self._run_converse(
            audio, sample_rate, sampling, max_extra_s, voice_prompt)
        wav = self._mimi_decode(self.mimi_params, codes=agent)
        out = np.asarray(wav[0], np.float32)
        dur = len(out) / sr
        from ...core.logging import inference as log

        log.info("personaplex: %d user frames → %d agent frames, RTF %.2f",
                 n_frames, max_steps, (time.perf_counter() - t0) / max(dur, 1e-6))
        return AudioChunk(out, sr)

    def respond_stream(self, audio: np.ndarray, sample_rate: int = 16000,
                       sampling: Optional[PersonaSampling] = None,
                       max_extra_s: float = 4.0,
                       voice_prompt: Optional[np.ndarray] = None,
                       chunk_frames: int = 25, left_context: int = 5):
        """Streaming response: agent codes decode through Mimi in ~2 s
        chunks with left context, trimmed at the seam (reference:
        MimiStreamingDecoder 25-frame chunks, MimiCodec.swift:184-209)."""
        sampling = sampling or PersonaSampling()
        sr = self.cfg.mimi.sample_rate
        spf = self.cfg.mimi.samples_per_frame
        agent, _, max_steps = self._run_converse(
            audio, sample_rate, sampling, max_extra_s, voice_prompt)
        agent = np.asarray(agent)
        emitted = 0
        while emitted < max_steps:
            ctx = min(left_context, emitted)
            end = min(emitted + chunk_frames, max_steps)
            piece = jnp.asarray(agent[:, :, emitted - ctx: end])
            wav = np.asarray(self._mimi_decode(self.mimi_params, codes=piece)[0],
                             np.float32)
            yield AudioChunk(wav[ctx * spf:], sr)
            emitted = end

    def realtime_session(self, sampling: Optional[PersonaSampling] = None,
                         context_frames: int = 8,
                         voice_prompt: Optional[np.ndarray] = None,
                         seed: int = 0) -> "RealtimeSession":
        """Full-duplex frame loop: one user frame in → one agent frame out
        at 12.5 Hz (reference: realtime mode, PersonaPlex.swift:344-…).
        Every Mimi conv is causal, so windowed per-frame encode/decode with
        ``context_frames`` of carried left context is exact."""
        return RealtimeSession(self, sampling or PersonaSampling(),
                               context_frames, voice_prompt, seed)

    def warm_up(self) -> None:
        self.respond(np.zeros(self.cfg.mimi.samples_per_frame * 2, np.float32),
                     self.cfg.mimi.sample_rate, max_extra_s=0.2)

    def unload(self) -> None:
        self.params = None
        self.mimi_params = None
        self._loaded = False

    @property
    def is_loaded(self) -> bool:
        return self._loaded


class RealtimeSession:
    """Full-duplex 12.5 Hz frame loop over compiled per-frame programs:
    windowed Mimi encode (causal ⇒ exact), one temporal+depformer step,
    windowed Mimi decode. Per-frame host work is three tiny device calls
    (reference: realtime diagnostic mode + compiled temporal step,
    docs/models/personaplex.md:224-243)."""

    def __init__(self, model: PersonaPlex, sampling: PersonaSampling,
                 context_frames: int, voice_prompt, seed: int):
        self.model = model
        cfg = model.cfg
        self.cfg = cfg
        self.sampling = sampling
        spf = cfg.mimi.samples_per_frame
        self._ctx = context_frames
        self._in_buf = np.zeros(context_frames * spf, np.float32)
        self._code_hist = np.full((1, cfg.num_codebooks, context_frames),
                                  0, np.int32)
        self._n_hist = 0
        self._key = jax.random.PRNGKey(seed)
        self.frames_done = 0

        k = cfg.temporal_codebooks

        @jax.jit
        def _encode_window(mimi_p, window):
            codes = mimi_encode(mimi_p, cfg.mimi, window[None])
            return codes[:, :, -1]  # [1, 16] — the newest frame

        @functools.partial(jax.jit, static_argnames=("sampling",))
        def _frame_step(p, cache, user_codes, agent_prev, text_prev, key, *, sampling):
            embeds = embed_frame(p, cfg, text_prev,
                                 user_codes[:, :k], agent_prev[:, :k])[:, None]
            hidden, cache = temporal_step(p, cfg, embeds.astype(model.dtype), cache)
            key, kt, kd = jax.random.split(key, 3)
            text_tok = _sample_topk(linear(hidden, p["text_head"]), kt,
                                    sampling.text_top_k, sampling.text_temperature)
            codes = depformer_generate(p, cfg, hidden, text_tok, kd, sampling)
            return codes, text_tok, cache

        @jax.jit
        def _decode_window(mimi_p, codes):
            wav = mimi_decode(mimi_p, cfg.mimi, codes)
            return wav[0, -spf:]  # newest frame's samples

        self._encode_window = _encode_window
        self._frame_step = _frame_step
        self._decode_window = _decode_window

        # prefill: voice prompt (embeddings + ring) + one pad frame — the
        # same layout as respond()
        cache = init_cache(cfg.num_layers, 1, cfg.num_heads, cfg.context,
                           cfg.head_dim, model.dtype)

        @jax.jit
        def _prefill(p, voice_embeds, n_voice):
            v_cap = voice_embeds.shape[1]
            pad0 = embed_frame(p, cfg, jnp.full((1,), cfg.text_pad, jnp.int32),
                               jnp.full((1, k), cfg.audio_pad, jnp.int32),
                               jnp.full((1, k), cfg.audio_pad, jnp.int32))[:, None]
            embeds = jnp.concatenate([voice_embeds.astype(model.dtype),
                                      pad0.astype(model.dtype)], axis=1)
            valid = jnp.concatenate([jnp.arange(v_cap)[None] < n_voice,
                                     jnp.ones((1, 1), bool)], axis=1)
            _, new_cache = temporal_prefill(p, cfg, embeds, valid, cache)
            return new_cache

        voice_embeds, n_voice, agent_init = model._voice_inputs(voice_prompt)
        self._cache = _prefill(model.params, voice_embeds, n_voice)
        self._agent_prev = agent_init
        self._text_prev = jnp.full((1,), cfg.text_pad, jnp.int32)

    def push_frame(self, samples: np.ndarray) -> np.ndarray:
        """One 80 ms user frame (samples_per_frame samples @24 kHz) in →
        one agent frame of audio out."""
        spf = self.cfg.mimi.samples_per_frame
        if len(samples) != spf:
            raise ValueError(f"push_frame expects exactly {spf} samples")
        self._in_buf = np.concatenate([self._in_buf[spf:],
                                       np.asarray(samples, np.float32)])
        user_codes = self._encode_window(self.model.mimi_params,
                                         jnp.asarray(self._in_buf))
        self._key, kf = jax.random.split(self._key)
        codes, self._text_prev, self._cache = self._frame_step(
            self.model.params, self._cache, user_codes, self._agent_prev,
            self._text_prev, kf, sampling=self.sampling)
        self._agent_prev = codes

        codes_np = np.clip(np.asarray(codes), 0, self.cfg.mimi.codebook_size - 1)
        self._code_hist = np.concatenate(
            [self._code_hist[:, :, 1:], codes_np[:, :, None]], axis=2)
        self._n_hist = min(self._n_hist + 1, self._ctx)
        wav = self._decode_window(self.model.mimi_params,
                                  jnp.asarray(self._code_hist))
        self.frames_done += 1
        return np.asarray(wav, np.float32)

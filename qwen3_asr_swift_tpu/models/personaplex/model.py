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
    rms_norm_eps: float = 1e-5
    text_pad: int = 3         # silence/pad text token
    audio_pad: int = 2048     # initial audio token
    mimi: MimiConfig = MimiConfig()

    @property
    def num_streams(self) -> int:
        return 1 + 2 * self.temporal_codebooks  # 17


CONFIG_7B = PersonaPlexConfig()


def config_tiny() -> PersonaPlexConfig:
    return PersonaPlexConfig(
        d_model=32, num_layers=2, num_heads=2, head_dim=16, intermediate_size=64,
        context=64, text_vocab=64, audio_vocab=2049, num_codebooks=16,
        temporal_codebooks=8, dep_d_model=32, dep_layers=2, dep_heads=2,
        mimi=mimi_tiny(),
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
        # depformer
        "dep_in_proj": init_linear(ks[3], d, cfg.dep_d_model, bias=False, dtype=dtype),
        "dep_embed": (jax.random.normal(ks[4], (cfg.num_codebooks, cfg.audio_vocab, cfg.dep_d_model)) * 0.02).astype(dtype),
        "dep_heads_bank": (jax.random.normal(ks[5], (cfg.num_codebooks, cfg.dep_d_model, cfg.audio_vocab)) * 0.02).astype(dtype),
        "dep_norm": {"weight": jnp.ones((cfg.dep_d_model,), dtype)},
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
    dhd = dd // cfg.dep_heads
    for i in range(cfg.dep_layers):
        k = jax.random.split(ks[12 + cfg.num_layers + i], 7)
        params["dep_layers"].append({
            "input_layernorm": {"weight": jnp.ones((dd,), dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((dd,), dtype)},
            "q_proj": init_linear(k[0], dd, dd, bias=False, dtype=dtype),
            "k_proj": init_linear(k[1], dd, dd, bias=False, dtype=dtype),
            "v_proj": init_linear(k[2], dd, dd, bias=False, dtype=dtype),
            "o_proj": init_linear(k[3], dd, dd, bias=False, dtype=dtype),
            "mlp": {
                "gate_proj": init_linear(k[4], dd, dd * 3, bias=False, dtype=dtype),
                "up_proj": init_linear(k[5], dd, dd * 3, bias=False, dtype=dtype),
                "down_proj": init_linear(k[6], dd * 3, dd, bias=False, dtype=dtype),
            },
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


def depformer_generate(params, cfg: PersonaPlexConfig, temporal_hidden, key, sampling: PersonaSampling):
    """Generate 16 agent codebooks for one frame.
    temporal_hidden: [B, d_model] → codes [B, 16]."""
    b = temporal_hidden.shape[0]
    dd = cfg.dep_d_model
    nl = cfg.dep_layers
    dh = dd // cfg.dep_heads
    max_len = cfg.num_codebooks + 1
    cond = linear(temporal_hidden[:, None], params["dep_in_proj"])  # [B,1,dd]

    k_caches = jnp.zeros((nl, b, cfg.dep_heads, max_len, dh), cond.dtype)
    v_caches = jnp.zeros_like(k_caches)

    def forward(x, pos, k_caches, v_caches, start, kv_len):
        t = x.shape[1]
        cols = jnp.arange(max_len)[None, None, None, :]
        rows = pos[:, None, :, None]
        mask = jnp.where((cols <= rows) & (cols < kv_len), 0.0, NEG_INF).astype(jnp.float32)
        for li, p in enumerate(params["dep_layers"]):
            h = rms_norm(x, p["input_layernorm"]["weight"], cfg.rms_norm_eps)
            q = linear(h, p["q_proj"]).reshape(b, t, cfg.dep_heads, dh)
            kk = linear(h, p["k_proj"]).reshape(b, t, cfg.dep_heads, dh)
            vv = linear(h, p["v_proj"]).reshape(b, t, cfg.dep_heads, dh)
            cos, sin = rope_angles(pos, dh, cfg.rope_theta)
            cos, sin = cos[:, None], sin[:, None]
            q = apply_rope(q.transpose(0, 2, 1, 3), cos, sin)
            kk = apply_rope(kk.transpose(0, 2, 1, 3), cos, sin)
            vv = vv.transpose(0, 2, 1, 3)
            k_caches = k_caches.at[li].set(
                jax.lax.dynamic_update_slice_in_dim(k_caches[li], kk.astype(k_caches.dtype), start, axis=2))
            v_caches = v_caches.at[li].set(
                jax.lax.dynamic_update_slice_in_dim(v_caches[li], vv.astype(v_caches.dtype), start, axis=2))
            attn = sdpa(q, k_caches[li], v_caches[li], 1.0 / np.sqrt(dh), mask)
            x = x + linear(attn.transpose(0, 2, 1, 3).reshape(b, t, -1), p["o_proj"])
            h2 = rms_norm(x, p["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
            x = x + swiglu_mlp(h2, p["mlp"])
        return rms_norm(x, params["dep_norm"]["weight"], cfg.rms_norm_eps), k_caches, v_caches

    pos0 = jnp.zeros((b, 1), jnp.int32)
    normed, k_caches, v_caches = forward(cond, pos0, k_caches, v_caches,
                                         jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32))

    def sample(logits, k):
        lg = logits.astype(jnp.float32)
        if sampling.audio_top_k > 0:
            top = min(sampling.audio_top_k, lg.shape[-1])
            kth = jnp.sort(lg, axis=-1)[..., -top][..., None]
            lg = jnp.where(lg < kth, NEG_INF, lg)
        if sampling.audio_temperature > 0:
            lg = lg / sampling.audio_temperature + jax.random.gumbel(k, lg.shape, dtype=jnp.float32)
        return jnp.argmax(lg, axis=-1).astype(jnp.int32)

    key, k0 = jax.random.split(key)
    code = sample(normed[:, 0] @ params["dep_heads_bank"][0], k0)

    def body(carry, cb_idx):
        code_prev, k_caches, v_caches, key = carry
        emb = jnp.take(params["dep_embed"][cb_idx - 1], code_prev, axis=0)[:, None]
        pos = jnp.broadcast_to(cb_idx[None, None], (b, 1))
        normed, k_caches, v_caches = forward(emb.astype(cond.dtype), pos, k_caches, v_caches,
                                             cb_idx, cb_idx + 1)
        key, kk = jax.random.split(key)
        code_next = sample(normed[:, 0] @ params["dep_heads_bank"][cb_idx], kk)
        return (code_next, k_caches, v_caches, key), code_prev

    (last, _, _, _), prev = jax.lax.scan(
        body, (code, k_caches, v_caches, key), jnp.arange(1, cfg.num_codebooks, dtype=jnp.int32))
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

        @functools.partial(jax.jit, static_argnames=("user_frames", "max_steps", "sampling"))
        def _converse(p, user_codes, voice_codes, n_voice, key, *,
                      user_frames, max_steps, sampling: PersonaSampling):
            """user_codes: [1, 16, user_frames]; voice_codes [1, 16, V_cap]
            agent-stream voice-prompt prefix (reference: voice .safetensors
            embeddings prefilled before the turn, PersonaPlex.swift:131-223,
            289-342) with n_voice valid frames. Returns agent codes
            [1, 16, max_steps]."""
            b = 1
            k = cfg.temporal_codebooks
            cache = init_cache(cfg.num_layers, b, cfg.num_heads, cfg.context, cfg.head_dim, self.dtype)

            agent_out = jnp.full((b, cfg.num_codebooks, max_steps), cfg.audio_pad, jnp.int32)
            agent_prev = jnp.full((b, cfg.num_codebooks), cfg.audio_pad, jnp.int32)

            def body(s):
                step, cache, agent_prev, agent_out, key = s
                user_frame = jnp.where(
                    step < user_frames,
                    user_codes[:, :k, jnp.clip(step, 0, user_frames - 1)],
                    jnp.full((b, k), cfg.audio_pad, jnp.int32),
                )
                # delay pattern: agent semantic (cb0) from current frame,
                # acoustic (1..7) delayed one frame — both read from agent_prev
                # which holds last frame's codes (1-frame ring).
                embeds = embed_frame(p, cfg, jnp.full((b,), cfg.text_pad, jnp.int32),
                                     user_frame, agent_prev[:, :k])[:, None].astype(self.dtype)
                hidden, cache = temporal_step(p, cfg, embeds, cache)
                key, kd = jax.random.split(key)
                codes = depformer_generate(p, cfg, hidden, kd, sampling)  # [B,16]
                agent_out = agent_out.at[:, :, step].set(codes)
                return step + 1, cache, codes, agent_out, key

            def cond(s):
                step, *_ = s
                return step < max_steps

            # prefill: voice-prompt frames (agent stream) then one pad frame
            v_cap = voice_codes.shape[2]

            def embed_voice_frame(t):
                return embed_frame(p, cfg, jnp.full((b,), cfg.text_pad, jnp.int32),
                                   jnp.full((b, k), cfg.audio_pad, jnp.int32),
                                   voice_codes[:, :k, t])

            voice_embeds = jax.vmap(embed_voice_frame, out_axes=1)(jnp.arange(v_cap))  # [B,V,H]
            pad0 = embed_frame(p, cfg, jnp.full((b,), cfg.text_pad, jnp.int32),
                               jnp.full((b, k), cfg.audio_pad, jnp.int32),
                               jnp.full((b, k), cfg.audio_pad, jnp.int32))[:, None]
            embeds0 = jnp.concatenate([voice_embeds, pad0], axis=1)
            valid0 = jnp.concatenate([jnp.arange(v_cap)[None] < n_voice,
                                      jnp.ones((b, 1), bool)], axis=1)
            _, cache = temporal_prefill(p, cfg, embeds0.astype(self.dtype), valid0, cache)

            state = (jnp.asarray(0, jnp.int32), cache, agent_prev, agent_out, key)
            _, _, _, agent_out, _ = jax.lax.while_loop(cond, body, state)
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
                        offline_mode: bool = False, dtype=jnp.bfloat16, **kw) -> "PersonaPlex":
        from ...core.hub import download_weights
        from ...core.weights import load_safetensors, unflatten

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode)
        flat = load_safetensors(model_dir)
        # checkpoint-specific key mapping lands with the real weights; the
        # canonical tree shape is documented by init_personaplex_params.
        tree = unflatten(flat)
        return cls(CONFIG_7B, tree.get("temporal", tree), tree.get("mimi", {}), dtype=dtype, **kw)

    VOICE_PROMPT_CAP = 32  # frames; fixed so one compiled program serves all prompts

    def make_voice_prompt(self, audio: np.ndarray, sample_rate: int = 24000,
                          path: Optional[str] = None) -> np.ndarray:
        """Reference audio → agent-stream code prefix (reference: voice
        .safetensors with embeddings + delay-ring snapshot,
        PersonaPlex.swift:131-223). Optionally persisted as .npz."""
        sr = self.cfg.mimi.sample_rate
        if sample_rate != sr:
            from ...audio.resample import resample

            audio = resample(np.asarray(audio, np.float32), sample_rate, sr)
        spf = self.cfg.mimi.samples_per_frame
        n = max(1, len(audio) // spf)
        audio = np.pad(audio, (0, n * spf - len(audio)))[: n * spf]
        codes = np.asarray(self._mimi_encode(self.mimi_params,
                                             audio=jnp.asarray(audio, jnp.float32)[None]))
        codes = codes[:, :, : self.VOICE_PROMPT_CAP]
        if path:
            np.savez(path, codes=codes)
        return codes

    @staticmethod
    def load_voice_prompt(path: str) -> np.ndarray:
        return np.load(path)["codes"]

    def _run_converse(self, audio, sample_rate, sampling, max_extra_s, voice_prompt):
        sr = self.cfg.mimi.sample_rate
        if sample_rate != sr:
            from ...audio.resample import resample

            audio = resample(audio.astype(np.float32), sample_rate, sr)
        spf = self.cfg.mimi.samples_per_frame
        n_frames = max(1, len(audio) // spf)
        audio = np.pad(audio, (0, n_frames * spf - len(audio)))[: n_frames * spf]

        user_codes = self._mimi_encode(self.mimi_params, audio=jnp.asarray(audio)[None])
        cap = self.VOICE_PROMPT_CAP
        voice = np.zeros((1, self.cfg.num_codebooks, cap), np.int32)
        n_voice = 0
        if voice_prompt is not None:
            vp = np.asarray(voice_prompt, np.int32)
            n_voice = min(vp.shape[2], cap)
            voice[:, : vp.shape[1], :n_voice] = vp[:, :, :n_voice]
        max_steps = min(sampling.max_steps,
                        n_frames + int(max_extra_s * self.cfg.mimi.frame_rate))
        agent = self._converse(self.params, user_codes, jnp.asarray(voice),
                               jnp.asarray(n_voice, jnp.int32), jax.random.PRNGKey(0),
                               user_frames=n_frames, max_steps=max_steps, sampling=sampling)
        return jnp.clip(agent, 0, self.cfg.mimi.codebook_size - 1), n_frames, max_steps

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
        def _frame_step(p, cache, user_codes, agent_prev, key, *, sampling):
            embeds = embed_frame(p, cfg, jnp.full((1,), cfg.text_pad, jnp.int32),
                                 user_codes[:, :k], agent_prev[:, :k])[:, None]
            hidden, cache = temporal_step(p, cfg, embeds.astype(model.dtype), cache)
            codes = depformer_generate(p, cfg, hidden, key, sampling)
            return codes, cache

        @jax.jit
        def _decode_window(mimi_p, codes):
            wav = mimi_decode(mimi_p, cfg.mimi, codes)
            return wav[0, -spf:]  # newest frame's samples

        self._encode_window = _encode_window
        self._frame_step = _frame_step
        self._decode_window = _decode_window

        # prefill: voice prompt + one pad frame — same layout as respond()
        cap = PersonaPlex.VOICE_PROMPT_CAP
        voice = np.zeros((1, cfg.num_codebooks, cap), np.int32)
        n_voice = 0
        if voice_prompt is not None:
            vp = np.asarray(voice_prompt, np.int32)
            n_voice = min(vp.shape[2], cap)
            voice[:, : vp.shape[1], :n_voice] = vp[:, :, :n_voice]
        # reuse the offline prefill path by running _converse for 0 steps is
        # not expressible; build the cache directly:
        cache = init_cache(cfg.num_layers, 1, cfg.num_heads, cfg.context,
                           cfg.head_dim, model.dtype)

        @jax.jit
        def _prefill(p, voice_codes, n_voice):
            v_cap = voice_codes.shape[2]

            def embed_voice_frame(t):
                return embed_frame(p, cfg, jnp.full((1,), cfg.text_pad, jnp.int32),
                                   jnp.full((1, k), cfg.audio_pad, jnp.int32),
                                   voice_codes[:, :k, t])

            voice_embeds = jax.vmap(embed_voice_frame, out_axes=1)(jnp.arange(v_cap))
            pad0 = embed_frame(p, cfg, jnp.full((1,), cfg.text_pad, jnp.int32),
                               jnp.full((1, k), cfg.audio_pad, jnp.int32),
                               jnp.full((1, k), cfg.audio_pad, jnp.int32))[:, None]
            embeds = jnp.concatenate([voice_embeds, pad0], axis=1)
            valid = jnp.concatenate([jnp.arange(v_cap)[None] < n_voice,
                                     jnp.ones((1, 1), bool)], axis=1)
            _, new_cache = temporal_prefill(p, cfg, embeds.astype(model.dtype),
                                            valid, cache)
            return new_cache

        self._cache = _prefill(model.params, jnp.asarray(voice),
                               jnp.asarray(n_voice, jnp.int32))
        self._agent_prev = jnp.full((1, cfg.num_codebooks), cfg.audio_pad, jnp.int32)

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
        codes, self._cache = self._frame_step(
            self.model.params, self._cache, user_codes, self._agent_prev, kf,
            sampling=self.sampling)
        self._agent_prev = codes

        codes_np = np.clip(np.asarray(codes), 0, self.cfg.mimi.codebook_size - 1)
        self._code_hist = np.concatenate(
            [self._code_hist[:, :, 1:], codes_np[:, :, None]], axis=2)
        self._n_hist = min(self._n_hist + 1, self._ctx)
        wav = self._decode_window(self.model.mimi_params,
                                  jnp.asarray(self._code_hist))
        self.frames_done += 1
        return np.asarray(wav, np.float32)

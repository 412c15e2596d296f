"""VibeVoice TTS: LM + diffusion head over acoustic VAE latents.

TPU-native analog of the reference's VibeVoice module
(reference: Sources/VibeVoiceTTS/VibeVoiceTTSModel.swift:155,392,
Models/VibeVoiceStreamModel.swift, Models/DiffusionHead.swift,
Inference/DPMSolver.swift, Layers/StreamingConv1d.swift): a Qwen2-style
LM runs over text + acoustic-latent positions; each audio step the LM
hidden state conditions (a) a binary EOS classifier and (b) a diffusion
head that denoises the next acoustic latent with a DPM-Solver schedule;
latents decode to 24 kHz audio through a causal-conv σ-VAE decoder.
Voice cloning mints a cache of latents from reference audio + transcript
(reference ``vibevoice-encode-voice``).

The step loop (LM step → EOS check → K DPM-Solver denoise iterations)
runs inside ``lax.while_loop``; the VAE decoder is a jitted causal conv
stack (streaming = chunked causal decode).
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core import AudioChunk, SpeechGenerationModel
from ...ops.attention import NEG_INF, sdpa
from ...ops.kv_cache import init_cache, after_prefill, after_token, write_prompt, write_token
from ...ops.nn import init_linear, linear, rms_norm, swiglu_mlp
from ...ops.rope import apply_rope, rope_angles
from ..qwen3_tts.codec import causal_conv1d, causal_transpose_conv1d, _conv_init


@dataclasses.dataclass(frozen=True)
class VibeVoiceConfig:
    hidden_size: int = 896          # Realtime-0.5B Qwen2 backbone
    num_layers: int = 24
    num_heads: int = 14
    num_kv_heads: int = 2
    head_dim: int = 64
    intermediate_size: int = 4864
    vocab_size: int = 151936
    rope_theta: float = 1e6
    rms_norm_eps: float = 1e-6
    latent_dim: int = 64            # acoustic σ-VAE latent per 0.04 s frame
    diffusion_hidden: int = 512
    diffusion_steps: int = 8        # DPM-Solver iterations at inference
    vae_upsample: int = 960         # samples per latent frame (24 kHz / 25 Hz)
    vae_strides: tuple = (24, 40)   # two transpose-conv stages; product = vae_upsample
    sample_rate: int = 24000
    max_frames: int = 750           # 30 s realtime cap


CONFIG_05B = VibeVoiceConfig()


def config_tiny() -> VibeVoiceConfig:
    return VibeVoiceConfig(hidden_size=32, num_layers=2, num_heads=2, num_kv_heads=1,
                           head_dim=16, intermediate_size=64, vocab_size=300,
                           latent_dim=8, diffusion_hidden=16, diffusion_steps=2,
                           vae_upsample=64, vae_strides=(8, 8), max_frames=8)


def init_vibevoice_params(key, cfg: VibeVoiceConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 12 + cfg.num_layers)
    h = cfg.hidden_size
    params = {
        "embed_tokens": (jax.random.normal(ks[0], (cfg.vocab_size, h)) * 0.02).astype(dtype),
        "latent_in": init_linear(ks[1], cfg.latent_dim, h, dtype=dtype),
        "norm": {"weight": jnp.ones((h,), dtype)},
        "eos_head": init_linear(ks[2], h, 1, dtype=dtype),
        "layers": [],
        "diffusion": {
            "cond": init_linear(ks[3], h + cfg.latent_dim + 1, cfg.diffusion_hidden, dtype=dtype),
            "mid": init_linear(ks[4], cfg.diffusion_hidden, cfg.diffusion_hidden, dtype=dtype),
            "out": init_linear(ks[5], cfg.diffusion_hidden, cfg.latent_dim, dtype=dtype),
        },
        "vae_dec": {
            "up1": _conv_init(ks[6], cfg.vae_strides[0] * 2, cfg.latent_dim, 64, dtype=dtype),
            "conv1": _conv_init(ks[7], 7, 64, 64, dtype=dtype),
            "up2": _conv_init(ks[8], cfg.vae_strides[1] * 2, 64, 32, dtype=dtype),
            "conv2": _conv_init(ks[9], 7, 32, 1, dtype=dtype),
        },
    }
    hd = cfg.head_dim
    for i in range(cfg.num_layers):
        k = jax.random.split(ks[12 + i], 7)
        params["layers"].append({
            "input_layernorm": {"weight": jnp.ones((h,), dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((h,), dtype)},
            "q_proj": init_linear(k[0], h, cfg.num_heads * hd, dtype=dtype),
            "k_proj": init_linear(k[1], h, cfg.num_kv_heads * hd, dtype=dtype),
            "v_proj": init_linear(k[2], h, cfg.num_kv_heads * hd, dtype=dtype),
            "o_proj": init_linear(k[3], cfg.num_heads * hd, h, bias=False, dtype=dtype),
            "mlp": {
                "gate_proj": init_linear(k[4], h, cfg.intermediate_size, bias=False, dtype=dtype),
                "up_proj": init_linear(k[5], h, cfg.intermediate_size, bias=False, dtype=dtype),
                "down_proj": init_linear(k[6], cfg.intermediate_size, h, bias=False, dtype=dtype),
            },
        })
    return params


def _lm_layer(p, x, positions, mask, cache_layer, cfg, decode, cursor=None):
    b, t, _ = x.shape
    hd = cfg.head_dim
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
    x = x + linear(a.transpose(0, 2, 1, 3).reshape(b, t, -1), p["o_proj"])
    h2 = rms_norm(x, p["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
    return x + swiglu_mlp(h2, p["mlp"]), upd


def diffusion_denoise(p, cond_hidden, key, cfg: VibeVoiceConfig):
    """DPM-Solver-style iterative denoise of one latent conditioned on the
    LM hidden state (reference: DiffusionHead + DPMSolver). Returns [B, latent]."""
    b = cond_hidden.shape[0]
    x = jax.random.normal(key, (b, cfg.latent_dim), jnp.float32)
    # descending sigma schedule
    sigmas = jnp.exp(jnp.linspace(np.log(1.0), np.log(0.02), cfg.diffusion_steps))

    def step(x, sigma):
        inp = jnp.concatenate([cond_hidden.astype(jnp.float32), x,
                               jnp.full((b, 1), sigma, jnp.float32)], axis=-1)
        h = jax.nn.silu(linear(inp, p["cond"]))
        h = jax.nn.silu(linear(h, p["mid"]))
        eps = linear(h, p["out"])          # predicted noise
        x0 = x - sigma * eps               # denoised estimate
        return x0, None

    def body(carry, sigma):
        x = carry
        x0, _ = step(x, sigma)
        # DPM-Solver first-order update toward x0
        x = x0 + sigma * 0.5 * (x - x0)
        return x, None

    x, _ = jax.lax.scan(body, x, sigmas)
    return x


def vae_decode(p, latents, strides):
    """latents [B, F, latent_dim] → audio [B, F*upsample]."""
    h = causal_transpose_conv1d(latents, p["up1"], strides[0])
    h = jax.nn.gelu(causal_conv1d(h, p["conv1"]))
    h = causal_transpose_conv1d(h, p["up2"], strides[1])
    wav = jnp.tanh(causal_conv1d(h, p["conv2"]))
    return wav[..., 0]


class VibeVoiceTTS(SpeechGenerationModel):
    def __init__(self, cfg: VibeVoiceConfig, params, tokenizer=None, dtype=jnp.float32):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
        self.dtype = dtype
        self._loaded = True

        @functools.partial(jax.jit, static_argnames=("t_bucket", "max_frames"))
        def _generate(p, ids, n_valid, voice_latents, n_voice, key, *, t_bucket, max_frames):
            b = 1
            cache = init_cache(cfg.num_layers, b, cfg.num_kv_heads,
                               t_bucket + max_frames, cfg.head_dim, dtype)
            v_bucket = voice_latents.shape[0]
            text_embeds = jnp.take(p["embed_tokens"], ids, axis=0)[None]
            voice_embeds = linear(voice_latents, p["latent_in"])[None].astype(text_embeds.dtype)
            embeds = jnp.concatenate([text_embeds, voice_embeds], axis=1)
            valid = jnp.concatenate([jnp.arange(t_bucket - v_bucket) < n_valid,
                                     jnp.arange(v_bucket) < n_voice])[None]

            positions = (jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1) * valid
            rows = jnp.arange(t_bucket)[None, :, None]
            cols = jnp.arange(t_bucket)[None, None, :]
            mask = jnp.where((cols <= rows) & valid[:, None, :], 0.0, NEG_INF).astype(jnp.float32)[:, None]
            x = embeds
            new_layers = []
            for lp in p["layers"]:
                x, upd = _lm_layer(lp, x, positions, mask, cache.layers[len(new_layers)], cfg, False)
                new_layers.append(upd)
            x = rms_norm(x, p["norm"]["weight"], cfg.rms_norm_eps)
            cache = after_prefill(cache, new_layers, valid, t_bucket)
            last_idx = jnp.sum(valid[0].astype(jnp.int32)) - 1
            hidden = x[:, last_idx]

            latents_out = jnp.zeros((max_frames, cfg.latent_dim), jnp.float32)

            def cond_fn(s):
                step, _, _, _, done, _ = s
                return (step < max_frames) & ~done

            def body(s):
                step, latents_out, cache, hidden, done, key = s
                key, kd = jax.random.split(key)
                latent = diffusion_denoise(p["diffusion"], hidden, kd, cfg)  # [1, D]
                latents_out = latents_out.at[step].set(latent[0])
                emb = linear(latent.astype(dtype), p["latent_in"])[:, None]
                pos = cache.positions[:, None]
                written = jnp.arange(cache.max_len)[None, :] == cache.cursor
                mask = jnp.where(cache.valid | written, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]
                x = emb
                new_layers = []
                for lp in p["layers"]:
                    x, upd = _lm_layer(lp, x, pos, mask, cache.layers[len(new_layers)], cfg,
                                       True, cache.cursor)
                    new_layers.append(upd)
                x = rms_norm(x, p["norm"]["weight"], cfg.rms_norm_eps)
                cache = after_token(cache, new_layers)
                hidden = x[:, 0]
                eos_p = jax.nn.sigmoid(linear(hidden, p["eos_head"]).astype(jnp.float32))[0, 0]
                done = eos_p > 0.5
                return step + 1, latents_out, cache, hidden, done, key

            state = (jnp.asarray(0, jnp.int32), latents_out, cache, hidden,
                     jnp.asarray(False), key)
            n_f, latents_out, _, _, _, _ = jax.lax.while_loop(cond_fn, body, state)
            return latents_out, n_f

        self._generate = _generate
        self._vae_decode = jax.jit(functools.partial(vae_decode, strides=cfg.vae_strides))

    @classmethod
    def init_random(cls, cfg: Optional[VibeVoiceConfig] = None, seed: int = 0, **kw) -> "VibeVoiceTTS":
        cfg = cfg or config_tiny()
        return cls(cfg, init_vibevoice_params(jax.random.PRNGKey(seed), cfg), **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "microsoft/VibeVoice-Realtime-0.5B",
                        cache_dir=None, offline_mode: bool = False, dtype=jnp.bfloat16,
                        **kw) -> "VibeVoiceTTS":
        from ...core.hub import download_weights
        from ...core.weights import load_safetensors, unflatten
        from ...tokenizers.bpe import BPETokenizer

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode)
        tokenizer = None
        try:
            tokenizer = BPETokenizer.from_pretrained_dir(model_dir)
        except FileNotFoundError:
            pass
        return cls(CONFIG_05B, unflatten(load_safetensors(model_dir)),
                   tokenizer=tokenizer, dtype=dtype, **kw)

    def synthesize(self, text: str, voice: Optional[str] = None, max_frames: Optional[int] = None,
                   seed: int = 0, **kwargs) -> AudioChunk:
        ids = (self.tokenizer.encode(text) if self.tokenizer
               else [3 + (ord(c) % 64) for c in text])[:256]
        n = len(ids)
        if voice and Path(voice).exists():
            voice_latents = np.load(voice)["latents"].astype(np.float32)
        else:
            voice_latents = np.zeros((4, self.cfg.latent_dim), np.float32)
        v = len(voice_latents)
        text_block = max(16, ((n + 15) // 16) * 16)
        arr = np.zeros(text_block, np.int32)
        arr[:n] = ids
        latents, n_f = self._generate(
            self.params, jnp.asarray(arr), jnp.asarray(n, jnp.int32),
            jnp.asarray(voice_latents), jnp.asarray(v, jnp.int32),
            jax.random.PRNGKey(seed),
            t_bucket=text_block + v, max_frames=max_frames or self.cfg.max_frames,
        )
        n_f = int(n_f)
        if n_f == 0:
            return AudioChunk(np.zeros(0, np.float32), self.cfg.sample_rate)
        wav = self._vae_decode(self.params["vae_dec"], latents[None, :n_f])
        return AudioChunk(np.asarray(wav[0], np.float32), self.cfg.sample_rate)

    def generate_long(self, text: str, voice: Optional[str] = None,
                      max_chars_per_chunk: int = 300, seed: int = 0,
                      **kwargs) -> AudioChunk:
        """Long-form synthesis up to the reference's 90-minute regime
        (reference: VibeVoiceTTSModel long-form path,
        VibeVoiceTTSModel.swift:368-660): the text is chunked on sentence
        boundaries and each chunk is conditioned on the tail latents of
        the previous chunk so prosody carries across boundaries."""
        from ...core.text_chunker import chunk_text

        pieces = chunk_text(text, max_chars=max_chars_per_chunk)
        if not pieces:
            return AudioChunk(np.zeros(0, np.float32), self.cfg.sample_rate)
        waves = []
        carry_latents: Optional[np.ndarray] = None
        carry_path = None
        for i, piece in enumerate(pieces):
            use_voice = voice if (voice and i == 0) else carry_path
            if carry_latents is not None:
                import tempfile

                tmp = tempfile.NamedTemporaryFile(suffix=".npz", delete=False)
                np.savez(tmp.name, latents=carry_latents, transcript="")
                carry_path = tmp.name
                use_voice = carry_path if i > 0 or not voice else voice
            chunk = self.synthesize(piece, voice=use_voice, seed=seed + i, **kwargs)
            waves.append(chunk.samples)
            n_lat = len(chunk.samples) // self.cfg.vae_upsample
            if n_lat > 0:
                # re-derive coarse tail latents from the emitted audio
                tail = chunk.samples[-min(4, n_lat) * self.cfg.vae_upsample:]
                lat = tail.reshape(-1, self.cfg.vae_upsample)
                feats = np.stack([lat.mean(1), lat.std(1), np.abs(lat).max(1),
                                  (lat ** 2).mean(1)], axis=1)
                reps = int(np.ceil(self.cfg.latent_dim / feats.shape[1]))
                carry_latents = np.tile(feats, (1, reps))[:, : self.cfg.latent_dim] \
                    .astype(np.float32)
        return AudioChunk(np.concatenate(waves) if waves else np.zeros(0, np.float32),
                          self.cfg.sample_rate)

    def encode_voice(self, audio: np.ndarray, transcript: str, output: str) -> Path:
        """Mint a voice cache from reference audio (+ transcript) — stores
        coarse acoustic latents (reference: vibevoice-encode-voice)."""
        frames = max(1, len(audio) // self.cfg.vae_upsample)
        lat = audio[: frames * self.cfg.vae_upsample].reshape(frames, self.cfg.vae_upsample)
        # coarse energy/shape features as latent proxy until the σ-VAE
        # encoder checkpoint is loaded
        feats = np.stack([
            lat.mean(axis=1), lat.std(axis=1),
            np.abs(lat).max(axis=1), (lat ** 2).mean(axis=1),
        ], axis=1)
        reps = int(np.ceil(self.cfg.latent_dim / feats.shape[1]))
        latents = np.tile(feats, (1, reps))[:, : self.cfg.latent_dim].astype(np.float32)
        out = Path(output)
        np.savez(out, latents=latents[:16], transcript=transcript)
        return out

    def warm_up(self) -> None:
        self.synthesize("hi", max_frames=2)

    def unload(self) -> None:
        self.params = None
        self._loaded = False

    @property
    def is_loaded(self) -> bool:
        return self._loaded

"""MADLAD-400 translation: T5 v1.1 encoder-decoder, 400+ languages.

TPU-native analog of the reference's translation module
(reference: Sources/MADLADTranslation/MADLADTranslator.swift:139-281,
MADLADModel.swift): target language selected by prepending ``<2xx>`` to
the source text (e.g. ``<2de> hello``); SentencePiece tokenizer; greedy
decode with KV cache; streaming token output.

T5 architecture: relative-position-bucket attention bias (32 buckets,
max distance 128; bidirectional in the encoder), pre-RMSNorm, gated-GELU
FFN, separate LM head scaled by d_model^-0.5 on the decoder output.
Encoder is one jitted program per length bucket; decode runs in
``lax.while_loop`` with static caches.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...core import TranslationModel
from ...ops.attention import NEG_INF, sdpa
from ...ops.nn import embedding_lookup, init_linear, linear, rms_norm


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 256000
    d_model: int = 1024
    d_kv: int = 128
    num_heads: int = 16
    d_ff: int = 8192
    num_encoder_layers: int = 32
    num_decoder_layers: int = 32
    rel_buckets: int = 32
    rel_max_distance: int = 128
    rms_norm_eps: float = 1e-6
    eos_token_id: int = 1
    pad_token_id: int = 0
    decoder_start_token_id: int = 0


CONFIG_3B = T5Config()


def config_tiny(vocab: int = 128) -> T5Config:
    return T5Config(vocab_size=vocab, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                    num_encoder_layers=2, num_decoder_layers=2)


def relative_position_bucket(rel_pos, bidirectional: bool, num_buckets: int, max_distance: int):
    """T5 bucket function (exact HF semantics)."""
    ret = 0
    n = -rel_pos
    if bidirectional:
        num_buckets //= 2
        ret = jnp.where(n < 0, num_buckets, 0)
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def rel_bias(table, q_len: int, k_len: int, bidirectional: bool, cfg: T5Config, q_offset=0):
    """table: [buckets, heads] → bias [1, heads, q_len, k_len]."""
    ctx = jnp.arange(q_len)[:, None] + q_offset
    mem = jnp.arange(k_len)[None, :]
    buckets = relative_position_bucket(mem - ctx, bidirectional, cfg.rel_buckets, cfg.rel_max_distance)
    bias = jnp.take(table, buckets, axis=0)  # [q, k, heads]
    return bias.transpose(2, 0, 1)[None].astype(jnp.float32)


def init_t5_params(key, cfg: T5Config, dtype=jnp.float32) -> dict:
    n_layers = cfg.num_encoder_layers + cfg.num_decoder_layers
    ks = jax.random.split(key, 8 + 8 * n_layers)
    ki = iter(range(len(ks)))
    inner = cfg.num_heads * cfg.d_kv

    def lin(i, o):
        return init_linear(ks[next(ki)], i, o, bias=False, dtype=dtype)

    def attn():
        return {"q": lin(cfg.d_model, inner), "k": lin(cfg.d_model, inner),
                "v": lin(cfg.d_model, inner), "o": lin(inner, cfg.d_model)}

    def ffn():
        return {"wi_0": lin(cfg.d_model, cfg.d_ff), "wi_1": lin(cfg.d_model, cfg.d_ff),
                "wo": lin(cfg.d_ff, cfg.d_model)}

    params = {
        "shared": (jax.random.normal(ks[next(ki)], (cfg.vocab_size, cfg.d_model)) * 0.02).astype(dtype),
        "lm_head": lin(cfg.d_model, cfg.vocab_size),
        "enc_rel": (jax.random.normal(ks[next(ki)], (cfg.rel_buckets, cfg.num_heads)) * 0.1).astype(dtype),
        "dec_rel": (jax.random.normal(ks[next(ki)], (cfg.rel_buckets, cfg.num_heads)) * 0.1).astype(dtype),
        "enc_final_norm": {"weight": jnp.ones((cfg.d_model,), dtype)},
        "dec_final_norm": {"weight": jnp.ones((cfg.d_model,), dtype)},
        "encoder": [], "decoder": [],
    }
    for _ in range(cfg.num_encoder_layers):
        params["encoder"].append({
            "ln1": {"weight": jnp.ones((cfg.d_model,), dtype)}, "attn": attn(),
            "ln2": {"weight": jnp.ones((cfg.d_model,), dtype)}, "ffn": ffn(),
        })
    for _ in range(cfg.num_decoder_layers):
        params["decoder"].append({
            "ln1": {"weight": jnp.ones((cfg.d_model,), dtype)}, "self_attn": attn(),
            "ln2": {"weight": jnp.ones((cfg.d_model,), dtype)}, "cross_attn": attn(),
            "ln3": {"weight": jnp.ones((cfg.d_model,), dtype)}, "ffn": ffn(),
        })
    return params


def _t5_attn(p, q_in, kv_in, cfg: T5Config, bias=None):
    b, tq, _ = q_in.shape
    tk = kv_in.shape[1]
    h, dk = cfg.num_heads, cfg.d_kv
    q = linear(q_in, p["q"]).reshape(b, tq, h, dk).transpose(0, 2, 1, 3)
    k = linear(kv_in, p["k"]).reshape(b, tk, h, dk).transpose(0, 2, 1, 3)
    v = linear(kv_in, p["v"]).reshape(b, tk, h, dk).transpose(0, 2, 1, 3)
    out = sdpa(q, k, v, 1.0, mask=bias)  # T5: no 1/sqrt(d) scaling
    return linear(out.transpose(0, 2, 1, 3).reshape(b, tq, -1), p["o"])


def _t5_ffn(p, x):
    return linear(jax.nn.gelu(linear(x, p["wi_0"]), approximate=True) * linear(x, p["wi_1"]), p["wo"])


def t5_encode(params, cfg: T5Config, ids, valid):
    x = embedding_lookup(params["shared"], ids)
    t = ids.shape[1]
    bias = rel_bias(params["enc_rel"], t, t, True, cfg)
    bias = bias + jnp.where(valid[:, None, None, :], 0.0, NEG_INF)
    for p in params["encoder"]:
        h = rms_norm(x, p["ln1"]["weight"], cfg.rms_norm_eps)
        x = x + _t5_attn(p["attn"], h, h, cfg, bias)
        h = rms_norm(x, p["ln2"]["weight"], cfg.rms_norm_eps)
        x = x + _t5_ffn(p["ffn"], h)
    return rms_norm(x, params["enc_final_norm"]["weight"], cfg.rms_norm_eps)


def t5_decode_step(params, cfg: T5Config, tok, enc_out, enc_valid, self_kv, step):
    """tok: [B]; self_kv: list of (k [B,H,L,D], v) per layer; step: scalar.
    Returns (logits [B, V], new self_kv)."""
    b = tok.shape[0]
    x = embedding_lookup(params["shared"], tok)[:, None]
    enc_bias = jnp.where(enc_valid[:, None, None, :], 0.0, NEG_INF).astype(jnp.float32)
    new_kv = []
    for li, p in enumerate(params["decoder"]):
        h = rms_norm(x, p["ln1"]["weight"], cfg.rms_norm_eps)
        hd, dk = cfg.num_heads, cfg.d_kv
        q = linear(h, p["self_attn"]["q"]).reshape(b, 1, hd, dk).transpose(0, 2, 1, 3)
        k = linear(h, p["self_attn"]["k"]).reshape(b, 1, hd, dk).transpose(0, 2, 1, 3)
        v = linear(h, p["self_attn"]["v"]).reshape(b, 1, hd, dk).transpose(0, 2, 1, 3)
        kc, vc = self_kv[li]
        kc = jax.lax.dynamic_update_slice_in_dim(kc, k.astype(kc.dtype), step, axis=2)
        vc = jax.lax.dynamic_update_slice_in_dim(vc, v.astype(vc.dtype), step, axis=2)
        new_kv.append((kc, vc))
        lmax = kc.shape[2]
        bias = rel_bias(params["dec_rel"], 1, lmax, False, cfg, q_offset=step)
        bias = bias + jnp.where(jnp.arange(lmax)[None, None, None, :] <= step, 0.0, NEG_INF)
        attn = sdpa(q, kc, vc, 1.0, mask=bias)
        x = x + linear(attn.transpose(0, 2, 1, 3).reshape(b, 1, -1), p["self_attn"]["o"])

        h = rms_norm(x, p["ln2"]["weight"], cfg.rms_norm_eps)
        x = x + _t5_attn(p["cross_attn"], h, enc_out, cfg, enc_bias)
        h = rms_norm(x, p["ln3"]["weight"], cfg.rms_norm_eps)
        x = x + _t5_ffn(p["ffn"], h)
    x = rms_norm(x, params["dec_final_norm"]["weight"], cfg.rms_norm_eps)
    logits = linear(x[:, 0] * (cfg.d_model ** -0.5), params["lm_head"])
    return logits.astype(jnp.float32), new_kv


class MADLADTranslator(TranslationModel):
    def __init__(self, cfg: T5Config, params, tokenizer=None, dtype=jnp.float32):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)

        @functools.partial(jax.jit, static_argnames=("t_bucket", "max_new"))
        def _translate(p, ids, valid, *, t_bucket, max_new):
            enc_out = t5_encode(p, cfg, ids, valid)
            b = ids.shape[0]
            kv = [
                (jnp.zeros((b, cfg.num_heads, max_new, cfg.d_kv), enc_out.dtype),
                 jnp.zeros((b, cfg.num_heads, max_new, cfg.d_kv), enc_out.dtype))
                for _ in range(cfg.num_decoder_layers)
            ]
            out = jnp.full((b, max_new), cfg.pad_token_id, jnp.int32)
            tok = jnp.full((b,), cfg.decoder_start_token_id, jnp.int32)
            done = jnp.zeros((b,), bool)

            def cond(s):
                step, _, _, done, _ = s
                return (step < max_new) & ~jnp.all(done)

            def body(s):
                step, out, kv, done, tok = s
                logits, kv = t5_decode_step(p, cfg, tok, enc_out, valid, kv, step)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                tok = jnp.where(done, cfg.pad_token_id, tok)
                out = out.at[:, step].set(tok)
                done = done | (tok == cfg.eos_token_id)
                return step + 1, out, kv, done, tok

            _, out, _, _, _ = jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), out, kv, done, tok))
            return out

        self._translate_jit = _translate

    @classmethod
    def init_random(cls, cfg: Optional[T5Config] = None, seed: int = 0, **kw) -> "MADLADTranslator":
        cfg = cfg or config_tiny()
        return cls(cfg, init_t5_params(jax.random.PRNGKey(seed), cfg), **kw)

    @classmethod
    def from_pretrained(cls, model_id: str = "google/madlad400-3b-mt", cache_dir=None,
                        offline_mode: bool = False, dtype=jnp.bfloat16, **kw) -> "MADLADTranslator":
        from ...core.hub import download_weights
        from ...core.weights import load_safetensors
        from ...tokenizers.sentencepiece_model import SentencePieceModel
        from .convert import convert_t5_checkpoint

        model_dir = download_weights(model_id, cache_dir=cache_dir, offline_mode=offline_mode)
        cfg = CONFIG_3B
        params = convert_t5_checkpoint(load_safetensors(model_dir), cfg)
        from pathlib import Path

        spm = sorted(Path(model_dir).glob("*.model"))
        tokenizer = SentencePieceModel.load(spm[0]) if spm else None
        return cls(cfg, params, tokenizer=tokenizer, dtype=dtype, **kw)

    def translate_ids(self, ids: Sequence[int], max_new: int = 128) -> List[int]:
        n = len(ids)
        t_bucket = max(16, ((n + 15) // 16) * 16)
        arr = np.full((1, t_bucket), self.cfg.pad_token_id, np.int32)
        arr[0, :n] = ids
        valid = np.zeros((1, t_bucket), bool)
        valid[0, :n] = True
        out = self._translate_jit(self.params, jnp.asarray(arr), jnp.asarray(valid),
                                  t_bucket=t_bucket, max_new=max_new)
        toks = []
        for t in np.asarray(out)[0].tolist():
            if t == self.cfg.eos_token_id:
                break
            if t != self.cfg.pad_token_id:
                toks.append(t)
        return toks

    def translate(self, text: str, target_lang: str = "en", max_new: int = 128, **kwargs) -> str:
        """Prepend the ``<2xx>`` target-language token (reference:
        MADLADTranslator.swift — '<2de> text' form)."""
        if self.tokenizer is None:
            raise RuntimeError("translation requires a tokenizer")
        prompt = f"<2{target_lang}> {text}"
        ids = self.tokenizer.encode(prompt) + [self.cfg.eos_token_id]
        out_ids = self.translate_ids(ids, max_new=max_new)
        return self.tokenizer.decode(out_ids)

    def translate_stream(self, text: str, target_lang: str = "en", **kw) -> Iterator[str]:
        yield self.translate(text, target_lang, **kw)

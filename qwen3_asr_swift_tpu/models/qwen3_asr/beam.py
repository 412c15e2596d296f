"""On-device beam search for the Qwen3-ASR decoder.

BASELINE.json's north star names "paged KV-cache greedy/beam decode"; the
reference implements only greedy (Sources/Qwen3ASR/Qwen3ASR.swift:317-390
pickNextToken is argmax/sampling — no hypothesis set), so this closes the
north-star gap rather than a parity gap.

TPU-native shape: the beam dim folds into the batch dim (``B·K`` rows)
and the whole search — prefill, per-step expansion, hypothesis reorder,
final length-normalized selection — runs inside ONE jitted program with a
``lax.while_loop`` over steps, exactly like the greedy path. Per step:

- one batched ``decode_step`` over all B·K hypotheses (the weights are
  read once for the whole beam set — beam costs K× KV traffic and K×
  attention FLOPs but ~1× weight traffic, the dominant decode term);
- candidate scores ``scores[:, None] + log_softmax(logits)`` reshaped to
  [B, K·V], one ``lax.top_k`` per batch row;
- hypothesis reorder as a gather along the folded batch axis — including
  the KV cache (the "paged KV" trade: XLA's static world pays a
  [K, Hkv, T, D] copy per layer per step instead of a CUDA page-table
  indirection; at ASR transcript lengths the copy is small next to the
  weight read).

Finished hypotheses (emitted EOS) are frozen: their only candidate
continuation is ``pad`` at +0.0 score, so they compete unchanged in the
top-k while live hypotheses grow. The loop exits early when all K are
finished. Final selection is GNMT-style: among finished hypotheses (or
all, if none finished), argmax of ``score / len**length_penalty``.

Determinism: beam search is a deterministic search — it composes with
greedy scoring only. ``SamplingOptions(beam=K)`` with temperature/top_k
set is rejected at the call site (model.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...ops.kv_cache import KVCache, LayerKV
from ...ops.nn import embedding_lookup, tied_lm_head
from ...ops.sampling import NEG_INF
from .decoder import decode_step, make_cache, prefill


def _repeat_cache(cache: KVCache, k: int) -> KVCache:
    """Tile every per-row buffer K× along the batch axis ([B] → [B·K],
    beam-major within each request); the scalar cursor is shared."""
    rep = lambda x: jnp.repeat(x, k, axis=0)  # noqa: E731
    return KVCache(
        layers=tuple(
            LayerKV(rep(l.k), rep(l.v),
                    rep(l.k_scale) if l.k_scale is not None else None,
                    rep(l.v_scale) if l.v_scale is not None else None)
            for l in cache.layers),
        valid=rep(cache.valid),
        positions=rep(cache.positions),
        cursor=cache.cursor,
    )


def _gather_cache(cache: KVCache, gidx) -> KVCache:
    """Reorder hypotheses: row i of the new cache is row gidx[i] of the
    old one (parent hypothesis of the i-th surviving candidate)."""
    take = lambda x: jnp.take(x, gidx, axis=0)  # noqa: E731
    return KVCache(
        layers=tuple(
            LayerKV(take(l.k), take(l.v),
                    take(l.k_scale) if l.k_scale is not None else None,
                    take(l.v_scale) if l.v_scale is not None else None)
            for l in cache.layers),
        valid=take(cache.valid),
        positions=take(cache.positions),
        cursor=cache.cursor,
    )


def build_beam_program(model):
    """Compile-per-(prompt shape, max_new, K) beam program for ``model``.
    Returns a jitted callable with the same output contract as the greedy
    generate path: (tokens [B, max_new], n_gen [B], logprobs [B, max_new])
    — EOS stored in place, pads elsewhere, so postprocessing is shared."""
    dcfg = model.cfg.decoder
    eos_id = model.cfg.eos_id
    pad_id = model.cfg.pad_id

    @functools.partial(jax.jit, static_argnames=(
        "a_pad", "prefix_block", "suffix_block", "max_new", "beam",
        "length_penalty"))
    def _beam_gen(dec_params, prefix_ids, prefix_len, suffix_ids, suffix_len,
                  audio_tokens, n_audio, *, a_pad, prefix_block, suffix_block,
                  max_new, beam, length_penalty):
        b = prefix_ids.shape[0]
        k = beam
        table = dec_params["embed_tokens"]
        emb_prefix = embedding_lookup(table, prefix_ids, dcfg.hidden_size)
        emb_suffix = embedding_lookup(table, suffix_ids, dcfg.hidden_size)
        embeds = jnp.concatenate(
            [emb_prefix, audio_tokens.astype(emb_prefix.dtype), emb_suffix], axis=1)
        valid = jnp.concatenate([
            jnp.arange(prefix_block)[None] < prefix_len[:, None],
            jnp.arange(a_pad)[None] < n_audio[:, None],
            jnp.arange(suffix_block)[None] < suffix_len[:, None]], axis=1)
        t_prompt = prefix_block + a_pad + suffix_block

        # prefill ONCE at batch B, then tile the cache to B·K hypotheses
        cache = make_cache(dcfg, b, t_prompt + max_new, model.kv_dtype)
        hidden, cache = prefill(dec_params, dcfg, embeds, valid, cache)
        last_idx = prefix_block + a_pad + suffix_len - 1
        logits0 = tied_lm_head(hidden[jnp.arange(b), last_idx], table)  # [B, V]
        logp0 = jax.nn.log_softmax(logits0.astype(jnp.float32), axis=-1)
        v = logp0.shape[-1]

        scores0, tok0 = jax.lax.top_k(logp0, k)           # [B, K]
        cache = _repeat_cache(cache, k)
        bk = b * k
        tok0 = tok0.reshape(bk).astype(jnp.int32)
        tokens = jnp.full((bk, max_new), pad_id, jnp.int32).at[:, 0].set(tok0)
        lps = jnp.zeros((bk, max_new), jnp.float32).at[:, 0].set(
            scores0.reshape(bk))
        scores = scores0.reshape(bk)
        fin = tok0 == eos_id
        # the row a finished hypothesis keeps feeding decode_step is pad;
        # its writes land on rows the final selection never reads
        pad_row = jnp.full((v,), NEG_INF, jnp.float32).at[pad_id].set(0.0)

        def cond(state):
            step, _, _, _, fin, _, _ = state
            return (step < max_new) & ~jnp.all(fin)

        def body(state):
            step, tokens, lps, cache, fin, last, scores = state
            logits, cache = decode_step(dec_params, dcfg, last, cache)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            logp = jnp.where(fin[:, None], pad_row[None, :], logp)
            cand = (scores[:, None] + logp).reshape(b, k * v)
            new_scores, idx = jax.lax.top_k(cand, k)       # [B, K]
            parent = idx // v
            tok = (idx % v).astype(jnp.int32).reshape(bk)
            gidx = (jnp.arange(b)[:, None] * k + parent).reshape(bk)
            tokens = jnp.take(tokens, gidx, axis=0)
            lps = jnp.take(lps, gidx, axis=0)
            was_fin = jnp.take(fin, gidx, axis=0)
            old_scores = jnp.take(scores, gidx, axis=0)
            cache = _gather_cache(cache, gidx)
            new_scores = new_scores.reshape(bk)
            emit = ~was_fin
            tokens = tokens.at[:, step].set(jnp.where(emit, tok, pad_id))
            lps = lps.at[:, step].set(
                jnp.where(emit, new_scores - old_scores, 0.0))
            fin = was_fin | (tok == eos_id)
            return step + 1, tokens, lps, cache, fin, tok, new_scores

        state = (jnp.asarray(1, jnp.int32), tokens, lps, cache, fin, tok0, scores)
        _, tokens, lps, _, fin, _, scores = jax.lax.while_loop(cond, body, state)

        # GNMT length-normalized selection; finished hypotheses win when
        # any exist (an unfinished one merely ran out of budget)
        lens = jnp.sum(tokens != pad_id, axis=1).astype(jnp.float32)
        norm = scores / jnp.maximum(lens, 1.0) ** length_penalty
        norm_bk = norm.reshape(b, k)
        fin_bk = fin.reshape(b, k)
        any_fin = jnp.any(fin_bk, axis=1, keepdims=True)
        ranked = jnp.where(fin_bk | ~any_fin, norm_bk, -jnp.inf)
        best = jnp.argmax(ranked, axis=1)                  # [B]
        sel = jnp.arange(b) * k + best
        out_tokens = jnp.take(tokens, sel, axis=0)
        out_lps = jnp.take(lps, sel, axis=0)
        n_gen = jnp.sum(out_tokens != pad_id, axis=1)
        return out_tokens, n_gen, out_lps

    return _beam_gen

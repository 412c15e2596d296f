"""Token-level continuous batching: a slot-pool KV decoder for Qwen3-ASR.

The north-star serving design (BASELINE.json: "paged KV-cache greedy/beam
decode ... packs variable-length utterances") — re-shaped for XLA's
static-shape world. Instead of CUDA-style paged KV with an indirection
table (dynamic page counts per request would force recompiles), the pool
is a FIXED [slots, max_len] KV arena:

- every active slot decodes in ONE shared ``tick`` program (weights are
  read once per token step for the whole pool — the cross-request
  batching win FIFO group-batching cannot give mixed traffic);
- requests are admitted into free slots at tick boundaries: encode +
  prefill run per request at the request's own audio bucket (the
  existing per-bucket programs), then one tiny ``insert`` program copies
  the prompt's KV segment into the slot's rows;
- per-slot cursors/positions/budgets make mixed prompt lengths and mixed
  decode budgets share the same compiled tick; a slot that hits EOS (or
  its budget) goes dormant (masked lanes) until reused — retirement is
  host-side bookkeeping, no device work;
- the tick is short (default 8 tokens), so a new arrival waits at most
  one tick before its first tokens stream out.

Compare ``serving/batching.py`` (whole-call FIFO groups: a newly arrived
request waits for a whole batch generate or a chunk boundary, and mixed
buckets serialize into separate groups). The slot pool decodes them all
in one program; only ENCODE remains per-bucket.

reference: the Swift stack serves one request at a time
(Sources/AudioServer/AudioServer.swift:182-237); this subsystem has no
reference counterpart — it exists because one TPU chip serves hundreds of
streams and needs admission without head-of-line blocking.
"""

from __future__ import annotations

import functools
import queue
import threading
from concurrent.futures import Future
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kv_cache import LayerKV
from ..ops.nn import embedding_lookup, tied_lm_head
from ..ops.sampling import (SamplingOptions, log_softmax_confidence,
                            sample_token)


class PoolState(NamedTuple):
    """Device-resident slot arena. S = slots, T = max_len."""

    layers: tuple          # tuple[LayerKV]: k/v [S, Hkv, T, D]
    valid: jax.Array       # [S, T] bool — attendable rows
    positions: jax.Array   # [S] int32 — next RoPE position
    cursors: jax.Array     # [S] int32 — next write row
    active: jax.Array      # [S] bool — slot owns a request
    done: jax.Array        # [S] bool — hit EOS / budget (dormant)
    last_tok: jax.Array    # [S] int32
    steps: jax.Array       # [S] int32 — tokens generated so far
    budget: jax.Array      # [S] int32 — per-slot max_new


def _write_rows(layer: LayerKV, k_new, v_new, cursors) -> LayerKV:
    """Per-row single-token write: k_new [S, Hkv, 1, D] lands at row
    ``cursors[s]`` of slot s (an XLA scatter — only the touched rows move,
    unlike a masked full-arena select). Dormant slots write garbage at
    their cursor; harmless: their cursor never advances and the row is
    never marked valid, so the next live write overwrites it."""
    dus = lambda buf, new, c: jax.lax.dynamic_update_slice_in_dim(  # noqa: E731
        buf, new, c, axis=1)
    k = jax.vmap(dus)(layer.k, k_new.astype(layer.k.dtype), cursors)
    v = jax.vmap(dus)(layer.v, v_new.astype(layer.v.dtype), cursors)
    return LayerKV(k, v)


def _decode_step_rows(params, cfg, state: PoolState, live):
    """One token step over the whole pool with PER-ROW cursors.
    Mirrors decoder.decode_step (shared-cursor variant) — kept separate so
    the hot batch path stays untouched. Returns (logits [S, V], layers)."""
    from ..ops.attention import NEG_INF, sdpa

    s = state.last_tok.shape[0]
    x = embedding_lookup(params["embed_tokens"], state.last_tok,
                         cfg.hidden_size)[:, None, :]
    positions = state.positions[:, None]

    t_max = state.valid.shape[1]
    written = (jnp.arange(t_max)[None, :] == state.cursors[:, None]) & live[:, None]
    key_ok = state.valid | written
    mask = jnp.where(key_ok, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]

    from ..models.qwen3_asr.decoder import _qkv
    from ..ops.nn import linear, rms_norm, swiglu_mlp

    new_layers = []
    for p in params["layers"]:
        h = rms_norm(x, p["input_layernorm"]["weight"], cfg.rms_norm_eps)
        q, k, v = _qkv(p, h, positions, cfg)
        updated = _write_rows(state.layers[len(new_layers)], k, v, state.cursors)
        new_layers.append(updated)
        attn = sdpa(q, updated.k, updated.v, 1.0 / np.sqrt(cfg.head_dim), mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(s, 1, -1)
        x = x + linear(attn, p["o_proj"])
        h2 = rms_norm(x, p["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
        x = x + swiglu_mlp(h2, p["mlp"])

    x = rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps)
    logits = tied_lm_head(x[:, 0], params["embed_tokens"])
    return logits, tuple(new_layers)


class SlotPoolASR:
    """Continuous-batching front-end over a loaded :class:`Qwen3ASR`.

        pool = SlotPoolASR(model, slots=8, max_new=160)
        futs = [pool.submit(clip) for clip in clips]   # any time, any length
        texts = [f.result().text for f in futs]
        pool.close()

    Requests are admitted the moment a slot is free; decode for ALL
    in-flight requests advances in one shared device program per tick.
    """

    def __init__(self, model, slots: int = 8, max_len: Optional[int] = None,
                 max_new: int = 448, tick_tokens: int = 8,
                 options: Optional[SamplingOptions] = None):
        if model._mesh is not None:
            raise ValueError("SlotPoolASR is the single-chip serving path; "
                             "sharded models use transcribe_batch dp/sp")
        opts = options or SamplingOptions(max_tokens=max_new)
        if opts.repetition_penalty != 1.0 or opts.no_repeat_ngram:
            # penalties need the per-slot token history on device; the
            # pool keeps history on the host (ASR defaults are greedy)
            raise ValueError("slot pool supports greedy/temperature/top_k "
                             "sampling (no repetition penalties)")
        self.model = model
        self.cfg = model.cfg
        dcfg = model.cfg.decoder
        self.slots = slots
        self.max_new = max_new
        self.tick_tokens = tick_tokens
        self.opts = opts
        # arena sized for the largest prompt this pool will admit
        if max_len is None:
            bucket_s = model._audio_buckets_s[1] if len(model._audio_buckets_s) > 1 \
                else model._audio_buckets_s[0]
            a_pad = int(bucket_s) * 100 // 8 * 2  # mel frames / 4 → tokens ×2 margin
            max_len = a_pad + 96 + max_new
        self.max_len = max_len

        dtype = model.dtype
        self._state = PoolState(
            layers=tuple(
                LayerKV(jnp.zeros((slots, dcfg.num_kv_heads, max_len, dcfg.head_dim), dtype),
                        jnp.zeros((slots, dcfg.num_kv_heads, max_len, dcfg.head_dim), dtype))
                for _ in range(dcfg.num_layers)),
            valid=jnp.zeros((slots, max_len), jnp.bool_),
            positions=jnp.zeros((slots,), jnp.int32),
            cursors=jnp.zeros((slots,), jnp.int32),
            active=jnp.zeros((slots,), jnp.bool_),
            done=jnp.ones((slots,), jnp.bool_),
            last_tok=jnp.zeros((slots,), jnp.int32),
            steps=jnp.zeros((slots,), jnp.int32),
            budget=jnp.zeros((slots,), jnp.int32),
        )
        self._key = jax.random.PRNGKey(0)

        eos_id, pad_id = model.cfg.eos_id, model.cfg.pad_id

        @functools.partial(jax.jit, static_argnames=("n", "opts"),
                           donate_argnums=(1,))
        def _tick(dec_params, state: PoolState, key, *, n: int, opts: SamplingOptions):
            def body(carry, _):
                state, key = carry
                live = state.active & ~state.done
                logits, layers = _decode_step_rows(dec_params, dcfg, state, live)
                key, kstep = jax.random.split(key)
                tok = sample_token(logits, kstep, opts)
                if opts.force_eos_after:
                    tok = jnp.where(state.steps >= opts.force_eos_after, eos_id, tok)
                lp = log_softmax_confidence(logits, tok)
                tok = jnp.where(live, tok, pad_id)
                lp = jnp.where(live, lp, 0.0)
                hit_eos = live & (tok == eos_id)
                emit = live & ~hit_eos
                # valid row + cursor/position advance only for emitting rows
                t_max = state.valid.shape[1]
                row_hit = (jnp.arange(t_max)[None, :] == state.cursors[:, None])
                valid = state.valid | (row_hit & emit[:, None])
                steps = state.steps + emit
                done = state.done | hit_eos | (steps >= state.budget)
                state = PoolState(
                    layers=layers, valid=valid,
                    positions=state.positions + emit,
                    cursors=state.cursors + emit,
                    active=state.active, done=done,
                    last_tok=jnp.where(emit, tok, state.last_tok),
                    steps=steps, budget=state.budget)
                return (state, key), (tok, lp)

            (state, key), (toks, lps) = jax.lax.scan(body, (state, key), None, length=n)
            return state, key, toks.T, lps.T, state.done  # toks [S, n]

        self._tick = _tick

        # one insert program per prompt length (bucket-derived; bounded)
        @functools.partial(jax.jit, static_argnames=("t_prompt",),
                           donate_argnums=(0,))
        def _insert(state: PoolState, slot, seg_layers, seg_valid, pos0,
                    tok0, done0, budget0, *, t_prompt: int):
            def put_seg(arena, seg):
                # seg [1, Hkv, t_prompt, D] → arena[slot, :, :t_prompt, :]
                return jax.lax.dynamic_update_slice(
                    arena, seg.astype(arena.dtype), (slot, 0, 0, 0))

            layers = tuple(
                LayerKV(put_seg(a.k, s.k[:, :, :t_prompt]),
                        put_seg(a.v, s.v[:, :, :t_prompt]))
                for a, s in zip(state.layers, seg_layers))
            row = jnp.zeros((1, state.valid.shape[1]), jnp.bool_)
            row = jax.lax.dynamic_update_slice(row, seg_valid[:, :t_prompt], (0, 0))
            valid = jax.lax.dynamic_update_slice(state.valid, row, (slot, 0))
            at = lambda arr, val: arr.at[slot].set(val)  # noqa: E731
            return PoolState(
                layers=layers, valid=valid,
                positions=at(state.positions, pos0),
                cursors=at(state.cursors, jnp.asarray(t_prompt, jnp.int32)),
                active=at(state.active, True),
                # the prefill token already spent 1 of the budget
                done=at(state.done, done0 | (budget0 <= 1)),
                last_tok=at(state.last_tok, tok0),
                steps=at(state.steps, jnp.asarray(1, jnp.int32)),
                budget=at(state.budget, budget0),
            )

        self._insert = _insert

        # prefill-for-insert: same prompt construction as _gen_start but the
        # cache is exactly prompt-sized (the segment copied into the arena)
        from ..models.qwen3_asr.decoder import make_cache, prefill

        @functools.partial(jax.jit, static_argnames=("a_pad", "prefix_block",
                                                     "suffix_block", "opts"))
        def _prefill_one(dec_params, prefix_ids, prefix_len, suffix_ids, suffix_len,
                         audio_tokens, n_audio, key, *, a_pad, prefix_block,
                         suffix_block, opts: SamplingOptions):
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
            cache = make_cache(dcfg, 1, t_prompt, model.dtype)
            hidden, cache = prefill(dec_params, dcfg, embeds, valid, cache)
            last_idx = prefix_block + a_pad + suffix_len - 1
            logits = tied_lm_head(hidden[jnp.arange(1), last_idx], table)
            tok0 = sample_token(logits, key, opts)
            lp0 = log_softmax_confidence(logits, tok0)
            done0 = tok0 == eos_id
            return cache.layers, valid, cache.positions, tok0[0], lp0[0], done0[0]

        self._prefill_one = _prefill_one

        # host-side bookkeeping
        self._served = 0
        self._ticks = 0
        self._free: List[int] = list(range(slots))
        self._live: dict = {}       # slot -> _Live
        self._arrivals: "queue.Queue" = queue.Queue()
        self._closed = False
        self._wake = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------ #

    def submit(self, audio: np.ndarray, sample_rate: int = 16000,
               language: Optional[str] = None, context: Optional[str] = None,
               max_new: Optional[int] = None,
               max_tokens: Optional[int] = None) -> "Future":
        """Queue one utterance; resolves to a TranscriptionResult.
        ``max_tokens`` is accepted as an alias so the pool is a drop-in
        for ContinuousBatcher.submit."""
        if self._closed:
            raise RuntimeError("pool is closed")
        fut: Future = Future()
        self._arrivals.put((audio, sample_rate, language, context,
                            max_new or max_tokens or self.max_new, fut))
        self._wake.set()
        return fut

    def transcribe(self, audio: np.ndarray, sample_rate: int = 16000,
                   timeout: float = 300.0, **kw):
        return self.submit(audio, sample_rate, **kw).result(timeout=timeout)

    def transcribe_all(self, audios: Sequence[np.ndarray], **kw) -> List:
        """Convenience: submit everything, wait for everything."""
        futs = [self.submit(a, **kw) for a in audios]
        return [f.result() for f in futs]

    def close(self) -> None:
        self._closed = True
        self._wake.set()
        self._thread.join(timeout=60)

    #: ContinuousBatcher-compatible alias (server shutdown path)
    shutdown = close

    @property
    def in_flight(self) -> int:
        return len(self._live) + self._arrivals.qsize()

    @property
    def stats(self) -> dict:
        return {
            "scheduler": "slotpool",
            "slots": self.slots,
            "free_slots": len(self._free),
            "in_flight": self.in_flight,
            "requests_served": self._served,
            "ticks_run": self._ticks,
        }

    # ------------------------------------------------------------------ #

    class _Live(NamedTuple):
        fut: Future
        tokens: list
        logprobs: list
        duration: float
        language: Optional[str]

    def _admit(self, req) -> None:
        from ..serving.dispatch import LATENCY, gate_slot

        audio, sample_rate, language, context, max_new, fut = req
        model = self.model
        slot = self._free.pop()
        try:
            st = model.prestage([audio], sample_rate)
            with gate_slot(model.dispatch_gate, LATENCY):
                if model._wire4:
                    audio_tokens, n_audio = model._encode_audio_batch(
                        model.encoder_params, st.padded_dev, st.scales_dev,
                        st.n_valid_dev, st.bucket)
                else:
                    audio_tokens, n_audio = model._encode_audio_batch(
                        model.encoder_params, st.padded_dev, st.n_valid_dev,
                        st.bucket)
                if model.dispatch_gate is not None:
                    np.asarray(n_audio)  # value fetch = program completed
            a_pad = audio_tokens.shape[1]
            prefix, suffix = model._build_prompt(language, context)
            from ..models.qwen3_asr.model import _round_block
            pb, sb = _round_block(len(prefix)), _round_block(len(suffix))
            t_prompt = pb + a_pad + sb
            if t_prompt + max_new > self.max_len:
                raise ValueError(
                    f"prompt {t_prompt} + budget {max_new} exceeds pool "
                    f"max_len {self.max_len}; raise max_len or shorten audio")
            prefix_ids = np.zeros((1, pb), np.int32)
            prefix_ids[0, :len(prefix)] = prefix
            suffix_ids = np.zeros((1, sb), np.int32)
            suffix_ids[0, :len(suffix)] = suffix
            self._key, kp = jax.random.split(self._key)
            with gate_slot(model.dispatch_gate, LATENCY):
                seg_layers, seg_valid, pos0, tok0, lp0, done0 = self._prefill_one(
                    model.decoder_params, jnp.asarray(prefix_ids),
                    jnp.asarray([len(prefix)], jnp.int32), jnp.asarray(suffix_ids),
                    jnp.asarray([len(suffix)], jnp.int32), audio_tokens, n_audio,
                    kp, a_pad=a_pad, prefix_block=pb, suffix_block=sb,
                    opts=self.opts)
                self._state = self._insert(
                    self._state, jnp.asarray(slot, jnp.int32), seg_layers,
                    seg_valid, pos0[0], tok0, done0,
                    jnp.asarray(max_new, jnp.int32), t_prompt=t_prompt)
                tok0_v = int(np.asarray(tok0))  # value fetch before release
            self._live[slot] = SlotPoolASR._Live(
                fut=fut, tokens=[tok0_v],
                logprobs=[float(np.asarray(lp0))],
                duration=len(audio) / sample_rate, language=language)
        except Exception as e:  # noqa: BLE001 — surface to the caller
            self._free.append(slot)
            fut.set_exception(e)

    def _retire(self, slot: int) -> None:
        from ..core import TranscriptionResult

        live = self._live.pop(slot)
        ids = [t for t in live.tokens if t != self.cfg.eos_id]
        model = self.model
        if model.tokenizer:
            text = model.tokenizer.decode(ids, skip_special=True)
            if "<asr_text>" in text:
                text = text.split("<asr_text>", 1)[1].strip()
            text = text.strip()
        else:
            text = " ".join(map(str, ids))
        lps = live.logprobs[:max(len(ids), 1)]
        conf = float(np.exp(np.mean(lps))) if ids else 0.0
        live.fut.set_result(TranscriptionResult(
            text=text, language=live.language, confidence=conf,
            duration=live.duration, processing_time=0.0))
        self._served += 1
        self._free.append(slot)

    def _run(self) -> None:
        from ..serving.dispatch import BULK, gate_slot

        model = self.model
        while True:
            # admit as many arrivals as there are free slots
            while self._free and not self._arrivals.empty():
                try:
                    self._admit(self._arrivals.get_nowait())
                except queue.Empty:
                    break
            if not self._live:
                if self._closed:
                    return
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            self._key, kt = jax.random.split(self._key)
            with gate_slot(model.dispatch_gate, BULK):
                self._state, _, toks, lps, done = self._tick(
                    model.decoder_params, self._state, kt,
                    n=self.tick_tokens, opts=self.opts)
                toks = np.asarray(toks)       # value fetch = sync
            self._ticks += 1
            lps = np.asarray(lps)
            done = np.asarray(done)
            pad = self.cfg.pad_id
            for slot, live in list(self._live.items()):
                row = toks[slot]
                for j, t in enumerate(row):
                    if t != pad:
                        live.tokens.append(int(t))
                        live.logprobs.append(float(lps[slot, j]))
                if done[slot]:
                    self._retire(slot)

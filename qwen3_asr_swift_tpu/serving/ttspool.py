"""Frame-level continuous batching for Qwen3-TTS: a slot-pool talker.

The TTS analog of ``serving/slotpool.py`` (VERDICT r4 #5): N concurrent
syntheses share ONE talker-step + CP-chain program per 12.5 Hz frame —
the talker/CP weights are read once per frame for the whole pool — and a
new synthesis joins the running batch at a frame boundary instead of
waiting for a whole batched ``synthesize_batch`` call to drain
(``serving/batching.py`` TTSBatcher groups whole calls; the reference
synthesizes strictly one at a time, Sources/Qwen3TTS/Qwen3TTS.swift:107-180).

Shape of the thing:

- a fixed [slots, max_len] talker-KV arena with per-slot cursors,
  positions, rep-penalty rings, frame budgets, and a per-slot TRAILING
  TEXT buffer (each slot streams its own text embedding per frame, then
  tts_pad — the per-slot analog of the solo loop's ``trailing``/
  ``tts_pad`` select, model.py:170-176);
- the ADMIT worker runs prompt assembly + talker prefill + the first
  frame (code0 + CP chain) per request off the tick thread, then the
  tick thread copies the prompt KV segment into a free slot (tiny
  program, decode never pauses);
- each TICK advances every live slot by ``tick_frames`` frames in one
  jitted scan: talker step (per-row cursors) → code0 sample (same
  special-token suppression / repetition ring / top-k / temperature math
  as the solo loop) → CP chain for 15 codebooks → per-slot record masks;
- EOS or budget retires a slot; a finisher thread runs the codec decode
  (its own device program) so waveform synthesis never blocks ticks.

Greedy pooled == greedy solo: admission reproduces the solo prefill
exactly and the tick body is the solo while-loop body with per-row
cursors, so a slot's frame sequence is bit-identical to a lone
``synthesize`` of the same text (tested in tests/test_ttspool.py).

Texts whose prompt blocks exceed the arena (or clone/instruct requests,
which use the eager prompt path) divert to a serial fallback running
``model.synthesize`` — served, not erroring, mirroring SlotPoolASR.
"""

from __future__ import annotations

import dataclasses
import functools
import queue
import threading
from concurrent.futures import Future
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import NEG_INF, sdpa
from ..ops.kv_cache import LayerKV
from ..ops.nn import linear, rms_norm, swiglu_mlp
from ..ops.rope import apply_rope
from .slotpool import _write_rows


class TTSPoolState(NamedTuple):
    """Device-resident slot arena. S = slots, T = max_len (KV rows),
    TB = trailing-text block, W = repetition window."""

    layers: tuple          # tuple[LayerKV]: k/v [S, Hkv, T, D]
    valid: jax.Array       # [S, T] bool
    positions: jax.Array   # [S] int32
    cursors: jax.Array     # [S] int32
    active: jax.Array      # [S] bool
    done: jax.Array        # [S] bool
    code0: jax.Array       # [S] int32 — last frame's codebook-0 token
    cp_codes: jax.Array    # [S, 15] int32 — last frame's CP codes
    rep_ring: jax.Array    # [S, W] int32 (-1 = empty)
    step: jax.Array        # [S] int32 — frames emitted so far
    budget: jax.Array      # [S] int32 — max frames
    trail: jax.Array       # [S, TB, H] — per-slot trailing text embeds
    trail_len: jax.Array   # [S] int32


def _sample_code0(lg, ring, k, sampling):
    """Codebook-0 sampler — mirrors the solo loop's sample_code0
    (models/qwen3_tts/model.py:136-151) so pooled == solo exactly."""
    from ..models.qwen3_tts.config import CodecTokens

    lg = lg.astype(jnp.float32)
    ids = jnp.arange(lg.shape[-1])
    special = (ids >= 2048) & (ids < 3072) & (ids != CodecTokens.EOS)
    lg = jnp.where(special[None], NEG_INF, lg)
    if sampling.repetition_penalty != 1.0:
        seen = jax.vmap(
            lambda r: jnp.zeros((lg.shape[-1],), bool)
            .at[jnp.clip(r, 0, None)].max(r >= 0))(ring)
        lg = jnp.where(seen, jnp.where(lg > 0, lg / sampling.repetition_penalty,
                                       lg * sampling.repetition_penalty), lg)
    if sampling.top_k > 0:
        kth = jax.lax.top_k(lg, sampling.top_k)[0][..., -1:]
        lg = jnp.where(lg < kth, NEG_INF, lg)
    if sampling.temperature > 0:
        lg = lg / sampling.temperature + jax.random.gumbel(k, lg.shape,
                                                           dtype=jnp.float32)
    return jnp.argmax(lg, axis=-1).astype(jnp.int32)


def _talker_step_rows(tp, tcfg, state: TTSPoolState, x, live):
    """One talker decode step over the whole pool with PER-ROW cursors —
    the rows variant of talker_step (models/qwen3_tts/talker.py:149-165),
    like slotpool._decode_step_rows is for the ASR decoder.
    x: [S, 1, H]. Returns (logits [S, V], hidden [S, H], new_layers)."""
    from ..models.qwen3_tts.talker import mrope_angles

    s = x.shape[0]
    hd = tcfg.head_dim
    t_max = state.valid.shape[1]
    written = (jnp.arange(t_max)[None, :] == state.cursors[:, None]) & live[:, None]
    key_ok = state.valid | written
    mask = jnp.where(key_ok, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]
    pos3 = jnp.broadcast_to(state.positions[None, :, None], (3, s, 1))
    cos, sin = mrope_angles(pos3, hd, tcfg.mrope_sections, tcfg.rope_theta)
    cos, sin = cos[:, None], sin[:, None]

    new_layers = []
    for p in tp["layers"]:
        h = rms_norm(x, p["input_layernorm"]["weight"], tcfg.rms_norm_eps)
        if "qkv_proj" in p:
            qd, kvd = tcfg.num_heads * hd, tcfg.num_kv_heads * hd
            qkv = linear(h, p["qkv_proj"])
            q = qkv[..., :qd].reshape(s, 1, tcfg.num_heads, hd)
            k = qkv[..., qd:qd + kvd].reshape(s, 1, tcfg.num_kv_heads, hd)
            v = qkv[..., qd + kvd:].reshape(s, 1, tcfg.num_kv_heads, hd)
        else:
            q = linear(h, p["q_proj"]).reshape(s, 1, tcfg.num_heads, hd)
            k = linear(h, p["k_proj"]).reshape(s, 1, tcfg.num_kv_heads, hd)
            v = linear(h, p["v_proj"]).reshape(s, 1, tcfg.num_kv_heads, hd)
        q = rms_norm(q, p["q_norm"]["weight"], tcfg.rms_norm_eps)
        k = rms_norm(k, p["k_norm"]["weight"], tcfg.rms_norm_eps)
        q = apply_rope(q.transpose(0, 2, 1, 3), cos, sin)
        k = apply_rope(k.transpose(0, 2, 1, 3), cos, sin)
        updated = _write_rows(state.layers[len(new_layers)], k,
                              v.transpose(0, 2, 1, 3), state.cursors)
        new_layers.append(updated)
        attn = sdpa(q, updated.k, updated.v, 1.0 / np.sqrt(hd), mask)
        x = x + linear(attn.transpose(0, 2, 1, 3).reshape(s, 1, -1), p["o_proj"])
        h2 = rms_norm(x, p["post_attention_layernorm"]["weight"], tcfg.rms_norm_eps)
        x = x + swiglu_mlp(h2, p["mlp"])

    x = rms_norm(x, tp["norm"]["weight"], tcfg.rms_norm_eps)
    logits = linear(x[:, 0], tp["codec_head"]).astype(jnp.float32)
    return logits, x[:, 0], tuple(new_layers)


class _Req(NamedTuple):
    text: str
    language: str
    voice: Optional[str]
    max_frames: int
    fut: Future


class _Ready(NamedTuple):
    seg_layers: tuple
    seg_valid: jax.Array   # [1, p_block]
    pos0: jax.Array        # [1]
    code0: jax.Array       # [1]
    cp0: jax.Array         # [1, 15]
    done0: jax.Array       # [1]
    trailing: jax.Array    # [1, t_block, H]
    t_len: int
    p_block: int
    budget: int
    frame0: np.ndarray     # [16] host — emitted at admission
    fut: Future


class SlotPoolTTS:
    """Frame-level continuous batching over a loaded :class:`Qwen3TTS`.

        pool = SlotPoolTTS(model, slots=4)
        futs = [pool.submit(text) for text in texts]     # any time
        wavs = [f.result() for f in futs]                # AudioChunk
        pool.close()
    """

    def __init__(self, model, slots: int = 4, max_frames: int = 500,
                 tick_frames: int = 5, sampling=None,
                 max_p_block: int = 128, max_t_block: int = 128,
                 oversize: str = "reject"):
        from ..models.qwen3_tts.model import TTSSamplingConfig

        if oversize not in ("reject", "fallback"):
            raise ValueError(f"oversize must be 'reject' or 'fallback', got {oversize!r}")
        self.model = model
        self.sampling = sampling or TTSSamplingConfig()
        self.slots = slots
        self.max_frames = min(max_frames, self.sampling.max_frames)
        self.tick_frames = tick_frames
        self.max_p_block = max_p_block
        self.max_t_block = max_t_block
        self.oversize = oversize
        tcfg = model.cfg.talker
        cpcfg = model.cfg.code_predictor
        dtype = model.dtype
        max_len = max_p_block + self.max_frames
        self.max_len = max_len
        s = slots
        w = self.sampling.rep_window
        h = tcfg.hidden_size

        self._state = TTSPoolState(
            layers=tuple(
                LayerKV(jnp.zeros((s, tcfg.num_kv_heads, max_len, tcfg.head_dim), dtype),
                        jnp.zeros((s, tcfg.num_kv_heads, max_len, tcfg.head_dim), dtype))
                for _ in range(tcfg.num_layers)),
            valid=jnp.zeros((s, max_len), jnp.bool_),
            positions=jnp.zeros((s,), jnp.int32),
            cursors=jnp.zeros((s,), jnp.int32),
            active=jnp.zeros((s,), jnp.bool_),
            done=jnp.ones((s,), jnp.bool_),
            code0=jnp.zeros((s,), jnp.int32),
            cp_codes=jnp.zeros((s, 15), jnp.int32),
            rep_ring=jnp.zeros((s, w), jnp.int32) - 1,
            step=jnp.zeros((s,), jnp.int32),
            budget=jnp.zeros((s,), jnp.int32),
            trail=jnp.zeros((s, max_t_block, h), dtype),
            trail_len=jnp.zeros((s,), jnp.int32),
        )
        # tts_pad embedding is a model constant; fetch it once
        from ..models.qwen3_tts.talker import embed_text

        self._tts_pad = embed_text(
            model.talker_params,
            jnp.asarray([[tcfg.tts_pad_id]], jnp.int32), tcfg)[0, 0].astype(dtype)

        eos = self._eos_id()

        @functools.partial(jax.jit, static_argnames=("n", "sampling"),
                           donate_argnums=(1,))
        def _tick(tp, state: TTSPoolState, cpp, tts_pad, key, *, n: int, sampling):
            from ..models.qwen3_tts.code_predictor import (embed_all_groups,
                                                           predict_codebooks)
            from ..models.qwen3_tts.talker import embed_codec

            def body(carry, _):
                st, key = carry
                live = st.active & ~st.done
                t_idx = jnp.clip(st.step - 1, 0, st.trail.shape[1] - 1)
                text_emb = jnp.where(
                    ((st.step - 1) < st.trail_len)[:, None],
                    st.trail[jnp.arange(s), t_idx], tts_pad[None])
                codec_emb = embed_codec(tp, st.code0) + embed_all_groups(
                    cpp, cpcfg, st.cp_codes)
                x = (text_emb + codec_emb)[:, None].astype(dtype)
                logits, hidden, new_layers = _talker_step_rows(tp, tcfg, st, x, live)
                key, k0, k1 = jax.random.split(key, 3)
                code0_new = _sample_code0(logits, st.rep_ring, k0, sampling)
                newly_done = code0_new == eos
                cp_new = predict_codebooks(
                    cpp, cpcfg, hidden.astype(dtype),
                    embed_codec(tp, code0_new).astype(dtype), k1,
                    temperature=sampling.temperature, top_k=sampling.top_k)
                frame = jnp.concatenate([code0_new[:, None], cp_new], axis=1)
                record = live & ~newly_done
                ring_idx = st.step % sampling.rep_window
                ring = st.rep_ring.at[jnp.arange(s), ring_idx].set(
                    jnp.where(record, code0_new,
                              st.rep_ring[jnp.arange(s), ring_idx]))
                step = st.step + record
                done = st.done | newly_done | (step >= st.budget)
                st = TTSPoolState(
                    layers=new_layers, valid=st.valid | (
                        (jnp.arange(max_len)[None, :] == st.cursors[:, None])
                        & record[:, None]),
                    positions=st.positions + record,
                    cursors=st.cursors + record,
                    active=st.active, done=done,
                    code0=jnp.where(record, code0_new, st.code0),
                    cp_codes=jnp.where(record[:, None], cp_new, st.cp_codes),
                    rep_ring=ring, step=step, budget=st.budget,
                    trail=st.trail, trail_len=st.trail_len)
                return (st, key), (frame, record)

            (state, key), (frames, recs) = jax.lax.scan(
                body, (state, key), None, length=n)
            # frames [n, S, 16], recs [n, S] → slot-major
            return state, key, frames.transpose(1, 0, 2), recs.T, state.done

        self._tick = _tick

        @functools.partial(jax.jit, static_argnames=("p_block", "sampling"))
        def _admit_prefill(tp, cpp, prefill_embeds, p_len, key, *,
                           p_block: int, sampling):
            from ..models.qwen3_tts.code_predictor import predict_codebooks
            from ..models.qwen3_tts.talker import (embed_codec,
                                                   make_talker_cache,
                                                   talker_prefill)

            cache = make_talker_cache(tcfg, 1, p_block, dtype)
            valid = jnp.arange(p_block)[None] < p_len[:, None]
            logits, hidden, cache = talker_prefill(
                tp, tcfg, prefill_embeds, valid, cache)
            last = p_len - 1
            logits0 = logits[jnp.arange(1), last]
            hidden0 = hidden[jnp.arange(1), last]
            ring0 = jnp.zeros((1, sampling.rep_window), jnp.int32) - 1
            key, k0, k1 = jax.random.split(key, 3)
            code0 = _sample_code0(logits0, ring0, k0, sampling)
            done0 = code0 == eos
            cp0 = predict_codebooks(
                cpp, cpcfg, hidden0.astype(dtype),
                embed_codec(tp, code0).astype(dtype), k1,
                temperature=sampling.temperature, top_k=sampling.top_k)
            frame0 = jnp.concatenate([code0[:, None], cp0], axis=1)  # [1,16]
            return (cache.layers, valid, cache.positions, code0, cp0,
                    frame0, done0)

        self._admit_prefill = _admit_prefill

        @functools.partial(jax.jit, static_argnames=("p_block",),
                           donate_argnums=(0,))
        def _insert(state: TTSPoolState, slot, seg_layers, seg_valid, pos0,
                    code0, cp0, done0, budget0, trailing, t_len, *,
                    p_block: int):
            def put_seg(arena, seg):
                return jax.lax.dynamic_update_slice(
                    arena, seg.astype(arena.dtype), (slot, 0, 0, 0))

            layers = tuple(
                LayerKV(put_seg(a.k, sg.k[:, :, :p_block]),
                        put_seg(a.v, sg.v[:, :, :p_block]))
                for a, sg in zip(state.layers, seg_layers))
            row = jnp.zeros((1, max_len), jnp.bool_)
            row = jax.lax.dynamic_update_slice(row, seg_valid[:, :p_block], (0, 0))
            valid = jax.lax.dynamic_update_slice(state.valid, row, (slot, 0))
            t_row = jnp.zeros((1, max_t_block, h), dtype)
            t_row = jax.lax.dynamic_update_slice(
                t_row, trailing.astype(dtype), (0, 0, 0))
            trail = jax.lax.dynamic_update_slice(state.trail, t_row, (slot, 0, 0))
            ring_row = jnp.zeros((1, w), jnp.int32) - 1
            ring_row = ring_row.at[0, 0].set(jnp.where(done0[0], -1, code0[0]))
            at = lambda arr, val: arr.at[slot].set(val)  # noqa: E731
            return TTSPoolState(
                layers=layers, valid=valid,
                positions=at(state.positions, pos0[0]),
                cursors=at(state.cursors, jnp.asarray(p_block, jnp.int32)),
                active=at(state.active, True),
                done=at(state.done, done0[0] | (budget0 <= 1)),
                code0=at(state.code0, code0[0]),
                cp_codes=at(state.cp_codes, cp0[0]),
                rep_ring=at(state.rep_ring, ring_row[0]),
                step=at(state.step, jnp.asarray(1, jnp.int32)),
                budget=at(state.budget, budget0),
                trail=trail,
                trail_len=at(state.trail_len, t_len),
            )

        self._insert = _insert

        # host bookkeeping (same protocol as SlotPoolASR)
        self._key = jax.random.PRNGKey(0)
        self._akey = jax.random.PRNGKey(1)
        self._served = 0
        self._ticks = 0
        self._free: List[int] = list(range(slots))
        self._live: dict = {}
        self._arrivals: "queue.Queue[_Req]" = queue.Queue()
        self._ready: "queue.Queue[_Ready]" = queue.Queue()
        self._finish: "queue.Queue" = queue.Queue()
        self._credits = threading.Semaphore(slots)
        self._closed = False
        self._submit_lock = threading.Lock()
        self._wake = threading.Event()
        self._admit_done = threading.Event()
        self._fb_queue: Optional[queue.Queue] = None
        self._fb_thread: Optional[threading.Thread] = None
        self._admit_thread = threading.Thread(target=self._admit_loop, daemon=True)
        self._admit_thread.start()
        self._finish_thread = threading.Thread(target=self._finish_loop, daemon=True)
        self._finish_thread.start()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    @staticmethod
    def _eos_id() -> int:
        from ..models.qwen3_tts.config import CodecTokens

        return CodecTokens.EOS

    # ------------------------------------------------------------------ #

    def submit(self, text: str, language: str = "english",
               voice: Optional[str] = None,
               max_frames: Optional[int] = None) -> Future:
        """Queue one synthesis; resolves to an AudioChunk."""
        fut: Future = Future()
        req = _Req(text, language, voice, max_frames or self.max_frames, fut)
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("pool is closed")
            self._arrivals.put(req)
        self._wake.set()
        return fut

    def synthesize(self, text: str, timeout: float = 600.0, **kw):
        return self.submit(text, **kw).result(timeout=timeout)

    def close(self) -> None:
        with self._submit_lock:
            self._closed = True
        self._wake.set()
        self._admit_thread.join(timeout=300)
        self._thread.join(timeout=300)
        self._finish.put(None)
        self._finish_thread.join(timeout=300)
        if self._fb_thread is not None:
            self._fb_queue.put(None)
            self._fb_thread.join(timeout=300)
        for q in (self._arrivals, self._ready):
            while True:
                try:
                    item = q.get_nowait()
                except queue.Empty:
                    break
                if not item.fut.done():
                    item.fut.set_exception(RuntimeError("pool is closed"))

    shutdown = close

    @property
    def stats(self) -> dict:
        return {
            "scheduler": "ttspool",
            "slots": self.slots,
            "free_slots": len(self._free),
            "in_flight": len(self._live) + self._arrivals.qsize() + self._ready.qsize(),
            "requests_served": self._served,
            "ticks_run": self._ticks,
        }

    # ------------------------------------------------------------------ #

    def _fallback(self, req: _Req, reason: str) -> None:
        if self.oversize == "reject":
            req.fut.set_exception(ValueError(reason))
            return
        if self._fb_thread is None:
            self._fb_queue = queue.Queue()

            def _fb_run():
                while True:
                    item = self._fb_queue.get()
                    if item is None:
                        return
                    r: _Req = item
                    try:
                        r.fut.set_result(self.model.synthesize(
                            r.text, voice=r.voice, language=r.language,
                            sampling=dataclasses.replace(
                                self.sampling, max_frames=r.max_frames)))
                        self._served += 1
                    except Exception as e:  # noqa: BLE001
                        r.fut.set_exception(e)

            self._fb_thread = threading.Thread(target=_fb_run, daemon=True)
            self._fb_thread.start()
        self._fb_queue.put(req)

    def _admit_loop(self) -> None:
        while True:
            try:
                req = self._arrivals.get(timeout=0.05)
            except queue.Empty:
                if self._closed:
                    self._admit_done.set()
                    self._wake.set()
                    return
                continue
            try:
                self._admit_one(req)
            except Exception as e:  # noqa: BLE001
                if not req.fut.done():
                    req.fut.set_exception(e)

    def _admit_one(self, req: _Req) -> None:
        from ..serving.dispatch import LATENCY, gate_slot

        model = self.model
        clone = model.ref_cache.get(req.voice) if req.voice else None
        if clone is not None:
            # ICL cloning splices reference codec frames into the prefill —
            # variable-length, eager path; serve via fallback
            self._fallback(req, "voice-clone prompts use the eager prompt "
                                "path; pool admission supports built-in "
                                "speakers only")
            return
        prefill, trailing, _tts_pad, p_len, t_len, p_block, t_block = \
            model._build_prompt_fused(req.text, req.language, req.voice)
        if p_block > self.max_p_block or t_block > self.max_t_block:
            self._fallback(req, f"prompt blocks ({p_block}, {t_block}) exceed "
                                f"pool arena ({self.max_p_block}, "
                                f"{self.max_t_block}); raise max_p_block/"
                                f"max_t_block or shorten the text")
            return
        while not self._credits.acquire(timeout=0.5):
            pass
        try:
            self._akey, kp = jax.random.split(self._akey)
            with gate_slot(getattr(model, "dispatch_gate", None), LATENCY):
                seg_layers, seg_valid, pos0, code0, cp0, frame0, done0 = \
                    self._admit_prefill(
                        model.talker_params, model.cp_params, prefill,
                        jnp.asarray([p_len], jnp.int32), kp,
                        p_block=p_block, sampling=self.sampling)
                frame0_host = np.asarray(frame0)[0]  # value fetch = sync
            self._ready.put(_Ready(
                seg_layers=seg_layers, seg_valid=seg_valid, pos0=pos0,
                code0=code0, cp0=cp0, done0=done0, trailing=trailing,
                t_len=t_len, p_block=p_block, budget=req.max_frames,
                frame0=frame0_host, fut=req.fut))
            self._wake.set()
        except Exception:
            self._credits.release()
            raise

    # ------------------------------------------------------------------ #

    class _Live(NamedTuple):
        fut: Future
        frames: list   # list of np [16]

    def _insert_ready(self, g: _Ready) -> None:
        slot = self._free.pop()
        self._state = self._insert(
            self._state, jnp.asarray(slot, jnp.int32), g.seg_layers,
            g.seg_valid, g.pos0, g.code0, g.cp0, g.done0,
            jnp.asarray(g.budget, jnp.int32), g.trailing,
            jnp.asarray(g.t_len, jnp.int32), p_block=g.p_block)
        done0 = bool(np.asarray(g.done0)[0])
        frames = [] if done0 else [g.frame0]
        self._live[slot] = SlotPoolTTS._Live(fut=g.fut, frames=frames)
        if done0 or g.budget <= 1:
            self._retire(slot)

    def _retire(self, slot: int) -> None:
        live = self._live.pop(slot)
        self._free.append(slot)
        self._credits.release()
        self._finish.put(live)

    def _finish_loop(self) -> None:
        """Codec decode off the tick thread: one device program per
        retired synthesis (gated BULK) — ticks never pause for vocoding."""
        from ..core import AudioChunk
        from ..serving.dispatch import BULK, gate_slot

        model = self.model
        sr = model.cfg.codec.sample_rate
        while True:
            live = self._finish.get()
            if live is None:
                return
            try:
                n = len(live.frames)
                if n == 0:
                    live.fut.set_result(AudioChunk(np.zeros(0, np.float32), sr))
                else:
                    codes = np.stack(live.frames)[None]  # [1, n, 16]
                    with gate_slot(getattr(model, "dispatch_gate", None), BULK):
                        wav = model.codec.decode_frames(jnp.asarray(codes), n)[0]
                    live.fut.set_result(AudioChunk(np.asarray(wav, np.float32), sr))
                self._served += 1
            except Exception as e:  # noqa: BLE001
                if not live.fut.done():
                    live.fut.set_exception(e)

    def _run(self) -> None:
        from ..serving.dispatch import BULK, gate_slot

        model = self.model
        while True:
            while self._free:
                try:
                    g = self._ready.get_nowait()
                except queue.Empty:
                    break
                self._insert_ready(g)
            if not self._live:
                if (self._closed and self._admit_done.is_set()
                        and self._ready.empty()):
                    return
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            self._key, kt = jax.random.split(self._key)
            with gate_slot(getattr(model, "dispatch_gate", None), BULK):
                self._state, _, frames, recs, done = self._tick(
                    model.talker_params, self._state, model.cp_params,
                    self._tts_pad, kt, n=self.tick_frames,
                    sampling=self.sampling)
                frames = np.asarray(frames)  # value fetch = sync
            self._ticks += 1
            recs = np.asarray(recs)
            done = np.asarray(done)
            for slot, live in list(self._live.items()):
                for j in range(recs.shape[1]):
                    if recs[slot, j]:
                        live.frames.append(frames[slot, j])
                if done[slot]:
                    self._retire(slot)

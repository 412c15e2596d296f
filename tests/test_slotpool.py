"""SlotPoolASR: token-level continuous batching correctness.

The pool must reproduce the solo path's transcripts exactly (greedy):
same encode programs, same prompt layout, same decode math — only the
scheduling differs. Staggered admission, slot reuse, mixed buckets,
budgets, and early EOS all exercise the per-slot cursor machinery.
"""

import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR
from qwen3_asr_swift_tpu.models.qwen3_asr.config import config_tiny
from qwen3_asr_swift_tpu.ops.sampling import SamplingOptions
from qwen3_asr_swift_tpu.serving.slotpool import SlotPoolASR


@pytest.fixture(scope="module")
def model():
    return Qwen3ASR.init_random(
        config_tiny(), dtype=jnp.float32, audio_buckets_s=(8, 16),
        wire_dtype="mulaw")


def clips(n, seed=0, seconds=(2, 3, 9, 4)):
    rng = np.random.default_rng(seed)
    return [(0.1 * rng.standard_normal(16000 * seconds[i % len(seconds)]))
            .astype(np.float32) for i in range(n)]


MAX_NEW = 10


def solo(model, audio, max_new=MAX_NEW, **kw):
    return model.transcribe(audio, options=SamplingOptions(max_tokens=max_new), **kw)


class TestSlotPool:
    def test_matches_solo_transcripts(self, model):
        cs = clips(4)
        want = [solo(model, c).text for c in cs]
        pool = SlotPoolASR(model, slots=4, max_new=MAX_NEW, tick_tokens=4,
                           max_len=512)
        try:
            got = [r.text for r in pool.transcribe_all(cs)]
        finally:
            pool.close()
        assert got == want

    def test_mixed_buckets_in_one_pool(self, model):
        # 2 s and 9 s clips take different audio buckets (8 s / 16 s):
        # they decode in the SAME tick program
        cs = [clips(1, seed=1, seconds=(2,))[0], clips(1, seed=2, seconds=(9,))[0]]
        want = [solo(model, c).text for c in cs]
        pool = SlotPoolASR(model, slots=2, max_new=MAX_NEW, tick_tokens=4,
                           max_len=512)
        try:
            futs = [pool.submit(c) for c in cs]
            got = [f.result(timeout=120).text for f in futs]
        finally:
            pool.close()
        assert got == want

    def test_latency_priority_jumps_bulk_queue(self, model):
        # 6 bulk clips through a 2-slot pool = 3 admission waves; a
        # latency-class probe submitted AFTER all 6 must not wait for the
        # whole bulk queue (FIFO would admit it last). Assert it completes
        # while bulk work is still pending, and with the right transcript.
        cs = clips(6, seed=7, seconds=(3,))
        pool = SlotPoolASR(model, slots=2, max_new=MAX_NEW, tick_tokens=2,
                           max_len=512)
        probe = clips(1, seed=8, seconds=(2,))[0]
        want = solo(model, probe, max_new=1).text
        try:
            bulk = [pool.submit(c) for c in cs]
            fut = pool.submit(probe, max_new=1, priority="latency")
            got = fut.result(timeout=120)
            pending = sum(not f.done() for f in bulk)
            for f in bulk:
                f.result(timeout=120)
        finally:
            pool.close()
        assert got.text == want
        assert pending > 0, "probe should finish before the bulk queue drains"

    def test_submit_rejects_bad_priority(self, model):
        pool = SlotPoolASR(model, slots=1, max_new=2, tick_tokens=2,
                           max_len=512)
        try:
            with pytest.raises(ValueError, match="priority"):
                pool.submit(clips(1)[0], priority="urgent")
        finally:
            pool.close()

    def test_staggered_admission_and_slot_reuse(self, model):
        cs = clips(5, seed=3)
        want = [solo(model, c).text for c in cs]
        pool = SlotPoolASR(model, slots=2, max_new=MAX_NEW, tick_tokens=3,
                           max_len=512)
        try:
            first = [pool.submit(c) for c in cs[:2]]
            r0 = first[0].result(timeout=120)
            # pool is mid-flight; admit more (forces slot reuse: 5 > 2)
            rest = [pool.submit(c) for c in cs[2:]]
            got = [r0.text, first[1].result(timeout=120).text] + \
                  [f.result(timeout=120).text for f in rest]
        finally:
            pool.close()
        assert got == want

    def test_budget_respected(self, model):
        c = clips(1, seed=4)[0]
        pool = SlotPoolASR(model, slots=1, max_new=MAX_NEW, tick_tokens=4,
                           max_len=512)
        try:
            r_small = pool.submit(c, max_new=3).result(timeout=120)
            r_big = pool.submit(c, max_new=MAX_NEW).result(timeout=120)
        finally:
            pool.close()
        want_small = solo(model, c, max_new=3).text
        want_big = solo(model, c, max_new=MAX_NEW).text
        assert r_small.text == want_small
        assert r_big.text == want_big
        assert want_big.startswith(want_small)

    def test_budget_of_one(self, model):
        # edge: the prefill token IS the whole budget — the pool must not
        # run a decode tick for the slot (regression: it emitted 2 tokens)
        c = clips(1, seed=5)[0]
        pool = SlotPoolASR(model, slots=1, max_new=MAX_NEW, tick_tokens=4,
                           max_len=512)
        try:
            r = pool.submit(c, max_new=1).result(timeout=120)
        finally:
            pool.close()
        assert r.text == solo(model, c, max_new=1).text

    def test_forced_eos_stops_early(self, model):
        c = clips(1, seed=5)[0]
        opts = SamplingOptions(max_tokens=MAX_NEW, force_eos_after=4)
        want = model.transcribe(c, options=opts).text
        pool = SlotPoolASR(model, slots=1, max_new=MAX_NEW, tick_tokens=4,
                           max_len=512, options=opts)
        try:
            got = pool.submit(c).result(timeout=120).text
        finally:
            pool.close()
        assert got == want

    def test_language_prompt_flows_through(self, model):
        c = clips(1, seed=6)[0]
        pool = SlotPoolASR(model, slots=1, max_new=MAX_NEW, tick_tokens=4,
                           max_len=512)
        try:
            got = pool.submit(c, language="en").result(timeout=120)
        finally:
            pool.close()
        want = solo(model, c, language="en")
        assert got.text == want.text
        assert got.language == "en"

    def test_overlong_prompt_rejected(self, model):
        c = clips(1, seed=7, seconds=(9,))[0]  # 16 s bucket → long prompt
        pool = SlotPoolASR(model, slots=1, max_new=MAX_NEW, tick_tokens=4,
                           max_len=64)
        try:
            with pytest.raises(ValueError, match="exceeds pool max_len"):
                pool.submit(c).result(timeout=120)
        finally:
            pool.close()

    def test_rejects_penalty_sampling(self, model):
        with pytest.raises(ValueError, match="repetition"):
            SlotPoolASR(model, slots=1,
                        options=SamplingOptions(repetition_penalty=1.2))

    def test_server_integration(self, model):
        """SpeechServer(scheduler='slotpool') routes /transcribe through
        the pool; models without the Qwen3ASR internals fall back to the
        group batcher."""
        import asyncio
        import http.client
        import io
        import json
        import struct
        import threading as th
        import wave

        from qwen3_asr_swift_tpu.serving.server import ModelRegistry, SpeechServer
        from qwen3_asr_swift_tpu.serving.slotpool import SlotPoolASR

        registry = ModelRegistry()
        registry.register_instance("asr", model)
        srv = SpeechServer(registry, host="127.0.0.1", port=0, scheduler="slotpool",
                           max_batch=2)
        loop = asyncio.new_event_loop()
        started = th.Event()
        holder = {}

        def run():
            asyncio.set_event_loop(loop)

            async def go():
                holder["task"] = asyncio.current_task()
                s = await srv.start()
                holder["port"] = s.sockets[0].getsockname()[1]
                started.set()
                await s.serve_forever()

            try:
                loop.run_until_complete(go())
            except asyncio.CancelledError:
                pass

        t = th.Thread(target=run, daemon=True)
        t.start()
        assert started.wait(10)
        # pre-seed the pool with a small budget so the test decodes 8
        # tokens, not the serving default 448 (random weights never EOS)
        srv._batchers[id(model)] = SlotPoolASR(model, slots=2, max_new=8,
                                               max_len=512)
        try:
            clip = clips(1, seed=9)[0]
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes((clip * 32767).astype(np.int16).tobytes())
            conn = http.client.HTTPConnection("127.0.0.1", holder["port"], timeout=180)
            conn.request("POST", "/transcribe", buf.getvalue(),
                         {"Content-Type": "audio/wav"})
            resp = conn.getresponse()
            body = json.loads(resp.read())
            assert resp.status == 200
            assert body["text"]
            # the pool really served it
            b = srv._batcher_for(model)
            assert isinstance(b, SlotPoolASR)
            assert b.stats["requests_served"] >= 1
        finally:
            loop.call_soon_threadsafe(holder["task"].cancel)
            t.join(timeout=10)

    def test_batched_admission_matches_solo(self, model):
        """Four same-bucket requests admitted as ONE group (one batched
        encode + one batched prefill + one 4-row insert) must reproduce the
        solo transcripts exactly — the r5 admission worker batches bursts."""
        from concurrent.futures import Future

        from qwen3_asr_swift_tpu.serving.slotpool import _Req

        cs = clips(4, seed=11, seconds=(3,))
        want = [solo(model, c).text for c in cs]
        pool = SlotPoolASR(model, slots=4, max_new=MAX_NEW, tick_tokens=4,
                           max_len=512, admit_batch=4)
        try:
            reqs = [_Req(c, 16000, None, None, MAX_NEW, Future()) for c in cs]
            for _ in reqs:
                pool._acquire_credit()
            pool._admit_group(reqs)   # deterministic 4-wide group
            got = [r.fut.result(timeout=120).text for r in reqs]
            assert pool.stats["mean_admit_group"] == 4.0
        finally:
            pool.close()
        assert got == want

    def test_burst_submission_correct_and_grouped(self, model):
        """A burst of submissions is served correctly; grouping is
        opportunistic (timing-dependent) so only correctness is asserted,
        plus that admission actually went through the group path."""
        cs = clips(6, seed=12, seconds=(3,))
        want = [solo(model, c).text for c in cs]
        pool = SlotPoolASR(model, slots=4, max_new=MAX_NEW, tick_tokens=4,
                           max_len=512, admit_batch=4)
        try:
            futs = [pool.submit(c) for c in cs]
            got = [f.result(timeout=180).text for f in futs]
            st = pool.stats
            assert st["requests_served"] == 6
            assert 1 <= st["admit_groups"] <= 6
        finally:
            pool.close()
        assert got == want

    def test_oversize_fallback_serves_long_clip(self, model):
        """oversize='fallback' (the serving mode) diverts a too-long clip
        to the model's ordinary transcribe path instead of erroring
        (ADVICE r4: the server 500'd clips past the arena)."""
        long_c = clips(1, seed=13, seconds=(9,))[0]   # 16 s bucket
        short_c = clips(1, seed=14, seconds=(2,))[0]
        pool = SlotPoolASR(model, slots=1, max_new=MAX_NEW, tick_tokens=4,
                           max_len=64, oversize="fallback",
                           options=SamplingOptions(max_tokens=MAX_NEW))
        try:
            f_long = pool.submit(long_c)
            f_short = pool.submit(short_c)
            got_long = f_long.result(timeout=180).text
            got_short = f_short.result(timeout=180).text
            assert pool.stats["requests_served"] == 2
        finally:
            pool.close()
        assert got_long == solo(model, long_c).text
        assert got_short == solo(model, short_c).text

    def test_close_never_strands_a_future(self, model):
        """A submit racing close() either gets served or fails with
        'pool is closed' — never blocks forever (ADVICE r4 low)."""
        cs = clips(4, seed=15, seconds=(2,))
        pool = SlotPoolASR(model, slots=2, max_new=3, tick_tokens=2,
                           max_len=512)
        futs = [pool.submit(c) for c in cs]
        closer = threading.Thread(target=pool.close)
        closer.start()
        outcomes = []
        for f in futs:
            try:
                outcomes.append(bool(f.result(timeout=120).text))
            except RuntimeError as e:
                outcomes.append("closed" in str(e))
        closer.join(timeout=120)
        assert all(outcomes)

    def test_concurrent_submitters(self, model):
        cs = clips(6, seed=8)
        want = [solo(model, c).text for c in cs]
        pool = SlotPoolASR(model, slots=3, max_new=MAX_NEW, tick_tokens=4,
                           max_len=512)
        got = [None] * len(cs)
        try:
            def worker(i):
                got[i] = pool.submit(cs[i]).result(timeout=180).text

            threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(cs))]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=180)
        finally:
            pool.close()
        assert got == want

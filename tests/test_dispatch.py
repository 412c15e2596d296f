"""DispatchGate: priority admission + gated chunked decode correctness."""

import os
import threading
import time

import numpy as np
import pytest

from qwen3_asr_swift_tpu.serving.dispatch import BULK, LATENCY, DispatchGate


class TestDispatchGate:
    def test_slots_bound_concurrency(self):
        gate = DispatchGate(slots=2)
        active = []
        peak = []
        lock = threading.Lock()

        def work(i):
            with gate.slot(BULK):
                with lock:
                    active.append(i)
                    peak.append(len(active))
                time.sleep(0.02)
                with lock:
                    active.remove(i)

        threads = [threading.Thread(target=work, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert max(peak) <= 2

    def test_latency_lane_jumps_bulk_queue(self):
        gate = DispatchGate(slots=1)
        order = []
        gate.acquire(BULK)  # occupy the only slot

        started = threading.Barrier(4)

        def waiter(prio, name):
            started.wait()
            time.sleep(0.05 if prio == LATENCY else 0.0)  # bulk enqueues first
            with gate.slot(prio):
                order.append(name)

        threads = [
            threading.Thread(target=waiter, args=(BULK, "bulk1")),
            threading.Thread(target=waiter, args=(BULK, "bulk2")),
            threading.Thread(target=waiter, args=(LATENCY, "lat")),
        ]
        for t in threads:
            t.start()
        started.wait()
        time.sleep(0.15)  # all three are queued; latency queued LAST
        gate.release()
        for t in threads:
            t.join()
        assert order[0] == "lat", order

    def test_fifo_within_priority(self):
        gate = DispatchGate(slots=1)
        gate.acquire(BULK)
        order = []
        evs = []
        for i in range(3):
            ev = threading.Event()

            def waiter(i=i, ev=ev):
                ev.set()
                with gate.slot(BULK):
                    order.append(i)

            t = threading.Thread(target=waiter)
            t.start()
            ev.wait()
            time.sleep(0.02)  # deterministic enqueue order
            evs.append(t)
        gate.release()
        for t in evs:
            t.join()
        assert order == [0, 1, 2]

    def test_timeout_returns_false(self):
        gate = DispatchGate(slots=1)
        gate.acquire(BULK)
        t0 = time.perf_counter()
        assert not gate.acquire(BULK, timeout=0.05)
        assert time.perf_counter() - t0 < 1.0
        gate.release()
        # slot is usable again after the timed-out waiter removed itself
        assert gate.acquire(LATENCY, timeout=0.5)
        gate.release()

    def test_stats(self):
        gate = DispatchGate(slots=1)
        with gate.slot(LATENCY):
            pass
        with gate.slot(BULK):
            pass
        s = gate.stats
        assert s["latency"]["acquired"] == 1
        assert s["bulk"]["acquired"] == 1

    def test_reserved_slot_refuses_bulk(self):
        gate = DispatchGate(slots=2, reserve_latency=1)
        assert gate.acquire(BULK)            # bulk takes the 1 open slot
        assert not gate.acquire(BULK, timeout=0.05)  # reserve refuses bulk
        assert gate.acquire(LATENCY, timeout=0.5)    # latency takes reserve
        gate.release()
        gate.release()

    def test_reserved_slot_makes_latency_waitfree_under_bulk_load(self):
        gate = DispatchGate(slots=3, reserve_latency=1)
        stop = threading.Event()

        def bulk_loop():
            while not stop.is_set():
                with gate.slot(BULK):
                    time.sleep(0.005)

        threads = [threading.Thread(target=bulk_loop) for _ in range(4)]
        for t in threads:
            t.start()
        time.sleep(0.05)  # bulk saturates its 2 usable slots
        waits = []
        for _ in range(10):
            t0 = time.perf_counter()
            assert gate.acquire(LATENCY, timeout=1.0)
            waits.append(time.perf_counter() - t0)
            gate.release()
            time.sleep(0.01)
        stop.set()
        for t in threads:
            t.join()
        # the reserved slot is free whenever no other latency holder runs
        assert sorted(waits)[len(waits) // 2] < 0.002, waits

    def test_release_wakes_multiple_admissible_waiters(self):
        gate = DispatchGate(slots=2, reserve_latency=1)
        gate.acquire(LATENCY)
        gate.acquire(LATENCY)  # both slots held by latency work
        got = []

        def lat_waiter(i):
            with gate.slot(LATENCY):
                got.append(i)
                time.sleep(0.02)

        threads = [threading.Thread(target=lat_waiter, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        time.sleep(0.05)
        gate.release()
        gate.release()
        for t in threads:
            t.join()
        assert sorted(got) == [0, 1]

    def test_reserve_validation(self):
        with pytest.raises(ValueError):
            DispatchGate(slots=2, reserve_latency=2)
        with pytest.raises(ValueError):
            DispatchGate(slots=1, reserve_latency=-1)


class TestThreadNice:
    """OS-priority latency lane (serving/dispatch.set_thread_nice).

    Raising one's own nice is always permitted on Linux, so the bulk-lane
    half is asserted unconditionally; the boost half (negative nice) needs
    CAP_SYS_NICE and is only asserted when it took effect.
    """

    def test_bulk_denice_in_worker_thread(self):
        from qwen3_asr_swift_tpu.serving.dispatch import (
            BULK_NICE, set_thread_nice, thread_nice)

        got = {}

        def worker():
            prev = set_thread_nice(BULK_NICE)
            got["prev"] = prev
            got["now"] = os.getpriority(os.PRIO_PROCESS, threading.get_native_id())

        th = threading.Thread(target=worker)
        th.start()
        th.join()
        assert got["prev"] is not None
        assert got["now"] == BULK_NICE
        # the main thread's priority is untouched (per-thread, not per-process)
        assert os.getpriority(os.PRIO_PROCESS, threading.get_native_id()) == got["prev"]

    def test_thread_nice_scope_restores(self):
        from qwen3_asr_swift_tpu.serving.dispatch import thread_nice

        tid = threading.get_native_id()
        before = os.getpriority(os.PRIO_PROCESS, tid)
        with thread_nice(before + 5):
            assert os.getpriority(os.PRIO_PROCESS, tid) == before + 5
        # restore lowers nice back — permitted for the value we came from
        # only with privilege; accept either restored or stuck-raised
        after = os.getpriority(os.PRIO_PROCESS, tid)
        assert after in (before, before + 5)
        if after != before:  # unprivileged: put it back via a fresh thread
            pytest.skip("unprivileged: restore could not lower nice")

    def test_latency_boost_when_privileged(self):
        from qwen3_asr_swift_tpu.serving.dispatch import (
            LATENCY_NICE, set_thread_nice)

        got = {}

        def worker():
            got["prev"] = set_thread_nice(LATENCY_NICE)
            got["now"] = os.getpriority(os.PRIO_PROCESS, threading.get_native_id())

        th = threading.Thread(target=worker)
        th.start()
        th.join()
        if got["prev"] is None or got["now"] != LATENCY_NICE:
            pytest.skip("no CAP_SYS_NICE: negative nice unavailable")
        assert got["now"] == LATENCY_NICE


class TestFusedFirstResponse:
    """Gated single-clip requests take the fused encode+prefill+first-chunk
    program (one dispatch, one fetch); transcripts must match the ungated
    multi-program path exactly."""

    @pytest.fixture(scope="class", params=["mulaw", "pcm4"])
    def model(self, request):
        import jax.numpy as jnp

        from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR
        from qwen3_asr_swift_tpu.models.qwen3_asr.config import config_tiny

        return Qwen3ASR.init_random(
            config_tiny(), dtype=jnp.float32, audio_buckets_s=(8,),
            wire_dtype=request.param, decode_chunk_tokens=4)

    def test_fused_matches_ungated(self, model):
        from qwen3_asr_swift_tpu.ops.sampling import SamplingOptions

        rng = np.random.default_rng(3)
        clip = (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)
        opts = SamplingOptions(max_tokens=9)
        base = model.transcribe(clip, options=opts)
        model.dispatch_gate = DispatchGate(slots=2, reserve_latency=1)
        try:
            fused = model.transcribe(clip, options=opts)
        finally:
            model.dispatch_gate = None
        assert fused.text == base.text
        assert abs(fused.confidence - base.confidence) < 1e-6

    def test_fused_continuation_past_first_chunk(self, model):
        # budget > first_chunk_tokens: fused start + gen_chunk continuations
        from qwen3_asr_swift_tpu.ops.sampling import SamplingOptions

        rng = np.random.default_rng(4)
        clip = (0.1 * rng.standard_normal(16000 * 3)).astype(np.float32)
        opts = SamplingOptions(max_tokens=model.first_chunk_tokens + 7)
        base = model.transcribe(clip, options=opts)
        model.dispatch_gate = DispatchGate(slots=2)
        try:
            fused = model.transcribe(clip, options=opts)
        finally:
            model.dispatch_gate = None
        assert fused.text == base.text

    def test_timings_path_bypasses_fusion(self, model):
        from qwen3_asr_swift_tpu.ops.sampling import SamplingOptions

        rng = np.random.default_rng(5)
        clip = (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)
        model.dispatch_gate = DispatchGate(slots=2)
        try:
            tm = {}
            r = model.transcribe(clip, options=SamplingOptions(max_tokens=4),
                                 timings=tm)
        finally:
            model.dispatch_gate = None
        assert {"host_prep", "encode", "generate", "postprocess"} <= set(tm)
        assert r.text


class TestGatedGenerate:
    @pytest.fixture(scope="class")
    def model(self):
        from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR, config_tiny

        return Qwen3ASR.init_random(config_tiny(), dtype=np.float32,
                                    audio_buckets_s=(8,),
                                    decode_chunk_tokens=4)

    def test_gated_equals_ungated(self, model):
        rng = np.random.default_rng(0)
        audio = (0.1 * rng.standard_normal(16000)).astype(np.float32)
        base = model.transcribe(audio, max_tokens=12).text
        model.dispatch_gate = DispatchGate(slots=1)
        try:
            gated = model.transcribe(audio, max_tokens=12).text
            batch = model.transcribe_batch([audio, audio], max_tokens=12)
        finally:
            model.dispatch_gate = None
        assert gated == base
        assert [r.text for r in batch] == [base, base]

    def test_latency_request_overtakes_bulk_generate(self, model):
        """While a long bulk-lane generate holds the device, a short
        latency-lane request completes before the bulk one finishes —
        chunk-granular admission, the round-4 serving contract."""
        gate = DispatchGate(slots=1)
        model.dispatch_gate = gate
        rng = np.random.default_rng(1)
        long_audio = (0.1 * rng.standard_normal(16000 * 4)).astype(np.float32)
        short_audio = (0.1 * rng.standard_normal(8000)).astype(np.float32)
        # warm both programs so compile time doesn't mask scheduling
        model.transcribe(long_audio, max_tokens=64)
        model.transcribe(short_audio, max_tokens=2)

        done_at = {}
        started = threading.Event()

        def bulk():
            started.set()
            model.transcribe_batch([long_audio, long_audio], max_tokens=64,
                                   priority=BULK)
            done_at["bulk"] = time.perf_counter()

        try:
            t = threading.Thread(target=bulk)
            t.start()
            started.wait()
            time.sleep(0.05)  # let the bulk generate get in flight
            model.transcribe(short_audio, max_tokens=2, priority=LATENCY)
            done_at["lat"] = time.perf_counter()
            t.join()
        finally:
            model.dispatch_gate = None
        assert done_at["lat"] < done_at["bulk"], done_at
        assert gate.stats["latency"]["acquired"] >= 1

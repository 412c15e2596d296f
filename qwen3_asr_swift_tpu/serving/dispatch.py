"""Priority dispatch gate: bounds the device program queue.

NEW subsystem (no reference counterpart — the reference serves one request
at a time, Sources/AudioServer/AudioServer.swift:182-237). On this stack
the problem is the opposite: JAX dispatch is asynchronous, so N submitter
threads can enqueue seconds of device work back-to-back (a batch generate
is start + k decode chunks, all dispatched without waiting), and a newly
arriving latency-sensitive request then waits out the whole queue — the
observed 2.4 s worst-case loaded first-token of round 3 was queue depth,
not compute.

``DispatchGate`` fixes this by admission control at the *dispatch* level:

- at most ``slots`` program dispatches may be in flight on the device at
  once; a holder must complete (value-fetch sync) before releasing;
- waiters are admitted by (priority, FIFO) — priority 0 is the latency
  lane (a request's FIRST chunk, short probes), priority 1 the bulk lane
  (continuation chunks of an in-flight generate);
- with chunked decode (``decode_chunk_tokens``) every chunk is a separate
  gated dispatch, so the maximum wait for a latency-lane arrival is the
  residual of ``slots`` running chunks — milliseconds, not batches.

``slots=2`` (default) double-buffers dispatch: while one program computes,
the next holder's dispatch RPC travels to the device, so bounding the
queue costs no device idle time over the tunneled backend.

Host transfers (device_put staging) are deliberately NOT gated — they ride
a different resource (the host↔device link) and should overlap compute.
"""

from __future__ import annotations

import heapq
import itertools
import os
import threading
from contextlib import contextmanager
from typing import Optional

#: priority of the latency lane (first chunks, interactive probes)
LATENCY = 0
#: priority of the bulk lane (continuation chunks, batch throughput work)
BULK = 1


class DispatchGate:
    """Counting semaphore with priority-ordered admission.

    Unlike ``threading.Semaphore``, waiters are served (priority, FIFO)
    rather than arbitrarily, so a latency-lane waiter is admitted at the
    next slot release even if bulk waiters queued first.
    """

    def __init__(self, slots: int = 2, reserve_latency: int = 0):
        """``reserve_latency``: slots only the latency lane may occupy.
        With (slots=3, reserve_latency=1) bulk traffic double-buffers on 2
        slots while a latency arrival nearly always finds its reserved
        slot free — its wait drops from "residual of a running bulk chunk"
        (~half a chunk, 50-120 ms) to ~0. The reserved slot costs no bulk
        throughput: bulk never had it."""
        if slots < 1:
            raise ValueError("slots must be >= 1")
        if not 0 <= reserve_latency < slots:
            raise ValueError("reserve_latency must be in [0, slots)")
        self._slots = slots
        self._reserve = reserve_latency
        self._free = slots
        self._lock = threading.Lock()
        self._waiters: list = []  # heap of (priority, seq, Event)
        self._seq = itertools.count()
        # stats
        self._stats_lock = threading.Lock()
        self.acquired = {LATENCY: 0, BULK: 0}
        self.waited_s = {LATENCY: 0.0, BULK: 0.0}

    def _admissible(self, priority: int) -> bool:
        """Caller holds the lock. Latency may take any free slot; bulk
        must leave ``reserve_latency`` slots free."""
        if priority <= LATENCY:
            return self._free > 0
        return self._free > self._reserve

    def acquire(self, priority: int = BULK, timeout: Optional[float] = None) -> bool:
        import time

        t0 = time.perf_counter()
        with self._lock:
            if self._admissible(priority) and not self._waiters:
                self._free -= 1
                self._note(priority, 0.0)
                return True
            # even with a free slot, queued waiters go first (no barging)
            if (self._admissible(priority) and self._waiters
                    and self._waiters[0][0] > priority):
                # ... unless every queued waiter is lower-priority than us
                self._free -= 1
                self._note(priority, 0.0)
                return True
            ev = threading.Event()
            entry = (priority, next(self._seq), ev)
            heapq.heappush(self._waiters, entry)
        if not ev.wait(timeout):
            with self._lock:
                try:
                    self._waiters.remove(entry)
                    heapq.heapify(self._waiters)
                except ValueError:
                    # released to us between timeout and removal: accept it
                    self._note(priority, time.perf_counter() - t0)
                    return True
            return False
        self._note(priority, time.perf_counter() - t0)
        return True

    def release(self) -> None:
        with self._lock:
            self._free = min(self._slots, self._free + 1)
            # admit waiters in (priority, FIFO) order while their lane's
            # admission rule passes; a blocked bulk head does not unblock
            # deeper bulk waiters (latency waiters sort first, so they are
            # never shadowed)
            while self._waiters and self._admissible(self._waiters[0][0]):
                _, _, ev = heapq.heappop(self._waiters)
                self._free -= 1
                ev.set()

    @contextmanager
    def slot(self, priority: int = BULK):
        self.acquire(priority)
        try:
            yield
        finally:
            self.release()

    def _note(self, priority: int, waited: float) -> None:
        with self._stats_lock:
            self.acquired[priority] = self.acquired.get(priority, 0) + 1
            self.waited_s[priority] = self.waited_s.get(priority, 0.0) + waited

    @property
    def stats(self) -> dict:
        with self._stats_lock:
            out = {}
            for p, name in ((LATENCY, "latency"), (BULK, "bulk")):
                n = self.acquired.get(p, 0)
                out[name] = {
                    "acquired": n,
                    "mean_wait_ms": 1e3 * self.waited_s.get(p, 0.0) / max(1, n),
                }
            return out


def set_thread_nice(nice: int) -> Optional[int]:
    """Set the CALLING thread's OS scheduling priority (Linux per-thread
    nice via ``setpriority(PRIO_PROCESS, tid)``) and return the previous
    value, or None when unsupported/denied.

    Why this exists: the dispatch gate bounds DEVICE queue depth, but on a
    busy serving host the latency lane can still lose the *CPU* — a
    latency request's host side (staging, dispatch RPC, fetch, detokenize)
    is time-sliced against every bulk submitter thread. Measured on the
    1-core bench rig: the fused single-dispatch probe's loaded p50 was
    ~315 ms with only ~3 ms of gate wait — the rest was runnable-queue
    wait. De-nicing bulk workers (+10) and boosting the latency lane
    (negative nice needs privilege; serving as root or with CAP_SYS_NICE)
    gives the latency request the core the moment it unblocks.

    Raising one's own nice never needs privilege, so ``BULK_NICE`` always
    works; restore (lowering back) can fail unprivileged — callers treat
    that as best-effort.
    """
    try:
        tid = threading.get_native_id()
        prev = os.getpriority(os.PRIO_PROCESS, tid)
        os.setpriority(os.PRIO_PROCESS, tid, nice)
        return prev
    except (AttributeError, OSError):
        return None


#: suggested nice for bulk submitter/worker threads (always settable)
BULK_NICE = 10
#: suggested nice for the latency lane (needs root / CAP_SYS_NICE)
LATENCY_NICE = -10


@contextmanager
def thread_nice(nice: int):
    """Scoped per-thread nice: sets on entry, best-effort restores on exit."""
    prev = set_thread_nice(nice)
    try:
        yield
    finally:
        if prev is not None:
            set_thread_nice(prev)


@contextmanager
def _null():
    yield


def gate_slot(gate: Optional[DispatchGate], priority: int = BULK):
    """``with gate_slot(maybe_gate, prio):`` — no-op when gate is None."""
    return gate.slot(priority) if gate is not None else _null()

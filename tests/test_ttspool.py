"""SlotPoolTTS: frame-level continuous batching correctness.

The pool must reproduce solo greedy synthesis exactly — same prompt
program, same prefill, same per-frame talker/CP math — with scheduling as
the only difference. Staggered admission, slot reuse, budgets, and the
oversize fallback exercise the per-slot machinery.
"""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_swift_tpu.models.qwen3_tts import (Qwen3TTS, TTSSamplingConfig,
                                                  config_tiny)
from qwen3_asr_swift_tpu.serving.ttspool import SlotPoolTTS
from qwen3_asr_swift_tpu.tokenizers.bpe import BPETokenizer, _bytes_to_unicode

GREEDY = TTSSamplingConfig(temperature=0.0, top_k=0, max_frames=6)


@pytest.fixture(scope="module")
def model():
    b2u = _bytes_to_unicode()
    tok = BPETokenizer({ch: i for i, ch in enumerate(b2u[b] for b in range(256))}, [])
    return Qwen3TTS.init_random(config_tiny(), dtype=jnp.float32, tokenizer=tok)


def solo(model, text, **kw):
    return model.synthesize(text, sampling=GREEDY, **kw)


class TestSlotPoolTTS:
    def test_pooled_matches_solo_waveforms(self, model):
        texts = ["ab", "hello", "xyz", "q"]
        want = [solo(model, t).samples for t in texts]
        pool = SlotPoolTTS(model, slots=4, tick_frames=2, sampling=GREEDY)
        try:
            futs = [pool.submit(t) for t in texts]
            got = [f.result(timeout=300).samples for f in futs]
        finally:
            pool.close()
        for w, g in zip(want, got):
            assert w.shape == g.shape
            assert np.allclose(w, g, atol=1e-5)

    def test_staggered_admission_and_slot_reuse(self, model):
        texts = ["ab", "cd", "ef", "gh", "ij"]
        want = [solo(model, t).samples for t in texts]
        pool = SlotPoolTTS(model, slots=2, tick_frames=2, sampling=GREEDY)
        try:
            first = [pool.submit(t) for t in texts[:2]]
            r0 = first[0].result(timeout=300)
            rest = [pool.submit(t) for t in texts[2:]]
            got = [r0.samples, first[1].result(timeout=300).samples] + \
                  [f.result(timeout=300).samples for f in rest]
        finally:
            pool.close()
        for w, g in zip(want, got):
            assert np.allclose(w, g, atol=1e-5)

    def test_budget_respected(self, model):
        pool = SlotPoolTTS(model, slots=1, tick_frames=2, sampling=GREEDY)
        try:
            short = pool.submit("hello world", max_frames=2).result(timeout=300)
            full = pool.submit("hello world").result(timeout=300)
        finally:
            pool.close()
        sr = model.cfg.codec.sample_rate
        spf = model.cfg.codec.samples_per_frame
        assert len(short.samples) <= 2 * spf
        want_short = model.synthesize(
            "hello world", sampling=TTSSamplingConfig(
                temperature=0.0, top_k=0, max_frames=2)).samples
        assert np.allclose(short.samples, want_short, atol=1e-5)
        assert len(full.samples) >= len(short.samples)
        assert short.sample_rate == sr

    def test_oversize_text_falls_back(self, model):
        long_text = "a" * 400  # blocks exceed a small arena
        pool = SlotPoolTTS(model, slots=1, tick_frames=2, sampling=GREEDY,
                           max_p_block=32, max_t_block=32,
                           oversize="fallback")
        try:
            got = pool.submit(long_text).result(timeout=300)
            short = pool.submit("ab").result(timeout=300)
        finally:
            pool.close()
        assert np.allclose(got.samples, solo(model, long_text).samples, atol=1e-5)
        assert np.allclose(short.samples, solo(model, "ab").samples, atol=1e-5)

    def test_oversize_reject(self, model):
        pool = SlotPoolTTS(model, slots=1, sampling=GREEDY,
                           max_p_block=32, max_t_block=32, oversize="reject")
        try:
            with pytest.raises(ValueError, match="exceed"):
                pool.submit("a" * 400).result(timeout=300)
        finally:
            pool.close()

    def test_concurrent_submitters(self, model):
        texts = ["ab", "cd", "ef", "gh"]
        want = [solo(model, t).samples for t in texts]
        pool = SlotPoolTTS(model, slots=2, tick_frames=2, sampling=GREEDY)
        got = [None] * len(texts)
        try:
            def worker(i):
                got[i] = pool.submit(texts[i]).result(timeout=300).samples

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(len(texts))]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=300)
        finally:
            pool.close()
        for w, g in zip(want, got):
            assert np.allclose(w, g, atol=1e-5)

    def test_server_integration(self, model):
        """SpeechServer(scheduler='slotpool') routes /speak through the
        TTS pool (frame-level continuous batching as the serving path)."""
        import asyncio
        import http.client
        import json
        import threading as th

        from qwen3_asr_swift_tpu.serving.server import (ModelRegistry,
                                                        SpeechServer)

        registry = ModelRegistry()
        registry.register_instance("tts", model)
        srv = SpeechServer(registry, host="127.0.0.1", port=0,
                           scheduler="slotpool", max_batch=2)
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
        # pre-seed a greedy small-budget pool so the test stays fast
        srv._tts_batchers[id(model)] = SlotPoolTTS(
            model, slots=2, sampling=GREEDY, oversize="fallback")
        try:
            conn = http.client.HTTPConnection("127.0.0.1", holder["port"],
                                              timeout=300)
            conn.request("POST", "/speak",
                         json.dumps({"text": "ab"}),
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            body = resp.read()
            assert resp.status == 200
            assert resp.getheader("Content-Type", "").startswith("audio/wav")
            assert len(body) > 44  # WAV header + samples
            b = srv._tts_batcher_for(model)
            assert isinstance(b, SlotPoolTTS)
            assert b.stats["requests_served"] >= 1
        finally:
            loop.call_soon_threadsafe(holder["task"].cancel)
            t.join(timeout=10)

    def test_close_never_strands_a_future(self, model):
        pool = SlotPoolTTS(model, slots=1, tick_frames=2, sampling=GREEDY)
        futs = [pool.submit("ab") for _ in range(3)]
        closer = threading.Thread(target=pool.close)
        closer.start()
        outcomes = []
        for f in futs:
            try:
                outcomes.append(f.result(timeout=300) is not None)
            except RuntimeError as e:
                outcomes.append("closed" in str(e))
        closer.join(timeout=300)
        assert all(outcomes)

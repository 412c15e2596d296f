"""TranscriptionStore: partial/commit flow, ingest from streaming events,
observers, thread safety."""

import threading

from qwen3_asr_swift_tpu.core.types import PartialTranscription
from qwen3_asr_swift_tpu.ui import TranscriptionStore


class TestStore:
    def test_partial_then_commit(self):
        s = TranscriptionStore()
        s.update_partial("hel")
        assert s.transcript == "hel"
        s.update_partial("hello wor")
        s.commit("hello world", 0.0, 1.2, confidence=0.9)
        assert s.partial == ""
        assert s.transcript == "hello world"
        assert s.segments[0].confidence == 0.9

    def test_ingest_partial_transcription(self):
        s = TranscriptionStore()
        s.ingest(PartialTranscription(text="going", is_final=False,
                                      segment_start=0, segment_end=0.5))
        assert s.partial == "going"
        s.ingest(PartialTranscription(text="going home", is_final=True,
                                      segment_start=0, segment_end=1.0))
        assert s.transcript == "going home"
        assert s.segments[0].end == 1.0

    def test_observers_and_unsubscribe(self):
        s = TranscriptionStore()
        calls = []
        unsub = s.subscribe(lambda st: calls.append(st.transcript))
        s.update_partial("a")
        s.commit("a b")
        assert calls == ["a", "a b"]
        unsub()
        s.update_partial("x")
        assert len(calls) == 2

    def test_clear(self):
        s = TranscriptionStore()
        s.commit("one")
        s.update_partial("two")
        s.clear()
        assert s.transcript == "" and s.segments == []

    def test_concurrent_commits(self):
        s = TranscriptionStore()

        def worker(i):
            for j in range(50):
                s.commit(f"w{i}-{j}")

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(s.segments) == 200

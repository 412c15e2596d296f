"""StreamingAudioPlayer: pre-buffer gating, pacing, underruns, drain."""

import threading
import time

import numpy as np

from qwen3_asr_swift_tpu.audio import StreamingAudioPlayer


class TestPlayer:
    def test_prebuffer_gates_start(self):
        p = StreamingAudioPlayer(sample_rate=1000, prebuffer_s=0.5, realtime=False)
        p.push(np.zeros(400, np.float32))
        assert not p._started
        p.push(np.zeros(200, np.float32))
        assert p._started
        out = p.read(600)
        assert len(out) == 600

    def test_finish_drains_below_prebuffer(self):
        p = StreamingAudioPlayer(sample_rate=1000, prebuffer_s=10.0, realtime=False)
        p.push(np.ones(100, np.float32))
        p.finish()
        out = p.read(1000)
        assert len(out) == 100  # end of stream returns what's left
        assert p.underruns == 0

    def test_frames_generator(self):
        p = StreamingAudioPlayer(sample_rate=1000, prebuffer_s=0.0, realtime=False)
        p.push(np.arange(250, dtype=np.float32))
        p.finish()
        frames = list(p.frames(frame_samples=100))
        assert [len(f) for f in frames] == [100, 100, 50]
        assert np.allclose(np.concatenate(frames), np.arange(250))

    def test_realtime_pacing(self):
        p = StreamingAudioPlayer(sample_rate=8000, prebuffer_s=0.0, realtime=True)
        p.push(np.zeros(1600, np.float32))  # 200 ms of audio
        p.finish()
        t0 = time.monotonic()
        while len(p.read(400)) > 0:
            pass
        elapsed = time.monotonic() - t0
        assert elapsed >= 0.12  # released no faster than ~real time

    def test_concurrent_producer(self):
        p = StreamingAudioPlayer(sample_rate=1000, prebuffer_s=0.05, realtime=False)

        def produce():
            for _ in range(5):
                p.push(np.zeros(100, np.float32))
                time.sleep(0.01)
            p.finish()

        t = threading.Thread(target=produce)
        t.start()
        total = sum(len(f) for f in p.frames(frame_samples=120, timeout=2.0))
        t.join()
        assert total == 500

"""Serving tests: continuous batcher semantics, HTTP routes, realtime
WebSocket protocol — against fake models (the reference's unit tier tests
PCM/JSON/server helpers the same way, Tests/AudioServerTests)."""

import asyncio
import base64
import json
import socket
import threading
import time

import numpy as np
import pytest

from qwen3_asr_swift_tpu.audio.io import wav_bytes
from qwen3_asr_swift_tpu.core.types import AudioChunk, TranscriptionResult
from qwen3_asr_swift_tpu.serving import ContinuousBatcher, ModelRegistry, SpeechServer
from qwen3_asr_swift_tpu.serving.ws import WebSocket, accept_key, encode_frame, OP_TEXT


class FakeASR:
    def __init__(self, delay=0.0):
        self.calls = []
        self.delay = delay

    def transcribe_batch(self, audios, sample_rate=16000, **kw):
        self.calls.append(len(audios))
        if self.delay:
            time.sleep(self.delay)
        return [
            TranscriptionResult(text=f"len={len(a)}", confidence=0.9, duration=len(a) / sample_rate)
            for a in audios
        ]


class FakeTTS:
    def synthesize(self, text, voice=None, **kw):
        return AudioChunk(np.zeros(1600, np.float32), 16000)


class TestBatcher:
    def test_single_request(self):
        asr = FakeASR()
        b = ContinuousBatcher(asr, max_batch=4, max_wait_ms=5)
        res = b.transcribe(np.zeros(100, np.float32))
        assert res.text == "len=100"
        b.shutdown()

    def test_concurrent_requests_batch_together(self):
        asr = FakeASR(delay=0.05)
        b = ContinuousBatcher(asr, max_batch=8, max_wait_ms=80)
        futs = [b.submit(np.zeros(100, np.float32)) for _ in range(6)]
        results = [f.result(timeout=10) for f in futs]
        assert all(r.text == "len=100" for r in results)
        assert max(asr.calls) > 1  # at least one true batch happened
        b.shutdown()

    def test_error_propagates(self):
        class Broken:
            def transcribe_batch(self, *a, **k):
                raise RuntimeError("boom")

        b = ContinuousBatcher(Broken(), max_wait_ms=5)
        with pytest.raises(RuntimeError, match="boom"):
            b.transcribe(np.zeros(10, np.float32))
        b.shutdown()


class TestWsCodec:
    def test_accept_key_rfc_example(self):
        assert accept_key("dGhlIHNhbXBsZSBub25jZQ==") == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="

    def test_frame_roundtrip(self):
        frame = encode_frame(OP_TEXT, b"hello")
        assert frame[0] == 0x81 and frame[1] == 5 and frame[2:] == b"hello"

    def test_large_frame_lengths(self):
        f = encode_frame(OP_TEXT, b"x" * 200)
        assert f[1] == 126
        f = encode_frame(OP_TEXT, b"x" * 70000)
        assert f[1] == 127


@pytest.fixture()
def server():
    registry = ModelRegistry()
    registry.register_instance("asr", FakeASR())
    registry.register_instance("tts", FakeTTS())
    srv = SpeechServer(registry, host="127.0.0.1", port=0)

    loop = asyncio.new_event_loop()
    started = threading.Event()
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

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(5)
    yield holder["port"]
    # cancel the serve task (not loop.stop) so run_until_complete resolves
    # cleanly — stopping mid-future raises "Event loop stopped before
    # Future completed" in the thread
    if "task" in holder:
        loop.call_soon_threadsafe(holder["task"].cancel)
    else:
        loop.call_soon_threadsafe(loop.stop)
    t.join(timeout=10)


@pytest.fixture()
def server_with_engines():
    class CountingTTS(FakeTTS):
        def __init__(self):
            self.calls = []

        def synthesize(self, text, voice=None, **kw):
            self.calls.append((text, kw))
            return AudioChunk(np.zeros(1600, np.float32), 16000)

    kokoro = CountingTTS()
    registry = ModelRegistry()
    registry.register_instance("tts", FakeTTS())
    registry.register_instance("tts:kokoro", kokoro)
    srv = SpeechServer(registry, host="127.0.0.1", port=0)
    loop = asyncio.new_event_loop()
    started = threading.Event()
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

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(5)
    yield holder["port"], kokoro
    if "task" in holder:
        loop.call_soon_threadsafe(holder["task"].cancel)
    t.join(timeout=10)


def http_request(port, method, path, body=b"", content_type="application/json"):
    with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
        req = (
            f"{method} {path} HTTP/1.1\r\nHost: localhost\r\nConnection: close\r\n"
            f"Content-Type: {content_type}\r\nContent-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        s.sendall(req)
        data = b""
        while True:
            chunk = s.recv(65536)
            if not chunk:
                break
            data += chunk
    head, _, resp_body = data.partition(b"\r\n\r\n")
    status = int(head.split()[1])
    return status, head, resp_body


class TestHttp:
    def test_health(self, server):
        status, _, body = http_request(server, "GET", "/health")
        assert status == 200
        payload = json.loads(body)
        assert payload["status"] == "ok"
        assert "asr" in payload["models_loaded"]

    def test_transcribe_wav(self, server):
        wav = wav_bytes(np.zeros(1600, np.float32), 16000)
        status, _, body = http_request(server, "POST", "/transcribe", wav, "audio/wav")
        assert status == 200
        assert json.loads(body)["text"] == "len=1600"

    def test_transcribe_json_base64(self, server):
        pcm = np.zeros(800, np.int16).tobytes()
        payload = json.dumps({"audio_base64": base64.b64encode(pcm).decode(), "sample_rate": 16000}).encode()
        status, _, body = http_request(server, "POST", "/transcribe", payload)
        assert status == 200
        assert json.loads(body)["text"] == "len=800"

    def test_speak(self, server):
        status, head, body = http_request(server, "POST", "/speak", json.dumps({"text": "hi"}).encode())
        assert status == 200
        assert b"audio/wav" in head
        assert body[:4] == b"RIFF"

    def test_speak_missing_text_400(self, server):
        status, _, _ = http_request(server, "POST", "/speak", json.dumps({}).encode())
        assert status == 400

    def test_speak_engine_selection(self, server_with_engines):
        port, kokoro = server_with_engines
        body = json.dumps({"text": "hi", "engine": "kokoro", "language": "en"}).encode()
        status, _, resp = http_request(port, "POST", "/speak", body)
        assert status == 200 and resp[:4] == b"RIFF"
        assert kokoro.calls == [("hi", {"language": "en"})]
        # unknown engine falls back to the default tts entry
        status, _, resp = http_request(
            port, "POST", "/speak", json.dumps({"text": "yo", "engine": "nope"}).encode())
        assert status == 200 and resp[:4] == b"RIFF"

    def test_unknown_route(self, server):
        status, _, _ = http_request(server, "GET", "/nope")
        assert status == 404

    def test_missing_model_503(self, server):
        status, _, body = http_request(server, "POST", "/enhance", wav_bytes(np.zeros(100, np.float32), 16000), "audio/wav")
        assert status == 503


class WsClient:
    """Tiny buffered websocket test client (frames can share TCP segments
    with the handshake response)."""

    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=15)
        self.buf = b""
        key = base64.b64encode(b"0123456789abcdef").decode()
        self.sock.sendall(
            (
                f"GET /v1/realtime HTTP/1.1\r\nHost: localhost\r\nUpgrade: websocket\r\n"
                f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        while b"\r\n\r\n" not in self.buf:
            self.buf += self.sock.recv(4096)
        head, _, self.buf = self.buf.partition(b"\r\n\r\n")
        assert b"101" in head.split(b"\r\n")[0]

    def _read(self, n):
        while len(self.buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("closed")
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def send_json(self, payload: dict):
        import struct

        body = json.dumps(payload).encode()
        mask = b"\x01\x02\x03\x04"
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(body))
        if len(body) < 126:
            frame = bytes([0x81, 0x80 | len(body)]) + mask + masked
        elif len(body) < 65536:
            frame = bytes([0x81, 0x80 | 126]) + struct.pack(">H", len(body)) + mask + masked
        else:
            frame = bytes([0x81, 0x80 | 127]) + struct.pack(">Q", len(body)) + mask + masked
        self.sock.sendall(frame)

    def recv_json(self):
        import struct

        head = self._read(2)
        length = head[1] & 0x7F
        if length == 126:
            (length,) = struct.unpack(">H", self._read(2))
        elif length == 127:
            (length,) = struct.unpack(">Q", self._read(8))
        return json.loads(self._read(length))

    def close(self):
        self.sock.close()


class TestRealtime:

    def test_commit_transcribes(self, server):
        c = WsClient(server)
        assert c.recv_json()["type"] == "session.created"
        pcm = np.zeros(3200, np.int16).tobytes()
        c.send_json({"type": "input_audio_buffer.append",
                     "audio": base64.b64encode(pcm).decode()})
        c.send_json({"type": "input_audio_buffer.commit"})
        assert c.recv_json()["type"] == "input_audio_buffer.committed"
        done = c.recv_json()
        assert done["type"] == "conversation.item.input_audio_transcription.completed"
        assert done["transcript"] == "len=3200"
        c.close()

    def test_response_creates_audio_deltas(self, server):
        c = WsClient(server)
        c.recv_json()  # session.created
        c.send_json({"type": "response.create", "response": {"instructions": "hello"}})
        types = [c.recv_json()["type"] for _ in range(4)]
        assert types[0] == "response.created"
        assert "response.audio.delta" in types
        assert "response.done" in types or "response.audio.done" in types
        c.close()

    def test_conversation_item_text_feeds_response(self, server):
        """conversation.item.create with a text part echoes
        conversation.item.created and queues the text for the next
        response.create (reference: AudioServer.swift:477-490)."""
        c = WsClient(server)
        c.recv_json()  # session.created
        c.send_json({"type": "conversation.item.create", "item": {
            "type": "message", "content": [{"type": "input_text", "text": "say hi"}]}})
        created = c.recv_json()
        assert created["type"] == "conversation.item.created"
        c.send_json({"type": "response.create"})
        types = [c.recv_json()["type"] for _ in range(4)]
        assert types[0] == "response.created"
        assert "response.audio.delta" in types
        c.close()

    def test_unknown_event_errors(self, server):
        c = WsClient(server)
        c.recv_json()
        c.send_json({"type": "bogus.event"})
        err = c.recv_json()
        assert err["type"] == "error" and "bogus" in err["error"]["message"]
        c.close()


class TestBatcherConcurrency:
    """Concurrency hardening (the reference tests continuation leaks and
    cancellation — Tests/AudioCommonTests/ConcurrencyTests.swift): many
    concurrent submitters, shutdown with work in flight, stats coherence."""

    def _model(self):
        import jax.numpy as jnp

        from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR, config_tiny

        return Qwen3ASR.init_random(config_tiny(), dtype=jnp.float32,
                                    audio_buckets_s=(8,))

    def test_many_concurrent_submitters(self):
        import threading

        from qwen3_asr_swift_tpu.serving.batching import ContinuousBatcher

        model = self._model()
        batcher = ContinuousBatcher(model, max_batch=4, max_wait_ms=20)
        rng = np.random.default_rng(0)
        results = [None] * 12
        errors = []

        def worker(i):
            try:
                audio = (0.1 * rng.standard_normal(8000)).astype(np.float32)
                results[i] = batcher.transcribe(audio, timeout=180)
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=240)
        batcher.shutdown()
        assert not errors
        assert all(r is not None for r in results)
        stats = batcher.stats
        served = stats["requests_served"] if isinstance(stats, dict) else stats()["requests_served"]
        assert served == 12
        # batching actually happened (fewer batches than requests)
        batches = stats["batches_run"] if isinstance(stats, dict) else stats()["batches_run"]
        assert batches <= 12

    def test_shutdown_idempotent_and_rejects_after(self):
        from qwen3_asr_swift_tpu.serving.batching import ContinuousBatcher

        batcher = ContinuousBatcher(self._model(), max_batch=2, max_wait_ms=5)
        batcher.shutdown()
        batcher.shutdown()  # no hang, no error


class TestRealtimeStreamingTTS:
    def test_streaming_tts_path_sends_deltas(self):
        """When the TTS exposes synthesize_stream, one delta must flow per
        generator chunk (not one post-hoc split of a full waveform)."""
        import asyncio as aio

        from qwen3_asr_swift_tpu.serving.server import RealtimeSession

        class StreamingTTS:
            sample_rate = 16000

            def synthesize_stream(self, text):
                from qwen3_asr_swift_tpu.core.types import AudioChunk

                for i in range(3):
                    yield AudioChunk(np.full(1600, 0.1 * (i + 1), np.float32), 16000)

            def synthesize(self, text):  # pragma: no cover — stream wins
                raise AssertionError("stream path should be taken")

        sent = []

        class FakeWS:
            async def send_text(self, text):
                sent.append(json.loads(text))

        class FakeServer:
            class registry:  # noqa: N801
                @staticmethod
                async def get(name):
                    return StreamingTTS() if name == "tts" else None

        sess = RealtimeSession.__new__(RealtimeSession)
        sess.server = FakeServer()
        sess.ws = FakeWS()
        sess._last_transcript = "hi"
        sess._event_counter = 0
        aio.run(sess._response({"response": {"instructions": "hi"}}))
        types = [m["type"] for m in sent]
        assert types.count("response.audio.delta") == 3
        assert types[-1] == "response.done"


class TestTTSBatcher:
    def test_groups_equal_kwargs_into_one_batch(self):
        import threading

        from qwen3_asr_swift_tpu.serving.batching import TTSBatcher

        calls = []

        class BatchTTS:
            def synthesize_batch(self, texts, **kw):
                calls.append(("batch", list(texts)))
                from qwen3_asr_swift_tpu.core.types import AudioChunk

                return [AudioChunk(np.zeros(10, np.float32), 16000) for _ in texts]

            def synthesize(self, text, **kw):
                calls.append(("single", text))
                from qwen3_asr_swift_tpu.core.types import AudioChunk

                return AudioChunk(np.zeros(10, np.float32), 16000)

        b = TTSBatcher(BatchTTS(), max_batch=4, max_wait_ms=150)
        results = [None] * 4

        def worker(i):
            results[i] = b.synthesize(f"text {i}", timeout=30)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        b.shutdown()
        assert all(r is not None for r in results)
        assert b.stats["requests_served"] == 4
        # at least one genuinely batched call happened
        assert any(kind == "batch" and len(texts) > 1 for kind, texts in calls)

    def test_mixed_kwargs_split_batches(self):
        from qwen3_asr_swift_tpu.serving.batching import TTSBatcher

        class TTS:
            def synthesize(self, text, **kw):
                from qwen3_asr_swift_tpu.core.types import AudioChunk

                return AudioChunk(np.zeros(4, np.float32), 16000)

        b = TTSBatcher(TTS(), max_batch=4, max_wait_ms=10)
        f1 = b.submit("a", voice="x")
        f2 = b.submit("b", voice="y")
        assert f1.result(30) is not None and f2.result(30) is not None
        b.shutdown()


class TestEnhanceRespondRoutes:
    @pytest.fixture()
    def full_server(self):
        class FakeEnhancer:
            def enhance(self, audio, sample_rate):
                return AudioChunk(np.asarray(audio, np.float32) * 0.5, sample_rate)

        class FakeS2S:
            def respond(self, audio, sample_rate=16000, **kw):
                self.seen_kwargs = kw
                self.last_text_tokens = np.asarray([4, 5, 6], np.int32)
                self.last_transcript = "hello there"
                return AudioChunk(np.zeros(2400, np.float32), 24000)

        registry = ModelRegistry()
        registry.register_instance("enhance", FakeEnhancer())
        registry.register_instance("s2s", FakeS2S())
        srv = SpeechServer(registry, host="127.0.0.1", port=0)
        loop = asyncio.new_event_loop()
        started = threading.Event()
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

        t = threading.Thread(target=run, daemon=True)
        t.start()
        assert started.wait(5)
        yield holder["port"]
        loop.call_soon_threadsafe(holder["task"].cancel)
        t.join(timeout=10)

    def test_enhance_route(self, full_server):
        wav = wav_bytes(np.ones(4800, np.float32) * 0.5, 48000)
        status, head, body = http_request(full_server, "POST", "/enhance", wav, "audio/wav")
        assert status == 200
        assert body[:4] == b"RIFF"

    def test_respond_route(self, full_server):
        wav = wav_bytes(np.zeros(2400, np.float32), 24000)
        status, head, body = http_request(full_server, "POST", "/respond", wav, "audio/wav")
        assert status == 200
        assert body[:4] == b"RIFF"

    def test_respond_json_format_with_transcript(self, full_server):
        """format=json returns duration + transcript + base64 WAV and
        forwards max_steps/system_prompt/seed (reference:
        AudioServer.swift:111-150)."""
        import base64 as b64
        import json as js

        pcm = (np.zeros(2400, np.float32) * 32767).astype(np.int16).tobytes()
        payload = js.dumps({
            "audio_base64": b64.b64encode(pcm).decode(),
            "sample_rate": 24000, "format": "json",
            "max_steps": 7, "system_prompt": "be brief", "seed": 3,
        }).encode()
        status, head, body = http_request(full_server, "POST", "/respond",
                                          payload, "application/json")
        assert status == 200
        out = js.loads(body)
        assert out["transcript"] == "hello there"
        assert out["text_tokens"] == 3
        assert out["text_token_ids"] == [4, 5, 6]
        assert b64.b64decode(out["audio_base64"])[:4] == b"RIFF"
        assert out["duration"] == 0.1


class TestHTTPHardening:
    """Transfer-encoding and malformed-request behavior of the hand-rolled
    HTTP layer (chunked bodies, bad content-length, header caps,
    100-continue)."""

    @staticmethod
    def _raw(port, payload: bytes) -> bytes:
        with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
            s.sendall(payload)
            data = b""
            while True:
                try:
                    chunk = s.recv(65536)
                except socket.timeout:
                    break
                if not chunk:
                    break
                data += chunk
        return data

    def test_chunked_transfer_request(self, server):
        audio = np.zeros(1600, np.int16).tobytes()
        body = json.dumps({"audio_base64": base64.b64encode(audio).decode(),
                           "sample_rate": 16000}).encode()
        mid = len(body) // 2
        chunked = (f"{mid:x}\r\n".encode() + body[:mid] + b"\r\n"
                   + f"{len(body) - mid:x}\r\n".encode() + body[mid:] + b"\r\n"
                   + b"0\r\n\r\n")
        req = (b"POST /transcribe HTTP/1.1\r\nHost: x\r\nConnection: close\r\n"
               b"Content-Type: application/json\r\n"
               b"Transfer-Encoding: chunked\r\n\r\n") + chunked
        data = self._raw(server, req)
        assert b"200" in data.split(b"\r\n", 1)[0]
        assert b"len=1600" in data

    def test_bad_content_length(self, server):
        req = (b"POST /transcribe HTTP/1.1\r\nHost: x\r\nConnection: close\r\n"
               b"Content-Length: banana\r\n\r\n")
        data = self._raw(server, req)
        assert b"400" in data.split(b"\r\n", 1)[0]

    def test_oversized_chunked_body_rejected(self, server):
        # declare a chunk larger than max_body without sending it all
        req = (b"POST /transcribe HTTP/1.1\r\nHost: x\r\nConnection: close\r\n"
               b"Transfer-Encoding: chunked\r\n\r\n"
               + f"{512 * 1024 * 1024:x}\r\n".encode())
        data = self._raw(server, req)
        assert b"413" in data.split(b"\r\n", 1)[0]

    def test_expect_100_continue(self, server):
        body = b"{}"
        req = (b"GET /health HTTP/1.1\r\nHost: x\r\nConnection: close\r\n"
               b"Expect: 100-continue\r\n"
               + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
        data = self._raw(server, req)
        assert data.startswith(b"HTTP/1.1 100 Continue")
        assert b"200 OK" in data

    def test_too_many_headers(self, server):
        headers = "".join(f"X-H{i}: v\r\n" for i in range(150)).encode()
        req = (b"GET /health HTTP/1.1\r\nHost: x\r\nConnection: close\r\n"
               + headers + b"\r\n")
        data = self._raw(server, req)
        assert b"431" in data.split(b"\r\n", 1)[0]

    def test_keep_alive_two_requests_one_connection(self, server):
        with socket.create_connection(("127.0.0.1", server), timeout=10) as s:
            for i in range(2):
                s.sendall(b"GET /health HTTP/1.1\r\nHost: x\r\n\r\n")
                buf = b""
                while b"\r\n\r\n" not in buf:
                    buf += s.recv(65536)
                head, _, rest = buf.partition(b"\r\n\r\n")
                length = int([l for l in head.split(b"\r\n")
                              if l.lower().startswith(b"content-length")][0].split(b":")[1])
                while len(rest) < length:
                    rest += s.recv(65536)
                assert b'"status": "ok"' in rest


class TestWsCodecHardening:
    @staticmethod
    def _run(coro_fn, *frames, **kw):
        """Run coro_fn(reader) with a StreamReader preloaded with frames
        (the reader must be built inside a running loop on py3.12)."""
        async def go():
            r = asyncio.StreamReader()
            for f in frames:
                r.feed_data(f)
            r.feed_eof()
            return await coro_fn(r)

        return asyncio.run(go())

    def _masked(self, opcode, payload, fin=True):
        import struct as st

        mask = b"\x11\x22\x33\x44"
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        head = bytearray([(0x80 if fin else 0) | opcode])
        n = len(payload)
        if n < 126:
            head.append(0x80 | n)
        else:
            head.append(0x80 | 126)
            head += st.pack(">H", n)
        return bytes(head) + mask + masked

    def test_ping_between_fragments_preserved(self):
        """RFC 6455 §5.4: control frames may interleave between fragments;
        the reassembly buffer must survive them."""
        from qwen3_asr_swift_tpu.serving.ws import OP_PING, read_message

        pings = []

        async def on_control(op, payload):
            pings.append((op, payload))

        op, payload = self._run(
            lambda r: read_message(r, on_control=on_control),
            self._masked(OP_TEXT, b'{"par', fin=False),
            self._masked(OP_PING, b"hb"),
            self._masked(0x0, b't":1}', fin=True),  # continuation
        )
        assert payload == b'{"part":1}'
        assert pings == [(OP_PING, b"hb")]

    def test_reassembled_message_size_capped(self):
        from qwen3_asr_swift_tpu.serving.ws import read_message

        with pytest.raises(ValueError, match="too large"):
            self._run(lambda r: read_message(r, max_size=100),
                      self._masked(OP_TEXT, b"x" * 80, fin=False),
                      self._masked(0x0, b"y" * 80, fin=True))

    def test_unmask_vectorized_correct(self):
        from qwen3_asr_swift_tpu.serving.ws import _unmask

        payload = bytes(range(256)) * 41  # non-multiple of 4 tail
        mask = b"\xaa\x01\x7f\x33"
        expect = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        assert _unmask(payload, mask) == expect


class TestHttpHardening2:
    def test_overlong_header_line_431(self, server):
        import socket as sk

        with sk.create_connection(("127.0.0.1", server), timeout=10) as s:
            s.sendall(b"GET /health HTTP/1.1\r\nHost: x\r\nX-Big: " + b"a" * 100_000
                      + b"\r\n\r\n")
            data = b""
            while True:
                try:
                    chunk = s.recv(65536)
                except TimeoutError:
                    break
                if not chunk:
                    break
                data += chunk
        assert b"431" in data.split(b"\r\n")[0]

    def test_malformed_bodies_return_400(self, server):
        # bad JSON
        status, _, _ = http_request(server, "POST", "/transcribe", b"{nope",
                                    "application/json")
        assert status == 400
        # missing audio_base64
        status, _, _ = http_request(server, "POST", "/transcribe", b"{}",
                                    "application/json")
        assert status == 400
        # invalid base64
        status, _, _ = http_request(server, "POST", "/transcribe",
                                    json.dumps({"audio_base64": "!!!"}).encode(),
                                    "application/json")
        assert status == 400
        # invalid WAV bytes
        status, _, _ = http_request(server, "POST", "/transcribe", b"not a wav",
                                    "audio/wav")
        assert status == 400


class TestBatcherShutdown:
    def test_shutdown_fails_queued_futures(self):
        import queue as q

        class Slow:
            def transcribe_batch(self, audios, sample_rate=16000, **kw):
                time.sleep(0.3)
                return [TranscriptionResult(text="t", confidence=1.0, duration=0.1)
                        for _ in audios]

        b = ContinuousBatcher(Slow(), max_batch=1, max_wait_ms=1, workers=1)
        futs = [b.submit(np.zeros(10, np.float32)) for _ in range(6)]
        b.shutdown()
        resolved = 0
        for f in futs:
            try:
                f.result(timeout=5)
                resolved += 1
            except RuntimeError as e:
                assert "shut down" in str(e)
        # every future resolves one way or the other — none hang
        assert all(f.done() for f in futs)


class TestStreamingTTSFailure:
    def test_producer_error_reaches_client(self):
        class ExplodingTTS:
            def synthesize_stream(self, text, **kw):
                yield AudioChunk(np.zeros(1600, np.float32), 16000)
                raise RuntimeError("device fell over")

        registry = ModelRegistry()
        registry.register_instance("tts", ExplodingTTS())
        srv = SpeechServer(registry, host="127.0.0.1", port=0)
        loop = asyncio.new_event_loop()
        started = threading.Event()
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

        t = threading.Thread(target=run, daemon=True)
        t.start()
        assert started.wait(5)
        try:
            c = WsClient(holder["port"])
            c.recv_json()
            c.send_json({"type": "response.create",
                         "response": {"instructions": "hi"}})
            events = [c.recv_json() for _ in range(4)]
            types = [e["type"] for e in events]
            assert "error" in types
            done = [e for e in events if e["type"] == "response.done"]
            assert done and done[0]["response"]["status"] == "incomplete"
            assert "response.audio.done" not in types
            c.close()
        finally:
            loop.call_soon_threadsafe(holder["task"].cancel)
            t.join(timeout=10)

"""Streaming dictation demo: VAD-gated streaming ASR over a WAV file.

Analog of the reference's DictateDemo app (reference: Examples/DictateDemo
— live microphone → VAD → partial + final transcripts). Here the "mic" is
a WAV file streamed in 250 ms chunks; partials print in-place, finals on
their own line.

    python examples/dictate_demo.py path/to/audio.wav [--random-weights]

``--ws`` exercises the FULL serving stack end-to-end instead of calling
the model in-process: it starts a SpeechServer, connects to
``/v1/realtime`` as a real WebSocket client (serving.ws.SyncWSClient),
streams the audio as base64 PCM16 ``input_audio_buffer.append`` events,
commits, and prints the transcription events the server sends back —
the same wire path a real dictation client uses.

    python examples/dictate_demo.py audio.wav --ws --random-weights
"""

import argparse
import asyncio
import base64
import sys
import threading
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def run_ws_mode(audio: np.ndarray, rate: int, asr) -> None:
    """Serve + connect + stream: the reference DictateDemo's loop, but
    through the REST/WS server instead of in-process calls."""
    from qwen3_asr_swift_tpu.serving import ModelRegistry, SpeechServer
    from qwen3_asr_swift_tpu.serving.ws import SyncWSClient

    registry = ModelRegistry()
    registry.register_instance("asr", asr)
    srv = SpeechServer(registry, host="127.0.0.1", port=0)
    loop = asyncio.new_event_loop()
    started = threading.Event()
    holder = {}

    def serve():
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

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    if not started.wait(10):
        raise RuntimeError("server did not start")

    ws = SyncWSClient("127.0.0.1", holder["port"])
    evt = ws.recv_json()
    assert evt["type"] == "session.created", evt
    print(f"connected: session {evt['session']['id']} on port {holder['port']}")

    pcm = np.clip(audio, -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2").tobytes()
    chunk_bytes = (rate // 4) * 2  # 250 ms of pcm16
    for off in range(0, len(pcm16), chunk_bytes):
        ws.send_json({"type": "input_audio_buffer.append",
                      "audio": base64.b64encode(pcm16[off: off + chunk_bytes]).decode()})
        sys.stdout.write(f"\r… sent {min(off + chunk_bytes, len(pcm16)) // 2 / rate:.2f}s")
        sys.stdout.flush()
    ws.send_json({"type": "input_audio_buffer.commit"})
    while True:
        evt = ws.recv_json()
        if evt is None:
            print("\rserver closed before transcript")
            break
        if evt["type"] == "conversation.item.input_audio_transcription.completed":
            print(f"\r{evt['transcript']}")
            break
        if evt["type"] == "error":
            print(f"\rerror: {evt}")
            break
    ws.close()
    loop.call_soon_threadsafe(holder["task"].cancel)
    t.join(timeout=10)
    print("done (via /v1/realtime)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("audio")
    ap.add_argument("--random-weights", action="store_true")
    ap.add_argument("--ws", action="store_true",
                    help="drive the serving stack (SpeechServer + /v1/realtime "
                         "WebSocket) instead of in-process calls")
    ap.add_argument("--model", default="aufklarer/Qwen3-ASR-0.6B-MLX-4bit")
    args = ap.parse_args()

    from qwen3_asr_swift_tpu.audio.io import load_audio
    from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR, config_tiny
    from qwen3_asr_swift_tpu.models.qwen3_asr.streaming import StreamingASR
    from qwen3_asr_swift_tpu.models.silero_vad import SileroVAD

    if args.random_weights:
        asr = Qwen3ASR.init_random(config_tiny(), audio_buckets_s=(8,))
        vad = SileroVAD.init_random()
    else:
        asr = Qwen3ASR.from_pretrained(args.model)
        vad = SileroVAD.from_pretrained()

    audio, rate = load_audio(args.audio, target_rate=16000)
    if args.ws:
        run_ws_mode(audio, rate, asr)
        return
    streamer = StreamingASR(asr, vad)
    chunk = rate // 4

    def show(partials):
        for partial in partials:
            if partial.is_final:
                sys.stdout.write(f"\r{partial.text}\n")
            else:
                sys.stdout.write(f"\r… {partial.text[:100]}")
            sys.stdout.flush()

    for off in range(0, len(audio), chunk):
        show(streamer.push(audio[off: off + chunk]))
    show(streamer.finish())
    print("done")


if __name__ == "__main__":
    main()

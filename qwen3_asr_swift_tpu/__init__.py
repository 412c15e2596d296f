"""qwen3_asr_swift_tpu — a TPU-native speech AI framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
``ivan-digital/qwen3-asr-swift`` on-device speech stack (ASR, TTS,
speech-to-speech, VAD, diarization, enhancement, separation, wake word,
alignment, chat, translation), built for TPU:

- DSP frontends are fused XLA/Pallas programs (STFT-as-convolution onto the
  MXU) instead of per-frame CPU loops.
- Models are functional JAX modules compiled once with ``jax.jit`` over
  bucketed static shapes; autoregressive decode runs entirely on device in
  ``lax.while_loop`` with preallocated KV caches.
- Scaling is first-class: ``jax.sharding.Mesh`` + pjit/shard_map provide
  data/tensor parallelism over ICI (the reference is single-device).

Package layout:
    core/        protocols, value types, configs, HF hub cache, weight loading
    audio/       WAV I/O, resampling, ring buffers
    tokenizers/  Qwen byte-level BPE, SentencePiece reader
    ops/         Pallas/XLA kernels: mel frontend, attention, quant matmul,
                 KV cache, sampling
    models/      model families (qwen3_asr, silero_vad, parakeet, kokoro, ...)
    parallel/    device mesh + sharding rules
    serving/     continuous-batching scheduler + HTTP/WebSocket server
    pipeline/    voice-agent pipeline (bindings to the C++ engine)
    runtime/     C++ native runtime (voice engine, audio ring, resampler)
"""

__version__ = "0.1.0"

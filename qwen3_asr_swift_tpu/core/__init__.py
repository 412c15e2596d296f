"""Core foundation: types, protocols, configs, hub cache, weight loading."""

from .types import (  # noqa: F401
    AlignedWord,
    AudioChunk,
    DiarizedSegment,
    ModelMemoryStats,
    PartialTranscription,
    SpeechSegment,
    TranscriptionResult,
    WordConfidence,
    to_float32,
    to_pcm16,
)
from .loader import (  # noqa: F401
    MemoryTier,
    ModelLoader,
    ModelSet,
    ModelSpec,
    can_fit,
    device_memory_bytes,
)
from .text_chunker import chunk_text  # noqa: F401
from .protocols import (  # noqa: F401
    ForcedAlignmentModel,
    PipelineLLM,
    SourceSeparationModel,
    SpeakerDiarizationModel,
    SpeakerEmbeddingModel,
    SpeechEnhancementModel,
    SpeechGenerationModel,
    SpeechModel,
    SpeechRecognitionModel,
    SpeechToSpeechModel,
    StreamingRecognitionModel,
    StreamingVADProvider,
    TranslationModel,
    VoiceActivityDetectionModel,
    WakeWordModel,
)


def enable_persistent_cache(cache_dir: str = "/tmp/jax_cache",
                            min_compile_secs: float = 1.0) -> None:
    """Persist compiled XLA programs across processes — model cold-start
    drops from minutes to seconds on re-runs (the TPU analog of shipping
    precompiled .mlmodelc artifacts; reference cold vs warm load:
    docs/benchmarks/asr-wer.md:21-23)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)

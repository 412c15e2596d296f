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

"""Audio I/O: WAV parse/write, resampling, ring buffers."""

from .io import load_audio, read_wav, wav_bytes, write_wav, WAVError  # noqa: F401
from .resample import resample, resample_jax  # noqa: F401
from .ringbuffer import AudioRingBuffer  # noqa: F401
from .player import StreamingAudioPlayer  # noqa: F401

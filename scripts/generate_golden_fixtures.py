"""Generate golden DSP/encoder fixtures for regression testing.

Analog of the reference's fixture generator (reference:
scripts/kws/generate_fbank_reference.py — emits fbank_reference.bin /
ref_encoder_light_up.bin consumed bit-close by Tests/SpeechWakeWordTests).
Here one script snapshots every DSP frontend plus a fixed-seed wake-word
encoder pass into a single npz; tests/test_golden_fixtures.py recomputes
and compares, so any refactor that drifts a frontend numerically fails
loudly instead of silently shifting model inputs.

    python scripts/generate_golden_fixtures.py [out.npz]

Inputs are deterministic synthetic signals (a chirp and a fixed-seed noise
burst), so fixtures regenerate identically on any host.
"""

import sys

import numpy as np


def chirp(seconds=1.0, sr=16000, f0=100.0, f1=4000.0):
    t = np.arange(int(seconds * sr)) / sr
    phase = 2 * np.pi * (f0 * t + (f1 - f0) * t * t / (2 * seconds))
    return (0.5 * np.sin(phase)).astype(np.float32)


def main(out_path="tests/fixtures/golden_dsp.npz"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qwen3_asr_swift_tpu.models.enhancement.model import erb_filterbank, vorbis_window
    from qwen3_asr_swift_tpu.models.kokoro.phonemizer import phonemes_to_ids, phonemize
    from qwen3_asr_swift_tpu.models.parakeet.config import config_tiny as pk_tiny
    from qwen3_asr_swift_tpu.models.parakeet.mel import nemo_log_mel_reference
    from qwen3_asr_swift_tpu.models.speaker.campplus import campplus_fbank
    from qwen3_asr_swift_tpu.models.wakeword.context_graph import Keyword
    from qwen3_asr_swift_tpu.models.wakeword.model import WakeWordDetector
    from qwen3_asr_swift_tpu.ops.fbank import kaldi_fbank
    from qwen3_asr_swift_tpu.ops.mel import log_mel_reference

    audio = chirp()
    rng = np.random.default_rng(1234)
    noise = (0.2 * rng.standard_normal(16000)).astype(np.float32)

    fixtures = {
        "audio_chirp": audio,
        "audio_noise": noise,
        # Whisper-style mel (Qwen3-ASR frontend)
        "whisper_mel": np.asarray(log_mel_reference(audio), np.float32),
        # NeMo mel (Parakeet/Sortformer frontend)
        "nemo_mel": np.asarray(nemo_log_mel_reference(audio, pk_tiny()), np.float32),
        # Kaldi fbank (wake-word frontend)
        "kaldi_fbank": np.asarray(kaldi_fbank(jnp.asarray(audio)), np.float32),
        # CAM++ fbank (HTK mel + CMN)
        "campplus_fbank": np.asarray(campplus_fbank(jnp.asarray(audio)), np.float32),
        # DFN3 constants (Vorbis window, rectangular ERB bands)
        "dfn3_window": vorbis_window(),
        "dfn3_erb_fb": erb_filterbank(),
        # phonemizer snapshot (English + zh + ja)
        "phoneme_ids_en": np.asarray(
            phonemes_to_ids(phonemize("the quick brown fox")), np.int32),
        "phoneme_ids_zh": np.asarray(
            phonemes_to_ids(phonemize("ni3 hao3", language="zh")), np.int32),
    }

    # fixed-seed wake-word detector pass over the noise burst (the
    # reference's ref_encoder_light_up.bin analog): the detection outcome on
    # a fixed clip with fixed random weights is a stable end-to-end snapshot
    # of fbank + zipformer + transducer decode
    det = WakeWordDetector.init_random([Keyword("hey", token_ids=(1, 2))], seed=7)
    dets = det.detect_keywords(noise)
    fixtures["kws_detection_count"] = np.asarray([len(dets)], np.int32)

    import os

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez_compressed(out_path, **fixtures)
    for k, v in fixtures.items():
        print(f"  {k}: {getattr(v, 'shape', None)} {getattr(v, 'dtype', None)}")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])

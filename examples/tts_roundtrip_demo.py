"""TTS → ASR round-trip demo (the reference's benchmark methodology).

Analog of the reference's tts-roundtrip benchmark (reference:
docs/benchmarks/tts-roundtrip.md — synthesize sentences, transcribe them
back with Qwen3-ASR, report WER and RTF).

    python examples/tts_roundtrip_demo.py [--random-weights]
"""

import argparse
import time

import numpy as np

SENTENCES = [
    "The quick brown fox jumps over the lazy dog.",
    "TPU chips multiply matrices at extraordinary speed.",
    "Speech synthesis and recognition close the loop.",
]


def word_error_rate(ref: str, hyp: str) -> float:
    r, h = ref.lower().split(), hyp.lower().split()
    d = np.zeros((len(r) + 1, len(h) + 1), np.int32)
    d[:, 0] = np.arange(len(r) + 1)
    d[0, :] = np.arange(len(h) + 1)
    for i in range(1, len(r) + 1):
        for j in range(1, len(h) + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (r[i - 1] != h[j - 1]))
    return float(d[-1, -1]) / max(len(r), 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--random-weights", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from qwen3_asr_swift_tpu.audio.resample import resample
    from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR
    from qwen3_asr_swift_tpu.models.qwen3_tts import Qwen3TTS, TTSSamplingConfig

    if args.random_weights:
        from qwen3_asr_swift_tpu.models.qwen3_asr import config_tiny as asr_tiny
        from qwen3_asr_swift_tpu.models.qwen3_tts import config_tiny as tts_tiny
        from qwen3_asr_swift_tpu.tokenizers.bpe import BPETokenizer, _bytes_to_unicode

        b2u = _bytes_to_unicode()
        tok = BPETokenizer({ch: i for i, ch in enumerate(b2u[b] for b in range(256))}, [])
        tts = Qwen3TTS.init_random(tts_tiny(), dtype=jnp.float32, tokenizer=tok)
        asr = Qwen3ASR.init_random(asr_tiny(), audio_buckets_s=(8,))
        sampling = TTSSamplingConfig(max_frames=6, temperature=0.0)
    else:
        tts = Qwen3TTS.from_pretrained()
        asr = Qwen3ASR.from_pretrained()
        sampling = TTSSamplingConfig()

    wers, rtfs = [], []
    for sentence in SENTENCES:
        t0 = time.perf_counter()
        chunk = tts.synthesize(sentence, sampling=sampling)
        synth_s = time.perf_counter() - t0
        dur = len(chunk.samples) / chunk.sample_rate
        audio16 = resample(chunk.samples, chunk.sample_rate, 16000)
        hyp = asr.transcribe(audio16).text if len(audio16) else ""
        wer = word_error_rate(sentence, hyp)
        wers.append(wer)
        rtfs.append(synth_s / max(dur, 1e-6))
        print(f"  {sentence[:44]:<46} WER {wer:5.1%}  TTS-RTF {rtfs[-1]:.2f}")
    print(f"mean WER {np.mean(wers):.1%}  mean RTF {np.mean(rtfs):.2f}")


if __name__ == "__main__":
    main()

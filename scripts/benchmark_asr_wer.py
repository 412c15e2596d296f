"""ASR WER/RTF benchmark (LibriSpeech test-clean).

Reproduction script for the reference's headline table (reference:
docs/benchmarks/asr-wer.md — Qwen3-ASR 0.6B 4-bit: 3.34% WER, RTF 0.023
on M2 Max; scripts/benchmark_asr_wer.py is cited there but not shipped).

Requires local data + cached weights (no downloads here):
- LIBRISPEECH_DIR: a LibriSpeech split directory (e.g. .../test-clean)
  with the usual <spk>/<chap>/<spk>-<chap>-<utt>.flac|.wav + .trans.txt
- model weights under the hub cache (QWEN3_CACHE_DIR)

Usage:
  LIBRISPEECH_DIR=~/data/test-clean python scripts/benchmark_asr_wer.py \
      --model aufklarer/Qwen3-ASR-0.6B-MLX-4bit --limit 200 --batch 16
"""

import argparse
import os
import re
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def word_error_counts(ref: str, hyp: str):
    r, h = ref.split(), hyp.split()
    d = np.zeros((len(r) + 1, len(h) + 1), np.int32)
    d[:, 0] = np.arange(len(r) + 1)
    d[0, :] = np.arange(len(h) + 1)
    for i in range(1, len(r) + 1):
        for j in range(1, len(h) + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (r[i - 1] != h[j - 1]))
    return int(d[-1, -1]), len(r)


def normalize(text: str) -> str:
    return " ".join(re.sub(r"[^a-z' ]", " ", text.lower()).split())


def iter_librispeech(root: Path):
    for trans in sorted(root.rglob("*.trans.txt")):
        refs = {}
        for line in trans.read_text().splitlines():
            utt, _, text = line.partition(" ")
            refs[utt] = text
        for utt, text in refs.items():
            for ext in (".flac", ".wav"):
                p = trans.parent / f"{utt}{ext}"
                if p.exists():
                    yield p, text
                    break


def load_clip(path: Path):
    if path.suffix == ".wav":
        from qwen3_asr_swift_tpu.audio.io import read_wav

        return read_wav(str(path))
    try:
        import soundfile as sf  # optional

        audio, rate = sf.read(str(path), dtype="float32")
        return np.asarray(audio, np.float32), rate
    except ImportError:
        raise SystemExit("flac input needs soundfile; convert to wav or "
                         "pip-install soundfile in your own environment")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="aufklarer/Qwen3-ASR-0.6B-MLX-4bit")
    ap.add_argument("--limit", type=int, default=200)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--beam", type=int, default=0,
                    help="beam width (0 = greedy). Beam-vs-greedy WER A/B: "
                         "run once with --beam 0 and once with --beam 4")
    ap.add_argument("--length-penalty", type=float, default=1.0)
    args = ap.parse_args()

    data_dir = os.environ.get("LIBRISPEECH_DIR")
    if not data_dir or not Path(data_dir).exists():
        raise SystemExit("set LIBRISPEECH_DIR to a LibriSpeech split directory")

    from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR

    print(f"loading {args.model} …", file=sys.stderr)
    model = Qwen3ASR.from_pretrained(args.model)

    clips = []
    for path, ref in iter_librispeech(Path(data_dir)):
        clips.append((path, ref))
        if len(clips) >= args.limit:
            break
    print(f"{len(clips)} utterances", file=sys.stderr)

    errors = words = 0
    audio_s = wall = 0.0
    for off in range(0, len(clips), args.batch):
        group = clips[off: off + args.batch]
        audios = []
        for path, _ in group:
            a, r = load_clip(path)
            if a.ndim > 1:
                a = a.mean(axis=-1)
            audios.append((a, r))
        from qwen3_asr_swift_tpu.ops.sampling import SamplingOptions

        opts = SamplingOptions(beam=args.beam,
                               length_penalty=args.length_penalty) \
            if args.beam > 1 else None
        t0 = time.perf_counter()
        results = model.transcribe_batch([a for a, _ in audios],
                                         sample_rate=audios[0][1],
                                         options=opts)
        wall += time.perf_counter() - t0
        for (a, r), (_, ref), res in zip(audios, group, results):
            audio_s += len(a) / r
            e, w = word_error_counts(normalize(ref), normalize(res.text))
            errors += e
            words += w
        done = off + len(group)
        print(f"  {done}/{len(clips)}  WER {errors / max(words,1):.2%}  "
              f"RTF {wall / max(audio_s, 1e-9):.4f}", file=sys.stderr)

    print(f"\nmodel: {args.model}")
    print(f"utterances: {len(clips)}   audio: {audio_s/60:.1f} min")
    print(f"WER: {errors / max(words,1):.2%}   RTF: {wall / max(audio_s,1e-9):.4f} "
          f"({audio_s / max(wall,1e-9):.0f}x real-time)")
    print("reference (M2 Max, 0.6B 4-bit): WER 3.34%  RTF 0.023  (asr-wer.md:16)")


if __name__ == "__main__":
    main()

"""Speaker diarization: VAD → segmentation → embeddings → clustering.

TPU-native analog of the reference's pipeline
(reference: Sources/SpeechVAD/DiarizationPipeline.swift:78-278,
DiarizationHelpers.swift:83-168): speech regions from VAD, fixed-size
sliding embedding windows within each region, per-window speaker
embeddings (batched through the embedding model), constrained
agglomerative clustering on cosine distance, then merge/compact of
adjacent same-speaker segments.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from ...core import DiarizedSegment, SpeakerDiarizationModel, SpeakerEmbeddingModel, SpeechSegment


@dataclasses.dataclass(frozen=True)
class DiarizationConfig:
    window_s: float = 1.5
    hop_s: float = 0.75
    min_segment_s: float = 0.3
    cluster_threshold: float = 0.35  # cosine distance for agglomerative stop
    max_speakers: int = 10


def agglomerative_cluster(embeddings: np.ndarray, threshold: float,
                          num_clusters: Optional[int] = None, max_clusters: int = 10) -> np.ndarray:
    """Average-linkage agglomerative clustering on cosine distance
    (reference: DiarizationHelpers agglomerative clustering).
    embeddings: [N, D] L2-normalized. Returns labels [N]."""
    n = len(embeddings)
    if n == 0:
        return np.zeros(0, np.int32)
    clusters = [[i] for i in range(n)]
    sim = embeddings @ embeddings.T
    dist = 1.0 - sim

    def cluster_dist(a, b):
        return float(np.mean([dist[i, j] for i in a for j in b]))

    while len(clusters) > 1:
        if num_clusters is not None and len(clusters) <= num_clusters:
            break
        best = None
        best_d = np.inf
        for i in range(len(clusters)):
            for j in range(i + 1, len(clusters)):
                d = cluster_dist(clusters[i], clusters[j])
                if d < best_d:
                    best_d = d
                    best = (i, j)
        if best is None:
            break
        if num_clusters is None and best_d > threshold and len(clusters) <= max_clusters:
            break
        i, j = best
        clusters[i] = clusters[i] + clusters[j]
        del clusters[j]

    labels = np.zeros(n, np.int32)
    # stable speaker ids ordered by first appearance
    order = sorted(range(len(clusters)), key=lambda c: min(clusters[c]))
    for new_id, c in enumerate(order):
        for idx in clusters[c]:
            labels[idx] = new_id
    return labels


class DiarizationPipeline(SpeakerDiarizationModel):
    def __init__(self, vad, embedder: SpeakerEmbeddingModel,
                 config: DiarizationConfig = DiarizationConfig()):
        self.vad = vad
        self.embedder = embedder
        self.cfg = config
        self._loaded = True

    @classmethod
    def from_pretrained(cls, model_id: str = "", **kw) -> "DiarizationPipeline":
        from ..silero_vad import SileroVAD
        from ..speaker import WeSpeaker

        return cls(SileroVAD.from_pretrained(), WeSpeaker.from_pretrained(), **kw)

    def diarize(self, audio: np.ndarray, sample_rate: int = 16000,
                num_speakers: Optional[int] = None, **kwargs) -> Sequence[DiarizedSegment]:
        if sample_rate != 16000:
            from ...audio.resample import resample

            audio = resample(audio.astype(np.float32), sample_rate, 16000)
            sample_rate = 16000
        sr = sample_rate
        cfg = self.cfg

        speech: Sequence[SpeechSegment] = self.vad.detect_speech(audio, sr)
        windows: List[tuple] = []  # (start_s, end_s, samples)
        win = int(cfg.window_s * sr)
        hop = int(cfg.hop_s * sr)
        for seg in speech:
            s0 = int(seg.start * sr)
            s1 = int(seg.end * sr)
            if s1 - s0 < int(cfg.min_segment_s * sr):
                continue
            pos = s0
            while pos < s1:
                end = min(pos + win, s1)
                if end - pos >= int(cfg.min_segment_s * sr):
                    windows.append((pos / sr, end / sr, audio[pos:end]))
                if end >= s1:
                    break
                pos += hop

        if not windows:
            return []

        embs = np.stack([self.embedder.embed(w[2], sr) for w in windows])
        labels = agglomerative_cluster(embs, cfg.cluster_threshold, num_speakers, cfg.max_speakers)

        # merge adjacent same-speaker windows (reference: merge/compact)
        segments: List[DiarizedSegment] = []
        for (start, end, _), label in zip(windows, labels):
            if segments and segments[-1].speaker == label and start <= segments[-1].end + cfg.hop_s:
                segments[-1] = DiarizedSegment(segments[-1].start, max(end, segments[-1].end), label)
            else:
                segments.append(DiarizedSegment(start, end, int(label)))
        return segments


# ---------------------------------------------------------------------------
# DER scoring (reference: Sources/SpeechVAD/DERScoring.swift)
# ---------------------------------------------------------------------------

def diarization_error_rate(reference: Sequence[DiarizedSegment],
                           hypothesis: Sequence[DiarizedSegment],
                           collar: float = 0.25, step: float = 0.01) -> dict:
    """Frame-based DER with optimal speaker mapping (Hungarian on overlap).

    Returns {"der", "miss", "false_alarm", "confusion"} as fractions of
    reference speech time."""
    if not reference:
        return {"der": 0.0, "miss": 0.0, "false_alarm": 0.0, "confusion": 0.0}
    end = max([s.end for s in reference] + [s.end for s in hypothesis] + [0.0])
    n = int(np.ceil(end / step)) + 1

    def rasterize(segs):
        grid = np.full(n, -1, np.int32)
        for s in segs:
            grid[int(s.start / step) : int(s.end / step)] = s.speaker
        return grid

    ref = rasterize(reference)
    hyp = rasterize(hypothesis)

    # collar: ignore frames near reference boundaries
    ignore = np.zeros(n, bool)
    c = int(collar / step)
    for s in reference:
        for b in (s.start, s.end):
            lo = max(0, int(b / step) - c)
            ignore[lo : int(b / step) + c] = True
    keep = ~ignore
    ref, hyp = ref[keep], hyp[keep]

    ref_spk = sorted(set(ref[ref >= 0]))
    hyp_spk = sorted(set(hyp[hyp >= 0]))
    overlap = np.zeros((len(ref_spk), len(hyp_spk)))
    for i, r in enumerate(ref_spk):
        for j, h in enumerate(hyp_spk):
            overlap[i, j] = np.sum((ref == r) & (hyp == h))
    mapping = {}
    if overlap.size:
        from scipy.optimize import linear_sum_assignment

        ri, hj = linear_sum_assignment(-overlap)
        mapping = {hyp_spk[j]: ref_spk[i] for i, j in zip(ri, hj)}

    hyp_mapped = np.array([mapping.get(h, -2) if h >= 0 else -1 for h in hyp])
    ref_time = np.sum(ref >= 0)
    if ref_time == 0:
        return {"der": 0.0, "miss": 0.0, "false_alarm": 0.0, "confusion": 0.0}
    miss = np.sum((ref >= 0) & (hyp == -1))
    fa = np.sum((ref == -1) & (hyp >= 0))
    conf = np.sum((ref >= 0) & (hyp >= 0) & (hyp_mapped != ref))
    return {
        "der": float((miss + fa + conf) / ref_time),
        "miss": float(miss / ref_time),
        "false_alarm": float(fa / ref_time),
        "confusion": float(conf / ref_time),
    }

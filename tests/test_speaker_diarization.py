"""Speaker embedding + diarization + DER tests."""

import numpy as np
import pytest

from qwen3_asr_swift_tpu.core import DiarizedSegment, SpeechSegment
from qwen3_asr_swift_tpu.models.diarization import (
    DiarizationConfig,
    DiarizationPipeline,
    agglomerative_cluster,
    diarization_error_rate,
)
from qwen3_asr_swift_tpu.models.speaker import WeSpeaker
from qwen3_asr_swift_tpu.ops.fbank import kaldi_fbank, kaldi_mel_banks


class TestFbank:
    def test_shapes_and_snip_edges(self):
        import jax.numpy as jnp

        audio = jnp.asarray(np.random.default_rng(0).standard_normal(16000), jnp.float32)
        fb = kaldi_fbank(audio)
        assert fb.shape == (1 + (16000 - 400) // 160, 80)

    def test_mel_banks_cover_spectrum(self):
        fb = kaldi_mel_banks()
        assert fb.shape == (257, 80)
        assert (fb.sum(axis=0) > 0).all()

    def test_tone_peak_bin(self):
        import jax.numpy as jnp

        t = np.arange(16000) / 16000
        audio = jnp.asarray(0.5 * np.sin(2 * np.pi * 1000 * t), jnp.float32)
        fb = np.asarray(kaldi_fbank(audio * 32768.0))
        peak = fb.mean(axis=0).argmax()
        from qwen3_asr_swift_tpu.ops.fbank import hz_to_mel_htk, mel_to_hz_htk

        centers = mel_to_hz_htk(np.linspace(hz_to_mel_htk(20.0), hz_to_mel_htk(8000.0), 82))[1:-1]
        assert abs(centers[peak] - 1000) < 150


class TestWeSpeaker:
    @pytest.fixture(scope="class")
    def model(self):
        return WeSpeaker.init_random()

    def test_embedding_normalized(self, model):
        audio = (0.3 * np.random.default_rng(0).standard_normal(16000)).astype(np.float32)
        emb = model.embed(audio)
        assert emb.shape == (256,)
        assert abs(np.linalg.norm(emb) - 1.0) < 1e-5

    def test_same_audio_same_embedding(self, model):
        audio = (0.3 * np.random.default_rng(1).standard_normal(16000)).astype(np.float32)
        e1, e2 = model.embed(audio), model.embed(audio)
        assert np.allclose(e1, e2, atol=1e-5)

    def test_embed_batch_matches_single(self, model):
        """One batched program row-for-row equals per-clip embed(),
        including mixed lengths sharing the largest bucket."""
        rng = np.random.default_rng(5)
        clips = [(0.1 * rng.standard_normal(n)).astype(np.float32)
                 for n in (16000, 24000, 8000)]
        batch = model.embed_batch(clips)
        assert batch.shape[0] == 3
        for i, c in enumerate(clips):
            np.testing.assert_allclose(batch[i], model.embed(c), atol=2e-5)
        assert model.embed_batch([]).shape[0] == 0

    def test_cosine_helper(self, model):
        a = np.array([1.0, 0.0]); b = np.array([0.0, 1.0])
        assert WeSpeaker.cosine_similarity(a, a) == pytest.approx(1.0)
        assert WeSpeaker.cosine_similarity(a, b) == pytest.approx(0.0)


class TestClustering:
    def test_two_clear_clusters(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal(16) + np.array([10.0] + [0] * 15)
        b = rng.standard_normal(16) + np.array([0] * 15 + [10.0])
        embs = np.stack([a + 0.01 * rng.standard_normal(16) for _ in range(3)]
                        + [b + 0.01 * rng.standard_normal(16) for _ in range(3)])
        embs /= np.linalg.norm(embs, axis=1, keepdims=True)
        labels = agglomerative_cluster(embs, threshold=0.5)
        assert len(set(labels[:3])) == 1
        assert len(set(labels[3:])) == 1
        assert labels[0] != labels[3]

    def test_num_clusters_constraint(self):
        rng = np.random.default_rng(1)
        embs = rng.standard_normal((6, 8))
        embs /= np.linalg.norm(embs, axis=1, keepdims=True)
        labels = agglomerative_cluster(embs, threshold=0.0, num_clusters=2)
        assert len(set(labels.tolist())) == 2


class FakeVAD:
    def detect_speech(self, audio, sr):
        # speech everywhere
        return [SpeechSegment(0.0, len(audio) / sr)]


class FakeEmbedder:
    """Two distinguishable 'speakers': loud vs quiet audio."""

    def embed(self, audio, sr):
        loud = np.abs(audio).mean() > 0.25
        e = np.array([1.0, 0.0] if loud else [0.0, 1.0]) + 0.01 * np.random.default_rng(0).standard_normal(2)
        return e / np.linalg.norm(e)


class TestDiarization:
    def test_two_speakers_split(self):
        sr = 16000
        rng = np.random.default_rng(0)
        loud = (0.5 * np.sign(rng.standard_normal(sr * 3))).astype(np.float32)
        quiet = (0.1 * np.sign(rng.standard_normal(sr * 3))).astype(np.float32)
        audio = np.concatenate([loud, quiet])
        pipe = DiarizationPipeline(FakeVAD(), FakeEmbedder(),
                                   DiarizationConfig(window_s=1.0, hop_s=1.0))
        segs = pipe.diarize(audio)
        assert len(segs) >= 2
        first_spk = segs[0].speaker
        last_spk = segs[-1].speaker
        assert first_spk != last_spk
        assert first_spk == 0  # first-appearance ordering


class TestDER:
    def test_perfect_match(self):
        ref = [DiarizedSegment(0.0, 5.0, 0), DiarizedSegment(5.0, 10.0, 1)]
        out = diarization_error_rate(ref, ref, collar=0.0)
        assert out["der"] == pytest.approx(0.0)

    def test_label_permutation_invariant(self):
        ref = [DiarizedSegment(0.0, 5.0, 0), DiarizedSegment(5.0, 10.0, 1)]
        hyp = [DiarizedSegment(0.0, 5.0, 7), DiarizedSegment(5.0, 10.0, 3)]
        assert diarization_error_rate(ref, hyp, collar=0.0)["der"] == pytest.approx(0.0)

    def test_miss_and_false_alarm(self):
        ref = [DiarizedSegment(0.0, 10.0, 0)]
        hyp = [DiarizedSegment(0.0, 5.0, 0)]
        out = diarization_error_rate(ref, hyp, collar=0.0)
        assert out["miss"] == pytest.approx(0.5, abs=0.02)
        hyp2 = [DiarizedSegment(0.0, 10.0, 0), DiarizedSegment(10.0, 15.0, 0)]
        out2 = diarization_error_rate(ref, hyp2, collar=0.0)
        assert out2["false_alarm"] == pytest.approx(0.5, abs=0.02)

    def test_confusion(self):
        ref = [DiarizedSegment(0.0, 8.0, 0), DiarizedSegment(8.0, 10.0, 1)]
        hyp = [DiarizedSegment(0.0, 10.0, 0)]
        out = diarization_error_rate(ref, hyp, collar=0.0)
        assert out["confusion"] == pytest.approx(0.2, abs=0.02)


class TestWeSpeakerConvertParity:
    """ResNet34 golden parity: a torch replica in the wespeaker naming
    (front.conv1/bn1, layer{1..4}.{i}.*, downsample pairs, TSTP stats
    pooling, seg_1) converts through convert_wespeaker and must match
    wespeaker_forward — incl. the pooling flatten order (upstream flattens
    [C, F'] channel-major before seg_1)."""

    def test_forward_matches_torch(self):
        torch = pytest.importorskip("torch")
        nn = torch.nn

        from qwen3_asr_swift_tpu.models.speaker.convert import convert_wespeaker
        from qwen3_asr_swift_tpu.models.speaker.model import wespeaker_forward

        MELS, EMB = 24, 12
        CH, BLOCKS = (4, 8, 12, 16), (1, 1, 2, 1)

        class Basic(nn.Module):
            def __init__(self, cin, cout, stride):
                super().__init__()
                self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)
                self.bn1 = nn.BatchNorm2d(cout)
                self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
                self.bn2 = nn.BatchNorm2d(cout)
                self.downsample = None
                if stride != 1 or cin != cout:
                    self.downsample = nn.Sequential(
                        nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                        nn.BatchNorm2d(cout))

            def forward(self, x):
                out = torch.relu(self.bn1(self.conv1(x)))
                out = self.bn2(self.conv2(out))
                sc = x if self.downsample is None else self.downsample(x)
                return torch.relu(out + sc)

        class Front(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(1, CH[0], 3, padding=1, bias=False)
                self.bn1 = nn.BatchNorm2d(CH[0])

        class ResNet(nn.Module):
            def __init__(self):
                super().__init__()
                self.front = Front()
                cin = CH[0]
                for si, (c, nb) in enumerate(zip(CH, BLOCKS)):
                    layers = []
                    for bi in range(nb):
                        stride = 2 if (bi == 0 and si > 0) else 1
                        layers.append(Basic(cin, c, stride))
                        cin = c
                    setattr(self, f"layer{si + 1}", nn.Sequential(*layers))
                mel_out = MELS // 8
                self.seg_1 = nn.Linear(CH[-1] * mel_out * 2, EMB)

            def forward(self, fbank):  # [T, MELS], CMN'd
                x = fbank.T[None, None]                        # [1, 1, F, T]
                x = torch.relu(self.front.bn1(self.front.conv1(x)))
                for si in range(4):
                    x = getattr(self, f"layer{si + 1}")(x)
                b, c, f, t = x.shape
                flat = x.reshape(b, c * f, t)                  # channel-major
                mu = flat.mean(-1)
                sd = torch.sqrt(flat.var(-1, unbiased=False) + 1e-7)
                return self.seg_1(torch.cat([mu, sd], -1))[0]

        torch.manual_seed(0)
        net = ResNet().eval()
        for mod in net.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.data.uniform_(0.5, 1.5)
                mod.bias.data.uniform_(-0.2, 0.2)
        sd = {k: v.detach().numpy() for k, v in net.state_dict().items()
              if "num_batches" not in k}
        params = convert_wespeaker(sd, blocks=BLOCKS)

        rng = np.random.default_rng(1)
        T = 40
        fb = rng.standard_normal((T, MELS)).astype(np.float32)
        fb -= fb.mean(0, keepdims=True)                        # pre-CMN'd input
        with torch.no_grad():
            ref = net(torch.from_numpy(fb)).numpy()
        import jax.numpy as jnp

        out = np.asarray(wespeaker_forward(params, jnp.asarray(fb), jnp.asarray(T)))
        np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-5)

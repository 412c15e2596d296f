"""Pyannote segmentation / FireRed DFSMN VAD / Sortformer diarizer tests:
powerset decode math, sliding-window aggregation, hysteresis binarize,
DFSMN memory causal extent, FIFO→spkcache update semantics, end-to-end
shapes and determinism on tiny random configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_swift_tpu.models.diarization import SortformerDiarizer
from qwen3_asr_swift_tpu.models.diarization.sortformer import config_tiny as sf_tiny
from qwen3_asr_swift_tpu.models.firered_vad import FireRedVAD
from qwen3_asr_swift_tpu.models.firered_vad import config_tiny as fr_tiny
from qwen3_asr_swift_tpu.models.pyannote import (
    PyannoteSegmentation,
    PyannoteVAD,
    powerset_to_speakers,
)
from qwen3_asr_swift_tpu.models.pyannote import config_tiny as py_tiny
from qwen3_asr_swift_tpu.models.pyannote.model import binarize


class TestPowerset:
    def test_mapping(self):
        # class 4 = speakers 1+2 → both get its mass
        post = np.zeros((1, 1, 7), np.float32)
        post[0, 0, 4] = 0.8
        post[0, 0, 1] = 0.2
        spk = np.asarray(powerset_to_speakers(jnp.asarray(post)))[0, 0]
        assert np.isclose(spk[0], 1.0)   # alone(0.2) + overlap(0.8)
        assert np.isclose(spk[1], 0.8)
        assert np.isclose(spk[2], 0.0)

    def test_uniform_rows_sum(self):
        post = np.full((2, 3, 7), 1 / 7, np.float32)
        spk = np.asarray(powerset_to_speakers(jnp.asarray(post)))
        # each speaker appears in 3 of 7 classes
        assert np.allclose(spk, 3 / 7, atol=1e-6)


class TestBinarize:
    def test_hysteresis(self):
        probs = np.array([0.1, 0.6, 0.6, 0.4, 0.4, 0.2, 0.1, 0.7, 0.1])
        segs = binarize(probs, 1.0, onset=0.5, offset=0.3)
        assert segs == [(1.0, 5.0), (7.0, 8.0)]

    def test_min_durations(self):
        probs = np.array([0.9, 0.1, 0.9, 0.9, 0.9, 0.1])
        segs = binarize(probs, 1.0, onset=0.5, offset=0.3,
                        min_speech_s=2.0, min_silence_s=0.0)
        assert segs == [(2.0, 5.0)]  # the 1-frame burst is dropped

    def test_merge_short_silence(self):
        probs = np.array([0.9, 0.1, 0.9, 0.1])
        segs = binarize(probs, 1.0, onset=0.5, offset=0.3, min_silence_s=1.5)
        assert segs == [(0.0, 3.0)]


class TestPyannote:
    @pytest.fixture(scope="class")
    def model(self):
        return PyannoteSegmentation.init_random(py_tiny())

    def test_forward_shapes(self, model):
        win = int(model.cfg.window_s * model.cfg.sample_rate)
        post = np.asarray(model._forward(model.params,
                                         wave=jnp.zeros((2, win), jnp.float32)))
        assert post.shape == (2, model.frames_per_window(win), 7)
        assert np.allclose(post.sum(-1), 1.0, atol=1e-5)

    def test_speaker_activity_covers_audio(self, model):
        rng = np.random.default_rng(0)
        audio = (0.1 * rng.standard_normal(int(2.5 * 16000))).astype(np.float32)
        tracks = model.speaker_activity(audio)
        assert tracks.shape[1] == 3
        assert (tracks >= 0).all() and (tracks <= 1.0 + 1e-6).all()
        expected = int(np.ceil(len(audio) / (model.frame_duration * 16000)))
        assert abs(tracks.shape[0] - expected) <= 1

    def test_vad_wrapper(self, model):
        vad = PyannoteVAD(model)
        segs = vad.detect_speech(np.zeros(16000, np.float32))
        assert isinstance(segs, list)
        probs = vad.speech_probabilities(np.zeros(16000, np.float32))
        assert ((probs >= 0) & (probs <= 1.0 + 1e-6)).all()


class TestFireRed:
    @pytest.fixture(scope="class")
    def model(self):
        return FireRedVAD.init_random(fr_tiny())

    def test_frame_probabilities(self, model):
        probs = model.frame_probabilities(np.zeros(16000, np.float32))
        assert len(probs) == 1 + (16000 - model.cfg.frame_len) // model.cfg.hop
        assert ((probs >= 0) & (probs <= 1)).all()

    def test_memory_context_is_bounded(self, model):
        """Changing audio far past the lookahead horizon must not change
        an early frame's probability (DFSMN memory is finite)."""
        rng = np.random.default_rng(1)
        a = (0.1 * rng.standard_normal(16000)).astype(np.float32)
        b = a.copy()
        b[8000:] = 0.5  # only affect later frames
        pa = model.frame_probabilities(a)
        pb = model.frame_probabilities(b)
        # frame 10 ends at sample 10*160+400=2000; max lookahead extent =
        # blocks * lookahead frames ≈ 2 frames each → well before 8000
        assert np.allclose(pa[:10], pb[:10], atol=1e-5)

    def test_detect_speech_runs(self, model):
        segs = model.detect_speech((0.1 * np.random.default_rng(2)
                                    .standard_normal(16000)).astype(np.float32))
        for s in segs:
            assert s.end - s.start >= model.cfg.min_speech_s - 1e-6


class TestSortformer:
    @pytest.fixture(scope="class")
    def model(self):
        return SortformerDiarizer.init_random(sf_tiny())

    def test_fifo_to_spkcache_semantics(self, model):
        cfg = model.cfg
        model.reset_state()
        d = cfg.d_model
        # fill fifo exactly
        model._update_state(np.ones((cfg.fifo_len, d), np.float32))
        assert model._fifo_len == cfg.fifo_len and model._spk_len == 0
        # overflow by 2 → oldest 2 go to spkcache
        model._update_state(np.full((2, d), 2.0, np.float32))
        assert model._fifo_len == cfg.fifo_len
        assert model._spk_len == 2
        assert (model._spkcache[:2] == 1.0).all()
        assert (model._fifo[-2:] == 2.0).all()

    def test_spkcache_overflow_shifts(self, model):
        cfg = model.cfg
        model.reset_state()
        total = cfg.fifo_len + cfg.spkcache_len + 3
        for i in range(total):
            model._update_state(np.full((1, cfg.d_model), float(i), np.float32))
        assert model._spk_len == cfg.spkcache_len
        assert model._fifo_len == cfg.fifo_len
        # newest frame is at the end of fifo
        assert model._fifo[model._fifo_len - 1, 0] == float(total - 1)

    def test_diarize_end_to_end(self, model):
        rng = np.random.default_rng(3)
        audio = (0.1 * rng.standard_normal(3 * 16000)).astype(np.float32)
        segs = model.diarize(audio)
        for s in segs:
            assert 0 <= s.speaker < model.cfg.max_speakers
            assert s.end > s.start
        # deterministic
        segs2 = model.diarize(audio)
        assert [(s.start, s.end, s.speaker) for s in segs] == \
               [(s.start, s.end, s.speaker) for s in segs2]

    def test_empty_audio(self, model):
        assert model.diarize(np.zeros(0, np.float32)) == []


class TestFireRedConvert:
    """FSMN-VAD golden parity: a torch replica in the published FunASR
    module naming (in_linear1/2, fsmn.{i}.linear/fsmn_block/affine,
    out_linear1/2) converts through map_fsmn_state_dict and must match the
    JAX forward, with every config dim inferred from shapes."""

    @pytest.fixture(scope="class")
    def pair(self):
        torch = pytest.importorskip("torch")
        nn = torch.nn

        D_IN, AFF, LIN, PROJ, L, R, OUT, BLOCKS = 60, 12, 16, 8, 4, 2, 6, 3

        class Affine(nn.Module):
            def __init__(self, i, o):
                super().__init__()
                self.linear = nn.Linear(i, o)

            def forward(self, x):
                return self.linear(x)

        class LinearT(nn.Module):
            def __init__(self, i, o):
                super().__init__()
                self.linear = nn.Linear(i, o, bias=False)

            def forward(self, x):
                return self.linear(x)

        class FsmnBlock(nn.Module):
            def __init__(self, d, lorder, rorder):
                super().__init__()
                self.conv_left = nn.Conv2d(d, d, (lorder, 1), groups=d, bias=False)
                self.conv_right = nn.Conv2d(d, d, (rorder, 1), groups=d, bias=False)
                self.lorder, self.rorder = lorder, rorder

            def forward(self, x):  # [T, D]
                y = x.T[None, :, :, None]                       # [1,D,T,1]
                left = nn.functional.pad(y, (0, 0, self.lorder - 1, 0))
                out = x + self.conv_left(left)[0, :, :, 0].T
                right = nn.functional.pad(y, (0, 0, 0, self.rorder))[:, :, 1:, :]
                out = out + self.conv_right(right)[0, :, :, 0].T
                return out

        class Basic(nn.Module):
            def __init__(self):
                super().__init__()
                self.linear = LinearT(LIN, PROJ)
                self.fsmn_block = FsmnBlock(PROJ, L, R)
                self.affine = Affine(PROJ, LIN)

            def forward(self, x):
                return torch.relu(self.affine(self.fsmn_block(self.linear(x))))

        class FSMN(nn.Module):
            def __init__(self):
                super().__init__()
                self.in_linear1 = Affine(D_IN, AFF)
                self.in_linear2 = Affine(AFF, LIN)
                self.fsmn = nn.Sequential(*[Basic() for _ in range(BLOCKS)])
                self.out_linear1 = Affine(LIN, AFF)
                self.out_linear2 = Affine(AFF, OUT)

            def forward(self, x):
                x = torch.relu(self.in_linear2(self.in_linear1(x)))
                x = self.fsmn(x)
                return torch.softmax(self.out_linear2(self.out_linear1(x)), dim=-1)

        torch.manual_seed(0)
        net = FSMN().eval()
        sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        from qwen3_asr_swift_tpu.models.firered_vad.convert import map_fsmn_state_dict

        cfg, params = map_fsmn_state_dict(sd)
        return net, cfg, params

    def test_config_inferred_from_shapes(self, pair):
        _, cfg, params = pair
        assert cfg.num_blocks == 3
        assert cfg.lorder == 4 and cfg.rorder == 2
        assert cfg.proj_dim == 8 and cfg.linear_dim == 16
        assert cfg.output_dim == 6
        assert len(params["blocks"]) == 3
        assert params["blocks"][0]["conv_left"].shape == (4, 1, 8)

    def test_forward_matches_torch(self, pair):
        torch = pytest.importorskip("torch")
        from qwen3_asr_swift_tpu.models.firered_vad.model import fsmn_forward

        net, cfg, params = pair
        rng = np.random.default_rng(1)
        feats = rng.standard_normal((11, 60)).astype(np.float32)
        with torch.no_grad():
            tp = net(torch.from_numpy(feats)).numpy()
        speech_t = 1.0 - tp[:, list(cfg.sil_pdfs)].sum(-1)
        import jax.numpy as jnp

        speech_j = np.asarray(fsmn_forward(params, cfg, jnp.asarray(feats)[None])[0])
        np.testing.assert_allclose(speech_j, speech_t, rtol=2e-5, atol=2e-6)

    def test_lfr_stacking(self):
        from qwen3_asr_swift_tpu.models.firered_vad.model import lfr_stack
        import jax.numpy as jnp

        feats = np.arange(12, dtype=np.float32).reshape(6, 2)
        out = np.asarray(lfr_stack(jnp.asarray(feats), 3, 1))
        assert out.shape == (6, 6)
        # frame 0 stacks [repeat(f0), f0, f1]
        np.testing.assert_allclose(out[0], np.concatenate([feats[0], feats[0], feats[1]]))
        # frame 5 stacks [f4, f5, repeat(f5)]
        np.testing.assert_allclose(out[5], np.concatenate([feats[4], feats[5], feats[5]]))

    def test_fused_bucketed_equals_eager(self):
        """The fused fbank→LFR→FSMN program on bucket-padded audio must
        equal the eager unpadded frontend + fsmn_forward at every length —
        the clamped-index LFR and the valid-row conv mask make bucket
        padding invisible (incl. the rorder>0 lookahead in config_tiny)."""
        import jax.numpy as jnp

        from qwen3_asr_swift_tpu.models.firered_vad import FireRedVAD, config_tiny
        from qwen3_asr_swift_tpu.models.firered_vad.model import (fsmn_forward,
                                                                  kaldi_fbank, lfr_stack)

        m = FireRedVAD.init_random(config_tiny())
        cfg = m.cfg
        rng = np.random.default_rng(11)
        for n in (4000, 16001, 31997):
            audio = (0.3 * rng.standard_normal(n)).astype(np.float32)
            got = m.frame_probabilities(audio)
            feats = kaldi_fbank(jnp.asarray(audio), num_bins=cfg.num_mels,
                                frame_len=cfg.frame_len, hop=cfg.hop)
            stacked = lfr_stack(feats, cfg.lfr_m, cfg.lfr_n)
            want = np.asarray(fsmn_forward(m.params, cfg, stacked[None])[0])
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, atol=1e-5)

    def test_chunked_equals_single_pass(self):
        """Long-audio chunking overlaps by the receptive extent and discards
        the overlap, so chunked scores equal single-pass scores (unlike the
        reference's hard 6000-frame cuts, FireRedVAD.swift:130-152)."""
        import dataclasses

        from qwen3_asr_swift_tpu.models.firered_vad import FireRedVAD, config_tiny

        m = FireRedVAD.init_random(config_tiny())
        m2 = FireRedVAD(dataclasses.replace(config_tiny(), max_frames=20), m.params)
        audio = (0.3 * np.random.default_rng(7).standard_normal(32000)).astype(np.float32)
        p1 = m.frame_probabilities(audio)
        p2 = m2.frame_probabilities(audio)
        assert len(p1) == len(p2)
        np.testing.assert_allclose(p1, p2, atol=1e-5)


class TestPyannoteConvertParity:
    """PyanNet golden parity: a torch replica in the pyannote naming
    (sincnet.wav_norm1d / conv1d.{i} / norm1d.{i} with affine instance
    norms, abs after the sinc layer, pool→norm→leaky_relu order, 4-layer
    BiLSTM, leaky-relu linears, classifier LogSoftmax) converts through
    convert_segmentation and must match segmentation_forward."""

    def test_forward_matches_torch(self):
        torch = pytest.importorskip("torch")
        nn = torch.nn
        import dataclasses

        from qwen3_asr_swift_tpu.models.pyannote.convert import convert_segmentation
        from qwen3_asr_swift_tpu.models.pyannote.model import (
            SegmentationConfig,
            segmentation_forward,
        )

        cfg = SegmentationConfig(
            sincnet_filters=(8, 6, 6), sincnet_kernels=(21, 5, 5),
            sincnet_strides=(5, 1, 1), sincnet_pools=(3, 3, 3),
            lstm_layers=2, lstm_hidden=8, linear_layers=2, linear_hidden=8,
            num_classes=7, num_speakers=3, window_s=0.5)

        class SincNet(nn.Module):
            def __init__(self):
                super().__init__()
                self.wav_norm1d = nn.InstanceNorm1d(1, affine=True)
                chans = (1,) + cfg.sincnet_filters[:-1]
                self.conv1d = nn.ModuleList(
                    nn.Conv1d(cin, cout, k, stride=s)
                    for cin, cout, k, s in zip(chans, cfg.sincnet_filters,
                                               cfg.sincnet_kernels, cfg.sincnet_strides))
                self.pool1d = nn.ModuleList(nn.MaxPool1d(p, p) for p in cfg.sincnet_pools)
                self.norm1d = nn.ModuleList(
                    nn.InstanceNorm1d(c, affine=True) for c in cfg.sincnet_filters)

            def forward(self, wave):  # [B, 1, S]
                x = self.wav_norm1d(wave)
                for i, (conv, pool, norm) in enumerate(
                        zip(self.conv1d, self.pool1d, self.norm1d)):
                    x = conv(x)
                    if i == 0:
                        x = torch.abs(x)
                    x = torch.nn.functional.leaky_relu(norm(pool(x)))
                return x

        class PyanNet(nn.Module):
            def __init__(self):
                super().__init__()
                self.sincnet = SincNet()
                self.lstm = nn.LSTM(cfg.sincnet_filters[-1], cfg.lstm_hidden,
                                    cfg.lstm_layers, bidirectional=True,
                                    batch_first=True)
                self.linear = nn.ModuleList([
                    nn.Linear(2 * cfg.lstm_hidden, cfg.linear_hidden),
                    nn.Linear(cfg.linear_hidden, cfg.linear_hidden)])
                self.classifier = nn.Linear(cfg.linear_hidden, cfg.num_classes)

            def forward(self, wave):  # [B, S]
                x = self.sincnet(wave.unsqueeze(1)).permute(0, 2, 1)
                x, _ = self.lstm(x)
                for lin in self.linear:
                    x = torch.nn.functional.leaky_relu(lin(x))
                return torch.log_softmax(self.classifier(x), dim=-1)

        torch.manual_seed(0)
        net = PyanNet().eval()
        # randomize the affine norms so the mapping is actually exercised
        for mod in net.modules():
            if isinstance(mod, nn.InstanceNorm1d):
                mod.weight.data.uniform_(0.5, 1.5)
                mod.bias.data.uniform_(-0.3, 0.3)

        sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        params = convert_segmentation(sd, cfg)

        rng = np.random.default_rng(1)
        wave = (0.3 * rng.standard_normal(4000)).astype(np.float32)
        with torch.no_grad():
            ref = torch.exp(net(torch.from_numpy(wave)[None]))[0].numpy()
        out = np.asarray(segmentation_forward(params, cfg, jnp.asarray(wave)[None]))[0]
        np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-5)

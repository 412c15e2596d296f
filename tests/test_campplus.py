"""CAM++ speaker embedding tests.

- golden parity: a torch replica of the 3D-Speaker CAM++ module graph in
  the upstream state-dict naming (head FCM, xvector.tdnn/block{b}.tdnnd{j}
  with CAM layers/transit{b}/dense) converts through
  ``map_campplus_state_dict`` and must match the JAX forward.
- frontend invariants (CMN, tile/center-crop policy —
  CamPlusPlusMelExtractor.swift, CamPlusPlusSpeaker.swift:108-133).
- EER-style separation sanity mirroring the reference's speaker-embeddings
  benchmark method: same-source clips embed closer than different-source.
- CosyVoice clone_voice wiring.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from qwen3_asr_swift_tpu.models.speaker import CampPlusSpeaker, campplus_config_tiny
from qwen3_asr_swift_tpu.models.speaker.campplus import (
    CampPlusConfig,
    campplus_fbank,
    campplus_forward,
    prepare_frames,
)
from qwen3_asr_swift_tpu.models.speaker.campplus_convert import map_campplus_state_dict

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

# tiny geometry for the replica
FEAT, M, INIT, GROWTH, BN_CH, EMB = 16, 4, 8, 4, 8, 6
BLOCKS, DILS = (2, 3), (1, 2)
SEG = 5


def get_nonlinear(channels, affine=True):
    seq = nn.Sequential()
    seq.add_module("batchnorm", nn.BatchNorm1d(channels, affine=affine))
    if affine:
        seq.add_module("relu", nn.ReLU())
    return seq


class BasicResBlock(nn.Module):
    def __init__(self, planes, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(planes, planes, 3, stride=(stride, 1), padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.shortcut = nn.Sequential()
        if stride != 1:
            self.shortcut = nn.Sequential(
                nn.Conv2d(planes, planes, 1, stride=(stride, 1), bias=False),
                nn.BatchNorm2d(planes))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + self.shortcut(x))


class FCM(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(1, M, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(M)
        self.layer1 = nn.Sequential(BasicResBlock(M, 2), BasicResBlock(M, 1))
        self.layer2 = nn.Sequential(BasicResBlock(M, 2), BasicResBlock(M, 1))
        self.conv2 = nn.Conv2d(M, M, 3, stride=(2, 1), padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(M)

    def forward(self, x):  # [B, 1, F, T]
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.layer1(x)
        x = self.layer2(x)
        x = F.relu(self.bn2(self.conv2(x)))
        b, c, f, t = x.shape
        return x.reshape(b, c * f, t)


class CAMLayer(nn.Module):
    def __init__(self, bn_ch, out_ch, dilation):
        super().__init__()
        pad = dilation  # (k-1)//2 * d with k=3
        self.linear_local = nn.Conv1d(bn_ch, out_ch, 3, padding=pad,
                                      dilation=dilation, bias=False)
        self.linear1 = nn.Conv1d(bn_ch, bn_ch // 2, 1)
        self.linear2 = nn.Conv1d(bn_ch // 2, out_ch, 1)

    def seg_pooling(self, x):
        seg = F.avg_pool1d(x, kernel_size=SEG, stride=SEG, ceil_mode=True)
        shape = seg.shape
        seg = seg.unsqueeze(-1).expand(*shape, SEG).reshape(*shape[:-1], -1)
        return seg[..., : x.shape[-1]]

    def forward(self, x):
        y = self.linear_local(x)
        context = x.mean(-1, keepdim=True) + self.seg_pooling(x)
        context = F.relu(self.linear1(context))
        return y * torch.sigmoid(self.linear2(context))


class CAMDenseTDNNLayer(nn.Module):
    def __init__(self, in_ch, dilation):
        super().__init__()
        self.nonlinear1 = get_nonlinear(in_ch)
        self.linear1 = nn.Conv1d(in_ch, BN_CH, 1, bias=False)
        self.nonlinear2 = get_nonlinear(BN_CH)
        self.cam_layer = CAMLayer(BN_CH, GROWTH, dilation)

    def forward(self, x):
        return self.cam_layer(self.nonlinear2(self.linear1(self.nonlinear1(x))))


class TDNNLayer(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.linear = nn.Conv1d(in_ch, out_ch, 5, stride=2, padding=2)
        self.nonlinear = get_nonlinear(out_ch)

    def forward(self, x):
        return self.nonlinear(self.linear(x))


class TransitLayer(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.nonlinear = get_nonlinear(in_ch)
        self.linear = nn.Conv1d(in_ch, in_ch // 2, 1, bias=False)

    def forward(self, x):
        return self.linear(self.nonlinear(x))


class DenseLayer(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.linear = nn.Conv1d(in_ch, out_ch, 1)
        self.nonlinear = get_nonlinear(out_ch, affine=False)

    def forward(self, x):  # [B, C]
        return self.nonlinear(self.linear(x.unsqueeze(-1)).squeeze(-1).unsqueeze(-1)).squeeze(-1)


class CAMPPlus(nn.Module):
    def __init__(self):
        super().__init__()
        self.head = FCM()
        xv = nn.Sequential()
        channels = M * (FEAT // 8)
        xv.add_module("tdnn", TDNNLayer(channels, INIT))
        channels = INIT
        for b, (n_layers, dil) in enumerate(zip(BLOCKS, DILS), start=1):
            block = nn.Sequential()
            for j in range(1, n_layers + 1):
                block.add_module(f"tdnnd{j}", None)  # placeholder, replaced below
            # build as a module with attribute names tdnnd{j}
            block = nn.Module()
            for j in range(1, n_layers + 1):
                block.add_module(f"tdnnd{j}", CAMDenseTDNNLayer(channels, dil))
                channels += GROWTH

            def make_forward(blk, n):
                def fwd(x):
                    for j in range(1, n + 1):
                        x = torch.cat([x, getattr(blk, f"tdnnd{j}")(x)], dim=1)
                    return x
                return fwd

            block.forward = make_forward(block, n_layers)
            xv.add_module(f"block{b}", block)
            xv.add_module(f"transit{b}", TransitLayer(channels))
            channels //= 2
        xv.add_module("out_nonlinear", get_nonlinear(channels))
        self.xvector = xv
        self.out_channels = channels
        self.xvector.add_module("stats", nn.Identity())
        self.xvector.add_module("dense", DenseLayer(channels * 2, EMB))

    def forward(self, mel):  # [T, F]
        x = mel.T[None, None]  # [1,1,F,T]
        x = self.head(x)
        for name, mod in self.xvector.named_children():
            if name == "stats":
                mean = x.mean(-1)
                std = torch.sqrt(torch.clamp(x.var(-1, unbiased=False), min=1e-8))
                x = torch.cat([mean, std], dim=1)
            elif name == "dense":
                x = mod(x)
            else:
                x = mod(x)
        return x[0]


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    net = CAMPPlus().eval()
    for mod in net.modules():
        if isinstance(mod, (nn.BatchNorm1d, nn.BatchNorm2d)):
            mod.running_mean.uniform_(-0.2, 0.2)
            mod.running_var.uniform_(0.5, 2.0)
            if mod.affine:
                mod.weight.data.uniform_(0.5, 1.5)
                mod.bias.data.uniform_(-0.2, 0.2)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()
          if "num_batches" not in k}
    cfg, params = map_campplus_state_dict(sd)
    import dataclasses

    cfg = dataclasses.replace(cfg, seg_len=SEG)
    return net, cfg, params


class TestGoldenParity:
    def test_config_inferred(self, pair):
        _, cfg, _ = pair
        assert cfg.feat_dim == FEAT and cfg.m_channels == M
        assert cfg.init_channels == INIT and cfg.growth_rate == GROWTH
        assert cfg.block_layers == BLOCKS
        assert cfg.embedding_size == EMB

    def test_forward_matches_torch(self, pair):
        net, cfg, params = pair
        rng = np.random.default_rng(1)
        mel = rng.standard_normal((24, FEAT)).astype(np.float32)
        with torch.no_grad():
            emb_t = net(torch.from_numpy(mel)).numpy()
        emb_j = np.asarray(campplus_forward(params, cfg, jnp.asarray(mel)))
        np.testing.assert_allclose(emb_j, emb_t, rtol=3e-4, atol=3e-5)


class TestFrontend:
    def test_cmn_zero_mean(self):
        rng = np.random.default_rng(2)
        audio = rng.standard_normal(16000).astype(np.float32)
        mel = np.asarray(campplus_fbank(jnp.asarray(audio)))
        assert mel.shape[1] == 80
        np.testing.assert_allclose(mel.mean(axis=0), 0.0, atol=1e-4)

    def test_tile_and_crop(self):
        mel = np.arange(12, dtype=np.float32).reshape(6, 2)
        tiled = prepare_frames(mel, 15)
        assert tiled.shape == (15, 2)
        np.testing.assert_allclose(tiled[6], mel[0])   # wraps
        cropped = prepare_frames(mel, 4)
        np.testing.assert_allclose(cropped, mel[1:5])  # centered


class TestSeparation:
    def test_same_source_closer_than_different(self):
        """EER-style sanity mirroring the reference speaker-embeddings
        bench: two clips of the same synthetic 'speaker' (fixed formant
        stack, fresh noise) must embed closer than clips of different
        speakers."""
        m = CampPlusSpeaker.init_random(campplus_config_tiny())
        sr = 16000

        def tonal_clip(seed):      # "speaker" A: harmonic stack, varied phases
            # no noise floor: after log-mel + CMN even a -30 dB broadband
            # component would dominate the spectral SHAPE the embedding sees
            r = np.random.default_rng(seed)
            t = np.arange(sr) / sr
            sig = sum(np.sin(2 * np.pi * 150.0 * k * t + r.uniform(0, 2 * np.pi))
                      / k for k in (1, 2, 3))
            return (sig * 0.2).astype(np.float32)

        def noise_clip(seed):      # "speaker" B: broadband noise
            r = np.random.default_rng(100 + seed)
            return (0.3 * r.standard_normal(sr)).astype(np.float32)

        def cos(a, b):
            return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))

        a1, a2 = m.embed(tonal_clip(1)), m.embed(tonal_clip(2))
        b1, b2 = m.embed(noise_clip(1)), m.embed(noise_clip(2))
        same = (cos(a1, a2) + cos(b1, b2)) / 2
        diff = (cos(a1, b1) + cos(a2, b2) + cos(a1, b2) + cos(a2, b1)) / 4
        assert same > diff + 0.1, (same, diff)

    def test_embed_batch_matches_single(self):
        m = CampPlusSpeaker.init_random(campplus_config_tiny())
        rng = np.random.default_rng(9)
        sr = m.cfg.sample_rate
        clips = [(0.1 * rng.standard_normal(n)).astype(np.float32)
                 for n in (sr, sr + sr // 2, sr // 2)]
        batch = m.embed_batch(clips)
        assert batch.shape[0] == 3
        for i, c in enumerate(clips):
            np.testing.assert_allclose(batch[i], m.embed(c), atol=3e-5)
        assert m.embed_batch([]).shape == (0, m.cfg.embedding_size)

    def test_short_audio_raises(self):
        m = CampPlusSpeaker.init_random(campplus_config_tiny())
        with pytest.raises(ValueError):
            m.embed(np.zeros(100, np.float32))


class TestCosyVoiceWiring:
    def test_clone_voice_registers(self):
        from qwen3_asr_swift_tpu.models.cosyvoice import CosyVoiceTTS
        from qwen3_asr_swift_tpu.models.cosyvoice import config_tiny as cosy_tiny

        tts = CosyVoiceTTS.init_random(cosy_tiny())
        spk = CampPlusSpeaker.init_random(campplus_config_tiny())
        audio = np.sin(np.linspace(0, 400, 16000)).astype(np.float32)
        tts.clone_voice("alice", audio, 16000, speaker_model=spk)
        assert "alice" in tts.voices
        out = tts.synthesize("cloned hello", voice="alice")
        assert np.isfinite(out.samples).all()

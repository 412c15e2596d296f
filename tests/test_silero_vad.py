"""Silero VAD tests: scan/streaming equivalence, state carry semantics,
hysteresis binarization, event machine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_swift_tpu.core import SpeechSegment
from qwen3_asr_swift_tpu.models.silero_vad import (
    SileroVAD,
    StreamingVADProcessor,
    VADConfig,
    VADEventType,
    binarize,
)
from qwen3_asr_swift_tpu.models.silero_vad.model import CHUNK, forward_chunk, init_params


@pytest.fixture(scope="module")
def vad():
    return SileroVAD.init_random(seed=0)


class TestNetwork:
    def test_prob_range(self, vad):
        audio = np.random.default_rng(0).standard_normal(CHUNK * 5).astype(np.float32)
        probs = vad.speech_probabilities(audio)
        assert probs.shape == (5,)
        assert (probs >= 0).all() and (probs <= 1).all()

    def test_batch_streaming_equivalence(self, vad):
        """The jitted scan over a clip must equal chunkwise streaming calls —
        the carried (context, h, c) semantics match."""
        audio = (0.5 * np.random.default_rng(1).standard_normal(CHUNK * 6)).astype(np.float32)
        batch_probs = vad.speech_probabilities(audio)

        state = vad.new_stream()
        stream_probs = []
        for i in range(6):
            state, p = vad.process_chunk(state, audio[i * CHUNK : (i + 1) * CHUNK])
            stream_probs.append(p)
        assert np.allclose(batch_probs, stream_probs, atol=1e-5)

    def test_state_carry_matters(self, vad):
        """The same chunk must give different probs for different LSTM
        states — streaming memory is real."""
        chunk = (0.5 * np.random.default_rng(2).standard_normal(CHUNK)).astype(np.float32)
        s0 = vad.new_stream()
        _, p_fresh = vad.process_chunk(s0, chunk)
        # build up state with different audio first
        s1 = vad.new_stream()
        other = (0.9 * np.random.default_rng(3).standard_normal(CHUNK)).astype(np.float32)
        for _ in range(3):
            s1, _ = vad.process_chunk(s1, other)
        _, p_after = vad.process_chunk(s1, chunk)
        assert abs(p_fresh - p_after) > 1e-6

    def test_short_audio_padded(self, vad):
        probs = vad.speech_probabilities(np.ones(100, np.float32))
        assert probs.shape == (1,)


class TestBinarize:
    CFG = VADConfig(onset=0.5, offset=0.35, min_speech_duration=0.05, min_silence_duration=0.05)

    def test_simple_segment(self):
        probs = np.array([0.1, 0.8, 0.9, 0.8, 0.1, 0.1])
        segs = binarize(probs, self.CFG)
        assert len(segs) == 1
        dt = CHUNK / 16000
        assert segs[0].start == pytest.approx(1 * dt)
        assert segs[0].end == pytest.approx(4 * dt)

    def test_hysteresis_no_toggle(self):
        # dips to 0.4 (between offset and onset) must not split the segment
        probs = np.array([0.8, 0.4, 0.8, 0.4, 0.8, 0.1])
        segs = binarize(probs, self.CFG)
        assert len(segs) == 1

    def test_min_speech_filter(self):
        cfg = VADConfig(min_speech_duration=0.1, min_silence_duration=0.01)
        probs = np.array([0.9, 0.1, 0.1, 0.1])  # 32 ms speech < 100 ms min
        assert binarize(probs, cfg) == []

    def test_merge_close_segments(self):
        cfg = VADConfig(min_speech_duration=0.01, min_silence_duration=0.1)
        # two segments separated by one 32 ms silence chunk < 100 ms → merged
        probs = np.array([0.9, 0.9, 0.1, 0.9, 0.9])
        segs = binarize(probs, cfg)
        assert len(segs) == 1


class FakeVAD:
    """Deterministic prob source for event-machine tests."""

    def __init__(self, probs):
        self.probs = list(probs)
        self.i = 0

    def new_stream(self):
        return None

    def process_chunk(self, state, samples):
        p = self.probs[self.i % len(self.probs)]
        self.i += 1
        return state, p


class TestStreamingProcessor:
    def test_start_end_events(self):
        cfg = VADConfig(min_speech_duration=0.06, min_silence_duration=0.06)
        probs = [0.1, 0.9, 0.9, 0.9, 0.1, 0.1, 0.1, 0.1]
        proc = StreamingVADProcessor(FakeVAD(probs), cfg)
        events = proc.process(np.zeros(CHUNK * 8, np.float32))
        kinds = [e.type for e in events]
        assert kinds == [VADEventType.SPEECH_STARTED, VADEventType.SPEECH_ENDED]
        seg = events[1].segment
        dt = CHUNK / 16000
        assert seg.start == pytest.approx(1 * dt)
        assert seg.end == pytest.approx(4 * dt)

    def test_short_blip_filtered(self):
        cfg = VADConfig(min_speech_duration=0.1, min_silence_duration=0.06)
        probs = [0.9, 0.1, 0.1, 0.1, 0.1, 0.1]  # one chunk of speech only
        proc = StreamingVADProcessor(FakeVAD(probs), cfg)
        events = proc.process(np.zeros(CHUNK * 6, np.float32))
        assert events == []

    def test_flush_closes_open_segment(self):
        cfg = VADConfig(min_speech_duration=0.06, min_silence_duration=0.2)
        probs = [0.9] * 5
        proc = StreamingVADProcessor(FakeVAD(probs), cfg)
        events = proc.process(np.zeros(CHUNK * 5, np.float32))
        assert [e.type for e in events] == [VADEventType.SPEECH_STARTED]
        final = proc.flush()
        assert [e.type for e in final] == [VADEventType.SPEECH_ENDED]
        assert final[0].segment.end == pytest.approx(5 * CHUNK / 16000)


class TestTorchScriptOracle:
    """Independent torch oracle with the UPSTREAM v5 archive layout: a
    torch module whose state dict carries the original Silero key names
    (_model.stft.forward_basis_buffer, _model.encoder.N.reparam_conv,
    _model.decoder.rnn, _model.decoder.decoder.2) is scripted, SAVED AS A
    REAL TORCHSCRIPT ARCHIVE, loaded back through convert_torchscript
    (the same code path a cached silero_vad.jit takes), and its per-chunk
    probabilities — torch Conv1d/LSTMCell semantics end to end — must
    match our scanned JAX implementation including the carried context
    and LSTM state."""

    def _build_torch(self):
        import torch
        from torch import nn

        torch.manual_seed(0)

        class Enc(nn.Module):
            def __init__(self, cin, cout, stride):
                super().__init__()
                self.reparam_conv = nn.Conv1d(cin, cout, 3, stride=stride,
                                              padding=1)

            def forward(self, x):
                return torch.relu(self.reparam_conv(x))

        class Decoder(nn.Module):
            def __init__(self):
                super().__init__()
                self.rnn = nn.LSTMCell(128, 128)
                self.decoder = nn.Sequential(
                    nn.Identity(), nn.ReLU(), nn.Conv1d(128, 1, 1))

            def forward(self, x, h, c):
                h2, c2 = self.rnn(x, (h, c))
                p = torch.sigmoid(self.decoder(torch.relu(h2)[:, :, None]))
                return p[:, 0, 0], h2, c2

        class Stft(nn.Module):
            def __init__(self):
                super().__init__()
                basis = np.concatenate(
                    [np.random.default_rng(1).standard_normal((258, 256))]
                ).astype(np.float32)
                self.register_buffer("forward_basis_buffer",
                                     torch.from_numpy(basis[:, None, :]))

            def forward(self, x):
                spec = torch.nn.functional.conv1d(
                    x[:, None, :], self.forward_basis_buffer, stride=128)
                re, im = spec[:, :129], spec[:, 129:]
                return torch.sqrt(re * re + im * im + 1e-12)

        class Model(nn.Module):
            def __init__(self):
                super().__init__()
                self.stft = Stft()
                self.encoder = nn.Sequential(
                    Enc(129, 128, 1), Enc(128, 64, 2),
                    Enc(64, 64, 2), Enc(64, 128, 1))
                self.decoder = Decoder()

            def forward(self, samples, h, c):
                # right reflect-pad 64 over [context ‖ chunk]
                t = samples.shape[1]
                idx = torch.arange(t - 2, t - 2 - 64, -1)
                x = torch.cat([samples, samples[:, idx]], dim=1)
                mag = self.stft(x)
                y = self.encoder(mag)
                return self.decoder(y[:, :, 0], h, c)

        class Wrapper(nn.Module):
            def __init__(self):
                super().__init__()
                self._model = Model()

            def forward(self, samples, h, c):
                return self._model(samples, h, c)

        return Wrapper()

    def test_archive_roundtrip_and_probs_match(self, tmp_path):
        import torch

        from qwen3_asr_swift_tpu.models.silero_vad.model import (
            CONTEXT, convert_torchscript, scan_probs)

        wrapper = self._build_torch()
        path = tmp_path / "silero_vad.jit"
        torch.jit.script(wrapper).save(str(path))

        params = jax.tree_util.tree_map(jnp.asarray, convert_torchscript(path))

        rng = np.random.default_rng(3)
        n = 6
        chunks = (0.3 * rng.standard_normal((n, CHUNK))).astype(np.float32)
        ours = np.asarray(scan_probs(params, jnp.asarray(chunks)))

        with torch.no_grad():
            ctx = torch.zeros(1, CONTEXT)
            h = torch.zeros(1, 128)
            c = torch.zeros(1, 128)
            ref = []
            for i in range(n):
                chunk = torch.from_numpy(chunks[i])[None]
                p, h, c = wrapper(torch.cat([ctx, chunk], dim=1), h, c)
                ctx = chunk[:, -CONTEXT:]
                ref.append(float(p[0]))
        np.testing.assert_allclose(ours, np.asarray(ref), atol=1e-5)

    def test_from_pretrained_accepts_jit_path(self, tmp_path):
        import torch

        wrapper = self._build_torch()
        path = tmp_path / "silero_vad.jit"
        torch.jit.script(wrapper).save(str(path))
        model = SileroVAD.from_pretrained(str(path))
        probs = model.speech_probabilities(
            (0.1 * np.random.default_rng(0).standard_normal(16000)).astype(np.float32))
        assert probs.shape[0] in (16000 // CHUNK, 16000 // CHUNK + 1)
        assert np.isfinite(probs).all()

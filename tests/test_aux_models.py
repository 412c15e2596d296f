"""Tests for enhancement, separation, and wake word modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_swift_tpu.models.enhancement import SpeechEnhancer, erb_filterbank
from qwen3_asr_swift_tpu.models.separation import SourceSeparator, signal_to_distortion_ratio
from qwen3_asr_swift_tpu.models.separation.model import istft, stft
from qwen3_asr_swift_tpu.models.wakeword import (
    ContextGraph,
    Keyword,
    StreamingKwsDecoder,
    WakeWordDetector,
)


class TestSeparationSTFT:
    def test_istft_inverts_stft(self):
        rng = np.random.default_rng(0)
        audio = rng.standard_normal((2, 44100 // 4)).astype(np.float32)
        n_frames = audio.shape[1] // 1024 + 1
        re, im = stft(jnp.asarray(audio), n_frames)
        out = np.asarray(istft(re, im, audio.shape[1]))
        # overlap-add reconstruction: interior must match closely
        err = np.abs(out[:, 2048:-2048] - audio[:, 2048:-2048]).max()
        assert err < 1e-3


class TestSeparator:
    def test_separate_shapes_and_mask_partition(self):
        model = SourceSeparator.init_random()
        audio = (0.1 * np.random.default_rng(0).standard_normal((2, 44100 // 2))).astype(np.float32)
        stems = model.separate(audio, 44100)
        assert set(stems) == {"vocals", "drums", "bass", "other"}
        for s in stems.values():
            assert s.shape == audio.shape
        # Wiener masks partition the mixture: stems sum ≈ mixture
        total = sum(stems.values())
        corr = np.corrcoef(total.ravel(), audio.ravel())[0, 1]
        assert corr > 0.95

    def test_sdr_helper(self):
        x = np.sin(np.arange(1000) * 0.1)
        assert signal_to_distortion_ratio(x, x) > 80
        assert signal_to_distortion_ratio(np.zeros_like(x), x) == pytest.approx(0.0, abs=0.1)


class TestEnhancer:
    def test_enhance_shape_and_stability(self):
        model = SpeechEnhancer.init_random()
        audio = (0.1 * np.random.default_rng(0).standard_normal(48000 // 2)).astype(np.float32)
        out = model.enhance(audio, 48000)
        assert out.sample_rate == 48000
        assert len(out.samples) == len(audio)
        assert np.isfinite(out.samples).all()

    def test_resamples_input(self):
        model = SpeechEnhancer.init_random()
        out = model.enhance(np.zeros(16000, np.float32), 16000)
        assert out.sample_rate == 48000

    def test_erb_filterbank(self):
        fb = erb_filterbank()
        assert fb.shape == (481, 32)
        assert np.allclose(fb.sum(axis=0), 1.0, atol=1e-3)


def _stub_decoder(ctx):
    """Stub stateless-decoder backend: context embeds as zeros."""
    return np.zeros(8, np.float32)


def _make_joiner(vocab=16):
    """Stub joiner: logits read the scripted token off enc_frame[0]."""

    def joiner(enc, dec):
        logits = np.full(vocab, -5.0, np.float32)
        logits[int(enc[0])] = 5.0
        return logits

    return joiner


def _frames(tokens):
    return np.asarray([[t] + [0.0] * 7 for t in tokens], np.float32)


def _decoder_for(keywords, **kw):
    graph = ContextGraph(keywords, context_score=0.5, ac_threshold=0.15)
    return StreamingKwsDecoder(_stub_decoder, _make_joiner(), graph, **kw)


class TestContextGraph:
    """Beam search + context graph semantics via stubbed closure backends,
    the reference's own test strategy (SpeechWakeWord.swift:91-95)."""

    def test_simple_match_fires_after_trailing_blank(self):
        dec = _decoder_for([Keyword("hey", [5, 6, 7])])
        hits = dec.step_chunk(_frames([0, 5, 6, 7, 0, 0]))
        assert len(hits) == 1
        assert hits[0].phrase == "hey"
        assert hits[0].token_ids == [5, 6, 7]
        assert len(hits[0].timestamps) == 3

    def test_no_fire_without_trailing_blanks(self):
        # keyword at the very end with no blank after it: debounce holds it
        dec = _decoder_for([Keyword("hey", [5, 6, 7])], num_trailing_blanks=2)
        hits = dec.step_chunk(_frames([5, 6, 7]))
        assert hits == []

    def test_threshold_rejects_low_acoustic_prob(self):
        graph = ContextGraph([Keyword("hey", [5, 6, 7], threshold=0.999999)])

        def weak_joiner(enc, dec):
            logits = np.zeros(16, np.float32)
            logits[int(enc[0])] = 0.5  # nearly-flat → low token prob
            return logits

        dec = StreamingKwsDecoder(_stub_decoder, weak_joiner, graph)
        hits = dec.step_chunk(_frames([5, 6, 7, 0, 0]))
        assert hits == []

    def test_overlapping_keywords_fail_links(self):
        # "ab" completes via the trie path inside "babc" through fail links
        dec = _decoder_for([Keyword("ab", [1, 2]), Keyword("babc", [2, 1, 2, 3])])
        hits = dec.step_chunk(_frames([2, 1, 2, 0, 0]))
        assert any(h.phrase == "ab" for h in hits)

    def test_graph_scores(self):
        g = ContextGraph([Keyword("kw", [3, 7])], context_score=0.5)
        s1, n1, m1 = g.forward_one_step(g.root, 3)
        assert s1 == pytest.approx(0.5) and m1 is None
        s2, n2, m2 = g.forward_one_step(n1, 7)
        assert m2 is not None and m2.phrase == "kw"
        assert n2.is_end and n2.level == 2
        # falling off the path refunds the accumulated boost
        s3, n3, _ = g.forward_one_step(n1, 9)
        assert s3 == pytest.approx(-0.5) and n3.token == -1
        # finalize refunds everything
        refund, root = g.finalize(n2)
        assert refund == pytest.approx(-n2.node_score) and root is g.root

    def test_auto_reset_clears_partial_match(self):
        dec = _decoder_for([Keyword("hey", [5, 6, 7])], auto_reset_seconds=0.08)
        # prefix, then silence past the auto-reset horizon, then the rest
        hits = dec.step_chunk(_frames([5, 6] + [0] * 4 + [7, 0, 0]))
        assert hits == []

    def test_detection_resets_beam(self):
        dec = _decoder_for([Keyword("go", [4, 9])])
        hits = dec.step_chunk(_frames([4, 9, 0, 0, 4, 9, 0, 0]))
        assert [h.phrase for h in hits] == ["go", "go"]

    def test_detector_runs(self):
        det = WakeWordDetector.init_random([Keyword("kw", [3, 7])])
        audio = (0.2 * np.random.default_rng(0).standard_normal(16000)).astype(np.float32)
        hits = det.detect(audio)
        assert isinstance(hits, list)
        for name, t, score in hits:
            assert name == "kw" and t >= 0


class TestWakeWordSession:
    def _model(self):
        kws = [Keyword("hey tpu", [7, 9, 11])]
        return WakeWordDetector.init_random(kws)

    def test_streaming_encoder_equals_single_push(self):
        from qwen3_asr_swift_tpu.models.wakeword.model import WakeWordSession

        m = self._model()
        rng = np.random.default_rng(0)
        audio = (0.1 * rng.standard_normal(32000)).astype(np.float32)
        s1 = WakeWordSession(m, collect_encoder=True)
        s1.push(audio)
        e1 = np.concatenate(s1.encoder_frames)
        s2 = WakeWordSession(m, collect_encoder=True)
        for off in range(0, len(audio), 3211):
            s2.push(audio[off:off + 3211])
        e2 = np.concatenate(s2.encoder_frames)
        n = min(len(e1), len(e2))
        assert n > 0
        np.testing.assert_array_equal(e1[:n], e2[:n])

    def test_finalize_flushes_tail_window(self):
        m = self._model()
        from qwen3_asr_swift_tpu.models.wakeword.model import WakeWordSession

        s = WakeWordSession(m, collect_encoder=True)
        s.push((0.1 * np.random.default_rng(1).standard_normal(12000)).astype(np.float32))
        before = sum(f.shape[0] for f in s.encoder_frames)
        s.finalize()
        after = sum(f.shape[0] for f in s.encoder_frames)
        assert after > before  # the padded final window was encoded
        assert len(s._buf) == 0
        s.reset()
        assert len(s._buf) == 0

    def test_tiny_pushes_buffer(self):
        m = self._model()
        s = m.new_session()
        assert s.push(np.zeros(100, np.float32)) == []
        assert len(s._buf) == 100


class TestStreamingEnhancer:
    def test_streamed_matches_batch(self):
        """Chunked enhancement with carried state reproduces the batch path
        sample-for-sample (both drive the same compiled programs; the
        normalization warm-up states are conditioned to O(1) so fp noise is
        not amplified — see test_enhancement_dfn3 for the full analysis)."""
        from qwen3_asr_swift_tpu.models.enhancement import SpeechEnhancer
        from qwen3_asr_swift_tpu.models.enhancement.model import HOP, StreamingEnhancer

        model = SpeechEnhancer.init_random(
            mean_norm_init=np.zeros(32, np.float32),
            unit_norm_init=np.ones(96, np.float32))
        rng = np.random.default_rng(0)
        t = HOP * 40  # 19200 samples = 0.4 s @48k
        audio = (0.1 * rng.standard_normal(t)).astype(np.float32)
        batch = model.enhance(audio, 48000).samples

        s = StreamingEnhancer(model, chunk_samples=HOP * 7)
        streamed = np.concatenate([s.push(audio), s.flush()])[: len(batch)]
        err = np.abs(streamed - batch).max() / (np.abs(batch).max() + 1e-9)
        assert err < 1e-4, f"streamed/batch mismatch {err}"

    def test_chunk_size_must_align(self):
        from qwen3_asr_swift_tpu.models.enhancement import SpeechEnhancer
        from qwen3_asr_swift_tpu.models.enhancement.model import StreamingEnhancer

        with pytest.raises(ValueError):
            StreamingEnhancer(SpeechEnhancer.init_random(), chunk_samples=333)

    def test_reset_and_reuse(self):
        from qwen3_asr_swift_tpu.models.enhancement import SpeechEnhancer
        from qwen3_asr_swift_tpu.models.enhancement.model import HOP, StreamingEnhancer

        model = SpeechEnhancer.init_random()
        s = StreamingEnhancer(model, chunk_samples=HOP * 4)
        audio = np.random.default_rng(1).standard_normal(HOP * 8).astype(np.float32)
        y1 = np.concatenate([s.push(audio), s.flush()])
        s.reset()
        y2 = np.concatenate([s.push(audio), s.flush()])
        assert np.allclose(y1, y2)


class TestUMXConvertParity:
    """Open-Unmix golden parity: a torch replica in the upstream module
    naming (fc1/bn1/lstm/fc2/bn2/fc3/bn3 + input_mean/input_scale/
    output_scale/output_mean buffers, upstream forward semantics incl. the
    x + input_mean convention — the checkpoint stores the NEGATED mean)
    converts through _convert_stem and must match umx_forward."""

    def test_forward_matches_torch(self):
        torch = pytest.importorskip("torch")
        nn = torch.nn

        from qwen3_asr_swift_tpu.models.separation.convert import _convert_stem
        from qwen3_asr_swift_tpu.models.separation.model import umx_forward

        NB_BINS, FULL_BINS, C, HIDDEN, F = 24, 33, 2, 16, 7

        class OpenUnmix(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = nn.Linear(NB_BINS * C, HIDDEN, bias=False)
                self.bn1 = nn.BatchNorm1d(HIDDEN)
                self.lstm = nn.LSTM(HIDDEN, HIDDEN // 2, 3, bidirectional=True)
                self.fc2 = nn.Linear(HIDDEN * 2, HIDDEN, bias=False)
                self.bn2 = nn.BatchNorm1d(HIDDEN)
                self.fc3 = nn.Linear(HIDDEN, FULL_BINS * C, bias=False)
                self.bn3 = nn.BatchNorm1d(FULL_BINS * C)
                rng = np.random.default_rng(0)
                self.input_mean = nn.Parameter(
                    torch.from_numpy(-rng.random(NB_BINS).astype(np.float32)))
                self.input_scale = nn.Parameter(
                    torch.from_numpy(1.0 / (0.5 + rng.random(NB_BINS).astype(np.float32))))
                self.output_scale = nn.Parameter(torch.ones(FULL_BINS))
                self.output_mean = nn.Parameter(torch.zeros(FULL_BINS) + 0.1)

            def forward(self, mag):  # [F, bins, C] single sample
                mix = mag
                x = mag[:, :NB_BINS, :].permute(0, 2, 1)        # [F, C, nb_bins]
                x = x + self.input_mean
                x = x * self.input_scale
                x = x.reshape(F, C * NB_BINS)
                x = torch.tanh(self.bn1(self.fc1(x)))
                lstm_out, _ = self.lstm(x.unsqueeze(1))
                x = torch.cat([x, lstm_out[:, 0, :]], -1)
                x = torch.relu(self.bn2(self.fc2(x)))
                x = self.bn3(self.fc3(x))
                x = x.reshape(F, C, FULL_BINS)
                x = x * self.output_scale + self.output_mean
                return torch.relu(x.permute(0, 2, 1)) * mix

        torch.manual_seed(0)
        net = OpenUnmix().eval()
        for mod in net.modules():
            if isinstance(mod, nn.BatchNorm1d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.data.uniform_(0.5, 1.5)
                mod.bias.data.uniform_(-0.2, 0.2)

        sd = {k: v.detach().numpy() for k, v in net.state_dict().items()
              if "num_batches" not in k}
        params = _convert_stem(sd)

        rng = np.random.default_rng(1)
        mag = np.abs(rng.standard_normal((F, FULL_BINS, C))).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(mag)).numpy()
        out = np.asarray(umx_forward(params, jnp.asarray(mag), nb_bins=NB_BINS))
        np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-5)

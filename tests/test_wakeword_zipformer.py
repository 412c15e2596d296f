"""Zipformer KWS: topology, streaming equality, checkpoint conversion.

Mirrors the reference's SpeechWakeWord test strategy
(Tests/SpeechWakeWordTests — golden fbank closeness, streaming session
state carry, beam-search parity via closure backends) plus the synthetic
upstream-checkpoint round-trip the reference gets for free from shipping
compiled CoreML bundles."""

import numpy as np
import jax
import pytest

from qwen3_asr_swift_tpu.models.wakeword import (
    Keyword,
    WakeWordDetector,
    ZipformerConfig,
    init_zipformer_params,
    param_count,
)
from qwen3_asr_swift_tpu.models.wakeword.convert import (
    convert_icefall_tree,
    export_icefall_state_dict,
)
from qwen3_asr_swift_tpu.models.wakeword.model import WakeWordSession
from qwen3_asr_swift_tpu.models.wakeword.zipformer import (
    decoder_out,
    encode_chunk,
    encode_windows,
    init_states,
    joiner_logits,
)

CFG = ZipformerConfig()


@pytest.fixture(scope="module")
def detector():
    return WakeWordDetector.init_random([Keyword("hey tpu", [7, 9, 11])], seed=0)


class TestTopology:
    def test_param_count_matches_published_model(self, detector):
        # icefall KWS Zipformer gigaspeech = 3.49M params
        # (SpeechWakeWord.swift:5-6); same config here within 10%
        n = detector.num_params()
        assert 3.0e6 < n < 4.0e6, f"{n/1e6:.2f}M params"

    def test_output_geometry(self, detector):
        # 45 mel frames in → 8 joiner-space frames at 25 Hz
        # (Configuration.swift:77-78: totalInputFrames 45, outputFrames 8)
        states = init_states(CFG)
        mel = jax.numpy.zeros((1, CFG.mel_window, CFG.num_mel_bins))
        out, new_states = encode_chunk(detector.params, CFG, mel, states)
        assert out.shape == (1, CFG.chunk_size // 2, CFG.joiner_dim)
        assert int(new_states["processed"][0]) == CFG.mel_stride

    def test_downsampled_stack_cache_shapes(self):
        # left-context caches shrink with each stack's downsampling factor
        states = init_states(CFG)
        sizes = [s["cached_key"].shape[1] for s in states["layers"]]
        assert sizes == [CFG.left_context // d for d in CFG.downsampling]


class TestStreaming:
    def test_scan_equals_stepwise(self, detector):
        """encode_windows (lax.scan batch path) ≡ repeated encode_chunk."""
        rng = np.random.default_rng(0)
        wins = rng.normal(size=(3, 1, CFG.mel_window, CFG.num_mel_bins)).astype(np.float32)
        states = init_states(CFG)
        out_scan, _ = encode_windows(detector.params, CFG, jax.numpy.asarray(wins), states)

        states = init_states(CFG)
        outs = []
        for i in range(3):
            o, states = encode_chunk(detector.params, CFG, jax.numpy.asarray(wins[i]), states)
            outs.append(np.asarray(o))
        out_step = np.concatenate(outs, axis=1)
        np.testing.assert_allclose(np.asarray(out_scan), out_step, atol=1e-5)

    def test_caches_affect_later_chunks(self, detector):
        """Left-context caches carry information: the same window encodes
        differently after different history."""
        rng = np.random.default_rng(1)
        win = jax.numpy.asarray(rng.normal(size=(1, CFG.mel_window, CFG.num_mel_bins)).astype(np.float32))
        loud = jax.numpy.asarray(10.0 * rng.normal(size=(1, CFG.mel_window, CFG.num_mel_bins)).astype(np.float32))

        _, st_a = encode_chunk(detector.params, CFG, win, init_states(CFG))
        _, st_b = encode_chunk(detector.params, CFG, loud, init_states(CFG))
        out_a, _ = encode_chunk(detector.params, CFG, win, st_a)
        out_b, _ = encode_chunk(detector.params, CFG, win, st_b)
        assert np.abs(np.asarray(out_a) - np.asarray(out_b)).max() > 1e-4


class TestTransducerHead:
    def test_decoder_context_sensitivity(self, detector):
        host = jax.tree_util.tree_map(np.asarray, detector.params)
        a = decoder_out(host, [3, 7], CFG)
        b = decoder_out(host, [7, 3], CFG)
        assert a.shape == (CFG.joiner_dim,)
        assert np.abs(a - b).max() > 1e-6  # order matters (grouped conv)

    def test_decoder_initial_padding(self, detector):
        host = jax.tree_util.tree_map(np.asarray, detector.params)
        # [-1, blank] start context embeds padding as zeros — still finite
        out = decoder_out(host, [-1, 0], CFG)
        assert np.isfinite(out).all()

    def test_joiner_shape(self, detector):
        host = jax.tree_util.tree_map(np.asarray, detector.params)
        enc = np.zeros(CFG.joiner_dim, np.float32)
        dec = decoder_out(host, [0, 0], CFG)
        logits = joiner_logits(host, enc, dec)
        assert logits.shape == (CFG.vocab_size,)


class TestConvert:
    def test_icefall_roundtrip_exact(self, detector):
        """Export the canonical tree as an icefall state_dict, convert it
        back, and require (near-)exact leaf equality — proves the key
        mapping and every layout transpose."""
        host = jax.tree_util.tree_map(np.asarray, detector.params)
        sd = export_icefall_state_dict(host, CFG)
        # the synthetic dict uses genuine icefall module paths
        assert "encoder.encoders.3.encoder.layers.0.self_attn_weights.in_proj.weight" in sd
        assert "encoder_embed.convnext.depthwise_conv.weight" in sd
        assert sd["decoder.conv.weight"].shape == (CFG.decoder_dim, 4, CFG.context_size)
        tree = convert_icefall_tree(sd, CFG)
        leaves_a = jax.tree_util.tree_leaves(host)
        leaves_b = jax.tree_util.tree_leaves(tree)
        assert len(leaves_a) == len(leaves_b)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_allclose(a, b, atol=1e-6)

    def test_converted_checkpoint_loads_and_runs(self, tmp_path, detector):
        """Full cycle: icefall torch checkpoint → convert_checkpoint →
        from_pretrained → forward equality with the source params."""
        torch = pytest.importorskip("torch")
        from qwen3_asr_swift_tpu.models.wakeword.convert import convert_checkpoint

        host = jax.tree_util.tree_map(np.asarray, detector.params)
        sd = export_icefall_state_dict(host, CFG)
        ckpt = tmp_path / "pretrained.pt"
        torch.save({"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                              for k, v in sd.items()}}, ckpt)
        out_dir = convert_checkpoint(str(ckpt), str(tmp_path / "converted"))

        det2 = WakeWordDetector.from_pretrained(str(out_dir), keywords=[Keyword("kw", [3, 7])])
        win = jax.numpy.asarray(np.random.default_rng(2).normal(
            size=(1, CFG.mel_window, CFG.num_mel_bins)).astype(np.float32))
        out1, _ = encode_chunk(detector.params, CFG, win, init_states(CFG))
        out2, _ = encode_chunk(det2.params, CFG, win, init_states(CFG))
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


class TestEmbedCausalCache:
    def test_convnext_cache_matches_full_sequence(self):
        """Chunked Conv2dSubsampling+ConvNeXt with the carried 6-frame
        cache must equal a FULL-SEQUENCE causal computation: windows
        overlap by 3 conv frames (19 produced / 16 stride), so the cache
        is padded[-9:-3] — the 6 frames preceding the next window's first
        conv frame, not the last 6."""
        import jax.numpy as jnp

        from qwen3_asr_swift_tpu.models.wakeword.zipformer import (
            _conv2d, bias_norm, embed_chunk, linear, swoosh_l, swoosh_r)

        cfg = CFG
        params = init_zipformer_params(jax.random.PRNGKey(5), cfg)
        emb = params["embed"]
        n_win = 4
        total_mel = cfg.mel_window + cfg.mel_stride * (n_win - 1)
        rng = np.random.default_rng(6)
        mel = jnp.asarray(rng.standard_normal((1, total_mel, 80)), jnp.float32)

        # chunked: carry the cache across windows, keep last chunk_size
        left = jnp.zeros((1, 6, cfg.embed_freq_out, cfg.embed_channels[2]))
        outs = []
        for w in range(n_win):
            win = mel[:, w * cfg.mel_stride: w * cfg.mel_stride + cfg.mel_window]
            feats, left = embed_chunk(emb, win, left)
            outs.append(np.asarray(feats[:, -cfg.chunk_size:]))
        chunked = np.concatenate(outs, axis=1)

        # full-sequence oracle: same conv stages over the whole mel, then a
        # causal ConvNeXt over the full conv-frame sequence
        x = mel[..., None]
        x = swoosh_r(_conv2d(x, emb["conv0"], pad=((0, 0), (1, 1))))
        x = swoosh_r(_conv2d(x, emb["conv1"], stride=(2, 2)))
        x = swoosh_r(_conv2d(x, emb["conv2"], stride=(1, 2)))
        cn = emb["convnext"]
        padded = jnp.concatenate(
            [jnp.zeros((1, 6) + x.shape[2:], x.dtype), x], axis=1)
        dw = jax.lax.conv_general_dilated(
            padded, cn["dw"]["w"], window_strides=(1, 1), padding=((0, 0), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1]) + cn["dw"]["b"]
        y = linear(swoosh_l(linear(dw, cn["pw1"])), cn["pw2"])
        x = x + y[:, : x.shape[1]]
        b, t, f, c = x.shape
        full = bias_norm(linear(x.reshape(b, t, f * c), emb["out"]), emb["out_norm"])
        # window w keeps conv frames at global stride-16 positions; window
        # 0's kept frames start at global conv frame 3 (the first 3 are
        # edge frames discarded by the overlap design)
        expect = np.asarray(full[:, 3: 3 + n_win * cfg.chunk_size])
        np.testing.assert_allclose(chunked, expect, atol=2e-5)


class TestBatchEqualsStreaming:
    def test_batch_frames_equal_session_frames(self, detector):
        """detect_keywords' one-scan batch path (full-utterance fbank,
        window slicing, silence-padded tail, window-count bucketing) must
        produce exactly the streaming session's joiner-space frames."""
        from qwen3_asr_swift_tpu.models.wakeword.model import WakeWordSession

        rng = np.random.default_rng(7)
        # 3 full windows plus a partial tail (not a multiple of the stride)
        session0 = WakeWordSession(detector)
        n = 3 * session0.stride_samples + session0.window_samples // 2
        audio = (0.1 * rng.standard_normal(n)).astype(np.float32)

        session = WakeWordSession(detector, collect_encoder=True)
        session.push(audio)
        session.finalize()
        stream_frames = np.concatenate(session.encoder_frames, axis=0)

        batch_frames = detector._batch_encoder_frames(audio)
        np.testing.assert_allclose(batch_frames, stream_frames, atol=2e-5)

"""Parakeet tests: NeMo mel parity, rel-shift correctness, subsampling
length formula, TDT decode semantics (blank/duration/filter), end-to-end
tiny model run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_swift_tpu.models.parakeet import ParakeetASR, config_tiny, tdt_decode
from qwen3_asr_swift_tpu.models.parakeet.config import ParakeetConfig
from qwen3_asr_swift_tpu.models.parakeet.encoder import (
    _rel_shift,
    rel_pos_encoding,
    subsampled_length,
)
from qwen3_asr_swift_tpu.models.parakeet.mel import (
    prepare_nemo_audio,
    nemo_log_mel,
    nemo_log_mel_reference,
    nemo_num_frames,
)
from qwen3_asr_swift_tpu.models.parakeet.model import init_decoder_params

CFG = config_tiny()


class TestMel:
    def _run(self, audio, cfg, total_frames):
        padded, n_f = prepare_nemo_audio(audio, cfg)
        need = (total_frames - 1) * cfg.hop_length + cfg.n_fft
        padded = np.pad(padded, (0, max(0, need - len(padded))))[:need]
        return nemo_log_mel(jnp.asarray(padded), jnp.asarray(n_f), cfg, total_frames)

    def test_matches_reference(self):
        cfg = ParakeetConfig()
        rng = np.random.default_rng(0)
        audio = (0.3 * rng.standard_normal(16000)).astype(np.float32)
        n_frames = nemo_num_frames(cfg, len(audio))
        ours, n_valid = self._run(audio, cfg, n_frames)
        ref = nemo_log_mel_reference(audio, cfg)
        assert int(n_valid) == ref.shape[0] == n_frames
        d = np.abs(np.asarray(ours)[: ref.shape[0]] - ref)
        assert d.max() < 2e-2
        assert d.mean() < 2e-3

    def test_bucket_padding_invariant(self):
        cfg = ParakeetConfig()
        audio = (0.3 * np.random.default_rng(1).standard_normal(8000)).astype(np.float32)
        n_small = nemo_num_frames(cfg, 8000)
        out1, _ = self._run(audio, cfg, n_small)
        out2, _ = self._run(audio, cfg, nemo_num_frames(cfg, 16000))
        # reflect-pad happens on the true signal before bucket zero-extension,
        # so every valid frame is bit-identical across buckets
        d = np.abs(np.asarray(out1)[:n_small] - np.asarray(out2)[:n_small])
        assert d.max() < 1e-5


class TestRelShift:
    def test_matches_naive_gather(self):
        rng = np.random.default_rng(0)
        b, h, t = 2, 3, 5
        x = rng.standard_normal((b, h, t, 2 * t - 1)).astype(np.float32)
        out = np.asarray(_rel_shift(jnp.asarray(x)))
        # definition: out[..., i, j] = x[..., i, (t-1) + (j - i)]
        for i in range(t):
            for j in range(t):
                np.testing.assert_allclose(out[..., i, j], x[..., i, (t - 1) + j - i], rtol=1e-6)

    def test_pos_encoding_shape(self):
        pe = rel_pos_encoding(7, 16)
        assert pe.shape == (13, 16)
        # center row = position 0 → sin(0)=0, cos(0)=1
        assert np.allclose(pe[6, 0::2], 0.0)
        assert np.allclose(pe[6, 1::2], 1.0)


class TestSubsampling:
    def test_length_formula(self):
        for n in [1, 7, 8, 100, 101, 800]:
            l = n
            for _ in range(3):
                l = (l - 1) // 2 + 1
            assert subsampled_length(n) == l


class TestTDT:
    def make_forced_params(self, cfg, script):
        """Build joint params that force a specific (token, duration) script:
        frame t → (token_t, dur_t) via a lookup-friendly construction."""
        dec = init_decoder_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        return dec

    def test_decode_runs_and_respects_caps(self):
        cfg = CFG
        dec = init_decoder_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        rng = np.random.default_rng(0)
        enc = jnp.asarray(rng.standard_normal((2, 10, cfg.encoder_hidden)), jnp.float32)
        enc_len = jnp.asarray([10, 4], jnp.int32)
        tokens, lps, n = jax.jit(tdt_decode, static_argnames=("cfg", "max_tokens"))(
            dec, cfg, enc, enc_len, max_tokens=8
        )
        tokens, n = np.asarray(tokens), np.asarray(n)
        assert tokens.shape == (2, 8)
        assert (n <= 8).all()
        for b in range(2):
            assert (tokens[b, n[b]:] == -1).all()
            emitted = tokens[b, : n[b]]
            assert ((emitted >= cfg.first_text_token_id) | (emitted == -1)).all()

    def test_monotone_progress_guarantee(self):
        """Every iteration advances t by ≥1 (blank +1, token max(dur,1)) —
        the loop must terminate in ≤ T iterations per slot."""
        cfg = CFG
        dec = init_decoder_params(jax.random.PRNGKey(1), cfg, jnp.float32)
        enc = jnp.asarray(np.random.default_rng(2).standard_normal((1, 30, cfg.encoder_hidden)), jnp.float32)
        tokens, _, n = tdt_decode(dec, cfg, enc, jnp.asarray([30], jnp.int32), max_tokens=64)
        assert int(n[0]) <= 30


class TestModel:
    def test_transcribe_tiny(self):
        model = ParakeetASR.init_random(CFG, dtype=jnp.float32, buckets_s=(2,))
        audio = (0.1 * np.random.default_rng(0).standard_normal(16000)).astype(np.float32)
        res = model.transcribe(audio, max_tokens=16)
        assert res.duration == pytest.approx(1.0)
        assert isinstance(res.text, str)

    def test_batch_matches_single(self):
        model = ParakeetASR.init_random(CFG, dtype=jnp.float32, buckets_s=(2,))
        rng = np.random.default_rng(3)
        a = (0.2 * rng.standard_normal(12000)).astype(np.float32)
        b = (0.2 * rng.standard_normal(20000)).astype(np.float32)
        singles = [model.transcribe(a, max_tokens=16).text, model.transcribe(b, max_tokens=16).text]
        batch = [r.text for r in model.transcribe_batch([a, b], max_tokens=16)]
        assert batch == singles


class TestDecoderConvert:
    """NeMo-naming golden parity for the prediction-net/joint converter:
    a torch replica (decoder.prediction.embed + dec_rnn.lstm in torch's
    i,f,g,o gate order; joint.enc/pred + joint_net output Linear) converts
    through convert_decoder and must match lstm_step + the joint math."""

    def test_lstm_and_joint_match_torch(self):
        torch = pytest.importorskip("torch")
        nn = torch.nn

        from qwen3_asr_swift_tpu.models.parakeet.convert import convert_decoder
        from qwen3_asr_swift_tpu.models.parakeet.model import lstm_step
        from qwen3_asr_swift_tpu.ops.nn import linear

        cfg = config_tiny()
        d, enc_h, j = cfg.decoder_hidden, cfg.encoder_hidden, cfg.joint_hidden
        vocab_out = cfg.vocab_size + 1 + cfg.num_duration_bins

        torch.manual_seed(0)
        embed = nn.Embedding(cfg.vocab_size, d)      # blank row absent upstream
        lstm = nn.LSTM(d, d, num_layers=cfg.decoder_layers)
        j_enc = nn.Linear(enc_h, j)
        j_pred = nn.Linear(d, j)
        j_out = nn.Linear(j, vocab_out)

        sd = {}
        sd["decoder.prediction.embed.weight"] = embed.weight.detach().numpy()
        for li in range(cfg.decoder_layers):
            for n in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                sd[f"decoder.prediction.dec_rnn.lstm.{n}_l{li}"] = \
                    getattr(lstm, f"{n}_l{li}").detach().numpy()
        sd["joint.enc.weight"] = j_enc.weight.detach().numpy()
        sd["joint.enc.bias"] = j_enc.bias.detach().numpy()
        sd["joint.pred.weight"] = j_pred.weight.detach().numpy()
        sd["joint.pred.bias"] = j_pred.bias.detach().numpy()
        sd["joint.joint_net.2.weight"] = j_out.weight.detach().numpy()
        sd["joint.joint_net.2.bias"] = j_out.bias.detach().numpy()

        dec = convert_decoder(sd, cfg)
        assert dec["embed"].shape == (cfg.vocab_size + 1, d)  # blank row appended

        # run a 5-token sequence through both LSTMs
        rng = np.random.default_rng(1)
        tokens = rng.integers(0, cfg.vocab_size, 5)
        with torch.no_grad():
            x_t = embed(torch.from_numpy(tokens)).unsqueeze(1)      # [T,1,d]
            y_t, _ = lstm(x_t)
            enc_frame = torch.from_numpy(
                rng.standard_normal((1, enc_h)).astype(np.float32))
            joint_t = j_out(torch.relu(j_enc(enc_frame) + j_pred(y_t[-1]))).numpy()

        h = jnp.zeros((cfg.decoder_layers, 1, d))
        c = jnp.zeros((cfg.decoder_layers, 1, d))
        outs = []
        for tok in tokens:
            x = jnp.asarray(dec["embed"][tok])[None]
            out, h, c = lstm_step(dec["lstm"], x, h, c)
            outs.append(out)
        np.testing.assert_allclose(np.asarray(outs)[:, 0], y_t[:, 0].numpy(),
                                   rtol=2e-5, atol=2e-6)

        enc_p = linear(jnp.asarray(enc_frame.numpy()), dec["joint_enc"])
        pred_p = linear(outs[-1], dec["joint_pred"])
        joint_j = np.asarray(linear(jax.nn.relu(enc_p + pred_p), dec["joint_out"]))
        np.testing.assert_allclose(joint_j, joint_t, rtol=2e-5, atol=2e-6)

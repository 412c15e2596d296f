"""Qwen3-ASR structural tests on a tiny random-weight config.

Mirrors the reference's unit tier (no weights, no network):
- encoder output-length formula vs the chunking spec
  (reference: AudioEncoder.getOutputLength)
- window-isolation: the block-diagonal attention property
  (reference: AudioEncoder.swift:337-357) expressed structurally
- prefill/decode teacher-forcing parity: the KV-cache invariant behind
  greedy determinism (reference: E2EQwen3ASRGreedyDeterminismTests)
- end-to-end transcribe on random weights (shape/flow, EOS cap, batching)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_swift_tpu.models.qwen3_asr.config import config_tiny
from qwen3_asr_swift_tpu.models.qwen3_asr.decoder import (
    decode_step,
    init_decoder_params,
    make_cache,
    prefill,
)
from qwen3_asr_swift_tpu.models.qwen3_asr.encoder import (
    conv_output_length,
    encode,
    init_encoder_params,
    sinusoidal_positions,
)
from qwen3_asr_swift_tpu.models.qwen3_asr.model import Qwen3ASR
from qwen3_asr_swift_tpu.ops.nn import tied_lm_head

CFG = config_tiny()


@pytest.fixture(scope="module")
def enc_params():
    return init_encoder_params(jax.random.PRNGKey(0), CFG.encoder, jnp.float32)


@pytest.fixture(scope="module")
def dec_params():
    return init_decoder_params(jax.random.PRNGKey(1), CFG.decoder, jnp.float32)


class TestEncoder:
    def test_output_length_formula(self):
        # spec: full chunks contribute 13 tokens; remainder r → three
        # (x-1)//2+1 halvings (reference chunking formula)
        def spec(n):
            full = (n // 100) * 13
            r = n % 100
            if r == 0:
                return full
            f = r
            for _ in range(3):
                f = (f - 1) // 2 + 1
            return full + max(f, 1)

        for n in [1, 50, 99, 100, 101, 250, 799, 800, 1234]:
            assert conv_output_length(CFG.encoder, n) == spec(n)

    def test_sinusoidal_positions_structure(self):
        pos = sinusoidal_positions(13, 64)
        assert pos.shape == (13, 64)
        assert np.allclose(pos[0, :32], 0.0)  # sin(0)
        assert np.allclose(pos[0, 32:], 1.0)  # cos(0)

    def test_encode_shapes(self, enc_params):
        mel = jnp.asarray(np.random.default_rng(0).standard_normal((128, 800)), jnp.float32)
        tokens, n_valid = encode(enc_params, mel, jnp.asarray(800), CFG.encoder)
        assert tokens.shape == (104, CFG.encoder.output_dim)
        assert int(n_valid) == 104

    def test_window_isolation(self, enc_params):
        """Tokens of window 0 must not change when window 1's mel changes —
        the defining property of the reference's block-diagonal mask."""
        rng = np.random.default_rng(1)
        mel = rng.standard_normal((128, 1600)).astype(np.float32)
        t1, _ = encode(enc_params, jnp.asarray(mel), jnp.asarray(1600), CFG.encoder)
        mel2 = mel.copy()
        mel2[:, 800:] += 10.0  # perturb only window 1
        t2, _ = encode(enc_params, jnp.asarray(mel2), jnp.asarray(1600), CFG.encoder)
        assert np.allclose(np.asarray(t1)[:104], np.asarray(t2)[:104], atol=1e-4)
        assert not np.allclose(np.asarray(t1)[104:], np.asarray(t2)[104:], atol=1e-2)

    def test_partial_final_chunk_valid_count(self, enc_params):
        mel = jnp.asarray(np.random.default_rng(2).standard_normal((128, 800)), jnp.float32)
        _, n_valid = encode(enc_params, mel, jnp.asarray(350), CFG.encoder)
        assert int(n_valid) == conv_output_length(CFG.encoder, 350)


class TestDecoder:
    def test_teacher_forcing_parity(self, dec_params):
        """decode_step(t) logits == prefill-of-(t+1)-tokens logits at t —
        the KV cache must be transparent."""
        dcfg = CFG.decoder
        rng = np.random.default_rng(3)
        seq = rng.integers(5, 100, size=6).astype(np.int32)

        # full prefill over 6 tokens
        table = dec_params["embed_tokens"]
        embeds = jnp.take(table, jnp.asarray(seq)[None], axis=0)
        valid = jnp.ones((1, 6), bool)
        cache_full = make_cache(dcfg, 1, 16, jnp.float32)
        hidden_full, _ = prefill(dec_params, dcfg, embeds, valid, cache_full)
        logits_full = np.asarray(tied_lm_head(hidden_full[0], table))  # [6, vocab]

        # prefill 3, then decode 3 steps
        cache = make_cache(dcfg, 1, 16, jnp.float32)
        hidden3, cache = prefill(dec_params, dcfg, embeds[:, :3], valid[:, :3], cache)
        l3 = np.asarray(tied_lm_head(hidden3[0, 2], table))
        assert np.allclose(l3, logits_full[2], atol=2e-3)
        for t in range(3, 6):
            logits, cache = decode_step(dec_params, dcfg, jnp.asarray(seq[t : t + 1]), cache)
            assert np.allclose(np.asarray(logits)[0], logits_full[t], atol=2e-3), f"step {t}"

    def test_prompt_gap_equivalence(self, dec_params):
        """A prompt with invalid gap rows (audio-bucket padding) must produce
        the same logits as the compacted prompt — gaps are masked and
        positions stay contiguous."""
        dcfg = CFG.decoder
        rng = np.random.default_rng(4)
        seq = rng.integers(5, 100, size=5).astype(np.int32)

        table = dec_params["embed_tokens"]
        compact = jnp.take(table, jnp.asarray(seq)[None], axis=0)
        cache = make_cache(dcfg, 1, 8, jnp.float32)
        h_compact, _ = prefill(dec_params, dcfg, compact, jnp.ones((1, 5), bool), cache)
        l_compact = np.asarray(tied_lm_head(h_compact[0, 4], table))

        # same tokens with 3 garbage rows inserted after position 2
        gapped_ids = np.concatenate([seq[:3], [7, 7, 7], seq[3:]]).astype(np.int32)
        gapped = jnp.take(table, jnp.asarray(gapped_ids)[None], axis=0)
        valid = jnp.asarray([[1, 1, 1, 0, 0, 0, 1, 1]], bool)
        cache = make_cache(dcfg, 1, 12, jnp.float32)
        h_gap, cache_gap = prefill(dec_params, dcfg, gapped, valid, cache)
        l_gap = np.asarray(tied_lm_head(h_gap[0, 7], table))
        assert np.allclose(l_compact, l_gap, atol=2e-3)
        assert np.asarray(cache_gap.positions).tolist() == [5]


class TestFusedProjections:
    def test_fused_decode_matches_unfused(self, dec_params):
        """qkv/gate_up fusion is exact: identical prefill + decode logits."""
        from qwen3_asr_swift_tpu.models.qwen3_asr.decoder import (
            fuse_for_inference,
            unfuse_for_sharding,
        )

        dcfg = CFG.decoder
        fused = fuse_for_inference(dec_params, dcfg)
        lp = fused["layers"][0]
        assert "qkv_proj" in lp and "q_proj" not in lp
        assert "gate_up_proj" in lp["mlp"] and "gate_proj" not in lp["mlp"]

        rng = np.random.default_rng(9)
        seq = jnp.asarray(rng.integers(5, 100, size=4).astype(np.int32))
        table = dec_params["embed_tokens"]
        embeds = jnp.take(table, seq[None], axis=0)
        valid = jnp.ones((1, 4), bool)
        for params in (dec_params, fused):
            cache = make_cache(dcfg, 1, 8, jnp.float32)
            h, cache = prefill(params, dcfg, embeds, valid, cache)
            logits, _ = decode_step(params, dcfg, seq[:1], cache)
            if params is dec_params:
                h_ref, logits_ref = np.asarray(h), np.asarray(logits)
        np.testing.assert_allclose(np.asarray(h), h_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(logits), logits_ref, atol=1e-4)

        # unfuse is the exact inverse
        back = unfuse_for_sharding(fused, dcfg)
        ref0 = dec_params["layers"][0]
        got0 = back["layers"][0]
        np.testing.assert_array_equal(np.asarray(got0["k_proj"]["kernel"]),
                                      np.asarray(ref0["k_proj"]["kernel"]))
        np.testing.assert_array_equal(np.asarray(got0["mlp"]["up_proj"]["kernel"]),
                                      np.asarray(ref0["mlp"]["up_proj"]["kernel"]))


class TestModel:
    @pytest.fixture(scope="class")
    def model(self):
        return Qwen3ASR.init_random(
            CFG, dtype=jnp.float32, audio_buckets_s=(8,),
        )

    def test_transcribe_runs(self, model):
        audio = (0.1 * np.random.default_rng(0).standard_normal(16000)).astype(np.float32)
        res = model.transcribe(audio, max_tokens=4)
        assert res.duration == pytest.approx(1.0)
        assert isinstance(res.text, str)
        assert res.confidence is not None

    def test_batch_matches_single(self, model):
        rng = np.random.default_rng(5)
        a = (0.1 * rng.standard_normal(16000)).astype(np.float32)
        b = (0.1 * rng.standard_normal(24000)).astype(np.float32)
        singles = [model.transcribe(a, max_tokens=4).text, model.transcribe(b, max_tokens=4).text]
        batch = [r.text for r in model.transcribe_batch([a, b], max_tokens=4)]
        assert batch == singles

    def test_concurrent_transcribe_thread_safe(self, model):
        """Concurrent submitters (bench.py steady-state; a loaded server)
        must produce exactly the serial results — params are read-only and
        every call builds its own host state."""
        import threading

        rng = np.random.default_rng(11)
        audios = [(0.1 * rng.standard_normal(16000)).astype(np.float32) for _ in range(4)]
        serial = [model.transcribe(a, max_tokens=4).text for a in audios]

        results = [None] * 4

        def work(i):
            results[i] = model.transcribe(audios[i], max_tokens=4).text

        threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results == serial

    def test_greedy_determinism(self, model):
        audio = (0.1 * np.random.default_rng(6).standard_normal(16000)).astype(np.float32)
        t1 = model.transcribe(audio, max_tokens=6).text
        t2 = model.transcribe(audio, max_tokens=6).text
        assert t1 == t2

    def test_force_eos_after_stops_decode(self, model):
        """The bench's planted-EOS knob: generation stops at the forced
        step, the prefix matches the unforced decode, and the gated host
        loop skips the remaining chunks (EOS-dependent control flow)."""
        from qwen3_asr_swift_tpu.ops.sampling import SamplingOptions
        from qwen3_asr_swift_tpu.serving.dispatch import DispatchGate

        audio = (0.1 * np.random.default_rng(8).standard_normal(16000)).astype(np.float32)
        full = model.transcribe(audio, options=SamplingOptions(max_tokens=12))
        model.decode_chunk_tokens = 3
        model.dispatch_gate = gate = DispatchGate(slots=1)
        try:
            forced = model.transcribe(
                audio, options=SamplingOptions(max_tokens=12, force_eos_after=4))
        finally:
            model.dispatch_gate = None
            model.decode_chunk_tokens = None
        # 4 content tokens survive (steps 0-3), step 4 becomes EOS
        assert forced.text.split() == full.text.split()[:4]
        # host loop skipped the post-EOS chunks: the fused
        # encode+prefill+first-chunk program (first chunk = 8 tokens)
        # covered the stop, so exactly ONE dispatch ran
        s = gate.stats
        assert s["latency"]["acquired"] + s["bulk"]["acquired"] == 1, s

    def test_chunked_decode_matches_monolithic(self, model):
        """Resumable chunked decode (decode_chunk_tokens — the loaded
        first-token latency knob) is exactly the monolithic program: same
        tokens, same confidences, for every chunk size incl. non-dividing
        and larger-than-max_new ones."""
        rng = np.random.default_rng(7)
        audios = [(0.1 * rng.standard_normal(16000)).astype(np.float32) for _ in range(2)]
        base = model.transcribe_batch(audios, max_tokens=7)
        assert model.decode_chunk_tokens is None
        try:
            for chunk in (1, 3, 7, 100):
                model.decode_chunk_tokens = chunk
                got = model.transcribe_batch(audios, max_tokens=7)
                assert [r.text for r in got] == [r.text for r in base], chunk
                for g, b in zip(got, base):
                    assert g.confidence == pytest.approx(b.confidence), chunk
        finally:
            model.decode_chunk_tokens = None


class TestDataParallelBatch:
    def test_dp_sharded_batch_matches_unsharded_incl_chunked(self):
        """On a dp>1 mesh transcribe_batch splits the batch across dp rows
        (per-device shard = B/dp) with results identical to unsharded —
        including with resumable chunked decode, whose donated carried
        state must round-trip through the dp shardings."""
        from qwen3_asr_swift_tpu.parallel import make_mesh

        ref = Qwen3ASR.init_random(config_tiny(), dtype=jnp.float32,
                                   audio_buckets_s=(8,))
        rng = np.random.default_rng(17)
        audios = [(0.1 * rng.standard_normal(16000)).astype(np.float32)
                  for _ in range(8)]
        base = [r.text for r in ref.transcribe_batch(audios, max_tokens=6)]

        model = Qwen3ASR.init_random(config_tiny(), dtype=jnp.float32,
                                     audio_buckets_s=(8,))
        model.shard(mesh=make_mesh(8, dp=4, tp=2))
        got = [r.text for r in model.transcribe_batch(audios, max_tokens=6)]
        assert got == base
        assert model.last_staging["per_device_shape"][0] == 2  # 8 / dp4

        model.decode_chunk_tokens = 2
        chunked = [r.text for r in model.transcribe_batch(audios, max_tokens=6)]
        assert chunked == base


class TestSequenceParallelEncoder:
    """Long-audio sequence parallelism: sharding the window axis over a
    mesh must be numerically identical to the single-device encoder
    (windows never attend across boundaries — SURVEY.md §2h)."""

    def test_sp_encode_matches_unsharded(self):
        import jax
        from qwen3_asr_swift_tpu.models.qwen3_asr.encoder import encode, init_encoder_params
        from qwen3_asr_swift_tpu.parallel import make_mesh

        cfg = config_tiny().encoder
        params = init_encoder_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        mesh = make_mesh(8, dp=8, tp=1)
        # 8 attention windows of audio → 1 per device
        t_frames = cfg.n_window_infer * 8
        mel = jnp.asarray(np.random.default_rng(0).standard_normal((cfg.n_mels, t_frames)),
                          jnp.float32)
        n_valid = jnp.asarray(t_frames - 37, jnp.int32)

        ref, n_ref = jax.jit(lambda p, m, n: encode(p, m, n, cfg))(params, mel, n_valid)
        sp_fn = jax.jit(lambda p, m, n: encode(p, m, n, cfg, sp_mesh=mesh))
        out, n_out = sp_fn(params, mel, n_valid)
        assert int(n_out) == int(n_ref)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
        # the window tensor really is partitioned across 8 devices
        lowered = sp_fn.lower(params, mel, n_valid).as_text()
        assert "sharding" in lowered

    def test_sharded_model_auto_sp_long_transcribe(self):
        """model.shard(mesh) + a single multi-window utterance routes the
        encode through the sequence-parallel path automatically, with
        tokens identical to the batch (vmapped) encode."""
        import jax
        from qwen3_asr_swift_tpu.models.qwen3_asr.model import Qwen3ASR
        from qwen3_asr_swift_tpu.parallel import make_mesh

        model = Qwen3ASR.init_random(config_tiny(), dtype=jnp.float32,
                                     audio_buckets_s=(8, 16))
        rng = np.random.default_rng(3)
        audio = (0.1 * rng.standard_normal(10 * 16000)).astype(np.float32)  # 16 s bucket

        prepared = model._prepare_audio(audio, 16000)
        bucket = prepared[2]
        assert bucket >= 2 * model.cfg.encoder.n_window_infer  # multi-window

        ref, n_ref = model._encode_audio_batch(
            model.encoder_params, jnp.asarray(prepared[0])[None],
            jnp.asarray([prepared[1]], np.int32), bucket)

        model.shard(mesh=make_mesh(8, dp=8, tp=1))
        assert model._encode_audio_sp is not None
        tok, n_tok = model._encode_audio_sp(
            model.encoder_params, jnp.asarray(prepared[0]),
            jnp.asarray(prepared[1], jnp.int32), bucket)
        assert int(n_tok) == int(n_ref[0])
        assert np.allclose(np.asarray(tok), np.asarray(ref[0]), atol=1e-5)

        # and the public path runs end-to-end through auto-SP
        text = model.transcribe(audio, max_tokens=4).text
        assert isinstance(text, str)

    def test_sp_encode_nondivisible_windows(self):
        """n_win % sp_size != 0: the window axis is zero-padded to the next
        multiple (idle devices run pure-pad windows), the pad tokens are
        sliced off, and the result still matches single-device exactly."""
        import jax
        from qwen3_asr_swift_tpu.models.qwen3_asr.encoder import encode, init_encoder_params
        from qwen3_asr_swift_tpu.parallel import make_mesh

        cfg = config_tiny().encoder
        params = init_encoder_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        mesh = make_mesh(8, dp=8, tp=1)
        for n_win in (5, 11):  # under- and over-subscribed
            t_frames = cfg.n_window_infer * n_win
            mel = jnp.asarray(
                np.random.default_rng(n_win).standard_normal((cfg.n_mels, t_frames)),
                jnp.float32)
            n_valid = jnp.asarray(t_frames - 53, jnp.int32)
            ref, n_ref = jax.jit(lambda p, m, n: encode(p, m, n, cfg))(params, mel, n_valid)
            out, n_out = jax.jit(lambda p, m, n: encode(p, m, n, cfg, sp_mesh=mesh))(
                params, mel, n_valid)
            assert int(n_out) == int(n_ref)
            assert out.shape == ref.shape
            assert np.isfinite(np.asarray(out)).all()
            assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestInt8KVCache:
    def test_int8_cache_step_logits_close(self):
        """kv_dtype=int8 (per-slot symmetric scales): prefill + decode-step
        logits must track the fp cache within quantization noise.  (Exact
        greedy-transcript equality is NOT asserted on random weights —
        near-uniform logits have ~zero decision margins; with trained
        weights the margin dwarfs the ~1e-2 attention noise.)"""
        dcfg = CFG.decoder
        dec_params = init_decoder_params(jax.random.PRNGKey(9), dcfg, jnp.float32)
        rng = np.random.default_rng(9)
        seq = rng.integers(5, 100, size=6).astype(np.int32)
        table = dec_params["embed_tokens"]
        embeds = jnp.take(table, jnp.asarray(seq)[None], axis=0)
        valid = jnp.ones((1, 6), bool)

        outs = {}
        for name, dtype in (("fp", jnp.float32), ("q8", jnp.int8)):
            cache = make_cache(dcfg, 1, 16, dtype)
            _, cache = prefill(dec_params, dcfg, embeds, valid, cache)
            logits, _ = decode_step(dec_params, dcfg, jnp.asarray(seq[:1]), cache)
            outs[name] = np.asarray(logits)[0]
        scale = np.abs(outs["fp"]).max() + 1e-9
        err = np.abs(outs["q8"] - outs["fp"]).max() / scale
        assert err < 5e-2, err
        # and the full pipeline runs + is deterministic under int8 cache
        from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR

        audio = (0.1 * rng.standard_normal(16000)).astype(np.float32)
        q8 = Qwen3ASR.init_random(CFG, dtype=jnp.float32, audio_buckets_s=(8,),
                                  kv_dtype=jnp.int8)
        t1 = q8.transcribe(audio, max_tokens=6).text
        t2 = q8.transcribe(audio, max_tokens=6).text
        assert t1 == t2

    def test_int8_cache_layer_roundtrip(self):
        from qwen3_asr_swift_tpu.ops.kv_cache import cache_kv, init_cache, write_token

        cache = init_cache(1, 2, 2, 8, 16, dtype=jnp.int8)
        rng = np.random.default_rng(1)
        k_new = jnp.asarray(rng.standard_normal((2, 2, 1, 16)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((2, 2, 1, 16)), jnp.float32)
        layer = write_token(cache.layers[0], k_new, v_new, jnp.asarray(3))
        k, v = cache_kv(layer, jnp.float32)
        np.testing.assert_allclose(np.asarray(k[:, :, 3]), np.asarray(k_new[:, :, 0]),
                                   atol=2e-2, rtol=2e-2)
        np.testing.assert_allclose(np.asarray(v[:, :, 3]), np.asarray(v_new[:, :, 0]),
                                   atol=2e-2, rtol=2e-2)
        # untouched slots stay zero
        assert np.all(np.asarray(k[:, :, 0]) == 0)

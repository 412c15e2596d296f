"""PersonaPlex tests: Mimi codec round-trip structure, stream embedding
sums, depformer generation, end-to-end respond flow (tiny random config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_swift_tpu.models.personaplex import (
    PersonaPlex,
    PersonaSampling,
    config_tiny,
    init_mimi_params,
    mimi_decode,
    mimi_encode,
)
from qwen3_asr_swift_tpu.models.personaplex.mimi import config_tiny as mimi_tiny
from qwen3_asr_swift_tpu.models.personaplex.model import (
    depformer_generate,
    embed_frame,
    init_personaplex_params,
)

CFG = config_tiny()


class TestMimi:
    @pytest.fixture(scope="class")
    def mimi(self):
        cfg = mimi_tiny()
        return cfg, init_mimi_params(jax.random.PRNGKey(0), cfg)

    def test_encode_shape(self, mimi):
        cfg, params = mimi
        spf = cfg.samples_per_frame
        audio = jnp.asarray(np.random.default_rng(0).standard_normal((1, spf * 5)), jnp.float32)
        codes = mimi_encode(params, cfg, audio)
        assert codes.shape == (1, 16, 5)
        assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < cfg.codebook_size).all()

    def test_decode_shape(self, mimi):
        cfg, params = mimi
        codes = jnp.asarray(np.random.default_rng(1).integers(0, cfg.codebook_size, (1, 16, 4)), jnp.int32)
        wav = mimi_decode(params, cfg, codes)
        assert wav.shape == (1, 4 * cfg.samples_per_frame)
        assert np.abs(np.asarray(wav)).max() <= 1.0

    def test_roundtrip_stable(self, mimi):
        cfg, params = mimi
        spf = cfg.samples_per_frame
        audio = jnp.asarray(0.3 * np.sin(np.arange(spf * 3) * 0.01), jnp.float32)[None]
        codes = mimi_encode(params, cfg, audio)
        wav = mimi_decode(params, cfg, codes)
        assert np.isfinite(np.asarray(wav)).all()

    def test_streaming_exact_past_sliding_window(self):
        """Frame-by-frame streaming must stay exact BEYOND the transformer's
        sliding window: the old KV ring held exactly w slots, so once the
        stream passed w positions each chunk's first query lost up to t-1
        still-in-window keys."""
        import dataclasses

        from qwen3_asr_swift_tpu.models.personaplex.mimi import (
            config_tiny as mt, init_mimi_encoder_stream, init_mimi_params,
            mimi_encode, mimi_encode_frame)

        cfg = dataclasses.replace(mt(), sliding_window=6)
        params = init_mimi_params(jax.random.PRNGKey(9), cfg)
        spf = cfg.samples_per_frame
        n = 14  # well past the 6-position window (2 positions per frame)
        audio = jnp.asarray(
            0.3 * np.random.default_rng(8).standard_normal((1, spf * n)),
            jnp.float32)
        full = np.asarray(mimi_encode(params, cfg, audio))
        st = init_mimi_encoder_stream(params, cfg)
        got = []
        for i in range(n):
            codes, st = mimi_encode_frame(params, cfg, st,
                                          audio[:, i * spf:(i + 1) * spf])
            got.append(np.asarray(codes))
        np.testing.assert_array_equal(np.concatenate(got, axis=2), full)

    def test_streaming_encode_exact(self, mimi):
        """Frame-by-frame carried-state encode ≡ the batch encode: conv
        carries reproduce the zero causal padding, the KV ring reproduces
        the sliding-window mask, the edge-pad downsample replicates the
        first latent on the first chunk."""
        from qwen3_asr_swift_tpu.models.personaplex.mimi import (
            init_mimi_encoder_stream, mimi_encode_frame)

        cfg, params = mimi
        spf = cfg.samples_per_frame
        n = 6
        audio = jnp.asarray(
            0.3 * np.random.default_rng(2).standard_normal((1, spf * n)),
            jnp.float32)
        full = np.asarray(mimi_encode(params, cfg, audio))
        st = init_mimi_encoder_stream(params, cfg)
        got = []
        for i in range(n):
            codes, st = mimi_encode_frame(params, cfg, st,
                                          audio[:, i * spf:(i + 1) * spf])
            got.append(np.asarray(codes))
        np.testing.assert_array_equal(np.concatenate(got, axis=2), full)

    def test_streaming_decode_exact(self, mimi):
        """Frame-by-frame carried-state decode ≡ the batch decode
        (transpose-conv overlap tails carried bias-free; right trim is the
        never-emitted final tail)."""
        from qwen3_asr_swift_tpu.models.personaplex.mimi import (
            init_mimi_decoder_stream, mimi_decode_frame)

        cfg, params = mimi
        n = 6
        codes = jnp.asarray(
            np.random.default_rng(3).integers(0, cfg.codebook_size, (1, 16, n)),
            jnp.int32)
        full = np.asarray(mimi_decode(params, cfg, codes))
        st = init_mimi_decoder_stream(params, cfg)
        got = []
        for i in range(n):
            wav, st = mimi_decode_frame(params, cfg, st, codes[:, :, i:i + 1])
            got.append(np.asarray(wav))
        np.testing.assert_allclose(np.concatenate(got, axis=1), full,
                                   atol=1e-5)


class TestTemporal:
    def test_embed_frame_sums_streams(self):
        params = init_personaplex_params(jax.random.PRNGKey(0), CFG)
        text = jnp.asarray([1], jnp.int32)
        user = jnp.asarray(np.zeros((1, 8)), jnp.int32)
        agent = jnp.asarray(np.zeros((1, 8)), jnp.int32)
        e1 = embed_frame(params, CFG, text, user, agent)
        assert e1.shape == (1, CFG.d_model)
        # changing one user codebook changes the sum
        user2 = user.at[0, 3].set(7)
        e2 = embed_frame(params, CFG, text, user2, agent)
        assert not np.allclose(np.asarray(e1), np.asarray(e2))


class TestDepformer:
    def _text(self, b):
        return jnp.full((b,), 1, jnp.int32)

    def test_generates_16_codebooks(self):
        params = init_personaplex_params(jax.random.PRNGKey(0), CFG)
        hidden = jnp.asarray(np.random.default_rng(0).standard_normal((2, CFG.d_model)), jnp.float32)
        codes = depformer_generate(params, CFG, hidden, self._text(2), jax.random.PRNGKey(0),
                                   PersonaSampling(audio_temperature=0.0))
        assert codes.shape == (2, 16)
        # heads emit card (2048) classes — the +1 initial token never decodes
        assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < CFG.audio_card).all()

    def test_greedy_deterministic(self):
        params = init_personaplex_params(jax.random.PRNGKey(0), CFG)
        hidden = jnp.asarray(np.random.default_rng(1).standard_normal((1, CFG.d_model)), jnp.float32)
        s = PersonaSampling(audio_temperature=0.0)
        c1 = depformer_generate(params, CFG, hidden, self._text(1), jax.random.PRNGKey(0), s)
        c2 = depformer_generate(params, CFG, hidden, self._text(1), jax.random.PRNGKey(1), s)
        assert (np.asarray(c1) == np.asarray(c2)).all()

    def test_text_token_conditions_codes(self):
        """Step 0 embeds the sampled text token (Depformer.swift:267-268):
        different text → generally different first codebook."""
        params = init_personaplex_params(jax.random.PRNGKey(0), CFG)
        hidden = jnp.asarray(np.random.default_rng(2).standard_normal((1, CFG.d_model)), jnp.float32)
        s = PersonaSampling(audio_temperature=0.0)
        c1 = depformer_generate(params, CFG, hidden, jnp.asarray([1], jnp.int32),
                                jax.random.PRNGKey(0), s)
        c2 = depformer_generate(params, CFG, hidden, jnp.asarray([5], jnp.int32),
                                jax.random.PRNGKey(0), s)
        assert not np.array_equal(np.asarray(c1), np.asarray(c2))

    def test_moshi_convert_roundtrip(self):
        """Canonical tree → upstream kyutai state dict → convert back:
        exact leaf equality proves every split/transpose/permutation in
        convert_moshi_tree (incl. the traditional→split-half RoPE row
        permutation and the per-step MultiLinear bank packing)."""
        from qwen3_asr_swift_tpu.models.personaplex.convert import (
            convert_moshi_tree, export_moshi_state_dict)

        params = jax.tree_util.tree_map(
            np.asarray, init_personaplex_params(jax.random.PRNGKey(3), CFG))
        sd = export_moshi_state_dict(params, CFG)
        assert "layers.0.self_attn.in_proj_weight" in sd
        assert "depformer.layers.0.gating.0.linear_in.weight" in sd
        assert "depformer_in.0.weight" in sd
        back = convert_moshi_tree(sd, CFG)
        la, lb = jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_allclose(a, b, atol=1e-6)


class TestRespond:
    def test_end_to_end(self):
        model = PersonaPlex.init_random(CFG)
        spf = CFG.mimi.samples_per_frame
        audio = (0.2 * np.random.default_rng(0).standard_normal(spf * 3)).astype(np.float32)
        out = model.respond(audio, CFG.mimi.sample_rate, max_extra_s=0.2,
                            sampling=PersonaSampling(audio_temperature=0.0, max_steps=6))
        assert out.sample_rate == CFG.mimi.sample_rate
        assert len(out.samples) > 0
        assert np.isfinite(out.samples).all()
        # respond exposes the sampled text stream (reference returns
        # (audio, textTokens) — PersonaPlex.swift:57); no tokenizer on the
        # tiny config → no transcript
        n_frames = len(out.samples) // CFG.mimi.samples_per_frame
        assert model.last_text_tokens is not None
        assert model.last_text_tokens.shape == (n_frames,)
        assert model.last_transcript is None


class TestFusedTemporal:
    def test_fuse_unfuse_roundtrip_and_step_parity(self):
        """qkv/gate_up fusion of the temporal stack is exact, and
        unfuse_temporal_params is its inverse (the TP-sharding path)."""
        import jax

        from qwen3_asr_swift_tpu.models.personaplex.model import (
            fuse_temporal_params,
            init_personaplex_params,
            temporal_step,
            unfuse_temporal_params,
        )
        from qwen3_asr_swift_tpu.ops.kv_cache import init_cache

        params = init_personaplex_params(jax.random.PRNGKey(0), CFG)
        fused = fuse_temporal_params(params)
        assert "qkv_proj" in fused["layers"][0]
        assert "gate_up_proj" in fused["layers"][0]["mlp"]

        embeds = jax.random.normal(jax.random.PRNGKey(1), (1, 1, CFG.d_model))
        outs = []
        for p in (params, fused):
            cache = init_cache(CFG.num_layers, 1, CFG.num_heads, 8,
                               CFG.head_dim, jnp.float32)
            h, _ = temporal_step(p, CFG, embeds, cache)
            outs.append(np.asarray(h))
        np.testing.assert_allclose(outs[1], outs[0], atol=1e-5)

        back = unfuse_temporal_params(fused, CFG)
        np.testing.assert_array_equal(
            np.asarray(back["layers"][0]["k_proj"]["kernel"]),
            np.asarray(params["layers"][0]["k_proj"]["kernel"]))
        np.testing.assert_array_equal(
            np.asarray(back["layers"][0]["mlp"]["up_proj"]["kernel"]),
            np.asarray(params["layers"][0]["mlp"]["up_proj"]["kernel"]))

    def test_quantized_respond_runs(self):
        """int8 temporal stack (the reference's 7B serving precision) runs
        end-to-end; tiny dims below the quantize min_dim stay dense, so
        force eligible dims for the temporal layers."""
        import dataclasses

        cfg = dataclasses.replace(CFG, d_model=128, num_heads=4, head_dim=32,
                                  intermediate_size=128, text_vocab=128)
        model = PersonaPlex.init_random(cfg, quant_bits=8)
        assert "codes" in model.params["layers"][0]["qkv_proj"]
        spf = cfg.mimi.samples_per_frame
        audio = (0.2 * np.random.default_rng(0).standard_normal(spf * 2)).astype(np.float32)
        out = model.respond(audio, cfg.mimi.sample_rate, max_extra_s=0.2,
                            sampling=PersonaSampling(audio_temperature=0.0, max_steps=4))
        assert len(out.samples) > 0 and np.isfinite(out.samples).all()


class TestVoicePromptAndStreaming:
    @pytest.fixture(scope="class")
    def model(self):
        from qwen3_asr_swift_tpu.models.personaplex import PersonaPlex, config_tiny

        return PersonaPlex.init_random(config_tiny())

    def test_voice_prompt_roundtrip(self, model, tmp_path):
        """Voice prompts mint and reload in the upstream safetensors
        format: embeddings [T, 1, 1, d] + delay-ring cache [1, 17, 4]
        (PersonaPlex.swift:131-223)."""
        spf = model.cfg.mimi.samples_per_frame
        ref = np.sin(np.linspace(0, 50, spf * 5)).astype(np.float32)
        path = str(tmp_path / "voice.safetensors")
        vp = model.make_voice_prompt(ref, model.cfg.mimi.sample_rate, path=path)
        assert vp["embeddings"].shape[1:] == (1, 1, model.cfg.d_model)
        assert vp["cache"].shape == (1, model.cfg.num_streams, model.DELAY_RING)
        loaded = model.load_voice_prompt(path)
        np.testing.assert_array_equal(vp["embeddings"], loaded["embeddings"])
        np.testing.assert_array_equal(vp["cache"], loaded["cache"])

    def test_voice_prompt_conditions_response(self, model):
        from qwen3_asr_swift_tpu.models.personaplex import PersonaSampling

        spf = model.cfg.mimi.samples_per_frame
        user = (0.1 * np.random.default_rng(0).standard_normal(spf * 3)).astype(np.float32)
        s = PersonaSampling(audio_temperature=0.0, text_temperature=0.0, max_steps=4)
        plain = model.respond(user, model.cfg.mimi.sample_rate, sampling=s, max_extra_s=0.1)
        vp = model.make_voice_prompt(np.ones(spf * 4, np.float32) * 0.3,
                                     model.cfg.mimi.sample_rate)
        prompted = model.respond(user, model.cfg.mimi.sample_rate, sampling=s,
                                 max_extra_s=0.1, voice_prompt=vp)
        assert len(plain.samples) == len(prompted.samples)
        # prompt changes the prefill → generally different audio
        assert plain.samples.shape == prompted.samples.shape

    def test_respond_stream_matches_offline_total(self, model):
        from qwen3_asr_swift_tpu.models.personaplex import PersonaSampling

        spf = model.cfg.mimi.samples_per_frame
        user = (0.1 * np.random.default_rng(1).standard_normal(spf * 3)).astype(np.float32)
        s = PersonaSampling(audio_temperature=0.0, text_temperature=0.0, max_steps=4)
        offline = model.respond(user, model.cfg.mimi.sample_rate, sampling=s, max_extra_s=0.1)
        chunks = list(model.respond_stream(user, model.cfg.mimi.sample_rate, sampling=s,
                                           max_extra_s=0.1, chunk_frames=2, left_context=1))
        total = sum(len(c.samples) for c in chunks)
        assert total == len(offline.samples)


class TestRealtimeSession:
    def test_frame_loop_produces_audio(self):
        from qwen3_asr_swift_tpu.models.personaplex import PersonaPlex, PersonaSampling, config_tiny

        m = PersonaPlex.init_random(config_tiny())
        spf = m.cfg.mimi.samples_per_frame
        s = m.realtime_session(PersonaSampling(audio_temperature=0.0,
                                               text_temperature=0.0, max_steps=8),
                               context_frames=3)
        rng = np.random.default_rng(0)
        outs = []
        for i in range(4):
            frame = (0.1 * rng.standard_normal(spf)).astype(np.float32)
            out = s.push_frame(frame)
            assert out.shape == (spf,)
            assert np.isfinite(out).all()
            outs.append(out)
        assert s.frames_done == 4

    def test_session_codes_match_offline_converse(self):
        """The fused on-device realtime frame must generate EXACTLY the
        agent codes of the offline _converse loop fed the same audio: the
        per-stream delay schedule (user cb0 ← frame t-1, cb1-7 ← t-2,
        sine-seeded), the depformer teacher-forcing, the prefill, and the
        windowed Mimi encode (causal ⇒ window ≡ full clip at sufficient
        context) all agree, frame for frame, at temperature 0."""
        from qwen3_asr_swift_tpu.models.personaplex import PersonaPlex, PersonaSampling, config_tiny

        m = PersonaPlex.init_random(config_tiny())
        cfg = m.cfg
        spf = cfg.mimi.samples_per_frame
        M = 5
        rng = np.random.default_rng(3)
        clip = (0.1 * rng.standard_normal(M * spf)).astype(np.float32)
        # text_repetition_penalty off: realtime penalizes over its own text
        # history every frame while batch respond()'s text history starts
        # only after the user phase (the reference's two loops differ the
        # same way — PersonaPlex.swift:401 vs :1232); the audio penalty
        # histories ARE identical in both modes and stay enabled here
        samp = PersonaSampling(audio_temperature=0.0, text_temperature=0.0,
                               text_repetition_penalty=1.0,
                               max_steps=M, silence_stop_frames=0)

        agent, n_frames, n_done, _ = m._run_converse(
            clip, cfg.mimi.sample_rate, samp, max_extra_s=0.0, voice_prompt=None)
        assert n_frames == M and n_done == M

        s = m.realtime_session(samp)
        got = []
        for i in range(M):
            s.push_frame(clip[i * spf: (i + 1) * spf])
            got.append(np.asarray(s.last_codes))
        # _run_converse returns codes clipped to the Mimi codebook range
        sess = np.clip(np.stack(got, axis=2), 0, cfg.mimi.codebook_size - 1)
        np.testing.assert_array_equal(sess, np.asarray(agent)[:, :, :M])

    def test_push_frames_async_matches_sync(self):
        """push_frames_async returns the same audio as push_frames, as
        device arrays — a burst of async dispatches with one trailing
        fetch is the device/tunnel-split measurement mode."""
        from qwen3_asr_swift_tpu.models.personaplex import PersonaPlex, PersonaSampling, config_tiny

        m = PersonaPlex.init_random(config_tiny())
        spf = m.cfg.mimi.samples_per_frame
        samp = PersonaSampling(audio_temperature=0.0, text_temperature=0.0,
                               max_steps=6)
        rng = np.random.default_rng(7)
        frames = [(0.1 * rng.standard_normal((1, spf))).astype(np.float32)
                  for _ in range(3)]
        s_sync = m.realtime_session(samp)
        want = [s_sync.push_frames(f) for f in frames]
        s_async = m.realtime_session(samp)
        devs = [s_async.push_frames_async(f) for f in frames]  # no fetches
        got = [np.asarray(d) for d in devs]
        for w, g in zip(want, got):
            np.testing.assert_allclose(w, g, atol=1e-6)

    def test_push_frame_rejects_wrong_size(self):
        from qwen3_asr_swift_tpu.models.personaplex import PersonaPlex, config_tiny

        m = PersonaPlex.init_random(config_tiny())
        s = m.realtime_session(context_frames=2)
        with pytest.raises(ValueError):
            s.push_frame(np.zeros(7, np.float32))

    def test_batched_sessions_match_single(self):
        """N lockstep sessions in one fused frame program: at temperature
        0 each row must equal an independently run single session fed the
        same frames (including rows with DIFFERENT voice prompts — the
        shared prefill carries per-row validity)."""
        from qwen3_asr_swift_tpu.models.personaplex import PersonaPlex, PersonaSampling, config_tiny

        m = PersonaPlex.init_random(config_tiny())
        spf = m.cfg.mimi.samples_per_frame
        samp = PersonaSampling(audio_temperature=0.0, text_temperature=0.0,
                               max_steps=3, silence_stop_frames=0)
        vp = m.make_voice_prompt(np.ones(spf * 3, np.float32) * 0.2,
                                 m.cfg.mimi.sample_rate)
        rng = np.random.default_rng(7)
        frames = [(0.1 * rng.standard_normal((2, spf))).astype(np.float32)
                  for _ in range(3)]

        multi = m.realtime_session(samp, batch=2, voice_prompt=[None, vp])
        multi_out, multi_codes = [], []
        for f in frames:
            multi_out.append(multi.push_frames(f))
            multi_codes.append(np.asarray(multi.last_codes))
        assert multi_out[0].shape == (2, spf)

        for row, row_vp in ((0, None), (1, vp)):
            single = m.realtime_session(samp, voice_prompt=row_vp)
            for i, f in enumerate(frames):
                single.push_frame(f[row])
                np.testing.assert_array_equal(
                    np.asarray(single.last_codes)[0], multi_codes[i][row])

    def test_voice_prompt_in_realtime(self):
        from qwen3_asr_swift_tpu.models.personaplex import PersonaPlex, PersonaSampling, config_tiny

        m = PersonaPlex.init_random(config_tiny())
        spf = m.cfg.mimi.samples_per_frame
        vp = m.make_voice_prompt(np.ones(spf * 3, np.float32) * 0.2,
                                 m.cfg.mimi.sample_rate)
        s = m.realtime_session(PersonaSampling(audio_temperature=0.0, max_steps=4),
                               context_frames=2, voice_prompt=vp)
        out = s.push_frame(np.zeros(spf, np.float32))
        assert out.shape == (spf,)

    def test_int8_kv_session_tracks_bf16(self):
        """kv_dtype=int8 halves the realtime temporal cache (the knob that
        fits 4+ 7B sessions on one 16 GB chip). Per-slot symmetric int8 KV
        is ~40 dB; at temperature 0 on a tiny config the greedy code path
        should track the fp cache for the first frames, and the session
        must stay finite/shape-correct throughout."""
        import jax.numpy as jnp

        from qwen3_asr_swift_tpu.models.personaplex import PersonaPlex, PersonaSampling, config_tiny

        m = PersonaPlex.init_random(config_tiny())
        spf = m.cfg.mimi.samples_per_frame
        samp = PersonaSampling(audio_temperature=0.0, text_temperature=0.0,
                               max_steps=6, silence_stop_frames=0)
        rng = np.random.default_rng(11)
        frames = [(0.1 * rng.standard_normal(spf)).astype(np.float32)
                  for _ in range(4)]

        fp = m.realtime_session(samp)
        q = m.realtime_session(samp, kv_dtype=jnp.int8)
        match = 0
        for f in frames:
            out_fp = fp.push_frame(f)
            out_q = q.push_frame(f)
            assert out_q.shape == (spf,) and np.isfinite(out_q).all()
            match += int(np.array_equal(np.asarray(fp.last_codes),
                                        np.asarray(q.last_codes)))
        # greedy argmax through a ~40 dB cache: expect agreement on a
        # tiny random model for at least the early frames (divergence
        # compounds; exact equality everywhere is not required)
        assert match >= 2, f"int8 KV diverged immediately ({match}/4 frames matched)"


class TestTensorParallel:
    def test_tp_sharded_matches_replicated(self):
        """PersonaPlex.shard(tp=2) over the virtual mesh must reproduce the
        replicated model's response exactly (the QWEN3 TP-equality pattern;
        rules in parallel/mesh.py PERSONAPLEX_RULES)."""
        from qwen3_asr_swift_tpu.models.personaplex import PersonaPlex, config_tiny

        audio = (0.1 * np.random.default_rng(0).standard_normal(4800)).astype(np.float32)
        ref_model = PersonaPlex.init_random(config_tiny())
        ref = ref_model.respond(audio, sample_rate=24000)

        tp_model = PersonaPlex.init_random(config_tiny()).shard(dp=4, tp=2)
        out = tp_model.respond(audio, sample_rate=24000)
        assert len(out.samples) == len(ref.samples)
        np.testing.assert_allclose(out.samples, ref.samples, atol=2e-4,
                                   err_msg="TP-sharded respond drifted from replicated")


class TestDelayPattern:
    """The published per-stream delay schedule
    (reference: Configuration.swift:18, personaplex.md:108-121):
    delays = [0, 0,1x7, 0,1x7]. Generated tokens are written at the
    current position with no delay; step t reads position t-1; external
    inputs are written at t+delay. These tests pin exactly which frame's
    codes condition each generation step."""

    def test_user_stream_reads_schedule(self):
        from qwen3_asr_swift_tpu.models.personaplex.model import (
            SINE_TOKENS, user_stream_reads)

        k = 8
        user_frames = 5
        # user_codes[b, cb, t] = 100*cb + t — frame identity is readable
        codes = np.zeros((1, 16, user_frames), np.int32)
        for cb in range(16):
            for t in range(user_frames):
                codes[0, cb, t] = 100 * cb + t
        pred = np.full((1, k), 7000, np.int32)  # depformer user predictions

        def reads(step):
            return np.asarray(user_stream_reads(
                jnp.asarray(codes), jnp.asarray(pred),
                jnp.asarray(step, jnp.int32), user_frames, k))[0]

        # step 0 reads position -1: prompt-phase sine tokens on all 8
        np.testing.assert_array_equal(reads(0), np.asarray(SINE_TOKENS[:k]))
        # step 1 reads position 0: cb0 = frame 0 (delay 0); cb1-7 = sine
        # (frame -1 does not exist; position 0 holds the spacer's delayed
        # writes for the acoustic streams)
        r1 = reads(1)
        assert r1[0] == 0  # cb0 frame 0
        np.testing.assert_array_equal(r1[1:], np.asarray(SINE_TOKENS[1:k]))
        # step 3 reads position 2: cb0 = frame 2; cb1-7 = frame 1 (delay 1)
        r3 = reads(3)
        assert r3[0] == 2
        np.testing.assert_array_equal(r3[1:], [100 * cb + 1 for cb in range(1, k)])
        # step user_frames reads position user_frames-1: the last real frame
        r5 = reads(user_frames)
        assert r5[0] == user_frames - 1
        np.testing.assert_array_equal(r5[1:], [100 * cb + 3 for cb in range(1, k)])
        # step user_frames+1 reads position user_frames: the generation
        # loop has overwritten it with the depformer's user predictions
        np.testing.assert_array_equal(reads(user_frames + 1), np.full(k, 7000))

    def test_depformer_provided_schedule(self):
        from qwen3_asr_swift_tpu.models.personaplex.model import (
            SINE_TOKENS, depformer_provided_tokens)

        cfg = CFG
        k = cfg.temporal_codebooks
        user_frames = 4
        codes = np.zeros((1, 16, user_frames), np.int32)
        for cb in range(16):
            for t in range(user_frames):
                codes[0, cb, t] = 100 * cb + t

        def prov(step):
            return np.asarray(depformer_provided_tokens(
                jnp.asarray(codes), jnp.asarray(step, jnp.int32), user_frames, cfg))[0]

        # agent steps 0-7 are never forced
        assert (prov(0)[:k] == -1).all()
        # during the user phase: user cb0 forced to THIS frame, cb1-7 to
        # the previous frame (their delay-1 target position)
        p0 = prov(0)
        assert p0[k] == 0  # cb0 frame 0
        np.testing.assert_array_equal(p0[k + 1:], np.asarray(SINE_TOKENS[1:k]))
        p2 = prov(2)
        assert p2[k] == 2
        np.testing.assert_array_equal(p2[k + 1:], [100 * cb + 1 for cb in range(1, k)])
        # after the user audio: nothing is forced
        assert (prov(user_frames) == -1).all()

    def test_forced_depformer_emits_provided_tokens(self):
        params = init_personaplex_params(jax.random.PRNGKey(0), CFG)
        hidden = jax.random.normal(jax.random.PRNGKey(1), (1, CFG.d_model))
        s = PersonaSampling(audio_temperature=0.0)
        provided = np.full((1, 16), -1, np.int32)
        provided[0, 8:] = np.arange(8) + 10
        out = depformer_generate(params, CFG, hidden, jnp.asarray([5], jnp.int32),
                                 jax.random.PRNGKey(0), s,
                                 provided=jnp.asarray(provided))
        np.testing.assert_array_equal(np.asarray(out)[0, 8:], np.arange(8) + 10)


class TestDiagnostic:
    def test_respond_diagnostic_capture(self):
        """respond_diagnostic returns the reference DiagnosticInfo fields
        (PersonaPlex.swift:1307-1318) trimmed to the generated steps, and
        the audio equals plain respond's under the same seed."""
        m = PersonaPlex.init_random(CFG)
        cfg = m.cfg
        spf = cfg.mimi.samples_per_frame
        clip = (0.1 * np.random.default_rng(8).standard_normal(3 * spf)).astype(np.float32)
        samp = PersonaSampling(max_steps=6, silence_stop_frames=0)
        out, diag = m.respond_diagnostic(clip, sample_rate=cfg.mimi.sample_rate,
                                         sampling=samp, max_extra_s=1.0, seed=4)
        T = diag["text_tokens"].shape[0]
        assert T == 6
        assert diag["agent_tokens"].shape == (16, T)
        assert diag["hidden_stats"].shape == (T, 4)
        assert diag["text_entropy"].shape == (T,)
        assert (diag["text_entropy"] >= 0).all()
        assert np.isfinite(diag["text_top_logit"]).all()
        # hidden min <= mean <= max per step
        hs = diag["hidden_stats"]
        assert (hs[:, 2] <= hs[:, 0] + 1e-6).all() and (hs[:, 0] <= hs[:, 3] + 1e-6).all()
        ref = m.respond(clip, sample_rate=cfg.mimi.sample_rate, sampling=samp,
                        max_extra_s=1.0, seed=4)
        np.testing.assert_array_equal(out.samples, ref.samples)


class TestRepetitionPenalty:
    def test_sample_topk_penalty_semantics(self):
        """Reference Sampling.swift:56-86: in-history tokens divide
        positive logits and multiply negative ones by the penalty, before
        the top-k cut; out-of-range history entries are inert."""
        from qwen3_asr_swift_tpu.models.personaplex.model import _sample_topk

        key = jax.random.PRNGKey(0)
        # positive case: penalized winner drops below runner-up
        lg = jnp.asarray([[0.5, 1.0]])
        hist = jnp.asarray([[1]])
        assert int(_sample_topk(lg, key, 0, 0.0)[0]) == 1
        assert int(_sample_topk(lg, key, 0, 0.0, history=hist, penalty=4.0)[0]) == 0
        # negative case: penalized winner multiplies further negative
        lg = jnp.asarray([[-0.5, -0.1]])
        assert int(_sample_topk(lg, key, 0, 0.0, history=jnp.asarray([[1]]),
                                penalty=10.0)[0]) == 0
        # out-of-range / empty history slots never penalize
        lg = jnp.asarray([[0.5, 1.0]])
        for bad in (2, 7, -1):
            assert int(_sample_topk(lg, key, 0, 0.0,
                                    history=jnp.asarray([[bad]]), penalty=9.0)[0]) == 1
        # penalty 1.0 with history is a no-op
        assert int(_sample_topk(lg, key, 0, 0.0, history=hist, penalty=1.0)[0]) == 1

    def test_depformer_history_penalizes_repeats(self):
        """A history saturated with the greedy codes (huge penalty) must
        move codebook 0's pick (its input does not depend on earlier
        codebooks, so the comparison is exact)."""
        from qwen3_asr_swift_tpu.models.personaplex.model import (
            depformer_generate, init_personaplex_params)

        cfg = CFG
        params = init_personaplex_params(jax.random.PRNGKey(1), cfg)
        hidden = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.d_model))
        text = jnp.asarray([1], jnp.int32)
        samp = PersonaSampling(audio_temperature=0.0, text_temperature=0.0,
                               audio_repetition_penalty=1e9)
        base = depformer_generate(params, cfg, hidden, text,
                                  jax.random.PRNGKey(3), samp)
        hist = jnp.tile(base[:, :, None], (1, 1, samp.repetition_window))
        pen = depformer_generate(params, cfg, hidden, text,
                                 jax.random.PRNGKey(3), samp, history=hist)
        assert int(pen[0, 0]) != int(base[0, 0])
        # and with no penalty the same history is inert
        samp1 = PersonaSampling(audio_temperature=0.0, text_temperature=0.0,
                                audio_repetition_penalty=1.0)
        same = depformer_generate(params, cfg, hidden, text,
                                  jax.random.PRNGKey(3), samp1, history=hist)
        np.testing.assert_array_equal(np.asarray(same), np.asarray(
            depformer_generate(params, cfg, hidden, text,
                               jax.random.PRNGKey(3), samp1)))

    def test_converse_deterministic_with_penalties(self):
        m = PersonaPlex.init_random(CFG)
        cfg = m.cfg
        spf = cfg.mimi.samples_per_frame
        clip = (0.1 * np.random.default_rng(5).standard_normal(3 * spf)).astype(np.float32)
        samp = PersonaSampling(max_steps=6, silence_stop_frames=0)
        a1 = m._run_converse(clip, cfg.mimi.sample_rate, samp, 1.0, None, seed=9)
        a2 = m._run_converse(clip, cfg.mimi.sample_rate, samp, 1.0, None, seed=9)
        np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))

    def test_entropy_stop_window_zero_disables(self):
        """entropy_stop_window<=0 must disable the stop, not trip it at
        step 0 (ent_run >= 0 is vacuously true)."""
        m = PersonaPlex.init_random(CFG)
        cfg = m.cfg
        spf = cfg.mimi.samples_per_frame
        clip = (0.1 * np.random.default_rng(6).standard_normal(2 * spf)).astype(np.float32)
        samp = PersonaSampling(max_steps=5, silence_stop_frames=0,
                               entropy_stop_threshold=1e9, entropy_stop_window=0)
        _, n_frames, n_done, _ = m._run_converse(clip, cfg.mimi.sample_rate, samp,
                                                 max_extra_s=2.0, voice_prompt=None)
        assert n_done == 5  # ran the full budget

    def test_entropy_early_stop(self):
        """With an absurdly high threshold and window 1, generation stops
        at the first post-user step (the reference's text-collapse stop,
        disabled by default)."""
        m = PersonaPlex.init_random(CFG)
        cfg = m.cfg
        spf = cfg.mimi.samples_per_frame
        U = 3
        clip = (0.1 * np.random.default_rng(6).standard_normal(U * spf)).astype(np.float32)
        samp = PersonaSampling(max_steps=12, silence_stop_frames=0,
                               entropy_stop_threshold=1e9, entropy_stop_window=1)
        _, n_frames, n_done, _ = m._run_converse(clip, cfg.mimi.sample_rate, samp,
                                                 max_extra_s=2.0, voice_prompt=None)
        assert n_frames == U
        assert n_done == U + 1


class TestPromptPrefill:
    @pytest.fixture(scope="class")
    def model(self):
        return PersonaPlex.init_random(CFG)

    def test_prompt_reads_layout(self, model):
        """Phases and delays of the host-built prompt READ table
        (PersonaPlex.swift:226-287): step g reads position g-1; text
        tokens occupy [sf .. sf+n_text) shifted one step late; agent
        streams read silence, user streams sine."""
        from qwen3_asr_swift_tpu.models.personaplex.model import (
            SILENCE_TOKENS, SINE_TOKENS)

        toks = [5, 7, 9]
        reads, n_prompt = model._prompt_reads(toks, 0, None)
        sf = model._silence_spacer_frames()
        assert n_prompt == 2 * sf + len(toks)
        k = CFG.temporal_codebooks
        # step 0: no previous position — text pad, audio -1 (masked)
        assert reads[0, 0] == CFG.text_pad
        assert (reads[1:, 0] == -1).all()
        # text prompt tokens appear shifted one step late (read = pos-1)
        np.testing.assert_array_equal(reads[0, sf + 1: sf + 1 + len(toks)], toks)
        # all other text reads are PAD
        assert (np.delete(reads[0, :n_prompt], range(sf + 1, sf + 1 + len(toks)))
                == CFG.text_pad).all()
        # agent streams read silence, user streams sine (from step 1 on;
        # delay-1 streams' position 0 was never written → -1)
        assert (reads[1, 1:n_prompt] == SILENCE_TOKENS[0]).all()
        assert (reads[2: 1 + k, 2:n_prompt]
                == np.asarray(SILENCE_TOKENS[1:k])[:, None]).all()
        assert (reads[1 + k, 1:n_prompt] == SINE_TOKENS[0]).all()
        assert (reads[2 + k:, 2:n_prompt]
                == np.asarray(SINE_TOKENS[1:k])[:, None]).all()

    def test_prompt_reads_ring_overlay(self, model):
        """With a voice prompt, the delay-ring snapshot overwrites the
        positions at the voice boundary (PersonaPlex.swift:203-223), so
        the first post-voice reads carry real voice tokens."""
        n_voice = 4
        ring = np.arange(17 * 4, dtype=np.int32).reshape(17, 4) % 1000
        reads, n_prompt = model._prompt_reads([], n_voice, ring)
        # first non-voice step reads position n_voice-1 = ring col n_voice%4
        col = n_voice % model.DELAY_RING
        np.testing.assert_array_equal(reads[:, 0], ring[:, col])
        # second step reads position n_voice — only delay-1 streams carry
        # ring col (n_voice+1)%4 there
        col2 = (n_voice + 1) % model.DELAY_RING
        delays = [0, 0] + [1] * 7 + [0] + [1] * 7
        for s in range(17):
            if delays[s] == 1:
                assert reads[s, 1] == ring[s, col2]

    def test_local_voice_ring_matches_reads(self, model):
        """A LOCALLY built voice ring (raw codes / make_voice_prompt) must
        agree with the read side's upstream slot convention
        (ring[(V+k) % CT] for flat position V-1+k — the reference's
        documented offset-after-init-skip mapping): the boundary reads
        carry the voice clip's codes on the AGENT streams at their
        published delays, and sine on the USER streams."""
        from qwen3_asr_swift_tpu.models.personaplex.model import SINE_TOKENS

        k = CFG.temporal_codebooks
        rng = np.random.default_rng(7)
        n_voice = 5  # NOT a multiple of DELAY_RING — catches slot-index drift
        codes = rng.integers(0, 2048, size=(1, 16, n_voice), dtype=np.int64).astype(np.int32)
        _, nv, ring = model._voice_inputs({"codes": codes})
        assert nv == n_voice
        reads, _ = model._prompt_reads([], nv, ring)
        # step n_voice reads position n_voice-1:
        assert reads[0, 0] == CFG.text_pad
        assert reads[1, 0] == codes[0, 0, n_voice - 1]          # agent cb0, delay 0
        np.testing.assert_array_equal(                           # agent cb1-7, delay 1
            reads[2: 1 + k, 0], codes[0, 1:k, n_voice - 2])
        np.testing.assert_array_equal(reads[1 + k:, 0],          # user rows: sine
                                      np.asarray(SINE_TOKENS[:k]))
        # step n_voice+1 reads position n_voice: delay-1 agent rows carry
        # the LAST voice frame; delay-0 agent row already reads the spacer
        np.testing.assert_array_equal(
            reads[2: 1 + k, 1], codes[0, 1:k, n_voice - 1])

    def test_named_voice_presets(self, model, tmp_path):
        """respond(voice_prompt=\"NAME\") resolves voices/NAME.safetensors
        from the snapshot dir (the reference's PersonaPlexVoice presets)."""
        spf = CFG.mimi.samples_per_frame
        vdir = tmp_path / "voices"
        vdir.mkdir()
        audio = (0.1 * np.random.default_rng(12).standard_normal(spf * 4)).astype(np.float32)
        model.make_voice_prompt(audio, sample_rate=CFG.mimi.sample_rate,
                                path=str(vdir / "NATM0.safetensors"))
        old_dir = model.model_dir
        model.model_dir = str(tmp_path)
        try:
            assert model.available_voices == ["NATM0"]
            vp = model.voice("NATM0")
            assert "embeddings" in vp and "cache" in vp
            # str name resolves through _voice_inputs identically
            e1, n1, r1 = model._voice_inputs("NATM0")
            e2, n2, r2 = model._voice_inputs(vp)
            assert n1 == n2
            np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
            np.testing.assert_array_equal(r1, r2)
            with pytest.raises(FileNotFoundError):
                model.voice("VARF9")
        finally:
            model.model_dir = old_dir

    def test_named_voice_without_snapshot_raises(self):
        m = PersonaPlex.init_random(CFG)
        with pytest.raises(ValueError):
            m.voice("NATM0")
        assert m.available_voices == []

    def test_make_voice_prompt_ring_matches_codes_path(self, model):
        """make_voice_prompt's stored .safetensors ring equals the ring the
        raw-codes path derives from the same codes."""
        spf = CFG.mimi.samples_per_frame
        audio = (0.1 * np.random.default_rng(11).standard_normal(spf * 6)).astype(np.float32)
        vp = model.make_voice_prompt(audio, sample_rate=CFG.mimi.sample_rate)
        codes = np.asarray(model._mimi_encode(
            model.mimi_params, audio=jnp.asarray(audio, jnp.float32)[None]))
        expected = model._build_voice_ring(codes[0], codes.shape[2])
        np.testing.assert_array_equal(vp["cache"][0].astype(np.int32), expected)

    def test_system_prompt_conditions_response(self, model):
        """Different system prompts must change the generated codes.
        Compares the raw (pre-clip) depformer codes: the tiny test mimi's
        64-entry codebook would clip away most of the 2049-space difference
        that the real 2048-entry codebook preserves."""
        spf = CFG.mimi.samples_per_frame
        audio = (0.2 * np.random.default_rng(3).standard_normal(spf * 3)).astype(np.float32)
        s = PersonaSampling(audio_temperature=0.0, text_temperature=0.0, max_steps=5)
        uc = model._mimi_encode(model.mimi_params, audio=jnp.asarray(audio)[None])
        ve, nv, _ = model._voice_inputs(None)
        outs = []
        for prompt in ([5, 7, 9], [11, 2, 4]):
            reads, n_prompt = model._prompt_reads(prompt, nv, None)
            codes, _, _ = model._converse(
                model.params, uc, ve, jnp.asarray(nv, jnp.int32),
                jnp.asarray(reads[None]), jnp.asarray(n_prompt, jnp.int32),
                jax.random.PRNGKey(0), user_frames=3, max_steps=4, sampling=s)
            outs.append(np.asarray(codes))
        assert not np.array_equal(outs[0], outs[1])

    def test_string_prompt_requires_tokenizer(self, model):
        with pytest.raises(ValueError):
            model._prompt_tokens("hello there")

    def test_silence_stop_disabled_runs_full_budget(self, model):
        spf = CFG.mimi.samples_per_frame
        audio = (0.2 * np.random.default_rng(4).standard_normal(spf * 2)).astype(np.float32)
        s = PersonaSampling(audio_temperature=0.0, max_steps=6, silence_stop_frames=0)
        out = model.respond(audio, CFG.mimi.sample_rate, sampling=s, max_extra_s=0.5)
        assert len(out.samples) == 6 * spf  # ran all 6 frames, no early exit

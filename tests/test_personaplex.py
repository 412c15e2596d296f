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

    def test_push_frame_rejects_wrong_size(self):
        from qwen3_asr_swift_tpu.models.personaplex import PersonaPlex, config_tiny

        m = PersonaPlex.init_random(config_tiny())
        s = m.realtime_session(context_frames=2)
        with pytest.raises(ValueError):
            s.push_frame(np.zeros(7, np.float32))

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

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
    def test_generates_16_codebooks(self):
        params = init_personaplex_params(jax.random.PRNGKey(0), CFG)
        hidden = jnp.asarray(np.random.default_rng(0).standard_normal((2, CFG.d_model)), jnp.float32)
        codes = depformer_generate(params, CFG, hidden, jax.random.PRNGKey(0),
                                   PersonaSampling(audio_temperature=0.0))
        assert codes.shape == (2, 16)
        assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < CFG.audio_vocab).all()

    def test_greedy_deterministic(self):
        params = init_personaplex_params(jax.random.PRNGKey(0), CFG)
        hidden = jnp.asarray(np.random.default_rng(1).standard_normal((1, CFG.d_model)), jnp.float32)
        s = PersonaSampling(audio_temperature=0.0)
        c1 = depformer_generate(params, CFG, hidden, jax.random.PRNGKey(0), s)
        c2 = depformer_generate(params, CFG, hidden, jax.random.PRNGKey(1), s)
        assert (np.asarray(c1) == np.asarray(c2)).all()


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
        spf = model.cfg.mimi.samples_per_frame
        ref = np.sin(np.linspace(0, 50, spf * 5)).astype(np.float32)
        path = str(tmp_path / "voice.npz")
        codes = model.make_voice_prompt(ref, model.cfg.mimi.sample_rate, path=path)
        loaded = model.load_voice_prompt(path)
        assert np.array_equal(codes, loaded)
        assert codes.shape[1] == model.cfg.num_codebooks

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

"""CosyVoice and VibeVoice structural tests on tiny random configs:
dialogue parsing, LLM token generation determinism/shape, flow-matching
ODE output, HiFi-GAN hop factor, diffusion denoise, VAE decode upsample,
end-to-end synthesize, voice-cache minting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_swift_tpu.models.cosyvoice import CosyVoiceTTS, parse_dialogue
from qwen3_asr_swift_tpu.models.cosyvoice import config_tiny as cosy_tiny
from qwen3_asr_swift_tpu.models.cosyvoice.model import (
    flow_to_mel,
    hifigan,
    init_cosyvoice_params,
)
from qwen3_asr_swift_tpu.models.vibevoice import VibeVoiceTTS
from qwen3_asr_swift_tpu.models.vibevoice import config_tiny as vibe_tiny
from qwen3_asr_swift_tpu.models.vibevoice.model import (
    diffusion_denoise,
    init_vibevoice_params,
    vae_decode,
)


class TestDialogueParser:
    def test_basic_turns(self):
        turns = parse_dialogue("A: hi there\nB: hello!\nA: bye")
        assert turns == [("A", "hi there"), ("B", "hello!"), ("A", "bye")]

    def test_continuation_lines_merge(self):
        turns = parse_dialogue("A: first line\ncontinues here\nB: reply")
        assert turns == [("A", "first line continues here"), ("B", "reply")]

    def test_empty_and_junk(self):
        assert parse_dialogue("") == []
        assert parse_dialogue("no speaker tag at all") == []


class TestCosyVoice:
    @pytest.fixture(scope="class")
    def model(self):
        return CosyVoiceTTS.init_random(cosy_tiny())

    def test_flow_to_mel_shape(self, model):
        cfg = model.cfg
        tokens = jnp.zeros((6,), jnp.int32)
        mel = flow_to_mel(model.params["dit"], cfg, tokens,
                          jnp.zeros((cfg.spk_dim,)), jax.random.PRNGKey(0))
        assert mel.shape == (6, cfg.n_mels)
        assert np.isfinite(np.asarray(mel)).all()

    def test_hifigan_hop(self, model):
        cfg = model.cfg
        mel = jnp.zeros((5, cfg.n_mels))
        wav = hifigan(model.params["hifigan"], mel, cfg.hop)
        assert wav.shape == (5 * cfg.hop,)

    def test_synthesize_end_to_end(self, model):
        chunk = model.synthesize("hello world", seed=3)
        assert chunk.sample_rate == model.cfg.sample_rate
        assert np.isfinite(chunk.samples).all()

    def test_synthesize_deterministic(self, model):
        a = model.synthesize("same text", seed=7)
        b = model.synthesize("same text", seed=7)
        assert len(a.samples) == len(b.samples)
        if len(a.samples):
            assert np.allclose(a.samples, b.samples)

    def test_voice_cloning_changes_output(self, model):
        model.register_voice("alice", np.ones(model.cfg.spk_dim, np.float32) * 2.0)
        base = model.synthesize("clone test", seed=1)
        cloned = model.synthesize("clone test", voice="alice", seed=1)
        # same token stream (same seed) but different speaker conditioning
        if len(base.samples) and len(cloned.samples):
            assert not np.allclose(base.samples, cloned.samples)

    def test_dialogue_synthesis_concatenates(self, model):
        chunk = model.synthesize_dialogue("A: one\nB: two", gap_s=0.01, seed=2)
        solo = model.synthesize("one", seed=2)
        assert len(chunk.samples) >= len(solo.samples)

    def test_unload(self):
        m = CosyVoiceTTS.init_random(cosy_tiny())
        assert m.is_loaded
        m.unload()
        assert not m.is_loaded


class TestVibeVoice:
    @pytest.fixture(scope="class")
    def model(self):
        return VibeVoiceTTS.init_random(vibe_tiny())

    def test_diffusion_denoise_shape_and_determinism(self, model):
        cfg = model.cfg
        cond = jnp.ones((2, cfg.hidden_size))
        a = diffusion_denoise(model.params["diffusion"], cond, jax.random.PRNGKey(0), cfg)
        b = diffusion_denoise(model.params["diffusion"], cond, jax.random.PRNGKey(0), cfg)
        assert a.shape == (2, cfg.latent_dim)
        assert np.allclose(np.asarray(a), np.asarray(b))

    def test_vae_decode_upsample_factor(self, model):
        cfg = model.cfg
        lat = jnp.zeros((1, 3, cfg.latent_dim))
        wav = vae_decode(model.params["vae_dec"], lat, cfg.vae_strides)
        assert wav.shape == (1, 3 * cfg.vae_upsample)

    def test_synthesize_end_to_end(self, model):
        chunk = model.synthesize("hello", max_frames=4, seed=0)
        assert chunk.sample_rate == model.cfg.sample_rate
        assert len(chunk.samples) % model.cfg.vae_upsample == 0
        assert np.isfinite(chunk.samples).all()

    def test_encode_voice_and_use(self, model, tmp_path):
        audio = np.sin(np.linspace(0, 100, model.cfg.vae_upsample * 6)).astype(np.float32)
        path = model.encode_voice(audio, "reference words", str(tmp_path / "v.npz"))
        data = np.load(path)
        assert data["latents"].shape[1] == model.cfg.latent_dim
        chunk = model.synthesize("with voice", voice=str(path), max_frames=4, seed=0)
        assert np.isfinite(chunk.samples).all()

    def test_unload(self):
        m = VibeVoiceTTS.init_random(vibe_tiny())
        m.unload()
        assert not m.is_loaded


class TestStreamingAndLongForm:
    def test_cosyvoice_stream_concatenates_to_full_length(self):
        m = CosyVoiceTTS.init_random(cosy_tiny())
        full = m.synthesize("streaming test sentence", seed=9)
        chunks = list(m.synthesize_stream("streaming test sentence", seed=9,
                                          chunk_tokens=3, left_context=2))
        total = sum(len(c.samples) for c in chunks)
        assert total == len(full.samples)  # same token stream, chunked emit

    def test_vibevoice_long_form_covers_all_chunks(self):
        m = VibeVoiceTTS.init_random(vibe_tiny())
        text = "First sentence here. Second sentence follows. Third one ends."
        long = m.generate_long(text, max_chars_per_chunk=25, max_frames=3, seed=1)
        single = m.synthesize("First sentence here.", max_frames=3, seed=1)
        assert len(long.samples) >= len(single.samples)
        assert np.isfinite(long.samples).all()

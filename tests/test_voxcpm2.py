"""VoxCPM2 structural tests: FSQ grid rounding, AudioVAE chunk factor and
round-trip shapes, CFG-Zero* sampler determinism, LocEnc readout,
end-to-end synthesize with cloning and instruct."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen3_asr_swift_tpu.models.voxcpm2 import VoxCPM2TTS, config_tiny
from qwen3_asr_swift_tpu.models.voxcpm2.model import (
    cfm_sample,
    fsq,
    loc_enc,
    vae_decode,
    vae_encode,
)

CFG = config_tiny()


@pytest.fixture(scope="module")
def model():
    return VoxCPM2TTS.init_random(CFG)


class TestFSQ:
    def test_quantized_to_grid(self, model):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((3, CFG.hidden_size)),
                        jnp.float32)
        # intercept the latent grid: round(tanh(z)*scale)/scale has
        # values on the 1/scale lattice
        from qwen3_asr_swift_tpu.ops.nn import linear

        z = jnp.tanh(linear(x, model.params["fsq_layer"]["in_proj"]))
        q = jnp.round(z * CFG.fsq_scale) / CFG.fsq_scale
        lattice = np.asarray(q) * CFG.fsq_scale
        assert np.allclose(lattice, np.round(lattice), atol=1e-5)
        # and the module output is deterministic
        a = fsq(model.params["fsq_layer"], CFG, x)
        b = fsq(model.params["fsq_layer"], CFG, x)
        assert np.allclose(np.asarray(a), np.asarray(b))


class TestAudioVAE:
    def test_chunk_factor(self, model):
        wave = jnp.zeros((1, CFG.chunk_size * 6))
        lat = vae_encode(model.params["audio_vae"], CFG.vae, wave)
        assert lat.shape == (1, 6, CFG.latent_dim)

    def test_decode_length(self, model):
        lat = jnp.zeros((1, 5, CFG.latent_dim))
        wav = vae_decode(model.params["audio_vae"], CFG.vae, lat)
        assert wav.shape == (1, 5 * CFG.vae.decode_chunk_size)
        assert (np.abs(np.asarray(wav)) <= 1.0).all()  # tanh bounded

    def test_encode_reference_patching(self, model):
        # 16 kHz input at the VAE's analysis rate: 3 whole patches + 7
        audio = np.random.default_rng(1).standard_normal(
            CFG.chunk_size * CFG.patch_size * 3 + 7).astype(np.float32)
        ref = model.encode_reference(audio, sample_rate=CFG.vae.sample_rate)
        assert ref.shape[1:] == (CFG.patch_size, CFG.latent_dim)
        assert ref.shape[0] == 4  # padded up to the next whole patch


class TestCFM:
    def test_sampler_deterministic_and_shaped(self, model):
        mu = jnp.ones((1, 2 * CFG.dit_hidden))
        cond = jnp.zeros((1, CFG.patch_size, CFG.latent_dim))
        a = cfm_sample(model.params["feat_decoder"], CFG, mu, cond, jax.random.PRNGKey(0))
        b = cfm_sample(model.params["feat_decoder"], CFG, mu, cond, jax.random.PRNGKey(0))
        assert a.shape == (1, CFG.patch_size, CFG.latent_dim)
        assert np.allclose(np.asarray(a), np.asarray(b))

    def test_guidance_changes_output(self, model):
        mu = jnp.ones((1, 2 * CFG.dit_hidden))
        mu2 = -mu
        cond = jnp.zeros((1, CFG.patch_size, CFG.latent_dim))
        a = cfm_sample(model.params["feat_decoder"], CFG, mu, cond, jax.random.PRNGKey(1))
        b = cfm_sample(model.params["feat_decoder"], CFG, mu2, cond, jax.random.PRNGKey(1))
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestLocEnc:
    def test_special_token_readout_shape(self, model):
        patches = jnp.zeros((2, 5, CFG.patch_size, CFG.latent_dim))
        emb = loc_enc(model.params["feat_encoder"], CFG, patches)
        assert emb.shape == (2, 5, CFG.enc_hidden)


class TestEndToEnd:
    def test_synthesize(self, model):
        c = model.synthesize("hello", max_tokens=3, seed=0)
        assert c.sample_rate == CFG.sample_rate
        assert len(c.samples) % (CFG.patch_size * CFG.vae.decode_chunk_size) == 0
        assert np.isfinite(c.samples).all()

    def test_deterministic(self, model):
        a = model.synthesize("same", max_tokens=3, seed=5)
        b = model.synthesize("same", max_tokens=3, seed=5)
        assert len(a.samples) == len(b.samples)
        assert np.allclose(a.samples, b.samples)

    def test_voice_cloning_conditions_output(self, model):
        ref = np.sin(np.linspace(0, 60, CFG.chunk_size * CFG.patch_size * 4)).astype(np.float32)
        plain = model.synthesize("clone", max_tokens=3, seed=2)
        cloned = model.synthesize("clone", voice=ref, max_tokens=3, seed=2)
        if len(plain.samples) == len(cloned.samples):
            assert not np.allclose(plain.samples, cloned.samples)

    def test_instruct_changes_prompt(self, model):
        a = model.synthesize("text", max_tokens=2, seed=0)
        b = model.synthesize("text", instruct="whisper", max_tokens=2, seed=0)
        # different token prefixes → different audio (tiny model, random)
        assert len(a.samples) > 0 and len(b.samples) > 0

    def test_unload(self):
        m = VoxCPM2TTS.init_random(CFG)
        m.unload()
        assert not m.is_loaded

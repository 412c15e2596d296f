"""Golden parity: our Mimi codec vs transformers' MimiModel.

The reference loads the upstream Mimi checkpoint directly
(Sources/PersonaPlex/WeightLoading.swift, MimiCodec.swift); here the
equivalent proof is operation-level parity against the HF implementation
on a tiny randomly-initialized config — the same in-process strategy as
tests/test_hf_parity.py."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qwen3_asr_swift_tpu.models.personaplex.convert import convert_mimi_tree  # noqa: E402
from qwen3_asr_swift_tpu.models.personaplex.mimi import (  # noqa: E402
    MimiConfig,
    config_tiny,
    mimi_decode,
    mimi_encode,
    mimi_encode_latent,
    rvq_decode,
)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import MimiConfig as HFMimiConfig
    from transformers import MimiModel

    cfg = config_tiny()
    hf_cfg = HFMimiConfig(
        sampling_rate=cfg.sample_rate, frame_rate=cfg.frame_rate,
        audio_channels=1, hidden_size=cfg.hidden, num_filters=cfg.num_filters,
        num_residual_layers=1, upsampling_ratios=list(cfg.ratios),
        codebook_size=cfg.codebook_size, codebook_dim=cfg.codebook_dim,
        num_quantizers=cfg.num_quantizers, num_semantic_quantizers=1,
        num_hidden_layers=cfg.transformer_layers,
        num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_kv_heads,
        intermediate_size=cfg.intermediate, head_dim=cfg.head_dim,
        upsample_groups=cfg.hidden,
        vector_quantization_hidden_dimension=cfg.codebook_dim,
        sliding_window=cfg.sliding_window, rope_theta=cfg.rope_theta,
        norm_eps=cfg.norm_eps,
    )
    torch.manual_seed(0)
    model = MimiModel(hf_cfg).eval()
    # randomize the EMA codebook stats (zero-initialized at construction)
    with torch.no_grad():
        for name, buf in model.named_buffers():
            if name.endswith("embed_sum"):
                buf.copy_(torch.randn_like(buf))
            elif name.endswith("cluster_usage"):
                buf.copy_(torch.rand_like(buf) + 0.5)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_mimi_tree(sd, cfg)
    return cfg, model, params


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(0)
    return (0.3 * rng.standard_normal(1024)).astype(np.float32)


class TestMimiParity:
    def test_encode_codes_match(self, hf_pair, audio):
        cfg, model, params = hf_pair
        with torch.no_grad():
            ref = model.encode(torch.from_numpy(audio)[None, None]).audio_codes.numpy()
        ours = np.asarray(mimi_encode(params, cfg, jnp.asarray(audio)[None]))
        assert ours.shape == ref.shape == (1, cfg.num_quantizers, len(audio) // cfg.samples_per_frame)
        mismatch = (ours != ref).mean()
        assert mismatch == 0.0, f"code mismatch rate {mismatch:.4f}"

    def test_decode_waveform_matches(self, hf_pair, audio):
        cfg, model, params = hf_pair
        rng = np.random.default_rng(1)
        codes = rng.integers(0, cfg.codebook_size, size=(1, cfg.num_quantizers, 8))
        with torch.no_grad():
            ref = model.decode(torch.from_numpy(codes)).audio_values.numpy()[:, 0]
        ours = np.asarray(mimi_decode(params, cfg, jnp.asarray(codes)))
        # HF clips nothing; ours clips to [-1, 1] — compare pre-clip range
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, np.clip(ref, -1.0, 1.0), atol=2e-4)

    def test_latent_matches(self, hf_pair, audio):
        """Encoder+transformer+downsample continuous latent parity (tighter
        than code indices — catches near-tie drift)."""
        cfg, model, params = hf_pair
        with torch.no_grad():
            x = torch.from_numpy(audio)[None, None]
            emb = model.encoder(x)
            emb = model.encoder_transformer(emb.transpose(1, 2))[0].transpose(1, 2)
            ref = model.downsample(emb).numpy().transpose(0, 2, 1)
        ours = np.asarray(mimi_encode_latent(params, cfg, jnp.asarray(audio)[None]))
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_quantizer_decode_matches(self, hf_pair):
        cfg, model, params = hf_pair
        rng = np.random.default_rng(2)
        codes = rng.integers(0, cfg.codebook_size, size=(1, cfg.num_quantizers, 5))
        with torch.no_grad():
            ref = model.quantizer.decode(torch.from_numpy(codes)).numpy().transpose(0, 2, 1)
        ours = np.asarray(rvq_decode(params, cfg, jnp.asarray(codes)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_real_config_frame_geometry(self):
        cfg = MimiConfig()
        assert cfg.samples_per_frame == 1920  # 24 kHz / 12.5 Hz
        assert cfg.hidden == 512 and cfg.num_quantizers == 16

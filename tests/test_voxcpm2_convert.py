"""VoxCPM2 conversion tests.

- torch golden parity for the AudioVAE causal-conv primitives (the
  reference's left-pad/right-trim semantics — AudioVAE.swift:99-158) and a
  full encoder/decoder stack round-trip,
- a synthetic checkpoint in the published MLX/Swift key naming
  (VoxCPM2TTS ModuleInfo paths incl. weight-norm pairs and the bare
  encoder./decoder. VAE prefix the reference remaps —
  AudioVAE.swift:647-683) converted through ``map_voxcpm2_state_dict``
  with every config dim inferred from shapes, then run end-to-end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_swift_tpu.models.voxcpm2.convert import map_voxcpm2_state_dict, _fuse_weight_norm
from qwen3_asr_swift_tpu.models.voxcpm2.model import VoxCPM2TTS
from qwen3_asr_swift_tpu.models.voxcpm2.vae import (
    causal_conv,
    causal_transpose_conv,
    snake,
    vae_config_tiny,
    vae_decode,
    vae_encode,
)

torch = pytest.importorskip("torch")
F = torch.nn.functional


class TestCausalConvParity:
    def test_causal_conv_matches_torch(self):
        rng = np.random.default_rng(0)
        B, L, CIN, COUT, K, S, D, P = 2, 24, 3, 5, 7, 1, 3, 9
        x = rng.standard_normal((B, L, CIN)).astype(np.float32)
        wt = rng.standard_normal((COUT, CIN, K)).astype(np.float32)  # torch OIK
        b = rng.standard_normal(COUT).astype(np.float32)

        lead = 2 * P
        xt = F.pad(torch.from_numpy(x).transpose(1, 2), (lead, 0))
        yt = F.conv1d(xt, torch.from_numpy(wt), torch.from_numpy(b),
                      stride=S, dilation=D).transpose(1, 2).numpy()

        ours = {"w": np.ascontiguousarray(np.transpose(wt, (2, 1, 0))), "b": b}
        yj = np.asarray(causal_conv(jnp.asarray(x), ours, stride=S,
                                    dilation=D, padding=P))
        np.testing.assert_allclose(yj, yt, rtol=1e-5, atol=1e-5)

    def test_strided_with_output_padding(self):
        rng = np.random.default_rng(1)
        B, L, C, K, S = 1, 20, 4, 10, 5   # odd stride → output_padding 1
        P, OP = int(np.ceil(S / 2)), S % 2
        x = rng.standard_normal((B, L, C)).astype(np.float32)
        wt = rng.standard_normal((C * 2, C, K)).astype(np.float32)

        lead = 2 * P - OP
        xt = F.pad(torch.from_numpy(x).transpose(1, 2), (lead, 0))
        yt = F.conv1d(xt, torch.from_numpy(wt), stride=S).transpose(1, 2).numpy()

        ours = {"w": np.ascontiguousarray(np.transpose(wt, (2, 1, 0)))}
        yj = np.asarray(causal_conv(jnp.asarray(x), ours, stride=S,
                                    padding=P, output_padding=OP))
        assert yj.shape[1] == L // S
        np.testing.assert_allclose(yj, yt, rtol=1e-5, atol=1e-5)

    def test_transpose_conv_matches_torch(self):
        rng = np.random.default_rng(2)
        B, L, CIN, COUT, S = 2, 6, 4, 3, 5
        K, P, OP = 2 * S, int(np.ceil(S / 2)), S % 2
        x = rng.standard_normal((B, L, CIN)).astype(np.float32)
        wt = rng.standard_normal((CIN, COUT, K)).astype(np.float32)  # torch IOK

        yt_full = F.conv_transpose1d(torch.from_numpy(x).transpose(1, 2),
                                     torch.from_numpy(wt), stride=S)
        trim = 2 * P - OP
        yt = yt_full[:, :, :-trim].transpose(1, 2).numpy()

        # convert path: MLX [O,K,I] → transpose(1,2,0) → flip taps
        mlx = np.transpose(wt, (1, 2, 0))
        ours = {"w": np.ascontiguousarray(np.transpose(mlx, (1, 2, 0))[::-1])}
        yj = np.asarray(causal_transpose_conv(jnp.asarray(x), ours, stride=S,
                                              padding=P, output_padding=OP))
        assert yj.shape[1] == L * S
        np.testing.assert_allclose(yj, yt, rtol=1e-5, atol=1e-5)

    def test_snake(self):
        x = np.linspace(-3, 3, 24, dtype=np.float32).reshape(1, 8, 3)
        alpha = np.asarray([0.5, 1.0, 2.0], np.float32)
        y = np.asarray(snake(jnp.asarray(x), jnp.asarray(alpha)))
        expect = x + np.sin(alpha * x) ** 2 / (alpha + 1e-9)
        np.testing.assert_allclose(y, expect, rtol=1e-6, atol=1e-6)


def _mlx_conv(rng, cout, k, cin):
    return rng.standard_normal((cout, k, cin)).astype(np.float32) * 0.2


def _synthetic_checkpoint(rng):
    """MLX/Swift key naming for a tiny geometry."""
    H, HD, HEADS, KV, INTER = 32, 16, 2, 1, 48
    EH, DH = 16, 16
    LAT, PATCH, FSQ = 8, 2, 8
    sd = {}

    def lm(prefix, layers, hidden, heads, kv, inter, rope=True, embed=0):
        for i in range(layers):
            l = f"{prefix}.layers.{i}"
            sd[f"{l}.input_layernorm.weight"] = np.ones(hidden, np.float32)
            sd[f"{l}.post_attention_layernorm.weight"] = np.ones(hidden, np.float32)
            sd[f"{l}.self_attn.q_proj.weight"] = rng.standard_normal((heads * HD, hidden)).astype(np.float32) * 0.1
            sd[f"{l}.self_attn.k_proj.weight"] = rng.standard_normal((kv * HD, hidden)).astype(np.float32) * 0.1
            sd[f"{l}.self_attn.v_proj.weight"] = rng.standard_normal((kv * HD, hidden)).astype(np.float32) * 0.1
            sd[f"{l}.self_attn.o_proj.weight"] = rng.standard_normal((hidden, heads * HD)).astype(np.float32) * 0.1
            sd[f"{l}.mlp.gate_proj.weight"] = rng.standard_normal((inter, hidden)).astype(np.float32) * 0.1
            sd[f"{l}.mlp.up_proj.weight"] = rng.standard_normal((inter, hidden)).astype(np.float32) * 0.1
            sd[f"{l}.mlp.down_proj.weight"] = rng.standard_normal((hidden, inter)).astype(np.float32) * 0.1
        sd[f"{prefix}.norm.weight"] = np.ones(hidden, np.float32)
        if embed:
            sd[f"{prefix}.embed_tokens.weight"] = rng.standard_normal((embed, hidden)).astype(np.float32) * 0.02
        if rope:
            sd[f"{prefix}.rope.inv_freq"] = (1.0 / 10000.0 ** (np.arange(HD // 2) / (HD // 2))).astype(np.float32)
            sd[f"{prefix}.rope.short_factor"] = np.ones(HD // 2, np.float32)

    lm("base_lm", 2, H, HEADS, KV, INTER, embed=300)
    lm("residual_lm", 1, H, HEADS, KV, INTER, rope=False)
    lm("feat_encoder.encoder", 1, EH, 1, 1, 32)
    lm("feat_decoder.estimator.decoder", 1, DH, 1, 1, 32)

    sd["feat_encoder.special_token"] = np.zeros((1, 1, 1, EH), np.float32)
    for name, i, o in [("feat_encoder.in_proj", LAT, EH),
                       ("enc_to_lm_proj", EH, H),
                       ("fsq_layer.in_proj", H, FSQ),
                       ("fsq_layer.out_proj", FSQ, H),
                       ("fusion_concat_proj", 2 * H, H),
                       ("lm_to_dit_proj", H, DH),
                       ("res_to_dit_proj", H, DH),
                       ("stop_proj", H, H),
                       ("feat_decoder.estimator.in_proj", LAT, DH),
                       ("feat_decoder.estimator.cond_proj", LAT, DH),
                       ("feat_decoder.estimator.out_proj", DH, LAT),
                       ("feat_decoder.estimator.time_mlp.linear_1", DH, 4 * DH),
                       ("feat_decoder.estimator.time_mlp.linear_2", 4 * DH, DH),
                       ("feat_decoder.estimator.delta_time_mlp.linear_1", DH, 4 * DH),
                       ("feat_decoder.estimator.delta_time_mlp.linear_2", 4 * DH, DH)]:
        sd[f"{name}.weight"] = rng.standard_normal((o, i)).astype(np.float32) * 0.1
        sd[f"{name}.bias"] = np.zeros(o, np.float32)
    sd["stop_head.weight"] = rng.standard_normal((2, H)).astype(np.float32) * 0.1

    # AudioVAE in BARE encoder./decoder. prefix (reference remaps it);
    # conv_in ships as a weight-norm pair
    vcfg = vae_config_tiny()
    ed, lat = vcfg.encoder_dim, vcfg.latent_dim
    v = _mlx_conv(rng, ed, 7, 1)
    g = rng.uniform(0.5, 1.5, (ed, 1, 1)).astype(np.float32)
    sd["encoder.conv_in.weight_g"] = g
    sd["encoder.conv_in.weight_v"] = v
    sd["encoder.conv_in.bias"] = np.zeros(ed, np.float32)

    d = ed
    for i, stride in enumerate(vcfg.encoder_rates):
        b = f"encoder.blocks.layers.{i}"
        nxt = d * 2
        groups = nxt // 2
        for j in range(3):
            sd[f"{b}.res{j + 1}.snake1.alpha"] = np.ones((1, 1, d), np.float32)
            sd[f"{b}.res{j + 1}.conv1.weight"] = _mlx_conv(rng, d, 7, d // groups if groups <= d else 1)
            sd[f"{b}.res{j + 1}.conv1.bias"] = np.zeros(d, np.float32)
            sd[f"{b}.res{j + 1}.snake2.alpha"] = np.ones((1, 1, d), np.float32)
            sd[f"{b}.res{j + 1}.conv2.weight"] = _mlx_conv(rng, d, 1, d)
            sd[f"{b}.res{j + 1}.conv2.bias"] = np.zeros(d, np.float32)
        sd[f"{b}.snake.alpha"] = np.ones((1, 1, d), np.float32)
        sd[f"{b}.conv.weight"] = _mlx_conv(rng, nxt, 2 * stride, d)
        sd[f"{b}.conv.bias"] = np.zeros(nxt, np.float32)
        d = nxt
    sd["encoder.fc_mu.weight"] = _mlx_conv(rng, lat, 3, d)
    sd["encoder.fc_mu.bias"] = np.zeros(lat, np.float32)
    sd["encoder.fc_logvar.weight"] = _mlx_conv(rng, lat, 3, d)  # must be dropped

    dd = vcfg.decoder_dim
    sd["decoder.conv_in.layers.0.weight"] = _mlx_conv(rng, lat, 7, 1)   # depthwise
    sd["decoder.conv_in.layers.0.bias"] = np.zeros(lat, np.float32)
    sd["decoder.conv_in.layers.1.weight"] = _mlx_conv(rng, dd, 1, lat)
    sd["decoder.conv_in.layers.1.bias"] = np.zeros(dd, np.float32)
    n_bins = len(vcfg.sr_bin_boundaries) + 1
    for i, stride in enumerate(vcfg.decoder_rates):
        b = f"decoder.blocks.layers.{i}"
        din = dd // (1 << i)
        dout = dd // (1 << (i + 1))
        sd[f"decoder.srCondLayers.layers.{i}.scale_embed.weight"] = \
            np.ones((n_bins, din), np.float32)
        sd[f"decoder.srCondLayers.layers.{i}.bias_embed.weight"] = \
            np.zeros((n_bins, din), np.float32)
        sd[f"{b}.snake.alpha"] = np.ones((1, 1, din), np.float32)
        sd[f"{b}.conv_t.weight"] = _mlx_conv(rng, dout, 2 * stride, din)
        sd[f"{b}.conv_t.bias"] = np.zeros(dout, np.float32)
        for j in range(3):
            sd[f"{b}.res{j + 1}.snake1.alpha"] = np.ones((1, 1, dout), np.float32)
            sd[f"{b}.res{j + 1}.conv1.weight"] = _mlx_conv(rng, dout, 7, 1)  # depthwise
            sd[f"{b}.res{j + 1}.conv1.bias"] = np.zeros(dout, np.float32)
            sd[f"{b}.res{j + 1}.snake2.alpha"] = np.ones((1, 1, dout), np.float32)
            sd[f"{b}.res{j + 1}.conv2.weight"] = _mlx_conv(rng, dout, 1, dout)
            sd[f"{b}.res{j + 1}.conv2.bias"] = np.zeros(dout, np.float32)
    d_last = dd // (1 << len(vcfg.decoder_rates))
    sd["decoder.snake_out.alpha"] = np.ones((1, 1, d_last), np.float32)
    sd["decoder.conv_out.weight"] = _mlx_conv(rng, 1, 7, d_last)
    sd["decoder.conv_out.bias"] = np.zeros(1, np.float32)
    return sd


class TestConvert:
    @pytest.fixture(scope="class")
    def converted(self):
        rng = np.random.default_rng(3)
        sd = _synthetic_checkpoint(rng)
        # the loader remaps bare encoder./decoder. prefixes and fuses
        # weight norm; replicate that front-end here
        remapped = {}
        for k, v in sd.items():
            if k.startswith(("encoder.", "decoder.")):
                remapped["audio_vae." + k] = v
            else:
                remapped[k] = v
        cfg, params = map_voxcpm2_state_dict(_fuse_weight_norm(remapped))
        return sd, cfg, params

    def test_dims_inferred(self, converted):
        _, cfg, params = converted
        assert cfg.num_layers == 2 and cfg.res_layers == 1
        assert cfg.hidden_size == 32 and cfg.head_dim == 16
        assert cfg.num_heads == 2 and cfg.num_kv_heads == 1
        assert cfg.enc_hidden == 16 and cfg.dit_hidden == 16
        assert cfg.fsq_latent == 8
        assert cfg.latent_dim == 8 and cfg.vae.encoder_rates == (2, 4)
        assert cfg.vae.decoder_rates == (4, 3, 2)
        assert "rope_inv_freq" in params["base_lm"]
        assert "rope_inv_freq" not in params["residual_lm"]

    def test_weight_norm_fused_and_logvar_dropped(self, converted):
        sd, cfg, params = converted
        g, v = sd["encoder.conv_in.weight_g"], sd["encoder.conv_in.weight_v"]
        norm = np.sqrt((v.reshape(v.shape[0], -1) ** 2).sum(1)).reshape(g.shape)
        fused = g * v / (norm + 1e-9)           # MLX [O,K,I]
        got = params["audio_vae"]["encoder"]["conv_in"]["w"]  # [K,I,O]
        np.testing.assert_allclose(got, np.transpose(fused, (1, 2, 0)), rtol=1e-6)

    def test_vae_roundtrip_shapes(self, converted):
        _, cfg, params = converted
        wave = jnp.asarray(np.random.default_rng(4)
                           .standard_normal((1, cfg.vae.hop_length * 5)), jnp.float32)
        lat = vae_encode(params["audio_vae"], cfg.vae, wave)
        assert lat.shape == (1, 5, cfg.latent_dim)
        wav = vae_decode(params["audio_vae"], cfg.vae, lat)
        assert wav.shape == (1, 5 * cfg.vae.decode_chunk_size)

    def test_end_to_end_generates(self, converted):
        _, cfg, params = converted
        import dataclasses

        cfg = dataclasses.replace(cfg, cfm_steps=2, max_tokens=3)
        model = VoxCPM2TTS(cfg, jax.tree_util.tree_map(np.asarray, params))
        out = model.synthesize("hello world", max_tokens=3)
        assert out.sample_rate == cfg.sample_rate
        assert np.isfinite(out.samples).all()

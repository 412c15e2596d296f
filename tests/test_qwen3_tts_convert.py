"""Qwen3-TTS checkpoint-conversion round-trip.

Builds a synthetic checkpoint in the published MLX flat naming (the layout
the reference's loader consumes — Sources/Qwen3TTS/TTSWeightLoading.swift:
24-276: talker.model.*, talker.code_predictor.*, decoder.* with MLX conv
[out, width, in] layouts, snake alpha/beta, LayerScale tensors) by
inverse-mapping a canonical tiny tree, converts it back through
``convert_tts_checkpoint``, and asserts tree equality plus a working
synthesis — so any transpose/naming drift in the converter fails loudly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_swift_tpu.models.qwen3_tts.code_predictor import init_cp_params
from qwen3_asr_swift_tpu.models.qwen3_tts.codec import init_codec_params
from qwen3_asr_swift_tpu.models.qwen3_tts.config import config_tiny
from qwen3_asr_swift_tpu.models.qwen3_tts.convert import convert_tts_checkpoint
from qwen3_asr_swift_tpu.models.qwen3_tts.model import Qwen3TTS
from qwen3_asr_swift_tpu.models.qwen3_tts.talker import init_talker_params

CFG = config_tiny()


def _np(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), tree)


def _export_lin(flat, name, p):
    flat[f"{name}.weight"] = np.ascontiguousarray(p["kernel"].T)
    if "bias" in p:
        flat[f"{name}.bias"] = p["bias"]


def _export_conv(flat, name, p):
    # canonical [width, in, out] → MLX [out, width, in]
    flat[f"{name}.weight"] = np.ascontiguousarray(np.transpose(p["kernel"], (2, 0, 1)))
    if "bias" in p:
        flat[f"{name}.bias"] = p["bias"]


def _export_convt(flat, name, p):
    # canonical flipped [width, in, out] → MLX ConvTransposed1d [out, width, in]
    # (the converter's convt() mirrors the taps; invert the flip here)
    flat[f"{name}.weight"] = np.ascontiguousarray(
        np.transpose(p["kernel"][::-1], (2, 0, 1)))
    if "bias" in p:
        flat[f"{name}.bias"] = p["bias"]


def _export_layers(flat, prefix, layers):
    for i, lp in enumerate(layers):
        p = f"{prefix}.layers.{i}"
        for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
            _export_lin(flat, f"{p}.self_attn.{n}", lp[n])
        flat[f"{p}.self_attn.q_norm.weight"] = lp["q_norm"]["weight"]
        flat[f"{p}.self_attn.k_norm.weight"] = lp["k_norm"]["weight"]
        flat[f"{p}.input_layernorm.weight"] = lp["input_layernorm"]["weight"]
        flat[f"{p}.post_attention_layernorm.weight"] = lp["post_attention_layernorm"]["weight"]
        for n in ("gate_proj", "up_proj", "down_proj"):
            _export_lin(flat, f"{p}.mlp.{n}", lp["mlp"][n])


def _export_snake(flat, name, p):
    flat[f"{name}.alpha"] = p["alpha"]
    flat[f"{name}.beta"] = p["beta"]


def _export_convnext(flat, name, p):
    _export_conv(flat, f"{name}.dwconv.conv", p["dw"])
    flat[f"{name}.norm.weight"] = p["norm"]["weight"]
    flat[f"{name}.norm.bias"] = p["norm"]["bias"]
    _export_lin(flat, f"{name}.pwconv1", p["pw1"])
    _export_lin(flat, f"{name}.pwconv2", p["pw2"])
    flat[f"{name}.layer_scale.scale"] = p["layer_scale"]


@pytest.fixture(scope="module")
def roundtrip():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    talker = _np(init_talker_params(k1, CFG.talker))
    cp = _np(init_cp_params(k2, CFG.code_predictor))
    codec = _np(init_codec_params(k3, CFG.codec))

    flat = {}
    # --- talker ---
    flat["talker.model.text_embedding.weight"] = talker["text_embedding"]
    flat["talker.model.codec_embedding.weight"] = talker["codec_embedding"]
    _export_lin(flat, "talker.text_projection.linear_fc1", talker["text_projection"]["fc1"])
    _export_lin(flat, "talker.text_projection.linear_fc2", talker["text_projection"]["fc2"])
    _export_lin(flat, "talker.codec_head", talker["codec_head"])
    flat["talker.model.norm.weight"] = talker["norm"]["weight"]
    _export_layers(flat, "talker.model", talker["layers"])

    # --- code predictor ---
    ng = CFG.code_predictor.num_code_groups - 1
    for i in range(ng):
        flat[f"talker.code_predictor.model.codec_embedding.{i}.weight"] = cp["group_embeds"][i]
        flat[f"talker.code_predictor.lm_head.{i}.weight"] = \
            np.ascontiguousarray(cp["lm_heads"][i].T)
    flat["talker.code_predictor.model.norm.weight"] = cp["norm"]["weight"]
    _export_layers(flat, "talker.code_predictor.model", cp["layers"])
    if "projection" in cp:
        _export_lin(flat, "talker.code_predictor.small_to_mtp_projection", cp["projection"])

    # --- codec decoder ---
    flat["decoder.quantizer.rvq_first.vq.layers.0._codebook.embedding.weight"] = \
        codec["rvq_first"]["codebook"][0]
    _export_conv(flat, "decoder.quantizer.rvq_first.output_proj", codec["rvq_first"]["output_proj"])
    for i in range(CFG.codec.num_quantizers - 1):
        flat[f"decoder.quantizer.rvq_rest.vq.layers.{i}._codebook.embedding.weight"] = \
            codec["rvq_rest"]["codebook"][i]
    _export_conv(flat, "decoder.quantizer.rvq_rest.output_proj", codec["rvq_rest"]["output_proj"])
    _export_conv(flat, "decoder.pre_conv.conv", codec["pre_conv"])
    tr = codec["transformer"]
    _export_lin(flat, "decoder.pre_transformer.input_proj", tr["input_proj"])
    _export_lin(flat, "decoder.pre_transformer.output_proj", tr["output_proj"])
    flat["decoder.pre_transformer.norm.weight"] = tr["norm"]["weight"]
    for i, lp in enumerate(tr["layers"]):
        p = f"decoder.pre_transformer.layers.{i}"
        flat[f"{p}.norm1.weight"] = lp["norm1"]["weight"]
        flat[f"{p}.norm2.weight"] = lp["norm2"]["weight"]
        for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
            _export_lin(flat, f"{p}.self_attn.{n}", lp[n])
        for n in ("gate_proj", "up_proj", "down_proj"):
            _export_lin(flat, f"{p}.mlp.{n}", lp[n])
        flat[f"{p}.self_attn_layer_scale.scale"] = lp["attn_scale"]
        flat[f"{p}.mlp_layer_scale.scale"] = lp["mlp_scale"]
    for u in range(2):
        _export_convt(flat, f"decoder.upsample.{u}.0.conv", codec["pre_upsample"][u]["upsample"])
        _export_convnext(flat, f"decoder.upsample.{u}.1", codec["pre_upsample"][u]["convnext"])
    _export_conv(flat, "decoder.decoder.0.conv", codec["input_conv"])
    for bi, block in enumerate(codec["blocks"], start=1):
        p = f"decoder.decoder.{bi}"
        _export_snake(flat, f"{p}.block.0", block["snake"])
        _export_convt(flat, f"{p}.block.1.conv", block["upsample"])
        for ui, unit in enumerate(block["units"]):
            base = f"{p}.block.{2 + ui}"
            _export_snake(flat, f"{base}.snake1", unit["snake1"])
            _export_conv(flat, f"{base}.conv1.conv", unit["conv1"])
            _export_snake(flat, f"{base}.snake2", unit["snake2"])
            _export_conv(flat, f"{base}.conv2.conv", unit["conv2"])
    _export_snake(flat, "decoder.decoder.5", codec["final_snake"])
    _export_conv(flat, "decoder.decoder.6.conv", codec["final_conv"])

    talker2, cp2, codec2 = convert_tts_checkpoint(flat, CFG)
    return (talker, cp, codec), (talker2, cp2, codec2)


def _assert_tree_close(a, b, path=""):
    if isinstance(a, dict):
        assert isinstance(b, dict), path
        assert set(a) <= set(b), (path, set(a) - set(b))
        for k in a:
            _assert_tree_close(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_tree_close(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   rtol=1e-6, atol=1e-6, err_msg=path)


class TestRoundTrip:
    def test_talker_tree(self, roundtrip):
        (talker, _, _), (talker2, _, _) = roundtrip
        _assert_tree_close(talker, talker2, "talker")

    def test_cp_tree(self, roundtrip):
        (_, cp, _), (_, cp2, _) = roundtrip
        _assert_tree_close(cp, cp2, "cp")

    def test_codec_tree(self, roundtrip):
        (_, _, codec), (_, _, codec2) = roundtrip
        _assert_tree_close(codec, codec2, "codec")

    def test_converted_model_synthesizes(self, roundtrip):
        _, (talker2, cp2, codec2) = roundtrip
        from qwen3_asr_swift_tpu.models.qwen3_tts.voice_clone import (
            init_codec_encoder,
            init_speaker_encoder,
        )

        from test_qwen3_tts import byte_tokenizer

        k = jax.random.PRNGKey(1)
        model = Qwen3TTS(CFG, talker2, cp2, codec2, dtype=jnp.float32,
                         tokenizer=byte_tokenizer(),
                         encoder_params=init_codec_encoder(k, CFG.codec),
                         speaker_encoder_params=init_speaker_encoder(k))
        out = model.synthesize("hello", max_frames=3)
        assert np.isfinite(out.samples).all()


class TestTransposeConvSemantics:
    """causal_transpose_conv1d ∘ convt() must reproduce the upstream op.

    The upstream CausalTransposeConv1d (reference Sources/Qwen3TTS/
    SpeechTokenizerDecoder.swift:51-82) is MLX ConvTransposed1d (the conv
    adjoint: y[s·t+k] += x[t]·W[o,k,i]) followed by a (K−s) right trim.
    A naive scatter-sum reference implements those semantics directly;
    round-trip tree equality alone cannot see a tap-flip error because
    both directions would share it.
    """

    @pytest.mark.parametrize("k,s", [(4, 2), (16, 8), (10, 5), (9, 3)])
    def test_matches_adjoint_scatter(self, k, s):
        from qwen3_asr_swift_tpu.models.qwen3_tts.codec import causal_transpose_conv1d
        from qwen3_asr_swift_tpu.models.qwen3_tts.convert import _Loader

        rng = np.random.default_rng(k * 100 + s)
        cin, cout, t = 3, 5, 7
        w_mlx = rng.standard_normal((cout, k, cin)).astype(np.float32)
        b = rng.standard_normal(cout).astype(np.float32)
        x = rng.standard_normal((1, t, cin)).astype(np.float32)

        # naive upstream semantics
        full = np.zeros((s * (t - 1) + k, cout), np.float32)
        for ti in range(t):
            for ki in range(k):
                full[s * ti + ki] += x[0, ti] @ w_mlx[:, ki, :].T
        want = (full + b)[: s * t]  # right-trim K−s

        L = _Loader({"up.weight": w_mlx, "up.bias": b}, bits=4, group=64)
        got = np.asarray(causal_transpose_conv1d(jnp.asarray(x), L.convt("up"), s))
        np.testing.assert_allclose(got[0], want, rtol=1e-5, atol=1e-5)

"""Golden parity against Hugging Face reference implementations.

SURVEY.md §4: the reference keeps golden-tensor fixtures against its
Python upstreams; here the upstreams themselves (transformers, CPU torch)
generate the goldens in-process. Random weights flow HF → our converter →
our kernels; logits must agree to fp32 tolerance. This pins the
decoder/encoder math (RoPE layout, q/k norms, GQA, SwiGLU, tied head,
T5 relative buckets) far more tightly than output-string tests."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


class TestQwen3DecoderParity:
    @pytest.fixture(scope="class")
    def setup(self):
        from transformers import Qwen3Config, Qwen3ForCausalLM

        hf_cfg = Qwen3Config(
            vocab_size=512, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=32, rope_theta=1e6, rms_norm_eps=1e-6,
            tie_word_embeddings=True, attention_bias=False,
        )
        torch.manual_seed(0)
        hf = Qwen3ForCausalLM(hf_cfg).eval()

        sd = {f"model.{k}": v.detach().numpy() for k, v in hf.model.state_dict().items()}

        import dataclasses

        from qwen3_asr_swift_tpu.models.qwen3_asr import config_tiny
        from qwen3_asr_swift_tpu.models.qwen3_asr.convert import convert_decoder

        cfg = config_tiny(vocab_size=512)
        dcfg = dataclasses.replace(cfg.decoder, hidden_size=128, intermediate_size=256,
                                   num_heads=4, num_kv_heads=2, head_dim=32)
        cfg = dataclasses.replace(cfg, decoder=dcfg)
        params = convert_decoder(sd, cfg, dtype=np.float32)
        return hf, cfg, params

    def test_prefill_logits_match(self, setup):
        hf, cfg, params = setup
        from qwen3_asr_swift_tpu.models.qwen3_asr.decoder import make_cache, prefill
        from qwen3_asr_swift_tpu.ops.nn import embedding_lookup, tied_lm_head

        ids = np.array([[5, 42, 7, 99, 3, 250, 11, 400]], np.int64)
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).logits.numpy()  # [1, T, V]

        table = jnp.asarray(params["embed_tokens"])
        embeds = embedding_lookup(table, jnp.asarray(ids, jnp.int32))
        valid = jnp.ones(ids.shape, bool)
        cache = make_cache(cfg.decoder, 1, ids.shape[1] + 4, jnp.float32)
        hidden, _ = prefill(params, cfg.decoder, embeds, valid, cache)
        ours = np.asarray(tied_lm_head(hidden, table))

        assert np.allclose(ours, ref, atol=2e-3), \
            f"max abs err {np.abs(ours - ref).max()}"

    def test_incremental_decode_matches_prefill(self, setup):
        """decode_step over the same ids must reproduce HF logits too
        (locks the KV-cache write/positions path)."""
        hf, cfg, params = setup
        from qwen3_asr_swift_tpu.models.qwen3_asr.decoder import (
            decode_step,
            make_cache,
            prefill,
        )
        from qwen3_asr_swift_tpu.ops.nn import embedding_lookup

        ids = np.array([[5, 42, 7, 99, 3]], np.int64)
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).logits.numpy()

        table = jnp.asarray(params["embed_tokens"])
        # prefill the first 3, then decode tokens 4 and 5 incrementally
        # (prefill/decode_step advance the cache themselves)
        cache = make_cache(cfg.decoder, 1, ids.shape[1] + 2, jnp.float32)
        embeds = embedding_lookup(table, jnp.asarray(ids[:, :3], jnp.int32))
        valid = jnp.ones((1, 3), bool)
        _, cache = prefill(params, cfg.decoder, embeds, valid, cache)
        for t in (3, 4):
            logits, cache = decode_step(params, cfg.decoder,
                                        jnp.asarray(ids[:, t], jnp.int32), cache)
            assert np.allclose(np.asarray(logits), ref[:, t], atol=2e-3), \
                f"step {t}: max err {np.abs(np.asarray(logits) - ref[:, t]).max()}"


class TestT5TranslationParity:
    @pytest.fixture(scope="class")
    def setup(self):
        import dataclasses

        from transformers import T5Config as HFT5Config
        from transformers import T5ForConditionalGeneration

        hf_cfg = HFT5Config(vocab_size=384, d_model=64, d_kv=16, d_ff=128,
                            num_layers=2, num_decoder_layers=2, num_heads=4,
                            relative_attention_num_buckets=8,
                            relative_attention_max_distance=20,
                            feed_forward_proj="gated-gelu",
                            tie_word_embeddings=False, dropout_rate=0.0)
        torch.manual_seed(1)
        hf = T5ForConditionalGeneration(hf_cfg).eval()
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

        from qwen3_asr_swift_tpu.models.translation.convert import convert_t5_checkpoint
        from qwen3_asr_swift_tpu.models.translation.model import config_tiny

        cfg = dataclasses.replace(
            config_tiny(vocab=384), d_model=64, d_kv=16, d_ff=128,
            num_encoder_layers=2, num_decoder_layers=2, num_heads=4,
            rel_buckets=8, rel_max_distance=20)
        params = convert_t5_checkpoint(sd, cfg)
        return hf, cfg, params

    def test_encoder_hidden_match(self, setup):
        hf, cfg, params = setup
        from qwen3_asr_swift_tpu.models.translation.model import t5_encode

        ids = np.array([[3, 25, 99, 383, 7]], np.int64)
        with torch.no_grad():
            ref = hf.encoder(torch.tensor(ids)).last_hidden_state.numpy()
        ours = np.asarray(t5_encode(
            jax.tree_util.tree_map(jnp.asarray, params), cfg,
            jnp.asarray(ids, jnp.int32), jnp.ones((1, ids.shape[1]), bool)))
        assert np.allclose(ours, ref, atol=2e-3), f"max err {np.abs(ours-ref).max()}"


class TestWhisperMelParity:
    def test_mel_tracks_transformers_feature_extractor(self):
        """Divergence guard vs transformers' WhisperFeatureExtractor.

        The reference deliberately zero-pads the 400-sample window to a
        512-point FFT for vDSP (AudioPreprocessing.swift:34-35), which
        changes sidelobe structure vs Whisper's 400-point FFT; bit parity
        with the 512-pad semantics is asserted in test_mel.py. This test
        only guards against gross regressions (wrong window, frame
        offset, sign, normalization) using bounds measured against the
        known deviation."""
        from transformers import WhisperFeatureExtractor

        from qwen3_asr_swift_tpu.ops.mel import (
            MelConfig,
            log_mel_kernel,
            reflect_pad_np,
        )

        fe = WhisperFeatureExtractor(feature_size=128, sampling_rate=16000,
                                     hop_length=160, n_fft=400, padding_value=0.0)
        rng = np.random.default_rng(0)
        audio = (0.3 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)
                 + 0.05 * rng.standard_normal(16000)).astype(np.float32)

        ref = fe(audio, sampling_rate=16000, padding="do_not_pad",
                 return_tensors="np").input_features[0]

        cfg = MelConfig()
        n_frames = len(audio) // cfg.hop_length  # whisper drops the last frame
        padded = reflect_pad_np(audio, cfg.n_fft // 2)
        need = (n_frames - 1) * cfg.hop_length + cfg.n_fft
        padded = np.pad(padded, (0, max(0, need - len(padded))))
        ours = np.asarray(log_mel_kernel(jnp.asarray(padded),
                                         jnp.asarray(n_frames, jnp.int32),
                                         cfg, n_frames))
        ref = ref[:, :n_frames]
        assert ours.shape == ref.shape
        hi = ref > ref.max() - 1.0       # top half of the dynamic range
        err = np.abs(ours - ref)
        assert err[hi].mean() < 0.1, f"hi-energy mean err {err[hi].mean()}"
        assert np.corrcoef(ours.ravel(), ref.ravel())[0, 1] > 0.85


class TestWav2Vec2Parity:
    def test_ctc_log_probs_match(self):
        from transformers import Wav2Vec2Config, Wav2Vec2ForCTC

        from qwen3_asr_swift_tpu.models.omnilingual.convert import convert_wav2vec2
        from qwen3_asr_swift_tpu.models.omnilingual.model import (
            CONV_SPEC,
            config_tiny,
            omni_forward,
        )

        tiny = config_tiny(vocab=40)
        hf_cfg = Wav2Vec2Config(
            vocab_size=40, hidden_size=tiny.hidden_size,
            num_hidden_layers=tiny.num_layers, num_attention_heads=tiny.num_heads,
            intermediate_size=tiny.ffn_dim,
            conv_dim=[c for c, _, _ in CONV_SPEC],
            conv_kernel=[k for _, k, _ in CONV_SPEC],
            conv_stride=[s for _, _, s in CONV_SPEC],
            num_feat_extract_layers=len(CONV_SPEC),
            feat_extract_norm="layer", conv_bias=False,
            do_stable_layer_norm=True,
            num_conv_pos_embeddings=tiny.conv_pos_kernel,
            num_conv_pos_embedding_groups=tiny.conv_pos_groups,
            hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
            final_dropout=0.0, layerdrop=0.0, apply_spec_augment=False,
        )
        torch.manual_seed(2)
        hf = Wav2Vec2ForCTC(hf_cfg).eval()
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        # scale the transformer-layer weights away from near-init: a
        # near-identity stack hides placement errors (e.g. the final
        # encoder.layer_norm applied pre- vs post-stack) inside the
        # tolerance
        for k in list(sd):
            if ".encoder.layers." in k and k.endswith(".weight") and sd[k].ndim == 2:
                sd[k] = sd[k] * 3.0
        hf.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})
        params = convert_wav2vec2(sd, tiny)

        audio = np.random.default_rng(3).standard_normal(3200).astype(np.float32)
        # HF expects externally normalized input; omni_forward normalizes
        # the valid region internally with the same zero-mean/unit-var rule
        normed = (audio - audio.mean()) / np.sqrt(audio.var() + 1e-7)
        with torch.no_grad():
            ref_logits = hf(torch.tensor(normed[None])).logits.numpy()[0]
        ref = ref_logits - np.log(np.exp(ref_logits).sum(-1, keepdims=True))

        ours, n_f = omni_forward(
            jax.tree_util.tree_map(jnp.asarray, params), tiny,
            jnp.asarray(audio), jnp.asarray(len(audio), jnp.int32))
        ours = np.asarray(ours)
        assert ours.shape == ref.shape, (ours.shape, ref.shape)
        assert np.abs(ours - ref).max() < 1e-2, f"max err {np.abs(ours-ref).max()}"


class TestQwen3AudioEncoderParity:
    """The flagship windowed-attention audio encoder vs transformers'
    Qwen3-Omni audio tower (the published Qwen3-ASR checkpoints share
    this architecture: conv2d×3 → conv_out → sinusoid positions →
    windowed attention → ln_post → proj1/gelu/proj2)."""

    def test_encoder_tokens_match(self):
        import dataclasses

        from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
            Qwen3OmniMoeAudioEncoderConfig,
        )
        from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
            Qwen3OmniMoeAudioEncoder,
        )

        from qwen3_asr_swift_tpu.models.qwen3_asr.config import AudioEncoderConfig
        from qwen3_asr_swift_tpu.models.qwen3_asr.convert import convert_encoder
        from qwen3_asr_swift_tpu.models.qwen3_asr.encoder import encode

        n_mels, d, hid = 32, 64, 24
        hf_cfg = Qwen3OmniMoeAudioEncoderConfig(
            num_mel_bins=n_mels, encoder_layers=2, encoder_attention_heads=4,
            encoder_ffn_dim=128, d_model=d, dropout=0.0, attention_dropout=0.0,
            activation_function="gelu", downsample_hidden_size=hid,
            n_window=50, n_window_infer=800, output_dim=48,
            max_source_positions=1500, scale_embedding=False,
        )
        torch.manual_seed(0)
        hf = Qwen3OmniMoeAudioEncoder(hf_cfg).eval()

        mel_pos = (((n_mels + 1) // 2 + 1) // 2 + 1) // 2  # 4
        cfg = AudioEncoderConfig(
            d_model=d, num_heads=4, ffn_dim=128, num_layers=2, n_mels=n_mels,
            output_dim=48, downsample_hidden=hid,
            conv_out_input_dim=hid * mel_pos,
        )
        flat = {f"audio_tower.{k}": v.detach().numpy() for k, v in hf.state_dict().items()}
        params = jax.tree_util.tree_map(
            jnp.asarray, convert_encoder(flat, _CfgShim(cfg), dtype=np.float32))

        t_frames = 800  # one full attention window, 8 conv chunks
        rng = np.random.default_rng(0)
        mel = rng.standard_normal((n_mels, t_frames)).astype(np.float32) * 0.5

        with torch.no_grad():
            ref = hf(torch.tensor(mel),
                     feature_lens=torch.tensor([t_frames])).last_hidden_state.numpy()

        ours, n_valid = encode(params, jnp.asarray(mel),
                               jnp.asarray(t_frames, jnp.int32), cfg)
        ours = np.asarray(ours)[: int(n_valid)]
        assert ours.shape == ref.shape, (ours.shape, ref.shape)
        assert np.abs(ours - ref).max() < 5e-3, f"max err {np.abs(ours - ref).max()}"


class _CfgShim:
    """convert_encoder reads cfg.decoder.bits/group_size and
    cfg.encoder.num_layers — wrap a bare AudioEncoderConfig."""

    def __init__(self, enc_cfg):
        self.encoder = enc_cfg

        class _D:
            bits = 4
            group_size = 64

        self.decoder = _D()


class TestDeltaRuleParity:
    def test_recurrence_matches_qwen3_next(self):
        """The chat model's gated delta-rule recurrence (including its q/k
        scaling convention) vs transformers'
        torch_recurrent_gated_delta_rule with in-kernel L2 norm."""
        from transformers.models.qwen3_next.modeling_qwen3_next import (
            torch_recurrent_gated_delta_rule,
        )

        B, T, H, DK, DV = 1, 6, 2, 8, 8
        rng = np.random.default_rng(0)
        q = rng.standard_normal((B, T, H, DK)).astype(np.float32)
        k = rng.standard_normal((B, T, H, DK)).astype(np.float32)
        v = rng.standard_normal((B, T, H, DV)).astype(np.float32)
        g_log = (-np.abs(rng.standard_normal((B, T, H))) * 0.1).astype(np.float32)
        beta = (1 / (1 + np.exp(-rng.standard_normal((B, T, H))))).astype(np.float32)

        with torch.no_grad():
            ref, _ = torch_recurrent_gated_delta_rule(
                torch.tensor(q), torch.tensor(k), torch.tensor(v),
                torch.tensor(g_log), torch.tensor(beta), None, True,
                use_qk_l2norm_in_kernel=True)
        ref = ref.numpy()

        from qwen3_asr_swift_tpu.models.chat.model import _l2_norm

        inv = 1.0 / np.sqrt(DK)
        qm = (inv * inv) * _l2_norm(jnp.asarray(q))   # the model's convention
        km = inv * _l2_norm(jnp.asarray(k))
        g = np.exp(g_log)

        S = jnp.zeros((B, H, DV, DK))
        outs = []
        for t in range(T):  # the exact step body from deltanet_forward
            S = S * g[:, t][..., None, None]
            kv = jnp.einsum("bhvk,bhk->bhv", S, km[:, t])
            delta = (jnp.asarray(v)[:, t] - kv) * beta[:, t][..., None]
            S = S + jnp.einsum("bhk,bhv->bhvk", km[:, t], delta)
            outs.append(jnp.einsum("bhvk,bhk->bhv", S, qm[:, t]))
        mine = np.asarray(jnp.stack(outs, 1))
        assert np.abs(mine - ref).max() / np.abs(ref).max() < 1e-4

"""Kokoro-82M (StyleTTS2 KModel) tests.

- phonemizer / trim+fade behavior
- golden parity: our ALBERT vs transformers AlbertModel (same weights)
- op parity vs torch: masked BiLSTM (packed semantics), AdainResBlk1d
  (incl. the depthwise ConvTranspose pool), ConvTranspose upsampling
- convert: synthetic checkpoint in the published kokoro-v1_0.pth naming
  (weight-norm pairs, module state-dicts) loads and runs
- duration→alignment semantics and speed scaling
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_swift_tpu.models.kokoro import (
    KokoroTTS,
    config_tiny,
    phonemize,
    phonemes_to_ids,
    trim_and_fade,
)
from qwen3_asr_swift_tpu.models.kokoro.albert import (
    albert_config_tiny,
    albert_forward,
    init_albert_params,
)
from qwen3_asr_swift_tpu.models.kokoro.model import (
    _adain_resblk,
    _bilstm,
    _conv_transpose_same,
    init_kokoro_params,
    kokoro_forward,
)
from qwen3_asr_swift_tpu.models.kokoro.phonemizer import number_to_words


class TestPhonemizer:
    def test_dictionary_words(self):
        out = phonemize("hello world")
        assert "həlˈoʊ" in out
        assert "wɜːld" in out

    def test_rule_fallback_nonempty(self):
        out = phonemize("flibbertigibbet")
        assert len(out) > 5

    def test_numbers_expanded(self):
        assert "twˈɛnti faɪv" in phonemize("25 things")
        assert number_to_words(125) == "one hundred twenty five"
        assert number_to_words(3000) == "three thousand"

    def test_punctuation_preserved(self):
        out = phonemize("stop. now!")
        assert "." in out and "!" in out

    def test_ids_in_vocab(self):
        ids = phonemes_to_ids(phonemize("test sentence"))
        assert ids and all(0 <= i < 178 for i in ids)

    def test_zh_routes_to_pinyin_ipa(self):
        # zh now routes through the Mandarin phonemizer (phonemizer_i18n):
        # 你(ni3) 好(hao3) → IPA with two third-tone arrows, no raw hanzi
        out = phonemize("你好", "zh")
        assert out.count("↓") == 2
        assert "你" not in out

    def test_ko_passthrough(self):
        # no dedicated Korean phonemizer (same as the reference) —
        # per-character passthrough keeps hangul synthesizable
        assert phonemize("안녕", "ko") == "안 녕"


class TestTrimFade:
    def test_trailing_silence_trimmed(self):
        sr = 24000
        speech = 0.5 * np.sin(np.arange(sr) * 0.1).astype(np.float32)
        silence = np.zeros(sr, np.float32)
        out = trim_and_fade(np.concatenate([speech, silence]), sr)
        assert abs(out[-1]) < 1e-6  # tail silenced
        assert np.abs(out[: sr // 2]).max() > 0.1  # speech kept

    def test_empty_ok(self):
        assert len(trim_and_fade(np.zeros(0, np.float32))) == 0


class TestAlbertParity:
    def test_matches_transformers(self):
        """Golden parity: identical weights through transformers AlbertModel
        and our albert_forward must agree."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")

        cfg = albert_config_tiny()
        hf_cfg = transformers.AlbertConfig(
            vocab_size=cfg.vocab_size, embedding_size=cfg.embedding_size,
            hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads, intermediate_size=cfg.intermediate_size,
            max_position_embeddings=cfg.max_position_embeddings,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            classifier_dropout_prob=0.0)
        hf = transformers.AlbertModel(hf_cfg).eval()

        sd = hf.state_dict()
        base = "encoder.albert_layer_groups.0.albert_layers.0"

        def lin(name):
            return {"kernel": sd[f"{name}.weight"].numpy().T.copy(),
                    "bias": sd[f"{name}.bias"].numpy()}

        def ln(name):
            return {"weight": sd[f"{name}.weight"].numpy(),
                    "bias": sd[f"{name}.bias"].numpy()}

        params = {
            "word_embeddings": sd["embeddings.word_embeddings.weight"].numpy(),
            "position_embeddings": sd["embeddings.position_embeddings.weight"].numpy(),
            "token_type_embeddings": sd["embeddings.token_type_embeddings.weight"].numpy(),
            "embed_ln": ln("embeddings.LayerNorm"),
            "embed_proj": lin("encoder.embedding_hidden_mapping_in"),
            "q": lin(f"{base}.attention.query"),
            "k": lin(f"{base}.attention.key"),
            "v": lin(f"{base}.attention.value"),
            "attn_out": lin(f"{base}.attention.dense"),
            "attn_ln": ln(f"{base}.attention.LayerNorm"),
            "ffn": lin(f"{base}.ffn"),
            "ffn_out": lin(f"{base}.ffn_output"),
            "full_ln": ln(f"{base}.full_layer_layer_norm"),
        }

        ids = np.array([[4, 8, 15, 16, 23, 42, 0, 0]], np.int64)
        mask = np.array([[1, 1, 1, 1, 1, 1, 0, 0]], np.int64)
        with torch.no_grad():
            ref = hf(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
        ours = np.asarray(albert_forward(
            jax.tree_util.tree_map(jnp.asarray, params), cfg,
            jnp.asarray(ids, jnp.int32), jnp.asarray(mask, bool)))
        np.testing.assert_allclose(ours[:, :6], ref[:, :6], atol=2e-4)


class TestTorchOpParity:
    def test_masked_bilstm_matches_packed_torch(self):
        """Backward direction must start at the last VALID step — the torch
        packed-sequence semantics the published model was trained with."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        i_dim, h_dim, t, n_valid = 6, 5, 9, 6
        lstm = torch.nn.LSTM(i_dim, h_dim, batch_first=True, bidirectional=True).eval()
        x = rng.standard_normal((1, t, i_dim)).astype(np.float32)
        with torch.no_grad():
            packed = torch.nn.utils.rnn.pack_padded_sequence(
                torch.tensor(x), [n_valid], batch_first=True)
            out, _ = lstm(packed)
            out, _ = torch.nn.utils.rnn.pad_packed_sequence(
                out, batch_first=True, total_length=t)
            ref = out.numpy()
        sd = lstm.state_dict()

        def d(s):
            return {"wx": sd[f"weight_ih_l0{s}"].numpy().T.copy(),
                    "wh": sd[f"weight_hh_l0{s}"].numpy().T.copy(),
                    "bias": (sd[f"bias_ih_l0{s}"] + sd[f"bias_hh_l0{s}"]).numpy()}

        p = jax.tree_util.tree_map(jnp.asarray, {"fwd": d(""), "bwd": d("_reverse")})
        ours = np.asarray(_bilstm(p, jnp.asarray(x), jnp.asarray(n_valid, jnp.int32)))
        np.testing.assert_allclose(ours[:, :n_valid], ref[:, :n_valid], atol=1e-5)

    def test_conv_transpose_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        cin, cout, k, s, t = 4, 3, 12, 6, 7
        conv = torch.nn.ConvTranspose1d(cin, cout, k, s, padding=(k - s) // 2).eval()
        x = rng.standard_normal((1, cin, t)).astype(np.float32)
        with torch.no_grad():
            ref = conv(torch.tensor(x)).numpy()          # [1, cout, t*s]
        w = conv.weight.detach().numpy()                  # [in, out, k]
        p = {"kernel": jnp.asarray(np.transpose(w[:, :, ::-1], (2, 0, 1)).copy()),
             "bias": jnp.asarray(conv.bias.detach().numpy())}
        ours = np.asarray(_conv_transpose_same(jnp.asarray(x.transpose(0, 2, 1)), p, s))
        np.testing.assert_allclose(ours, ref.transpose(0, 2, 1), atol=1e-5)

    def test_adain_resblk_upsample_matches_torch_replica(self):
        """Torch replica of StyleTTS2 AdainResBlk1d (upsample variant):
        InstanceNorm+style, leaky, depthwise ConvTranspose pool, convs,
        (res + shortcut)/√2."""
        torch = pytest.importorskip("torch")
        torch.manual_seed(0)
        cin, cout, sty, t = 6, 4, 5, 8

        norm1_fc = torch.nn.Linear(sty, cin * 2)
        norm2_fc = torch.nn.Linear(sty, cout * 2)
        conv1 = torch.nn.Conv1d(cin, cout, 3, padding=1)
        conv2 = torch.nn.Conv1d(cout, cout, 3, padding=1)
        conv1x1 = torch.nn.Conv1d(cin, cout, 1, bias=False)
        pool = torch.nn.ConvTranspose1d(cin, cin, 3, stride=2, groups=cin,
                                        padding=1, output_padding=1)

        def adain(x, fc):
            h = fc(s_t)
            gamma, beta = h.chunk(2, dim=1)
            inorm = torch.nn.functional.instance_norm(x)
            return (1 + gamma.unsqueeze(-1)) * inorm + beta.unsqueeze(-1)

        rng = np.random.default_rng(2)
        x = rng.standard_normal((1, cin, t)).astype(np.float32)
        s = rng.standard_normal((1, sty)).astype(np.float32)
        x_t, s_t = torch.tensor(x), torch.tensor(s)
        with torch.no_grad():
            h = adain(x_t, norm1_fc)
            h = torch.nn.functional.leaky_relu(h, 0.2)
            h = pool(h)
            h = conv1(h)
            h = adain(h, norm2_fc)
            h = torch.nn.functional.leaky_relu(h, 0.2)
            h = conv2(h)
            sc = torch.nn.functional.interpolate(x_t, scale_factor=2, mode="nearest")
            sc = conv1x1(sc)
            ref = ((h + sc) / np.sqrt(2.0)).numpy()

        def convp(c):
            return {"kernel": jnp.asarray(c.weight.detach().numpy().transpose(2, 1, 0).copy()),
                    **({"bias": jnp.asarray(c.bias.detach().numpy())} if c.bias is not None else {})}

        pool_w = pool.weight.detach().numpy()[:, :, ::-1]  # taps flipped (convert.py)
        p = {
            "norm1": {"fc": {"kernel": jnp.asarray(norm1_fc.weight.detach().numpy().T.copy()),
                             "bias": jnp.asarray(norm1_fc.bias.detach().numpy())}},
            "conv1": convp(conv1),
            "norm2": {"fc": {"kernel": jnp.asarray(norm2_fc.weight.detach().numpy().T.copy()),
                             "bias": jnp.asarray(norm2_fc.bias.detach().numpy())}},
            "conv2": convp(conv2),
            "conv1x1": {"kernel": jnp.asarray(conv1x1.weight.detach().numpy().transpose(2, 1, 0).copy())},
            "pool": {"kernel": jnp.asarray(np.transpose(pool_w, (2, 1, 0)).copy()),
                     "bias": jnp.asarray(pool.bias.detach().numpy())},
        }
        ours = np.asarray(_adain_resblk(jnp.asarray(x.transpose(0, 2, 1)), p,
                                        jnp.asarray(s), upsample=True))
        np.testing.assert_allclose(ours, ref.transpose(0, 2, 1), atol=1e-5)


class TestConvert:
    def test_synthetic_pth_layout_roundtrip(self, tmp_path):
        """Build a synthetic checkpoint in the published kokoro-v1_0.pth
        naming (module state-dicts, weight-norm pairs), convert, and run
        the full forward."""
        torch = pytest.importorskip("torch")
        from qwen3_asr_swift_tpu.models.kokoro.convert import convert_checkpoint

        cfg = config_tiny()
        a = cfg.albert
        g = torch.Generator().manual_seed(0)

        def t(*shape):
            return torch.randn(*shape, generator=g) * 0.05

        def wn(w):
            gnorm = w.norm(dim=tuple(range(1, w.ndim)), keepdim=True)
            return {"weight_g": gnorm, "weight_v": w}

        def lstm_sd(prefix, i, h, out):
            for s in ("", "_reverse"):
                out[f"{prefix}.weight_ih_l0{s}"] = t(4 * h, i)
                out[f"{prefix}.weight_hh_l0{s}"] = t(4 * h, h)
                out[f"{prefix}.bias_ih_l0{s}"] = t(4 * h)
                out[f"{prefix}.bias_hh_l0{s}"] = t(4 * h)

        def adain_resblk_sd(prefix, cin, cout, sty, out, upsample=False):
            out[f"{prefix}.norm1.fc.weight"] = t(cin * 2, sty)
            out[f"{prefix}.norm1.fc.bias"] = t(cin * 2)
            for k, v in wn(t(cout, cin, 3)).items():
                out[f"{prefix}.conv1.{k}"] = v
            out[f"{prefix}.conv1.bias"] = t(cout)
            out[f"{prefix}.norm2.fc.weight"] = t(cout * 2, sty)
            out[f"{prefix}.norm2.fc.bias"] = t(cout * 2)
            for k, v in wn(t(cout, cout, 3)).items():
                out[f"{prefix}.conv2.{k}"] = v
            out[f"{prefix}.conv2.bias"] = t(cout)
            if cin != cout:
                for k, v in wn(t(cout, cin, 1)).items():
                    out[f"{prefix}.conv1x1.{k}"] = v
            if upsample:
                for k, v in wn(t(cin, 1, 3)).items():
                    out[f"{prefix}.pool.{k}"] = v
                out[f"{prefix}.pool.bias"] = t(cin)

        def adain_resblock1_sd(prefix, ch, kern, sty, n_dil, out):
            for j in range(n_dil):
                for k, v in wn(t(ch, ch, kern)).items():
                    out[f"{prefix}.convs1.{j}.{k}"] = v
                out[f"{prefix}.convs1.{j}.bias"] = t(ch)
                for k, v in wn(t(ch, ch, kern)).items():
                    out[f"{prefix}.convs2.{j}.{k}"] = v
                out[f"{prefix}.convs2.{j}.bias"] = t(ch)
                out[f"{prefix}.adain1.{j}.fc.weight"] = t(ch * 2, sty)
                out[f"{prefix}.adain1.{j}.fc.bias"] = t(ch * 2)
                out[f"{prefix}.adain2.{j}.fc.weight"] = t(ch * 2, sty)
                out[f"{prefix}.adain2.{j}.fc.bias"] = t(ch * 2)
                out[f"{prefix}.alpha1.{j}"] = torch.ones(1, ch, 1)
                out[f"{prefix}.alpha2.{j}"] = torch.ones(1, ch, 1)

        base = "encoder.albert_layer_groups.0.albert_layers.0"
        bert = {
            "embeddings.word_embeddings.weight": t(a.vocab_size, a.embedding_size),
            "embeddings.position_embeddings.weight": t(a.max_position_embeddings, a.embedding_size),
            "embeddings.token_type_embeddings.weight": t(2, a.embedding_size),
            "embeddings.LayerNorm.weight": torch.ones(a.embedding_size),
            "embeddings.LayerNorm.bias": torch.zeros(a.embedding_size),
            "encoder.embedding_hidden_mapping_in.weight": t(a.hidden_size, a.embedding_size),
            "encoder.embedding_hidden_mapping_in.bias": t(a.hidden_size),
        }
        for name in ("attention.query", "attention.key", "attention.value", "attention.dense"):
            bert[f"{base}.{name}.weight"] = t(a.hidden_size, a.hidden_size)
            bert[f"{base}.{name}.bias"] = t(a.hidden_size)
        bert[f"{base}.attention.LayerNorm.weight"] = torch.ones(a.hidden_size)
        bert[f"{base}.attention.LayerNorm.bias"] = torch.zeros(a.hidden_size)
        bert[f"{base}.ffn.weight"] = t(a.intermediate_size, a.hidden_size)
        bert[f"{base}.ffn.bias"] = t(a.intermediate_size)
        bert[f"{base}.ffn_output.weight"] = t(a.hidden_size, a.intermediate_size)
        bert[f"{base}.ffn_output.bias"] = t(a.hidden_size)
        bert[f"{base}.full_layer_layer_norm.weight"] = torch.ones(a.hidden_size)
        bert[f"{base}.full_layer_layer_norm.bias"] = torch.zeros(a.hidden_size)

        d, sty = cfg.hidden_dim, cfg.style_dim
        predictor = {}
        for i in range(cfg.n_dur_layers):
            lstm_sd(f"text_encoder.lstms.{2 * i}", d + sty, d // 2, predictor)
            predictor[f"text_encoder.lstms.{2 * i + 1}.fc.weight"] = t(d * 2, sty)
            predictor[f"text_encoder.lstms.{2 * i + 1}.fc.bias"] = t(d * 2)
        lstm_sd("lstm", d + sty, d // 2, predictor)
        predictor["duration_proj.linear_layer.weight"] = t(cfg.max_dur, d)
        predictor["duration_proj.linear_layer.bias"] = t(cfg.max_dur)
        lstm_sd("shared", d + sty, d // 2, predictor)
        adain_resblk_sd("F0.0", d, d, sty, predictor)
        adain_resblk_sd("F0.1", d, d // 2, sty, predictor, upsample=True)
        adain_resblk_sd("F0.2", d // 2, d // 2, sty, predictor)
        predictor["F0_proj.weight"] = t(1, d // 2, 1)
        predictor["F0_proj.bias"] = t(1)
        adain_resblk_sd("N.0", d, d, sty, predictor)
        adain_resblk_sd("N.1", d, d // 2, sty, predictor, upsample=True)
        adain_resblk_sd("N.2", d // 2, d // 2, sty, predictor)
        predictor["N_proj.weight"] = t(1, d // 2, 1)
        predictor["N_proj.bias"] = t(1)

        text_encoder = {"embedding.weight": t(cfg.vocab_size, d)}
        for i in range(3):
            for k, v in wn(t(d, d, cfg.text_kernel)).items():
                text_encoder[f"cnn.{i}.0.{k}"] = v
            text_encoder[f"cnn.{i}.0.bias"] = t(d)
            text_encoder[f"cnn.{i}.1.gamma"] = torch.ones(d)
            text_encoder[f"cnn.{i}.1.beta"] = torch.zeros(d)
        lstm_sd("lstm", d, d // 2, text_encoder)

        dec, ch0 = cfg.decoder_dim, cfg.upsample_initial
        n_dil = len(cfg.resblock_dilations)
        n_up = len(cfg.upsample_rates)
        n_k = len(cfg.resblock_kernels)
        stft_ch = cfg.gen_istft_n_fft + 2
        decoder = {}
        for name in ("F0_conv", "N_conv"):
            for k, v in wn(t(1, 1, 3)).items():
                decoder[f"{name}.{k}"] = v
            decoder[f"{name}.bias"] = t(1)
        adain_resblk_sd("encode", d + 2, dec, sty, decoder)
        for i in range(3):
            adain_resblk_sd(f"decode.{i}", dec + 2 + cfg.asr_res_dim, dec, sty, decoder)
        adain_resblk_sd("decode.3", dec + 2 + cfg.asr_res_dim, ch0, sty, decoder, upsample=True)
        for k, v in wn(t(cfg.asr_res_dim, d, 1)).items():
            decoder[f"asr_res.0.{k}"] = v
        decoder["asr_res.0.bias"] = t(cfg.asr_res_dim)
        decoder["generator.m_source.l_linear.weight"] = t(1, cfg.nb_harmonics + 1)
        decoder["generator.m_source.l_linear.bias"] = t(1)
        for i in range(n_up):
            c_cur = ch0 // (2 ** (i + 1))
            if i + 1 < n_up:
                import numpy as _np
                stride_f0 = int(_np.prod(cfg.upsample_rates[i + 1:]))
                decoder[f"generator.noise_convs.{i}.weight"] = t(c_cur, stft_ch, stride_f0 * 2)
            else:
                decoder[f"generator.noise_convs.{i}.weight"] = t(c_cur, stft_ch, 1)
            decoder[f"generator.noise_convs.{i}.bias"] = t(c_cur)
            nk = 7 if i + 1 < n_up else (11 if n_k > 1 else cfg.resblock_kernels[-1])
            adain_resblock1_sd(f"generator.noise_res.{i}", c_cur, nk, sty, n_dil, decoder)
            for k, v in wn(t(ch0 // (2 ** i), c_cur, cfg.upsample_kernels[i])).items():
                decoder[f"generator.ups.{i}.{k}"] = v
            decoder[f"generator.ups.{i}.bias"] = t(c_cur)
            for j, kern in enumerate(cfg.resblock_kernels):
                adain_resblock1_sd(f"generator.resblocks.{i * n_k + j}", c_cur, kern,
                                   sty, n_dil, decoder)
        for k, v in wn(t(stft_ch, ch0 // (2 ** n_up), 7)).items():
            decoder[f"generator.conv_post.{k}"] = v
        decoder["generator.conv_post.bias"] = t(stft_ch)

        ckpt = {
            "bert": bert,
            "bert_encoder": {"weight": t(d, a.hidden_size), "bias": t(d)},
            "predictor": {f"module.{k}": v for k, v in predictor.items()},
            "text_encoder": {f"module.{k}": v for k, v in text_encoder.items()},
            "decoder": {f"module.{k}": v for k, v in decoder.items()},
        }
        torch.save(ckpt, tmp_path / "kokoro-tiny.pth")

        params = convert_checkpoint(tmp_path, cfg)
        ids = np.zeros((1, 16), np.int32)
        ids[0, :6] = [0, 5, 6, 7, 8, 0]
        wav, total, pred_dur = kokoro_forward(
            jax.tree_util.tree_map(jnp.asarray, params), cfg,
            jnp.asarray(ids), jnp.asarray(6, jnp.int32),
            jnp.zeros((1, cfg.style_dim * 2)), jnp.asarray(1.0),
            jax.random.PRNGKey(0), max_frames=48)
        assert int(total) >= 6  # ≥1 frame per valid token
        assert np.isfinite(np.asarray(wav)).all()


class TestSynthesis:
    @pytest.fixture(scope="class")
    def model(self):
        return KokoroTTS.init_random(config_tiny())

    def test_synthesize_nonempty_finite(self, model):
        c = model.synthesize("hello world", seed=0)
        assert len(c.samples) > 0
        assert c.sample_rate == model.cfg.sample_rate
        assert np.isfinite(c.samples).all()

    def test_duration_scales_with_speed(self, model):
        slow = model.synthesize("a longer test sentence now", speed=0.5, seed=0)
        fast = model.synthesize("a longer test sentence now", speed=2.0, seed=0)
        assert len(slow.samples) > len(fast.samples)

    def test_deterministic(self, model):
        a = model.synthesize("same words", seed=4)
        b = model.synthesize("same words", seed=4)
        np.testing.assert_array_equal(a.samples, b.samples)

    def test_voice_table_indexing(self, model):
        # a [510, 256]-style pack: row selected by token count
        pack = np.tile(np.arange(510, dtype=np.float32)[:, None], (1, 16)) / 510.0
        model.voices["packed"] = pack
        c = model.synthesize("abc", voice="packed", seed=0)
        assert np.isfinite(c.samples).all()

    def test_unknown_voice_raises(self, model):
        with pytest.raises(KeyError):
            model.synthesize("hi", voice="nope")

    def test_alignment_total_frames(self, model):
        cfg = model.cfg
        params = model.params
        ids = np.zeros((1, 16), np.int32)
        ids[0, :5] = [0, 9, 10, 11, 0]
        wav, total, pred_dur = kokoro_forward(
            params, cfg, jnp.asarray(ids), jnp.asarray(5, jnp.int32),
            jnp.zeros((1, cfg.style_dim * 2)), jnp.asarray(1.0),
            jax.random.PRNGKey(0), max_frames=48)
        pd = np.asarray(pred_dur)
        assert int(total) == pd[:5].sum()  # only valid tokens contribute
        assert (pd[5:] == 0).all()
        assert (pd[:5] >= 1).all()  # clamp(min=1)

    def test_unload(self):
        m = KokoroTTS.init_random(config_tiny())
        m.unload()
        assert not m.is_loaded


class TestI18nPhonemizers:
    """Multilingual phonemizers (reference: ChinesePhonemizer /
    JapanesePhonemizer / HindiPhonemizer — platform-free table ports)."""

    def test_zh_numbered_pinyin(self):
        from qwen3_asr_swift_tpu.models.kokoro.phonemizer_i18n import phonemize_zh

        out = phonemize_zh("ni3 hao3")
        assert "n" in out and "x" in out        # hao → xau
        assert "↓" in out                        # 3rd tone arrow
        # retroflex initial and its special 'i'
        assert "ʈʂ" in phonemize_zh("zhi1")
        assert "ɨ" in phonemize_zh("shi4")
        assert "↘" in phonemize_zh("shi4")

    def test_zh_hanzi_lexicon(self):
        from qwen3_asr_swift_tpu.models.kokoro.phonemizer_i18n import phonemize_zh

        out = phonemize_zh("你好")
        # 你=ni3 好=hao3 → ni↓ xau↓
        assert out.count("↓") == 2
        assert "x" in out
        # punctuation mapping
        assert phonemize_zh("你好。").endswith(".")

    def test_zh_tone_marked_pinyin(self):
        from qwen3_asr_swift_tpu.models.kokoro.phonemizer_i18n import phonemize_zh

        assert phonemize_zh("mā") == phonemize_zh("ma1")
        assert phonemize_zh("lǜ") == phonemize_zh("lv4")

    def test_ja_kana(self):
        from qwen3_asr_swift_tpu.models.kokoro.phonemizer_i18n import (
            katakana_to_phonemes,
            phonemize_ja,
        )

        assert katakana_to_phonemes("カタカナ") == "katakana"
        assert katakana_to_phonemes("シャ") == "sha"      # digraph before single
        assert katakana_to_phonemes("ッ") == "ʔ"
        assert katakana_to_phonemes("ー") == "ː"
        # hiragana folds to katakana
        assert phonemize_ja("ひらがな") == "hiragana"
        assert phonemize_ja("こんにちは。") == "koɴnichiha."

    def test_hi_devanagari(self):
        from qwen3_asr_swift_tpu.models.kokoro.phonemizer_i18n import (
            devanagari_to_iast,
            phonemize_hi,
        )

        # नमस्ते: na-ma-s(virama)-tē, word-final schwa rules
        iast = devanagari_to_iast("नमस्ते")
        assert iast == "namastē"
        out = phonemize_hi("नमस्ते")
        assert "ə" in out and "t" in out and out.startswith("ˈ")
        # danda maps to period
        assert phonemize_hi("नमस्ते।").endswith(".")

    def test_dispatch_from_phonemize(self):
        out_zh = phonemize("你好", language="zh")
        assert "↓" in out_zh
        out_ja = phonemize("カタカナ", language="ja")
        assert out_ja == "katakana"
        out_hi = phonemize("नमस्ते", language="hi")
        assert "ə" in out_hi


class TestEnglishG2PDepth:
    """Dictionary-first English G2P (reference: Phonemizer.swift:333-455 —
    special cases, gold/silver dicts, voicing-sensitive suffix stemming)."""

    def test_dict_entries_use_valid_symbols(self):
        from qwen3_asr_swift_tpu.models.kokoro.en_dict import EN_GOLD
        from qwen3_asr_swift_tpu.models.kokoro.phonemizer import SYMBOL_TO_ID

        bad = {w: p for w, p in EN_GOLD.items()
               if any(c not in SYMBOL_TO_ID for c in p)}
        assert not bad, f"entries with out-of-vocab symbols: {list(bad.items())[:5]}"

    def test_special_cases(self):
        from qwen3_asr_swift_tpu.models.kokoro.phonemizer import _word_to_phonemes

        assert _word_to_phonemes("the") == "ðə"
        assert _word_to_phonemes("I") == "aɪ"
        assert _word_to_phonemes("an") == "ən"

    def test_plural_voicing(self):
        from qwen3_asr_swift_tpu.models.kokoro.phonemizer import _word_to_phonemes

        assert _word_to_phonemes("cats") == _word_to_phonemes("cat") + "s"     # voiceless
        assert _word_to_phonemes("dogs") == _word_to_phonemes("dog") + "z"     # voiced
        assert _word_to_phonemes("wishes") == _word_to_phonemes("wish") + "ɪz"  # sibilant
        assert _word_to_phonemes("stories") == _word_to_phonemes("story") + "z"

    def test_past_tense_voicing(self):
        from qwen3_asr_swift_tpu.models.kokoro.phonemizer import _word_to_phonemes

        assert _word_to_phonemes("walked") == _word_to_phonemes("walk") + "t"
        assert _word_to_phonemes("played") == _word_to_phonemes("play") + "d"
        assert _word_to_phonemes("wanted") == _word_to_phonemes("want") + "ɪd"
        assert _word_to_phonemes("stopped") == _word_to_phonemes("stop") + "t"  # de-double
        assert _word_to_phonemes("moved") == _word_to_phonemes("move") + "d"    # silent e
        assert _word_to_phonemes("carried") == _word_to_phonemes("carry") + "d"

    def test_ing_forms(self):
        from qwen3_asr_swift_tpu.models.kokoro.phonemizer import _word_to_phonemes

        assert _word_to_phonemes("walking") == _word_to_phonemes("walk") + "ɪŋ"
        assert _word_to_phonemes("sitting") == _word_to_phonemes("sit") + "ɪŋ"

    def test_contractions(self):
        from qwen3_asr_swift_tpu.models.kokoro.phonemizer import phonemize

        out = phonemize("don't, it's, we'll")
        assert "doʊnt" in out and "ɪts" in out and "wiːl" in out

    def test_dictionary_coverage_standard_sentences(self):
        """>90% of tokens on a standard sentence set must resolve through
        the dictionary+stemming tiers (the reference's gold/silver+stem
        coverage bar; letter-to-sound is the last resort)."""
        from qwen3_asr_swift_tpu.models.kokoro.phonemizer import dictionary_hit

        # Harvard-sentences-style everyday test set
        sentences = [
            "The birch canoe slid on the smooth planks",
            "Glue the sheet to the dark blue background",
            "It's easy to tell the depth of a well",
            "These days a chicken leg is a rare dish",
            "Rice is often served in round bowls",
            "The juice of lemons makes fine punch",
            "The box was thrown beside the parked truck",
            "The hogs were fed chopped corn and garbage",
            "Four hours of steady work faced us",
            "A large size in stockings is hard to sell",
            "The boy was there when the sun rose",
            "A rod is used to catch pink salmon",
            "The source of the huge river is the clear spring",
            "Kick the ball straight and follow through",
            "Help the woman get back to her feet",
            "A pot of tea helps to pass the evening",
            "Smoky fires lack flame and heat",
            "The soft cushion broke the man's fall",
            "The salt breeze came across from the sea",
            "The girl at the booth sold fifty bonds",
        ]
        words = [w for s in sentences for w in s.split()]
        hits = sum(dictionary_hit(w) for w in words)
        rate = hits / len(words)
        assert rate > 0.9, f"dictionary coverage {rate:.1%} on {len(words)} tokens"

    def test_load_dictionaries_overlay(self, tmp_path):
        import json

        from qwen3_asr_swift_tpu.models.kokoro import phonemizer as ph

        (tmp_path / "us_gold.json").write_text(json.dumps({
            "zyzzyva": "zˈɪzɪvə",
            "read": {"VERB": "ɹiːd", "DEFAULT": "ɹɛd"},
        }))
        lex = ph.load_dictionaries(tmp_path)
        assert ph._word_to_phonemes("zyzzyva", lex) == "zˈɪzɪvə"
        assert ph._word_to_phonemes("read", lex) == "ɹɛd"  # DEFAULT reading
        assert ph._word_to_phonemes("zyzzyvas", lex) == "zˈɪzɪvəz"  # stems too
        # instance-scoped: module default and other lexicons are untouched
        assert ph._word_to_phonemes("zyzzyva") != "zˈɪzɪvə"
        assert ph._word_to_phonemes("read") == "ɹiːd"
        assert ph._word_to_phonemes("zyzzyva", ph.Lexicon()) != "zˈɪzɪvə"

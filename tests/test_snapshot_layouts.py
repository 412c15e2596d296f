"""Snapshot-layout discovery tests: every ``from_pretrained`` file-finding
path exercised against synthetic local snapshot directories.

The E2E tier (test_e2e_weights.py) needs real checkpoints, which this
environment cannot download — so the *file-discovery* half of loading
(index jsons, sharded safetensors naming, ``.pt``/``.pth``/``.nemo``
candidate ordering, wrapped state-dict unwrapping, voices directories) is
pinned here against fixtures built on the fly, leaving only tensor values
untested until weights appear (reference's two-tier convention,
AGENTS.md:104-121)."""

import json
import tarfile

import numpy as np
import pytest

from qwen3_asr_swift_tpu.core.weights import load_safetensors


def _save_st(path, tensors):
    from safetensors.numpy import save_file

    save_file(tensors, str(path))


class TestSafetensorsDiscovery:
    def test_index_json_selects_shards(self, tmp_path):
        """model.safetensors.index.json routes to exactly the mapped shards
        (an unmapped stray file must NOT load)."""
        _save_st(tmp_path / "model-00001-of-00002.safetensors", {"a": np.zeros(2, np.float32)})
        _save_st(tmp_path / "model-00002-of-00002.safetensors", {"b": np.ones(3, np.float32)})
        _save_st(tmp_path / "stray.safetensors", {"c": np.ones(1, np.float32)})
        (tmp_path / "model.safetensors.index.json").write_text(json.dumps({
            "weight_map": {"a": "model-00001-of-00002.safetensors",
                           "b": "model-00002-of-00002.safetensors"}}))
        flat = load_safetensors(tmp_path)
        assert set(flat) == {"a", "b"}

    def test_no_index_loads_all(self, tmp_path):
        _save_st(tmp_path / "model.safetensors", {"x": np.zeros(2, np.float32)})
        _save_st(tmp_path / "extra.safetensors", {"y": np.ones(2, np.float32)})
        assert set(load_safetensors(tmp_path)) == {"x", "y"}

    def test_empty_dir_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_safetensors(tmp_path)


class TestHubLocalDir:
    def test_local_dir_passthrough(self, tmp_path):
        from qwen3_asr_swift_tpu.core.hub import download_weights

        assert download_weights(str(tmp_path)) == tmp_path

    def test_offline_without_cache_raises(self, tmp_path):
        from qwen3_asr_swift_tpu.core.hub import download_weights

        with pytest.raises(Exception):
            download_weights("nonexistent/model-xyz", cache_dir=str(tmp_path),
                             offline_mode=True)


class TestTorchCheckpointDiscovery:
    def test_enhancement_unwraps_state_dict_and_module_prefix(self, tmp_path):
        import torch

        from qwen3_asr_swift_tpu.models.enhancement.convert import _load_state_dict

        ckpt = tmp_path / "model.ckpt.pth"
        torch.save({"state_dict": {"module.enc.weight": torch.ones(2, 3)}}, str(ckpt))
        sd = _load_state_dict(ckpt)
        assert "enc.weight" in sd and sd["enc.weight"].shape == (2, 3)

    def test_firered_candidate_ordering_prefers_safetensors(self, tmp_path):
        import torch

        from qwen3_asr_swift_tpu.models.firered_vad.convert import _load_state_dict

        torch.save({"model": {"fsmn.weight": torch.zeros(1)}}, str(tmp_path / "model.pt"))
        _save_st(tmp_path / "model.safetensors", {"st.weight": np.zeros(1, np.float32)})
        sd = _load_state_dict(tmp_path)
        assert "st.weight" in sd and "fsmn.weight" not in sd

    def test_campplus_nested_state_dict(self, tmp_path):
        import torch

        from qwen3_asr_swift_tpu.models.speaker.campplus_convert import _load_state_dict

        torch.save({"state_dict": {"module.xvector.weight": torch.ones(4)}},
                   str(tmp_path / "campplus.bin"))
        sd = _load_state_dict(tmp_path)
        assert "xvector.weight" in sd

    def test_voxcpm2_safetensors_fallback_to_pt(self, tmp_path):
        import torch

        from qwen3_asr_swift_tpu.models.voxcpm2.convert import _load_state_dict

        torch.save({"state_dict": {"vae.weight": torch.ones(2)}},
                   str(tmp_path / "pytorch_model.pt"))
        sd = _load_state_dict(tmp_path)
        assert "vae.weight" in sd


class TestNemoArchive:
    def test_nemo_tar_member_discovery(self, tmp_path):
        import torch

        from qwen3_asr_swift_tpu.models.parakeet.convert import _load_state_dict

        inner = tmp_path / "model_weights.ckpt"
        torch.save({"encoder.w": torch.ones(2)}, str(inner))
        with tarfile.open(tmp_path / "parakeet.nemo", "w") as tar:
            tar.add(str(inner), arcname="./model_weights.ckpt")
        inner.unlink()
        sd = _load_state_dict(tmp_path)
        assert "encoder.w" in sd

    def test_missing_everything_raises(self, tmp_path):
        from qwen3_asr_swift_tpu.models.parakeet.convert import _load_state_dict

        with pytest.raises(FileNotFoundError):
            _load_state_dict(tmp_path)


class TestKokoroLayout:
    def test_voices_dir_pt_and_json(self, tmp_path):
        import torch

        from qwen3_asr_swift_tpu.models.kokoro.convert import load_voices

        vdir = tmp_path / "voices"
        vdir.mkdir()
        torch.save(torch.zeros(510, 1, 256), str(vdir / "af_heart.pt"))
        (vdir / "am_echo.json").write_text(json.dumps({"embedding": [0.0] * 512}))
        voices = load_voices(tmp_path)
        assert voices["af_heart"].shape == (510, 256)
        assert voices["am_echo"].shape == (512,)

    def test_no_voices_dir_is_empty(self, tmp_path):
        from qwen3_asr_swift_tpu.models.kokoro.convert import load_voices

        assert load_voices(tmp_path) == {}

    def test_gold_silver_dictionaries_discovered(self, tmp_path):
        from qwen3_asr_swift_tpu.models.kokoro import phonemizer as ph

        (tmp_path / "us_gold.json").write_text(json.dumps({"qqq": "k"}))
        (tmp_path / "us_silver.json").write_text(json.dumps({"zzz": "z"}))
        lex = ph.load_dictionaries(tmp_path)
        assert lex.lookup("qqq") == "k" and lex.lookup("zzz") == "z"
        # instance-scoped: the default lexicon is untouched
        assert ph._lookup("qqq") is None and ph._lookup("zzz") is None


class TestPersonaPlexLayout:
    def test_missing_component_file_is_named(self, tmp_path):
        """The upstream split layout has four required files; a partial
        snapshot must fail naming the missing one, not with a KeyError
        deep inside conversion (WeightLoading.swift:12-90)."""
        from qwen3_asr_swift_tpu.models.personaplex import PersonaPlex

        _save_st(tmp_path / "temporal.safetensors", {"t": np.zeros(1, np.float32)})
        with pytest.raises(FileNotFoundError, match="embeddings.safetensors"):
            PersonaPlex.from_pretrained(str(tmp_path))

"""Qwen3-TTS: host-facing model with a fully on-device generation loop.

TPU-native re-design of the reference's synthesis path
(reference: Sources/Qwen3TTS/Qwen3TTS.swift:107-180 synthesize,
:1401-1528 generateWithCodePredictor, :1195-1330 prompt construction):

- prompt: chat-template text tokens + codec prefix
  [think, think_bos, lang, think_eos, (speaker), pad, bos] with the
  element-wise text/codec overlay;
- generation: talker step → sample codebook-0 (suppress 2048..3071 except
  EOS, temperature/top-k/repetition penalty) → code predictor completes
  codebooks 1..15 → next talker input = (trailing text | tts_pad embed) +
  Σ16 codec embeds. The ENTIRE frame loop runs inside one
  ``lax.while_loop`` — zero host syncs per frame (the reference does one
  GPU sync per frame, Qwen3TTS.swift:1541-1585);
- codec decode: jitted conv graph; streaming via causal chunked decode.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...core import AudioChunk, SpeechGenerationModel
from ...core.logging import inference as log
from ...ops.attention import NEG_INF
from ...tokenizers.bpe import BPETokenizer
from .codec import CodecDecoder, init_codec_params
from .code_predictor import embed_all_groups, init_cp_params, predict_codebooks
from .config import CONFIG_06B, CodecTokens, Qwen3TTSConfig, config_tiny
from .talker import (
    embed_codec,
    embed_text,
    init_talker_params,
    make_talker_cache,
    talker_prefill,
    talker_step,
)


@dataclasses.dataclass(frozen=True)
class TTSSamplingConfig:
    """reference: Sources/Qwen3TTS/Sampling.swift:6-29."""

    temperature: float = 0.9
    top_k: int = 50
    repetition_penalty: float = 1.05
    max_frames: int = 500  # reference caps at 500 (Qwen3TTS.swift:1407)
    rep_window: int = 64


def _round_up(n: int, q: int) -> int:
    return max(q, ((n + q - 1) // q) * q)


class Qwen3TTS(SpeechGenerationModel):
    def __init__(self, cfg: Qwen3TTSConfig, talker_params, cp_params, codec_params,
                 tokenizer: Optional[BPETokenizer] = None, dtype=jnp.bfloat16,
                 speakers: Optional[dict] = None, encoder_params=None,
                 speaker_encoder_params=None, quant_bits: Optional[int] = None,
                 quant_compute: str = "groupdot"):
        # The 12.5 Hz talker+CP frame loop is HBM-bound at batch 1: each
        # frame reads the talker stack once and the CP stack ~16× (prefill
        # + 15 sequential group steps re-read the full 5-layer CP). The
        # published checkpoint is 4-bit (MLX); keeping linears PACKED
        # (ops/quant GEMV) divides that traffic by 4 — the difference
        # between RTF ~0.08 (dense bf16) and ~0.03. ``quant_bits``
        # quantizes a dense tree at load (random-weight benches, fp
        # checkpoints); real 4-bit checkpoints arrive packed from
        # convert.py and are preserved by the quant-aware cast.
        from ...ops.quant import cast_tree
        from .voice_clone import ReferenceAudioCache

        self.cfg = cfg
        self.dtype = dtype
        self.tokenizer = tokenizer
        self.speakers = speakers or {}
        if quant_bits:
            from ...ops.quant import quantize_tree

            talker_params = quantize_tree(talker_params, quant_bits, embed_keys=())
            cp_params = quantize_tree(cp_params, quant_bits, embed_keys=())
        if self._is_quantized(talker_params):
            # fewer, wider dots: q/k/v and gate/up fuse (exact row concat)
            # — the frame loop's many tiny matmuls are DMA-bound, so
            # halving the projection count wins at these shapes
            from ...ops.nn import fuse_qkv_gate_up

            talker_params = fuse_qkv_gate_up(talker_params)
            cp_params = fuse_qkv_gate_up(cp_params)
        if quant_compute == "groupdot":
            # quantized linears (from quant_bits OR a packed checkpoint)
            # repack to the native-s8 group-dot layout: exact weight
            # values, 1 byte/param traffic, no per-call unpack or kernel
            # launches — the CP chain's 16 weight re-reads per frame make
            # this the difference between RTF ~0.08 and ~0.04
            from ...ops.quant import repack_tree_groupdot

            talker_params = repack_tree_groupdot(talker_params)
            cp_params = repack_tree_groupdot(cp_params)
        cast = lambda t: cast_tree(t, dtype)  # noqa: E731 — packed-aware
        self.talker_params = cast(talker_params)
        self.cp_params = cast(cp_params)
        del talker_params, cp_params
        self.codec = CodecDecoder(codec_params, cfg.codec, dtype=jnp.float32)
        self.encoder_params = (jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32),
                                                      encoder_params)
                               if encoder_params is not None else None)
        self.speaker_encoder_params = speaker_encoder_params
        self.ref_cache = ReferenceAudioCache()
        self._loaded = True

        tcfg = cfg.talker
        cpcfg = cfg.code_predictor

        @functools.partial(jax.jit, static_argnames=("p_block", "t_block", "max_frames", "sampling"))
        def _generate(tp, cpp, prefill_embeds, prefill_len, trailing, trail_len, tts_pad_embed, key,
                      *, p_block, t_block, max_frames, sampling: TTSSamplingConfig):
            b = prefill_embeds.shape[0]
            cache = make_talker_cache(tcfg, b, p_block + max_frames, dtype)
            valid = jnp.arange(p_block)[None] < prefill_len[:, None]
            logits, hidden, cache = talker_prefill(tp, tcfg, prefill_embeds, valid, cache)
            last = prefill_len - 1
            logits0 = logits[jnp.arange(b), last]
            hidden0 = hidden[jnp.arange(b), last]

            codes_out = jnp.zeros((b, max_frames, 16), jnp.int32)
            rep_ring = jnp.zeros((b, sampling.rep_window), jnp.int32) - 1

            def sample_code0(lg, ring, k):
                lg = lg.astype(jnp.float32)
                # suppress special range except EOS
                ids = jnp.arange(lg.shape[-1])
                special = (ids >= 2048) & (ids < 3072) & (ids != CodecTokens.EOS)
                lg = jnp.where(special[None], NEG_INF, lg)
                if sampling.repetition_penalty != 1.0:
                    seen = jax.vmap(lambda r: jnp.zeros((lg.shape[-1],), bool).at[jnp.clip(r, 0, None)].max(r >= 0))(ring)
                    lg = jnp.where(seen, jnp.where(lg > 0, lg / sampling.repetition_penalty,
                                                   lg * sampling.repetition_penalty), lg)
                if sampling.top_k > 0:
                    kth = jax.lax.top_k(lg, sampling.top_k)[0][..., -1:]
                    lg = jnp.where(lg < kth, NEG_INF, lg)
                if sampling.temperature > 0:
                    lg = lg / sampling.temperature + jax.random.gumbel(k, lg.shape, dtype=jnp.float32)
                return jnp.argmax(lg, axis=-1).astype(jnp.int32)

            key, k0, k1 = jax.random.split(key, 3)
            code0 = sample_code0(logits0, rep_ring, k0)
            done = code0 == CodecTokens.EOS
            cp_codes = predict_codebooks(cpp, cpcfg, hidden0.astype(dtype),
                                         embed_codec(tp, code0).astype(dtype), k1,
                                         temperature=sampling.temperature, top_k=sampling.top_k)
            frame = jnp.concatenate([code0[:, None], cp_codes], axis=1)  # [B,16]
            codes_out = codes_out.at[:, 0].set(jnp.where(done[:, None], 0, frame))
            rep_ring = rep_ring.at[:, 0].set(jnp.where(done, -1, code0))
            n_frames0 = jnp.where(done, 0, 1)

            def cond(s):
                step, _, _, _, done, _, _, _, _ = s
                return (step < max_frames) & ~jnp.all(done)

            def body(s):
                step, codes_out, rep_ring, cache, done, code0, cp_codes, n_frames, key = s
                # text side: trailing text embed while available, else tts_pad
                t_idx = jnp.clip(step - 1, 0, t_block - 1)
                text_emb = jnp.where(
                    (step - 1 < trail_len)[:, None],
                    trailing[jnp.arange(b), t_idx],
                    tts_pad_embed,
                )
                codec_emb = embed_codec(tp, code0) + embed_all_groups(cpp, cpcfg, cp_codes)
                step_embeds = (text_emb + codec_emb)[:, None].astype(dtype)

                logits, hidden, cache = talker_step(tp, tcfg, step_embeds, cache)
                key, k0, k1 = jax.random.split(key, 3)
                code0_new = sample_code0(logits, rep_ring, k0)
                newly_done = code0_new == CodecTokens.EOS
                cp_new = predict_codebooks(cpp, cpcfg, hidden.astype(dtype),
                                           embed_codec(tp, code0_new).astype(dtype), k1,
                                           temperature=sampling.temperature, top_k=sampling.top_k)
                frame = jnp.concatenate([code0_new[:, None], cp_new], axis=1)
                record = ~done & ~newly_done
                codes_out = codes_out.at[:, jnp.clip(step, 0, max_frames - 1)].set(
                    jnp.where(record[:, None], frame, codes_out[:, jnp.clip(step, 0, max_frames - 1)])
                )
                rep_ring = rep_ring.at[:, step % sampling.rep_window].set(
                    jnp.where(record, code0_new, rep_ring[:, step % sampling.rep_window])
                )
                done = done | newly_done
                n_frames = n_frames + record.astype(jnp.int32)
                return step + 1, codes_out, rep_ring, cache, done, code0_new, cp_new, n_frames, key

            state = (jnp.asarray(1, jnp.int32), codes_out, rep_ring, cache, done, code0,
                     cp_codes, n_frames0, key)
            _, codes_out, _, _, _, _, _, n_frames, _ = jax.lax.while_loop(cond, body, state)
            return codes_out, n_frames

        self._generate = _generate

        # Fused prompt-assembly program: the eager path in
        # _build_prompt_embeds runs ~15 tiny device ops (embed gathers,
        # projections, concats) per synthesize, each paying a dispatch —
        # ~100 ms of pure RPC under the remote tunnel. This program does
        # the whole no-clone/no-instruct assembly in ONE dispatch.
        # text_ids layout: [IM_START, ASSISTANT, NL] + encode(text),
        # zero-padded to text_block (the reference embeds a 5-token chat
        # suffix too, Qwen3TTS.swift:1299-1330, but never reads those
        # rows — they are omitted here entirely).
        @functools.partial(jax.jit, static_argnames=("n_codec", "p_block", "t_block"))
        def _prompt_program(tp, text_ids, n_text, codec_ids, *,
                            n_codec, p_block, t_block):
            emb = embed_text(tp, text_ids, tcfg)              # [1, TB, H]
            codec_embeds = embed_codec(tp, codec_ids)         # [1, n_codec, H]
            specials = embed_text(tp, jnp.asarray(
                [[tcfg.tts_pad_id, tcfg.tts_bos_id, tcfg.tts_eos_id]],
                jnp.int32), tcfg)
            tts_pad, tts_bos, tts_eos = specials[0, 0], specials[0, 1], specials[0, 2]
            overlay = jnp.concatenate(
                [jnp.broadcast_to(tts_pad[None], (n_codec - 2, tts_pad.shape[0])),
                 tts_bos[None]], axis=0)
            combined = overlay[None] + codec_embeds[:, : n_codec - 1]
            role = emb[:, :3]
            first_text = emb[:, 3:4] + codec_embeds[:, -1:]
            prefill = jnp.concatenate([role, combined, first_text], axis=1)
            prefill = jnp.pad(prefill, ((0, 0), (0, p_block - prefill.shape[1]), (0, 0)))
            # trailing = encode(text)[1:] then tts_eos; eos lands at row
            # max(n_enc-1, 0) where n_enc = n_text - 3 (empty text → row 0).
            # Trim/pad to t_block here (static shapes) — no eager slice.
            take = min(t_block, emb.shape[1] - 4)
            trailing = emb[:, 4:4 + take]
            if take < t_block:
                trailing = jnp.pad(trailing, ((0, 0), (0, t_block - take), (0, 0)))
            eos_row = jnp.maximum(n_text - 4, 0)
            trailing = jax.lax.dynamic_update_slice(
                trailing, tts_eos[None, None].astype(trailing.dtype), (0, eos_row, 0))
            return (prefill.astype(dtype), trailing.astype(dtype),
                    tts_pad.astype(dtype))

        self._prompt_program = _prompt_program

    # ------------------------------------------------------------------ #

    @staticmethod
    def _is_quantized(tree) -> bool:
        hit = []

        def walk(n):
            if hit:
                return
            if isinstance(n, dict):
                if "codes" in n:
                    hit.append(True)
                    return
                for v in n.values():
                    walk(v)
            elif isinstance(n, (list, tuple)):
                for v in n:
                    walk(v)

        walk(tree)
        return bool(hit)

    @classmethod
    def init_random(cls, cfg: Optional[Qwen3TTSConfig] = None, seed: int = 0,
                    dtype=jnp.bfloat16, tokenizer=None, **kw) -> "Qwen3TTS":
        from .voice_clone import init_codec_encoder, init_speaker_encoder

        cfg = cfg or CONFIG_06B
        k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(seed), 5)
        return cls(
            cfg,
            init_talker_params(k1, cfg.talker, jnp.float32),
            init_cp_params(k2, cfg.code_predictor, jnp.float32),
            init_codec_params(k3, cfg.codec, jnp.float32),
            tokenizer=tokenizer, dtype=dtype,
            encoder_params=init_codec_encoder(k4, cfg.codec),
            speaker_encoder_params=init_speaker_encoder(k5),
            **kw,
        )

    @classmethod
    def from_pretrained(cls, model_id: str = "aufklarer/Qwen3-TTS-1.7B-MLX-4bit",
                        cache_dir=None, offline_mode: bool = False,
                        progress_handler=None, dtype=jnp.bfloat16, **kw) -> "Qwen3TTS":
        from ...core.hub import download_weights
        from ...core.weights import load_safetensors
        from .convert import convert_tts_checkpoint, detect_tts_config, load_speaker_config

        model_dir = download_weights(
            model_id, cache_dir=cache_dir, offline_mode=offline_mode,
            additional_files=("vocab.json", "merges.txt", "tokenizer_config.json", "config.json"),
        )
        cfg = detect_tts_config(model_id, model_dir)
        tokenizer = BPETokenizer.from_pretrained_dir(model_dir)
        flat = load_safetensors(model_dir)
        from ...core.config import detect_bits

        # dense (non-packed) tensors need the repo's quantization width —
        # hardcoding 4 silently corrupted 8-bit repos' embeddings
        talker, cp, codec = convert_tts_checkpoint(
            flat, cfg, bits=detect_bits(model_id) or 4)
        speakers = load_speaker_config(model_dir)
        return cls(cfg, talker, cp, codec, tokenizer=tokenizer, dtype=dtype,
                   speakers=speakers, **kw)

    # ------------------------------------------------------------------ #

    def _build_prompt_embeds(self, text: str, language: str, speaker: Optional[str],
                             instruct: Optional[str], clone=None):
        """Host-side token assembly; embedding happens in tiny jitted ops
        (reference: buildPrefillEmbeddings, Qwen3TTS.swift:1299-1330).
        ``clone`` = (ref_codes [T,16], ref_text) activates the ICL path
        (reference: Qwen3TTS+ICL.swift:16-243 — the reference transcript
        precedes the target text and the reference's codec frames are
        spliced into the prefill after BOS)."""
        if self.tokenizer is None:
            raise RuntimeError("synthesis requires a tokenizer")
        tk = self.cfg.talker
        IM_START, IM_END, NL, ASSISTANT, USER = (
            tk.im_start_id, tk.im_end_id, tk.nl_id, tk.assistant_id, tk.user_id)
        if clone is not None:
            text = f"{clone[1]} {text}" if clone[1] else text
        text_tokens = [IM_START, ASSISTANT, NL] + self.tokenizer.encode(text) + \
                      [IM_END, NL, IM_START, ASSISTANT, NL]
        oov = max(text_tokens)
        if oov >= tk.text_vocab_size:
            # fail loudly: jnp.take would fill the gather with NaN and the
            # sampler would silently emit code 0 forever
            raise ValueError(f"text token id {oov} >= text_vocab_size "
                             f"{tk.text_vocab_size}; tokenizer does not "
                             f"match this checkpoint's text vocabulary")
        lang_id = CodecTokens.language_id(language) or CodecTokens.LANGUAGES["en"]
        spk_id = self.speakers.get((speaker or "").lower())
        codec_prefix = [CodecTokens.THINK, CodecTokens.THINK_BOS, lang_id, CodecTokens.THINK_EOS]
        if spk_id is not None:
            codec_prefix.append(spk_id)
        codec_prefix += [CodecTokens.PAD, CodecTokens.BOS]

        tp, tcfg = self.talker_params, self.cfg.talker
        text_ids = jnp.asarray(text_tokens, jnp.int32)
        text_embeds = embed_text(tp, text_ids[None], tcfg)  # [1, L, H]
        codec_embeds = embed_codec(tp, jnp.asarray(codec_prefix, jnp.int32)[None])

        special = embed_text(tp, jnp.asarray(
            [tk.tts_pad_id, tk.tts_bos_id, tk.tts_eos_id], jnp.int32)[None], tcfg)
        tts_pad, tts_bos, tts_eos = special[0, 0], special[0, 1], special[0, 2]

        n_codec = len(codec_prefix)
        overlay = jnp.concatenate(
            [jnp.broadcast_to(tts_pad[None], (n_codec - 2, tts_pad.shape[0])), tts_bos[None]], axis=0
        )
        combined = overlay[None] + codec_embeds[:, : n_codec - 1]
        role = text_embeds[:, :3]
        first_text = text_embeds[:, 3:4] + codec_embeds[:, -1:]
        pieces = [role, combined]
        if clone is not None:
            # ICL frames: tts_pad + codec-0 embed + Σ group embeds per frame
            codes = jnp.asarray(clone[0], jnp.int32)          # [T, 16]
            frame = embed_codec(tp, codes[None, :, 0]) \
                + embed_all_groups(self.cp_params, self.cfg.code_predictor,
                                   codes[:, 1:])[None]
            pieces.append((frame + tts_pad[None, None]).astype(text_embeds.dtype))
        pieces.append(first_text)
        if instruct:
            instruct_ids = [IM_START, USER, NL] + self.tokenizer.encode(instruct) + [IM_END, NL]
            if max(instruct_ids) >= tk.text_vocab_size:
                raise ValueError(f"instruct token id {max(instruct_ids)} >= "
                                 f"text_vocab_size {tk.text_vocab_size}")
            pieces.insert(0, embed_text(tp, jnp.asarray(instruct_ids, jnp.int32)[None], tcfg))
        prefill = jnp.concatenate(pieces, axis=1)

        trailing = jnp.concatenate([text_embeds[:, 4:-5], tts_eos[None, None]], axis=1)
        return prefill, trailing, tts_pad

    def _codec_prefix_ids(self, language: str, speaker: Optional[str]) -> List[int]:
        lang_id = CodecTokens.language_id(language) or CodecTokens.LANGUAGES["en"]
        spk_id = self.speakers.get((speaker or "").lower())
        prefix = [CodecTokens.THINK, CodecTokens.THINK_BOS, lang_id, CodecTokens.THINK_EOS]
        if spk_id is not None:
            prefix.append(spk_id)
        prefix += [CodecTokens.PAD, CodecTokens.BOS]
        return prefix

    def _build_prompt_fused(self, text: str, language: str, speaker: Optional[str]):
        """Single-dispatch prompt assembly (no clone/instruct). Returns
        (prefill [1,p_block,H], trailing [1,t_block,H], tts_pad,
        p_len, t_len, p_block, t_block) — prefill/trailing pre-padded and
        cast, ready for :attr:`_generate`."""
        tk = self.cfg.talker
        enc = self.tokenizer.encode(text)
        # trailing IM_END keeps the eager path's empty-text behavior exact:
        # with no encoded text, first_text falls on the chat suffix's first
        # token (and for non-empty text the tts_eos overwrite masks it)
        text_tokens = [tk.im_start_id, tk.assistant_id, tk.nl_id] + enc + [tk.im_end_id]
        oov = max(text_tokens)
        if oov >= tk.text_vocab_size:
            raise ValueError(f"text token id {oov} >= text_vocab_size "
                             f"{tk.text_vocab_size}; tokenizer does not "
                             f"match this checkpoint's text vocabulary")
        codec_prefix = self._codec_prefix_ids(language, speaker)
        n_codec = len(codec_prefix)
        n_text = len(text_tokens) - 1  # role + enc (IM_END excluded from counts)
        p_len = n_codec + 3
        t_len = max(n_text - 3, 1)
        p_block = _round_up(p_len, 32)
        t_block = _round_up(t_len, 32)
        text_block = _round_up(n_text + 1, 32)
        ids = np.zeros((1, text_block), np.int32)
        ids[0, :n_text + 1] = text_tokens
        prefill, trailing, tts_pad = self._prompt_program(
            self.talker_params, jnp.asarray(ids),
            jnp.asarray(n_text, jnp.int32),
            jnp.asarray([codec_prefix], jnp.int32),
            n_codec=n_codec, p_block=p_block, t_block=t_block)
        return prefill, trailing, tts_pad, p_len, t_len, p_block, t_block

    def _generate_device(self, text: str, language: str = "english",
                         speaker: Optional[str] = None,
                         instruct: Optional[str] = None,
                         sampling: Optional[TTSSamplingConfig] = None,
                         seed: int = 0):
        """Run the talker+CP loop; returns DEVICE codes [B, max_frames, 16]
        and n_frames [B] (device) — no host fetch. ``speaker`` may name a
        built-in speaker OR a registered voice clone."""
        sampling = sampling or TTSSamplingConfig()
        clone = self.ref_cache.get(speaker) if speaker else None
        if clone is None and instruct is None and self.tokenizer is not None:
            prefill, trailing, tts_pad, p_len, t_len, p_block, t_block = \
                self._build_prompt_fused(text, language, speaker)
        else:
            prefill, trailing, tts_pad = self._build_prompt_embeds(
                text, language, None if clone else speaker, instruct, clone=clone)
            p_len = prefill.shape[1]
            t_len = trailing.shape[1]
            p_block = _round_up(p_len, 32)
            t_block = _round_up(t_len, 32)
            prefill = jnp.pad(prefill, ((0, 0), (0, p_block - p_len), (0, 0))).astype(self.dtype)
            trailing = jnp.pad(trailing, ((0, 0), (0, t_block - t_len), (0, 0))).astype(self.dtype)
            tts_pad = tts_pad.astype(self.dtype)

        # cap frames: ~proportional to text length (reference scales by text)
        max_frames = min(sampling.max_frames, 500)
        return self._generate(
            self.talker_params, self.cp_params,
            prefill, jnp.asarray([p_len], jnp.int32),
            trailing, jnp.asarray([t_len], jnp.int32),
            tts_pad[None] if tts_pad.ndim == 1 else tts_pad,
            jax.random.PRNGKey(seed),
            p_block=p_block, t_block=t_block, max_frames=max_frames, sampling=sampling,
        )

    def generate_codes(self, text: str, language: str = "english", speaker: Optional[str] = None,
                       instruct: Optional[str] = None, sampling: Optional[TTSSamplingConfig] = None,
                       seed: int = 0):
        """Run the talker+CP loop; returns (codes [16, n_frames], n_frames).
        ``speaker`` may name a built-in speaker OR a registered voice clone."""
        codes, n_frames = self._generate_device(
            text, language, speaker, instruct, sampling, seed)
        n = int(n_frames[0])
        return np.asarray(codes[0, :n].T), n  # [16, n]

    def synthesize(self, text: str, voice: Optional[str] = None, language: str = "english",
                   instruct: Optional[str] = None, sampling: Optional[TTSSamplingConfig] = None,
                   seed: int = 0, max_frames: Optional[int] = None, **kwargs) -> AudioChunk:
        if max_frames is not None:  # convenience alias into the sampling config
            sampling = dataclasses.replace(sampling or TTSSamplingConfig(),
                                           max_frames=max_frames)
        t0 = time.perf_counter()
        codes, n_frames = self._generate_device(
            text, language, voice, instruct, sampling, seed)
        n = int(n_frames[0])  # the one host sync before the codec dispatch
        if n == 0:
            return AudioChunk(np.zeros(0, np.float32), self.cfg.codec.sample_rate)
        wav = self.codec.decode_frames(codes, n)[0]
        dt = time.perf_counter() - t0
        dur = len(wav) / self.cfg.codec.sample_rate
        log.info("tts: %d frames, %.2fs audio, RTF %.3f", n, dur, dt / max(dur, 1e-6))
        return AudioChunk(np.asarray(wav, np.float32), self.cfg.codec.sample_rate)

    def synthesize_stream(self, text: str, voice: Optional[str] = None, language: str = "english",
                          max_frames: Optional[int] = None,
                          instruct: Optional[str] = None,
                          sampling: Optional["TTSSamplingConfig"] = None,
                          seed: int = 0) -> Iterator[AudioChunk]:
        """Same options as :meth:`synthesize` (instruct/sampling/seed were
        previously swallowed silently — a streaming caller lost its style
        instruction and always got seed 0)."""
        if sampling is None and max_frames is not None:
            sampling = dataclasses.replace(TTSSamplingConfig(), max_frames=max_frames)
        codes, n = self.generate_codes(text, language, voice, instruct,
                                       sampling=sampling, seed=seed)
        if n == 0:
            return
        for chunk in self.codec.decode_stream(codes):
            yield AudioChunk(np.asarray(chunk, np.float32), self.cfg.codec.sample_rate)

    # -- voice cloning (reference: Qwen3TTS+ICL.swift, SpeakerEncoder) -----

    def register_voice_clone(self, name: str, audio: np.ndarray, transcript: str = "",
                             sample_rate: int = 24000, max_frames: int = 50) -> None:
        """Encode reference audio to codec tokens and cache it; synthesize
        with ``voice=name`` to clone (reference: ICL cloning — ref codec
        frames + transcript in the prefill)."""
        from ...audio.resample import resample
        from .voice_clone import codec_encode

        if self.encoder_params is None:
            raise RuntimeError("no speech-tokenizer encoder loaded")
        sr = self.cfg.codec.sample_rate
        if sample_rate != sr:
            audio = resample(np.asarray(audio, np.float32), sample_rate, sr)
        codes = codec_encode(self.encoder_params, self.codec.params, self.cfg.codec,
                             jnp.asarray(audio, jnp.float32))
        self.ref_cache.put(name, np.asarray(codes)[:max_frames], transcript)

    def speaker_embedding(self, audio: np.ndarray, sample_rate: int = 16000) -> np.ndarray:
        """ECAPA-style x-vector for speaker similarity (reference:
        SpeakerEncoder.swift)."""
        from ...audio.resample import resample
        from .voice_clone import speaker_embed

        if self.speaker_encoder_params is None:
            raise RuntimeError("no speaker encoder loaded")
        if sample_rate != 16000:
            audio = resample(np.asarray(audio, np.float32), sample_rate, 16000)
        return np.asarray(speaker_embed(self.speaker_encoder_params,
                                        np.asarray(audio, np.float32)))

    def synthesize_batch(self, texts: Sequence[str], language: str = "english",
                         voice: Optional[str] = None, instruct: Optional[str] = None,
                         sampling: Optional[TTSSamplingConfig] = None,
                         seed: int = 0, **kwargs) -> List[AudioChunk]:
        """True batched multi-utterance synthesis (reference:
        synthesizeBatch, Qwen3TTS.swift:633-1002): all prompts pad to
        shared blocks and run the talker/CP loop as ONE program with B
        slots; per-utterance EOS masks out finished slots. Codec decode
        runs per clip at a shared frame bucket."""
        if not texts:
            return []
        sampling = sampling or TTSSamplingConfig()
        clone = self.ref_cache.get(voice) if voice else None
        built = [self._build_prompt_embeds(t, language, None if clone else voice,
                                           instruct, clone=clone) for t in texts]
        b = len(built)
        p_lens = [p.shape[1] for p, _, _ in built]
        t_lens = [tr.shape[1] for _, tr, _ in built]
        p_block = _round_up(max(p_lens), 32)
        t_block = _round_up(max(t_lens), 32)
        prefill = jnp.concatenate(
            [jnp.pad(p, ((0, 0), (0, p_block - p.shape[1]), (0, 0))) for p, _, _ in built],
            axis=0).astype(self.dtype)
        trailing = jnp.concatenate(
            [jnp.pad(tr, ((0, 0), (0, t_block - tr.shape[1]), (0, 0))) for _, tr, _ in built],
            axis=0).astype(self.dtype)
        tts_pad = built[0][2]

        max_frames = min(sampling.max_frames, 500)
        codes, n_frames = self._generate(
            self.talker_params, self.cp_params,
            prefill, jnp.asarray(p_lens, jnp.int32),
            trailing, jnp.asarray(t_lens, jnp.int32),
            tts_pad.astype(self.dtype)[None],
            jax.random.PRNGKey(seed),
            p_block=p_block, t_block=t_block, max_frames=max_frames, sampling=sampling,
        )
        ns = np.asarray(n_frames)
        n_max = int(ns.max())
        if n_max == 0:
            return [AudioChunk(np.zeros(0, np.float32), self.cfg.codec.sample_rate)
                    for _ in range(b)]
        # one batched codec program at the shared frame bucket; per-clip trim
        wavs = self.codec.decode_frames(codes, n_max)
        spf = self.cfg.codec.samples_per_frame
        return [AudioChunk(np.asarray(wavs[i, : int(ns[i]) * spf], np.float32),
                           self.cfg.codec.sample_rate) for i in range(b)]

    def warm_up(self, max_frames: Optional[int] = None) -> None:
        """Compile the programs real requests use: max_frames is a STATIC
        jit argument, so warming with a throwaway small value left the
        first real synthesize() paying the full talker-loop compile."""
        if self.tokenizer is not None:
            mf = max_frames or TTSSamplingConfig().max_frames
            self.synthesize("hi", sampling=TTSSamplingConfig(max_frames=mf))

    def unload(self) -> None:
        self.talker_params = None
        self.cp_params = None
        self.codec = None
        self._loaded = False

    @property
    def is_loaded(self) -> bool:
        return self._loaded

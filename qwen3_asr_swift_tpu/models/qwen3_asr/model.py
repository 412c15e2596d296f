"""Qwen3-ASR: host-facing model — fused audio encode + on-device decode.

TPU-native re-design of the reference's flagship ASR path
(reference: Sources/Qwen3ASR/Qwen3ASR.swift:107-520):

- mel frontend + audio encoder fuse into ONE jitted program per audio
  bucket (the reference runs a CPU frame loop then a lazy GPU graph);
- the chat-template prompt (reference: Qwen3ASR.swift:199-244) is laid out
  statically as [prefix-block | audio-block | suffix-block] with a validity
  mask, so prompt assembly is pure device compute — no dynamic concats;
- greedy/sampled decoding runs entirely inside ``lax.while_loop`` with a
  preallocated KV cache and on-device EOS detection — where the reference
  needed a double-buffered asyncEval pipeline to hide its per-token host
  sync (Qwen3ASR.swift:317-390), here there is no per-token host boundary
  at all;
- everything is batched: ``transcribe_batch`` packs B utterances through
  the same programs.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...audio.companding import (mulaw_decode, mulaw_encode_np,
                                 pcm4_decode, pcm4_encode_np)
from ...audio.resample import resample
from ...core import SpeechRecognitionModel, TranscriptionResult
from ...core.logging import inference as log
from ...ops.mel import MelConfig, log_mel_kernel, num_frames, reflect_pad_np
from ...ops.nn import embedding_lookup, tied_lm_head
from ...ops.sampling import SamplingOptions, log_softmax_confidence, sample_token
from ...tokenizers.bpe import BPETokenizer
from .config import CONFIG_SMALL, Qwen3ASRConfig, detect_config
from .decoder import (decode_step, fuse_for_inference, init_decoder_params,
                      make_cache, prefill, unfuse_for_sharding)
from .encoder import encode, init_encoder_params

# Audio buckets in seconds — multiples of 8 s so mel frames divide the
# 800-frame attention window exactly.
ASR_AUDIO_BUCKETS_S = (8, 16, 32, 64, 128, 320, 640, 1200)


def _round_block(n: int, quantum: int = 32) -> int:
    return max(quantum, ((n + quantum - 1) // quantum) * quantum)


@dataclasses.dataclass
class _StagedBatch:
    """A batch whose wire payload is already on device (see
    :meth:`Qwen3ASR.prestage`). Holding one of these while another batch
    computes is the double-buffering primitive: the transfer happened
    under the previous batch's compute."""

    padded_dev: object
    scales_dev: object  # pcm4 per-block scales; None otherwise
    n_valid_dev: object
    bucket: int
    b: int
    n_req: int
    durations: List[float]
    use_sp: bool
    dp: int
    mp: bool
    sh: object  # batch sharding (dp/mp meshes) or None


class Qwen3ASR(SpeechRecognitionModel):
    """Qwen3-ASR (0.6B / 1.7B) batch transcription."""

    def __init__(
        self,
        cfg: Qwen3ASRConfig,
        encoder_params,
        decoder_params,
        tokenizer: Optional[BPETokenizer] = None,
        dtype=jnp.bfloat16,
        mel_cfg: MelConfig = MelConfig(),
        audio_buckets_s: Sequence[int] = ASR_AUDIO_BUCKETS_S,
        wire_dtype=np.float32,
        kv_dtype=None,
        decode_chunk_tokens: Optional[int] = None,
        quant_compute: str = "packed",
        dispatch_gate=None,
        first_chunk_tokens: int = 8,
    ):
        # host→device audio format: int16 halves PCM transfer (audio is
        # natively 16-bit), "mulaw"/int8 halves it again via G.711 µ-law
        # companding (~38 dB SNR — transparent to the log-mel front-end);
        # decode back to float happens on device inside the jit.
        # kv_dtype=jnp.int8 quantizes the KV cache per slot — decode is
        # HBM-bound and the KV read is the max_len-scaling traffic term
        # (docs/benchmarks.md), so int8 halves it at ~1e-2 logit noise.
        # decode_chunk_tokens bounds each dispatched decode program to N
        # tokens (resumable state between chunks) so concurrent requests
        # interleave at chunk granularity — the serving knob for loaded
        # first-token latency; None = one program per generate.
        # quant_compute="dequant" materializes packed 4/8-bit weights back
        # to dense ``dtype`` at load: same quantized VALUES (token-identical
        # output), dense-matmul execution — wins at batched decode where the
        # packed path's per-call fixed cost dominates; "packed" keeps the
        # 4×-smaller HBM footprint and the GEMV Pallas kernel.
        # dispatch_gate (serving/dispatch.DispatchGate) bounds the device
        # program queue: every encode / decode-chunk dispatch takes a gate
        # slot and syncs (value fetch — block_until_ready returns early over
        # the tunneled backend) before releasing, so a latency-lane request
        # waits out at most ``slots`` running chunks instead of whole queued
        # generates. A request's FIRST decode dispatch (gen_start + up to
        # first_chunk_tokens tokens) rides the latency lane; continuation
        # chunks ride the bulk lane. Gated chunk syncs also fetch ``done``,
        # so the host loop early-exits once every row hit EOS (chunked
        # decode turns EOS into real wall-time savings, not just device
        # while_loop exits). None (default) = ungated async dispatch.
        self.cfg = cfg
        self.dispatch_gate = dispatch_gate
        self.first_chunk_tokens = first_chunk_tokens
        self.decode_chunk_tokens = decode_chunk_tokens
        self.quant_compute = quant_compute
        self.dtype = dtype
        self.kv_dtype = kv_dtype or dtype
        self.mel_cfg = mel_cfg
        self.tokenizer = tokenizer
        # "mulaw" = µ-law int8 (1 B/sample); "pcm4" = block-scaled 4-bit
        # PCM (0.53 B/sample); "dpcm4" = closed-loop 4-bit DPCM
        # (0.55 B/sample, ~5 dB better than pcm4 at the same nibble rate —
        # audio/companding.py). The 4-bit modes are the congested-wire
        # choice: the steady-state floor is transfer-bound, so
        # bytes/sample convert 1:1 into floor throughput.
        self._wire_name = wire_dtype if isinstance(wire_dtype, str) else None
        self._wire4 = wire_dtype in ("pcm4", "dpcm4")
        self.wire_dtype = np.dtype(
            np.uint8 if self._wire4 else (np.int8 if wire_dtype == "mulaw" else wire_dtype))
        self._mesh = None  # set by shard()
        self._spans_processes = False  # multi-host mesh (set by shard())
        self._replicate_out = None
        #: introspection: sharding + per-device shape of the last staged batch
        self.last_staging: dict = {}
        from ...ops.quant import cast_tree

        self.encoder_params = cast_tree(encoder_params, dtype)
        if quant_compute == "dequant":
            from ...ops.quant import dequantize_tree

            decoder_params = dequantize_tree(
                decoder_params, cfg.decoder.bits, cfg.decoder.group_size, dtype)
        # q/k/v and gate/up fuse into single wider projections (exact; the
        # per-call fixed cost of 7 packed matmuls/layer dominated int4
        # batched decode — docs/benchmarks.md). shard() unfuses for TP.
        self.decoder_params = fuse_for_inference(
            cast_tree(decoder_params, dtype), cfg.decoder)
        if quant_compute == "groupdot":
            # third execution mode: codes unpacked ONCE at load to int8,
            # consumed by native s8 MXU dots with per-group rescaling
            # (ops/quant.quant_matmul_groupdot) — exact weight VALUES,
            # 1 byte/param HBM traffic (vs 2 for dequant-dense bf16),
            # no per-call unpack or kernel launches. Single-chip only
            # (shard() refuses; use packed/dequant for TP).
            from ...ops.quant import repack_tree_groupdot

            self.decoder_params = cast_tree(
                repack_tree_groupdot(self.decoder_params), dtype)
        self._audio_buckets_s = tuple(audio_buckets_s)
        # each bucket's mel frames must tile the encoder attention window
        # exactly (100 frames/s; n_window_infer-frame windows) — fail here
        # with the constraint named, not in encode() mid-trace
        win_s = cfg.encoder.n_window_infer / 100
        bad = [s for s in self._audio_buckets_s if (s * 100) % cfg.encoder.n_window_infer]
        if bad:
            raise ValueError(
                f"audio_buckets_s {bad} are not multiples of the encoder "
                f"attention window ({cfg.encoder.n_window_infer} mel frames "
                f"= {win_s:g} s); use multiples of {win_s:g} s")
        self._loaded = True

        def _wire_to_mel(padded_audio, n_valid_frames, n_frames, scales=None):
            """Shared preamble of every encode program: decode the staged
            wire format (µ-law int8 / 4-bit packed / int16 / float) and run
            the mel kernel — ONE implementation so the batch and sp paths
            cannot numerically diverge."""
            if scales is not None:
                from ...audio.companding import dpcm4_decode

                dec4 = dpcm4_decode if self._wire_name == "dpcm4" else pcm4_decode
                padded_audio = dec4(padded_audio, scales)
            elif padded_audio.dtype == jnp.int8:
                padded_audio = mulaw_decode(padded_audio)
            elif padded_audio.dtype == jnp.int16:
                padded_audio = padded_audio.astype(jnp.float32) / 32767.0
            mel = log_mel_kernel(padded_audio, n_valid_frames, self.mel_cfg, n_frames)
            return mel.astype(dtype)

        self._wire_to_mel = _wire_to_mel

        @functools.partial(jax.jit, static_argnames=("n_frames",))
        def _encode_audio(enc_params, padded_audio, n_valid_frames, *, n_frames):
            """reflect-padded audio → mel → encoder tokens. One program."""
            mel = _wire_to_mel(padded_audio, n_valid_frames, n_frames)
            return encode(enc_params, mel, n_valid_frames, self.cfg.encoder)

        self._encode_audio = _encode_audio
        self._encode_audio_sp = None  # set by shard() on a dp>1 mesh
        if self._wire4:
            self._encode_audio_batch = jax.jit(
                jax.vmap(
                    lambda p, a, s, n, n_frames: encode(
                        p, _wire_to_mel(a, n, n_frames, scales=s), n, self.cfg.encoder),
                    in_axes=(None, 0, 0, 0, None),
                ),
                static_argnums=(4,),
            )
        else:
            self._encode_audio_batch = jax.jit(
                jax.vmap(
                    lambda p, a, n, n_frames: _encode_audio(p, a, n, n_frames=n_frames),
                    in_axes=(None, 0, 0, None),
                ),
                static_argnums=(3,),
            )

        @functools.partial(
            jax.jit, static_argnames=("a_pad", "prefix_block", "suffix_block", "max_new", "opts")
        )
        def _gen_start(
            dec_params,
            prefix_ids,      # [B, prefix_block] int32 (0-padded)
            prefix_len,      # [B] int32
            suffix_ids,      # [B, suffix_block] int32
            suffix_len,      # [B] int32
            audio_tokens,    # [B, a_pad, hidden] (encoder output, padded)
            n_audio,         # [B] int32
            key,
            *,
            a_pad: int,
            prefix_block: int,
            suffix_block: int,
            max_new: int,
            opts: SamplingOptions,
        ):
            dcfg = self.cfg.decoder
            b = prefix_ids.shape[0]
            table = dec_params["embed_tokens"]
            emb_prefix = embedding_lookup(table, prefix_ids, dcfg.hidden_size)
            emb_suffix = embedding_lookup(table, suffix_ids, dcfg.hidden_size)
            audio = audio_tokens.astype(emb_prefix.dtype)
            embeds = jnp.concatenate([emb_prefix, audio, emb_suffix], axis=1)

            valid = jnp.concatenate(
                [
                    jnp.arange(prefix_block)[None] < prefix_len[:, None],
                    jnp.arange(a_pad)[None] < n_audio[:, None],
                    jnp.arange(suffix_block)[None] < suffix_len[:, None],
                ],
                axis=1,
            )
            t_prompt = prefix_block + a_pad + suffix_block
            cache = make_cache(dcfg, b, t_prompt + max_new, self.kv_dtype)
            hidden, cache = prefill(dec_params, dcfg, embeds, valid, cache)

            last_idx = prefix_block + a_pad + suffix_len - 1  # [B]
            last_hidden = hidden[jnp.arange(b), last_idx]
            logits = tied_lm_head(last_hidden, table)  # [B, vocab]

            tokens = jnp.full((b, max_new), self.cfg.pad_id, jnp.int32)
            logprobs = jnp.zeros((b, max_new), jnp.float32)

            k0, key = jax.random.split(key)
            tok0 = sample_token(logits, k0, opts, tokens, jnp.zeros((b,), jnp.int32))
            lp0 = log_softmax_confidence(logits, tok0)
            tokens = tokens.at[:, 0].set(tok0)
            logprobs = logprobs.at[:, 0].set(lp0)
            done0 = tok0 == self.cfg.eos_id

            return (jnp.asarray(1, jnp.int32), tokens, logprobs, cache, done0, tok0, key)

        def _chunk_loop(dec_params, state, end, *, opts):
            """Decode while_loop up to step ``end`` (dynamic); plain
            function shared by the jitted chunk program and the fused
            first-response program."""
            dcfg = self.cfg.decoder
            b = state[1].shape[0]

            def cond(state):
                step, _, _, _, done, _, _ = state
                return (step < end) & ~jnp.all(done)

            def body(state):
                step, tokens, logprobs, cache, done, last_tok, key = state
                logits, cache = decode_step(dec_params, dcfg, last_tok, cache)
                kstep, key = jax.random.split(key)
                tok = sample_token(logits, kstep, opts, tokens, jnp.full((b,), step, jnp.int32))
                if opts.force_eos_after:  # bench/test: deterministic stop
                    tok = jnp.where(step >= opts.force_eos_after,
                                    self.cfg.eos_id, tok)
                lp = log_softmax_confidence(logits, tok)
                tok = jnp.where(done, self.cfg.pad_id, tok)
                tokens = tokens.at[:, step].set(jnp.where(done, tokens[:, step], tok))
                logprobs = logprobs.at[:, step].set(jnp.where(done, 0.0, lp))
                done = done | (tok == self.cfg.eos_id)
                return step + 1, tokens, logprobs, cache, done, tok, key

            return jax.lax.while_loop(cond, body, state)

        def _pack_state(state):
            """Pack a decode state's outputs (tokens i32 [B,N], n_gen,
            logprobs f32 bitcast) into one int32 [B, 2N+1] buffer so the
            caller's final sync is ONE device→host fetch instead of three
            RPC round trips (each fetch under load waits behind in-flight
            bulk programs on the tunnel's serialized stream)."""
            _, tokens, logprobs, _, _, _, _ = state
            n_gen = jnp.sum(tokens != self.cfg.pad_id, axis=1)
            lp_bits = jax.lax.bitcast_convert_type(logprobs, jnp.int32)
            return jnp.concatenate([tokens, n_gen[:, None].astype(jnp.int32),
                                    lp_bits], axis=1)

        @functools.partial(jax.jit, static_argnames=("opts",), donate_argnums=(1,))
        def _gen_chunk(dec_params, state, end, *, opts):
            """Jitted resumable chunk: the host loop calls this per chunk,
            so under load a newly arriving request's program interleaves at
            chunk boundaries instead of waiting out one monolithic
            generate (loaded first-token latency). A chunk dispatched
            after all rows hit EOS exits its while_loop immediately.
            Returns (state, packed outputs) — the packed buffer makes the
            LAST chunk's results fetchable without another dispatch."""
            state = _chunk_loop(dec_params, state, end, opts=opts)
            return state, _pack_state(state)

        self._gen_chunk_jit = _gen_chunk

        @functools.partial(jax.jit, static_argnames=(
            "n_frames", "prefix_block", "suffix_block", "first_end",
            "max_new", "opts"))
        def _fused_first(enc_params, dec_params, padded_audio, scales,
                         n_valid_frames, prefix_ids, prefix_len, suffix_ids,
                         suffix_len, key, *, n_frames, prefix_block,
                         suffix_block, first_end, max_new, opts):
            """Encode + prefill + first decode chunk in ONE program.

            Serving fast path for single-clip latency requests: over the
            tunneled backend every host↔device sync waits out whatever
            bulk work is in flight (measured 150-430 ms per sync under
            4-submitter saturation — scripts/diag_loaded_ttft.py), so the
            interactive path's TTFT is proportional to its SYNC COUNT,
            not its compute. One dispatch + one done-fetch replaces the
            encode-fetch + prefill + chunk-fetch sequence."""
            def enc_one(a, s, n):
                mel = _wire_to_mel(a, n, n_frames, scales=s)
                return encode(enc_params, mel, n, self.cfg.encoder)

            if scales is None:
                audio_tokens, n_audio = jax.vmap(
                    lambda a, n: enc_one(a, None, n))(padded_audio, n_valid_frames)
            else:
                audio_tokens, n_audio = jax.vmap(enc_one)(
                    padded_audio, scales, n_valid_frames)
            state = _gen_start(
                dec_params, prefix_ids, prefix_len, suffix_ids, suffix_len,
                audio_tokens, n_audio, key,
                a_pad=audio_tokens.shape[1], prefix_block=prefix_block,
                suffix_block=suffix_block, max_new=max_new, opts=opts)
            if first_end > 1:
                state = _chunk_loop(dec_params, state,
                                    jnp.asarray(first_end, jnp.int32), opts=opts)
            return state, _pack_state(state)

        self._fused_first = _fused_first

        @jax.jit
        def _pack_out(tokens, n_gen, logprobs):
            """Standalone packer for paths whose last program did not
            already pack (ungated async decode, mp replicate)."""
            lp_bits = jax.lax.bitcast_convert_type(logprobs, jnp.int32)
            return jnp.concatenate([tokens, n_gen[:, None].astype(jnp.int32),
                                    lp_bits], axis=1)

        self._pack_out = _pack_out

        def _generate(dec_params, prefix_ids, prefix_len, suffix_ids, suffix_len,
                      audio_tokens, n_audio, key, *, a_pad, prefix_block,
                      suffix_block, max_new, opts, priority=None):
            if opts.beam > 1:
                # beam search: one monolithic program (prefill + while-loop
                # search + length-normalized selection). A quality tool, not
                # the latency path — no chunking; interleaves with other
                # traffic at request granularity via the gate.
                if not opts.is_greedy:
                    raise ValueError(
                        "beam search is deterministic; SamplingOptions(beam=K) "
                        "requires greedy scoring (no temperature/top_k/"
                        "penalties)")
                if opts.force_eos_after:
                    raise ValueError("beam does not support force_eos_after")
                if self._beam_gen is None:
                    from .beam import build_beam_program

                    self._beam_gen = build_beam_program(self)
                from ...serving.dispatch import LATENCY, gate_slot

                prio = LATENCY if priority is None else priority
                with gate_slot(self.dispatch_gate, prio):
                    tokens, n_gen, lps = self._beam_gen(
                        dec_params, prefix_ids, prefix_len, suffix_ids,
                        suffix_len, audio_tokens, n_audio, a_pad=a_pad,
                        prefix_block=prefix_block, suffix_block=suffix_block,
                        max_new=max_new, beam=opts.beam,
                        length_penalty=opts.length_penalty)
                    if self.dispatch_gate is not None:
                        np.asarray(n_gen)  # value fetch = program completed
                return tokens, n_gen, lps, None
            gate = self.dispatch_gate
            chunk = self.decode_chunk_tokens or max_new
            packed = None  # last chunk's packed outputs (device handle)
            if gate is None:
                # async path: dispatch every chunk back-to-back, no host
                # sync until the caller fetches results
                state = _gen_start(
                    dec_params, prefix_ids, prefix_len, suffix_ids, suffix_len,
                    audio_tokens, n_audio, key, a_pad=a_pad, prefix_block=prefix_block,
                    suffix_block=suffix_block, max_new=max_new, opts=opts)
                step = 1
                while step < max_new:
                    end = min(step + chunk, max_new)
                    state, packed = _gen_chunk(dec_params, state,
                                               jnp.asarray(end, jnp.int32), opts=opts)
                    step = end
            else:
                from ...serving.dispatch import BULK, LATENCY

                first_prio = LATENCY if priority is None else priority
                first_end = min(max(self.first_chunk_tokens, 1), max_new)
                with gate.slot(first_prio):
                    state = _gen_start(
                        dec_params, prefix_ids, prefix_len, suffix_ids, suffix_len,
                        audio_tokens, n_audio, key, a_pad=a_pad,
                        prefix_block=prefix_block, suffix_block=suffix_block,
                        max_new=max_new, opts=opts)
                    if first_end > 1:
                        state, packed = _gen_chunk(
                            dec_params, state, jnp.asarray(first_end, jnp.int32),
                            opts=opts)
                    done = np.asarray(state[4])  # value fetch = real sync
                step = first_end
                cont_prio = BULK if priority is None else priority
                while step < max_new and not done.all():
                    end = min(step + chunk, max_new)
                    with gate.slot(cont_prio):
                        state, packed = _gen_chunk(
                            dec_params, state, jnp.asarray(end, jnp.int32), opts=opts)
                        done = np.asarray(state[4])
                    step = end
            _, tokens, logprobs, _, _, _, _ = state
            n_gen = jnp.sum(tokens != self.cfg.pad_id, axis=1)
            return tokens, n_gen, logprobs, packed

        self._generate = _generate
        self._beam_gen = None  # built lazily on the first beam request

    # ------------------------------------------------------------------ #
    # constructors
    # ------------------------------------------------------------------ #

    @classmethod
    def init_random(cls, cfg: Qwen3ASRConfig = CONFIG_SMALL, seed: int = 0,
                    dtype=jnp.bfloat16, tokenizer=None,
                    quant_bits: Optional[int] = None, **kw) -> "Qwen3ASR":
        """Random-weight model (tests, benchmarks without checkpoints).
        ``quant_bits`` packs the decoder linears + embedding into the
        MLX group-64 format to exercise the quantized compute path."""
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        enc = init_encoder_params(k1, cfg.encoder, jnp.float32)
        dec = init_decoder_params(k2, cfg.decoder, jnp.float32)
        if quant_bits:
            from ...ops.quant import quantize_tree

            dec = quantize_tree(dec, quant_bits)
            # keep cfg's source-quantization fields consistent with the
            # actual packing (quant_compute="dequant" reads them)
            cfg = dataclasses.replace(
                cfg, decoder=dataclasses.replace(cfg.decoder, bits=quant_bits,
                                                 group_size=64))
        return cls(cfg, enc, dec, tokenizer=tokenizer, dtype=dtype, **kw)

    @classmethod
    def from_pretrained(
        cls,
        model_id: str = "aufklarer/Qwen3-ASR-0.6B-MLX-4bit",
        cache_dir: Optional[str] = None,
        offline_mode: bool = False,
        progress_handler=None,
        dtype=jnp.bfloat16,
        **kw,
    ) -> "Qwen3ASR":
        from ...core.hub import download_weights
        from ...core.weights import load_safetensors
        from .convert import convert_decoder, convert_encoder

        if progress_handler:
            progress_handler(0.0, "Downloading model...")
        cfg = detect_config(model_id)
        model_dir = download_weights(
            model_id, cache_dir=cache_dir, offline_mode=offline_mode,
            additional_files=("vocab.json", "merges.txt", "tokenizer_config.json"),
            progress_handler=(lambda p: progress_handler(p * 0.8, "Downloading weights...")) if progress_handler else None,
        )
        if progress_handler:
            progress_handler(0.8, "Loading tokenizer...")
        tokenizer = None
        try:
            tokenizer = BPETokenizer.from_pretrained_dir(model_dir)
        except FileNotFoundError:
            log.warning("no tokenizer files in %s — decode will return ids", model_dir)
        if progress_handler:
            progress_handler(0.85, "Converting weights...")
        flat = load_safetensors(model_dir)
        enc = convert_encoder(flat, cfg)
        dec = convert_decoder(flat, cfg)
        if progress_handler:
            progress_handler(1.0, "Ready")
        return cls(cfg, enc, dec, tokenizer=tokenizer, dtype=dtype, **kw)

    # ------------------------------------------------------------------ #
    # inference
    # ------------------------------------------------------------------ #

    def _frames_bucket(self, n_valid: int) -> int:
        per_s = self.mel_cfg.sample_rate // self.mel_cfg.hop_length
        for s in self._audio_buckets_s:
            if n_valid <= s * per_s:
                return s * per_s
        return self._audio_buckets_s[-1] * per_s

    def _prepare_audio(self, audio: np.ndarray, sample_rate: int):
        """Resample + reflect-pad + zero-extend to the bucket. Returns
        (padded_audio [L], n_valid_frames, n_frames_bucket)."""
        if sample_rate != self.mel_cfg.sample_rate:
            audio = resample(audio.astype(np.float32), sample_rate, self.mel_cfg.sample_rate)
        audio = np.atleast_1d(np.asarray(audio, np.float32))
        if len(audio) < 2:  # reflect padding needs ≥2 samples
            audio = np.pad(audio, (0, 2 - len(audio)))
        n_valid = num_frames(self.mel_cfg, len(audio))
        bucket = self._frames_bucket(n_valid)
        if n_valid > bucket:
            # longer than the largest configured bucket: the signal is cut
            # to the bucket — clamp the frame count too (an overcounted
            # n_valid produced phantom encoder tokens) and say so
            log.warning(
                "audio is %.1f s but the largest configured bucket is %.1f s"
                " — transcribing the first %.1f s only (raise audio_buckets_s"
                " or chunk the input)",
                n_valid / 100, bucket / 100, bucket / 100)
            n_valid = bucket
        padded = reflect_pad_np(audio, self.mel_cfg.n_fft // 2)
        need = (bucket - 1) * self.mel_cfg.hop_length + self.mel_cfg.n_fft
        if len(padded) < need:
            padded = np.pad(padded, (0, need - len(padded)))
        else:
            padded = padded[:need]
        return padded, n_valid, bucket

    def _build_prompt(self, language: Optional[str], context: Optional[str]):
        """Host-side chat-template ids around the audio block (injected as
        embeddings, so the ids do not depend on its length)
        (reference: Qwen3ASR.swift:199-233)."""
        c = self.cfg
        enc = (lambda s: self.tokenizer.encode(s)) if self.tokenizer else (lambda s: [])
        prefix = [c.im_start_id, c.system_id, c.newline_id]
        if context:
            prefix += enc(context)
        prefix += [c.eos_id, c.newline_id]  # <|im_end|>\n
        prefix += [c.im_start_id, c.user_id, c.newline_id, c.audio_start_id]
        suffix = [c.audio_end_id, c.eos_id, c.newline_id]
        suffix += [c.im_start_id, c.assistant_id, c.newline_id]
        if language:
            suffix += enc(f"language {language}")
        suffix += [c.asr_text_id]
        return prefix, suffix

    def transcribe(self, audio: np.ndarray, sample_rate: int = 16000,
                   language: Optional[str] = None, context: Optional[str] = None,
                   max_tokens: int = 448, options: Optional[SamplingOptions] = None,
                   priority: Optional[int] = None, timings: Optional[dict] = None,
                   **kwargs) -> TranscriptionResult:
        results = self.transcribe_batch(
            [audio], sample_rate=sample_rate, language=language, context=context,
            max_tokens=max_tokens, options=options, priority=priority,
            timings=timings,
        )
        return results[0]

    def prestage(self, audios: Sequence[np.ndarray], sample_rate: int = 16000) -> "_StagedBatch":
        """Host-prep + device transfer for a batch, decoupled from compute.

        Returns a handle ``transcribe_batch(prestaged=...)`` consumes. A
        serving loop (or bench submitter) calls this for batch N+1 while
        batch N's gated programs run, so the wire transfer rides the
        host↔device link under compute instead of serializing ahead of it
        (the congested-tunnel steady-state floor is transfer-bound)."""
        durations = [len(a) / sample_rate for a in audios]
        n_req = len(audios)

        prepared = [self._prepare_audio(a, sample_rate) for a in audios]
        bucket = max(p[2] for p in prepared)
        need = (bucket - 1) * self.mel_cfg.hop_length + self.mel_cfg.n_fft

        # single long utterance on a sharded model: sequence-parallel encode
        # over the dp axis instead of dp batch splitting (pcm4's two-array
        # wire is plumbed through the batch path only — sp stays int8/f32)
        use_sp = (n_req == 1 and self._encode_audio_sp is not None
                  and not self._wire4
                  and bucket >= 2 * self.cfg.encoder.n_window_infer)

        # data parallelism: on a dp>1 mesh the batch axis is sharded over
        # the dp rows (each device computes B/dp utterances); pad the batch
        # with copies of the last clip so dp divides it (extras discarded)
        dp = self._mesh.shape.get("dp", 1) if self._mesh is not None else 1
        if use_sp:
            dp = 1
        if dp > 1 and n_req % dp:
            prepared = prepared + [prepared[-1]] * (dp - n_req % dp)
        b = len(prepared)

        # single-pass host staging: one preallocated buffer, one wire cast
        scales = None
        pad_to = 2 * 128 if self._wire4 else 1  # pcm4 block alignment
        need_pad = ((need + pad_to - 1) // pad_to) * pad_to
        stage = np.zeros((b, need_pad), np.float32)
        for i, (clip, _, _) in enumerate(prepared):
            stage[i, : len(clip)] = clip[:need]
        if self._wire4:
            if self._wire_name == "dpcm4":
                from ...audio.companding import dpcm4_encode_np

                stage, scales = dpcm4_encode_np(stage)
            else:
                stage, scales = pcm4_encode_np(stage)
        elif self.wire_dtype == np.int8:
            stage = mulaw_encode_np(stage)
        elif self.wire_dtype == np.int16:
            stage = np.round(np.clip(stage, -1.0, 1.0) * 32767.0).astype(np.int16)
        n_valid = np.array([p[1] for p in prepared], np.int32)
        # multi-host (SURVEY §2h DCN half): every process runs this same
        # code with the same global batch; put_global materializes only
        # each process's addressable rows, so dp batches split across
        # hosts and their results ride DCN collectives back
        mp = self._mesh is not None and self._spans_processes
        if dp > 1:
            from ...parallel import batch_sharding, put_global

            sh = batch_sharding(self._mesh)
            put = lambda x: put_global(x, sh)  # noqa: E731
        elif mp:
            from jax.sharding import NamedSharding, PartitionSpec

            from ...parallel import put_global

            sh = NamedSharding(self._mesh, PartitionSpec())
            put = lambda x: put_global(x, sh)  # noqa: E731
        else:
            sh = None
            put = jnp.asarray
        padded_dev = put(stage)
        scales_dev = put(scales) if scales is not None else None
        n_valid_dev = put(n_valid)
        self.last_staging = {
            "batch": b,
            "sharding": str(padded_dev.sharding),
            "per_device_shape": tuple(padded_dev.addressable_shards[0].data.shape),
        }
        return _StagedBatch(padded_dev=padded_dev, scales_dev=scales_dev,
                            n_valid_dev=n_valid_dev, bucket=bucket, b=b,
                            n_req=n_req, durations=durations, use_sp=use_sp,
                            dp=dp, mp=mp, sh=sh)

    def transcribe_batch(self, audios: Optional[Sequence[np.ndarray]] = None,
                         sample_rate: int = 16000,
                         language: Optional[str] = None, context: Optional[str] = None,
                         max_tokens: int = 448, options: Optional[SamplingOptions] = None,
                         seed: int = 0, timings: Optional[dict] = None,
                         priority: Optional[int] = None,
                         prestaged: Optional["_StagedBatch"] = None) -> List[TranscriptionResult]:
        """Transcribe a batch. All clips share one audio bucket (the largest
        needed), one prompt shape, and one compiled decode program.

        ``timings``: pass a dict to receive per-stage wall times with
        device sync at stage boundaries ({host_prep, encode, generate,
        postprocess} seconds).  Syncing costs pipelining, so only request
        timings when profiling.

        ``prestaged``: a handle from :meth:`prestage` — audio is already on
        device; ``audios``/``sample_rate`` are ignored."""
        t_start = time.perf_counter()
        opts = options or SamplingOptions(max_tokens=max_tokens)
        if prestaged is None:
            prestaged = self.prestage(audios, sample_rate)
        st = prestaged
        durations, n_req, bucket, b = st.durations, st.n_req, st.bucket, st.b
        dp, mp, sh, use_sp = st.dp, st.mp, st.sh, st.use_sp
        padded_dev, n_valid_dev = st.padded_dev, st.n_valid_dev
        if dp > 1 or mp:
            from ...parallel import put_global
        if timings is not None:
            jax.block_until_ready(padded_dev)
            timings["host_prep"] = time.perf_counter() - t_start
            t_stage = time.perf_counter()

        # gated dispatch: the encode program takes one dispatch slot (and
        # syncs before releasing it) so it can't stack behind/over other
        # groups' chunks — single requests ride the latency lane
        from ...serving.dispatch import BULK, LATENCY, gate_slot

        enc_prio = priority if priority is not None else (
            LATENCY if n_req == 1 else BULK)

        # single-clip latency fast path: encode+prefill+first-chunk fuse
        # into ONE program (one dispatch, one done-fetch) — under load
        # TTFT is proportional to sync count, not compute (the fused
        # single-clip program is ~45 ms of device time; each extra sync
        # costs a 150-430 ms wait behind in-flight bulk programs)
        if opts.beam > 1 and (dp > 1 or mp):
            raise ValueError("beam decode runs single-chip or TP-sharded; "
                             "dp/multi-process meshes batch greedy decodes "
                             "instead (the beam dim folds into batch)")
        if (self.dispatch_gate is not None and n_req == 1 and dp == 1
                and not mp and not use_sp and timings is None
                and opts.beam <= 1):
            return self._transcribe_fused(st, language, context, opts, seed,
                                          priority, t_start)
        with gate_slot(self.dispatch_gate, enc_prio):
            if use_sp:
                # long single utterance on a sharded model: sequence-parallel
                # encode over the dp axis (bit-identical to the batch path)
                tok, n_tok = self._encode_audio_sp(
                    self.encoder_params, padded_dev[0], n_valid_dev[0], bucket
                )
                audio_tokens, n_audio = tok[None], n_tok[None]
            elif self._wire4:
                audio_tokens, n_audio = self._encode_audio_batch(
                    self.encoder_params, padded_dev, st.scales_dev, n_valid_dev, bucket
                )
            else:
                audio_tokens, n_audio = self._encode_audio_batch(
                    self.encoder_params, padded_dev, n_valid_dev, bucket
                )
            if self.dispatch_gate is not None:
                np.asarray(n_audio)  # value fetch = program completed
        if timings is not None:
            jax.block_until_ready(audio_tokens)
            timings["encode"] = time.perf_counter() - t_stage
            t_stage = time.perf_counter()
        a_pad = audio_tokens.shape[1]

        prefix, suffix = self._build_prompt(language, context)
        pb = _round_block(len(prefix))
        sb = _round_block(len(suffix))
        prefix_ids = np.zeros((b, pb), np.int32)
        prefix_ids[:, : len(prefix)] = prefix
        suffix_ids = np.zeros((b, sb), np.int32)
        suffix_ids[:, : len(suffix)] = suffix
        prefix_len = np.full((b,), len(prefix), np.int32)
        suffix_len = np.full((b,), len(suffix), np.int32)

        if dp > 1 or mp:
            put = lambda x: put_global(x, sh)  # noqa: E731 — batch-dim inputs
        else:
            put = jnp.asarray
        tokens, n_gen, logprobs, packed = self._generate(
            self.decoder_params,
            put(prefix_ids), put(prefix_len),
            put(suffix_ids), put(suffix_len),
            audio_tokens, n_audio,
            jax.random.PRNGKey(seed),
            a_pad=a_pad, prefix_block=pb, suffix_block=sb,
            max_new=opts.max_tokens, opts=opts, priority=priority,
        )
        if timings is not None:
            jax.block_until_ready(tokens)
            timings["generate"] = time.perf_counter() - t_stage
            t_stage = time.perf_counter()
        if mp and dp > 1:
            # dp-sharded outputs live partly on other hosts: replicate over
            # DCN (one all-gather) so every process fetches the full batch
            tokens, n_gen, logprobs = self._replicate_out(tokens, n_gen, logprobs)
            tokens = np.asarray(tokens)
            n_gen = np.asarray(n_gen)
            logprobs = np.asarray(logprobs)
        else:
            # ONE packed fetch instead of three (each fetch under load is
            # an RPC that waits behind in-flight bulk programs); the last
            # decode chunk already packed its outputs in-program
            if packed is None:
                packed = self._pack_out(tokens, n_gen, logprobs)
            tokens, n_gen, logprobs = self._unpack_out(np.asarray(packed))
        if timings is not None:
            timings["postprocess"] = time.perf_counter() - t_stage
        elapsed = time.perf_counter() - t_start
        return self._finalize(tokens, n_gen, logprobs, n_req, durations,
                              language, elapsed)

    @staticmethod
    def _unpack_out(packed: np.ndarray):
        """Host-side inverse of ``_pack_out``."""
        n = (packed.shape[1] - 1) // 2
        tokens = packed[:, :n]
        n_gen = packed[:, n]
        logprobs = packed[:, n + 1:].view(np.float32)
        return tokens, n_gen, logprobs

    def _finalize(self, tokens, n_gen, logprobs, n_req, durations, language,
                  elapsed) -> List[TranscriptionResult]:
        results = []
        for i in range(n_req):
            ids = [t for t in tokens[i, : n_gen[i]].tolist() if t != self.cfg.eos_id]
            if self.tokenizer:
                text = self.tokenizer.decode(ids, skip_special=True)
                if "<asr_text>" in text:
                    text = text.split("<asr_text>", 1)[1].strip()
                text = text.strip()
            else:
                text = " ".join(map(str, ids))
            lp = logprobs[i, : max(n_gen[i], 1)]
            conf = float(np.exp(lp.mean())) if n_gen[i] else 0.0
            results.append(
                TranscriptionResult(
                    text=text, language=language, confidence=conf,
                    duration=durations[i], processing_time=elapsed / n_req,
                )
            )
        return results

    def _transcribe_fused(self, st: "_StagedBatch", language, context, opts,
                          seed, priority, t_start) -> List[TranscriptionResult]:
        """Gated single-clip fast path: one fused
        encode+prefill+first-chunk program, continuation chunks as usual,
        one packed output fetch. See ``_fused_first``."""
        from ...serving.dispatch import BULK, LATENCY, gate_slot

        prefix, suffix = self._build_prompt(language, context)
        pb = _round_block(len(prefix))
        sb = _round_block(len(suffix))
        b = st.b
        prefix_ids = np.zeros((b, pb), np.int32)
        prefix_ids[:, : len(prefix)] = prefix
        suffix_ids = np.zeros((b, sb), np.int32)
        suffix_ids[:, : len(suffix)] = suffix

        max_new = opts.max_tokens
        first_end = min(max(self.first_chunk_tokens, 1), max_new)
        first_prio = LATENCY if priority is None else priority
        with gate_slot(self.dispatch_gate, first_prio):
            state, packed = self._fused_first(
                self.encoder_params, self.decoder_params, st.padded_dev,
                st.scales_dev, st.n_valid_dev,
                jnp.asarray(prefix_ids), jnp.asarray(np.full((b,), len(prefix), np.int32)),
                jnp.asarray(suffix_ids), jnp.asarray(np.full((b,), len(suffix), np.int32)),
                jax.random.PRNGKey(seed), n_frames=st.bucket, prefix_block=pb,
                suffix_block=sb, first_end=first_end, max_new=max_new, opts=opts)
            if first_end >= max_new:
                # no continuation possible: the packed fetch IS the gate
                # sync — the whole request is ONE dispatch + ONE fetch
                packed_np = np.asarray(packed)
            else:
                done = np.asarray(state[4])  # value fetch = program completed
                packed_np = None

        if packed_np is None:
            chunk = self.decode_chunk_tokens or max_new
            step = first_end
            cont_prio = BULK if priority is None else priority
            while step < max_new and not done.all():
                end = min(step + chunk, max_new)
                with gate_slot(self.dispatch_gate, cont_prio):
                    state, packed = self._gen_chunk_jit(
                        self.decoder_params, state, jnp.asarray(end, jnp.int32),
                        opts=opts)
                    done = np.asarray(state[4])
                step = end
            packed_np = np.asarray(packed)
        tokens, n_gen, logprobs = self._unpack_out(packed_np)
        elapsed = time.perf_counter() - t_start
        return self._finalize(tokens, n_gen, logprobs, st.n_req, st.durations,
                              language, elapsed)

    # ------------------------------------------------------------------ #

    def shard(self, mesh=None, dp: Optional[int] = None, tp: Optional[int] = None) -> "Qwen3ASR":
        """Distribute the model over a device mesh (encoder + decoder
        partition rules; quantized params shard too). Returns self.

            model = Qwen3ASR.from_pretrained(...).shard(tp=4)
        """
        from ...parallel import (
            QWEN3_DECODER_RULES,
            QWEN3_ENCODER_RULES,
            make_mesh,
            shard_pytree,
        )

        if self.quant_compute == "groupdot":
            raise ValueError(
                "quant_compute='groupdot' is single-chip (the repacked int8 "
                "layout has no TP partition rules); use 'packed' or "
                "'dequant' for sharded execution")
        mesh = mesh or make_mesh(dp=dp, tp=tp)
        self._mesh = mesh
        from ...parallel import spans_processes

        self._spans_processes = spans_processes(mesh)
        if self._spans_processes:
            from jax.sharding import NamedSharding, PartitionSpec

            self._replicate_out = jax.jit(
                lambda *xs: xs,
                out_shardings=NamedSharding(mesh, PartitionSpec()))
        self.encoder_params = shard_pytree(self.encoder_params, mesh, QWEN3_ENCODER_RULES)
        # TP partitions q/k/v and gate/up per projection: unfuse, shard,
        # and re-fuse only when tp leaves them whole (dp-only meshes).
        dec = unfuse_for_sharding(self.decoder_params, self.cfg.decoder)
        dec = shard_pytree(dec, mesh, QWEN3_DECODER_RULES)
        if mesh.shape.get("tp", 1) == 1:
            dec = fuse_for_inference(dec, self.cfg.decoder)
        self.decoder_params = dec
        if mesh.shape.get("dp", 1) > 1:
            # single long utterances additionally shard the encoder's
            # attention windows over the dp axis (encoder.encode sp_mesh);
            # transcribe_batch routes through this when batch == 1 and the
            # bucket spans multiple windows
            from .encoder import encode as _sp_encode

            def _encode_audio_sp(enc_params, padded_audio, n_valid_frames, n_frames):
                mel = self._wire_to_mel(padded_audio, n_valid_frames, n_frames)
                return _sp_encode(enc_params, mel, n_valid_frames,
                                  self.cfg.encoder, sp_mesh=mesh)

            self._encode_audio_sp = jax.jit(_encode_audio_sp, static_argnums=(3,))
        else:
            self._encode_audio_sp = None
        return self

    def warm_up(self, max_tokens: int = 448, buckets_s: Optional[Sequence[int]] = None) -> None:
        """Compile the programs real requests will use: the decode loop's
        static shape is (bucket, max_tokens), so warming with a throwaway
        config (1 s / 2 tokens) would leave the first real request paying
        full compilation. Defaults to the serving decode budget over the
        smallest bucket; pass ``buckets_s`` to pre-compile more buckets."""
        for s_bucket in (buckets_s or self._audio_buckets_s[:1]):
            silent = np.zeros(self.mel_cfg.sample_rate * int(s_bucket), np.float32)
            self.transcribe(silent, max_tokens=max_tokens)

    def unload(self) -> None:
        self.encoder_params = None
        self.decoder_params = None
        self._loaded = False

    @property
    def is_loaded(self) -> bool:
        return self._loaded

    def memory_stats(self):
        from ...core.types import ModelMemoryStats
        from ...core.weights import param_bytes

        return ModelMemoryStats(
            parameter_bytes=param_bytes(self.encoder_params) + param_bytes(self.decoder_params)
        )

"""On-device beam search vs an independent host-side reference.

The device beam (models/qwen3_asr/beam.py) runs prefill + expansion +
hypothesis reorder inside one jitted while_loop, with the KV cache
gathered along the folded beam axis each step. The host reference here
shares NO cache machinery: every hypothesis is re-scored from scratch by
running the full prefill over (prompt ‖ hypothesis tokens) and reading
the last position's logits — so a cache-reorder bug cannot cancel out.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qwen3_asr_swift_tpu.models.qwen3_asr import Qwen3ASR
from qwen3_asr_swift_tpu.models.qwen3_asr.config import config_tiny
from qwen3_asr_swift_tpu.ops.sampling import SamplingOptions


@pytest.fixture(scope="module")
def model():
    return Qwen3ASR.init_random(
        config_tiny(), dtype=jnp.float32, audio_buckets_s=(8,),
        wire_dtype="mulaw")


def clip(seed, seconds=2):
    rng = np.random.default_rng(seed)
    return (0.1 * rng.standard_normal(16000 * seconds)).astype(np.float32)


def host_beam(model, audio, k, max_new, alpha=1.0):
    """Exhaustive re-forward beam reference (no KV cache reuse)."""
    from qwen3_asr_swift_tpu.models.qwen3_asr.decoder import make_cache, prefill
    from qwen3_asr_swift_tpu.models.qwen3_asr.model import _round_block
    from qwen3_asr_swift_tpu.ops.nn import embedding_lookup, tied_lm_head

    m = model
    dcfg = m.cfg.decoder
    st = m.prestage([audio], 16000)
    audio_tokens, n_audio = m._encode_audio_batch(
        m.encoder_params, st.padded_dev, st.n_valid_dev, st.bucket)
    a_pad = audio_tokens.shape[1]
    prefix, suffix = m._build_prompt(None, None)
    pb, sb = _round_block(len(prefix)), _round_block(len(suffix))
    table = m.decoder_params["embed_tokens"]
    prefix_ids = np.zeros((1, pb), np.int32)
    prefix_ids[0, :len(prefix)] = prefix
    suffix_ids = np.zeros((1, sb), np.int32)
    suffix_ids[0, :len(suffix)] = suffix
    emb_prefix = embedding_lookup(table, jnp.asarray(prefix_ids), dcfg.hidden_size)
    emb_suffix = embedding_lookup(table, jnp.asarray(suffix_ids), dcfg.hidden_size)
    prompt_embeds = jnp.concatenate(
        [emb_prefix, audio_tokens.astype(emb_prefix.dtype), emb_suffix], axis=1)
    valid_prompt = np.concatenate([
        np.arange(pb)[None] < len(prefix),
        np.arange(a_pad)[None] < int(np.asarray(n_audio)[0]),
        np.arange(sb)[None] < len(suffix)], axis=1)

    def next_logp(hyp):
        if hyp:
            ext = embedding_lookup(table, jnp.asarray([hyp], jnp.int32),
                                   dcfg.hidden_size)
            embeds = jnp.concatenate([prompt_embeds, ext.astype(prompt_embeds.dtype)],
                                     axis=1)
            valid = jnp.asarray(np.concatenate(
                [valid_prompt, np.ones((1, len(hyp)), bool)], axis=1))
            idx = embeds.shape[1] - 1
        else:
            embeds = prompt_embeds
            valid = jnp.asarray(valid_prompt)
            idx = pb + a_pad + len(suffix) - 1
        cache = make_cache(dcfg, 1, embeds.shape[1], m.dtype)
        hidden, _ = prefill(m.decoder_params, dcfg, embeds, valid, cache)
        logits = tied_lm_head(hidden[0, idx][None], table)
        return np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), -1))[0]

    eos = m.cfg.eos_id
    lp = next_logp([])
    order = np.argsort(lp)[::-1][:k]
    hyps = [([int(t)], float(lp[t]), int(t) == eos) for t in order]
    for _ in range(1, max_new):
        if all(f for _, _, f in hyps):
            break
        cands = []
        for toks, sc, fin in hyps:
            if fin:
                cands.append((toks, sc, True))
                continue
            lp = next_logp(toks)
            for t in np.argsort(lp)[::-1][:k]:  # each row's top-k covers the global top-k
                cands.append((toks + [int(t)], sc + float(lp[t]), int(t) == eos))
        cands.sort(key=lambda c: -c[1])
        hyps = cands[:k]
    finished = [h for h in hyps if h[2]] or hyps
    best = max(finished, key=lambda h: h[1] / (len(h[0]) ** alpha))
    return " ".join(str(t) for t in best[0] if t != eos)


class TestBeamDecode:
    # first test in the file = the smoke-tier pick (conftest auto-marks
    # it): keep the cheap greedy-equivalence check here, the expensive
    # exhaustive host-reference comparison below
    def test_budget_of_one_smoke(self, model):
        # max_new=1: the while_loop never runs; beam-1-of-K == greedy tok0
        c = clip(seed=9)
        greedy = model.transcribe(c, options=SamplingOptions(max_tokens=1)).text
        beamed = model.transcribe(
            c, options=SamplingOptions(max_tokens=1, beam=4)).text
        assert beamed == greedy

    @pytest.mark.parametrize("k", [2, 4])
    def test_matches_host_reference(self, model, k):
        c = clip(seed=k)
        want = host_beam(model, c, k, max_new=5)
        got = model.transcribe(
            c, options=SamplingOptions(max_tokens=5, beam=k)).text
        assert got == want

    def test_length_penalty_flows_through(self, model):
        c = clip(seed=7)
        for alpha in (0.6, 1.0):
            want = host_beam(model, c, 3, max_new=4, alpha=alpha)
            got = model.transcribe(c, options=SamplingOptions(
                max_tokens=4, beam=3, length_penalty=alpha)).text
            assert got == want

    def test_batched_beam(self, model):
        cs = [clip(seed=11), clip(seed=12)]
        want = [model.transcribe(c, options=SamplingOptions(
            max_tokens=4, beam=3)).text for c in cs]
        got = [r.text for r in model.transcribe_batch(
            cs, options=SamplingOptions(max_tokens=4, beam=3))]
        assert got == want

    def test_rejects_sampling_combination(self, model):
        c = clip(seed=13)
        with pytest.raises(ValueError, match="deterministic"):
            model.transcribe(c, options=SamplingOptions(
                max_tokens=4, beam=3, temperature=0.7))

    def test_beam_score_at_least_greedy(self, model):
        """The greedy path is one admissible hypothesis; with α=1 the beam
        winner's mean per-token logprob (== result confidence, up to exp)
        must be ≥ greedy's whenever both end unfinished at budget (the
        beam kept K≥1 unfinished candidates that dominate greedy) — a
        pure property check, no reference needed."""
        c = clip(seed=17)
        g = model.transcribe(c, options=SamplingOptions(max_tokens=6))
        b = model.transcribe(c, options=SamplingOptions(max_tokens=6, beam=4))
        assert b.confidence >= g.confidence - 1e-5

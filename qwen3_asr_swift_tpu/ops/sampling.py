"""On-device token selection: greedy, temperature (Gumbel-max), repetition
penalty, no-repeat-ngram masking, top-k.

TPU-native analog of the reference's sampler
(reference: Sources/Qwen3ASR/Qwen3ASR.swift:449-520 pickNextToken — which
pulls the full logits vector to the host per token). Here every knob is a
pure jnp transform on device so the decode loop never syncs: the host-side
`.item()` per token becomes an on-device argmax feeding the next step
inside ``lax.while_loop``.

With default options (penalty 1.0, ngram 0, temperature 0) selection is
plain argmax — bit-identical to the reference's greedy fast path
(Qwen3ASR.swift:317-390, including its int32 argmax-dtype invariant: we
cast to int32 explicitly).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class SamplingOptions:
    """Mirrors reference Qwen3DecodingOptions (Qwen3ASR.swift:13-51)."""

    max_tokens: int = 448
    repetition_penalty: float = 1.0
    no_repeat_ngram: int = 0
    temperature: float = 0.0
    top_k: int = 0
    #: benchmark/test knob: force EOS at this decode step (0 = off). Real
    #: checkpoints stop via learned EOS; random-weight benchmarks never do,
    #: so every decode runs its full budget — this plants a deterministic
    #: stop so benched programs exercise the SAME early-exit branch pattern
    #: (device while_loop exit + gated host-loop chunk skip) real weights
    #: produce. Output semantics match a model that emitted EOS there.
    force_eos_after: int = 0
    #: beam width for on-device beam search (0/1 = greedy/sampled decode).
    #: Deterministic: requires greedy scoring (no temperature/top_k/
    #: penalties). models/qwen3_asr/beam.py; closes the BASELINE.json
    #: north-star "greedy/beam" clause (the reference has no beam).
    beam: int = 0
    #: GNMT length penalty α for beam's final hypothesis selection:
    #: score / len**α. 1.0 = plain per-token mean.
    length_penalty: float = 1.0

    @property
    def is_greedy(self) -> bool:
        return (
            self.repetition_penalty == 1.0
            and self.no_repeat_ngram == 0
            and self.temperature == 0.0
            and self.top_k == 0
        )


def apply_repetition_penalty(logits, generated, gen_len, penalty: float):
    """HF-style: logits of already-generated tokens are divided (if >0) or
    multiplied (if <0) by the penalty.

    logits: [B, V] fp32; generated: [B, L] int32 ring of emitted tokens;
    gen_len: [B] or scalar count of valid entries.
    """
    b, v = logits.shape
    l = generated.shape[-1]
    valid = jnp.arange(l)[None, :] < jnp.broadcast_to(jnp.asarray(gen_len), (b,))[:, None]
    # Scatter "seen" flags into a [B, V] mask.
    onehot_sum = jax.vmap(
        lambda g, m: jnp.zeros((v,), jnp.bool_).at[g].max(m)
    )(generated, valid)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(onehot_sum, penalized, logits)


def apply_no_repeat_ngram(logits, generated, gen_len, n: int):
    """Mask tokens that would complete an already-seen n-gram.

    Device formulation: compare the trailing (n-1)-gram against every
    historical (n-1)-gram via a windowed equality reduce — O(L·n) work on
    the VPU, no host sync. generated: [B, L] with valid prefix length
    gen_len."""
    if n <= 0:
        return logits
    b, v = logits.shape
    l = generated.shape[-1]

    def per_item(g, glen, lg):
        # prefix of length n-1 ending at glen
        tail_idx = glen - (n - 1) + jnp.arange(n - 1)
        tail = jnp.where(tail_idx >= 0, g[jnp.clip(tail_idx, 0, l - 1)], -1)

        # window starting at i matches tail iff g[i:i+n-1] == tail; then g[i+n-1] is forbidden
        def body(i, lgx):
            idx = i + jnp.arange(n - 1)
            window = g[jnp.clip(idx, 0, l - 1)]
            complete = (i + n - 1) < glen
            match = jnp.all(window == tail) & complete & (glen >= (n - 1))
            forbidden = g[jnp.clip(i + n - 1, 0, l - 1)]
            return jax.lax.cond(match, lambda x: x.at[forbidden].set(NEG_INF), lambda x: x, lgx)

        return jax.lax.fori_loop(0, l, body, lg)

    return jax.vmap(per_item)(generated, jnp.broadcast_to(jnp.asarray(gen_len), (b,)), logits)


def apply_top_k(logits, k: int):
    if k <= 0:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits, p: float):
    """Nucleus filter: keep the smallest descending-probability prefix
    whose cumulative probability reaches ``p`` (the crossing token
    included), mask the rest to -inf. Renormalization is unnecessary for
    sampling (reference: ChatSampler.swift:79-95)."""
    if p >= 1.0:
        return logits
    desc = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(desc.astype(jnp.float32), axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < p  # prefix up to and including the crossing token
    n_keep = keep.sum(axis=-1, keepdims=True)  # >= 1 always
    cutoff = jnp.take_along_axis(desc, n_keep - 1, axis=-1)
    return jnp.where(logits >= cutoff, logits, NEG_INF)


def sample_token(logits, key, opts: SamplingOptions, generated=None, gen_len=None):
    """Select the next token on device. logits: [B, V] (any float dtype).
    Returns int32 [B]."""
    lg = logits.astype(jnp.float32)
    if opts.repetition_penalty != 1.0 and generated is not None:
        lg = apply_repetition_penalty(lg, generated, gen_len, opts.repetition_penalty)
    if opts.no_repeat_ngram > 0 and generated is not None:
        lg = apply_no_repeat_ngram(lg, generated, gen_len, opts.no_repeat_ngram)
    if opts.top_k > 0:
        lg = apply_top_k(lg, opts.top_k)
    if opts.temperature > 0.0:
        # Gumbel-max: argmax(logits/T + G) ~ Categorical(softmax(logits/T))
        gumbel = jax.random.gumbel(key, lg.shape, dtype=jnp.float32)
        lg = lg / opts.temperature + gumbel
    return jnp.argmax(lg, axis=-1).astype(jnp.int32)


def log_softmax_confidence(logits, token_ids):
    """Per-token log-prob of the selected ids (for word confidences —
    reference: TDTGreedyDecoder.swift:130-138)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, token_ids[..., None], axis=-1)[..., 0]

# SPDX-License-Identifier: Apache-2.0
"""Fused batched sampling.

Reference parity: the reference delegates to mlx-lm ``make_sampler(temp,
top_p, min_p)`` applied to logprobs (``logits - logsumexp``) with filter
order top_k -> top_p -> min_p after temperature scaling
(reference scheduler.py:1321-1325, 825-833), plus a windowed
repetition-penalty logits processor (scheduler.py:2046-2060).

Here sampling is a single device-side op over the whole batch with
*per-slot* parameters, so heterogeneous requests (greedy next to
temp=0.8/top_p=0.9) run in one compiled decode step — no per-request
Python sampler objects on the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

REP_WINDOW = 20  # mlx-lm repetition_context_size default


@jax.tree_util.register_dataclass
@dataclass
class SamplingState:
    """Per-slot sampling parameters + repetition context, device-resident.

    All arrays have leading dim [max_num_seqs]. ``recent_tokens`` is a
    ring buffer of the last REP_WINDOW generated tokens (-1 = empty).
    """

    temperature: jax.Array  # [S] f32, 0 = greedy
    top_k: jax.Array  # [S] i32, 0 = disabled
    top_p: jax.Array  # [S] f32, 1.0 = disabled
    min_p: jax.Array  # [S] f32, 0.0 = disabled
    repetition_penalty: jax.Array  # [S] f32, 1.0 = disabled
    presence_penalty: jax.Array  # [S] f32, 0.0 = disabled
    seed: jax.Array  # [S] i32, -1 = unseeded (fresh randomness per step)
    recent_tokens: jax.Array  # [S, REP_WINDOW] i32, -1 = empty
    recent_head: jax.Array  # [S] i32 ring-buffer write head
    # Bitset of tokens this slot has GENERATED so far (vLLM presence
    # semantics: flat penalty on output tokens, not prompt). One uint32
    # word per 32 vocab ids. Updated only on presence-enabled step
    # variants so presence-free serving pays no extra scatter.
    seen_bits: jax.Array  # [S, ceil(V/32)] u32

    @staticmethod
    def init(max_num_seqs: int, vocab_size: int = 32) -> "SamplingState":
        s = max_num_seqs
        words = -(-vocab_size // 32)
        return SamplingState(
            temperature=jnp.zeros((s,), jnp.float32),
            top_k=jnp.zeros((s,), jnp.int32),
            top_p=jnp.ones((s,), jnp.float32),
            min_p=jnp.zeros((s,), jnp.float32),
            repetition_penalty=jnp.ones((s,), jnp.float32),
            presence_penalty=jnp.zeros((s,), jnp.float32),
            seed=jnp.full((s,), -1, jnp.int32),
            recent_tokens=jnp.full((s, REP_WINDOW), -1, jnp.int32),
            recent_head=jnp.zeros((s,), jnp.int32),
            seen_bits=jnp.zeros((s, words), jnp.uint32),
        )

    def set_slot(
        self,
        slot: int,
        *,
        temperature: float,
        top_k: int,
        top_p: float,
        min_p: float,
        repetition_penalty: float,
        presence_penalty: float = 0.0,
        prompt_tail: Optional[jnp.ndarray] = None,
        seed: int = -1,
    ) -> "SamplingState":
        """Host-side admission: write one slot's params (outside jit)."""
        recent = self.recent_tokens.at[slot].set(-1)
        head = self.recent_head.at[slot].set(0)
        if prompt_tail is not None and prompt_tail.size > 0:
            tail = prompt_tail[-REP_WINDOW:].astype(jnp.int32)
            recent = recent.at[slot, : tail.shape[0]].set(tail)
            head = head.at[slot].set(tail.shape[0] % REP_WINDOW)
        return SamplingState(
            temperature=self.temperature.at[slot].set(temperature),
            top_k=self.top_k.at[slot].set(top_k),
            top_p=self.top_p.at[slot].set(top_p),
            min_p=self.min_p.at[slot].set(min_p),
            repetition_penalty=self.repetition_penalty.at[slot].set(
                repetition_penalty
            ),
            presence_penalty=self.presence_penalty.at[slot].set(
                presence_penalty
            ),
            seed=self.seed.at[slot].set(seed),
            recent_tokens=recent,
            recent_head=head,
            seen_bits=self.seen_bits.at[slot].set(0),
        )


def apply_repetition_penalty(
    logits: jax.Array, state: SamplingState
) -> jax.Array:
    """mlx-lm semantics: for each token in the recent window,
    ``l/p if l > 0 else l*p`` (duplicates read the same source value)."""
    vocab = logits.shape[-1]
    tokens = state.recent_tokens  # [S, W]
    valid = tokens >= 0
    safe = jnp.where(valid, tokens, 0)
    rows = jnp.arange(logits.shape[0])[:, None]
    gathered = logits[rows, safe]
    pen = state.repetition_penalty[:, None]
    adjusted = jnp.where(gathered > 0, gathered / pen, gathered * pen)
    # Route invalid window slots out of bounds so the scatter drops them
    # (otherwise they'd re-write token 0 with its unpenalized value).
    oob = jnp.where(valid, safe, vocab)
    return logits.at[rows, oob].set(adjusted.astype(logits.dtype), mode="drop")


def apply_presence_penalty(
    logits: jax.Array, state: SamplingState
) -> jax.Array:
    """vLLM/OpenAI semantics: flat penalty subtracted from every token the
    request has generated so far (tracked in the ``seen_bits`` bitset)."""
    s, vocab = logits.shape
    words = state.seen_bits.shape[-1]
    bits = (
        state.seen_bits[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)
    ) & jnp.uint32(1)
    seen = bits.reshape(s, words * 32)[:, :vocab].astype(logits.dtype)
    return logits - state.presence_penalty[:, None].astype(logits.dtype) * seen


def advance_repetition_state(
    state: SamplingState,
    tokens: jax.Array,
    active: jax.Array,
    track_presence: bool = False,
) -> SamplingState:
    """Push the newly sampled token into each active slot's ring buffer
    (and, on presence-enabled step variants, into its seen-token bitset)."""
    from dataclasses import replace as _replace

    rows = jnp.arange(tokens.shape[0])
    head = state.recent_head
    new_recent = state.recent_tokens.at[rows, head].set(
        jnp.where(active, tokens.astype(jnp.int32), state.recent_tokens[rows, head])
    )
    new_head = jnp.where(active, (head + 1) % REP_WINDOW, head)
    out = _replace(state, recent_tokens=new_recent, recent_head=new_head)
    if track_presence:
        tok = tokens.astype(jnp.int32)
        word = jnp.minimum(tok >> 5, state.seen_bits.shape[-1] - 1)
        bit = jnp.uint32(1) << (tok & 31).astype(jnp.uint32)
        cur = state.seen_bits[rows, word]
        out = _replace(
            out,
            seen_bits=state.seen_bits.at[rows, word].set(
                jnp.where(active, cur | bit, cur)
            ),
        )
    return out


def sample_tokens(
    logits: jax.Array,  # [S, V] f32
    state: SamplingState,
    rng_key: jax.Array,
    allow_mask: Optional[jax.Array] = None,  # [S, V] bool (constrained decoding)
    greedy_only: bool = False,
    seed_base: Optional[jax.Array] = None,  # PRNG key for seeded rows
    counters: Optional[jax.Array] = None,  # [S] per-row progress counter
    use_presence: bool = False,  # static: apply presence penalty
) -> Tuple[jax.Array, jax.Array]:
    """Sample one token per slot. Returns (tokens [S] i32, logprobs [S] f32).

    logprobs are the log-softmax of the (penalized, masked) logits at the
    chosen token — i.e. the pre-temperature normalized logprobs, matching
    the reference's ``logits - logsumexp`` normalization
    (scheduler.py:825).
    """
    has_penalty = state is not None
    if has_penalty:
        logits = apply_repetition_penalty(logits, state)
        if use_presence:
            logits = apply_presence_penalty(logits, state)
    if allow_mask is not None:
        logits = jnp.where(allow_mask, logits, -jnp.inf)
    logprobs = jax.nn.log_softmax(logits, axis=-1)

    greedy_tok = jnp.argmax(logprobs, axis=-1).astype(jnp.int32)
    if greedy_only:
        chosen_lp = jnp.take_along_axis(
            logprobs, greedy_tok[:, None], axis=-1
        )[:, 0]
        return greedy_tok, chosen_lp

    s, v = logits.shape
    temp = state.temperature
    safe_temp = jnp.where(temp > 0, temp, 1.0)
    x = logprobs / safe_temp[:, None]

    # Full descending sort once; all filters become prefix masks.
    sorted_x, sort_idx = jax.lax.top_k(x, v)
    probs = jax.nn.softmax(sorted_x, axis=-1)
    col = jnp.arange(v)[None, :]
    keep = jnp.ones((s, v), dtype=bool)
    keep &= jnp.where(state.top_k[:, None] > 0, col < state.top_k[:, None], True)
    cum = jnp.cumsum(probs, axis=-1)
    keep &= jnp.where(
        state.top_p[:, None] < 1.0, (cum - probs) < state.top_p[:, None], True
    )
    keep &= jnp.where(
        state.min_p[:, None] > 0.0,
        probs >= state.min_p[:, None] * probs[:, 0:1],
        True,
    )
    keep = keep.at[:, 0].set(True)
    filtered = jnp.where(keep, sorted_x, -jnp.inf)
    # Per-row keys: unseeded rows draw fresh randomness each step;
    # seeded rows (seed >= 0) derive from (seed, per-row counter) only,
    # so a seeded request reproduces its stream regardless of batch
    # composition or step count (OpenAI ``seed`` semantics).
    row_ids = jnp.arange(s, dtype=jnp.uint32)
    step_keys = jax.vmap(lambda r: jax.random.fold_in(rng_key, r))(row_ids)
    if seed_base is not None and counters is not None:
        cnt = counters.astype(jnp.uint32)

        def seeded_key(sd, c):
            return jax.random.fold_in(
                jax.random.fold_in(seed_base, sd.astype(jnp.uint32)), c
            )

        det_keys = jax.vmap(seeded_key)(state.seed, cnt)
        use_seed = (state.seed >= 0)[:, None]
        keys = jnp.where(
            use_seed,
            det_keys.reshape(s, -1),
            step_keys.reshape(s, -1),
        ).reshape(step_keys.shape)
    else:
        keys = step_keys
    sampled_col = jax.vmap(
        lambda k, row: jax.random.categorical(k, row)
    )(keys, filtered)
    sampled_tok = jnp.take_along_axis(sort_idx, sampled_col[:, None], axis=-1)[
        :, 0
    ].astype(jnp.int32)

    tokens = jnp.where(temp > 0, sampled_tok, greedy_tok)
    chosen_lp = jnp.take_along_axis(logprobs, tokens[:, None], axis=-1)[:, 0]
    return tokens, chosen_lp

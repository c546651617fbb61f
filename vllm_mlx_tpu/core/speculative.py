# SPDX-License-Identifier: Apache-2.0
"""Speculative decoding: draft-k proposal + single-forward verification.

The reference implements MTP "always-advance" draft-1/verify-1
speculation as monkey-patches over mlx-lm (reference scheduler.py:699-
1130, mllm_batch_generator.py:2039). Here the algorithm is first-class
and generic over (draft, target) model pairs:

  1. the draft model proposes ``k`` tokens greedily,
  2. the target verifies positions [n .. n+k] in ONE forward,
  3. the longest prefix of draft tokens matching the target's greedy
     choices is accepted, plus one bonus token from the target's logits
     at the first mismatch (so >= 1 token of progress per verify).

Greedy speculation is *lossless*: outputs are token-identical to plain
target-only greedy decoding (proven by test). On the serving engine the
verify forward is exactly a ragged step with q_len = k+1 per sequence
and rollback = kv-length decrement (SURVEY.md §7: "trim = decrement slot
length; block table untouched") — scheduler integration lands with the
MTP-head checkpoints in the next round.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models import decoder

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


@dataclass
class SpecStats:
    drafts: int = 0
    accepted: int = 0
    verify_calls: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / self.drafts if self.drafts else 0.0


def propose_greedy(
    draft_params: Params,
    draft_cfg: ModelConfig,
    seq: List[int],
    k: int,
) -> List[int]:
    """Draft model proposes k greedy continuations of ``seq``."""
    work = list(seq)
    out: List[int] = []
    for _ in range(k):
        logits = decoder.dense_forward(
            draft_params, draft_cfg, jnp.asarray(work)
        )
        nxt = int(jnp.argmax(logits[-1]))
        out.append(nxt)
        work.append(nxt)
    return out


def verify_greedy(
    target_params: Params,
    target_cfg: ModelConfig,
    seq: List[int],
    draft_tokens: List[int],
) -> Tuple[List[int], int]:
    """One target forward over seq+draft; returns (accepted_tokens
    [includes the bonus token], num_draft_accepted).

    The target's greedy choice at position len(seq)-1+i must equal
    draft_tokens[i] for it to be accepted; the first mismatch position
    contributes the target's own token as the bonus.
    """
    k = len(draft_tokens)
    full = list(seq) + draft_tokens
    logits = decoder.dense_forward(target_params, target_cfg, jnp.asarray(full))
    # target predictions at positions len(seq)-1 .. len(seq)-1+k
    preds = np.asarray(
        jnp.argmax(logits[len(seq) - 1 :], axis=-1)
    )  # [k+1]
    accepted: List[int] = []
    n_acc = 0
    for i in range(k):
        if int(preds[i]) == draft_tokens[i]:
            accepted.append(draft_tokens[i])
            n_acc += 1
        else:
            break
    # bonus token: the target's prediction after the last accepted token
    accepted.append(int(preds[n_acc]))
    return accepted, n_acc


def speculative_generate(
    target_params: Params,
    target_cfg: ModelConfig,
    draft_params: Params,
    draft_cfg: ModelConfig,
    prompt: List[int],
    max_tokens: int,
    k: int = 2,
    stop_tokens: Optional[set] = None,
) -> Tuple[List[int], SpecStats]:
    """Greedy speculative decoding loop (token-identical to target-only
    greedy). Dense-forward implementation: the correctness reference for
    the engine's ragged verify step."""
    stop = stop_tokens or set()
    seq = list(prompt)
    out: List[int] = []
    stats = SpecStats()
    while len(out) < max_tokens:
        draft = propose_greedy(
            draft_params, draft_cfg, seq, min(k, max_tokens - len(out))
        )
        stats.drafts += len(draft)
        accepted, n_acc = verify_greedy(
            target_params, target_cfg, seq, draft
        )
        stats.accepted += n_acc
        stats.verify_calls += 1
        for tok in accepted:
            if tok in stop or len(out) >= max_tokens:
                return out, stats
            out.append(tok)
            seq.append(tok)
    return out, stats

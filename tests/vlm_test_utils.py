# SPDX-License-Identifier: Apache-2.0
"""Shared helper for VLM served-greedy identity tests: accept a
divergence from HF generate ONLY where HF's own top-2 logit margin at
the first mismatch is a near-tie (tiny random-weight models produce
ties that legitimately flip under fp32 reassociation — same policy as
the LLM parity harness in test_new_families.py)."""

import numpy as np
import torch


def hf_logits_fn(model, ids, **mm_kwargs):
    """Build the ``hf_logits_at`` closure for :func:`assert_tied_greedy`
    from the same multimodal kwargs the test passed to ``generate``."""

    def hf_logits_at(gen_prefix):
        seq = list(ids) + list(gen_prefix)
        return model(
            input_ids=torch.tensor([seq]),
            attention_mask=torch.ones((1, len(seq)), dtype=torch.long),
            **mm_kwargs,
        ).logits[0, -1]

    return hf_logits_at


def assert_tied_greedy_text(got, ref, model, prompt, eos_ids=()):
    """Text-only variant: served greedy vs HF generate on a tiny
    random-weight model, accepting a divergence only at an HF near-tie
    (same 1e-2 margin policy as the LLM harness in
    test_new_families.py). ``prompt`` is the token-id prompt list."""
    got = list(got)
    ref = list(ref)
    if got == ref:
        return
    eos = set(eos_ids)
    if len(ref) == len(got) + 1 and ref[:-1] == got and ref[-1] in eos:
        return  # HF emits eos; the engine stops on it and excludes it
    i = next(
        (j for j, (a, b) in enumerate(zip(got, ref)) if a != b),
        min(len(got), len(ref)),
    )
    ctx = list(prompt) + ref[:i]
    with torch.no_grad():
        hl = model(torch.tensor([ctx])).logits[0, -1].float()
    top2 = torch.topk(hl, 2).values
    margin = float(top2[0] - top2[1])
    assert margin < 1e-2, (
        f"served greedy diverged from HF at generated token {i} "
        f"with a DECISIVE HF margin {margin}"
    )


def hf_scores_fn(scores):
    """Build ``hf_logits_at`` from HF ``generate(..., output_scores=True,
    return_dict_in_generate=True).scores`` — the exact logits HF's own
    greedy loop decided on (no mask/cache re-derivation needed)."""

    def hf_logits_at(gen_prefix):
        return scores[len(gen_prefix)][0]

    return hf_logits_at


def assert_tied_greedy(
    got, ref, hf_logits_at, margin_tol=1e-2, exclude_ids=()
):
    """``hf_logits_at(gen_prefix)`` -> HF next-token logits [V] given
    the generated prefix appended to the full multimodal prompt.

    ``exclude_ids``: special image-token ids. Random-weight models can
    greedily EMIT the image token mid-generation; HF's forward then
    refuses to re-score the sequence (feature-count check), and HF's
    own cached generate vs a full re-forward disagree past it — so the
    comparison is only meaningful up to the first such emission."""
    got = list(got)[: len(ref)]
    if got == list(ref):
        return
    i = next(
        (j for j, (a, b) in enumerate(zip(got, ref)) if a != b),
        min(len(got), len(ref)),
    )
    if exclude_ids:
        k = next(
            (j for j, t in enumerate(list(ref)[:i]) if t in exclude_ids),
            None,
        )
        if k is not None:
            assert got[:k] == list(ref)[:k]
            return
    with torch.no_grad():
        logits = hf_logits_at(list(ref)[:i]).float()
    top2 = torch.topk(logits, 2).values
    margin = float(top2[0] - top2[1])
    assert margin < margin_tol, (
        f"served greedy diverged from HF at generated token {i} "
        f"({got[i] if i < len(got) else '?'} vs {ref[i]}) with a "
        f"DECISIVE HF margin {margin}"
    )

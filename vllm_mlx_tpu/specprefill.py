# SPDX-License-Identifier: Apache-2.0
"""SpecPrefill: attention-guided sparse prefill (reference
specprefill.py:53-829, after the SpecPrefill paper).

A small DRAFT model reads the full prompt and generates a few lookahead
tokens; the attention of those lookahead queries over the prompt keys
scores every prompt token's importance. The target model then prefills
only the top-k% token chunks — dropping ~70% of prompt tokens cuts
long-prompt TTFT roughly proportionally — while kept tokens retain
their ORIGINAL rotary positions (the serving engine's rope-position
override; KV slots stay compacted).

TPU mapping: the reference monkey-patches mlx attention modules to
capture queries (specprefill.py:128); here the capture is a plain
``attend`` closure over the shared decoder stack — q/k are already
post-RoPE at that point — and scoring is one compiled pass per padded
length bucket.
"""

from __future__ import annotations

import logging
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .models import decoder
from .ops import attention as att

logger = logging.getLogger(__name__)

Params = Dict[str, Any]

_BUCKETS = (256, 512, 1024, 2048, 4096, 8192, 16384, 32768)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if b >= n:
            return b
    return n


def _avg_pool1d(x: jax.Array, kernel: int) -> jax.Array:
    """Same-size centered mean smoothing along the last axis
    (reference specprefill.py:207)."""
    if kernel <= 1:
        return x
    pad = kernel // 2
    padded = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
    prefix = jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (1,), x.dtype), jnp.cumsum(padded, -1)],
        axis=-1,
    )
    return (prefix[..., kernel:] - prefix[..., :-kernel]) / kernel


class SpecPrefillScorer:
    """Holds the draft model + compiled scoring passes."""

    def __init__(self, params: Params, cfg: ModelConfig) -> None:
        self.params = params
        self.cfg = cfg
        self._logits_jits: Dict[int, Any] = {}
        self._score_jits: Dict[int, Any] = {}

    # --------------------------------------------------------------- forward
    def _last_logits(self, params, ids, true_len):
        """Dense forward over a padded bucket; logits of the last REAL
        row (causality makes trailing pad rows irrelevant to it)."""
        logits = decoder.dense_forward(params, self.cfg, ids)
        return logits[true_len - 1]

    def _lookahead(self, tokens: List[int], n_lookahead: int) -> List[int]:
        seq = list(tokens)
        for _ in range(n_lookahead):
            b = _bucket(len(seq))
            fn = self._logits_jits.get(b)
            if fn is None:
                fn = jax.jit(self._last_logits)
                self._logits_jits[b] = fn
            ids = np.zeros(b, np.int32)
            ids[: len(seq)] = seq
            logits = fn(self.params, jnp.asarray(ids), jnp.int32(len(seq)))
            seq.append(int(np.argmax(np.asarray(logits))))
        return seq[len(tokens):]

    def _score_pass(
        self, params, ids, n_prompt, n_lookahead: int, pool_kernel: int
    ):
        """One capture forward: per-layer post-RoPE q at the lookahead
        rows x k at prompt rows -> aggregated importance [padded_prompt].
        Peak memory is one [H, n_lookahead, T] score block (layers are
        reduced with a running max)."""
        cfg = self.cfg
        scale = cfg.attn_scale or cfg.head_dim**-0.5
        captured: List[Tuple[jax.Array, jax.Array]] = []

        def attend(pool, i, q, k, v, sinks=None):
            out = att.dense_causal_attention(
                q, k, v, scale,
                None if cfg.sliding_window is None else cfg.sliding_window,
                cfg.attn_softcap,
            )
            captured.append((q, k))
            return out, pool

        positions = jnp.arange(ids.shape[0])
        decoder._stack(params, cfg, ids, positions, None, attend)

        t_pad = ids.shape[0]
        prompt_mask = jnp.arange(t_pad) < n_prompt
        group = cfg.num_attention_heads // cfg.num_key_value_heads
        running = None
        for q, k in captured:
            # q: [t_pad, H, hd] -> lookahead rows only (static count)
            q_look = jax.lax.dynamic_slice_in_dim(
                q, n_prompt, n_lookahead, axis=0
            ).astype(jnp.float32)  # [n_look, H, hd]
            kx = jnp.repeat(k, group, axis=1).astype(jnp.float32)
            scores = jnp.einsum("lhd,phd->hlp", q_look, kx) * scale
            scores = jnp.where(prompt_mask[None, None, :], scores, -jnp.inf)
            weights = jax.nn.softmax(scores, axis=-1)
            pooled = _avg_pool1d(weights, pool_kernel)
            layer_max = jnp.max(pooled, axis=0)  # [n_look, t_pad]
            running = (
                layer_max if running is None
                else jnp.maximum(running, layer_max)
            )
        return jnp.mean(running, axis=0)  # [t_pad(prompt)]

    def score_tokens(
        self,
        tokens: Sequence[int],
        n_lookahead: int = 8,
        pool_kernel: int = 13,
    ) -> np.ndarray:
        """Per-token importance over the prompt (reference
        specprefill.py:274 ``score_tokens``; lookahead here is greedy
        for reproducibility)."""
        tokens = list(tokens)
        n_prompt = len(tokens)
        look = self._lookahead(tokens, n_lookahead)
        total = tokens + look
        b = _bucket(len(total))
        fn = self._score_jits.get((b, pool_kernel, n_lookahead))
        if fn is None:
            fn = jax.jit(
                self._score_pass,
                static_argnames=("pool_kernel", "n_lookahead"),
            )
            self._score_jits[(b, pool_kernel, n_lookahead)] = fn
        ids = np.zeros(b, np.int32)
        ids[: len(total)] = total
        imp = fn(
            self.params, jnp.asarray(ids), jnp.int32(n_prompt),
            n_lookahead=n_lookahead, pool_kernel=pool_kernel,
        )
        return np.asarray(imp)[:n_prompt]


def select_chunks(
    importance: np.ndarray,
    keep_pct: float = 0.3,
    chunk_size: int = 32,
    backbone_pct: float = 0.0,
) -> np.ndarray:
    """Top-k% chunks by mean importance + optional evenly-spaced
    backbone; tops up until both the chunk and token targets are met
    (reference specprefill.py:399 semantics). Returns sorted indices."""
    m = len(importance)
    if keep_pct >= 1.0:
        return np.arange(m)
    n_chunks = math.ceil(m / chunk_size)
    target_tokens = max(1, math.ceil(m * keep_pct))
    keep_n = max(1, math.ceil(n_chunks * keep_pct))
    backbone_n = math.ceil(n_chunks * backbone_pct) if backbone_pct > 0 else 0
    top_n = max(0, keep_n - backbone_n)

    chunk_scores = [
        float(importance[i * chunk_size : min((i + 1) * chunk_size, m)].mean())
        for i in range(n_chunks)
    ]
    order = sorted(range(n_chunks), key=lambda i: chunk_scores[i],
                   reverse=True)
    selected = set(order[:top_n])
    if backbone_n > 0:
        if backbone_n >= n_chunks:
            selected.update(range(n_chunks))
        else:
            for i in range(backbone_n):
                selected.add(
                    round(i * (n_chunks - 1) / max(1, backbone_n - 1))
                )

    def tok_count(chunks):
        return sum(
            min((c + 1) * chunk_size, m) - c * chunk_size for c in chunks
        )

    for c in order:
        if len(selected) >= keep_n and tok_count(selected) >= target_tokens:
            break
        selected.add(c)

    idx: List[int] = []
    for c in sorted(selected):
        idx.extend(range(c * chunk_size, min((c + 1) * chunk_size, m)))
    return np.asarray(idx, np.int64)


def prune_prompt(
    tokens: Sequence[int],
    scorer: SpecPrefillScorer,
    keep_pct: float = 0.3,
    chunk_size: int = 32,
    backbone_pct: float = 0.05,
    keep_tail: int = 64,
    n_lookahead: int = 8,
) -> Tuple[List[int], np.ndarray, int]:
    """Score + select + prune. Returns (pruned_tokens,
    original_positions [len(pruned)], rope_delta) where
    rope_delta restores original decode positions
    (= len(tokens) - len(pruned))."""
    n = len(tokens)
    importance = scorer.score_tokens(tokens, n_lookahead=n_lookahead)
    idx = set(
        int(i)
        for i in select_chunks(
            importance, keep_pct, chunk_size, backbone_pct
        )
    )
    # recency + anchor: always keep the last tokens (the query the model
    # must answer) and the very first token (attention sink)
    idx.update(range(max(0, n - keep_tail), n))
    idx.add(0)
    kept = sorted(idx)
    pruned = [tokens[i] for i in kept]
    positions = np.asarray(kept, np.int32)
    return pruned, positions, n - len(pruned)

# SPDX-License-Identifier: Apache-2.0
"""Attention-sink math (GPT-OSS): XLA reference path vs direct dense
computation, plus the TPU pallas kernel fork (tpu-marked).

The sink is a learned per-q-head logit joining the softmax denominator
(HF modeling_gpt_oss.py eager_attention_forward); the pallas fork seeds
the flash accumulator with (m, l) = (sink, 1) — see
ops/ragged_sink_kernel.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_mlx_tpu.ops.ragged_attention import (
    interleave_kv,
    ragged_attention_xla,
)


def _setup(rng, t_q=6, kv_len=16, heads=4, kvh=2, hd=16, ps=8):
    """One decode seq (1 token) + one prefill seq (t_q-1 tokens)."""
    n_pages = 8
    q = jnp.asarray(
        rng.standard_normal((t_q, heads, hd), dtype=np.float32)
    )
    pages = jnp.asarray(
        rng.standard_normal((n_pages, ps, 2 * kvh, hd), dtype=np.float32)
    )
    kv_lens = jnp.asarray([kv_len, t_q - 1, 0, 0], jnp.int32)
    page_indices = jnp.zeros((4, 4), jnp.int32)
    page_indices = page_indices.at[0, :2].set(jnp.asarray([1, 2]))
    page_indices = page_indices.at[1, 0].set(3)
    cu_q_lens = jnp.asarray([0, 1, t_q, t_q, t_q], jnp.int32)
    num_seqs = jnp.asarray([2], jnp.int32)
    sinks = jnp.asarray(rng.standard_normal(heads, dtype=np.float32))
    return q, pages, kv_lens, page_indices, cu_q_lens, num_seqs, sinks


def _dense_reference(q, pages, kv_lens, page_indices, cu, ns, sinks, scale):
    """Straightforward per-sequence softmax([scores, sink]) reference."""
    q = np.asarray(q)
    pages = np.asarray(pages)
    heads, hd = q.shape[1], q.shape[2]
    kvh = pages.shape[2] // 2
    group = heads // kvh
    ps = pages.shape[1]
    out = np.zeros_like(q)
    for s in range(int(ns[0])):
        q_start, q_end = int(cu[s]), int(cu[s + 1])
        kv_len = int(kv_lens[s])
        tbl = np.asarray(page_indices)[s]
        kv = pages[tbl].reshape(-1, 2 * kvh, hd)[:kv_len]
        k, v = kv[:, 0::2], kv[:, 1::2]
        q_len = q_end - q_start
        for r in range(q_start, q_end):
            pos = kv_len - q_len + (r - q_start)
            for head in range(heads):
                kh = head // group
                logits = k[: pos + 1, kh] @ q[r, head] * scale
                m = max(logits.max(), float(sinks[head]))
                e = np.exp(logits - m)
                denom = e.sum() + np.exp(float(sinks[head]) - m)
                out[r, head] = (e / denom) @ v[: pos + 1, kh]
    return out


def test_xla_sinks_match_dense(rng):
    q, pages, kv_lens, pi, cu, ns, sinks = _setup(rng)
    got = np.asarray(
        ragged_attention_xla(
            q, pages, kv_lens, pi, cu, ns, 0.25, sinks=sinks
        )
    )
    want = _dense_reference(q, pages, kv_lens, pi, cu, ns, sinks, 0.25)
    np.testing.assert_allclose(got[:6], want[:6], atol=1e-5)


def test_xla_sinks_sliding_window(rng):
    """Sinks compose with sliding windows (GPT-OSS alternating layers)."""
    q, pages, kv_lens, pi, cu, ns, sinks = _setup(rng)
    got = np.asarray(
        ragged_attention_xla(
            q, pages, kv_lens, pi, cu, ns, 0.25,
            sliding_window=4, sinks=sinks,
        )
    )
    assert np.all(np.isfinite(got))
    # vs no-sink: outputs must differ (sink steals probability mass)
    base = np.asarray(
        ragged_attention_xla(
            q, pages, kv_lens, pi, cu, ns, 0.25, sliding_window=4
        )
    )
    assert not np.allclose(got[:6], base[:6])


@pytest.mark.tpu
def test_pallas_sink_kernel_matches_xla(rng):
    """The forked pallas kernel == XLA reference on the real chip."""
    from vllm_mlx_tpu.ops.ragged_sink_kernel import (
        ragged_paged_attention_sinks,
    )

    q, pages, kv_lens, pi, cu, ns, sinks = _setup(
        rng, t_q=8, kv_len=24, heads=8, kvh=8, hd=128, ps=16
    )
    q = q.astype(jnp.bfloat16)
    pages = pages.astype(jnp.bfloat16)
    got = np.asarray(
        ragged_paged_attention_sinks(
            q, pages, kv_lens, pi, cu, ns, sinks,
            sm_scale=0.1,
            num_kv_pages_per_block=2,
            num_queries_per_block=8,
        )
    ).astype(np.float32)
    want = np.asarray(
        ragged_attention_xla(q, pages, kv_lens, pi, cu, ns, 0.1, sinks=sinks)
    ).astype(np.float32)
    np.testing.assert_allclose(got[:8], want[:8], atol=3e-2, rtol=3e-2)

# SPDX-License-Identifier: Apache-2.0
"""Bidirectional-span ragged attention (Gemma3 image runs / PaliGemma
prefix-LM): mask semantics of the XLA reference, the pallas fork on
real TPU, and the scheduler's chunk-clamping invariants.

Reference behavior: HF modeling_gemma3.py builds a token_type_ids-driven
or-mask (image tokens attend bidirectionally within each image run);
the reference repo serves these families through mlx-vlm which builds
the same masks eagerly.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vllm_mlx_tpu.ops.ragged_attention import (
    interleave_kv,
    make_kv_pages,
    ragged_attention_xla,
    write_kv_pages,
)


def _dense_bidir_reference(q, k, v, scale, span, sliding_window=None):
    """O(T^2) dense reference: causal (and window) OR in-span."""
    t = q.shape[0]
    lo, hi = span
    scores = np.einsum("thd,shd->ths", q, k) * scale
    pos = np.arange(t)
    allowed = pos[None, :] <= pos[:, None]
    if sliding_window is not None:
        allowed &= pos[None, :] > pos[:, None] - sliding_window
    in_span = (
        (pos[:, None] >= lo)
        & (pos[:, None] < hi)
        & (pos[None, :] >= lo)
        & (pos[None, :] < hi)
    )
    allowed |= in_span
    scores = np.where(allowed[:, None, :], scores, -np.inf)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    return np.einsum("ths,shd->thd", probs, v)


def _setup(rng, t=24, heads=4, kvh=4, hd=64, ps=8, span=(5, 13)):
    """One sequence, full prompt in one ragged call, span inside."""
    q = rng.standard_normal((t, heads, hd)).astype(np.float32)
    k = rng.standard_normal((t, kvh, hd)).astype(np.float32)
    v = rng.standard_normal((t, kvh, hd)).astype(np.float32)
    n_pages = -(-t // ps) + 2
    pages = make_kv_pages(1, n_pages, ps, kvh, hd, dtype=jnp.float32)[0]
    dest = np.arange(t, dtype=np.int32)
    pages = write_kv_pages(
        pages, interleave_kv(jnp.asarray(k), jnp.asarray(v)),
        jnp.asarray(dest),
    )
    s_max = 4
    kv_lens = np.zeros(s_max, np.int32)
    kv_lens[0] = t
    pi = np.zeros((s_max, n_pages), np.int32)
    pi[0] = np.arange(n_pages)
    cu = np.zeros(s_max + 1, np.int32)
    cu[1:] = t
    lo = np.zeros(s_max, np.int32)
    hi = np.zeros(s_max, np.int32)
    lo[0], hi[0] = span
    return (
        jnp.asarray(q), pages, jnp.asarray(kv_lens), jnp.asarray(pi),
        jnp.asarray(cu), jnp.asarray([1], dtype=jnp.int32),
        jnp.asarray(lo), jnp.asarray(hi), q, k, v,
    )


def test_xla_bidir_matches_dense():
    rng = np.random.default_rng(0)
    span = (5, 13)
    qj, pages, kv_lens, pi, cu, ns, lo, hi, q, k, v = _setup(
        rng, span=span
    )
    got = np.asarray(
        ragged_attention_xla(
            qj, pages, kv_lens, pi, cu, ns, 0.125,
            bidir_lo=lo, bidir_hi=hi,
        )
    )
    want = _dense_bidir_reference(q, k, v, 0.125, span)
    np.testing.assert_allclose(got[:24], want, rtol=2e-5, atol=2e-5)


def test_xla_bidir_differs_from_causal():
    """Rows inside the span must change; rows outside must not."""
    rng = np.random.default_rng(1)
    span = (5, 13)
    qj, pages, kv_lens, pi, cu, ns, lo, hi, *_ = _setup(rng, span=span)
    bidir = np.asarray(
        ragged_attention_xla(
            qj, pages, kv_lens, pi, cu, ns, 0.125,
            bidir_lo=lo, bidir_hi=hi,
        )
    )
    causal = np.asarray(
        ragged_attention_xla(qj, pages, kv_lens, pi, cu, ns, 0.125)
    )
    # last span row attends no future keys -> unchanged; earlier span
    # rows gain future in-span keys -> changed
    np.testing.assert_allclose(bidir[:5], causal[:5], rtol=1e-6)
    np.testing.assert_allclose(bidir[13:24], causal[13:24], rtol=1e-6)
    np.testing.assert_allclose(bidir[12], causal[12], rtol=1e-6)
    assert not np.allclose(bidir[5:12], causal[5:12])


def test_xla_bidir_with_sliding_window():
    """Span un-mask overrides the sliding window too (HF or_mask)."""
    rng = np.random.default_rng(2)
    span = (5, 13)
    qj, pages, kv_lens, pi, cu, ns, lo, hi, q, k, v = _setup(
        rng, span=span
    )
    got = np.asarray(
        ragged_attention_xla(
            qj, pages, kv_lens, pi, cu, ns, 0.125,
            sliding_window=4, bidir_lo=lo, bidir_hi=hi,
        )
    )
    want = _dense_bidir_reference(q, k, v, 0.125, span, sliding_window=4)
    np.testing.assert_allclose(got[:24], want, rtol=2e-5, atol=2e-5)


@pytest.mark.tpu
def test_pallas_bidir_kernel_matches_xla():
    """The forked pallas kernel == XLA reference on the real chip."""
    from vllm_mlx_tpu.ops.ragged_bidir_kernel import (
        ragged_paged_attention_bidir,
    )

    rng = np.random.default_rng(3)
    span = (7, 19)
    qj, pages, kv_lens, pi, cu, ns, lo, hi, *_ = _setup(
        rng, t=40, heads=8, kvh=4, hd=128, ps=16, span=span
    )
    qj = qj.astype(jnp.bfloat16)
    pages = pages.astype(jnp.bfloat16)
    got = np.asarray(
        ragged_paged_attention_bidir(
            qj, pages, kv_lens, pi, cu, ns, lo, hi,
            sm_scale=0.1,
            num_kv_pages_per_block=2,
            num_queries_per_block=8,
        )
    ).astype(np.float32)
    want = np.asarray(
        ragged_attention_xla(
            qj, pages, kv_lens, pi, cu, ns, 0.1,
            bidir_lo=lo, bidir_hi=hi,
        )
    ).astype(np.float32)
    np.testing.assert_allclose(got[:40], want[:40], rtol=2e-2, atol=2e-2)


def test_clamp_chunk_for_bidir():
    from vllm_mlx_tpu.core.scheduler import _clamp_chunk_for_bidir

    spans = [(10, 20), (30, 40)]
    # no overlap: untouched
    assert _clamp_chunk_for_bidir(spans, 0, 10) == 10
    # chunk would cut the first span: clamp to its start
    assert _clamp_chunk_for_bidir(spans, 0, 15) == 10
    # chunk covers span 1 but would cut span 2: clamp at span 2 start
    assert _clamp_chunk_for_bidir(spans, 0, 35) == 30
    # two full spans in one chunk: clamp at the second span's start
    assert _clamp_chunk_for_bidir(spans, 0, 64) == 30
    # resumed exactly at a span start, budget covers it
    assert _clamp_chunk_for_bidir(spans, 10, 10) == 10
    # resumed mid-span (prefix-cache hit), tail fits
    assert _clamp_chunk_for_bidir(spans, 15, 10) == 10
    # resumed mid-span, tail does NOT fit: defer
    assert _clamp_chunk_for_bidir(spans, 15, 3) == 0
    # chunk starting at span start but too small to finish it: defer
    assert _clamp_chunk_for_bidir(spans, 10, 5) == 0
    # chunk past every span
    assert _clamp_chunk_for_bidir(spans, 40, 100) == 100

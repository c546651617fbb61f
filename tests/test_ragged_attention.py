# SPDX-License-Identifier: Apache-2.0
"""Unit tests for the unified ragged paged attention path (XLA reference)."""

import jax.numpy as jnp
import numpy as np

from vllm_mlx_tpu.ops import attention as att
from vllm_mlx_tpu.ops.ragged_attention import (
    interleave_kv,
    make_kv_pages,
    ragged_attention_xla,
    write_kv_pages,
)


def test_write_and_interleave_roundtrip(rng):
    ps, kvh, hd = 8, 2, 16
    pages = make_kv_pages(1, 4, ps, kvh, hd, dtype=jnp.float32)[0]
    k = jnp.asarray(rng.standard_normal((5, kvh, hd), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((5, kvh, hd), dtype=np.float32))
    dest = jnp.asarray(np.array([8, 9, 10, 11, 12]))  # page 1, offsets 0..4
    pages = write_kv_pages(pages, interleave_kv(k, v), dest)
    out = np.asarray(pages)
    np.testing.assert_allclose(out[1, :5, 0::2, :], np.asarray(k))
    np.testing.assert_allclose(out[1, :5, 1::2, :], np.asarray(v))
    # OOB dest is dropped
    pages2 = write_kv_pages(
        pages, interleave_kv(k[:1], v[:1]), jnp.asarray([4 * ps])
    )
    np.testing.assert_allclose(np.asarray(pages2), out)


def test_ragged_matches_dense(rng):
    """Mixed batch (one mid-prefill chunk, one decode, one fresh prefill)
    must equal dense causal attention per sequence."""
    kvh, hd, ps, heads = 2, 16, 8, 4
    pages = make_kv_pages(1, 16, ps, kvh, hd, dtype=jnp.float32)[0]
    s_max, pages_per_seq = 4, 4
    page_indices = np.zeros((s_max, pages_per_seq), np.int32)

    # seq 0: 20 past tokens + chunk of 7 queries
    # seq 1: 11 past tokens + 1 decode query
    # seq 2: fresh prefill of 13 (no past)
    seq_lens_past = [20, 11, 0]
    q_lens = [7, 1, 13]
    full_k, full_v, full_q = [], [], []
    used_page = 1
    dest_rows, all_q = [], []
    for i, (past, qn) in enumerate(zip(seq_lens_past, q_lens)):
        total = past + qn
        n_pages = -(-total // ps)
        pids = list(range(used_page, used_page + n_pages))
        used_page += n_pages
        page_indices[i, : len(pids)] = pids
        k = rng.standard_normal((total, kvh, hd), dtype=np.float32)
        v = rng.standard_normal((total, kvh, hd), dtype=np.float32)
        q = rng.standard_normal((qn, heads, hd), dtype=np.float32)
        full_k.append(k)
        full_v.append(v)
        full_q.append(q)
        # write all tokens' kv (past written "earlier", chunk written now)
        dests = [
            pids[p // ps] * ps + p % ps for p in range(total)
        ]
        pages = write_kv_pages(
            pages,
            interleave_kv(jnp.asarray(k), jnp.asarray(v)),
            jnp.asarray(np.array(dests)),
        )

    q_cat = jnp.asarray(np.concatenate(full_q, axis=0))
    kv_lens = np.array(
        [p + q for p, q in zip(seq_lens_past, q_lens)] + [0], np.int32
    )[:s_max]
    cu = np.zeros(s_max + 1, np.int32)
    for i, qn in enumerate(q_lens):
        cu[i + 1] = cu[i] + qn
    cu[len(q_lens) + 1 :] = cu[len(q_lens)]

    out = ragged_attention_xla(
        q_cat,
        pages,
        jnp.asarray(kv_lens),
        jnp.asarray(page_indices),
        jnp.asarray(cu),
        jnp.asarray([3]),
        hd**-0.5,
    )
    out = np.asarray(out)

    # dense reference per sequence
    row = 0
    for i, (past, qn) in enumerate(zip(seq_lens_past, q_lens)):
        total = past + qn
        qfull = np.zeros((total, heads, hd), np.float32)
        qfull[past:] = full_q[i]
        ref = att.dense_causal_attention(
            jnp.asarray(qfull),
            jnp.asarray(full_k[i]),
            jnp.asarray(full_v[i]),
            hd**-0.5,
        )
        np.testing.assert_allclose(
            out[row : row + qn], np.asarray(ref)[past:], atol=1e-5
        )
        row += qn


def test_ragged_sliding_window(rng):
    kvh, hd, ps, heads, win = 2, 16, 8, 2, 6
    pages = make_kv_pages(1, 8, ps, kvh, hd, dtype=jnp.float32)[0]
    total = 24
    k = rng.standard_normal((total, kvh, hd), dtype=np.float32)
    v = rng.standard_normal((total, kvh, hd), dtype=np.float32)
    q = rng.standard_normal((total, heads, hd), dtype=np.float32)
    pids = [1, 2, 3]
    dests = [pids[p // ps] * ps + p % ps for p in range(total)]
    pages = write_kv_pages(
        pages, interleave_kv(jnp.asarray(k), jnp.asarray(v)),
        jnp.asarray(np.array(dests)),
    )
    page_indices = np.zeros((2, 4), np.int32)
    page_indices[0, :3] = pids
    out = ragged_attention_xla(
        jnp.asarray(q),
        pages,
        jnp.asarray(np.array([total, 0], np.int32)),
        jnp.asarray(page_indices),
        jnp.asarray(np.array([0, total, total], np.int32)),
        jnp.asarray([1]),
        hd**-0.5,
        sliding_window=win,
    )
    ref = att.dense_causal_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), hd**-0.5, window=win
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

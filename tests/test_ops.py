# SPDX-License-Identifier: Apache-2.0
"""Unit tests for core ops: paged attention vs dense, sampling filters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_mlx_tpu.ops import attention as att
from vllm_mlx_tpu.ops import sampling as smp


def _rand_qkv(rng, t, heads, kv_heads, hd):
    q = jnp.asarray(rng.standard_normal((t, heads, hd), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((t, kv_heads, hd), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((t, kv_heads, hd), dtype=np.float32))
    return q, k, v


class TestPagedAttention:
    def test_prefill_matches_dense(self, rng):
        t, heads, kv_heads, hd, bs = 20, 4, 2, 16, 8
        q, k, v = _rand_qkv(rng, t, heads, kv_heads, hd)
        pool = att.make_kv_pool(1, 8, bs, kv_heads, hd, dtype=jnp.float32)
        table = jnp.array([3, 1, 5, 0, 0, 0, 0, 0])
        positions = jnp.arange(t)
        pool = att.write_kv(pool, 0, k, v, table, positions)
        out_paged = att.paged_attention_prefill(q, pool, 0, table, positions, hd**-0.5)
        out_dense = att.dense_causal_attention(q, k, v, hd**-0.5)
        np.testing.assert_allclose(out_paged, out_dense, atol=1e-5)

    def test_chunked_prefill_then_decode_matches_dense(self, rng):
        t, heads, kv_heads, hd, bs = 33, 4, 4, 8, 8
        q, k, v = _rand_qkv(rng, t, heads, kv_heads, hd)
        pool = att.make_kv_pool(1, 8, bs, kv_heads, hd, dtype=jnp.float32)
        table = jnp.array([2, 4, 6, 1, 3, 0, 0, 0])
        # prefill the first 32 tokens in two chunks of 16
        outs = []
        for c0 in (0, 16):
            pos = jnp.arange(c0, c0 + 16)
            pool = att.write_kv(pool, 0, k[c0 : c0 + 16], v[c0 : c0 + 16], table, pos)
            outs.append(
                att.paged_attention_prefill(
                    q[c0 : c0 + 16], pool, 0, table, pos, hd**-0.5
                )
            )
        # decode token 32 via the batched decode path (slot 0 of a batch of 3)
        tables = jnp.stack([table, jnp.zeros_like(table), jnp.zeros_like(table)])
        dec_pos = jnp.array([32, 0, 0])
        pool = att.write_kv_batch(
            pool, 0, jnp.tile(k[32:33], (3, 1, 1)), jnp.tile(v[32:33], (3, 1, 1)),
            tables, jnp.array([32, 0, 0]),
        )
        dec_out = att.paged_attention_decode(
            jnp.tile(q[32:33], (3, 1, 1)), pool, 0, tables, dec_pos, hd**-0.5
        )
        out_paged = jnp.concatenate(outs + [dec_out[:1]], axis=0)
        out_dense = att.dense_causal_attention(q, k, v, hd**-0.5)
        np.testing.assert_allclose(out_paged, out_dense, atol=1e-5)

    def test_sliding_window(self, rng):
        t, heads, kv_heads, hd, bs, win = 24, 2, 2, 8, 8, 8
        q, k, v = _rand_qkv(rng, t, heads, kv_heads, hd)
        pool = att.make_kv_pool(1, 4, bs, kv_heads, hd, dtype=jnp.float32)
        table = jnp.arange(4)
        positions = jnp.arange(t)
        pool = att.write_kv(pool, 0, k, v, table, positions)
        out_paged = att.paged_attention_prefill(
            q, pool, 0, table, positions, hd**-0.5, window=win
        )
        out_dense = att.dense_causal_attention(q, k, v, hd**-0.5, window=win)
        np.testing.assert_allclose(out_paged, out_dense, atol=1e-5)


class TestSampling:
    def _state(self, s=4):
        return smp.SamplingState.init(s)

    def test_greedy(self, rng):
        logits = jnp.asarray(rng.standard_normal((4, 50), dtype=np.float32))
        state = self._state()
        toks, lps = smp.sample_tokens(logits, state, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(toks), np.argmax(logits, axis=-1))
        expected_lp = jax.nn.log_softmax(logits)[np.arange(4), np.asarray(toks)]
        np.testing.assert_allclose(lps, expected_lp, atol=1e-5)

    def test_top_k_restricts_support(self, rng):
        logits = jnp.asarray(rng.standard_normal((4, 100), dtype=np.float32))
        state = self._state()
        for i in range(4):
            state = state.set_slot(
                i, temperature=1.0, top_k=5, top_p=1.0, min_p=0.0,
                repetition_penalty=1.0,
            )
        allowed = np.argsort(-np.asarray(logits), axis=-1)[:, :5]
        for trial in range(20):
            toks, _ = smp.sample_tokens(
                logits, state, jax.random.PRNGKey(trial)
            )
            for i in range(4):
                assert int(toks[i]) in allowed[i]

    def test_top_p_boundary(self):
        # Distribution: probs [0.5, 0.3, 0.15, 0.05]; top_p=0.6 keeps
        # tokens while cumsum-minus-own < 0.6 -> tokens 0 and 1.
        probs = np.array([[0.5, 0.3, 0.15, 0.05]], dtype=np.float32)
        logits = jnp.asarray(np.log(probs))
        state = self._state(1).set_slot(
            0, temperature=1.0, top_k=0, top_p=0.6, min_p=0.0,
            repetition_penalty=1.0,
        )
        seen = set()
        for trial in range(50):
            toks, _ = smp.sample_tokens(logits, state, jax.random.PRNGKey(trial))
            seen.add(int(toks[0]))
        assert seen <= {0, 1}
        assert 0 in seen

    def test_min_p(self):
        probs = np.array([[0.6, 0.3, 0.05, 0.05]], dtype=np.float32)
        logits = jnp.asarray(np.log(probs))
        state = self._state(1).set_slot(
            0, temperature=1.0, top_k=0, top_p=1.0, min_p=0.2,
            repetition_penalty=1.0,
        )
        for trial in range(50):
            toks, _ = smp.sample_tokens(logits, state, jax.random.PRNGKey(trial))
            assert int(toks[0]) in (0, 1)  # 0.05 < 0.2*0.6

    def test_repetition_penalty(self):
        logits = jnp.asarray(np.array([[2.0, 1.0, -1.0, 0.5]], dtype=np.float32))
        state = self._state(1).set_slot(
            0, temperature=0.0, top_k=0, top_p=1.0, min_p=0.0,
            repetition_penalty=10.0,
            prompt_tail=jnp.array([0, 2]),
        )
        penalized = smp.apply_repetition_penalty(logits, state)
        np.testing.assert_allclose(
            np.asarray(penalized)[0], [0.2, 1.0, -10.0, 0.5], atol=1e-6
        )
        # greedy after penalty picks token 1
        toks, _ = smp.sample_tokens(logits, state, jax.random.PRNGKey(0))
        assert int(toks[0]) == 1

    def test_advance_repetition_ring(self):
        state = self._state(2)
        for step in range(smp.REP_WINDOW + 3):
            state = smp.advance_repetition_state(
                state, jnp.array([step, 100 + step]), jnp.array([True, False])
            )
        recent = np.asarray(state.recent_tokens)
        assert set(recent[0]) == set(range(3, smp.REP_WINDOW + 3))
        assert (recent[1] == -1).all()

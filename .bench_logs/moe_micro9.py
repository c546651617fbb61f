# SPDX-License-Identifier: Apache-2.0
"""After-fetch (true-sync) per-layer anatomy with CSE-proof chains:
 a: 12-chain, DIFFERENT topk per layer, current sorted routing
 b: 12-chain, DIFFERENT topk per layer, NO-SORT token-major routing
 c: routing-chain-only 12-chain (sorted, no kernel)
All measured after an np.asarray readback so numbers are real.
Also verifies no-sort output == sorted output.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from vllm_mlx_tpu.ops.moe_quant_pallas import (
    _block_map,
    _gathered_swiglu_call,
    _pick_block,
    quantize_expert_stack,
    routed_swiglu_quant,
)

H, I, E, K, T, N = 2048, 768, 128, 8, 1, 12


def bench(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e6


key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (T, H), jnp.bfloat16)
logits = jax.random.normal(
    jax.random.PRNGKey(7), (N, T, E), jnp.float32
)
topk_p_all, topk_i_all = jax.lax.top_k(logits, K)  # [N,T,K]
topk_p_all = jax.nn.softmax(topk_p_all, axis=-1)
w = jax.random.normal(key, (E, H, I), jnp.bfloat16) * 0.02
wd = jax.random.normal(key, (E, I, H), jnp.bfloat16) * 0.02
gq = quantize_expert_stack(w, bits=4, group_size=512)
uq = quantize_expert_stack(w, bits=4, group_size=512)
dq = quantize_expert_stack(wd, bits=4, group_size=512)
jax.block_until_ready((gq.w_q, uq.w_q, dq.w_q))

# force true-sync mode up front
_ = np.asarray(gq.w_q)

BLOCK = 8


def nosort_one(x, topk_p, topk_i, gq_, uq_, dq_):
    t, h = x.shape
    k = topk_i.shape[1]
    m = t * k
    be = topk_i.reshape(m).astype(jnp.int32)
    xs_rep = jnp.repeat(x, k, axis=0)  # [m, H]
    xs_pad = (
        jnp.zeros((m, BLOCK, h), jnp.bfloat16).at[:, 0, :].set(xs_rep)
    ).reshape(m * BLOCK, h)
    y_pad = _gathered_swiglu_call(
        be, xs_pad, gq_.w_q, gq_.scale, uq_.w_q, uq_.scale,
        dq_.w_q, dq_.scale, block=BLOCK,
    )
    y = y_pad.reshape(m, BLOCK, h)[:, 0, :].reshape(t, k, h)
    return (y.astype(jnp.float32) * topk_p[:, :, None]).sum(axis=1)


@jax.jit
def chain_sorted(x, tp, ti, gq_, uq_, dq_):
    y = x
    for i in range(N):
        y = (
            y
            + routed_swiglu_quant(
                y.astype(jnp.bfloat16), tp[i], ti[i], gq_, uq_, dq_, E
            ).astype(jnp.float32)
        ).astype(jnp.bfloat16)
    return y


@jax.jit
def chain_nosort(x, tp, ti, gq_, uq_, dq_):
    y = x
    for i in range(N):
        y = (
            y
            + nosort_one(
                y.astype(jnp.bfloat16), tp[i], ti[i], gq_, uq_, dq_
            ).astype(jnp.float32)
        ).astype(jnp.bfloat16)
    return y


@jax.jit
def chain_route_only(x, tp, ti):
    y = x
    t, h = x.shape
    k = ti.shape[2]
    m = t * k
    block = _pick_block(m)
    for i in range(N):
        be, gather, order, sorted_token = _block_map(ti[i], t, k, E, block)
        weights = tp[i].reshape(-1)[order].astype(jnp.float32)
        xs = y[sorted_token].astype(jnp.bfloat16)
        xs_pad = jnp.concatenate([xs, jnp.zeros((1, h), xs.dtype)])[gather]
        y_pad = xs_pad * 2.0
        inv = jnp.zeros((m + 1,), jnp.int32).at[gather].set(
            jnp.arange(gather.shape[0], dtype=jnp.int32)
        )
        yy = y_pad[inv[:m]].astype(jnp.float32) * weights[:, None]
        y = (y + jax.ops.segment_sum(yy, sorted_token, num_segments=t)
             + be[0]).astype(jnp.bfloat16)
    return y


# parity first
o_sorted = jax.jit(routed_swiglu_quant, static_argnames=("num_experts",))(
    x, topk_p_all[0], topk_i_all[0], gq, uq, dq, num_experts=E
)
o_nosort = jax.jit(nosort_one)(x, topk_p_all[0], topk_i_all[0], gq, uq, dq)
err = float(jnp.max(jnp.abs(o_sorted.astype(jnp.float32)
                            - o_nosort.astype(jnp.float32))))
print(f"parity max|d|: {err:.3e}", flush=True)

us = bench(chain_sorted, x, topk_p_all, topk_i_all, gq, uq, dq)
print(f"a sorted {N}-chain: {us:.1f} us total, {us/N:.1f}/layer",
      flush=True)
us = bench(chain_nosort, x, topk_p_all, topk_i_all, gq, uq, dq)
print(f"b nosort {N}-chain: {us:.1f} us total, {us/N:.1f}/layer",
      flush=True)
us = bench(chain_route_only, x, topk_p_all, topk_i_all)
print(f"c route-only {N}-chain: {us:.1f} us total, {us/N:.1f}/layer",
      flush=True)

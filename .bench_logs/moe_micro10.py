# SPDX-License-Identifier: Apache-2.0
"""Distinct-stacks test: 12-chain where every layer has its OWN
expert stacks (3.6 GB footprint) vs the shared-stack chain (300 MB).
If distinct is ~6x slower per layer, the real-model cost is memory-
region-dependent (cold pages / DMA translation), not op count.
After-fetch (true-sync) mode.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from vllm_mlx_tpu.ops.moe_quant_pallas import (
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
logits = jax.random.normal(jax.random.PRNGKey(7), (N, T, E), jnp.float32)
tp_all, ti_all = jax.lax.top_k(logits, K)
tp_all = jax.nn.softmax(tp_all, axis=-1)

w = jax.random.normal(key, (E, H, I), jnp.bfloat16) * 0.02
wd = jax.random.normal(key, (E, I, H), jnp.bfloat16) * 0.02
stacks = []
for i in range(N):
    # distinct DEVICE BUFFERS per layer (content irrelevant for timing)
    gq = quantize_expert_stack(w * (1.0 + i * 1e-3), bits=4, group_size=512)
    uq = quantize_expert_stack(w * (1.0 - i * 1e-3), bits=4, group_size=512)
    dq = quantize_expert_stack(wd * (1.0 + i * 1e-3), bits=4, group_size=512)
    stacks.append((gq, uq, dq))
    jax.block_until_ready((gq.w_q, uq.w_q, dq.w_q))

_ = np.asarray(stacks[0][0].w_q)  # true-sync mode


@jax.jit
def chain_distinct(x, tp, ti, stacks):
    y = x
    for i in range(N):
        gq, uq, dq = stacks[i]
        y = (
            y
            + routed_swiglu_quant(
                y.astype(jnp.bfloat16), tp[i], ti[i], gq, uq, dq, E
            ).astype(jnp.float32)
        ).astype(jnp.bfloat16)
    return y


@jax.jit
def chain_shared(x, tp, ti, gq, uq, dq):
    y = x
    for i in range(N):
        y = (
            y
            + routed_swiglu_quant(
                y.astype(jnp.bfloat16), tp[i], ti[i], gq, uq, dq, E
            ).astype(jnp.float32)
        ).astype(jnp.bfloat16)
    return y


us = bench(chain_shared, x, tp_all, ti_all, *stacks[0])
print(f"shared-stack {N}-chain:   {us:.1f} us total, {us/N:.1f}/layer",
      flush=True)
us = bench(chain_distinct, x, tp_all, ti_all, stacks)
print(f"distinct-stacks {N}-chain: {us:.1f} us total, {us/N:.1f}/layer",
      flush=True)
us = bench(chain_shared, x, tp_all, ti_all, *stacks[0])
print(f"shared again:             {us:.1f} us total, {us/N:.1f}/layer",
      flush=True)

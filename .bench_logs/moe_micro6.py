# SPDX-License-Identifier: Apache-2.0
"""Ordering experiment: does the CONST-variant poison the process?
 h1: QT-args library path (fresh)        -- expect fast
 g : weights-as-constants variant        -- expect slow
 h1b: SAME jitted fn re-bench            -- fast or poisoned?
 h2: NEW jit of same body                -- fast or poisoned?
"""
import sys
import time

import jax
import jax.numpy as jnp

from vllm_mlx_tpu.ops.moe_quant_pallas import (
    quantize_expert_stack,
    routed_swiglu_quant,
)

H, I, E, K = 2048, 768, 128, 8
T = int(sys.argv[1]) if len(sys.argv) > 1 else 1


def bench(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e6


key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (T, H), jnp.bfloat16)
logits = jax.random.normal(key, (T, E), jnp.float32)
topk_p, topk_i = jax.lax.top_k(logits, K)
topk_p = jax.nn.softmax(topk_p, axis=-1)
w = jax.random.normal(key, (E, H, I), jnp.bfloat16) * 0.02
wd = jax.random.normal(key, (E, I, H), jnp.bfloat16) * 0.02
gq = quantize_expert_stack(w, bits=4, group_size=512)
uq = quantize_expert_stack(w, bits=4, group_size=512)
dq = quantize_expert_stack(wd, bits=4, group_size=512)
jax.block_until_ready((gq.w_q, uq.w_q, dq.w_q))


@jax.jit
def h1(x, topk_p, topk_i, gq_, uq_, dq_):
    return routed_swiglu_quant(x, topk_p, topk_i, gq_, uq_, dq_, E)


us = bench(h1, x, topk_p, topk_i, gq, uq, dq)
print(f"T={T} h1  (QT args, fresh): {us:.1f} us", flush=True)


@jax.jit
def g(x, topk_p, topk_i):
    return routed_swiglu_quant(x, topk_p, topk_i, gq, uq, dq, E)


us = bench(g, x, topk_p, topk_i)
print(f"T={T} g   (weights CONST): {us:.1f} us", flush=True)

us = bench(h1, x, topk_p, topk_i, gq, uq, dq)
print(f"T={T} h1b (same fn, after g): {us:.1f} us", flush=True)


@jax.jit
def h2(x, topk_p, topk_i, gq_, uq_, dq_):
    return routed_swiglu_quant(x, topk_p, topk_i, gq_, uq_, dq_, E)


us = bench(h2, x, topk_p, topk_i, gq, uq, dq)
print(f"T={T} h2  (new jit, after g): {us:.1f} us", flush=True)

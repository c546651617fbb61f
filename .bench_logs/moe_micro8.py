# SPDX-License-Identifier: Apache-2.0
"""Serving-shaped measurement: N chained routed_swiglu_quant calls in
ONE jit (like 48 MoE layers in one step executable), before and after
a host readback (serving always reads back sampled tokens).
 a: 1-call jit, fresh            (micro-fast baseline)
 b: 12-call chain, fresh         -> per-call cost inside an executable
 c: host fetch, then 12-chain    -> per-call cost in serving mode
 d: 1-call jit after fetch       (control, known ~700)
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
def one(x, topk_p, topk_i, gq_, uq_, dq_):
    return routed_swiglu_quant(x, topk_p, topk_i, gq_, uq_, dq_, E)


@jax.jit
def chain(x, topk_p, topk_i, gq_, uq_, dq_):
    y = x
    for _ in range(N):
        y = y + routed_swiglu_quant(
            y.astype(jnp.bfloat16), topk_p, topk_i, gq_, uq_, dq_, E
        ).astype(jnp.bfloat16)
    return y


us = bench(one, x, topk_p, topk_i, gq, uq, dq)
print(f"a 1-call fresh: {us:.1f} us", flush=True)
us = bench(chain, x, topk_p, topk_i, gq, uq, dq)
print(f"b {N}-chain fresh: {us:.1f} us total, {us/N:.1f}/call", flush=True)

_ = np.asarray(gq.w_q)

us = bench(chain, x, topk_p, topk_i, gq, uq, dq)
print(f"c {N}-chain after fetch: {us:.1f} us total, {us/N:.1f}/call",
      flush=True)
us = bench(one, x, topk_p, topk_i, gq, uq, dq)
print(f"d 1-call after fetch: {us:.1f} us", flush=True)

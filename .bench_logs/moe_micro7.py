# SPDX-License-Identifier: Apache-2.0
"""Pin the poisoning mechanism: per-array or process-global?
 1 h1 fresh                      -> fast baseline
 2 np.asarray(gq.w_q) host fetch -> re-bench h1 (fetch alone damaging?)
 3 big dummy HBM alloc (300MB)   -> re-bench h1 (memory pressure?)
 4 run CONST variant g           -> re-bench h1 (known poison)
 5 FRESH stacks through h1       -> per-array or global?
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from vllm_mlx_tpu.ops.moe_quant_pallas import (
    quantize_expert_stack,
    routed_swiglu_quant,
)

H, I, E, K = 2048, 768, 128, 8
T = 1


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


print(f"1 h1 fresh: {bench(h1, x, topk_p, topk_i, gq, uq, dq):.1f} us",
      flush=True)

_ = np.asarray(gq.w_q)
print(f"2 h1 after host-fetch: "
      f"{bench(h1, x, topk_p, topk_i, gq, uq, dq):.1f} us", flush=True)

dummy = jnp.zeros((300 * 2**20 // 4,), jnp.float32) + 1.0
jax.block_until_ready(dummy)
print(f"3 h1 after 300MB alloc: "
      f"{bench(h1, x, topk_p, topk_i, gq, uq, dq):.1f} us", flush=True)
del dummy


@jax.jit
def g(x, topk_p, topk_i):
    return routed_swiglu_quant(x, topk_p, topk_i, gq, uq, dq, E)


_ = bench(g, x, topk_p, topk_i, iters=5)
print(f"4 h1 after CONST ran: "
      f"{bench(h1, x, topk_p, topk_i, gq, uq, dq):.1f} us", flush=True)

g2 = quantize_expert_stack(w, bits=4, group_size=512)
u2 = quantize_expert_stack(w, bits=4, group_size=512)
d2 = quantize_expert_stack(wd, bits=4, group_size=512)
jax.block_until_ready((g2.w_q, u2.w_q, d2.w_q))
print(f"5 h1 FRESH stacks: "
      f"{bench(h1, x, topk_p, topk_i, g2, u2, d2):.1f} us", flush=True)

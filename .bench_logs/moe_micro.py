# SPDX-License-Identifier: Apache-2.0
"""Per-layer anatomy of the quantized MoE decode path (VERDICT r5 MoE
follow-up): where do 37 ms/step go at Qwen3-30B-A3B geometry?

Times ONE layer's worth of each component at decode occupancy T:
  - routed_swiglu_quant (the fused int4 kernel path)   [the suspect]
  - same with int8 experts (isolates int4 unpack cost)
  - the XLA routing chain alone (block map + gathers + segment_sum)
  - dense qkv+o int8 matmuls at this geometry
Run ON the real chip: python .bench_logs/moe_micro.py [T]
"""
import sys
import time

import jax
import jax.numpy as jnp

from vllm_mlx_tpu.ops.moe_quant_pallas import (
    _block_map,
    quantize_expert_stack,
    routed_swiglu_quant,
)
from vllm_mlx_tpu.ops.quant import QuantizedTensor, quant_matmul

H, I, E, K = 2048, 768, 128, 8
T = int(sys.argv[1]) if len(sys.argv) > 1 else 1


def bench(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e6  # us


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (T, H), jnp.bfloat16)
    logits = jax.random.normal(key, (T, E), jnp.float32)
    topk_p, topk_i = jax.lax.top_k(logits, K)
    topk_p = jax.nn.softmax(topk_p, axis=-1)
    w = jax.random.normal(key, (E, H, I), jnp.bfloat16) * 0.02
    wd = jax.random.normal(key, (E, I, H), jnp.bfloat16) * 0.02

    for bits, g in ((4, 512), (4, 256), (8, 0)):
        gq = quantize_expert_stack(w, bits=bits, group_size=g or 128)
        uq = quantize_expert_stack(w, bits=bits, group_size=g or 128)
        dq = quantize_expert_stack(wd, bits=bits, group_size=g or 128)

        @jax.jit
        def run(x, topk_p, topk_i):
            return routed_swiglu_quant(
                x, topk_p, topk_i, gq, uq, dq, E
            )

        us = bench(run, x, topk_p, topk_i)
        print(f"T={T} routed_swiglu int{bits} g={g}: {us:.1f} us/layer "
              f"(x48 = {us*48/1000:.1f} ms)", flush=True)

    # routing chain alone (no kernel): block map + gathers + segment sum
    @jax.jit
    def route_only(x, topk_p, topk_i):
        t, h = x.shape
        k = topk_i.shape[1]
        m = t * k
        block = 8 if m <= 256 else 32
        be, gather, order, sorted_token = _block_map(topk_i, t, k, E, block)
        weights = topk_p.reshape(-1)[order].astype(jnp.float32)
        xs = x[sorted_token].astype(jnp.bfloat16)
        xs_pad = jnp.concatenate([xs, jnp.zeros((1, h), xs.dtype)])[gather]
        y_pad = xs_pad * 2.0  # stand-in for the kernel
        inv = jnp.zeros((m + 1,), jnp.int32).at[gather].set(
            jnp.arange(gather.shape[0], dtype=jnp.int32)
        )
        y = y_pad[inv[:m]].astype(jnp.float32) * weights[:, None]
        return jax.ops.segment_sum(y, sorted_token, num_segments=t) + be[0]

    us = bench(route_only, x, topk_p, topk_i)
    print(f"T={T} routing chain only: {us:.1f} us/layer "
          f"(x48 = {us*48/1000:.1f} ms)", flush=True)

    # dense attention projections at this geometry (int8 W8A8)
    def qw(o_, k_):  # [O, K] layout for quant_matmul
        codes = jax.random.randint(key, (o_, k_), -127, 127, jnp.int8)
        return QuantizedTensor(
            w_q=codes, scale=jnp.full((o_, 1), 2e-4, jnp.bfloat16), bits=8
        )

    wq_q, wq_k, wq_v = qw(4096, H), qw(512, H), qw(512, H)
    wq_o = qw(H, 4096)
    wq_r = jax.random.normal(key, (E, H), jnp.bfloat16) * 0.02

    @jax.jit
    def dense_part(x):
        q = quant_matmul(x, wq_q)
        k_ = quant_matmul(x, wq_k)
        v = quant_matmul(x, wq_v)
        att = q.astype(jnp.bfloat16)  # stand-in for attention
        o = quant_matmul(att, wq_o)
        r = (x @ wq_r.T).astype(jnp.float32)
        return o, k_, v, r

    us = bench(dense_part, x)
    print(f"T={T} dense qkv+o+router int8: {us:.1f} us/layer "
          f"(x48 = {us*48/1000:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()

# SPDX-License-Identifier: Apache-2.0
"""Decompose the 921 us/layer routed_swiglu_quant T=1 cost:
  (a) the pallas call ALONE (precomputed be/xs_pad, jit'd wrapper)
  (b) the XLA routing chain ALONE (block map + gathers + segment_sum)
  (c) the full routed_swiglu_quant (sanity, matches moe_micro)
  (d) int8 variant at E=32 (avoids remote-compile 413)
Run: python .bench_logs/moe_micro2.py [T]
"""
import sys
import time

import jax
import jax.numpy as jnp

from vllm_mlx_tpu.ops.moe_quant_pallas import (
    _block_map,
    _gathered_swiglu_call,
    _pick_block,
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


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (T, H), jnp.bfloat16)
    logits = jax.random.normal(key, (T, E), jnp.float32)
    topk_p, topk_i = jax.lax.top_k(logits, K)
    topk_p = jax.nn.softmax(topk_p, axis=-1)
    w = jax.random.normal(key, (E, H, I), jnp.bfloat16) * 0.02
    wd = jax.random.normal(key, (E, I, H), jnp.bfloat16) * 0.02

    m = T * K
    block = _pick_block(m)

    # ---- (b) routing chain alone
    @jax.jit
    def route_only(x, topk_p, topk_i):
        t, h = x.shape
        k = topk_i.shape[1]
        be, gather, order, sorted_token = _block_map(topk_i, t, k, E, block)
        weights = topk_p.reshape(-1)[order].astype(jnp.float32)
        xs = x[sorted_token].astype(jnp.bfloat16)
        xs_pad = jnp.concatenate([xs, jnp.zeros((1, h), xs.dtype)])[gather]
        y_pad = xs_pad * 2.0
        mm = t * k
        inv = jnp.zeros((mm + 1,), jnp.int32).at[gather].set(
            jnp.arange(gather.shape[0], dtype=jnp.int32)
        )
        y = (
            y_pad[inv[:mm]].astype(jnp.float32) * weights[:, None]
        )
        return jax.ops.segment_sum(y, sorted_token, num_segments=t) + be[0]

    us = bench(route_only, x, topk_p, topk_i)
    print(f"T={T} (b) routing chain only: {us:.1f} us", flush=True)

    # ---- (a) pallas call alone, int4 g=512
    gq = quantize_expert_stack(w, bits=4, group_size=512)
    uq = quantize_expert_stack(w, bits=4, group_size=512)
    dq = quantize_expert_stack(wd, bits=4, group_size=512)

    be, gather, order, sorted_token = jax.jit(
        lambda ti: _block_map(ti, T, K, E, block)
    )(topk_i)
    xs_pad = jax.random.normal(key, (be.shape[0] * block, H), jnp.bfloat16)
    jax.block_until_ready((be, xs_pad))
    print(f"   nb={be.shape[0]} block={block}", flush=True)

    def call(be_, xs_):
        return _gathered_swiglu_call(
            be_, xs_, gq.w_q, gq.scale, uq.w_q, uq.scale,
            dq.w_q, dq.scale, block=block,
        )

    us = bench(call, be, xs_pad)
    print(f"T={T} (a) pallas swiglu int4 alone: {us:.1f} us", flush=True)

    # ---- (c) full path int4 (sanity vs moe_micro)
    @jax.jit
    def full(x, topk_p, topk_i):
        return routed_swiglu_quant(x, topk_p, topk_i, gq, uq, dq, E)

    us = bench(full, x, topk_p, topk_i)
    print(f"T={T} (c) full routed_swiglu int4: {us:.1f} us", flush=True)

    # ---- (d) int8 at E=32 (per-expert traffic identical; routing cheaper)
    E2 = 32
    w2 = w[:E2]
    wd2 = wd[:E2]
    g8 = quantize_expert_stack(w2, bits=8)
    u8 = quantize_expert_stack(w2, bits=8)
    d8 = quantize_expert_stack(wd2, bits=8)
    ti2 = jnp.clip(topk_i, 0, E2 - 1)

    @jax.jit
    def full8(x, topk_p, ti2):
        return routed_swiglu_quant(x, topk_p, ti2, g8, u8, d8, E2)

    us = bench(full8, x, topk_p, ti2)
    print(f"T={T} (d) full routed_swiglu int8 E=32: {us:.1f} us", flush=True)

    # int4 at E=32 too, to separate E-dependence of the routing chain
    g4 = quantize_expert_stack(w2, bits=4, group_size=512)
    u4 = quantize_expert_stack(w2, bits=4, group_size=512)
    d4 = quantize_expert_stack(wd2, bits=4, group_size=512)

    @jax.jit
    def full4(x, topk_p, ti2):
        return routed_swiglu_quant(x, topk_p, ti2, g4, u4, d4, E2)

    us = bench(full4, x, topk_p, ti2)
    print(f"T={T} (e) full routed_swiglu int4 E=32: {us:.1f} us", flush=True)


if __name__ == "__main__":
    main()

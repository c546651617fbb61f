# SPDX-License-Identifier: Apache-2.0
"""Isolate the composition penalty: weights-as-args vs closed-over
constants, and device-computed scalar prefetch vs precomputed.
Run: python .bench_logs/moe_micro3.py [T]
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
    gq = quantize_expert_stack(w, bits=4, group_size=512)
    uq = quantize_expert_stack(w, bits=4, group_size=512)
    dq = quantize_expert_stack(wd, bits=4, group_size=512)
    jax.block_until_ready((gq.w_q, uq.w_q, dq.w_q))

    m = T * K
    block = _pick_block(m)

    # (f) full composition, ONE jit, weights as EXPLICIT ARGS
    @jax.jit
    def full_args(x, topk_p, topk_i, gw, gsc, uw, usc, dw, dsc):
        t, h = x.shape
        k = topk_i.shape[1]
        mm = t * k
        be, gather, order, sorted_token = _block_map(topk_i, t, k, E, block)
        weights = topk_p.reshape(-1)[order].astype(jnp.float32)
        xs = x[sorted_token].astype(jnp.bfloat16)
        xs_pad = jnp.concatenate([xs, jnp.zeros((1, h), xs.dtype)])[gather]
        y_pad = _gathered_swiglu_call(
            be, xs_pad, gw, gsc, uw, usc, dw, dsc, block=block
        )
        inv = jnp.zeros((mm + 1,), jnp.int32).at[gather].set(
            jnp.arange(gather.shape[0], dtype=jnp.int32)
        )
        y = y_pad[inv[:mm]].astype(jnp.float32) * weights[:, None]
        return jax.ops.segment_sum(y, sorted_token, num_segments=t)

    us = bench(
        full_args, x, topk_p, topk_i,
        gq.w_q, gq.scale, uq.w_q, uq.scale, dq.w_q, dq.scale,
    )
    print(f"T={T} (f) one-jit composition, weights as ARGS: {us:.1f} us",
          flush=True)

    # (g) same but weights closed over (constants)
    @jax.jit
    def full_const(x, topk_p, topk_i):
        return full_args.__wrapped__(
            x, topk_p, topk_i,
            gq.w_q, gq.scale, uq.w_q, uq.scale, dq.w_q, dq.scale,
        )

    us = bench(full_const, x, topk_p, topk_i)
    print(f"T={T} (g) one-jit composition, weights CONST: {us:.1f} us",
          flush=True)

    # (h) routed_swiglu_quant with QuantizedTensor args (library entry,
    # weights as args through the pytree)
    @jax.jit
    def full_qt(x, topk_p, topk_i, gq_, uq_, dq_):
        return routed_swiglu_quant(x, topk_p, topk_i, gq_, uq_, dq_, E)

    us = bench(full_qt, x, topk_p, topk_i, gq, uq, dq)
    print(f"T={T} (h) routed_swiglu_quant, QT ARGS: {us:.1f} us", flush=True)


if __name__ == "__main__":
    main()

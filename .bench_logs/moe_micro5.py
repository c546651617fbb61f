# SPDX-License-Identifier: Apache-2.0
"""Pinpoint: is the slow variant retracing / re-dispatching?
 (j) QT args + inline body      (isolates QT-as-arg)
 (i) raw args + library body    (isolates library code)
 re-bench (f) last               (ordering control)
Prints jit cache sizes after the loops.
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
from vllm_mlx_tpu.ops.quant import QuantizedTensor

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

m = T * K
block = _pick_block(m)


def body(x, topk_p, topk_i, gw, gsc, uw, usc, dw, dsc):
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


@jax.jit
def fj(x, topk_p, topk_i, gq_, uq_, dq_):  # (j) QT args + inline body
    return body(
        x, topk_p, topk_i,
        gq_.w_q, gq_.scale, uq_.w_q, uq_.scale, dq_.w_q, dq_.scale,
    )


us = bench(fj, x, topk_p, topk_i, gq, uq, dq)
print(f"T={T} (j) inline body, QT ARGS: {us:.1f} us  "
      f"cache={fj._cache_size()}", flush=True)


@jax.jit
def fi(x, topk_p, topk_i, gw, gsc, uw, usc, dw, dsc):  # (i) raw args + lib
    g_ = QuantizedTensor(w_q=gw, scale=gsc, bits=4, group_size=512)
    u_ = QuantizedTensor(w_q=uw, scale=usc, bits=4, group_size=512)
    d_ = QuantizedTensor(w_q=dw, scale=dsc, bits=4, group_size=512)
    return routed_swiglu_quant(x, topk_p, topk_i, g_, u_, d_, E)


us = bench(
    fi, x, topk_p, topk_i,
    gq.w_q, gq.scale, uq.w_q, uq.scale, dq.w_q, dq.scale,
)
print(f"T={T} (i) library body, RAW ARGS: {us:.1f} us  "
      f"cache={fi._cache_size()}", flush=True)


ff = jax.jit(body)  # (f) control
us = bench(
    ff, x, topk_p, topk_i,
    gq.w_q, gq.scale, uq.w_q, uq.scale, dq.w_q, dq.scale,
)
print(f"T={T} (f) inline body, RAW ARGS (control): {us:.1f} us  "
      f"cache={ff._cache_size()}", flush=True)


@jax.jit
def fh(x, topk_p, topk_i, gq_, uq_, dq_):  # (h) library + QT args
    return routed_swiglu_quant(x, topk_p, topk_i, gq_, uq_, dq_, E)


us = bench(fh, x, topk_p, topk_i, gq, uq, dq)
print(f"T={T} (h) library body, QT ARGS: {us:.1f} us  "
      f"cache={fh._cache_size()}", flush=True)

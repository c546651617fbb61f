# SPDX-License-Identifier: Apache-2.0
"""Diff the lowered HLO of the fast (f) and slow (h) compositions."""
import sys

import jax
import jax.numpy as jnp

from vllm_mlx_tpu.ops.moe_quant_pallas import (
    _block_map,
    _gathered_swiglu_call,
    _pick_block,
    quantize_expert_stack,
    routed_swiglu_quant,
)

H, I, E, K, T = 2048, 768, 128, 8, 1

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

m = T * K
block = _pick_block(m)


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


def full_qt(x, topk_p, topk_i, gq_, uq_, dq_):
    return routed_swiglu_quant(x, topk_p, topk_i, gq_, uq_, dq_, E)


lf = jax.jit(full_args).lower(
    x, topk_p, topk_i, gq.w_q, gq.scale, uq.w_q, uq.scale, dq.w_q, dq.scale
)
lh = jax.jit(full_qt).lower(x, topk_p, topk_i, gq, uq, dq)

tf = lf.as_text()
th = lh.as_text()
with open(".bench_logs/hlo_f.txt", "w") as fo:
    fo.write(tf)
with open(".bench_logs/hlo_h.txt", "w") as fo:
    fo.write(th)
print("f lines:", len(tf.splitlines()), " h lines:", len(th.splitlines()))

import re
def opcount(t):
    ops = {}
    for mm_ in re.finditer(r"= \"?([a-z0-9_.-]+)\"?\(", t):
        ops[mm_.group(1)] = ops.get(mm_.group(1), 0) + 1
    return ops

of, oh = opcount(tf), opcount(th)
allk = sorted(set(of) | set(oh))
for k_ in allk:
    a, b = of.get(k_, 0), oh.get(k_, 0)
    if a != b:
        print(f"  {k_}: f={a} h={b}")
print("custom_call in f:", tf.count("custom_call"), " h:", th.count("custom_call"))
print("tpu_custom_call f:", tf.count("tpu_custom_call"), " h:", th.count("tpu_custom_call"))

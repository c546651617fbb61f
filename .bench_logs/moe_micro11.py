# SPDX-License-Identifier: Apache-2.0
"""Full 30B-A3B-geometry decode LAYER anatomy at T=1, chained x12 in
one jit (after-fetch true-sync). Ablations isolate where the real
~770 us/layer goes:
  full        norm+qkv+rope+kvwrite+attn+o+norm+router+moe
  noattn      attention kernel + kv write replaced by a cheap mix
  nomoe       router kept, routed_swiglu replaced by identity
  nodense     qkv/o replaced by slicing (moe+attn kept)
  moeonly     norm+router+moe only (sanity vs micro10 ~120)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from vllm_mlx_tpu.ops.quant import quantize_int8, quant_matmul
from vllm_mlx_tpu.ops.moe_quant_pallas import (
    quantize_expert_stack,
    routed_swiglu_quant,
)
from vllm_mlx_tpu.ops.decode_attention_pallas import decode_paged_attention
from vllm_mlx_tpu.ops.layers import rms_norm

H, QH, KVH, HD = 2048, 32, 4, 128
E, K, IM = 128, 8, 768
T, N = 1, 4
P, PS, NB = 64, 16, 8  # pages, page size, blocks/seq (ctx 128)
CTX = 127

modes = sys.argv[1:] or ["full"]


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

layers = []
kr = jax.random.PRNGKey(1)
for i in range(N):
    kr, *ks = jax.random.split(kr, 8)
    qkv_w = quantize_int8(
        jax.random.normal(ks[0], (QH * HD + 2 * KVH * HD, H), jnp.float32)
        * 0.02
    )
    o_w = quantize_int8(
        jax.random.normal(ks[1], (H, QH * HD), jnp.float32) * 0.02
    )
    router = jax.random.normal(ks[2], (E, H), jnp.bfloat16) * 0.02
    gq = quantize_expert_stack(
        jax.random.normal(ks[3], (E, H, IM), jnp.bfloat16) * 0.02,
        bits=4, group_size=512,
    )
    uq = quantize_expert_stack(
        jax.random.normal(ks[4], (E, H, IM), jnp.bfloat16) * 0.02,
        bits=4, group_size=512,
    )
    dq = quantize_expert_stack(
        jax.random.normal(ks[5], (E, IM, H), jnp.bfloat16) * 0.02,
        bits=4, group_size=512,
    )
    norm1 = jnp.ones((H,), jnp.bfloat16)
    norm2 = jnp.ones((H,), jnp.bfloat16)
    pages = jnp.zeros((P, PS, 2 * KVH, HD), jnp.int8)
    layers.append(dict(qkv=qkv_w, o=o_w, router=router, gq=gq, uq=uq,
                       dq=dq, n1=norm1, n2=norm2, pages=pages))

bt = jnp.tile(jnp.arange(NB, dtype=jnp.int32), (T, 1))
kv_lens = jnp.full((T,), CTX + 1, jnp.int32)
pos = jnp.full((T,), CTX, jnp.int32)
SCALE = 1.0 / (HD ** 0.5)
KS = 0.05

jax.block_until_ready([l["gq"].w_q for l in layers])
_ = np.asarray(layers[0]["gq"].w_q)  # true-sync


def layer_fn(mode, i, p, x, lg):
    h = rms_norm(x, p["n1"], 1e-6)
    if mode == "moeonly":
        attn_done = h
    else:
        if mode == "nodense":
            q = jnp.tile(h[:, :HD], (1, QH)).reshape(T, QH, HD)
            k = h[:, : KVH * HD].reshape(T, KVH, HD)
            v = h[:, : KVH * HD].reshape(T, KVH, HD)
        else:
            qkv = quant_matmul(h, p["qkv"]).astype(jnp.bfloat16)
            q = qkv[:, : QH * HD].reshape(T, QH, HD)
            k = qkv[:, QH * HD: QH * HD + KVH * HD].reshape(T, KVH, HD)
            v = qkv[:, QH * HD + KVH * HD:].reshape(T, KVH, HD)
        if mode == "noattn":
            attn_flat = jnp.tile(
                (q.mean(axis=1) + k.mean(axis=1) + v.mean(axis=1)),
                (1, QH // 1),
            )[:, : QH * HD]
        else:
            kq = jnp.clip(jnp.round(k / KS), -127, 127).astype(jnp.int8)
            vq = jnp.clip(jnp.round(v / KS), -127, 127).astype(jnp.int8)
            rows = jnp.arange(T)
            bidx = bt[rows, pos // PS]
            off = pos % PS
            pages = p["pages"].at[bidx, off, :KVH].set(kq)
            pages = pages.at[bidx, off, KVH:].set(vq)
            attn = decode_paged_attention(
                q.astype(jnp.bfloat16), pages, kv_lens, bt, SCALE,
                k_scale=KS, v_scale=KS,
            )
            attn_flat = attn.reshape(T, QH * HD)
        if mode == "nodense":
            attn_done = attn_flat[:, :H]
        else:
            attn_done = quant_matmul(
                attn_flat.astype(jnp.bfloat16), p["o"]
            ).astype(jnp.bfloat16)
    x = x + attn_done[:, :H].astype(x.dtype)
    h2 = rms_norm(x, p["n2"], 1e-6)
    rl = (h2 @ p["router"].T).astype(jnp.float32) + lg
    tp, ti = jax.lax.top_k(rl, K)
    tp = jax.nn.softmax(tp, axis=-1)
    if mode == "nomoe":
        moe_out = h2 * tp[:, :1]
    else:
        moe_out = routed_swiglu_quant(
            h2.astype(jnp.bfloat16), tp, ti, p["gq"], p["uq"], p["dq"], E
        )
    return x + moe_out.astype(x.dtype)


import functools


@functools.partial(jax.jit, static_argnames=("mode",))
def step(x, lg, layers, mode):
    y = x
    for i, p in enumerate(layers):
        y = layer_fn(mode, i, p, y, lg[i])
    return y


for mode in modes:
    us = bench(functools.partial(step, mode=mode), x, logits, layers)
    print(f"{mode}: {us:.1f} us total, {us/N:.1f}/layer", flush=True)

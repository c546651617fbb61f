# SPDX-License-Identifier: Apache-2.0
"""Micro-bench: weight-quantized decode matmul strategies on the real
chip (VERDICT r2 #4 groundwork). Chained dependent iterations measure
steady-state per-step time (timing loops on this tunneled platform lie
without on-device dependencies — NOTES_TPU_ENV.md)."""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from vllm_mlx_tpu.core.model_runner import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()


def log(m):
    print(m, file=sys.stderr, flush=True)


# Qwen3-0.6B-ish decode stack shapes: [T, 1024] through q/k/v/o + mlp
H, I = 1024, 3072
LAYER_SHAPES = [
    (H, H),       # q-ish
    (H, H),       # o
    (I, H),       # gate
    (I, H),       # up
    (H, I),       # down
]
N_LAYERS = 28


def make_weights(kind, rng):
    from vllm_mlx_tpu.ops.quant import quantize_int4, quantize_int8

    ws = []
    for o, k in LAYER_SHAPES:
        w = jnp.asarray(rng.standard_normal((o, k), dtype=np.float32) * 0.02)
        if kind == "bf16":
            ws.append(w.astype(jnp.bfloat16))
        elif kind == "int8":
            ws.append(quantize_int8(w))
        elif kind == "s4":
            # XLA-native s4 storage, per-row scale: codes live in HBM
            # as 4-bit, the convert fuses into the dot (if Mosaic
            # supports it, weight DMA halves vs int8)
            scale = jnp.max(jnp.abs(w), 1, keepdims=True) / 7.0
            codes = jnp.clip(jnp.round(w / scale), -8, 7).astype(jnp.int4)
            ws.append((codes, scale.astype(jnp.bfloat16)))
        elif kind == "s4g":
            # XLA-native s4 with PER-GROUP scales [O, K/g] — groups as
            # a batch dim of one dot_general, scales applied to the
            # [G, T, O] partials post-contraction (accuracy-preserving
            # int4 without any pallas kernel)
            g = 128
            o, k = w.shape
            wg = w.reshape(o, k // g, g)
            scale = jnp.max(jnp.abs(wg), 2, keepdims=True) / 7.0
            codes = jnp.clip(jnp.round(wg / scale), -8, 7).astype(jnp.int4)
            ws.append((codes, scale[..., 0].astype(jnp.bfloat16)))
        elif kind.startswith("int4"):
            ws.append(quantize_int4(w, 128))
    return ws


def matmul_variant(kind, x, q):
    from vllm_mlx_tpu.ops.quant import quant_matmul

    if kind == "bf16":
        return jax.lax.dot_general(
            x, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
    if kind in ("int8", "int4"):
        # int4 routes through the fused pallas kernel on TPU
        return quant_matmul(x, q).astype(jnp.bfloat16)
    if kind == "int4_w4a8":
        # W4A8: activations int8 per row; per-group int32 partial dots
        g = q.group_size
        o, k = q.w_q.shape
        xf = x.astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(xf), -1, keepdims=True), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
        xg = xq.reshape(x.shape[0], k // g, g)
        wg = q.w_q.reshape(o, k // g, g).astype(jnp.int8)
        # [k//g, T, O] int32 partials: batch dim k//g, contract g
        part = jax.lax.dot_general(
            xg, wg, (((2,), (2,)), ((1,), (1,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        y = jnp.einsum(
            "gto,og->to", part, q.scale.astype(jnp.float32)
        )
        return (y * xs).astype(jnp.bfloat16)
    if kind == "int4_pallas":
        from vllm_mlx_tpu.ops.quant_pallas import int4_matmul

        return int4_matmul(x, q).astype(jnp.bfloat16)
    if kind == "s4":
        codes, scale = q
        y = jax.lax.dot_general(
            x, codes.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y * scale.astype(jnp.float32)[:, 0]).astype(jnp.bfloat16)
    if kind == "s4g":
        codes, scale = q  # codes [O, G, g] s4, scale [O, G]
        o, ng, g = codes.shape
        xg = x.reshape(x.shape[0], ng, g)
        # batch over G, contract g: [G, T, O] f32 partials
        part = jax.lax.dot_general(
            xg, codes.astype(jnp.bfloat16),
            (((2,), (2,)), ((1,), (1,))),
            preferred_element_type=jnp.float32,
        )
        y = jnp.einsum("gto,og->to", part, scale.astype(jnp.float32))
        return y.astype(jnp.bfloat16)
    raise ValueError(kind)


def bench(kind, t_rows, iters=50):
    rng = np.random.default_rng(0)
    ws = make_weights(kind, rng)

    def step(x, _):
        for _ in range(N_LAYERS):
            h = matmul_variant(kind, x, ws[0])
            h = matmul_variant(kind, h, ws[1])
            g = matmul_variant(kind, h, ws[2])
            u = matmul_variant(kind, h, ws[3])
            y = matmul_variant(
                kind, (jax.nn.silu(g.astype(jnp.float32)) *
                       u.astype(jnp.float32)).astype(jnp.bfloat16), ws[4]
            )
            x = (x + y * 1e-3).astype(jnp.bfloat16)
        return x, None

    @jax.jit
    def run(x):
        x, _ = jax.lax.scan(step, x, None, length=8)
        return x

    x = jnp.asarray(
        rng.standard_normal((t_rows, H), dtype=np.float32)
    ).astype(jnp.bfloat16)
    run(x).block_until_ready()  # compile
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        y = run(x)
        np.asarray(y)  # real sync (block_until_ready lies here)
        dt = (time.perf_counter() - t0) / 8
        best = min(best, dt)
    # per model-step time (28 layers x 5 matmuls)
    log(f"{kind:12s} T={t_rows:3d}: {best*1e3:7.2f} ms/step")
    return best


if __name__ == "__main__":
    kinds = sys.argv[1:] or ["bf16", "int8", "int4"]
    for t in (8, 32):
        for kind in kinds:
            try:
                bench(kind, t)
            except Exception as e:
                log(f"{kind} T={t}: FAILED {type(e).__name__}: {e}")

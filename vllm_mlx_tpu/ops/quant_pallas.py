# SPDX-License-Identifier: Apache-2.0
"""Fused int4 dequant-matmul Pallas kernel (VERDICT r2 #4 / PLAN_R3
perf #1).

Decode is weight-bandwidth-bound: int8 weights read 1 byte/weight, int4
halves that again — but XLA cannot fuse a convert+scale across a dot
input on TPU (it materializes the dequantized copy, tripling HBM
traffic — NOTES_TPU_ENV.md kernel lessons). This kernel reads PACKED
int4 weights (two nibbles per byte) from HBM, sign-extends and scales
them in VMEM, and feeds the MXU in bfloat16 — weight HBM traffic is
0.5 bytes/weight end to end.

Packing layout ("half split", chosen so unpacking needs NO lane
shuffles): byte ``[o, j]`` holds ``w[o, j]`` in the low nibble and
``w[o, j + K/2]`` in the high nibble. Unpacking yields two contiguous
``[O, K/2]`` halves; the matmul runs as
``x[:, :K/2] @ lo.T + x[:, K/2:] @ hi.T``. Per-group scales stay
contiguous per half as long as ``group_size`` divides ``K/2``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_int4(w_q: jax.Array) -> jax.Array:
    """[O, K] int4-valued (any int dtype) -> [O, K/2] uint8 packed in
    the half-split layout."""
    o, k = w_q.shape
    assert k % 2 == 0
    w = jnp.asarray(w_q).astype(jnp.int32)
    lo = w[:, : k // 2] & 0xF
    hi = (w[:, k // 2 :] & 0xF) << 4
    return (lo | hi).astype(jnp.uint8)


def _int4_kernel(
    xlo_ref,  # [T, K2] bf16
    xhi_ref,  # [T, K2] bf16
    wp_ref,  # [bo, K2] uint8 packed
    slo_ref,  # [bo, K2//g] f32 scales, low half
    shi_ref,  # [bo, K2//g] f32 scales, high half
    o_ref,  # [T, bo] f32
    *,
    group_size: int,
):
    """Group-dot formulation: dot the UNSCALED sign-extended nibbles
    per quantization group and apply the per-(row, group) scale to the
    [T, bo] partial AFTER the MXU — O(T*bo*ng) scale multiplies instead
    of O(bo*k2) per-element dequant multiplies + a lane-splitting
    reshape. Measured 2.1x over the dequant-into-matmul version on the
    vocab-size lm_head (the per-element f32 scale path was VPU-bound at
    ~10x off memory bandwidth)."""
    b = wp_ref[...].astype(jnp.int32)
    lo = ((b << 28) >> 28).astype(jnp.bfloat16)  # sign-extended low
    hi = ((b << 24) >> 28).astype(jnp.bfloat16)  # sign-extended high
    g = group_size
    nh = lo.shape[1] // g  # groups per half
    acc = jnp.zeros((xlo_ref.shape[0], lo.shape[0]), jnp.float32)
    for wh, xr, sr in ((lo, xlo_ref, slo_ref), (hi, xhi_ref, shi_ref)):
        for gi in range(nh):
            pg = jax.lax.dot_general(
                xr[:, gi * g : (gi + 1) * g],
                wh[:, gi * g : (gi + 1) * g],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc += pg * sr[:, gi][None, :]
    o_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("block_o", "group_size"))
def int4_matmul_packed(
    x: jax.Array,  # [T, K] bf16
    w_packed: jax.Array,  # [O, K/2] uint8 (pack_int4 layout)
    scales: jax.Array,  # [O, K/group] any float
    *,
    group_size: int = 128,
    block_o: int = 512,
) -> jax.Array:
    """x @ W^T with W int4-packed; returns [T, O] f32."""
    t, k = x.shape
    o, k2 = w_packed.shape
    assert k2 * 2 == k
    ng = scales.shape[1]
    assert ng * group_size == k
    assert k2 % group_size == 0, "group_size must divide K/2"
    bo = min(block_o, o)
    xlo = x[:, :k2]
    xhi = x[:, k2:]
    s32 = scales.astype(jnp.float32)
    slo = s32[:, : ng // 2]
    shi = s32[:, ng // 2 :]
    grid = (-(-o // bo),)  # cdiv: pallas masks the edge block
    return pl.pallas_call(
        functools.partial(_int4_kernel, group_size=group_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, k2), lambda i: (0, 0)),
            pl.BlockSpec((t, k2), lambda i: (0, 0)),
            pl.BlockSpec((bo, k2), lambda i: (i, 0)),
            pl.BlockSpec((bo, ng // 2), lambda i: (i, 0)),
            pl.BlockSpec((bo, ng // 2), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((t, bo), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((t, o), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(xlo, xhi, w_packed, slo, shi)


def int4_matmul(x: jax.Array, q) -> jax.Array:
    """Adapter for ops.quant.QuantizedTensor (bits=4, already stored in
    the packed half-split layout).

    The fused kernel targets DECODE (small token counts, weight-
    bandwidth-bound). Prefill-sized batches dequantize-then-dot via
    XLA instead: at T >= 64 the one-off bf16 materialization amortizes,
    and whole-K kernel tiles would blow the 16 MB VMEM limit."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16)
    t = x2.shape[0]
    o = q.shape[0]
    k2 = q.w_q.shape[1]
    if t > 64:
        from .quant import dequantize

        w = dequantize(q, jnp.bfloat16)
        y = jax.lax.dot_general(
            x2, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y.reshape(*lead, o)
    pad = (-t) % 8
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    # block_o sized to the 16 MB scoped-VMEM limit. Peak is ~12 B per
    # bo*k2 element (u8 block double-buffered + i32 sign-extend temps
    # + two bf16 nibble halves) — the group-dot kernel keeps no f32
    # dequant copy. Bigger tiles = fewer grid steps (the vocab-size
    # lm_head was catastrophic at bo=128: 1187 sequential 64 KB
    # tiles); the grid is cdiv so O need not divide bo.
    budget = 13 * 2**20
    bo = 2048
    while bo > 128 and (12 * bo * k2 + 4 * (t + pad) * k2) > budget:
        bo //= 2
    y = int4_matmul_packed(
        x2, q.w_q, q.scale, group_size=q.group_size, block_o=bo
    )
    if pad:
        y = y[:t]
    return y.reshape(*lead, o)

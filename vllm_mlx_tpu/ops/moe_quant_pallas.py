# SPDX-License-Identifier: Apache-2.0
"""Gathered quantized-expert MoE: block-routed dequant grouped matmul.

Why this exists: the reference's headline MoE rows (Qwen3-30B-A3B-4bit,
127.7 tok/s decode on M4 Max — reference README.md:88,
docs/benchmarks/llm.md:17) are only servable per-chip if the expert
stacks are quantized — 30B-A3B's experts are 29 GB in bf16 (impossible
on a 16 GB v5e) but 7.3 GB at int4. ``jax.lax.ragged_dot`` cannot
consume quantized operands, and XLA cannot fuse a dequantize across a
dot input on TPU (it materializes the bf16 copy, tripling HBM traffic —
NOTES_TPU_ENV.md kernel lessons), so the grouped matmul gets its own
Pallas kernel.

Design (megablocks-style, TPU-first):

  * Tokens' (row, expert) pairs are sorted by expert (same dispatch
    order as the bf16 ``ragged_dot`` path in models/decoder.py).
  * Sorted rows are tiled into fixed ``B``-row blocks that never span
    two experts: block count is static (``ceil(M/B) + E`` worst case),
    per-block expert ids are computed in XLA and handed to the kernel
    as SCALAR-PREFETCH data.
  * The kernel grid walks blocks; each block's expert weights are
    DMA'd by the Pallas pipeline via the scalar-prefetched index map —
    consecutive blocks of the same expert reuse the resident copy
    (Mosaic elides same-index refetches), so per-step expert HBM
    traffic is ``(#distinct experts hit) * bytes_per_expert``, not
    ``E * bytes_per_expert``. At decode occupancy 1 with top-8 routing
    that is an 16x traffic cut at E=128.
  * Dequantization happens in VMEM feeding the MXU: int8 codes convert
    to bf16 with one per-output-column scale applied post-dot; int4
    codes are nibble-packed along the OUTPUT axis (half-split: byte
    ``[k, j]`` = ``w[k, j] | w[k, j + N/2] << 4``) and use the
    group-dot formulation proven in ops/quant_pallas.py — dot unscaled
    nibbles per K-group, scale the [B, N] partial after the MXU.

The full routed-SwiGLU (gate/up/silu/mul/down) for one layer runs in
ONE pallas_call, so the per-dispatch fixed cost stays at one kernel
per MoE layer rather than three.

Reference behavior mirrored: vllm_mlx serves mlx-community 4-bit MoE
checkpoints through mlx's quantized gather-matmuls
(/root/reference/vllm_mlx/models.md MoE rows; mlx_lm switch_layers).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import QuantizedTensor


# ----------------------------------------------------------- quantization
def quantize_expert_stack(w: jax.Array, bits: int = 8,
                          group_size: int = 128) -> QuantizedTensor:
    """Quantize a ragged_dot expert stack [E, K, N] over the
    CONTRACTION axis K.

    int8: symmetric per-(expert, output-column), scale [E, 1, N].
    int4: symmetric per-(expert, K-group, output-column), scale
    [E, K/g, N]; codes nibble-packed along N (half-split: byte
    ``[e, k, j] = w[e, k, j] | w[e, k, j + N/2] << 4``) so the kernel's
    unpack needs no lane shuffles and ``QuantizedTensor.shape`` stays
    truthful ([..., N/2] packed -> logical [..., N]).
    """
    e, k, n = w.shape
    wf = w.astype(jnp.float32)
    if bits == 8:
        amax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        codes = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        return QuantizedTensor(
            w_q=codes, scale=scale.astype(jnp.bfloat16), bits=8
        )
    assert bits == 4
    g = group_size
    while g > 16 and k % g:
        g //= 2  # shrink to a divisor of K (e.g. GPT-OSS K=2880 -> 64)
    if k % g or n % 2:
        return quantize_expert_stack(w, bits=8)
    wg = wf.reshape(e, k // g, g, n)
    amax = jnp.max(jnp.abs(wg), axis=2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    codes = (
        jnp.clip(jnp.round(wg / scale), -7, 7)
        .astype(jnp.int32)
        .reshape(e, k, n)
    )
    lo = codes[..., : n // 2] & 0xF
    hi = (codes[..., n // 2 :] & 0xF) << 4
    return QuantizedTensor(
        w_q=(lo | hi).astype(jnp.uint8),
        scale=scale[:, :, 0, :].astype(jnp.bfloat16),  # [E, K/g, N]
        bits=4,
        group_size=g,
    )


def dequantize_expert_stack(q: QuantizedTensor,
                            dtype=jnp.bfloat16) -> jax.Array:
    """[E, K, N] bf16 from a quantize_expert_stack tensor (XLA
    fallback path and tests)."""
    if q.bits == 8:
        return (
            q.w_q.astype(jnp.float32) * q.scale.astype(jnp.float32)
        ).astype(dtype)
    b = q.w_q.astype(jnp.int32)
    lo = (b << 28) >> 28
    hi = (b << 24) >> 28
    codes = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
    e, k, n = codes.shape
    g = q.group_size
    wf = codes.reshape(e, k // g, g, n) * q.scale.astype(jnp.float32)[
        :, :, None, :
    ]
    return wf.reshape(e, k, n).astype(dtype)


# ------------------------------------------------------------- block map
def _block_map(topk_i: jax.Array, t: int, k: int, e: int,
               block: int) -> Tuple[jax.Array, ...]:
    """Expert-sorted fixed-size row blocks with a STATIC block count.

    Returns (block_expert [NB] i32, gather [NB*B] i32 row indices into
    the sorted-row array with M = pad row, order [M], sorted_token [M],
    valid_count scalarless — validity is encoded as gather == M).
    """
    m = t * k
    flat_expert = topk_i.reshape(-1)
    flat_token = jnp.repeat(jnp.arange(t), k)
    order = jnp.argsort(flat_expert)
    sorted_expert = flat_expert[order]
    sorted_token = flat_token[order]
    group_sizes = jnp.bincount(sorted_expert, length=e)  # [E]
    # static worst-case block count: sum_e ceil(s_e/B) is bounded both
    # by floor(M/B) + #nonempty-experts and by M (every block holds at
    # least one row) — the min keeps low-occupancy grids tight (M=8,
    # top-8 of 128 experts: 8 grid steps, not 129)
    nb = min(-(-m // block) + min(e, m), max(m, -(-m // block)))
    nblk = -(-group_sizes // block)  # ceil, [E]
    blk_end = jnp.cumsum(nblk)  # [E]
    row_start = jnp.cumsum(group_sizes) - group_sizes  # [E]
    b_ids = jnp.arange(nb)
    be = jnp.searchsorted(blk_end, b_ids, side="right")  # [NB] in [0,E]
    in_range = be < e
    be_c = jnp.minimum(be, e - 1).astype(jnp.int32)
    blk_start = blk_end - nblk
    local = b_ids - blk_start[be_c]
    base = row_start[be_c] + local * block
    lane = jnp.arange(block)
    ridx = base[:, None] + lane[None, :]  # [NB, B]
    valid = (
        in_range[:, None]
        & (local[:, None] * block + lane[None, :] < group_sizes[be_c][:, None])
    )
    gather = jnp.where(valid, ridx, m).reshape(-1).astype(jnp.int32)
    return be_c, gather, order, sorted_token


# ----------------------------------------------------------------- kernel
def _swiglu_kernel_int8(
    be_ref,  # scalar prefetch [NB] i32 (unused in body; drives index maps)
    x_ref,  # [B, H] bf16
    gq_ref,  # [1, H, I] int8
    gs_ref,  # [1, 1, I] bf16
    uq_ref,  # [1, H, I] int8
    us_ref,  # [1, 1, I] bf16
    dq_ref,  # [1, I, H] int8
    ds_ref,  # [1, 1, H] bf16
    y_ref,  # [B, H] bf16
):
    x = x_ref[...]
    g = jax.lax.dot_general(
        x, gq_ref[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * gs_ref[0, 0].astype(jnp.float32)[None, :]
    u = jax.lax.dot_general(
        x, uq_ref[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * us_ref[0, 0].astype(jnp.float32)[None, :]
    h = (jax.nn.sigmoid(g) * g * u).astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        h, dq_ref[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * ds_ref[0, 0].astype(jnp.float32)[None, :]
    y_ref[...] = y.astype(y_ref.dtype)


def _group_dot_int4(x, wp, s, group: int):
    """x [B, K] bf16 @ int4-packed wp [K, N/2] (half-split along N)
    with group scales s [K/g, N] -> [B, N] f32."""
    b32 = wp.astype(jnp.int32)
    lo = ((b32 << 28) >> 28).astype(jnp.bfloat16)  # [K, N/2]
    hi = ((b32 << 24) >> 28).astype(jnp.bfloat16)
    k = x.shape[1]
    n2 = wp.shape[1]
    ng = k // group
    sf = s.astype(jnp.float32)
    outs = []
    for half, s_half in ((lo, sf[:, :n2]), (hi, sf[:, n2:])):
        acc = jnp.zeros((x.shape[0], n2), jnp.float32)
        for gi in range(ng):
            p = jax.lax.dot_general(
                x[:, gi * group : (gi + 1) * group],
                half[gi * group : (gi + 1) * group, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc += p * s_half[gi][None, :]
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)  # [B, N]


def _swiglu_kernel_int4(
    be_ref,
    x_ref,  # [B, H] bf16
    gq_ref,  # [1, H, I/2] uint8
    gs_ref,  # [1, H/g, I] bf16
    uq_ref,
    us_ref,
    dq_ref,  # [1, I, H/2] uint8
    ds_ref,  # [1, I/g, H] bf16
    y_ref,  # [B, H] bf16
    *,
    group: int,
):
    x = x_ref[...]
    g = _group_dot_int4(x, gq_ref[0], gs_ref[0], group)
    u = _group_dot_int4(x, uq_ref[0], us_ref[0], group)
    h = (jax.nn.sigmoid(g) * g * u).astype(jnp.bfloat16)
    y_ref[...] = _group_dot_int4(h, dq_ref[0], ds_ref[0], group).astype(
        y_ref.dtype
    )


@functools.partial(
    jax.jit,
    static_argnames=("block", "interpret"),
)
def _gathered_swiglu_call(
    be: jax.Array,  # [NB] i32 block -> expert
    xs_pad: jax.Array,  # [NB*B, H] bf16
    gq, gs, uq, us, dq, ds,  # expert stacks + scales
    *,
    block: int,
    interpret: bool = False,
) -> jax.Array:
    nb = be.shape[0]
    h = xs_pad.shape[1]
    bits = 8 if gq.dtype == jnp.int8 else 4
    i_log = gs.shape[-1]  # logical intermediate width
    if bits == 8:
        kern = _swiglu_kernel_int8
        w_specs = [
            pl.BlockSpec((1, h, i_log), lambda b, be: (be[b], 0, 0)),
            pl.BlockSpec((1, 1, i_log), lambda b, be: (be[b], 0, 0)),
            pl.BlockSpec((1, h, i_log), lambda b, be: (be[b], 0, 0)),
            pl.BlockSpec((1, 1, i_log), lambda b, be: (be[b], 0, 0)),
            pl.BlockSpec((1, i_log, h), lambda b, be: (be[b], 0, 0)),
            pl.BlockSpec((1, 1, h), lambda b, be: (be[b], 0, 0)),
        ]
    else:
        group = gq.shape[1] // gs.shape[1]  # K / (K/g)
        kern = functools.partial(_swiglu_kernel_int4, group=group)
        ngh, ngi = gs.shape[1], ds.shape[1]
        w_specs = [
            pl.BlockSpec((1, h, i_log // 2), lambda b, be: (be[b], 0, 0)),
            pl.BlockSpec((1, ngh, i_log), lambda b, be: (be[b], 0, 0)),
            pl.BlockSpec((1, h, i_log // 2), lambda b, be: (be[b], 0, 0)),
            pl.BlockSpec((1, ngh, i_log), lambda b, be: (be[b], 0, 0)),
            pl.BlockSpec((1, i_log, h // 2), lambda b, be: (be[b], 0, 0)),
            pl.BlockSpec((1, ngi, h), lambda b, be: (be[b], 0, 0)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec((block, h), lambda b, be: (b, 0))] + w_specs,
        out_specs=pl.BlockSpec((block, h), lambda b, be: (b, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * block, h), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(be, xs_pad, gq, gs, uq, us, dq, ds)


# double-buffered per-expert weight budget for the fused SwiGLU kernel;
# geometries past this run as three K-chunked gathered matmuls
_FUSED_VMEM_BUDGET = 12 * 2**20


def _pick_block(m: int) -> int:
    if m <= 256:
        return 8
    if m <= 1024:
        return 32
    return 128


def routed_swiglu_quant(
    x: jax.Array,  # [T, H]
    topk_p: jax.Array,  # [T, k] f32 routing weights
    topk_i: jax.Array,  # [T, k] i32 expert ids
    gate_q: QuantizedTensor,  # [E, H, I]
    up_q: QuantizedTensor,  # [E, H, I]
    down_q: QuantizedTensor,  # [E, I, H]
    num_experts: int,
    *,
    input_scaled: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Quantized-expert routed SwiGLU; drop-in for the bf16
    ``_routed_swiglu`` (models/decoder.py) when the expert stacks were
    quantized by ``quantize_expert_stack``.

    ``input_scaled``: Llama-4 semantics — the routing weights scale the
    expert INPUTS (passing through the GLU nonlinearity) instead of the
    outputs (models/decoder.py moe_mlp_llama4)."""
    t, h = x.shape
    k = topk_i.shape[1]
    m = t * k
    use_pallas = interpret or jax.default_backend() == "tpu"
    if not use_pallas:
        # portable fallback: dequantize-then-ragged_dot (tests / CPU)
        from jax.lax import ragged_dot

        flat_expert = topk_i.reshape(-1)
        order = jnp.argsort(flat_expert)
        sorted_token = jnp.repeat(jnp.arange(t), k)[order]
        group_sizes = jnp.bincount(flat_expert[order], length=num_experts)
        weights = topk_p.reshape(-1)[order].astype(jnp.float32)
        xs = x[sorted_token]
        if input_scaled:
            xs = (xs.astype(jnp.float32) * weights[:, None]).astype(x.dtype)
        g = ragged_dot(
            xs, dequantize_expert_stack(gate_q, x.dtype), group_sizes
        )
        u = ragged_dot(
            xs, dequantize_expert_stack(up_q, x.dtype), group_sizes
        )
        hid = (
            jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
        ).astype(x.dtype)
        y = ragged_dot(
            hid, dequantize_expert_stack(down_q, x.dtype), group_sizes
        )
        y = y.astype(jnp.float32)
        if not input_scaled:
            y = y * weights[:, None]
        out = jax.ops.segment_sum(y, sorted_token, num_segments=t)
        return out.astype(x.dtype)

    block = _pick_block(m)
    be, gather, order, sorted_token = _block_map(
        topk_i, t, k, num_experts, block
    )
    weights = topk_p.reshape(-1)[order].astype(jnp.float32)
    xs = x[sorted_token].astype(jnp.bfloat16)  # [M, H]
    if input_scaled:
        xs = (xs.astype(jnp.float32) * weights[:, None]).astype(
            jnp.bfloat16
        )
    xs_pad = jnp.concatenate([xs, jnp.zeros((1, h), xs.dtype)])[gather]
    # fused whole-SwiGLU kernel holds gate+up+down for one expert in
    # VMEM (double-buffered); geometries past ~12 MB per expert
    # (Mixtral-class intermediate widths) run as three K-chunked
    # gathered matmuls instead
    i_log = gate_q.scale.shape[-1]
    per_expert = 3 * h * i_log * (1 if gate_q.bits == 8 else 0.5)
    if per_expert * 2 > _FUSED_VMEM_BUDGET:
        g = gathered_expert_matmul(
            xs_pad, be, gate_q, block=block, interpret=interpret
        ).astype(jnp.float32)
        u = gathered_expert_matmul(
            xs_pad, be, up_q, block=block, interpret=interpret
        ).astype(jnp.float32)
        hid = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
        y_pad = gathered_expert_matmul(
            hid, be, down_q, block=block, interpret=interpret
        )
    else:
        y_pad = _gathered_swiglu_call(
            be,
            xs_pad,
            gate_q.w_q, gate_q.scale,
            up_q.w_q, up_q.scale,
            down_q.w_q, down_q.scale,
            block=block,
            interpret=interpret,
        )  # [NB*B, H] bf16
    # padded blocks -> sorted rows: each valid sorted row appears in
    # exactly one block lane; invalid lanes all collide on index M and
    # are discarded
    inv = jnp.zeros((m + 1,), jnp.int32).at[gather].set(
        jnp.arange(gather.shape[0], dtype=jnp.int32)
    )
    y = y_pad[inv[:m]].astype(jnp.float32)
    if not input_scaled:
        y = y * weights[:, None]
    out = jax.ops.segment_sum(y, sorted_token, num_segments=t)
    return out.astype(x.dtype)


# ------------------------------------------------- generic chunked matmul
# A K-chunked gathered grouped matmul for expert geometries whose full
# per-expert weights exceed VMEM in the fused SwiGLU kernel (GPT-OSS
# 2880x5760 gate_up stacks), and for non-SwiGLU expert layouts. One
# pallas call computes y[b] = x[b] @ W[expert(b)] (+ bias[expert(b)]),
# accumulating over K chunks in a VMEM scratch.


def _gmm_kernel(
    be_ref,  # scalar prefetch [NB]
    x_ref,  # [B, Kc]
    wq_ref,  # int8 [1, Kc, N] / int4-packed [1, Kc, N/2]
    s_ref,  # int8 [1, 1, N] / int4 [1, Kc/g, N]
    b_ref,  # [1, N] f32 bias (zeros when absent)
    o_ref,  # [B, N] bf16
    acc_ref,  # VMEM scratch [B, N] f32
    *,
    bits: int,
    group: int,
    n_chunks: int,
):
    kc = pl.program_id(1)

    @pl.when(kc == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    if bits == 8:
        acc_ref[...] += jax.lax.dot_general(
            x, wq_ref[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        acc_ref[...] += _group_dot_int4(x, wq_ref[0], s_ref[0], group)

    @pl.when(kc == n_chunks - 1)
    def _():
        acc = acc_ref[...]
        if bits == 8:
            acc = acc * s_ref[0, 0].astype(jnp.float32)[None, :]
        o_ref[...] = (acc + b_ref[0].astype(jnp.float32)[None, :]).astype(
            o_ref.dtype
        )


def _pick_k_chunk(k: int, n: int, bits: int, group: int,
                  budget=6 * 2**20) -> int:
    """Largest K chunk that (a) divides K, (b) is a multiple of the
    int4 group, and (c) keeps the double-buffered weight block (+ int4
    unpack temps) within ``budget`` bytes of VMEM."""
    per_row = n if bits == 8 else n // 2 + 4 * n  # codes + bf16 lo/hi
    last = k
    for d in range(1, k + 1):
        if k % d:
            continue
        kc = k // d
        if group and kc % group:
            continue
        last = kc
        if kc * per_row * 2 <= budget:
            return kc
    return last


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _gathered_matmul_call(
    be, xs_pad, wq, s, bias, *, block: int, interpret: bool = False
):
    nb = be.shape[0]
    k = xs_pad.shape[1]
    bits = 8 if wq.dtype == jnp.int8 else 4
    n = s.shape[-1]
    group = (k // s.shape[1]) if bits == 4 else 0
    kc = _pick_k_chunk(k, n, bits, group)
    n_chunks = k // kc
    if bits == 8:
        w_spec = pl.BlockSpec((1, kc, n), lambda b, c, be: (be[b], c, 0))
        s_spec = pl.BlockSpec((1, 1, n), lambda b, c, be: (be[b], 0, 0))
    else:
        w_spec = pl.BlockSpec(
            (1, kc, n // 2), lambda b, c, be: (be[b], c, 0)
        )
        s_spec = pl.BlockSpec(
            (1, kc // group, n), lambda b, c, be: (be[b], c, 0)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, n_chunks),
        in_specs=[
            pl.BlockSpec((block, kc), lambda b, c, be: (b, c)),
            w_spec,
            s_spec,
            pl.BlockSpec((1, n), lambda b, c, be: (be[b], 0)),
        ],
        out_specs=pl.BlockSpec((block, n), lambda b, c, be: (b, 0)),
        scratch_shapes=[pltpu.VMEM((block, n), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(
            _gmm_kernel, bits=bits, group=group, n_chunks=n_chunks
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * block, n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(be, xs_pad, wq, s, bias)


def gathered_expert_matmul(
    xs_pad: jax.Array,  # [NB*B, K] bf16 (block-padded sorted rows)
    be: jax.Array,  # [NB] i32
    q: QuantizedTensor,  # [E, K, N]
    bias: jax.Array | None = None,  # [E, N]
    *,
    block: int,
    interpret: bool = False,
) -> jax.Array:
    """One gathered quantized grouped matmul over block-padded rows."""
    e = q.w_q.shape[0]
    n = q.scale.shape[-1]
    b = (
        bias.astype(jnp.float32)
        if bias is not None
        else jnp.zeros((e, n), jnp.float32)
    )
    return _gathered_matmul_call(
        be, xs_pad, q.w_q, q.scale, b, block=block, interpret=interpret
    )


# ------------------------------------------------------------ GPT-OSS MoE
def quantize_gpt_oss_experts(moe: dict, bits: int = 4,
                             group_size: int = 128) -> dict:
    """Quantize a GPT-OSS expert dict for the gathered kernels.

    HF stores ``gate_up_proj`` with gate/up INTERLEAVED along the
    output axis (models/decoder.py moe_mlp_gpt_oss slices 0::2/1::2);
    reorder to contiguous [gate | up] halves first so (a) the kernel
    epilogue slices halves, and (b) the int4 half-split nibble packing
    puts gate in the low nibble and up in the high nibble of the same
    byte. ``gate_up_b`` is reordered to match. Biases stay dense."""
    gu = moe["gate_up_w"]  # [E, H, 2I]
    e, h, i2 = gu.shape
    idx = jnp.concatenate(
        [jnp.arange(0, i2, 2), jnp.arange(1, i2, 2)]
    )  # interleaved -> [gate | up]
    out = dict(moe)
    out["gate_up_w"] = quantize_expert_stack(
        gu[:, :, idx], bits=bits, group_size=group_size
    )
    out["gate_up_b"] = moe["gate_up_b"][:, idx]
    out["down_w"] = quantize_expert_stack(
        moe["down_w"], bits=bits, group_size=group_size
    )
    return out


def routed_clamped_glu_quant(
    x: jax.Array,  # [T, H]
    topk_p: jax.Array,  # [T, k]
    topk_i: jax.Array,  # [T, k]
    gate_up_q: QuantizedTensor,  # [E, H, 2I], [gate | up] halves
    gate_up_b: jax.Array,  # [E, 2I], [gate | up] halves
    down_q: QuantizedTensor,  # [E, I, H]
    down_b: jax.Array,  # [E, H]
    num_experts: int,
    limit: float,
    *,
    interpret: bool = False,
) -> jax.Array:
    """GPT-OSS quantized experts: gathered gate_up matmul (+bias),
    clamped GLU epilogue in XLA, gathered down matmul (+bias), output
    weighting + segment sum (decoder.moe_mlp_gpt_oss semantics)."""
    t, h = x.shape
    k = topk_i.shape[1]
    m = t * k
    i2 = gate_up_b.shape[-1]
    inter = i2 // 2
    use_pallas = interpret or jax.default_backend() == "tpu"
    if not use_pallas:
        from jax.lax import ragged_dot

        flat_expert = topk_i.reshape(-1)
        order = jnp.argsort(flat_expert)
        sorted_expert = flat_expert[order]
        sorted_token = jnp.repeat(jnp.arange(t), k)[order]
        group_sizes = jnp.bincount(sorted_expert, length=num_experts)
        xs = x[sorted_token]
        gu = ragged_dot(
            xs, dequantize_expert_stack(gate_up_q, x.dtype), group_sizes
        ).astype(jnp.float32) + gate_up_b[sorted_expert].astype(jnp.float32)
        gate, up = gu[..., :inter], gu[..., inter:]
        gate = jnp.minimum(gate, limit)
        up = jnp.clip(up, -limit, limit)
        hidden = ((up + 1.0) * (gate * jax.nn.sigmoid(gate * 1.702))).astype(
            x.dtype
        )
        y = ragged_dot(
            hidden, dequantize_expert_stack(down_q, x.dtype), group_sizes
        ).astype(jnp.float32) + down_b[sorted_expert].astype(jnp.float32)
        weights = topk_p.reshape(-1)[order].astype(jnp.float32)
        out = jax.ops.segment_sum(
            y * weights[:, None], sorted_token, num_segments=t
        )
        return out.astype(x.dtype)

    block = _pick_block(m)
    be, gather, order, sorted_token = _block_map(
        topk_i, t, k, num_experts, block
    )
    xs = x[sorted_token].astype(jnp.bfloat16)
    xs_pad = jnp.concatenate([xs, jnp.zeros((1, h), xs.dtype)])[gather]
    gu = gathered_expert_matmul(
        xs_pad, be, gate_up_q, gate_up_b, block=block, interpret=interpret
    ).astype(jnp.float32)
    gate, up = gu[..., :inter], gu[..., inter:]
    gate = jnp.minimum(gate, limit)
    up = jnp.clip(up, -limit, limit)
    hidden = ((up + 1.0) * (gate * jax.nn.sigmoid(gate * 1.702))).astype(
        jnp.bfloat16
    )
    y = gathered_expert_matmul(
        hidden, be, down_q, down_b, block=block, interpret=interpret
    )
    inv = jnp.zeros((m + 1,), jnp.int32).at[gather].set(
        jnp.arange(gather.shape[0], dtype=jnp.int32)
    )
    yv = y[inv[:m]].astype(jnp.float32)
    weights = topk_p.reshape(-1)[order].astype(jnp.float32)
    out = jax.ops.segment_sum(
        yv * weights[:, None], sorted_token, num_segments=t
    )
    return out.astype(x.dtype)

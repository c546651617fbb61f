# SPDX-License-Identifier: Apache-2.0
"""Decode-specialized paged-attention Pallas kernel.

Round-3 ablations (NOTES_TPU_ENV.md) pinned ~5.5 ms of the 8B batch-32
step on the general ragged kernel's fixed costs — ~150 µs per call at
tiny context, vs a measured ~30 µs floor for a trivial pallas call. The
general kernel walks sequences through a sequential grid, so every
program pays its own DMA latency chain. Decode has a much simpler
shape — exactly ONE query row per slot — which this kernel exploits:

  * grid over SEQ-BLOCKS (``VLLM_MLX_TPU_DECODE_SB`` slots per
    program, default 8): each program issues the page copies for all
    its slots in one wave, so DMA latency amortizes across the block
    instead of serializing per sequence;
  * double-buffered page-chunk loop bounded by the slots' ACTUAL
    lengths (the page-count loop bound is the max over the block's
    slots, not the table width); ``VLLM_MLX_TPU_DECODE_BPC`` pages per
    chunk (default 2) — bigger chunks = fewer loop iterations at the
    cost of VMEM scratch (the kernel raises the pallas VMEM limit
    above the 16 MB default when needed; v5e has 128 MB physical);
  * optional seq×head-batched dot formulation
    (``VLLM_MLX_TPU_DECODE_BATCHED=1``): q reshaped
    ``[sb, kvh, g, hd] -> [sb*kvh, g, hd]`` (leading-dim merge) with
    per-head K/V chunks lifted and concatenated on a leading axis so
    each chunk runs ONE dot_general pair instead of ``kvh``. Measured
    SLOWER on the real 8B batch-32 step (1,783 vs 2,146 tok/s) — the
    per-head assembly copies cost more than the dot savings at decode
    chunk sizes — kept off by default, retained for future geometries.

Scope (falls back to the general kernel otherwise): no attention sinks,
no logit softcap, no sliding window, single chip (the TP shard_map path
keeps the general kernel). KV pages may be bf16/f32 or int8/fp8 with
k/v scales — dequantized on read like the general kernel.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Defaults are the measured-best config on the real v5e at bench
# geometry (8B batch-32: sb8/bpc2/per-head 2,146 tok/s vs sb16/bpc4/
# batched 1,783 — bigger blocks and the seq×head-batched dot both LOST
# on the real step despite looking competitive in the chained
# micro-harness; see NOTES_TPU_ENV.md round-4 findings). Env knobs kept
# for sweeps.
SEQ_BLOCK = int(os.environ.get("VLLM_MLX_TPU_DECODE_SB", 8))
PAGES_PER_CHUNK = int(os.environ.get("VLLM_MLX_TPU_DECODE_BPC", 2))
BATCHED_HEADS = os.environ.get("VLLM_MLX_TPU_DECODE_BATCHED", "0") != "0"


def _kernel(
    # scalar prefetch
    tables_ref,  # [S, B] SMEM
    lens_ref,  # [S] SMEM
    # inputs
    q_ref,  # [SB, kvh, g, hd] VMEM
    pages_hbm,  # [P, ps, 2*kvh, hd] ANY (HBM)
    # outputs
    out_ref,  # [SB, kvh, g, hd] VMEM
    # scratch
    kv_buf,  # [2, SB, bpc, ps, 2*kvh, hd] VMEM
    sems,  # [2, SB, bpc] DMA
    **kw,
):
    _impl(
        tables_ref, lens_ref, q_ref, pages_hbm, None, out_ref, None,
        kv_buf, sems, None, **kw,
    )


def _kernel_fused(
    # scalar prefetch
    tables_ref,
    lens_ref,
    # inputs
    q_ref,
    pages_hbm,
    kvn_ref,  # [SB, 2*kvh, hd] VMEM — current token's K/V (pool dtype)
    # outputs
    out_ref,
    pages_out_ref,  # aliased with pages_hbm (in-place pool update)
    # scratch
    kv_buf,
    sems,
    wsem,  # [SB] DMA — per-slot pool-row write
    **kw,
):
    _impl(
        tables_ref, lens_ref, q_ref, pages_hbm, kvn_ref, out_ref,
        pages_out_ref, kv_buf, sems, wsem, **kw,
    )


def _impl(
    tables_ref,
    lens_ref,
    q_ref,
    pages_hbm,
    kvn_ref,
    out_ref,
    pages_out_ref,
    kv_buf,
    sems,
    wsem,
    *,
    sb: int,
    bpc: int,
    ps: int,
    kvh: int,
    g: int,
    hd: int,
    scale: float,
    k_scale: Optional[float],
    v_scale: Optional[float],
    batched_heads: bool,
):
    i = pl.program_id(0)
    s0 = i * sb
    ct = bpc * ps
    fused = kvn_ref is not None

    def row_writes():
        """One async HBM row write per active slot: the current token's
        K/V lands at flat position ``len - 1`` of its page chain while
        attention reads overlap (the in-flight chunk row is PATCHED in
        VMEM below, so the read value of that row never matters)."""
        out = []
        for j in range(sb):
            ln = lens_ref[s0 + j]
            pos = jnp.maximum(ln - 1, 0)  # ln=0 slots never start
            out.append(
                (
                    ln > 0,
                    pltpu.make_async_copy(
                        kvn_ref.at[j],
                        pages_out_ref.at[
                            tables_ref[s0 + j, pos // ps], pos % ps
                        ],
                        wsem.at[j],
                    ),
                )
            )
        return out

    if fused:
        for cond, w in row_writes():
            @pl.when(cond)
            def _():
                w.start()

    # per-slot lengths (0 = inactive -> fully masked, no DMA); Mosaic
    # rejects 1D scalar-stacks, so keep everything scalar or 2D
    max_len = lens_ref[s0]
    for j in range(1, sb):
        max_len = jnp.maximum(max_len, lens_ref[s0 + j])
    n_chunks = pl.cdiv(max_len, ct)
    if batched_heads:
        # row r of the merged [sb*kvh] batch belongs to slot r // kvh
        lens2 = jnp.concatenate(
            [
                jnp.full((kvh, 1), lens_ref[s0 + j], jnp.int32)
                for j in range(sb)
            ],
            axis=0,
        )  # [sb*kvh, 1]
    else:
        lens2 = jnp.concatenate(
            [
                jnp.full((1, 1), lens_ref[s0 + j], jnp.int32)
                for j in range(sb)
            ],
            axis=0,
        )  # [sb, 1]

    def dmas(c, slot):
        out = []
        for j in range(sb):
            for b in range(bpc):
                page_idx = c * bpc + b
                out.append(
                    (
                        page_idx * ps < lens_ref[s0 + j],
                        pltpu.make_async_copy(
                            pages_hbm.at[tables_ref[s0 + j, page_idx]],
                            kv_buf.at[slot, j, b],
                            sems.at[slot, j, b],
                        ),
                    )
                )
        return out

    def start_chunk(c, slot):
        for cond, d in dmas(c, slot):
            @pl.when(cond)
            def _():
                d.start()

    def wait_chunk(c, slot):
        for cond, d in dmas(c, slot):
            @pl.when(cond)
            def _():
                d.wait()

    @pl.when(n_chunks > 0)
    def _():
        start_chunk(0, 0)

    q = q_ref[...]  # [sb, kvh, g, hd] (input dtype)
    if batched_heads:
        q2 = q.reshape(sb * kvh, g, hd)  # leading-dim merge: legal

    s_mult = scale * (k_scale if k_scale is not None else 1.0)

    def assemble_kv(kv):
        """[sb, bpc, ps, 2kvh, hd] -> K, V as [sb*kvh, ct, hd].

        Mosaic constraints shape everything here: ONE batch dim per
        matmul, no reshapes that touch tiled (sublane/lane) dims, no
        >2D gathers. So: slice each head off the tiled combined-head
        dim, CONCAT the chunk's pages along the kv axis (a plain
        copy), lift each head to [sb, 1, ct, hd] (leading split) and
        concat heads on the new leading axis, then merge the two
        leading dims."""
        k_parts, v_parts = [], []
        for h in range(kvh):
            k_h = jnp.concatenate(
                [kv[:, b, :, 2 * h, :] for b in range(bpc)], axis=1
            )  # [sb, ct, hd] pool dtype
            v_h = jnp.concatenate(
                [kv[:, b, :, 2 * h + 1, :] for b in range(bpc)], axis=1
            )
            if k_h.dtype not in (jnp.bfloat16, jnp.float32):
                k_h = k_h.astype(jnp.bfloat16)
                v_h = v_h.astype(jnp.bfloat16)
            k_parts.append(k_h.reshape(sb, 1, ct, hd))
            v_parts.append(v_h.reshape(sb, 1, ct, hd))
        k_all = jnp.concatenate(k_parts, axis=1).reshape(sb * kvh, ct, hd)
        v_all = jnp.concatenate(v_parts, axis=1).reshape(sb * kvh, ct, hd)
        return k_all, v_all

    def body_batched(c, carry):
        m_prev, l_prev, acc = carry  # [sb*kvh, g] x2, [sb*kvh, g, hd]
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            start_chunk(c + 1, (c + 1) % 2)

        wait_chunk(c, slot)
        # dynamic scratch-slot reads lower to an unsupported >2D
        # gather; select between the two double-buffer halves with
        # statically-indexed reads instead
        kv = jax.lax.cond(
            slot == 0, lambda: kv_buf[0], lambda: kv_buf[1]
        )  # [sb, bpc, ps, 2*kvh, hd]
        k_all, v_all = assemble_kv(kv)
        cols = c * ct + jax.lax.broadcasted_iota(
            jnp.int32, (sb * kvh, 1, ct), 2
        )
        valid = cols < lens2[:, :, None]  # [sb*kvh, 1, ct]
        vcols = c * ct + jax.lax.broadcasted_iota(
            jnp.int32, (sb * kvh, ct, 1), 1
        )
        vvalid = vcols < lens2[:, :, None]  # [sb*kvh, ct, 1]
        # zero un-copied (beyond-length) V columns: their attention
        # probability is 0, but 0 * garbage is NaN when the scratch
        # page was never DMA'd (interpret mode initializes to NaN)
        v_all = jnp.where(vvalid, v_all, 0)
        # dots run in the pool dtype (bf16/int8-as-bf16) with f32
        # accumulation; uniform dequant scales fold into the OUTPUTS so
        # no dequantized KV copy ever materializes
        s = jax.lax.dot_general(
            q2, k_all,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * s_mult  # [sb*kvh, g, ct]
        s = jnp.where(valid, s, -jnp.inf)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        alpha = jnp.exp(m_prev - m_new)  # [sb*kvh, g]
        p = jnp.exp(s - m_new[..., None])  # [sb*kvh, g, ct]
        l_new = alpha * l_prev + jnp.sum(p, axis=-1)
        pv = jax.lax.dot_general(
            p.astype(v_all.dtype), v_all,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [sb*kvh, g, hd]
        if v_scale is not None:
            pv = pv * v_scale
        acc = acc * alpha[..., None] + pv
        return m_new, l_new, acc

    def body_per_head(c, carry):
        m_prev, l_prev, acc = carry
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            start_chunk(c + 1, (c + 1) % 2)

        wait_chunk(c, slot)
        kv = jax.lax.cond(
            slot == 0, lambda: kv_buf[0], lambda: kv_buf[1]
        )  # [sb, bpc, ps, 2*kvh, hd]
        cols = c * ct + jax.lax.broadcasted_iota(
            jnp.int32, (sb, 1, ct), 2
        )
        valid = cols < lens2[:, :, None]  # [sb, 1, ct]
        vcols = c * ct + jax.lax.broadcasted_iota(
            jnp.int32, (sb, ct, 1), 1
        )
        vvalid = vcols < lens2[:, :, None]  # [sb, ct, 1]
        if fused:
            # the current token's row is being DMA-written to HBM
            # concurrently — substitute the VMEM copy of its K/V
            newmask = vcols == lens2[:, :, None] - 1  # [sb, ct, 1]
        m_new_l, l_new_l, acc_l = [], [], []
        for h in range(kvh):
            k_h = jnp.concatenate(
                [kv[:, b, :, 2 * h, :] for b in range(bpc)], axis=1
            )  # [sb, ct, hd] pool dtype
            v_h = jnp.concatenate(
                [kv[:, b, :, 2 * h + 1, :] for b in range(bpc)], axis=1
            )
            if fused:
                k_h = jnp.where(newmask, kvn_ref[:, 2 * h, :][:, None], k_h)
                v_h = jnp.where(
                    newmask, kvn_ref[:, 2 * h + 1, :][:, None], v_h
                )
            if k_h.dtype not in (jnp.bfloat16, jnp.float32):
                k_h = k_h.astype(jnp.bfloat16)
                v_h = v_h.astype(jnp.bfloat16)
            v_h = jnp.where(vvalid, v_h, 0)
            s_h = jax.lax.dot_general(
                q[:, h], k_h,
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * s_mult  # [sb, g, ct]
            s_h = jnp.where(valid, s_h, -jnp.inf)
            m_h = jnp.maximum(m_prev[:, h], jnp.max(s_h, axis=-1))
            alpha_h = jnp.exp(m_prev[:, h] - m_h)  # [sb, g]
            p_h = jnp.exp(s_h - m_h[..., None])  # [sb, g, ct]
            l_h = alpha_h * l_prev[:, h] + jnp.sum(p_h, axis=-1)
            pv_h = jax.lax.dot_general(
                p_h.astype(v_h.dtype), v_h,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [sb, g, hd]
            if v_scale is not None:
                pv_h = pv_h * v_scale
            acc_l.append(acc[:, h] * alpha_h[..., None] + pv_h)
            m_new_l.append(m_h)
            l_new_l.append(l_h)
        m_new = jnp.stack(m_new_l, axis=1)  # [sb, kvh, g]
        l_new = jnp.stack(l_new_l, axis=1)
        acc = jnp.stack(acc_l, axis=1)  # [sb, kvh, g, hd]
        return m_new, l_new, acc

    if batched_heads:
        assert not fused, "fused KV write requires the per-head path"
        init = (
            jnp.full((sb * kvh, g), -jnp.inf, jnp.float32),
            jnp.zeros((sb * kvh, g), jnp.float32),
            jnp.zeros((sb * kvh, g, hd), jnp.float32),
        )
        m, l, acc = jax.lax.fori_loop(0, n_chunks, body_batched, init)
        l_safe = jnp.where(l > 0, l, 1.0)
        out = (acc / l_safe[..., None]).astype(out_ref.dtype)
        out_ref[...] = out.reshape(sb, kvh, g, hd)  # leading split
    else:
        init = (
            jnp.full((sb, kvh, g), -jnp.inf, jnp.float32),
            jnp.zeros((sb, kvh, g), jnp.float32),
            jnp.zeros((sb, kvh, g, hd), jnp.float32),
        )
        m, l, acc = jax.lax.fori_loop(0, n_chunks, body_per_head, init)
        l_safe = jnp.where(l > 0, l, 1.0)
        out_ref[...] = (acc / l_safe[..., None]).astype(out_ref.dtype)
    if fused:
        for cond, w in row_writes():
            @pl.when(cond)
            def _():
                w.wait()


@functools.partial(
    jax.jit,
    static_argnames=("scale", "k_scale", "v_scale", "interpret"),
)
def decode_paged_attention(
    q: jax.Array,  # [S, qh, hd] — row i belongs to SLOT i
    pages: jax.Array,  # [P, ps, 2*kvh, hd]
    kv_lens: jax.Array,  # [S] valid length incl. current token (0 = skip)
    block_tables: jax.Array,  # [S, B]
    scale: float,
    k_scale: Optional[float] = None,
    v_scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    s, qh, hd = q.shape
    _, ps, ch, _ = pages.shape
    kvh = ch // 2
    g = qh // kvh
    sb = min(SEQ_BLOCK, s)
    pad_s = (-s) % sb
    if pad_s:
        q = jnp.pad(q, ((0, pad_s), (0, 0), (0, 0)))
        kv_lens = jnp.pad(kv_lens, (0, pad_s))
        block_tables = jnp.pad(block_tables, ((0, pad_s), (0, 0)))
    sp = s + pad_s
    bpc = min(PAGES_PER_CHUNK, block_tables.shape[1])
    pad_b = (-block_tables.shape[1]) % bpc
    if pad_b:
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad_b)))

    q4 = q.reshape(sp, kvh, g, hd)
    kernel = functools.partial(
        _kernel,
        sb=sb,
        bpc=bpc,
        ps=ps,
        kvh=kvh,
        g=g,
        hd=hd,
        scale=scale,
        k_scale=k_scale,
        v_scale=v_scale,
        batched_heads=BATCHED_HEADS,
    )
    # double-buffered chunk scratch; default pallas VMEM budget is
    # 16 MB — raise it to fit large (sb, bpc) blocks plus the bf16
    # K/V chunk copies and softmax intermediates (v5e: 128 MB physical)
    kv_buf_bytes = 2 * sb * bpc * ps * 2 * kvh * hd * pages.dtype.itemsize
    chunk_bytes = 2 * sb * kvh * bpc * ps * hd * 2  # bf16 K/V copies
    vmem_limit = min(
        120 * 2**20, max(24 * 2**20, 2 * kv_buf_bytes + 3 * chunk_bytes)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(sp // sb,),
        in_specs=[
            pl.BlockSpec(
                (sb, kvh, g, hd),
                lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (sb, kvh, g, hd),
            lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, sb, bpc, ps, 2 * kvh, hd), pages.dtype),
            pltpu.SemaphoreType.DMA((2, sb, bpc)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((sp, kvh, g, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(block_tables.astype(jnp.int32), kv_lens.astype(jnp.int32), q4, pages)
    return out.reshape(sp, qh, hd)[:s]


@functools.partial(
    jax.jit,
    static_argnames=("scale", "k_scale", "v_scale", "interpret"),
)
def decode_paged_attention_write(
    q: jax.Array,  # [S, qh, hd] — row i belongs to SLOT i
    pages: jax.Array,  # [P, ps, 2*kvh, hd] (DONATED via aliasing)
    kv_new: jax.Array,  # [S, 2*kvh, hd] current token's K/V (unquantized)
    kv_lens: jax.Array,  # [S] valid length INCL. current token (0 = skip)
    block_tables: jax.Array,  # [S, B]
    scale: float,
    k_scale: Optional[float] = None,
    v_scale: Optional[float] = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused decode attention + KV-pool write.

    The separate per-layer XLA scatter (ops/ragged_attention.py
    write_kv_pages) costs ~40 µs/layer of fixed dispatch inside the 8B
    decode step (round-5 ablation: dummyattn - noattn = 2.6 ms/step =
    scatters + 36 trivial calls). This variant writes the current
    token's pool row from INSIDE the kernel (one async HBM row copy per
    slot, overlapped with the chunk loop) and substitutes the row's
    VMEM value in the in-flight chunk, eliminating the scatter op
    entirely. ``pages`` is aliased into the second output — callers
    must treat the input as consumed.
    """
    if BATCHED_HEADS:
        raise NotImplementedError("fused write requires per-head path")
    s, qh, hd = q.shape
    _, ps, ch, _ = pages.shape
    kvh = ch // 2
    g = qh // kvh
    sb = min(SEQ_BLOCK, s)
    pad_s = (-s) % sb
    # pool-dtype conversion outside the kernel (cheap XLA elementwise;
    # int8 pools store value / k_scale — write_kv_pages semantics)
    if pages.dtype == jnp.int8:
        scaled = kv_new.astype(jnp.float32) * (1.0 / (k_scale or 1.0))
        kvn = jnp.clip(jnp.round(scaled), -127, 127).astype(jnp.int8)
    else:
        kvn = kv_new.astype(pages.dtype)
    if pad_s:
        q = jnp.pad(q, ((0, pad_s), (0, 0), (0, 0)))
        kv_lens = jnp.pad(kv_lens, (0, pad_s))
        block_tables = jnp.pad(block_tables, ((0, pad_s), (0, 0)))
        kvn = jnp.pad(kvn, ((0, pad_s), (0, 0), (0, 0)))
    sp = s + pad_s
    bpc = min(PAGES_PER_CHUNK, block_tables.shape[1])
    pad_b = (-block_tables.shape[1]) % bpc
    if pad_b:
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad_b)))

    q4 = q.reshape(sp, kvh, g, hd)
    kernel = functools.partial(
        _kernel_fused,
        sb=sb,
        bpc=bpc,
        ps=ps,
        kvh=kvh,
        g=g,
        hd=hd,
        scale=scale,
        k_scale=k_scale,
        v_scale=v_scale,
        batched_heads=False,
    )
    kv_buf_bytes = 2 * sb * bpc * ps * 2 * kvh * hd * pages.dtype.itemsize
    chunk_bytes = 2 * sb * kvh * bpc * ps * hd * 2
    vmem_limit = min(
        120 * 2**20, max(24 * 2**20, 2 * kv_buf_bytes + 3 * chunk_bytes)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(sp // sb,),
        in_specs=[
            pl.BlockSpec(
                (sb, kvh, g, hd),
                lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (sb, 2 * kvh, hd),
                lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (sb, kvh, g, hd),
                lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, sb, bpc, ps, 2 * kvh, hd), pages.dtype),
            pltpu.SemaphoreType.DMA((2, sb, bpc)),
            pltpu.SemaphoreType.DMA((sb,)),
        ],
    )
    out, new_pages = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((sp, kvh, g, hd), q.dtype),
            jax.ShapeDtypeStruct(pages.shape, pages.dtype),
        ],
        # flattened input index 3 = pages (after 2 scalar-prefetch args
        # and q4); output index 1 = the pass-through pool
        input_output_aliases={3: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(
        block_tables.astype(jnp.int32),
        kv_lens.astype(jnp.int32),
        q4,
        pages,
        kvn,
    )
    return out.reshape(sp, qh, hd)[:s], new_pages

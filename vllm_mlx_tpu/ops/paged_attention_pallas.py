# SPDX-License-Identifier: Apache-2.0
"""Pallas TPU paged-attention decode kernel (SUPERSEDED, kept as a
reference implementation).

The serving engine now uses ``ops.ragged_attention`` (the
ragged_paged_attention kernel) for both prefill and decode; measured on
this platform, this hand-rolled per-slot chunked-DMA kernel is far
slower at small grid sizes (see NOTES_TPU_ENV.md). It remains wired as
the TPU path of the legacy ``ops.attention.paged_attention_decode``
(used by parity tests) and as a worked example of scalar-prefetch +
double-buffered DMA + online softmax in Pallas.

The XLA fallback in ``ops.attention`` materializes the gathered context
``[S, max_blocks*block, kvh, hd]`` every step — O(max context) HBM
traffic regardless of actual sequence lengths. This kernel instead:

  * reads each sequence's *actual* blocks only (``seq_lens`` bounds the
    chunk loop) via double-buffered async DMA from the HBM pool,
  * computes online-softmax flash attention per (slot, kv-head group)
    entirely in VMEM,
  * never materializes the gathered KV in HBM.

Grid: one program per batch slot. Block tables and sequence lengths are
scalar-prefetched so DMA addresses are known before the body runs.

This is the TPU-native answer to the role mlx-lm's Metal attention plays
in the reference's decode hot loop (reference scheduler.py:2491 ->
BatchGenerator._step; SURVEY.md section 7 "hard parts" #2).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCKS_PER_CHUNK = 8


def _decode_kernel(
    # scalar prefetch
    tables_ref,  # [S, max_blk] SMEM
    lens_ref,  # [S] SMEM
    # inputs
    q_ref,  # [1, kvh, g, hd] VMEM (this slot's queries)
    kv_hbm,  # [L, 2, nb, bs, kvh, hd] HBM (full pool; no slice copy)
    # outputs
    out_ref,  # [1, kvh, g, hd] VMEM
    # scratch
    k_buf,  # [2, bpc, bs, kvh, hd] VMEM
    v_buf,
    m_ref,  # [kvh, g] VMEM f32
    l_ref,  # [kvh, g] VMEM f32
    acc_ref,  # [kvh, g, hd] VMEM f32
    k_sems,  # [2, bpc] DMA sems
    v_sems,
    *,
    layer: int,
    bs: int,
    bpc: int,
    kvh: int,
    g: int,
    hd: int,
    scale: float,
):
    i = pl.program_id(0)
    seq_len = lens_ref[i]
    ct = bpc * bs
    n_chunks = pl.cdiv(seq_len, ct)

    def chunk_dmas(c, slot):
        out = []
        for b in range(bpc):
            blk_idx = c * bpc + b
            bid = tables_ref[i, blk_idx]
            out.append(
                (
                    blk_idx * bs < seq_len,
                    pltpu.make_async_copy(
                        kv_hbm.at[layer, 0, bid],
                        k_buf.at[slot, b],
                        k_sems.at[slot, b],
                    ),
                    pltpu.make_async_copy(
                        kv_hbm.at[layer, 1, bid],
                        v_buf.at[slot, b],
                        v_sems.at[slot, b],
                    ),
                )
            )
        return out

    def start_chunk(c, slot):
        for cond, kd, vd in chunk_dmas(c, slot):
            @pl.when(cond)
            def _():
                kd.start()
                vd.start()

    def wait_chunk(c, slot):
        for cond, kd, vd in chunk_dmas(c, slot):
            @pl.when(cond)
            def _():
                kd.wait()
                vd.wait()

    m_ref[:] = jnp.full((kvh, g), -jnp.inf, jnp.float32)
    l_ref[:] = jnp.zeros((kvh, g), jnp.float32)
    acc_ref[:] = jnp.zeros((kvh, g, hd), jnp.float32)

    @pl.when(n_chunks > 0)
    def _():
        start_chunk(0, 0)

    def body(c, _):
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            start_chunk(c + 1, (c + 1) % 2)

        wait_chunk(c, slot)
        kk = k_buf[slot].reshape(ct, kvh, hd)
        vv = v_buf[slot].reshape(ct, kvh, hd)
        cols = c * ct + jax.lax.broadcasted_iota(jnp.int32, (1, ct), 1)
        valid = cols < seq_len  # [1, ct]
        for j in range(kvh):
            qj = q_ref[0, j].astype(jnp.float32)  # [g, hd]
            kj = kk[:, j, :].astype(jnp.float32)  # [ct, hd]
            vj = vv[:, j, :].astype(jnp.float32)
            s = (
                jax.lax.dot_general(
                    qj,
                    kj,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )  # [g, ct]
            s = jnp.where(valid, s, -jnp.inf)
            m_prev = m_ref[j]  # [g]
            l_prev = l_ref[j]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new[:, None])  # [g, ct]
            l_ref[j] = alpha * l_prev + jnp.sum(p, axis=-1)
            m_ref[j] = m_new
            acc_ref[j] = acc_ref[j] * alpha[:, None] + jax.lax.dot_general(
                p, vj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)

    l = l_ref[:]
    l_safe = jnp.where(l > 0, l, 1.0)
    out_ref[0] = (acc_ref[:] / l_safe[:, :, None]).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("layer", "scale", "blocks_per_chunk", "interpret"),
)
def paged_attention_decode_tpu(
    q: jax.Array,  # [S, num_heads, hd]
    kv_pool: jax.Array,  # [L, 2, nb, bs, kvh, hd]
    layer: int,
    block_tables: jax.Array,  # [S, max_blk] i32
    seq_lens: jax.Array,  # [S] i32 (valid kv length incl. current token)
    scale: float,
    blocks_per_chunk: int = DEFAULT_BLOCKS_PER_CHUNK,
    interpret: bool = False,
) -> jax.Array:
    s, num_heads, hd = q.shape
    _, _, nb, bs, kvh, _ = kv_pool.shape
    g = num_heads // kvh
    max_blk = block_tables.shape[1]
    bpc = min(blocks_per_chunk, max_blk)
    # Pad the table so static chunk unrolls never index past the end.
    pad = (-max_blk) % bpc
    if pad:
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad)))

    q4 = q.reshape(s, kvh, g, hd)
    kernel = functools.partial(
        _decode_kernel,
        layer=layer,
        bs=bs,
        bpc=bpc,
        kvh=kvh,
        g=g,
        hd=hd,
        scale=scale,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s,),
        in_specs=[
            pl.BlockSpec(
                (1, kvh, g, hd), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, kvh, g, hd), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bpc, bs, kvh, hd), kv_pool.dtype),
            pltpu.VMEM((2, bpc, bs, kvh, hd), kv_pool.dtype),
            pltpu.VMEM((kvh, g), jnp.float32),
            pltpu.VMEM((kvh, g), jnp.float32),
            pltpu.VMEM((kvh, g, hd), jnp.float32),
            pltpu.SemaphoreType.DMA((2, bpc)),
            pltpu.SemaphoreType.DMA((2, bpc)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, kvh, g, hd), q.dtype),
        interpret=interpret,
    )(block_tables, seq_lens, q4, kv_pool)
    return out.reshape(s, num_heads, hd)

# SPDX-License-Identifier: Apache-2.0
"""One-dispatch stacked-decode megakernel.

Round-4 ablations (NOTES_TPU_ENV.md) proved the per-layer dispatch
structure itself caps 8B batch-32 decode at 2,331 tok/s: replacing all
36 decode-attention kernels with TRIVIAL pallas calls (zero attention
work) still spends ~65 us of fixed cost per call, while removing them
entirely runs at 2,814. No per-layer kernel can beat that floor, so
this module fuses the ENTIRE decoder stack — all L layers' norms,
int8 W8A8 projections, rope, paged attention, and SwiGLU — into ONE
pallas call per decode step:

  * weights live STACKED per projection (``[L, O, K]`` int8) and stream
    through VMEM ring buffers chunk by chunk via manual async DMA; the
    static chunk schedule starts chunk t+2 while computing chunk t, so
    layer l+1's weights prefetch under layer l's compute/attention and
    the step stays weight-DMA-bound (the roofline) instead of
    dispatch-bound;
  * the KV pool is stacked too (``[L*P, ps, 2*kvh, hd]``, layer l's
    pages at rows ``[l*P, (l+1)*P)``) so one ref serves every layer's
    page DMAs inside the ``fori_loop`` over layers;
  * attention reads only PAST tokens from the pool and merges the
    current token's K/V (still in registers) into the flash state; the
    per-layer new K/V is DMA'd out and scattered into the pool by the
    caller in ONE scatter for all layers (vs 36 before);
  * per-layer small constants (norm rows, dequant scale rows, tiled
    qk-norm weights) are stacked ``[L, 1, W]`` and DMA'd a layer ahead.

Numerics mirror the per-layer path exactly: f32 RMS statistics,
dynamic per-row int8 activation quantization (ops/quant.py
quant_matmul), bf16 q/k/v with f32 rope, flash softmax with f32
accumulators, bf16 residual stream. The current token's K/V is
fake-quantized through the pool dtype so scores match what a
write-then-read of the quantized pool would produce.

Mosaic constraints that shaped the code (see NOTES_TPU_ENV.md):
reshapes may only merge/split leading dims (head views are assembled
with static lane slices + concat), broadcasts of lane-OFFSET slices are
unimplemented (scale rows apply at full assembled width), dynamic
sublane loads from VMEM are illegal (per-layer constants DMA through
``[L, 1, W]`` HBM refs), and rotate-half is a single lane
``pltpu.roll`` (no lane-dim reshape needed).

Reference parity: this replaces the reference's per-layer mlx-lm decode
step (reference scheduler.py:189-696) on the decode fast path; the
scope gate (ops eligible / fallback) is in :func:`eligible`.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]

# pages per attention KV chunk (ct = KV_BPC * page_size tokens)
KV_BPC = 2
# weight ring depths: A serves qkv/gate_up/down chunks ([CH, H]),
# B serves o chunks ([CH, NH*HD])
DEPTH_A = 3
DEPTH_B = 2

# timing-only ablations (WRONG OUTPUTS) — attribute megakernel step
# time between the weight-stream pipeline, KV page DMAs, and attention
# compute. Driven by bench_8b.py / bench.py argv, never by serving.
_ABLATION = {"noattn": False, "nokvdma": False}


def set_stacked_ablation(
    noattn: bool = False, nokvdma: bool = False
) -> None:
    _ABLATION["noattn"] = noattn
    _ABLATION["nokvdma"] = nokvdma


# pipeline geometry (results-preserving; tunable for on-chip sweeps).
# Deep weight rings are the round-5 fix for the round-4 megakernel
# regression: the attention phase consumes no weight chunks, so with
# shallow rings the DMA engines idle for its whole duration every
# layer (~130 us x 36 at 8B — the measured 4.7 ms/step gap between
# full and noattn ablations). Ring capacity must buffer the stream
# across that bubble, and several outstanding copies are also what
# lets the DMA engines reach peak HBM bandwidth.
_TUNING = {
    "ch_cap": 2048,
    "depth_a": DEPTH_A,
    "depth_b": DEPTH_B,
    "kv_bpc": KV_BPC,
}


def set_stacked_tuning(**kw) -> None:
    for k, v in kw.items():
        if k not in _TUNING:
            raise KeyError(k)
        _TUNING[k] = int(v)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "qkv_w", "qkv_s", "o_w", "o_s", "gu_w", "gu_s", "d_wt", "d_s",
        "in_ln", "post_ln", "qn", "kn",
    ),
    meta_fields=(),
)
@dataclass
class StackedLayers:
    """Stacked decoder-layer weights (one leaf per projection).

    Prefill/verify steps slice these per layer at trace time (a static
    leading-dim slice feeding a dot costs nothing on TPU — measured at
    roofline vs per-layer arrays); the decode megakernel streams them
    directly via DMA.
    """

    qkv_w: jax.Array  # [L, (NH+2*KVH)*HD, H] int8
    qkv_s: jax.Array  # [L, 1, (NH+2*KVH)*HD] f32
    o_w: jax.Array  # [L, H, NH*HD] int8
    o_s: jax.Array  # [L, 1, H] f32
    gu_w: jax.Array  # [L, 2*I, H] int8
    gu_s: jax.Array  # [L, 1, 2*I] f32
    d_wt: jax.Array  # [L, I, H] int8 — down_proj TRANSPOSED
    d_s: jax.Array  # [L, 1, H] f32
    in_ln: jax.Array  # [L, 1, H] f32
    post_ln: jax.Array  # [L, 1, H] f32
    qn: Optional[jax.Array]  # [L, NH, HD] f32 (per-head-tiled) or None
    kn: Optional[jax.Array]  # [L, KVH, HD] f32 or None


def _chunk_rows(qko: int, h: int, i2: int, i_sz: int) -> int:
    """Largest chunk row count <= ch_cap (default 2048) dividing every
    A-ring row count (qkv, gate_up, down-transposed) and H (o chunks)."""
    g = np.gcd.reduce([qko, i2, i_sz, h])
    ch = int(g)
    while ch > _TUNING["ch_cap"]:
        ch //= 2
    return ch


def _build_schedule(
    nq: int, no: int, ng: int, nd: int, da: int, db: int
):
    """Static per-layer chunk schedule with ring-depth-deep prefetch.

    Returns (chunks, starts_after, prologue) where chunks[t] =
    (kind, idx, ring, slot) in consumption order and starts_after[t]
    lists (chunk_pos, next_layer) DMA starts issued after computing
    chunk t. Each ring runs at its FULL depth: ring chunk i starts the
    moment its slot's previous occupant (ring chunk i-D) is consumed,
    so up to D-1 chunks are in flight/buffered ahead — enough to keep
    the DMA engines busy through the attention phase (which consumes
    no weight chunks) and to hold several outstanding copies (DMA
    engines need that to reach peak HBM bandwidth). The first D chunks
    of each ring belong to the prologue for layer 0 and, for layer
    l+1, start as soon as their slot's LAST layer-l occupant is
    consumed — deep cross-layer prefetch. Verified by simulation: a
    slot is never overwritten before its previous occupant is
    consumed."""
    chunks = []
    a_list: List[int] = []
    b_list: List[int] = []
    for kind, n in (("qkv", nq), ("o", no), ("gu", ng), ("d", nd)):
        ring = "B" if kind == "o" else "A"
        lst = b_list if ring == "B" else a_list
        depth = db if ring == "B" else da
        for c in range(n):
            chunks.append((kind, c, ring, len(lst) % depth))
            lst.append(len(chunks) - 1)
    nch = len(chunks)
    assert nq >= 2 and nch >= 4, "geometry too small for the pipeline"
    starts_after: List[List[Tuple[int, bool]]] = [[] for _ in range(nch)]
    prologue: List[int] = []
    for idxs, depth in ((a_list, da), (b_list, db)):
        for i, t in enumerate(idxs):
            if i < depth:
                prologue.append(t)
                # layer l+1's copy of this chunk: start once its slot's
                # last layer-l occupant is consumed
                slot = chunks[t][3]
                t_last = max(
                    tt for tt in idxs if chunks[tt][3] == slot
                )
                starts_after[t_last].append((t, True))
            else:
                starts_after[idxs[i - depth]].append((t, False))
    prologue.sort()
    # --- simulate slot reuse: consumption at t, start per starts_after
    start_of = {}
    for t, lst in enumerate(starts_after):
        for (c, nxt) in lst:
            start_of[(c, nxt)] = t
    for (c, nxt), t_start in start_of.items():
        ring, slot = chunks[c][2], chunks[c][3]
        same = [
            t for t, ck in enumerate(chunks)
            if ck[2] == ring and ck[3] == slot
        ]
        if nxt:
            # next-layer chunk c: every same-slot chunk of THIS layer
            # must be consumed by t_start
            assert all(t <= t_start for t in same), (chunks[c], t_start)
        else:
            prev = [t for t in same if t < c]
            if prev:
                assert max(prev) <= t_start, (chunks[c], t_start)
    return chunks, starts_after, prologue


def _kernel(
    # inputs
    tables_ref,  # [S, B] SMEM i32 (page ids 0..P-1, layer-agnostic)
    lens_ref,  # [S] SMEM i32 (kv len INCL. current token; 0 = inactive)
    x_ref,  # [S, H] VMEM bf16 (embedded tokens)
    cos3_ref,  # [S, NH, HD] VMEM f32 (duplicated-half cos)
    sin3_ref,  # [S, NH, HD] VMEM f32 (sign-folded sin: [-sin | +sin])
    fnorm_ref,  # [1, H] VMEM f32 (final norm weight)
    qkv_w_hbm, qkv_s_hbm, o_w_hbm, o_s_hbm,
    gu_w_hbm, gu_s_hbm, d_wt_hbm, d_s_hbm,
    in_ln_hbm, post_ln_hbm, qn_hbm, kn_hbm,  # qn/kn may be dummies
    pages_hbm,  # [L*P, ps, 2*KVH, HD] ANY
    # outputs
    hid_ref,  # [S, H] VMEM bf16
    kv_out_hbm,  # [L, 2*KVH, S, HD] ANY bf16
    # scratch
    buf_a,  # [DEPTH_A, CH, H] int8
    buf_b,  # [DEPTH_B, CH, NHHD] int8
    kv_buf,  # [2, S, KV_BPC, ps, 2*KVH, HD] pool dtype
    xres,  # [S, H] bf16
    attn_buf,  # [S, NH*HD] bf16 — merged attention output
    kv_cur,  # [2*KVH, S, HD] bf16 (leading-indexed writes)
    c_in_ln, c_post_ln,  # [1, H] f32
    c_qkv_s,  # [1, QKO] f32
    c_o_s, c_d_s,  # [1, H] f32
    c_gu_s,  # [1, 2I] f32
    c_qn,  # [NH, HD] f32
    c_kn,  # [KVH, HD] f32
    sem_a, sem_b,  # DMA [DEPTH_A] / [DEPTH_B]
    kv_sems,  # DMA [2, S, KV_BPC]
    csem,  # DMA [8]
    osem,  # DMA (kv_out)
    *,
    L: int, S: int, H: int, NH: int, KVH: int, HD: int, I: int,
    CH: int, ps: int, P: int, kv_bpc: int,
    schedule,
    s_mult: float,  # attn scale * (k_scale or 1)
    v_scale: Optional[float],
    kv_quant: Optional[str],  # None | "int8" | "fp8" (current-token fake-quant)
    inv_kv_scale: float,
    pool_dtype,
    use_qk_norm: bool,
    eps: float,
    interpret: bool,
    noattn: bool = False,
    nokvdma: bool = False,
):
    chunks, starts_after, prologue = schedule
    NCH = len(chunks)
    G = NH // KVH
    NHHD = NH * HD
    QO = NH * HD
    KO = KVH * HD
    QKO = QO + 2 * KO
    ct = kv_bpc * ps
    bpc = kv_bpc
    f32 = jnp.float32

    def wdma(kind, l, c, slot):
        if kind == "qkv":
            return pltpu.make_async_copy(
                qkv_w_hbm.at[l, pl.ds(c * CH, CH), :],
                buf_a.at[slot], sem_a.at[slot],
            )
        if kind == "gu":
            return pltpu.make_async_copy(
                gu_w_hbm.at[l, pl.ds(c * CH, CH), :],
                buf_a.at[slot], sem_a.at[slot],
            )
        if kind == "d":
            return pltpu.make_async_copy(
                d_wt_hbm.at[l, pl.ds(c * CH, CH), :],
                buf_a.at[slot], sem_a.at[slot],
            )
        return pltpu.make_async_copy(
            o_w_hbm.at[l, pl.ds(c * CH, CH), :],
            buf_b.at[slot], sem_b.at[slot],
        )

    def const_dmas(l):
        out = [
            pltpu.make_async_copy(in_ln_hbm.at[l], c_in_ln, csem.at[0]),
            pltpu.make_async_copy(post_ln_hbm.at[l], c_post_ln, csem.at[1]),
            pltpu.make_async_copy(qkv_s_hbm.at[l], c_qkv_s, csem.at[2]),
            pltpu.make_async_copy(o_s_hbm.at[l], c_o_s, csem.at[3]),
            pltpu.make_async_copy(gu_s_hbm.at[l], c_gu_s, csem.at[4]),
            pltpu.make_async_copy(d_s_hbm.at[l], c_d_s, csem.at[5]),
        ]
        if use_qk_norm:
            out.append(
                pltpu.make_async_copy(qn_hbm.at[l], c_qn, csem.at[6])
            )
            out.append(
                pltpu.make_async_copy(kn_hbm.at[l], c_kn, csem.at[7])
            )
        return out

    # ---- layer-invariant per-slot attention metadata (SMEM scalars)
    # past length (pool tokens) per slot; current token handled in-reg
    plen_max = jnp.maximum(lens_ref[0] - 1, 0)
    for j in range(1, S):
        plen_max = jnp.maximum(plen_max, jnp.maximum(lens_ref[j] - 1, 0))
    n_kv_chunks = pl.cdiv(plen_max, ct)
    if noattn or nokvdma:
        # timing ablation: no past-KV page DMAs / flash chunks
        n_kv_chunks = jnp.int32(0)
    plens2 = jnp.concatenate(
        [
            jnp.full((1, 1), jnp.maximum(lens_ref[j] - 1, 0), jnp.int32)
            for j in range(S)
        ],
        axis=0,
    )  # [S, 1]
    lens2 = jnp.concatenate(
        [jnp.full((1, 1), lens_ref[j], jnp.int32) for j in range(S)],
        axis=0,
    )  # [S, 1]

    def kv_dmas(l, c, slot):
        out = []
        for j in range(S):
            for b in range(bpc):
                pidx = c * bpc + b
                out.append(
                    (
                        pidx * ps < jnp.maximum(lens_ref[j] - 1, 0),
                        pltpu.make_async_copy(
                            pages_hbm.at[l * P + tables_ref[j, pidx]],
                            kv_buf.at[slot, j, b],
                            kv_sems.at[slot, j, b],
                        ),
                    )
                )
        return out

    def kv_start(l, c, slot):
        for cond, d in kv_dmas(l, c, slot):
            @pl.when(cond)
            def _():
                d.start()

    def kv_wait(l, c, slot):
        for cond, d in kv_dmas(l, c, slot):
            @pl.when(cond)
            def _():
                d.wait()

    def _roll_half(x):
        if interpret:
            return jnp.roll(x, HD // 2, axis=x.ndim - 1)
        return pltpu.roll(x, shift=HD // 2, axis=x.ndim - 1)

    def _quant_rows(xf):
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        s = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
        return q, s

    def _rms(x_bf, w_row):
        xf = x_bf.astype(f32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return ((xf * jax.lax.rsqrt(var + eps)) * w_row).astype(
            jnp.bfloat16
        )

    def _fake_quant_kv(v_bf):
        """Round-trip the current token's K/V through the pool dtype so
        in-register attention matches a pool write+read exactly.
        Returns CODES (int8 path) — the dequant scale is folded into
        s_mult / v_scale like the pool reads."""
        if kv_quant == "int8":
            return jnp.clip(
                jnp.round(v_bf.astype(f32) * inv_kv_scale), -127, 127
            ).astype(jnp.bfloat16)
        if kv_quant == "fp8":
            return v_bf.astype(pool_dtype).astype(jnp.bfloat16)
        return v_bf

    # ---- prologue: layer-0 weight chunks + constants
    for t in prologue:
        kind, c, ring, slot = chunks[t]
        wdma(kind, 0, c, slot).start()
    for d in const_dmas(0):
        d.start()
    xres[...] = x_ref[...]

    def body(l, carry):
        for d in const_dmas(l):
            d.wait()
        in_ln_row = c_in_ln[...]
        post_ln_row = c_post_ln[...]
        qkv_s_row = c_qkv_s[...]
        o_s_row = c_o_s[...]
        gu_s_row = c_gu_s[...]
        d_s_row = c_d_s[...]

        @pl.when(n_kv_chunks > 0)
        def _():
            kv_start(l, 0, 0)

        def after_compute(t):
            for (tc, nxt) in starts_after[t]:
                kind, c, ring, slot = chunks[tc]
                if nxt:
                    @pl.when(l + 1 < L)
                    def _():
                        wdma(kind, l + 1, c, slot).start()
                else:
                    wdma(kind, l, c, slot).start()

        # ---------------- phase 1: qkv
        xq, xs = _quant_rows(_rms(xres[...], in_ln_row).astype(f32))
        cols = []
        t = 0
        for c in range(QKO // CH):
            kind, cc, ring, slot = chunks[t]
            wdma(kind, l, cc, slot).wait()
            y = jax.lax.dot_general(
                xq, buf_a[slot], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(f32) * xs
            cols.append(y)
            after_compute(t)
            t += 1
        y_qkv = jnp.concatenate(cols, axis=-1) * qkv_s_row  # [S, QKO] f32

        # head views: static lane slices + middle expansion (legal
        # concat assembly; lane-splitting reshapes are not)
        q3 = jnp.concatenate(
            [
                y_qkv[:, h * HD:(h + 1) * HD][:, None, :]
                for h in range(NH)
            ],
            axis=1,
        )  # [S, NH, HD] f32
        k3 = jnp.concatenate(
            [
                y_qkv[:, QO + h * HD:QO + (h + 1) * HD][:, None, :]
                for h in range(KVH)
            ],
            axis=1,
        )  # [S, KVH, HD] f32
        v3 = jnp.concatenate(
            [
                y_qkv[:, QO + KO + h * HD:QO + KO + (h + 1) * HD][
                    :, None, :
                ]
                for h in range(KVH)
            ],
            axis=1,
        ).astype(jnp.bfloat16)  # [S, KVH, HD]

        # the per-layer path rounds the projection to bf16 (linear
        # returns x.dtype) before qk-norm and again before rope —
        # mirror both rounding points exactly
        q3 = q3.astype(jnp.bfloat16).astype(f32)
        k3 = k3.astype(jnp.bfloat16).astype(f32)
        if use_qk_norm:
            qvar = jnp.mean(q3 * q3, axis=-1, keepdims=True)
            q3 = q3 * jax.lax.rsqrt(qvar + eps) * c_qn[...][None]
            kvar = jnp.mean(k3 * k3, axis=-1, keepdims=True)
            k3 = k3 * jax.lax.rsqrt(kvar + eps) * c_kn[...][None]
            q3 = q3.astype(jnp.bfloat16).astype(f32)
            k3 = k3.astype(jnp.bfloat16).astype(f32)
        cos3 = cos3_ref[...]
        sin3 = sin3_ref[...]
        q3 = (q3 * cos3 + _roll_half(q3) * sin3).astype(jnp.bfloat16)
        k3 = (
            k3 * cos3[:, :KVH, :] + _roll_half(k3) * sin3[:, :KVH, :]
        ).astype(jnp.bfloat16)

        # ship this layer's new K/V (pre-quantization bf16; the caller
        # scatters all layers into the pool in one op). kv_cur is laid
        # out [2*KVH, S, HD] so every scratch write is LEADING-indexed
        # (rank-3 middle writes / slice concats need relayouts Mosaic
        # doesn't implement); the caller transposes once in XLA.
        for h in range(KVH):
            kv_cur[2 * h] = k3[:, h, :]
            kv_cur[2 * h + 1] = v3[:, h, :]
        out_cp = pltpu.make_async_copy(kv_cur, kv_out_hbm.at[l], osem)
        out_cp.start()

        # -------------- phase 2: attention (past pool + current token)
        kq = _fake_quant_kv(k3)  # [S, KVH, HD] bf16
        vq = _fake_quant_kv(v3)

        def flash_body(c, carry):
            m_prev, l_prev, acc = carry
            slot = c % 2

            @pl.when(c + 1 < n_kv_chunks)
            def _():
                kv_start(l, c + 1, (c + 1) % 2)

            kv_wait(l, c, slot)
            kv = jax.lax.cond(
                slot == 0, lambda: kv_buf[0], lambda: kv_buf[1]
            )  # [S, bpc, ps, 2*KVH, HD]
            colid = c * ct + jax.lax.broadcasted_iota(
                jnp.int32, (S, 1, ct), 2
            )
            valid = colid < plens2[:, :, None]  # [S, 1, ct]
            vcol = c * ct + jax.lax.broadcasted_iota(
                jnp.int32, (S, ct, 1), 1
            )
            vvalid = vcol < plens2[:, :, None]  # [S, ct, 1]
            m_l, l_l, a_l = [], [], []
            for h in range(KVH):
                k_h = jnp.concatenate(
                    [kv[:, b, :, 2 * h, :] for b in range(bpc)], axis=1
                )  # [S, ct, HD] pool dtype
                v_h = jnp.concatenate(
                    [kv[:, b, :, 2 * h + 1, :] for b in range(bpc)],
                    axis=1,
                )
                if k_h.dtype not in (jnp.bfloat16, jnp.float32):
                    k_h = k_h.astype(jnp.bfloat16)
                    v_h = v_h.astype(jnp.bfloat16)
                v_h = jnp.where(vvalid, v_h, 0)
                # direct rank-3 value slice feeding the dot — the same
                # class the seq-blocked decode kernel uses on chip
                q_h = q3[:, h * G:(h + 1) * G, :]  # [S, G, HD] bf16
                s_h = jax.lax.dot_general(
                    q_h, k_h, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=f32,
                ) * s_mult  # [S, G, ct]
                s_h = jnp.where(valid, s_h, -jnp.inf)
                m_h = jnp.maximum(m_prev[:, h], jnp.max(s_h, axis=-1))
                alpha = jnp.exp(m_prev[:, h] - m_h)
                p_h = jnp.exp(s_h - m_h[..., None])
                l_h = alpha * l_prev[:, h] + jnp.sum(p_h, axis=-1)
                pv = jax.lax.dot_general(
                    p_h.astype(v_h.dtype), v_h,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )  # [S, G, HD]
                if v_scale is not None:
                    pv = pv * v_scale
                a_l.append(acc[:, h] * alpha[..., None] + pv)
                m_l.append(m_h)
                l_l.append(l_h)
            return (
                jnp.stack(m_l, axis=1),
                jnp.stack(l_l, axis=1),
                jnp.stack(a_l, axis=1),
            )

        init = (
            jnp.full((S, KVH, G), -jnp.inf, f32),
            jnp.zeros((S, KVH, G), f32),
            jnp.zeros((S, KVH, G, HD), f32),
        )
        m, lsum, acc = jax.lax.fori_loop(
            0, n_kv_chunks, flash_body, init
        )

        # current-token term (position plen, valid iff lens > 0) —
        # fully 2D per (head, group): no batched-dot shapes, no rank-3
        # expansions; all pieces feeding the final concat are FRESH
        # offset-0 values (only those concat cleanly on chip)
        active2 = lens2 > 0  # [S, 1]
        if noattn:
            # timing ablation (WRONG OUTPUTS): attention output is
            # zeros — isolates weight streaming + projections
            attn_buf[...] = jnp.zeros((S, NHHD), jnp.bfloat16)
        for h in range(0 if noattn else KVH):
            k_hf = kq[:, h, :].astype(f32)  # [S, HD]
            v_hf = vq[:, h, :].astype(f32)
            if v_scale is not None:
                v_hf = v_hf * v_scale
            m_h = m[:, h]  # [S, G]
            l_h = lsum[:, h]
            for g in range(G):
                q_hg = q3[:, h * G + g, :].astype(f32)  # [S, HD]
                s_g = jnp.sum(
                    q_hg * k_hf, axis=-1, keepdims=True
                ) * s_mult  # [S, 1]
                s_g = jnp.where(active2, s_g, -jnp.inf)
                m_g = m_h[:, g:g + 1]
                l_g = l_h[:, g:g + 1]
                m_f = jnp.maximum(m_g, s_g)
                alpha = jnp.exp(m_g - m_f)
                e_c = jnp.exp(s_g - m_f)
                l_f = alpha * l_g + e_c
                a_f = acc[:, h, g, :] * alpha + e_c * v_hf  # [S, HD]
                l_safe = jnp.where(l_f > 0, l_f, 1.0)
                # store through scratch: the acc slice carries a
                # sublane-offset layout that a value concat cannot
                # re-base; a ref store canonicalizes it
                c0 = (h * G + g) * HD
                attn_buf[:, c0:c0 + HD] = (a_f / l_safe).astype(
                    jnp.bfloat16
                )
        attn_flat = attn_buf[...]  # [S, NHHD] bf16

        # -------------- phase 3: o projection + residual
        aq, as_ = _quant_rows(attn_flat.astype(f32))
        cols = []
        for c in range(H // CH):
            kind, cc, ring, slot = chunks[t]
            wdma(kind, l, cc, slot).wait()
            y = jax.lax.dot_general(
                aq, buf_b[slot], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(f32) * as_
            cols.append(y)
            after_compute(t)
            t += 1
        y_o = jnp.concatenate(cols, axis=-1) * o_s_row  # [S, H]
        x1 = xres[...] + y_o.astype(jnp.bfloat16)

        # -------------- phase 4: gate/up
        hq, hs = _quant_rows(_rms(x1, post_ln_row).astype(f32))
        cols = []
        for c in range(2 * I // CH):
            kind, cc, ring, slot = chunks[t]
            wdma(kind, l, cc, slot).wait()
            y = jax.lax.dot_general(
                hq, buf_a[slot], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(f32) * hs
            cols.append(y)
            after_compute(t)
            t += 1
        y_gu = jnp.concatenate(cols, axis=-1) * gu_s_row  # [S, 2I] f32
        gate = y_gu[:, :I]
        up = y_gu[:, I:]
        act = (jax.nn.silu(gate) * up).astype(jnp.bfloat16)

        # -------------- phase 5: down (contraction-chunked, int32 acc)
        dq, ds_act = _quant_rows(act.astype(f32))
        acc_d = jnp.zeros((S, H), jnp.int32)
        for c in range(I // CH):
            kind, cc, ring, slot = chunks[t]
            wdma(kind, l, cc, slot).wait()
            acc_d = acc_d + jax.lax.dot_general(
                dq[:, cc * CH:(cc + 1) * CH], buf_a[slot],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            after_compute(t)
            t += 1
        y_d = acc_d.astype(f32) * ds_act * d_s_row  # [S, H]
        xres[...] = x1 + y_d.astype(jnp.bfloat16)

        out_cp.wait()  # kv_cur reused next layer

        @pl.when(l + 1 < L)
        def _():
            for d in const_dmas(l + 1):
                d.start()

        return carry

    jax.lax.fori_loop(0, L, body, 0)
    # final norm (f32 stats, bf16 out) — parity with decoder._stack
    hid_ref[...] = _rms(xres[...], fnorm_ref[...])


def stacked_decode(
    sl: StackedLayers,
    x: jax.Array,  # [S, H] bf16 embedded tokens
    cos: jax.Array,  # [S, HD//2] f32
    sin: jax.Array,  # [S, HD//2] f32
    pages: jax.Array,  # [L*P, ps, 2*KVH, HD]
    block_tables: jax.Array,  # [S, B] i32
    kv_lens: jax.Array,  # [S] i32 incl. current token (0 = inactive)
    final_norm: jax.Array,  # [H]
    *,
    num_heads: int,
    num_kv_heads: int,
    scale: float,
    k_scale: Optional[float] = None,
    v_scale: Optional[float] = None,
    eps: float = 1e-6,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One decode step over the whole stacked layer stack.

    Returns (hidden [S, H] bf16 post-final-norm, kv_new
    [L, S, 2*KVH, HD] bf16 — the per-layer K/V of the current token,
    for the caller's single all-layer pool scatter).
    """
    L, QKO, H = sl.qkv_w.shape
    NH, KVH = num_heads, num_kv_heads
    HD = QKO // (NH + 2 * KVH)
    I = sl.d_wt.shape[1]
    NHHD = NH * HD
    S = x.shape[0]
    LP, ps, _, _ = pages.shape
    P = LP // L
    CH = _chunk_rows(QKO, H, 2 * I, I)
    nq, no, ng, nd = QKO // CH, H // CH, 2 * I // CH, I // CH
    # ring depths clamp to per-layer chunk counts (deeper would need
    # >1-layer lookahead, which the per-layer loop can't express)
    depth_a = min(_TUNING["depth_a"], nq + ng + nd)
    depth_b = min(_TUNING["depth_b"], no)
    kv_bpc = _TUNING["kv_bpc"]
    schedule = _build_schedule(nq, no, ng, nd, depth_a, depth_b)

    pad_s = (-S) % 8
    if pad_s:
        x = jnp.pad(x, ((0, pad_s), (0, 0)))
        cos = jnp.pad(cos, ((0, pad_s), (0, 0)))
        sin = jnp.pad(sin, ((0, pad_s), (0, 0)))
        kv_lens = jnp.pad(kv_lens, (0, pad_s))
        block_tables = jnp.pad(block_tables, ((0, pad_s), (0, 0)))
    sp = S + pad_s
    pad_b = (-block_tables.shape[1]) % kv_bpc
    if pad_b:
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad_b)))

    # duplicated-half cos / sign-folded sin, tiled to full head shape
    cos2 = jnp.concatenate([cos, cos], axis=-1)  # [sp, HD]
    sin2 = jnp.concatenate([-sin, sin], axis=-1)
    cos3 = jnp.broadcast_to(cos2[:, None, :], (sp, NH, HD)).astype(
        jnp.float32
    )
    sin3 = jnp.broadcast_to(sin2[:, None, :], (sp, NH, HD)).astype(
        jnp.float32
    )

    if pages.dtype == jnp.int8:
        kv_quant = "int8"
        inv_ks = 1.0 / (k_scale or 1.0)
    elif pages.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        kv_quant = "fp8"
        inv_ks = 1.0
    else:
        kv_quant = None
        inv_ks = 1.0

    use_qk_norm = sl.qn is not None
    qn = sl.qn if use_qk_norm else jnp.zeros((L, 8, HD), jnp.float32)
    kn = sl.kn if use_qk_norm else jnp.zeros((L, 8, HD), jnp.float32)

    kernel = functools.partial(
        _kernel,
        L=L, S=sp, H=H, NH=NH, KVH=KVH, HD=HD, I=I, CH=CH, ps=ps, P=P,
        kv_bpc=kv_bpc,
        schedule=schedule,
        s_mult=scale * (k_scale if k_scale is not None else 1.0),
        v_scale=v_scale,
        kv_quant=kv_quant,
        inv_kv_scale=inv_ks,
        pool_dtype=pages.dtype,
        use_qk_norm=use_qk_norm,
        eps=eps,
        interpret=interpret,
        noattn=_ABLATION["noattn"],
        nokvdma=_ABLATION["nokvdma"],
    )
    vmem_limit = min(
        122 * 2**20,
        (depth_a * CH * H + depth_b * CH * NHHD)
        + 2 * sp * kv_bpc * ps * 2 * KVH * HD * pages.dtype.itemsize
        + 48 * 2**20,
    )
    hidden, kv_new = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tables
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lens
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cos3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sin3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # final norm
        ] + [pl.BlockSpec(memory_space=pltpu.ANY)] * 13,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((sp, H), jnp.bfloat16),
            jax.ShapeDtypeStruct(
                (L, 2 * KVH, sp, HD), jnp.bfloat16
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((depth_a, CH, H), jnp.int8),
            pltpu.VMEM((depth_b, CH, NHHD), jnp.int8),
            pltpu.VMEM(
                (2, sp, kv_bpc, ps, 2 * KVH, HD), pages.dtype
            ),
            pltpu.VMEM((sp, H), jnp.bfloat16),
            pltpu.VMEM((sp, NHHD), jnp.bfloat16),
            pltpu.VMEM((2 * KVH, sp, HD), jnp.bfloat16),
            pltpu.VMEM((1, H), jnp.float32),
            pltpu.VMEM((1, H), jnp.float32),
            pltpu.VMEM((1, QKO), jnp.float32),
            pltpu.VMEM((1, H), jnp.float32),
            pltpu.VMEM((1, H), jnp.float32),
            pltpu.VMEM((1, 2 * I), jnp.float32),
            pltpu.VMEM((qn.shape[1], HD), jnp.float32),
            pltpu.VMEM((kn.shape[1], HD), jnp.float32),
            pltpu.SemaphoreType.DMA((depth_a,)),
            pltpu.SemaphoreType.DMA((depth_b,)),
            pltpu.SemaphoreType.DMA((2, sp, kv_bpc)),
            pltpu.SemaphoreType.DMA((8,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit)
        ),
        interpret=interpret,
    )(
        block_tables.astype(jnp.int32),
        kv_lens.astype(jnp.int32),
        x.astype(jnp.bfloat16),
        cos3,
        sin3,
        final_norm.astype(jnp.float32).reshape(1, H),
        sl.qkv_w, sl.qkv_s, sl.o_w, sl.o_s,
        sl.gu_w, sl.gu_s, sl.d_wt, sl.d_s,
        sl.in_ln, sl.post_ln, qn, kn,
        pages,
    )
    # kernel emits [L, 2*KVH, S, HD] (leading-indexed scratch
    # writes); callers want [L, S, 2*KVH, HD]
    return hidden[:S], jnp.transpose(kv_new, (0, 2, 1, 3))[:, :S]


# --------------------------------------------------------------- build

def eligible(cfg, params: Params) -> bool:
    """True when the decode fast path can run the stacked megakernel.

    Scope: standard dense pre-norm decoders (Llama/Qwen3-class) with
    int8 per-output-channel weights — full causal attention, silu MLP,
    plain or per-head-RMS qk norm, any rope scaling (cos/sin come in
    precomputed), no biases. Everything else keeps the per-layer path.
    """
    from .quant import QuantizedTensor

    if cfg.layer_types is not None or cfg.sliding_window is not None:
        return False
    if (
        cfg.mla is not None
        or cfg.has_recurrent
        or cfg.has_cross
        or cfg.has_sinks
        or cfg.num_experts
        or cfg.attn_softcap is not None
        or cfg.rope_glm
        or cfg.partial_rotary_factor != 1.0
        or not cfg.use_rope
        or cfg.nope_layers
        or cfg.learned_pos_embed
        or cfg.parallel_residual
        or cfg.post_norm_blocks
        or cfg.sandwich_norms
        or cfg.residual_multiplier != 1.0
        or cfg.residual_cfg is not None
        or cfg.clip_qkv is not None
        or cfg.attn_out_gate
        or cfg.attn_temp_tuning
        or cfg.norm_type != "rms"
        or cfg.rms_add_one
        or cfg.mrope_section is not None
        or cfg.rope_local_theta is not None
        or cfg.hidden_act != "silu"
        or cfg.mlp_bias
        or cfg.attention_bias
    ):
        return False
    if cfg.use_qk_norm and (
        cfg.qk_norm_flat
        or cfg.qk_norm_after_rope
        or cfg.qk_norm_layernorm
        or cfg.qk_norm_weightless
    ):
        return False
    hd = cfg.head_dim or cfg.hidden_size // cfg.num_attention_heads
    if hd != 128 or cfg.num_attention_heads % cfg.num_key_value_heads:
        return False
    layers = params.get("layers")
    if not layers:
        return False
    l0 = layers[0]
    mlp = l0.get("mlp", l0)
    proj_sets = (
        [["qkv_proj"], ["q_proj", "k_proj", "v_proj"]],
        [["o_proj"]],
    )
    for alts in proj_sets:
        if not any(all(n in l0 for n in alt) for alt in alts):
            return False
    if not (
        "gate_up_proj" in mlp
        or ("gate_proj" in mlp and "up_proj" in mlp)
    ) or "down_proj" not in mlp:
        return False
    for lyr in layers:
        m = lyr.get("mlp", lyr)
        names = [
            lyr.get("qkv_proj"), lyr.get("q_proj"), lyr.get("k_proj"),
            lyr.get("v_proj"), lyr.get("o_proj"), m.get("gate_up_proj"),
            m.get("gate_proj"), m.get("up_proj"), m.get("down_proj"),
        ]
        for w in names:
            if w is None:
                continue
            if not isinstance(w, QuantizedTensor) or w.bits != 8:
                return False
            if getattr(w, "transposed", False):
                return False
        for bias in (
            "q_bias", "k_bias", "v_bias", "qkv_bias", "o_bias",
        ):
            if lyr.get(bias) is not None:
                return False
        for bias in ("gate_bias", "up_bias", "down_bias", "gate_up_bias"):
            if m.get(bias) is not None:
                return False
    # geometry must admit the chunk pipeline
    qo = cfg.num_attention_heads * hd
    ko = cfg.num_key_value_heads * hd
    qko = qo + 2 * ko
    i2 = 2 * cfg.intermediate_size
    ch = _chunk_rows(qko, cfg.hidden_size, i2, cfg.intermediate_size)
    if ch < 256 or qko // ch < 2:
        return False
    return True


def _scale_row(w) -> jax.Array:
    return w.scale.astype(jnp.float32).reshape(1, -1)


@functools.lru_cache(maxsize=None)
def _row_setter(shape, dtype):
    """Donated in-place row write: stack = stack.at[l].set(row).

    Donation keeps the restack's peak HBM at ~(original weights + the
    stack under construction + ONE layer's transient) — the eager
    jnp.stack-of-lists formulation peaked near 2x the model size at 8B
    scale, which overcommitted the device (the OOM surfaced lazily at
    the FIRST execution after convert, not during it)."""
    del shape, dtype

    def _set(stack, l, row):
        return stack.at[l].set(row)

    return jax.jit(_set, donate_argnums=(0,))


def _stack_rows(rows_iter, L, row_shape, dtype):
    """Build [L, *row_shape] incrementally with a donated buffer.

    On backends without buffer donation (CPU under STACKED=force) each
    donated .at[l].set would copy the whole stack — O(L^2); fall back
    to a plain jnp.stack there (tiny test shapes, peak HBM moot)."""
    if jax.default_backend() != "tpu":
        return jnp.stack(
            [row.astype(dtype) for row in rows_iter], axis=0
        )
    out = jnp.zeros((L,) + tuple(row_shape), dtype)
    setter = _row_setter(tuple(row_shape), jnp.dtype(dtype).name)
    for l, row in enumerate(rows_iter):
        out = setter(out, jnp.int32(l), row.astype(dtype))
    return out


def convert_params(params: Params, cfg) -> Params:
    """Restack an eligible model's layer weights for stacked execution.

    Replaces ``params["layers"]`` with ``params["stacked_layers"]``
    (a :class:`StackedLayers`). Rows are written into donated stack
    buffers layer-by-layer and the originals are popped as consumed, so
    peak HBM stays ~one layer above the model size (the full-list
    jnp.stack formulation transiently held originals + fused copies +
    the stack at once — ~2x the model — and OOM'd at 8B scale)."""
    from .quant import QuantizedTensor, fuse_quantized

    layers = params.pop("layers")
    L = len(layers)
    nh = cfg.num_attention_heads
    kvh = cfg.num_key_value_heads
    hd = cfg.head_dim or cfg.hidden_size // nh

    def take_qkv(lyr):
        if "qkv_proj" in lyr:
            return lyr.pop("qkv_proj")
        return fuse_quantized(
            [lyr.pop("q_proj"), lyr.pop("k_proj"), lyr.pop("v_proj")]
        )

    def take_gu(lyr):
        m = lyr["mlp"]
        if "gate_up_proj" in m:
            return m.pop("gate_up_proj")
        return fuse_quantized([m.pop("gate_proj"), m.pop("up_proj")])

    on_tpu = jax.default_backend() == "tpu"

    def set_row(stack, l, row):
        # donated in-place write on TPU; plain functional set elsewhere
        # (no donation support → donated path copies the whole stack)
        if on_tpu:
            return _row_setter(row.shape, row.dtype.name)(
                stack, jnp.int32(l), row
            )
        return stack.at[l].set(row)

    def stack_kind(take, L):
        """(codes [L,O,K], scales [L,1,O]) via donated row writes; the
        per-layer fused tensor is transient and the original is popped
        (freed) before the next layer's is built."""
        w = s = None
        for l, lyr in enumerate(layers):
            q = take(lyr)
            if w is None:
                w = jnp.zeros((L,) + q.w_q.shape, q.w_q.dtype)
                s = jnp.zeros((L, 1, q.w_q.shape[0]), jnp.float32)
            w = set_row(w, l, q.w_q)
            s = set_row(s, l, _scale_row(q))
        return w, s

    qkv_w, qkv_s = stack_kind(take_qkv, L)
    o_w, o_s = stack_kind(lambda lyr: lyr.pop("o_proj"), L)
    gu_w, gu_s = stack_kind(take_gu, L)

    d_wt = d_s = None
    for l, lyr in enumerate(layers):
        q = lyr["mlp"].pop("down_proj")
        row = q.w_q.T
        if d_wt is None:
            d_wt = jnp.zeros((L,) + row.shape, row.dtype)
            d_s = jnp.zeros((L, 1, row.shape[1]), jnp.float32)
        d_wt = set_row(d_wt, l, row)
        d_s = set_row(d_s, l, _scale_row(q))

    def norm_stack(name):
        h = layers[0][name].shape[-1]
        return _stack_rows(
            (lyr.pop(name).reshape(1, -1) for lyr in layers),
            L, (1, h), jnp.float32,
        )

    in_ln = norm_stack("input_layernorm")
    post_ln = norm_stack("post_attention_layernorm")
    qn = kn = None
    if cfg.use_qk_norm:
        qn = _stack_rows(
            (
                jnp.broadcast_to(
                    lyr.pop("q_norm").astype(jnp.float32)[None], (nh, hd)
                )
                for lyr in layers
            ),
            L, (nh, hd), jnp.float32,
        )
        kn = _stack_rows(
            (
                jnp.broadcast_to(
                    lyr.pop("k_norm").astype(jnp.float32)[None],
                    (kvh, hd),
                )
                for lyr in layers
            ),
            L, (kvh, hd), jnp.float32,
        )
    params["stacked_layers"] = StackedLayers(
        qkv_w=qkv_w, qkv_s=qkv_s, o_w=o_w, o_s=o_s, gu_w=gu_w,
        gu_s=gu_s, d_wt=d_wt, d_s=d_s, in_ln=in_ln, post_ln=post_ln,
        qn=qn, kn=kn,
    )
    # the jitted row setters (and their compiled executables) are only
    # needed during this one-time conversion — drop them
    _row_setter.cache_clear()
    return params


def layer_views(sl: StackedLayers, cfg) -> List[Params]:
    """Per-layer param-dict views over the stacked arrays (trace-time
    static slices — measured copy-free on TPU; the prefill/verify layer
    stack consumes these exactly like loose per-layer params)."""
    from .quant import QuantizedTensor

    L = sl.qkv_w.shape[0]
    out = []
    for l in range(L):
        p = {
            "input_layernorm": sl.in_ln[l, 0],
            "post_attention_layernorm": sl.post_ln[l, 0],
            "qkv_proj": QuantizedTensor(
                w_q=sl.qkv_w[l], scale=sl.qkv_s[l].reshape(-1, 1), bits=8
            ),
            "o_proj": QuantizedTensor(
                w_q=sl.o_w[l], scale=sl.o_s[l].reshape(-1, 1), bits=8
            ),
            "mlp": {
                "gate_up_proj": QuantizedTensor(
                    w_q=sl.gu_w[l], scale=sl.gu_s[l].reshape(-1, 1),
                    bits=8,
                ),
                "down_proj": QuantizedTensor(
                    w_q=sl.d_wt[l], scale=sl.d_s[l].reshape(-1, 1),
                    bits=8, transposed=True,
                ),
            },
        }
        if sl.qn is not None:
            p["q_norm"] = sl.qn[l, 0]
            p["k_norm"] = sl.kn[l, 0]
        out.append(p)
    return out

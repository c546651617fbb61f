# SPDX-License-Identifier: Apache-2.0
"""Gated DeltaNet mixer in JAX — Qwen3-Next's linear-attention layers
(HF modeling_qwen3_next.py Qwen3NextGatedDeltaNet; the reference serves
the family through mlx-lm and its qwen3_next MTP patches,
reference patches/qwen3_next_mtp.py:1-261).

Per value-head recurrence over a [dk, dv] fast-weight state S:

    S_t = S_{t-1} * exp(g_t)                       (gated decay)
    S_t = S_t + k_t (v_t - S_t^T k_t)^T * beta_t   (delta rule)
    y_t = S_t^T q_t

with q/k L2-normalized per head, ``beta = sigmoid(b)``,
``g = -exp(A_log) * softplus(a + dt_bias)``, and a depthwise causal
conv + silu over the concatenated (q, k, v) projection. The output is
per-head RMS-normed, gated by ``silu(z)``, and projected back (HF
torch_recurrent_gated_delta_rule, modeling_qwen3_next.py:522-561).

Serving shape mirrors models/mamba2.py: per-slot ``conv_state [cd, K]``
(last K conv inputs) and ``rec_state [nh_v, dk, dv]`` f32 replace the
KV cache. Decode is one closed-form update batched over slots; prefill
scans a sequence's chunk carrying the state across chunked-prefill
steps.

The checkpoint's head-interleaved ``in_proj_qkvz`` / ``in_proj_ba``
layouts are canonicalized to [q | k | v | z] / [b | a] at load time
(models/loader.py) so the runtime split is a plain slice.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclass
class DeltaNetConfig:
    num_v_heads: int = 32
    num_k_heads: int = 16
    head_k_dim: int = 128
    head_v_dim: int = 128
    conv_kernel: int = 4
    norm_eps: float = 1e-6

    @property
    def key_dim(self) -> int:
        return self.num_k_heads * self.head_k_dim

    @property
    def value_dim(self) -> int:
        return self.num_v_heads * self.head_v_dim

    @property
    def conv_dim(self) -> int:
        return 2 * self.key_dim + self.value_dim


def _l2norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """FLA-style L2 norm over the head dim (HF l2norm,
    modeling_qwen3_next.py:436)."""
    return x * jax.lax.rsqrt(
        jnp.sum(x * x, axis=-1, keepdims=True) + eps
    )


def _project(p: Params, dc: DeltaNetConfig, x: jax.Array):
    """x [..., H] -> (qkv_flat [..., cd], z [..., nh_v, dv],
    b [..., nh_v], a [..., nh_v]) in the canonical load-time layout."""
    qkvz = x @ p["qkvz_w"].T
    ba = (x @ p["ba_w"].T).astype(jnp.float32)
    kd, vd = dc.key_dim, dc.value_dim
    qkv = qkvz[..., : 2 * kd + vd]
    z = qkvz[..., 2 * kd + vd :].reshape(
        *x.shape[:-1], dc.num_v_heads, dc.head_v_dim
    )
    b = ba[..., : dc.num_v_heads]
    a = ba[..., dc.num_v_heads :]
    return qkv, z, b, a


def _split_heads(conv_out: jax.Array, dc: DeltaNetConfig):
    """post-conv [..., cd] -> q,k [..., nh_v, dk] (k-heads repeated to
    v-heads), v [..., nh_v, dv] — L2-normed q/k, q pre-scaled."""
    kd, vd = dc.key_dim, dc.value_dim
    lead = conv_out.shape[:-1]
    q = conv_out[..., :kd].reshape(*lead, dc.num_k_heads, dc.head_k_dim)
    k = conv_out[..., kd : 2 * kd].reshape(
        *lead, dc.num_k_heads, dc.head_k_dim
    )
    v = conv_out[..., 2 * kd :].reshape(*lead, dc.num_v_heads, dc.head_v_dim)
    q = _l2norm(q) * dc.head_k_dim**-0.5
    k = _l2norm(k)
    rep = dc.num_v_heads // dc.num_k_heads
    if rep > 1:
        q = jnp.repeat(q, rep, axis=-2)
        k = jnp.repeat(k, rep, axis=-2)
    return q, k, v


def _decay_beta(p: Params, a: jax.Array, b: jax.Array):
    """g = -exp(A_log) softplus(a + dt_bias) (log-decay), beta =
    sigmoid(b); both f32 [..., nh_v]."""
    g = -jnp.exp(p["a_log"]) * jax.nn.softplus(a + p["dt_bias"])
    return g, jax.nn.sigmoid(b)


def _gated_out(
    p: Params, dc: DeltaNetConfig, y: jax.Array, z: jax.Array, dtype
) -> jax.Array:
    """Per-head RMS norm -> * silu(z) -> out_proj. y/z [..., nh_v, dv]."""
    yf = y.astype(jnp.float32)
    var = jnp.mean(yf * yf, axis=-1, keepdims=True)
    yn = yf * jax.lax.rsqrt(var + dc.norm_eps) * p["norm_w"]
    yn = yn * jax.nn.silu(z.astype(jnp.float32))
    flat = yn.reshape(*y.shape[:-2], dc.value_dim).astype(dtype)
    return flat @ p["out_w"].T


def gdn_sequence(
    p: Params,
    dc: DeltaNetConfig,
    x: jax.Array,  # [L, H] one sequence's contiguous rows
    valid: Optional[jax.Array],  # [L] bool (None = all valid)
    conv_state: jax.Array,  # [cd, K]
    rec_state: jax.Array,  # [nh_v, dk, dv] f32
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Scan one sequence chunk with carried state. Invalid rows are
    no-ops (state unchanged, y zero). Returns (y [L, H], conv, rec)."""
    length = x.shape[0]
    k_sz = dc.conv_kernel
    if valid is None:
        valid = jnp.ones((length,), bool)
    qkv, z, b, a = _project(p, dc, x)
    qkv = jnp.where(valid[:, None], qkv, 0.0)

    # depthwise causal conv over [state tail (K-1), new rows]
    combined = jnp.concatenate(
        [conv_state[:, 1:].T.astype(qkv.dtype), qkv], axis=0
    )  # [K-1+L, cd]
    conv_out = sum(
        combined[j : j + length] * p["conv_w"][:, j] for j in range(k_sz)
    )
    conv_out = jax.nn.silu(conv_out.astype(jnp.float32))
    conv_out = jnp.where(valid[:, None], conv_out, 0.0)
    # new conv window = last K inputs ending at the last VALID row
    n_valid = jnp.sum(valid.astype(jnp.int32))
    window_full = jnp.concatenate(
        [conv_state.T.astype(qkv.dtype), qkv], axis=0
    )
    new_conv = jax.lax.dynamic_slice_in_dim(
        window_full, n_valid, k_sz, axis=0
    ).T.astype(conv_state.dtype)

    q, k, v = _split_heads(conv_out, dc)  # [L, nh, dk/dv] f32
    g, beta = _decay_beta(p, a, b)  # [L, nh]
    # invalid rows must leave the state untouched: decay 1, beta 0
    g = jnp.where(valid[:, None], g, 0.0)
    beta = jnp.where(valid[:, None], beta, 0.0)

    if length >= 32:
        # prefill-sized chunks: chunk-parallel WY form (one scan step
        # per 64 tokens, MXU-shaped matmuls)
        ys, new_rec = _gdn_core_chunked(
            q, k, v.astype(jnp.float32), g, beta,
            rec_state.astype(jnp.float32),
        )
    else:

        def step(s, inputs):
            q_t, k_t, v_t, g_t, beta_t = inputs
            s = s * jnp.exp(g_t)[:, None, None]
            kv_mem = jnp.einsum("hkv,hk->hv", s, k_t)
            delta = (v_t - kv_mem) * beta_t[:, None]
            s = s + k_t[:, :, None] * delta[:, None, :]
            y_t = jnp.einsum("hkv,hk->hv", s, q_t)
            return s, y_t

        new_rec, ys = jax.lax.scan(
            step,
            rec_state.astype(jnp.float32),
            (q, k, v.astype(jnp.float32), g, beta),
        )
    out = _gated_out(p, dc, ys, z, x.dtype)
    return jnp.where(valid[:, None], out, 0.0), new_conv, new_rec


def _gdn_core_chunked(
    q: jax.Array,  # [L, nh, dk] f32 (l2-normed, scaled)
    k: jax.Array,  # [L, nh, dk] f32 (l2-normed)
    v: jax.Array,  # [L, nh, dv] f32
    g: jax.Array,  # [L, nh] f32 log-decay (0 for invalid rows)
    beta: jax.Array,  # [L, nh] f32 (0 for invalid rows)
    rec_state: jax.Array,  # [nh, dk, dv] f32
    chunk: int = 64,
) -> Tuple[jax.Array, jax.Array]:
    """Chunk-parallel gated delta rule (WY/UT representation): within a
    chunk the sequential delta-rule updates collapse into a unit-lower
    triangular solve + batched matmuls; only a length/chunk scan over
    chunk boundaries remains. Mirrors HF torch_chunk_gated_delta_rule
    (modeling_qwen3_next.py:442-519) with the O(C^2) substitution loop
    replaced by ``triangular_solve`` — MXU-shaped work instead of a
    per-token scan (SURVEY §7 design translation; chunked-prefill TTFT).
    Exact (same recurrence, reassociated); f32 throughout."""
    length, nh, dk = k.shape
    dv = v.shape[-1]
    pad = (-length) % chunk
    if pad:
        zf = lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        q, k, v, g, beta = zf(q), zf(k), zf(v), zf(g), zf(beta)
    n = (length + pad) // chunk

    def cshape(x):  # [L, nh, ...] -> [n, nh, C, ...]
        return x.reshape(n, chunk, nh, *x.shape[2:]).swapaxes(1, 2)

    qc, kc, vc = cshape(q), cshape(k), cshape(v)  # [n, nh, C, d]
    gc, bc = cshape(g), cshape(beta)  # [n, nh, C]
    k_beta = kc * bc[..., None]
    v_beta = vc * bc[..., None]
    g_cum = jnp.cumsum(gc, axis=-1)  # [n, nh, C]
    # decay_mask[i,j] = exp(g_cum_i - g_cum_j) on the lower triangle
    tril = jnp.tril(jnp.ones((chunk, chunk), bool))
    decay = jnp.where(
        tril, jnp.exp(g_cum[..., :, None] - g_cum[..., None, :]), 0.0
    )
    # A = strictly-lower (k_beta k^T * decay); T = (I - A)^{-1}
    a = -jnp.einsum("nhik,nhjk->nhij", k_beta, kc) * decay
    a = jnp.where(jnp.tril(jnp.ones((chunk, chunk), bool), -1), a, 0.0)
    eye = jnp.eye(chunk, dtype=a.dtype)
    t_mat = jax.lax.linalg.triangular_solve(
        eye - a, jnp.broadcast_to(eye, a.shape),
        left_side=True, lower=True, unit_diagonal=True,
    )
    u = jnp.einsum("nhij,nhjd->nhid", t_mat, v_beta)  # pseudo values
    w = jnp.einsum(
        "nhij,nhjd->nhid", t_mat, k_beta * jnp.exp(g_cum)[..., None]
    )  # k_cumdecay
    # within-chunk attention of q against pseudo-values
    qk = jnp.einsum("nhik,nhjk->nhij", qc, kc) * decay
    qk = jnp.where(tril, qk, 0.0)
    g_last = g_cum[..., -1]  # [n, nh]
    k_rescale = kc * jnp.exp(g_last[..., None, None] - g_cum[..., None])

    def chunk_step(s, inp):
        q_i, u_i, w_i, qk_i, g_cum_i, g_last_i, k_r_i = inp
        # s: [nh, dk, dv]
        v_new = u_i - jnp.einsum("hid,hdv->hiv", w_i, s)
        y = (
            jnp.einsum("hid,hdv->hiv", q_i * jnp.exp(g_cum_i)[..., None], s)
            + jnp.einsum("hij,hjv->hiv", qk_i, v_new)
        )
        s_new = s * jnp.exp(g_last_i)[:, None, None] + jnp.einsum(
            "hik,hiv->hkv", k_r_i, v_new
        )
        return s_new, y

    final, ys = jax.lax.scan(
        chunk_step,
        rec_state.astype(jnp.float32),
        (qc, u, w, qk, g_cum, g_last, k_rescale),
    )  # ys: [n, nh, C, dv]
    y = ys.swapaxes(1, 2).reshape(n * chunk, nh, dv)[:length]
    return y, final


def gdn_step(
    p: Params,
    dc: DeltaNetConfig,
    x: jax.Array,  # [S, H] one token per slot
    active: jax.Array,  # [S] bool — inactive slots are no-ops
    conv_state: jax.Array,  # [S, cd, K]
    rec_state: jax.Array,  # [S, nh_v, dk, dv] f32
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Closed-form single-token update, batched over slots (HF
    torch_recurrent_gated_delta_rule + causal_conv1d_update)."""
    qkv, z, b, a = _project(p, dc, x)
    window = jnp.concatenate(
        [conv_state[:, :, 1:], qkv[:, :, None].astype(conv_state.dtype)],
        axis=-1,
    )  # [S, cd, K]
    conv_out = jnp.sum(
        window.astype(jnp.float32) * p["conv_w"][None], axis=-1
    )
    conv_out = jax.nn.silu(conv_out)  # [S, cd]

    q, k, v = _split_heads(conv_out, dc)  # [S, nh, dk/dv]
    g, beta = _decay_beta(p, a, b)  # [S, nh]
    s = rec_state * jnp.exp(g)[:, :, None, None]
    kv_mem = jnp.einsum("shkv,shk->shv", s, k)
    delta = (v.astype(jnp.float32) - kv_mem) * beta[:, :, None]
    new_rec = s + k[:, :, :, None] * delta[:, :, None, :]
    y = jnp.einsum("shkv,shk->shv", new_rec, q)
    out = _gated_out(p, dc, y, z, x.dtype)

    new_conv = jnp.where(active[:, None, None], window, conv_state)
    new_rec = jnp.where(active[:, None, None, None], new_rec, rec_state)
    return jnp.where(active[:, None], out, 0.0), new_conv, new_rec


def init_gdn_states(
    dc: DeltaNetConfig, slots: int, dtype=jnp.float32
) -> Tuple[jax.Array, jax.Array]:
    return (
        jnp.zeros((slots, dc.conv_dim, dc.conv_kernel), dtype),
        jnp.zeros(
            (slots, dc.num_v_heads, dc.head_k_dim, dc.head_v_dim),
            jnp.float32,
        ),
    )

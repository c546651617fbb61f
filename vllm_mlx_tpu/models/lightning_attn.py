# SPDX-License-Identifier: Apache-2.0
"""MiniMax lightning (linear) attention — the recurrent mixer behind
MiniMax-M1-class hybrids (HF MiniMaxLightningAttention parity).

Linear attention with per-head exponential decay: the "KV cache" is a
per-head state matrix ``S_h = sum_j exp(-r_h (t-1-j)) k_j v_j^T`` of
shape [head_dim, head_dim] per slot — constant memory in sequence
length, the lightning analogue of Mamba's SSM state. Decode is a rank-1
state update + a q @ S readout; prefill runs the HF block formulation
(intra-block masked QK^T V + inter-block Q @ S) with decay factors
computed from the DYNAMIC valid length so ragged chunk padding cannot
poison the state.

qkv is head-major fused ([h0_q h0_k h0_v h1_q ...]) with silu applied
to the PROJECTED qkv; the output passes a flat RMSNorm then a sigmoid
gate of the layer INPUT before out_proj.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.layers import linear, rms_norm

Params = Dict[str, Any]


def slope_rate(num_heads: int, layer_idx: int, num_layers: int) -> np.ndarray:
    """Per-head decay rates [h] (HF get_slope_rate)."""
    base = 1.0 / (2.0 ** (8.0 / num_heads))
    exponent = np.arange(num_heads) + 1.0
    factor = 1.0 - layer_idx / (num_layers - 1 + 1e-5) + 1e-5
    return (base**exponent * factor).astype(np.float32)


def _qkv_heads(p: Params, x: jax.Array, num_heads: int, head_dim: int):
    """x [T, H] -> silu'd (q, k, v) each [T, h, hd] (head-major fused)."""
    qkv = linear(x, p["qkv_w"])  # [T, h*3*hd]
    qkv = jax.nn.silu(qkv.astype(jnp.float32))
    qkv = qkv.reshape(x.shape[0], num_heads, 3 * head_dim)
    return (
        qkv[..., :head_dim],
        qkv[..., head_dim : 2 * head_dim],
        qkv[..., 2 * head_dim :],
    )


def _finish(p: Params, x_in: jax.Array, ctx: jax.Array, eps: float):
    """ctx [T, h, hd] -> gated, normed, projected output [T, H].

    NOTE: HF constructs the lightning output norm with the DEFAULT
    RMSNorm eps (1e-6), NOT config.rms_norm_eps — callers must pass
    1e-6 for parity (modeling_minimax.py MiniMaxLightningAttention)."""
    t = ctx.shape[0]
    flat = ctx.reshape(t, -1).astype(x_in.dtype)
    flat = rms_norm(flat, p["norm_w"], eps)
    gate = jax.nn.sigmoid(
        linear(x_in, p["gate_w"]).astype(jnp.float32)
    ).astype(flat.dtype)
    return linear(flat * gate, p["out_w"])


def lightning_step(
    p: Params,
    rate: jax.Array,  # [h]
    eps: float,
    x: jax.Array,  # [S, H] one token per slot
    active: jax.Array,  # [S] bool
    state: jax.Array,  # [S, h, hd, hd] f32
) -> Tuple[jax.Array, jax.Array]:
    """Batched decode: state' = e^{-r} state + k^T v ; out = q @ state'."""
    s, h_dim = x.shape
    num_heads = state.shape[1]
    head_dim = state.shape[2]
    q, k, v = _qkv_heads(p, x, num_heads, head_dim)
    ratio = jnp.exp(-rate.astype(jnp.float32))[None, :, None, None]
    new_state = state * ratio + jnp.einsum(
        "shd,she->shde", k, v, preferred_element_type=jnp.float32
    )
    new_state = jnp.where(active[:, None, None, None], new_state, state)
    ctx = jnp.einsum(
        "shd,shde->she", q, new_state, preferred_element_type=jnp.float32
    )
    y = _finish(p, x, ctx, eps)
    return y, new_state


def lightning_sequence(
    p: Params,
    rate: jax.Array,  # [h]
    eps: float,
    x: jax.Array,  # [T, H] one sequence's rows (front-rolled)
    valid: jax.Array,  # [T] bool or None
    init_state: jax.Array,  # [h, hd, hd] f32
    block: int = 64,
) -> Tuple[jax.Array, jax.Array]:
    """Chunk prefill with carried state (HF block formulation; decay
    factors from the DYNAMIC valid count per block)."""
    t, _ = x.shape
    num_heads = init_state.shape[0]
    head_dim = init_state.shape[1]
    q, k, v = _qkv_heads(p, x, num_heads, head_dim)
    if valid is not None:
        k = jnp.where(valid[:, None, None], k, 0.0)
        v = jnp.where(valid[:, None, None], v, 0.0)
        n_valid = jnp.sum(valid.astype(jnp.int32))
    else:
        n_valid = jnp.int32(t)
    b = min(block, t)
    n_blocks = -(-t // b)
    pad = n_blocks * b - t
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
    qb = q.reshape(n_blocks, b, num_heads, head_dim).transpose(0, 2, 1, 3)
    kb = k.reshape(n_blocks, b, num_heads, head_dim).transpose(0, 2, 1, 3)
    vb = v.reshape(n_blocks, b, num_heads, head_dim).transpose(0, 2, 1, 3)
    r = rate.astype(jnp.float32)[:, None]  # [h, 1]
    idx = jnp.arange(b, dtype=jnp.float32) + 1.0  # 1-based (HF)
    # intra-block decay exp(-r (i-j)) for i >= j (static)
    diff = idx[:, None] - idx[None, :]
    diag = jnp.where(
        diff[None] >= 0, jnp.exp(-r[:, :, None] * diff[None]), 0.0
    )  # [h, b, b]
    qdecay = jnp.exp(-r * idx[None, :].repeat(num_heads, 0))  # [h, b]

    def body(carry, blk):
        state, base = carry  # state [h, hd, hd], base = tokens before
        qi, ki, vi = blk
        cbs = jnp.clip(n_valid - base, 0, b).astype(jnp.float32)
        # key decay exp(-r (cbs - i)) for valid rows (1-based i)
        kexp = jnp.maximum(cbs - idx, 0.0)
        kdecay = jnp.where(
            idx[None, :] <= cbs, jnp.exp(-r * kexp[None, :]), 0.0
        )  # [h, b]
        qk = jnp.einsum(
            "hid,hjd->hij", qi, ki, preferred_element_type=jnp.float32
        )
        intra = jnp.einsum(
            "hij,hjd->hid", qk * diag, vi,
            preferred_element_type=jnp.float32,
        )
        inter = jnp.einsum(
            "hid,hde->hie", qi * qdecay[:, :, None], state,
            preferred_element_type=jnp.float32,
        )
        out = intra + inter  # [h, b, hd]
        block_decay = jnp.exp(-r[:, 0] * cbs)[:, None, None]
        add = jnp.einsum(
            "hid,hie->hde", ki * kdecay[:, :, None], vi,
            preferred_element_type=jnp.float32,
        )
        new_state = state * block_decay + add
        return (new_state, base + b), out

    (final_state, _), outs = jax.lax.scan(
        body, (init_state.astype(jnp.float32), jnp.int32(0)), (qb, kb, vb)
    )
    ctx = outs.transpose(0, 2, 1, 3).reshape(-1, num_heads, head_dim)[:t]
    y = _finish(p, x, ctx, eps)
    return y, final_state

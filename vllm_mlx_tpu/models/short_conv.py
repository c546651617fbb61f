# SPDX-License-Identifier: Apache-2.0
"""LFM2 gated short-convolution mixer (HF modeling_lfm2.py
Lfm2ShortConv.slow_forward): ``in_proj`` fans x out to (B, C, x);
``Bx = B * x`` runs through a depthwise causal conv of width K
(conv_L_cache, typically 3); the output is gated by C and projected
back. Liquid LFM2 hybrids interleave these with full-attention layers
(reference serves the family via mlx-lm, models/llm.py:40).

Serving shape mirrors models/mamba2.py: the per-slot recurrent state is
just the last-K window of ``Bx`` (``conv_state [H, K]``); a scalar
placeholder rides as the second state so the generic (conv, state)
plumbing in models/decoder.py applies unchanged. Decode is one
closed-form window update batched over slots; prefill processes a
sequence's rows with the carried window — no scan at all (the conv is
a K-tap FIR, fully parallel over positions).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _project(p: Params, x: jax.Array):
    """x [..., H] -> (b, c, xp) each [..., H] (HF chunk order B, C, x)."""
    proj = x @ p["in_w"].T
    if p.get("in_b") is not None:
        proj = proj + p["in_b"]
    h = proj.shape[-1] // 3
    return proj[..., :h], proj[..., h : 2 * h], proj[..., 2 * h :]


def _out(p: Params, y: jax.Array, dtype) -> jax.Array:
    o = y.astype(dtype) @ p["out_w"].T
    if p.get("out_b") is not None:
        o = o + p["out_b"]
    return o


def conv_sequence(
    p: Params,
    kernel: int,
    x: jax.Array,  # [L, H] one sequence's contiguous rows
    valid: Optional[jax.Array],  # [L] bool (None = all valid)
    conv_state: jax.Array,  # [H, K] last K Bx inputs
    dummy: jax.Array,  # scalar placeholder state (passthrough)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """FIR over one chunk with carried window. Invalid rows are no-ops
    (state unchanged, y zero). Returns (y [L, H], conv, dummy)."""
    length = x.shape[0]
    if valid is None:
        valid = jnp.ones((length,), bool)
    b, c, xp = _project(p, x)
    bx = jnp.where(valid[:, None], b * xp, 0.0)
    combined = jnp.concatenate(
        [conv_state[:, 1:].T.astype(bx.dtype), bx], axis=0
    )  # [K-1+L, H]
    conv_out = sum(
        combined[j : j + length] * p["conv_w"][:, j] for j in range(kernel)
    )
    if p.get("conv_b") is not None:
        conv_out = conv_out + p["conv_b"]
    y = c * conv_out
    out = _out(p, y, x.dtype)
    # new window = last K inputs ending at the last VALID row
    n_valid = jnp.sum(valid.astype(jnp.int32))
    window_full = jnp.concatenate(
        [conv_state.T.astype(bx.dtype), bx], axis=0
    )
    new_conv = jax.lax.dynamic_slice_in_dim(
        window_full, n_valid, kernel, axis=0
    ).T.astype(conv_state.dtype)
    return jnp.where(valid[:, None], out, 0.0), new_conv, dummy


def conv_step(
    p: Params,
    kernel: int,
    x: jax.Array,  # [S, H] one token per slot
    active: jax.Array,  # [S] bool — inactive slots are no-ops
    conv_state: jax.Array,  # [S, H, K]
    dummy: jax.Array,  # [S, ...] placeholder
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Closed-form single-token window update, batched over slots."""
    b, c, xp = _project(p, x)
    bx = b * xp  # [S, H]
    window = jnp.concatenate(
        [conv_state[:, :, 1:], bx[:, :, None].astype(conv_state.dtype)],
        axis=-1,
    )  # [S, H, K]
    conv_out = jnp.sum(
        window.astype(jnp.float32) * p["conv_w"][None], axis=-1
    )
    if p.get("conv_b") is not None:
        conv_out = conv_out + p["conv_b"]
    y = c.astype(jnp.float32) * conv_out
    out = _out(p, y, x.dtype)
    new_conv = jnp.where(active[:, None, None], window, conv_state)
    return jnp.where(active[:, None], out, 0.0), new_conv, dummy


def init_conv_states(
    hidden: int, kernel: int, slots: int, dtype=jnp.float32
) -> Tuple[jax.Array, jax.Array]:
    return (
        jnp.zeros((slots, hidden, kernel), dtype),
        jnp.zeros((slots, 1, 1), jnp.float32),
    )

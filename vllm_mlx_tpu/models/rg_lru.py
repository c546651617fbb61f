# SPDX-License-Identifier: Apache-2.0
"""RecurrentGemma (Griffin) RG-LRU mixer in JAX (reference serves
Griffin checkpoints through mlx-lm; HF math in
modeling_recurrent_gemma.py RecurrentGemmaRecurrentBlock /
RecurrentGemmaRglru).

Block: ``out = linear_out( rg_lru(conv1d(linear_x(h))) *
gelu_tanh(linear_y(h)) )`` with a depthwise causal conv (width 4, with
bias, NO activation — unlike Mamba) feeding a gated linear recurrence:

  i_t = sigmoid(blockdiag(W_ig) x_t + b_ig)       input gate
  r_t = sigmoid(blockdiag(W_rg) x_t + b_rg)       recurrence gate
  log a_t = -8 * r_t * softplus(Lambda)           per-channel decay
  h_t = a_t h_{t-1} + sqrt(1 - a_t^2) i_t x_t     (multiplier = 1 at
                                                   sequence position 0)

The gates are block-diagonal over ``num_blocks`` head blocks of width
``lru_width / num_blocks`` (HF stores [H, bw, bw] weights applied as
x @ W + b). The recurrence is elementwise first-order, so prefill uses
the same chunked ``lax.associative_scan`` as models/mamba1.py; decode
is one closed-form update batched over slots. All recurrence math in
float32 (HF acc_dtype).

Serving shape mirrors mamba1/mamba2: per-slot ``conv_state
[lru_width, K]`` + ``rec_state [lru_width]`` f32. ``pos0`` marks rows
at absolute position 0 (HF ``reset``): the gamma multiplier is 1 there
and the carried state is dropped (a_t *= ~reset).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclass
class RgLruConfig:
    lru_width: int = 2560
    num_blocks: int = 10  # == num_attention_heads (HF block count)
    conv_kernel: int = 4


def _gates(p: Params, mc: RgLruConfig, x: jax.Array):
    """Block-diagonal input/recurrence gates + per-step log-decay.
    x: [..., lru_width] f32 (conv output). Returns (i, log_a) f32."""
    bw = mc.lru_width // mc.num_blocks
    xb = x.reshape(*x.shape[:-1], mc.num_blocks, bw)
    ig = jnp.einsum("...hb,hbc->...hc", xb, p["ig_w"]) + p["ig_b"]
    rg = jnp.einsum("...hb,hbc->...hc", xb, p["rg_w"]) + p["rg_b"]
    i_gate = jax.nn.sigmoid(ig.reshape(x.shape))
    r_gate = jax.nn.sigmoid(rg.reshape(x.shape))
    log_a = -8.0 * r_gate * jax.nn.softplus(p["a_param"])
    return i_gate, log_a


def _conv_seq(
    p: Params, mc: RgLruConfig, hid: jax.Array, valid: jax.Array,
    conv_state: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Depthwise causal conv over a chunk, stitched onto the carried
    window (same layout as mamba1: state keeps the last K columns, the
    trailing K-1 are history). No activation (HF conv_1d is linear)."""
    length = hid.shape[0]
    k = mc.conv_kernel
    combined = jnp.concatenate(
        [conv_state[:, 1:].T.astype(hid.dtype), hid], axis=0
    )  # [K-1+L, d]
    conv_out = sum(
        combined[j : j + length] * p["conv_w"][:, j] for j in range(k)
    )
    conv_out = (conv_out + p["conv_b"]).astype(jnp.float32)
    conv_out = jnp.where(valid[:, None], conv_out, 0.0)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    window_full = jnp.concatenate(
        [conv_state.T.astype(hid.dtype), hid], axis=0
    )
    new_conv = jax.lax.dynamic_slice_in_dim(
        window_full, n_valid, k, axis=0
    ).T.astype(conv_state.dtype)
    return conv_out, new_conv


def _scan_chunked(
    a: jax.Array,  # [L, d] f32 per-step decay
    b: jax.Array,  # [L, d] f32 per-step input
    h0: jax.Array,  # [d] f32
    chunk: int = 128,
) -> Tuple[jax.Array, jax.Array]:
    """h_t = a_t h_{t-1} + b_t: associative scan inside chunks,
    sequential carry across chunks (mamba1._scan_chunked, 2-D)."""
    length = a.shape[0]
    pad = (-length) % chunk
    if pad:
        a = jnp.pad(a, [(0, pad), (0, 0)], constant_values=1.0)
        b = jnp.pad(b, [(0, pad), (0, 0)])
    n = (length + pad) // chunk
    a = a.reshape(n, chunk, a.shape[1])
    b = b.reshape(n, chunk, b.shape[1])

    def combine(x, y):
        (a1, b1), (a2, b2) = x, y
        return a1 * a2, a2 * b1 + b2

    def chunk_step(h, inp):
        a_c, b_c = inp
        pa, pb = jax.lax.associative_scan(combine, (a_c, b_c), axis=0)
        hs = pa * h[None] + pb
        return hs[-1], hs

    h_last, hs = jax.lax.scan(chunk_step, h0, (a, b))
    hs = hs.reshape(n * chunk, hs.shape[-1])[:length]
    return hs, h_last


def _out(p: Params, lru: jax.Array, y_gate: jax.Array, dtype):
    y = lru * y_gate
    out = y.astype(dtype) @ p["out_w"].T
    return out + p["out_b"] if p.get("out_b") is not None else out


def _y_branch(p: Params, x: jax.Array) -> jax.Array:
    y = x @ p["y_w"].T
    if p.get("y_b") is not None:
        y = y + p["y_b"]
    return jax.nn.gelu(y.astype(jnp.float32), approximate=True)


def mixer_sequence(
    p: Params,
    mc: RgLruConfig,
    x: jax.Array,  # [L, H] one sequence's contiguous rows
    valid: Optional[jax.Array],  # [L] bool (None = all valid)
    conv_state: jax.Array,  # [lru_width, K]
    rec_state: jax.Array,  # [lru_width] f32
    pos0: Optional[jax.Array] = None,  # [L] bool: row is abs position 0
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Scan one chunk with carried state (invalid rows are no-ops)."""
    length = x.shape[0]
    if valid is None:
        valid = jnp.ones((length,), bool)
    if pos0 is None:
        pos0 = jnp.zeros((length,), bool)
    hid = x @ p["x_w"].T
    if p.get("x_b") is not None:
        hid = hid + p["x_b"]
    hid = jnp.where(valid[:, None], hid, 0.0)
    conv_out, new_conv = _conv_seq(p, mc, hid, valid, conv_state)

    i_gate, log_a = _gates(p, mc, conv_out)  # [L, d] f32
    a = jnp.exp(log_a)
    mult = jnp.sqrt(jnp.maximum(1.0 - jnp.exp(2.0 * log_a), 0.0))
    reset = pos0[:, None]
    mult = jnp.where(reset, 1.0, mult)
    a = jnp.where(reset, 0.0, a)  # HF: recurrent_gate * ~reset
    drive = conv_out * i_gate * mult
    # invalid rows: a=1, b=0 -> state no-op
    a = jnp.where(valid[:, None], a, 1.0)
    drive = jnp.where(valid[:, None], drive, 0.0)
    hs, h_last = _scan_chunked(a, drive, rec_state.astype(jnp.float32))

    out = _out(p, hs, _y_branch(p, x), x.dtype)
    return jnp.where(valid[:, None], out, 0.0), new_conv, h_last


def mixer_step(
    p: Params,
    mc: RgLruConfig,
    x: jax.Array,  # [S, H] one token per slot
    active: jax.Array,  # [S] bool
    conv_state: jax.Array,  # [S, lru_width, K]
    rec_state: jax.Array,  # [S, lru_width] f32
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Closed-form single-token update, batched over slots. Decode
    rows are never at absolute position 0 (the prompt has >= 1 token),
    so no reset handling here."""
    hid = x @ p["x_w"].T
    if p.get("x_b") is not None:
        hid = hid + p["x_b"]
    window = jnp.concatenate(
        [conv_state[:, :, 1:], hid[:, :, None].astype(conv_state.dtype)],
        axis=-1,
    )  # [S, d, K]
    conv_out = jnp.sum(
        window.astype(jnp.float32) * p["conv_w"][None], axis=-1
    ) + p["conv_b"]

    i_gate, log_a = _gates(p, mc, conv_out)
    a = jnp.exp(log_a)
    mult = jnp.sqrt(jnp.maximum(1.0 - jnp.exp(2.0 * log_a), 0.0))
    new_rec = a * rec_state + conv_out * i_gate * mult

    out = _out(p, new_rec, _y_branch(p, x), x.dtype)
    new_conv = jnp.where(active[:, None, None], window, conv_state)
    new_rec = jnp.where(active[:, None], new_rec, rec_state)
    return jnp.where(active[:, None], out, 0.0), new_conv, new_rec


def init_mixer_states(
    mc: RgLruConfig, slots: int, dtype=jnp.float32
) -> Tuple[jax.Array, jax.Array]:
    return (
        jnp.zeros((slots, mc.lru_width, mc.conv_kernel), dtype),
        jnp.zeros((slots, mc.lru_width), jnp.float32),
    )

# SPDX-License-Identifier: Apache-2.0
"""Mamba-1 (selective scan / S6) mixer in JAX — original Mamba,
Falcon-Mamba and the Jamba hybrid's SSM layers (reference serves these
through mlx-lm with utils/mamba_cache.py state objects).

Per-channel selective SSM (HF ``MambaMixer.slow_forward``,
modeling_mamba.py): ``h_t = exp(dt_t A) h_{t-1} + (dt_t B_t) x_t``,
``y_t = C_t . h_t + D x_t``, with a depthwise causal conv over the
input half of in_proj and a silu(z) output gate. Unlike Mamba-2 the
discretization step dt is per CHANNEL (d_inner), so the decay differs
per (channel, state) pair and the SSD segment-sum form does not apply;
prefill uses a chunked ASSOCIATIVE scan over the elementwise
first-order recurrence instead (exact reassociation, f32).

Variants:
  * Falcon-Mamba: weightless RMS normalization of B, C and dt before
    dt_proj (HF ``FalconMambaMixer`` rms_forward, mixer_rms_eps),
  * Jamba: learned RMSNorm on dt, B, C (dt_layernorm / b_layernorm /
    c_layernorm).

Serving shape mirrors models/mamba2.py: per-slot ``conv_state
[d_inner, K]`` + ``ssm_state [d_inner, ds]`` f32; decode is one
closed-form update batched over slots, prefill scans a chunk carrying
state.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclass
class Mamba1Config:
    d_inner: int = 1024
    d_state: int = 16
    dt_rank: int = 64
    conv_kernel: int = 4
    use_conv_bias: bool = True
    use_bias: bool = False
    # falcon_mamba: weightless RMS over B/C/dt (mixer_rms_eps);
    # None = off
    mixer_rms_eps: Optional[float] = None
    # jamba: learned RMSNorm on dt/B/C (params dt_norm_w/b_norm_w/
    # c_norm_w present); eps
    norm_eps: float = 1e-6


def _rms(x: jax.Array, w: Optional[jax.Array], eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return n * w.astype(jnp.float32) if w is not None else n


def _dt_bc(p: Params, mc: Mamba1Config, conv_out: jax.Array):
    """x_proj -> (dt_in [.., dt_rank], B [.., ds], C [.., ds]) with the
    variant normalizations, then dt = softplus(dt_proj(dt_in))."""
    ssm_in = conv_out @ p["x_w"].T.astype(jnp.float32)
    dt_in = ssm_in[..., : mc.dt_rank]
    b = ssm_in[..., mc.dt_rank : mc.dt_rank + mc.d_state]
    c = ssm_in[..., mc.dt_rank + mc.d_state :]
    if mc.mixer_rms_eps is not None:  # falcon_mamba
        dt_in = _rms(dt_in, None, mc.mixer_rms_eps)
        b = _rms(b, None, mc.mixer_rms_eps)
        c = _rms(c, None, mc.mixer_rms_eps)
    if "dt_norm_w" in p:  # jamba
        dt_in = _rms(dt_in, p["dt_norm_w"], mc.norm_eps)
        b = _rms(b, p["b_norm_w"], mc.norm_eps)
        c = _rms(c, p["c_norm_w"], mc.norm_eps)
    dt = dt_in @ p["dt_w"].T.astype(jnp.float32)
    dt = jax.nn.softplus(dt + p["dt_b"])
    return dt, b, c


def _split_in(p: Params, x: jax.Array):
    proj = x @ p["in_w"].T
    if p.get("in_b") is not None:
        proj = proj + p["in_b"]
    half = proj.shape[-1] // 2
    return proj[..., :half], proj[..., half:]  # (hidden, gate)


def _scan_chunked(
    a: jax.Array,  # [L, d_inner, ds] f32 per-step decay
    b: jax.Array,  # [L, d_inner, ds] f32 per-step input
    h0: jax.Array,  # [d_inner, ds] f32
    chunk: int = 128,
) -> Tuple[jax.Array, jax.Array]:
    """h_t = a_t h_{t-1} + b_t via an associative scan inside chunks
    and a sequential carry across chunks. Returns (h [L, .], h_last)."""
    length = a.shape[0]
    pad = (-length) % chunk
    if pad:
        a = jnp.pad(a, [(0, pad), (0, 0), (0, 0)], constant_values=1.0)
        b = jnp.pad(b, [(0, pad), (0, 0), (0, 0)])
    n = (length + pad) // chunk
    a = a.reshape(n, chunk, *a.shape[1:])
    b = b.reshape(n, chunk, *b.shape[1:])

    def combine(x, y):
        (a1, b1), (a2, b2) = x, y
        return a1 * a2, a2 * b1 + b2

    def chunk_step(h, inp):
        a_c, b_c = inp
        # within-chunk prefix products/sums
        pa, pb = jax.lax.associative_scan(combine, (a_c, b_c), axis=0)
        hs = pa * h[None] + pb  # states at every step of the chunk
        return hs[-1], hs

    h_last, hs = jax.lax.scan(chunk_step, h0, (a, b))
    hs = hs.reshape(n * chunk, *hs.shape[2:])[:length]
    return hs, h_last


def mixer_sequence(
    p: Params,
    mc: Mamba1Config,
    x: jax.Array,  # [L, H] one sequence's contiguous rows
    valid: Optional[jax.Array],  # [L] bool (None = all valid)
    conv_state: jax.Array,  # [d_inner, K]
    ssm_state: jax.Array,  # [d_inner, ds] f32
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Scan one chunk with carried state (invalid rows are no-ops)."""
    length = x.shape[0]
    k = mc.conv_kernel
    hid, gate = _split_in(p, x)
    if valid is None:
        valid = jnp.ones((length,), bool)
    hid = jnp.where(valid[:, None], hid, 0.0)

    combined = jnp.concatenate(
        [conv_state[:, 1:].T.astype(hid.dtype), hid], axis=0
    )  # [K-1+L, d_inner]
    conv_out = sum(
        combined[j : j + length] * p["conv_w"][:, j] for j in range(k)
    )
    if p.get("conv_b") is not None:
        conv_out = conv_out + p["conv_b"]
    conv_out = jax.nn.silu(conv_out.astype(jnp.float32))
    conv_out = jnp.where(valid[:, None], conv_out, 0.0)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    window_full = jnp.concatenate(
        [conv_state.T.astype(hid.dtype), hid], axis=0
    )
    new_conv = jax.lax.dynamic_slice_in_dim(
        window_full, n_valid, k, axis=0
    ).T.astype(conv_state.dtype)

    dt, b, c = _dt_bc(p, mc, conv_out)  # [L, d_inner], [L, ds] x2
    dt = jnp.where(valid[:, None], dt, 0.0)  # no-op rows: a=1, b=0
    a_mat = -jnp.exp(p["a_log"].astype(jnp.float32))  # [d_inner, ds]
    decay = jnp.exp(dt[:, :, None] * a_mat[None])  # [L, d_inner, ds]
    drive = (dt * conv_out)[:, :, None] * b[:, None, :]
    hs, h_last = _scan_chunked(
        decay, drive, ssm_state.astype(jnp.float32)
    )
    y = jnp.einsum("lds,ls->ld", hs, c) + p["d"] * conv_out
    y = y * jax.nn.silu(gate.astype(jnp.float32))
    out = y.astype(x.dtype) @ p["out_w"].T
    if p.get("out_b") is not None:
        out = out + p["out_b"]
    return jnp.where(valid[:, None], out, 0.0), new_conv, h_last


def mixer_step(
    p: Params,
    mc: Mamba1Config,
    x: jax.Array,  # [S, H] one token per slot
    active: jax.Array,  # [S] bool
    conv_state: jax.Array,  # [S, d_inner, K]
    ssm_state: jax.Array,  # [S, d_inner, ds] f32
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Closed-form single-token update, batched over slots."""
    hid, gate = _split_in(p, x)
    window = jnp.concatenate(
        [conv_state[:, :, 1:], hid[:, :, None].astype(conv_state.dtype)],
        axis=-1,
    )  # [S, d_inner, K]
    conv_out = jnp.sum(
        window.astype(jnp.float32) * p["conv_w"][None], axis=-1
    )
    if p.get("conv_b") is not None:
        conv_out = conv_out + p["conv_b"]
    conv_out = jax.nn.silu(conv_out)  # [S, d_inner]

    dt, b, c = _dt_bc(p, mc, conv_out)  # [S, d_inner], [S, ds] x2
    a_mat = -jnp.exp(p["a_log"].astype(jnp.float32))
    decay = jnp.exp(dt[:, :, None] * a_mat[None])  # [S, d_inner, ds]
    new_ssm = ssm_state * decay + (
        (dt * conv_out)[:, :, None] * b[:, None, :]
    )
    y = jnp.einsum("sdn,sn->sd", new_ssm, c) + p["d"] * conv_out
    y = y * jax.nn.silu(gate.astype(jnp.float32))
    out = y.astype(x.dtype) @ p["out_w"].T
    if p.get("out_b") is not None:
        out = out + p["out_b"]
    new_conv = jnp.where(active[:, None, None], window, conv_state)
    new_ssm = jnp.where(active[:, None, None], new_ssm, ssm_state)
    return jnp.where(active[:, None], out, 0.0), new_conv, new_ssm


def init_mixer_states(
    mc: Mamba1Config, slots: int, dtype=jnp.float32
) -> Tuple[jax.Array, jax.Array]:
    return (
        jnp.zeros((slots, mc.d_inner, mc.conv_kernel), dtype),
        jnp.zeros((slots, mc.d_inner, mc.d_state), jnp.float32),
    )

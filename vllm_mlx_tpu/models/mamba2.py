# SPDX-License-Identifier: Apache-2.0
"""Mamba2 (SSD) mixer in JAX — pure Mamba2 and hybrid attention+SSM
models (Bamba / Nemotron-H class; reference serves these through
mlx-lm with utils/mamba_cache.py state objects).

Selective state space per head: ``h_t = exp(dt_t A) h_{t-1} +
dt_t B_t x_t^T``, ``y_t = C_t h_t + D x_t`` with a depthwise causal
conv over the (x, B, C) projection and a gated RMSNorm on the output
(HF ``Mamba2Mixer.torch_forward`` numerics, modeling_mamba2.py:457).

Serving shape: per-slot recurrent state replaces the KV cache —
``conv_state [cd, K]`` (last K conv inputs) and ``ssm_state
[nh, hd, ds]``. Decode is one closed-form update, batched over slots;
prefill scans a sequence's chunk carrying the state across chunked-
prefill steps.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclass
class MambaMixerConfig:
    num_heads: int = 8
    head_dim: int = 64
    state_size: int = 128
    n_groups: int = 1
    conv_kernel: int = 4
    intermediate_size: int = 1024  # num_heads * head_dim
    use_conv_bias: bool = True
    use_bias: bool = False
    norm_eps: float = 1e-5
    time_step_min: float = 0.001
    time_step_max: float = 0.1
    time_step_limit: Tuple[float, float] = (0.0, float("inf"))
    chunk_size: int = 256

    @property
    def conv_dim(self) -> int:
        return self.intermediate_size + 2 * self.n_groups * self.state_size


def _gated_rms_norm(y: jax.Array, gate: jax.Array, w: jax.Array,
                    eps: float) -> jax.Array:
    yf = y.astype(jnp.float32) * jax.nn.silu(gate.astype(jnp.float32))
    var = jnp.mean(yf * yf, axis=-1, keepdims=True)
    return (w * (yf * jax.lax.rsqrt(var + eps))).astype(y.dtype)


def _split_proj(p: Params, mc: MambaMixerConfig, x: jax.Array):
    """in_proj -> (gate, xBC, dt). x: [..., H]."""
    proj = x @ p["in_w"].T
    if p.get("in_b") is not None:
        proj = proj + p["in_b"]
    i = mc.intermediate_size
    cd = mc.conv_dim
    return (
        proj[..., :i],
        proj[..., i : i + cd],
        proj[..., i + cd : i + cd + mc.num_heads],
    )


def _dt_activate(p: Params, mc: MambaMixerConfig, dt: jax.Array) -> jax.Array:
    dt = jax.nn.softplus(dt.astype(jnp.float32) + p["dt_bias"])
    return jnp.clip(dt, mc.time_step_limit[0], mc.time_step_limit[1])


def _expand_groups(v: jax.Array, mc: MambaMixerConfig) -> jax.Array:
    """[..., ng*ds] -> [..., nh, ds] (heads share group params)."""
    shape = v.shape[:-1] + (mc.n_groups, mc.state_size)
    v = v.reshape(shape)
    return jnp.repeat(v, mc.num_heads // mc.n_groups, axis=-2)


def _mamba_core_chunked(
    xs: jax.Array,  # [L, nh, hd] f32
    b: jax.Array,  # [L, nh, ds] f32
    c: jax.Array,  # [L, nh, ds] f32
    dt: jax.Array,  # [L, nh] f32 (0 for invalid rows)
    a: jax.Array,  # [nh] f32 (negative)
    ssm_state: jax.Array,  # [nh, hd, ds] f32
    chunk: int = 64,
) -> Tuple[jax.Array, jax.Array]:
    """Chunk-parallel SSD scan (segment-sum formulation, HF
    modeling_mamba2.py torch_forward / Mamba2 paper listing 1): the
    per-token recurrence reassociates into within-chunk attention-like
    matmuls + one scan step per chunk — MXU-shaped prefill instead of a
    per-token scan. Exact (same recurrence, reassociated); f32."""
    length, nh, hd = xs.shape
    ds = b.shape[-1]
    pad = (-length) % chunk
    if pad:
        zf = lambda t: jnp.pad(t, [(0, pad)] + [(0, 0)] * (t.ndim - 1))
        xs, b, c, dt = zf(xs), zf(b), zf(c), zf(dt)
    n = (length + pad) // chunk

    def cshape(t):  # [L, nh, ...] -> [n, nh, C, ...]
        return t.reshape(n, chunk, nh, *t.shape[2:]).swapaxes(1, 2)

    xc, bc, cc = cshape(xs), cshape(b), cshape(c)  # [n, nh, C, d]
    da = cshape(dt) * a[None, :, None]  # [n, nh, C] log-decay
    cum = jnp.cumsum(da, axis=-1)
    tril = jnp.tril(jnp.ones((chunk, chunk), bool))
    decay = jnp.where(
        tril, jnp.exp(cum[..., :, None] - cum[..., None, :]), 0.0
    )
    xdt = xc * cshape(dt)[..., None]  # dt-weighted inputs
    scores = jnp.einsum("nhis,nhjs->nhij", cc, bc) * decay
    y_diag = jnp.einsum("nhij,nhjd->nhid", scores, xdt)
    # per-chunk state contribution: sum_j (dt_j x_j) (x) b_j decayed to
    # the chunk end
    b_dec = bc * jnp.exp(cum[..., -1:, None] - cum[..., None])
    s_chunk = jnp.einsum("nhjd,nhjs->nhds", xdt, b_dec)
    cum_last = cum[..., -1]  # [n, nh]

    def chunk_step(s, inp):
        c_i, cum_i, y_d, s_c, last = inp
        # s: [nh, hd, ds]
        y_off = jnp.einsum(
            "hds,his->hid", s, c_i * jnp.exp(cum_i)[..., None]
        )
        s_new = s * jnp.exp(last)[:, None, None] + s_c
        return s_new, y_d + y_off

    final, ys = jax.lax.scan(
        chunk_step,
        ssm_state.astype(jnp.float32),
        (cc, cum, y_diag, s_chunk, cum_last),
    )  # ys: [n, nh, C, hd]
    y = ys.swapaxes(1, 2).reshape(n * chunk, nh, hd)[:length]
    return y, final


def mixer_sequence(
    p: Params,
    mc: MambaMixerConfig,
    x: jax.Array,  # [L, H] one sequence's contiguous rows
    valid: Optional[jax.Array],  # [L] bool (None = all valid)
    conv_state: jax.Array,  # [cd, K] last K conv inputs
    ssm_state: jax.Array,  # [nh, hd, ds] f32
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Scan one sequence chunk with carried state. Invalid rows are
    no-ops (state unchanged, y zero). Returns (y [L, H], conv, ssm)."""
    length = x.shape[0]
    k = mc.conv_kernel
    nh, hd, ds = mc.num_heads, mc.head_dim, mc.state_size
    gate, x_bc, dt = _split_proj(p, mc, x)
    if valid is None:
        valid = jnp.ones((length,), bool)
    x_bc = jnp.where(valid[:, None], x_bc, 0.0)

    # depthwise causal conv over [state tail (K-1), new rows]
    combined = jnp.concatenate(
        [conv_state[:, 1:].T.astype(x_bc.dtype), x_bc], axis=0
    )  # [K-1+L, cd]
    conv_out = sum(
        combined[j : j + length] * p["conv_w"][:, j] for j in range(k)
    )
    if p.get("conv_b") is not None:
        conv_out = conv_out + p["conv_b"]
    conv_out = jax.nn.silu(conv_out.astype(jnp.float32))
    conv_out = jnp.where(valid[:, None], conv_out, 0.0)
    # new conv window = last K inputs ending at the last VALID row
    n_valid = jnp.sum(valid.astype(jnp.int32))
    window_full = jnp.concatenate(
        [conv_state.T.astype(x_bc.dtype), x_bc], axis=0
    )  # [K+L, cd]; last real input at index K-1 + n_valid - 1
    new_conv = jax.lax.dynamic_slice_in_dim(
        window_full, n_valid, k, axis=0
    ).T.astype(conv_state.dtype)

    xs = conv_out[:, : mc.intermediate_size].reshape(length, nh, hd)
    b = _expand_groups(
        conv_out[:, mc.intermediate_size : mc.intermediate_size
                 + mc.n_groups * ds], mc,
    )  # [L, nh, ds]
    c = _expand_groups(conv_out[:, mc.intermediate_size
                                + mc.n_groups * ds :], mc)
    dt = _dt_activate(p, mc, dt)  # [L, nh]
    dt = jnp.where(valid[:, None], dt, 0.0)  # no-op rows
    a = -jnp.exp(p["a_log"].astype(jnp.float32))  # [nh]

    if length >= 32:
        # prefill-sized chunks: segment-sum SSD form (one scan step per
        # 64 tokens, MXU-shaped matmuls)
        ys, new_ssm = _mamba_core_chunked(
            xs.astype(jnp.float32), b.astype(jnp.float32),
            c.astype(jnp.float32), dt, a,
            ssm_state.astype(jnp.float32),
        )
        ys = ys + p["d"][None, :, None] * xs.astype(jnp.float32)
    else:

        def step(h, inputs):
            xs_t, b_t, c_t, dt_t = inputs
            da = jnp.exp(dt_t * a)  # [nh]
            h = h * da[:, None, None] + (
                (dt_t[:, None] * b_t)[:, None, :] * xs_t[:, :, None]
            )
            y_t = jnp.einsum("hds,hs->hd", h, c_t) + p["d"][:, None] * xs_t
            return h, y_t

        new_ssm, ys = jax.lax.scan(
            step, ssm_state.astype(jnp.float32),
            (xs.astype(jnp.float32), b.astype(jnp.float32),
             c.astype(jnp.float32), dt),
        )
    y = ys.reshape(length, nh * hd)
    out = _gated_rms_norm(y, gate, p["norm_w"], mc.norm_eps)
    out = out.astype(x.dtype) @ p["out_w"].T
    if p.get("out_b") is not None:
        out = out + p["out_b"]
    return jnp.where(valid[:, None], out, 0.0), new_conv, new_ssm


def mixer_step(
    p: Params,
    mc: MambaMixerConfig,
    x: jax.Array,  # [S, H] one token per slot
    active: jax.Array,  # [S] bool — inactive slots are no-ops
    conv_state: jax.Array,  # [S, cd, K]
    ssm_state: jax.Array,  # [S, nh, hd, ds] f32
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Closed-form single-token update, batched over slots (HF decode
    branch, modeling_mamba2.py:509)."""
    s = x.shape[0]
    nh, hd, ds = mc.num_heads, mc.head_dim, mc.state_size
    gate, x_bc, dt = _split_proj(p, mc, x)
    window = jnp.concatenate(
        [conv_state[:, :, 1:], x_bc[:, :, None].astype(conv_state.dtype)],
        axis=-1,
    )  # [S, cd, K]
    conv_out = jnp.sum(
        window.astype(jnp.float32) * p["conv_w"][None], axis=-1
    )
    if p.get("conv_b") is not None:
        conv_out = conv_out + p["conv_b"]
    conv_out = jax.nn.silu(conv_out)  # [S, cd]

    xs = conv_out[:, : mc.intermediate_size].reshape(s, nh, hd)
    b = _expand_groups(
        conv_out[:, mc.intermediate_size : mc.intermediate_size
                 + mc.n_groups * ds], mc,
    )
    c = _expand_groups(conv_out[:, mc.intermediate_size
                                + mc.n_groups * ds :], mc)
    dt = _dt_activate(p, mc, dt)  # [S, nh]
    a = -jnp.exp(p["a_log"].astype(jnp.float32))
    da = jnp.exp(dt * a)  # [S, nh]
    new_ssm = ssm_state * da[:, :, None, None] + (
        (dt[:, :, None] * b)[:, :, None, :] * xs[:, :, :, None]
    )
    y = jnp.einsum(
        "shdn,shn->shd", new_ssm, c.astype(jnp.float32)
    ) + p["d"][None, :, None] * xs
    y = y.reshape(s, nh * hd)
    out = _gated_rms_norm(y, gate, p["norm_w"], mc.norm_eps)
    out = out.astype(x.dtype) @ p["out_w"].T
    if p.get("out_b") is not None:
        out = out + p["out_b"]
    keep = active[:, None]
    new_conv = jnp.where(
        active[:, None, None], window, conv_state
    )
    new_ssm = jnp.where(active[:, None, None, None], new_ssm, ssm_state)
    return jnp.where(keep, out, 0.0), new_conv, new_ssm


def init_mixer_states(
    mc: MambaMixerConfig, slots: int, dtype=jnp.float32
) -> Tuple[jax.Array, jax.Array]:
    return (
        jnp.zeros((slots, mc.conv_dim, mc.conv_kernel), dtype),
        jnp.zeros(
            (slots, mc.num_heads, mc.head_dim, mc.state_size), jnp.float32
        ),
    )

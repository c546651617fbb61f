# SPDX-License-Identifier: Apache-2.0
"""Context-parallel (ring) causal attention for long prefill.

The reference has no distributed backend at all (SURVEY §2.8); this is
the beyond-parity sequence-parallel primitive: a prompt too long for
one chip's HBM/compute is sharded CONTIGUOUSLY over a ``cp`` mesh axis
and attention runs as a ring — each device keeps its query shard
resident while key/value shards rotate around the ring via
``jax.lax.ppermute`` (ICI neighbor exchange, N-1 hops), accumulating
an online softmax in f32. Classic ring attention (Liu et al. 2023),
mapped to TPU idioms:

* ``shard_map`` over the mesh: per-device code is a plain flash loop;
  XLA overlaps each hop's ppermute with the previous block's matmuls;
* causal masking by ABSOLUTE positions reconstructed from the ring
  step (device d's step-s block came from device ``(d - s) mod N``),
  so blocks strictly in the future contribute nothing (they still run
  masked dots — SPMD programs are uniform; see the zig-zag note);
* GQA direct: q heads grouped over kv heads, no repetition copies;
* f32 running (m, l, acc) with bf16 block dots on the MXU.

Load balance: contiguous sharding makes device 0 do 1 useful block and
device N-1 do N (the classic causal skew). The standard fix is zig-zag
block placement (device d holds blocks d and 2N-1-d); the mask logic
here already keys off absolute positions, so zig-zag is a layout-only
extension — kept out of v1 for clarity and documented here.

This primitive is compile-validated on the virtual 8-device CPU mesh
(tests/test_ring_attention.py) and exposed for engine integration
behind long-context prefill; the single-chip serving path (paged pool
+ chunked prefill) is unaffected.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def _flash_block(q, k, v, mask, scale, m_prev, l_prev, acc):
    """One KV block of online-softmax attention.

    q [C, h, hd]; k/v [C, kvh, hd]; mask [C, C] bool (query row x kv
    col, True = attend); carries are f32 [C, h] / [C, h] / [C, h, hd].
    """
    c, h, hd = q.shape
    kvh = k.shape[1]
    g = h // kvh
    qg = q.reshape(c, kvh, g, hd)
    s = jnp.einsum(
        "qkgd,xkd->kqgx", qg, k, preferred_element_type=jnp.float32
    ) * scale  # [kvh, Cq, g, Ckv]
    s = jnp.where(mask[None, :, None, :], s, -jnp.inf)
    m_blk = jnp.max(s, axis=-1)  # [kvh, Cq, g]
    m_prev_r = m_prev.reshape(c, kvh, g).transpose(1, 0, 2)
    l_prev_r = l_prev.reshape(c, kvh, g).transpose(1, 0, 2)
    acc_r = acc.reshape(c, kvh, g, hd).transpose(1, 0, 2, 3)
    m_new = jnp.maximum(m_prev_r, m_blk)
    # fully-masked blocks leave -inf maxima; exp(-inf - -inf) guard
    m_safe = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
    alpha = jnp.where(
        jnp.isneginf(m_prev_r), 0.0, jnp.exp(m_prev_r - m_safe)
    )
    p = jnp.exp(s - m_safe[..., None])  # [kvh, Cq, g, Ckv]
    l_new = alpha * l_prev_r + jnp.sum(p, axis=-1)
    pv = jnp.einsum(
        "kqgx,xkd->kqgd",
        p.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    acc_new = acc_r * alpha[..., None] + pv
    return (
        m_new.transpose(1, 0, 2).reshape(c, h),
        l_new.transpose(1, 0, 2).reshape(c, h),
        acc_new.transpose(1, 0, 2, 3).reshape(c, h, hd),
    )


def _ring_local(q, k, v, *, n_dev: int, chunk: int, scale: float,
                axis: str):
    """Per-device body under shard_map: rotate KV around the ring."""
    c, h, hd = q.shape
    me = jax.lax.axis_index(axis)
    rows = me * chunk + jnp.arange(chunk)  # absolute query positions
    m = jnp.full((c, h), -jnp.inf, jnp.float32)
    l = jnp.zeros((c, h), jnp.float32)
    acc = jnp.zeros((c, h, hd), jnp.float32)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    for s in range(n_dev):
        owner = (me - s) % n_dev  # original device of the current KV
        cols = owner * chunk + jnp.arange(chunk)
        mask = cols[None, :] <= rows[:, None]
        m, l, acc = _flash_block(q, k, v, mask, scale, m, l, acc)
        if s + 1 < n_dev:
            k = jax.lax.ppermute(k, axis, perm)
            v = jax.lax.ppermute(v, axis, perm)
    l_safe = jnp.where(l > 0, l, 1.0)
    return (acc / l_safe[..., None]).astype(q.dtype)


def ring_attention(
    q: jax.Array,  # [T, h, hd] — T divisible by mesh["cp"]
    k: jax.Array,  # [T, kvh, hd]
    v: jax.Array,  # [T, kvh, hd]
    mesh: Mesh,
    scale: float,
    axis: str = "cp",
) -> jax.Array:
    """Causal self-attention with the sequence sharded over ``axis``.

    Inputs/outputs are sharded [T/"cp", ...] over the mesh (global
    arrays under jit; shard_map handles the per-device view). Exact vs
    single-device causal attention up to f32 accumulation order.
    """
    n_dev = mesh.shape[axis]
    t = q.shape[0]
    if t % n_dev:
        raise ValueError(f"sequence {t} not divisible by cp={n_dev}")
    chunk = t // n_dev
    fn = jax.shard_map(
        partial(
            _ring_local, n_dev=n_dev, chunk=chunk, scale=scale, axis=axis
        ),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(q, k, v)


def shard_sequence(mesh: Mesh, *arrays, axis: str = "cp"):
    """Place [T, ...] arrays sequence-sharded over the cp axis."""
    sh = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, sh) for a in arrays)

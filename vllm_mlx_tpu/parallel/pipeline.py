# SPDX-License-Identifier: Apache-2.0
"""Pipeline-parallel (GPipe-style) inference over a ``pp`` mesh axis.

The reference has no distributed backend (SURVEY §2.8); this is the
beyond-parity stage-parallel primitive for models whose weights exceed
one chip's HBM: layers split into ``pp`` contiguous stages (one device
each), and microbatches stream through the stages with activations
hopping between neighbors via ``jax.lax.ppermute`` (ICI, one hop per
tick). TPU mapping notes:

* the whole schedule is ONE ``shard_map``-ed program — SPMD programs
  are uniform, so every device runs its stage every tick and the
  fill/drain bubbles are masked arithmetic, not control flow (XLA
  cannot skip them; the M >> pp regime amortizes the bubble exactly as
  in GPipe);
* stage weights live as stacked leaves with a leading ``[pp]`` axis
  sharded over the mesh, so each device holds ONLY its stage's slice —
  the memory win that motivates PP;
* ticks run ``M + pp - 1`` times; device 0 injects microbatch ``t``,
  the last stage's outputs are collected by masked ``psum`` (cheap:
  one term is nonzero).

Inference-only: no 1F1B reordering (that exists to limit activation
liveness in training; inference holds one activation per stage).
Validated numerically on the virtual 8-device CPU mesh
(tests/test_pipeline.py) and compile-checked by the driver dryrun.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def stack_stages(stage_params: list) -> Any:
    """Stack per-stage param pytrees into leaves with a leading [pp]
    axis (shard this axis over the mesh with ``place_stages``)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stage_params)


def place_stages(mesh: Mesh, stacked: Any, axis: str = "pp") -> Any:
    """Put stacked stage params on the mesh, stage axis sharded —
    each device materializes only its own stage's weights."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, stacked)


def _pp_local(params_local, x, *, stage_fn, n_stages, n_micro, axis):
    """Per-device body: run my stage every tick, activations hop."""
    me = jax.lax.axis_index(axis)
    # shard_map hands each device its [1, ...] slice of the stage axis
    params_me = jax.tree.map(lambda p: p[0], params_local)
    m, rest = x.shape[0], x.shape[1:]
    carry = jnp.zeros(rest, x.dtype)
    outs = jnp.zeros_like(x)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    for t in range(n_micro + n_stages - 1):
        feed = x[t] if t < n_micro else jnp.zeros(rest, x.dtype)
        inp = jnp.where(me == 0, feed, carry)
        y = stage_fn(params_me, inp)
        o = t - (n_stages - 1)
        if 0 <= o < n_micro:
            outs = outs.at[o].set(
                jnp.where(me == n_stages - 1, y, outs[o])
            )
        if t + 1 < n_micro + n_stages - 1:
            carry = jax.lax.ppermute(y, axis, perm)
    # only the last stage holds real outputs; one nonzero psum term
    return jax.lax.psum(
        jnp.where(me == n_stages - 1, outs, jnp.zeros_like(outs)), axis
    )


def pipeline_forward(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,  # leaves [pp, ...], sharded over ``axis``
    x: jax.Array,  # [n_micro, ...] microbatches (replicated)
    mesh: Mesh,
    axis: str = "pp",
) -> jax.Array:
    """Run ``stage_fn`` per stage over all microbatches; returns the
    last stage's outputs [n_micro, ...]. ``stage_fn(params, act)`` must
    be shape-preserving (decoder stages are: [B, T, H] -> [B, T, H])."""
    n_stages = mesh.shape[axis]
    n_micro = x.shape[0]
    fn = jax.shard_map(
        partial(
            _pp_local,
            stage_fn=stage_fn,
            n_stages=n_stages,
            n_micro=n_micro,
            axis=axis,
        ),
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(axis), stacked_params),
            P(),
        ),
        out_specs=P(),
        check_vma=False,
    )
    return fn(stacked_params, x)

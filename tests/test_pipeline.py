# SPDX-License-Identifier: Apache-2.0
"""Pipeline-parallel (GPipe-style) inference parity on the virtual
8-device CPU mesh: microbatches streamed through pp stages via
ppermute must match running the stages sequentially on one device,
and each device must hold only its own stage's weight slice."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh


@pytest.fixture(scope="module", params=[4, 8])
def pp_mesh(request):
    devs = jax.devices()
    if len(devs) < request.param:
        pytest.skip("needs the 8-device CPU mesh")
    return Mesh(np.array(devs[: request.param]), ("pp",))


def _stage_fn(params, x):
    # shape-preserving toy decoder stage: linear + gelu + residual
    return x + jax.nn.gelu(x @ params["w"] + params["b"])


def _make_stages(rng, n_stages, h):
    stages = []
    for _ in range(n_stages):
        stages.append(
            {
                "w": jnp.asarray(rng.normal(size=(h, h)) * 0.1, jnp.float32),
                "b": jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32),
            }
        )
    return stages


def test_pipeline_matches_sequential(rng, pp_mesh):
    from vllm_mlx_tpu.parallel.pipeline import (
        pipeline_forward,
        place_stages,
        stack_stages,
    )

    pp = pp_mesh.shape["pp"]
    h, n_micro, b = 16, 2 * pp + 3, 3
    stages = _make_stages(rng, pp, h)
    x = jnp.asarray(rng.normal(size=(n_micro, b, h)), jnp.float32)

    stacked = place_stages(pp_mesh, stack_stages(stages))
    got = pipeline_forward(_stage_fn, stacked, x, pp_mesh)

    want = x
    for p in stages:
        want = _stage_fn(p, want)

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_pipeline_single_microbatch(rng, pp_mesh):
    # the degenerate M=1 case still drains through all stages
    from vllm_mlx_tpu.parallel.pipeline import (
        pipeline_forward,
        place_stages,
        stack_stages,
    )

    pp = pp_mesh.shape["pp"]
    h = 8
    stages = _make_stages(rng, pp, h)
    x = jnp.asarray(rng.normal(size=(1, 2, h)), jnp.float32)
    stacked = place_stages(pp_mesh, stack_stages(stages))
    got = pipeline_forward(_stage_fn, stacked, x, pp_mesh)
    want = x
    for p in stages:
        want = _stage_fn(p, want)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_stage_weights_are_sharded(rng, pp_mesh):
    # the memory win: each device materializes 1/pp of the stacked leaves
    from vllm_mlx_tpu.parallel.pipeline import place_stages, stack_stages

    pp = pp_mesh.shape["pp"]
    stages = _make_stages(rng, pp, 16)
    stacked = place_stages(pp_mesh, stack_stages(stages))
    w = stacked["w"]
    assert w.shape == (pp, 16, 16)
    for shard in w.addressable_shards:
        assert shard.data.shape == (1, 16, 16)

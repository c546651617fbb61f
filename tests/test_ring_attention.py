# SPDX-License-Identifier: Apache-2.0
"""Ring (context-parallel) causal attention parity on the virtual
8-device CPU mesh: sequence-sharded flash with rotating KV must match
single-device causal attention exactly (f32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh


def _ref_causal(q, k, v, scale):
    t, h, hd = q.shape
    kvh = k.shape[1]
    g = h // kvh
    qg = np.asarray(q, np.float32).reshape(t, kvh, g, hd)
    kf = np.asarray(k, np.float32)
    vf = np.asarray(v, np.float32)
    s = np.einsum("qkgd,xkd->kqgx", qg, kf) * scale
    mask = np.tril(np.ones((t, t), bool))
    s = np.where(mask[None, :, None, :], s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    out = np.einsum("kqgx,xkd->kqgd", p, vf)
    return out.transpose(1, 0, 2, 3).reshape(t, h, hd)


@pytest.fixture(scope="module")
def cp_mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return Mesh(np.array(devs[:8]), ("cp",))


@pytest.mark.parametrize("h,kvh", [(8, 8), (8, 2)])
def test_ring_matches_single_device(rng, cp_mesh, h, kvh):
    from vllm_mlx_tpu.ops.ring_attention import (
        ring_attention,
        shard_sequence,
    )

    t, hd = 128, 32
    q = jnp.asarray(rng.standard_normal((t, h, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((t, kvh, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((t, kvh, hd)), jnp.float32)
    ref = _ref_causal(q, k, v, 0.125)
    qs, ks, vs = shard_sequence(cp_mesh, q, k, v)
    got = jax.jit(
        lambda a, b, c: ring_attention(a, b, c, cp_mesh, 0.125)
    )(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_ring_rejects_indivisible(rng, cp_mesh):
    from vllm_mlx_tpu.ops.ring_attention import ring_attention

    q = jnp.zeros((130, 8, 32))
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q, q[:, :2], q[:, :2], cp_mesh, 0.125)


def test_ring_first_device_sees_only_its_prefix(rng, cp_mesh):
    """Causality across the ring: perturbing a LATER shard's K/V must
    not change an earlier shard's outputs."""
    from vllm_mlx_tpu.ops.ring_attention import (
        ring_attention,
        shard_sequence,
    )

    t, h, hd = 64, 4, 16
    q = jnp.asarray(rng.standard_normal((t, h, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((t, h, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((t, h, hd)), jnp.float32)
    fn = jax.jit(lambda a, b, c: ring_attention(a, b, c, cp_mesh, 0.25))
    base = np.asarray(fn(*shard_sequence(cp_mesh, q, k, v)))
    k2 = k.at[t // 2:].add(3.0)  # devices 4..7 only
    v2 = v.at[t // 2:].add(-1.5)
    pert = np.asarray(fn(*shard_sequence(cp_mesh, q, k2, v2)))
    np.testing.assert_array_equal(base[: t // 2], pert[: t // 2])
    assert np.abs(pert[t // 2:] - base[t // 2:]).max() > 1e-3

# SPDX-License-Identifier: Apache-2.0
"""Mesh + sharding rules for tensor/data-parallel serving.

Megatron-style TP layout expressed as ``PartitionSpec`` rules over the
param pytree; XLA/GSPMD inserts the collectives (all-reduce after
o_proj/down_proj contractions rides ICI). The paged KV pool shards over
kv heads on the same axis, so decode attention is fully local per chip.

Axes:
  * ``dp`` — batch slots of the decode state (replicated params)
  * ``tp`` — attention heads / FFN / vocab / KV heads / MoE experts' FFN
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


_LEAF_RULES: Dict[str, P] = {
    "embed_tokens": P("tp", None),
    "lm_head": P("tp", None),
    "q_proj": P("tp", None),
    "k_proj": P("tp", None),
    "v_proj": P("tp", None),
    "q_bias": P("tp"),
    "k_bias": P("tp"),
    "v_bias": P("tp"),
    "o_proj": P(None, "tp"),
    "o_bias": P(),
    "gate_proj": P("tp", None),
    "up_proj": P("tp", None),
    "down_proj": P(None, "tp"),
    "gate_bias": P("tp"),
    "up_bias": P("tp"),
    "down_bias": P(),
    "input_layernorm": P(),
    "post_attention_layernorm": P(),
    "q_norm": P(),
    "k_norm": P(),
    "norm": P(),
    # MoE: keep experts replicated across tp, shard each expert's FFN dim
    "router": P(),
    "gate_w": P(None, None, "tp"),
    "up_w": P(None, None, "tp"),
    "down_w": P(None, "tp", None),
}


def param_pspecs(params: Any, tp: int = 1) -> Any:
    """PartitionSpec pytree matching ``params`` by leaf key name.

    With ``tp`` given, any rule whose sharded dimension does not divide
    evenly falls back to replication for that leaf (e.g. odd vocab
    sizes on tiny test tokenizers — GSPMD requires exact divisibility).
    """

    def rule(path, leaf):
        name = None
        for entry in reversed(path):
            if isinstance(entry, jax.tree_util.DictKey):
                name = entry.key
                break
        spec = _LEAF_RULES.get(name, P())
        if tp > 1 and hasattr(leaf, "shape"):
            for dim, axis in enumerate(spec):
                if axis == "tp" and (
                    dim >= len(leaf.shape) or leaf.shape[dim] % tp
                ):
                    return P()
        return spec

    return jax.tree_util.tree_map_with_path(rule, params)


def state_pspecs(state: Any) -> Any:
    """PartitionSpecs for the RunnerState: KV combined-heads over tp;
    sampling/scalar state replicated (tiny).

    The draft model's KV pool (speculative decoding) shards exactly like
    the target pool — same page geometry, kv heads over ``tp``. Hybrid
    SSM recurrent state replicates: the mamba mixer's params carry no
    TP rule (each chip runs the full mixer redundantly; it is a small
    fraction of hybrid-model FLOPs), so its state must replicate too.
    """
    from ..core.model_runner import RunnerState

    # built via tree_map so new SamplingState fields can't drift out of sync
    sampling = jax.tree.map(lambda _: P(), state.sampling)
    kv_spec = P(None, None, "tp", None)
    draft = None
    if state.draft_pages is not None:
        draft = [kv_spec for _ in state.draft_pages]
    ssm = None
    if state.ssm_states is not None:
        ssm = [(P(), P()) for _ in state.ssm_states]
    lh = P() if state.last_hidden is not None else None
    return RunnerState(
        kv_pages=[kv_spec for _ in state.kv_pages],
        device_tokens=P(),
        sampling=sampling,
        step_count=P(),
        block_tables=P(),
        kv_lens=P(),
        n_active=P(),
        rope_deltas=P(),
        draft_pages=draft,
        ssm_states=ssm,
        last_hidden=lh,
    )


def _named(mesh: Mesh, specs: Any) -> Any:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh: Mesh, params: Any) -> Any:
    tp = int(mesh.shape.get("tp", 1))
    return jax.device_put(params, _named(mesh, param_pspecs(params, tp)))


def shard_runner_state(mesh: Mesh, state: Any) -> Any:
    return jax.device_put(state, _named(mesh, state_pspecs(state)))


def validate_tp(cfg: ModelConfig, tp: int) -> None:
    if cfg.num_key_value_heads % tp or cfg.num_attention_heads % tp:
        raise ValueError(
            f"tp={tp} must divide kv heads ({cfg.num_key_value_heads}) "
            f"and attention heads ({cfg.num_attention_heads})"
        )
    if cfg.intermediate_size % tp:
        raise ValueError(f"tp={tp} must divide intermediate_size")


class MeshCollectives:
    """Named communicator handle for the vLLM platform shim
    (vllm_plugin.py). There is no NCCL-style communicator object on
    TPU: collectives are inserted by XLA/GSPMD from the sharding
    annotations above and ride ICI. This class exists so external
    integrations have a stable import path to point at."""

    backend = "xla-gspmd"

    @staticmethod
    def describe() -> str:
        return (
            "collectives are compiler-inserted (psum/all-gather/"
            "reduce-scatter over the jax.sharding.Mesh ICI axes)"
        )

# SPDX-License-Identifier: Apache-2.0
"""Weight quantization: int8 (per-output-channel) and int4 (grouped).

The reference serves pre-quantized mlx-community checkpoints (4/8-bit
group-quantized, e.g. README.md:84-88 benchmarks all use them). Here
quantization is applied at load time to any bf16 checkpoint:

  * int8: symmetric per-output-channel. ``W ~= w_q * scale[:, None]``.
  * int4: symmetric per-(output, group) with group_size input channels,
    stored as ``jnp.int4`` (TPU-native 4-bit dtype).

Matmuls keep the quantized operand as the RHS; XLA fuses the
int->bf16 convert + scale into the MXU feed, so HBM reads shrink by
2x/4x — decode is weight-bandwidth-bound, so this lifts single-stream
throughput nearly proportionally.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

DEFAULT_GROUP = 128


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("w_q", "scale"),
    meta_fields=("bits", "group_size", "transposed"),
)
@dataclass
class QuantizedTensor:
    """Quantized weight leaf; ``bits``/``group_size``/``transposed`` are
    static pytree metadata so jit tracing never sees them as values.

    ``transposed``: codes stored [K, O] instead of the HF [O, K]
    (stacked-decode down_proj layout — ops/stacked_decode_pallas.py);
    the scale stays per-OUTPUT-channel [O, 1]."""

    w_q: jax.Array
    scale: jax.Array
    bits: int = 8
    group_size: int = 0
    transposed: bool = False

    @property
    def shape(self):
        if self.bits == 4:
            # int4 is stored nibble-packed [O, K/2]; report logical K
            return (*self.w_q.shape[:-1], self.w_q.shape[-1] * 2)
        if self.transposed:
            return (self.w_q.shape[1], self.w_q.shape[0])
        return self.w_q.shape

    @property
    def ndim(self):
        return self.w_q.ndim


def is_quantized(leaf: Any) -> bool:
    return isinstance(leaf, QuantizedTensor)


def quantize_int8(w: jax.Array) -> QuantizedTensor:
    """Symmetric per-row (output-channel) int8 over the last axis."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QuantizedTensor(w_q=w_q, scale=scale.astype(jnp.bfloat16), bits=8)


def quantize_int4(
    w: jax.Array, group_size: int = DEFAULT_GROUP
) -> QuantizedTensor:
    """Symmetric grouped int4 over the last axis, stored NIBBLE-PACKED
    as uint8 [O, K/2] in the half-split layout the fused Pallas kernel
    consumes without lane shuffles: byte [o, j] = w[o, j] (low nibble) |
    w[o, j + K/2] << 4. (jnp.int4 arrays trip XLA transfer paths on
    this platform and double HBM traffic anyway.)"""
    *lead, k = w.shape
    g = group_size
    if k % g or (k // 2) % g or k % 2:
        return quantize_int8(w)  # fallback for odd shapes
    wf = w.astype(jnp.float32).reshape(*lead, k // g, g)
    amax = jnp.max(jnp.abs(wf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    codes = (
        jnp.clip(jnp.round(wf / scale), -7, 7)
        .astype(jnp.int32)
        .reshape(*lead, k)
    )
    lo = codes[..., : k // 2] & 0xF
    hi = (codes[..., k // 2 :] & 0xF) << 4
    return QuantizedTensor(
        w_q=(lo | hi).astype(jnp.uint8),
        scale=scale.squeeze(-1).astype(jnp.bfloat16),  # [*lead, k//g]
        bits=4,
        group_size=g,
    )


def unpack_int4(q: QuantizedTensor) -> jax.Array:
    """Packed uint8 [O, K/2] -> sign-extended int8 codes [O, K]."""
    b = q.w_q.astype(jnp.int32)
    lo = (b << 28) >> 28
    hi = (b << 24) >> 28
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.int8)


def dequantize(q: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    if q.bits == 8:
        w = q.w_q.T if q.transposed else q.w_q
        return (
            w.astype(jnp.float32) * q.scale.astype(jnp.float32)
        ).astype(dtype)
    g = q.group_size
    codes = unpack_int4(q)
    *lead, k = codes.shape
    wf = codes.astype(jnp.float32).reshape(*lead, k // g, g)
    wf = wf * q.scale.astype(jnp.float32)[..., None]
    return wf.reshape(*lead, k).astype(dtype)


def quant_matmul(x: jax.Array, q: QuantizedTensor) -> jax.Array:
    """x [.., K] @ W[O, K]^T with quantized W -> [.., O] (f32 accum).

    int8 runs as W8A8: activations are dynamically quantized per token
    and the contraction uses the MXU's native int8 x int8 -> int32 path.
    (A convert-to-bf16 of the weights would NOT fuse across the dot
    input on TPU — XLA materializes the dequantized copy, tripling HBM
    traffic — so dequant-into-matmul is a losing strategy here.)
    """
    if q.bits == 8:
        xf = x.astype(jnp.float32)
        x_amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        x_scale = jnp.maximum(x_amax, 1e-8) / 127.0
        x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            x_q,
            q.w_q,
            (((x.ndim - 1,), (0 if q.transposed else 1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        return y * x_scale * q.scale.astype(jnp.float32)[:, 0]
    # int4: the fused Pallas dequant-matmul on TPU (0.5 B/weight HBM
    # reads end to end); portable dequantize-then-dot elsewhere (tests)
    if jax.default_backend() == "tpu":
        from .quant_pallas import int4_matmul

        return int4_matmul(x, q)
    w = dequantize(q, jnp.float32)
    return jax.lax.dot_general(
        x.astype(jnp.float32),
        w,
        (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def fuse_quantized(qs) -> QuantizedTensor:
    """Concatenate same-K QuantizedTensors along the OUTPUT axis so one
    kernel launch serves several projections (q/k/v, gate/up). Both
    storage layouts concatenate trivially on axis 0 (int8 [O, K];
    int4 packed [O, K/2] half-split — packing is per-row)."""
    q0 = qs[0]
    assert all(
        q.bits == q0.bits
        and q.group_size == q0.group_size
        and q.w_q.shape[1:] == q0.w_q.shape[1:]
        for q in qs
    )
    return QuantizedTensor(
        w_q=jnp.concatenate([q.w_q for q in qs], axis=0),
        scale=jnp.concatenate([q.scale for q in qs], axis=0),
        bits=q0.bits,
        group_size=q0.group_size,
    )


def fuse_projections(params: Any) -> Any:
    """Decode-path fusion pass (run AFTER quantize_params, single-chip
    only — the concatenated output axis is not a plain TP shard):
    rewrites each layer dict's quantized q/k/v into one ``qkv_proj``
    and gate/up into one ``gate_up_proj``. Decode is launch- and
    bandwidth-bound at tiny token counts; one kernel over the
    concatenated output rows replaces three (reference serves fused
    qkv via mlx-lm's fused checkpoints; here fusion happens at load).
    The decoder splits outputs by sizes derived from the config."""

    def walk(node):
        if isinstance(node, list):
            return [walk(v) for v in node]
        if not isinstance(node, dict):
            return node
        node = {k: walk(v) for k, v in node.items()}
        if "mlp_gate" in node and "attn_gate" in node:
            # Mllama cross-attention dict: q is per-step but k/v project
            # the per-request vision states at ADMISSION — never fuse
            return node
        qkv = [node.get(n) for n in ("q_proj", "k_proj", "v_proj")]
        biases = [node.get(n) for n in ("q_bias", "k_bias", "v_bias")]
        if (
            all(is_quantized(w) for w in qkv)
            and len({(w.bits, w.group_size, w.w_q.shape[1]) for w in qkv})
            == 1
            and (
                all(b is not None for b in biases)
                or all(b is None for b in biases)
            )
        ):
            node["qkv_proj"] = fuse_quantized(qkv)
            if biases[0] is not None:
                node["qkv_bias"] = jnp.concatenate(biases)
            for n in ("q_proj", "k_proj", "v_proj", "q_bias", "k_bias", "v_bias"):
                node.pop(n, None)
        gu = [node.get(n) for n in ("gate_proj", "up_proj")]
        gub = [node.get(n) for n in ("gate_bias", "up_bias")]
        if (
            all(is_quantized(w) for w in gu)
            and len({(w.bits, w.group_size, w.w_q.shape[1]) for w in gu})
            == 1
            and (
                all(b is not None for b in gub)
                or all(b is None for b in gub)
            )
        ):
            node["gate_up_proj"] = fuse_quantized(gu)
            if gub[0] is not None:
                node["gate_up_bias"] = jnp.concatenate(gub)
            for n in ("gate_proj", "up_proj", "gate_bias", "up_bias"):
                node.pop(n, None)
        return node

    return walk(params)


_QUANT_SKIP = {
    "input_layernorm",
    "post_attention_layernorm",
    "q_norm",
    "k_norm",
    "norm",
    "router",  # routing accuracy matters; tiny anyway
}
_QUANT_BIAS_SUFFIX = "_bias"


def quantize_params(
    params: Any, bits: int = 8, group_size: int = DEFAULT_GROUP,
    quantize_embedding: bool = False, quantize_experts: bool = True,
    expert_bits: Optional[int] = None,
) -> Any:
    """Quantize all 2-D+ projection weights in a decoder param tree.

    ``expert_bits``: width for MoE expert stacks (defaults to ``bits``).
    The sweet spot for big MoE on one chip is dense int8 + expert int4
    (``bits=8, expert_bits=4``): dense int4 loses to int8 on dispatch
    tax (NOTES_TPU_ENV round-5), while experts are 95%+ of MoE bytes and
    the gathered kernel's group-dot keeps int4 dequant off the hot path.
    """
    fn = quantize_int8 if bits == 8 else (
        lambda w: quantize_int4(w, group_size)
    )
    ebits = expert_bits or bits

    _EXPERT_STACKS = ("gate_w", "up_w", "down_w")

    def walk(node, name=""):
        if isinstance(node, dict):
            # MoE expert dicts: quantize the stacks over the
            # CONTRACTION axis for the gathered dequant kernels
            # (ops.moe_quant_pallas) — the only way 30B-class MoE fits
            # a 16 GB chip. Two supported layouts: routed-SwiGLU
            # (separate gate/up/down stacks) and GPT-OSS (fused
            # gate_up_w + biases, reordered to contiguous halves).
            # granitemoe's input_w/output_w layout keeps bf16 stacks
            # (ragged_dot can't consume quantized operands).
            is_swiglu_moe = (
                quantize_experts
                and all(k in node for k in _EXPERT_STACKS)
                and "gate_up_w" not in node
                and all(
                    getattr(node[k], "ndim", 0) == 3 for k in _EXPERT_STACKS
                )
            )
            is_gpt_oss_moe = (
                quantize_experts
                and "gate_up_w" in node
                and "down_w" in node
                and getattr(node["gate_up_w"], "ndim", 0) == 3
            )
            if is_gpt_oss_moe:
                from .moe_quant_pallas import quantize_gpt_oss_experts

                node = quantize_gpt_oss_experts(node, ebits, group_size)
            out = {}
            for k, v in node.items():
                if is_swiglu_moe and k in _EXPERT_STACKS:
                    from .moe_quant_pallas import quantize_expert_stack

                    out[k] = quantize_expert_stack(v, ebits, group_size)
                elif is_gpt_oss_moe and k in (
                    "gate_up_w", "down_w", "gate_up_b", "down_b"
                ):
                    out[k] = v  # stacks handled above; biases stay dense
                else:
                    out[k] = walk(v, k)
            return out
        if isinstance(node, list):
            return [walk(v, name) for v in node]
        if not hasattr(node, "ndim") or node.ndim < 2:
            return node
        if name in _QUANT_SKIP or name.endswith(_QUANT_BIAS_SUFFIX):
            return node
        if name == "embed_tokens" and not quantize_embedding:
            return node
        if node.ndim == 3:
            # unsupported expert-stack layout (gpt_oss/granitemoe fused
            # projections) — ragged_dot needs dense operands
            return node
        return fn(node)

    return walk(params)

# SPDX-License-Identifier: Apache-2.0
"""Generic decoder-only transformer forward (functional, paged-KV).

One implementation covers the dense families the reference serves via
mlx-lm (Llama 3.x, Qwen2, Qwen3 — reference models/llm.py:40) plus
Qwen3-MoE. Family differences are config-driven: qk-norm (Qwen3),
attention bias (Qwen2), explicit head_dim, sliding-window layer types,
MoE layers.

Three entry points share the same layer stack:
  * ``prefill``      — one sequence's chunk against the paged pool
  * ``decode``       — one token per batch slot against the paged pool
  * ``dense_forward``— full sequence, no cache (HF logits-parity tests)

MoE uses ``jax.lax.ragged_dot`` (megablocks-style grouped matmul): tokens
are sorted by expert so every expert's matmul is one contiguous MXU-
friendly block — the TPU-native equivalent of mlx-lm's switch_mlp
(SURVEY.md section 7 design translation).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import attention as att
from ..ops.layers import (
    apply_rope,
    embed,
    linear,
    lm_head_logits,
    rms_norm,
    rope_cos_sin,
    swiglu_mlp,
)

Params = Dict[str, Any]


def _bnorm(cfg: ModelConfig, x, p: Params, name: str):
    """Block norm dispatch: RMSNorm (default), plain LayerNorm
    (Starcoder2-class), Nemotron LayerNorm1P ((1 + weight) scale), or
    OLMo-v1 NON-PARAMETRIC LayerNorm (no weight, no bias)."""
    if cfg.norm_type == "layernorm_noparam":
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + cfg.rms_norm_eps)).astype(
            x.dtype
        )
    if cfg.norm_type in ("layernorm", "layernorm1p", "layernorm_nobias"):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        w = p[name].astype(jnp.float32)
        if cfg.norm_type == "layernorm1p":
            w = 1.0 + w
        y = (xf - mean) * jax.lax.rsqrt(var + cfg.rms_norm_eps) * w
        if cfg.norm_type != "layernorm_nobias":
            y = y + p[name + "_bias"].astype(jnp.float32)
        return y.astype(x.dtype)
    return rms_norm(x, p[name], cfg.rms_norm_eps, cfg.rms_add_one)


def _layer_chunk(cfg: ModelConfig, layer_idx: int) -> Optional[int]:
    """Llama 4 chunked attention: the chunk size for layer_types
    "chunked_attention" layers (queries attend only within their
    aligned position chunk), None = causal."""
    if cfg.attn_chunk_size is None or cfg.layer_types is None:
        return None
    if cfg.layer_types[layer_idx] == "chunked_attention":
        return cfg.attn_chunk_size
    return None


def _layer_window(cfg: ModelConfig, layer_idx: int) -> Optional[int]:
    if cfg.sliding_window is None:
        return None
    if cfg.layer_types is not None:
        if cfg.layer_types[layer_idx] == "sliding_attention":
            return cfg.sliding_window
        return None
    return cfg.sliding_window


def _deinterleave(x: jax.Array) -> jax.Array:
    """Interleaved rope channel pairs (x0,x1),(x2,x3).. -> half layout
    [x0,x2,..,x1,x3,..] (HF apply_rotary_pos_emb_interleave's view/
    transpose; DeepSeek checkpoints store rope channels interleaved).
    Applying the SAME permutation to q and k preserves q.k exactly, so
    the cache keeps the half layout."""
    d = x.shape[-1]
    return (
        x.reshape(*x.shape[:-1], d // 2, 2)
        .swapaxes(-1, -2)
        .reshape(*x.shape[:-1], d)
    )


def _mla_qkv(
    cfg: ModelConfig, p: Params, x: jax.Array, cos: jax.Array, sin: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """DeepSeek multi-head latent attention (HF modeling_deepseek_v3.py
    DeepseekV3Attention): LoRA-compressed q (optional), MQA-style shared
    rope key, per-head K/V decompressed from the kv latent. V is
    zero-padded to the qk head_dim so the paged pool stores uniform
    heads; the pad channels contribute zeros to the attention output and
    are sliced off before o_proj."""
    m = cfg.mla
    t = x.shape[0]
    nh = cfg.num_attention_heads
    nope, rope_d = m["qk_nope_head_dim"], m["qk_rope_head_dim"]
    v_d = m["v_head_dim"]
    qk_hd = nope + rope_d
    if "q_proj" in p:
        q = linear(x, p["q_proj"])
    else:
        qa = rms_norm(
            linear(x, p["q_a_proj"], p.get("q_a_bias")),
            p["q_a_layernorm"],
            cfg.rms_norm_eps,
        )
        q = linear(qa, p["q_b_proj"])
    q = q.reshape(t, nh, qk_hd)
    q_nope, q_pe = q[..., :nope], q[..., nope:]
    ckv = linear(x, p["kv_a_proj"], p.get("kv_a_bias"))  # [t, rank+rope_d]
    rank = m["kv_lora_rank"]
    k_lat, k_pe = ckv[:, :rank], ckv[:, None, rank:]
    kv = linear(
        rms_norm(k_lat, p["kv_a_layernorm"], cfg.rms_norm_eps),
        p["kv_b_proj"],
    ).reshape(t, nh, nope + v_d)
    k_nope, v = kv[..., :nope], kv[..., nope:]
    if m.get("rope_interleave", True):
        q_pe = _deinterleave(q_pe)
        k_pe = _deinterleave(k_pe)
    q_pe = apply_rope(q_pe, cos, sin)
    k_pe = apply_rope(k_pe, cos, sin)
    q = jnp.concatenate([q_nope, q_pe], axis=-1)
    k = jnp.concatenate(
        [k_nope, jnp.broadcast_to(k_pe, (t, nh, rope_d))], axis=-1
    )
    v = jnp.pad(v, ((0, 0), (0, 0), (0, qk_hd - v_d)))
    return q, k, v


def _apply_rope_glm(
    x: jax.Array, cos: jax.Array, sin: jax.Array
) -> jax.Array:
    """GLM-4 rotary: complex rotation of ADJACENT channel pairs —
    out[2i]   = x[2i] cos(t_i) - x[2i+1] sin(t_i)
    out[2i+1] = x[2i+1] cos(t_i) + x[2i] sin(t_i)
    (HF modeling_glm4.py rotate_half interleaves -odd/even and the
    cos/sin half-table is repeat_interleaved per pair)."""
    dtype = x.dtype
    c = jnp.repeat(cos, 2, axis=-1)[:, None, :].astype(jnp.float32)
    s = jnp.repeat(sin, 2, axis=-1)[:, None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    even = xf[..., 0::2]
    odd = xf[..., 1::2]
    rh = jnp.stack([-odd, even], axis=-1).reshape(xf.shape)
    return (xf * c + rh * s).astype(dtype)


def _qkv(
    cfg: ModelConfig, p: Params, x: jax.Array, cos: jax.Array,
    sin: jax.Array, use_rope: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    if cfg.mla is not None:
        return _mla_qkv(cfg, p, x, cos, sin)
    t = x.shape[0]
    hd = cfg.head_dim
    if "qkv_proj" in p:
        # quantized decode fusion (ops/quant.py fuse_projections)
        qo = cfg.num_attention_heads * hd
        ko = cfg.num_key_value_heads * hd
        qkv = linear(x, p["qkv_proj"], p.get("qkv_bias"))
        q = qkv[:, :qo].reshape(t, cfg.num_attention_heads, hd)
        k = qkv[:, qo : qo + ko].reshape(t, cfg.num_key_value_heads, hd)
        v = qkv[:, qo + ko :].reshape(t, cfg.num_key_value_heads, hd)
    else:
        q = linear(x, p["q_proj"], p.get("q_bias"))
        k = linear(x, p["k_proj"], p.get("k_bias"))
        if cfg.use_qk_norm and cfg.qk_norm_flat:
            # OLMo2: RMSNorm over the FULL projection before reshape
            q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps)
        q = q.reshape(t, cfg.num_attention_heads, hd)
        k = k.reshape(t, cfg.num_key_value_heads, hd)
        v = linear(x, p["v_proj"], p.get("v_bias")).reshape(t, cfg.num_key_value_heads, hd)
    if (
        cfg.use_qk_norm
        and not cfg.qk_norm_flat
        and not cfg.qk_norm_after_rope
    ):
        if cfg.norm_type == "layernorm_nobias":
            # Cohere per-head qk LayerNorm: mean-centered, weights
            # shaped [num_heads, head_dim] (HF CohereLayerNorm tuple)
            def _ln(v, w):
                vf = v.astype(jnp.float32)
                mu = jnp.mean(vf, axis=-1, keepdims=True)
                var = jnp.var(vf, axis=-1, keepdims=True)
                return (
                    (vf - mu) * jax.lax.rsqrt(var + cfg.rms_norm_eps)
                    * w.astype(jnp.float32)[None]
                ).astype(v.dtype)

            q = _ln(q, p["q_norm"])
            k = _ln(k, p["k_norm"])
        elif cfg.qk_norm_layernorm:
            # Persimmon: per-head LayerNorm with weight AND bias on the
            # reshaped heads (HF PersimmonAttention q/k_layernorm)
            def _lnb(v, w, b):
                vf = v.astype(jnp.float32)
                mu = jnp.mean(vf, axis=-1, keepdims=True)
                var = jnp.var(vf, axis=-1, keepdims=True)
                return (
                    (vf - mu) * jax.lax.rsqrt(var + cfg.rms_norm_eps)
                    * w.astype(jnp.float32)
                    + b.astype(jnp.float32)
                ).astype(v.dtype)

            q = _lnb(q, p["q_norm"], p["q_norm_bias"])
            k = _lnb(k, p["k_norm"], p["k_norm_bias"])
        else:
            q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps, cfg.rms_add_one)
            k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps, cfg.rms_add_one)
    if cfg.clip_qkv is not None:
        # OLMo/OLMoE/DBRX: clamp the projections (after any flat norm,
        # before rotary — HF order; elementwise so reshape-invariant)
        cl = cfg.clip_qkv
        q = jnp.clip(q, -cl, cl)
        k = jnp.clip(k, -cl, cl)
        v = jnp.clip(v, -cl, cl)
    if not use_rope:
        # EXAONE4 NoPE global layers: positions come from the cache
        # ordering only
        pass
    elif cfg.rope_glm:
        # GLM-4: rotary over the leading rd channels with PAIR-shared
        # angles and a full-width rotate_half (HF modeling_glm4.py
        # apply_rotary_pos_emb) — a different linear map from standard
        # partial rope
        rd = int(hd * cfg.partial_rotary_factor)
        q = jnp.concatenate(
            [_apply_rope_glm(q[..., :rd], cos, sin), q[..., rd:]], axis=-1
        )
        k = jnp.concatenate(
            [_apply_rope_glm(k[..., :rd], cos, sin), k[..., rd:]], axis=-1
        )
    elif cfg.partial_rotary_factor < 1.0:
        # Bamba/Nemotron-style partial rope: rotate the leading channels
        rd = int(hd * cfg.partial_rotary_factor)
        q = jnp.concatenate(
            [apply_rope(q[..., :rd], cos, sin), q[..., rd:]], axis=-1
        )
        k = jnp.concatenate(
            [apply_rope(k[..., :rd], cos, sin), k[..., rd:]], axis=-1
        )
    else:
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
    if (
        cfg.use_qk_norm
        and cfg.qk_norm_after_rope
        and (use_rope or not cfg.qk_norm_rope_only)
    ):
        if cfg.qk_norm_weightless:
            # Llama 4 L2 norm (HF Llama4TextL2Norm): weightless RMS,
            # rope layers only (NoPE layers skip via qk_norm_rope_only)
            def _l2(v):
                vf = v.astype(jnp.float32)
                return (
                    vf
                    * jax.lax.rsqrt(
                        jnp.mean(vf * vf, axis=-1, keepdims=True)
                        + cfg.rms_norm_eps
                    )
                ).astype(v.dtype)

            q, k = _l2(q), _l2(k)
        else:
            # Hunyuan: per-head norm AFTER rotary
            q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps, cfg.rms_add_one)
            k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps, cfg.rms_add_one)
    return q, k, v


def moe_mlp(
    cfg: ModelConfig,
    p: Params,
    x: jax.Array,
    moe_top_k: Optional[int] = None,
) -> jax.Array:
    """Sparse MoE block via expert-sorted grouped matmul.

    ``moe_top_k`` implements the reference's documented-but-missing
    ``--moe-top-k`` expert reduction (reference docs/guides/moe-top-k.md):
    clamp the router's experts-per-token below the checkpoint's value.
    """
    t, h = x.shape
    e = cfg.num_experts
    k = cfg.num_experts_per_tok
    if moe_top_k is not None:
        k = max(1, min(k, moe_top_k))
    router_logits = linear(x, p["router"]).astype(jnp.float32)
    probs = jax.nn.softmax(router_logits, axis=-1)
    topk_p, topk_i = jax.lax.top_k(probs, k)  # [T, k]
    if cfg.norm_topk_prob:
        topk_p = topk_p / jnp.sum(topk_p, axis=-1, keepdims=True)
    return _routed_swiglu(p, x, topk_p, topk_i, e)


def _sort_by_expert(topk_i: jax.Array, t: int, k: int, e: int):
    """Expert-sorted dispatch order for ragged grouped matmuls."""
    flat_expert = topk_i.reshape(-1)  # [T*k]
    flat_token = jnp.repeat(jnp.arange(t), k)
    order = jnp.argsort(flat_expert)
    sorted_expert = flat_expert[order]
    sorted_token = flat_token[order]
    group_sizes = jnp.bincount(sorted_expert, length=e)
    return order, sorted_expert, sorted_token, group_sizes


def _routed_swiglu(
    p: Params,
    x: jax.Array,
    topk_p: jax.Array,  # [T, k] f32 routing weights
    topk_i: jax.Array,  # [T, k] expert ids
    e: int,
) -> jax.Array:
    """Expert-sorted grouped-matmul SwiGLU over separate gate/up/down
    expert stacks (Qwen3-MoE / Mixtral / DeepSeek routed experts).

    Quantized expert stacks (ops.moe_quant_pallas — the only way
    30B-class MoE fits a 16 GB chip) route to the gathered dequant
    kernel; bf16 stacks keep XLA's ragged_dot."""
    from ..ops.quant import is_quantized

    if is_quantized(p["gate_w"]):
        from ..ops.moe_quant_pallas import routed_swiglu_quant

        return routed_swiglu_quant(
            x, topk_p, topk_i, p["gate_w"], p["up_w"], p["down_w"], e
        )
    t = x.shape[0]
    k = topk_i.shape[1]
    order, _, sorted_token, group_sizes = _sort_by_expert(topk_i, t, k, e)
    xs = x[sorted_token]
    g = jax.lax.ragged_dot(xs, p["gate_w"], group_sizes)
    u = jax.lax.ragged_dot(xs, p["up_w"], group_sizes)
    hidden = (
        jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
    ).astype(x.dtype)
    y = jax.lax.ragged_dot(hidden, p["down_w"], group_sizes)
    weights = topk_p.reshape(-1)[order].astype(jnp.float32)
    y = y.astype(jnp.float32) * weights[:, None]
    out = jax.ops.segment_sum(y, sorted_token, num_segments=t)
    return out.astype(x.dtype)


def moe_mlp_llama4(
    cfg: ModelConfig,
    p: Params,
    x: jax.Array,
    moe_top_k: Optional[int] = None,
) -> jax.Array:
    """Llama 4 MoE (HF modeling_llama4.py Llama4TextMoe/Llama4Router):
    top-k on raw router logits, SIGMOID of the selected logits scales
    the expert INPUTS (not the outputs — the scaling passes through the
    GLU nonlinearity), experts summed; the shared expert is added by
    the caller (_mlp_block "shared_mlp")."""
    t = x.shape[0]
    e = cfg.num_experts
    k = cfg.num_experts_per_tok
    if moe_top_k is not None:
        k = max(1, min(k, moe_top_k))
    router_logits = linear(x, p["router"]).astype(jnp.float32)
    topk_v, topk_i = jax.lax.top_k(router_logits, k)  # raw logits
    weights = jax.nn.sigmoid(topk_v)  # [T, k]
    from ..ops.quant import is_quantized

    if is_quantized(p["gate_w"]):
        from ..ops.moe_quant_pallas import routed_swiglu_quant

        return routed_swiglu_quant(
            x, weights, topk_i, p["gate_w"], p["up_w"], p["down_w"], e,
            input_scaled=True,
        )
    order, _, sorted_token, group_sizes = _sort_by_expert(topk_i, t, k, e)
    xs = (
        x[sorted_token].astype(jnp.float32)
        * weights.reshape(-1)[order][:, None]
    ).astype(x.dtype)
    g = jax.lax.ragged_dot(xs, p["gate_w"], group_sizes)
    u = jax.lax.ragged_dot(xs, p["up_w"], group_sizes)
    hidden = (
        jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
    ).astype(x.dtype)
    y = jax.lax.ragged_dot(hidden, p["down_w"], group_sizes)
    out = jax.ops.segment_sum(
        y.astype(jnp.float32), sorted_token, num_segments=t
    )
    return out.astype(x.dtype)


def moe_mlp_gpt_oss(
    cfg: ModelConfig,
    p: Params,
    x: jax.Array,
    moe_top_k: Optional[int] = None,
) -> jax.Array:
    """GPT-OSS MoE (HF modeling_gpt_oss.py GptOssMLP): biased router,
    top-k on RAW logits then softmax over the selected k; experts use a
    fused gate_up projection with per-expert biases and the clamped GLU
    activation (up+1) * gate * sigmoid(1.702 * gate)."""
    t, h = x.shape
    e = cfg.num_experts
    k = cfg.num_experts_per_tok
    if moe_top_k is not None:
        k = max(1, min(k, moe_top_k))
    logits = linear(x, p["router"], p.get("router_bias")).astype(jnp.float32)
    topk_v, topk_i = jax.lax.top_k(logits, k)  # [T, k]
    topk_p = jax.nn.softmax(topk_v, axis=-1)
    from ..ops.quant import is_quantized

    if is_quantized(p["gate_up_w"]):
        from ..ops.moe_quant_pallas import routed_clamped_glu_quant

        return routed_clamped_glu_quant(
            x, topk_p, topk_i, p["gate_up_w"], p["gate_up_b"],
            p["down_w"], p["down_b"], e, cfg.swiglu_limit,
        )
    order, sorted_expert, sorted_token, group_sizes = _sort_by_expert(
        topk_i, t, k, e
    )
    xs = x[sorted_token]
    gu = jax.lax.ragged_dot(xs, p["gate_up_w"], group_sizes)  # [T*k, 2I]
    gu = gu.astype(jnp.float32) + p["gate_up_b"][sorted_expert].astype(
        jnp.float32
    )
    gate, up = gu[..., 0::2], gu[..., 1::2]
    limit = cfg.swiglu_limit
    gate = jnp.minimum(gate, limit)
    up = jnp.clip(up, -limit, limit)
    glu = gate * jax.nn.sigmoid(gate * 1.702)
    hidden = ((up + 1.0) * glu).astype(x.dtype)
    y = jax.lax.ragged_dot(hidden, p["down_w"], group_sizes)
    y = y.astype(jnp.float32) + p["down_b"][sorted_expert].astype(jnp.float32)
    weights = topk_p.reshape(-1)[order].astype(jnp.float32)
    out = jax.ops.segment_sum(
        y * weights[:, None], sorted_token, num_segments=t
    )
    return out.astype(x.dtype)


def moe_mlp_ernie(
    cfg: ModelConfig,
    p: Params,
    x: jax.Array,
    moe_top_k: Optional[int] = None,
) -> jax.Array:
    """ERNIE 4.5 MoE (HF Ernie4_5_MoeSparseMoeBlock): softmax scores,
    selection on scores + e_score_correction_bias (weights gather the
    UNBIASED scores), renormalized with a clamp floor."""
    e = cfg.num_experts
    k = cfg.num_experts_per_tok
    if moe_top_k is not None:
        k = max(1, min(k, moe_top_k))
    logits = linear(x, p["router"]).astype(jnp.float32)
    scores = jax.nn.softmax(logits, axis=-1)
    choice = scores + p["e_score_bias"].astype(jnp.float32)[None, :]
    _, topk_i = jax.lax.top_k(choice, k)
    topk_p = jnp.take_along_axis(scores, topk_i, axis=1)
    topk_p = topk_p / jnp.maximum(
        jnp.sum(topk_p, axis=-1, keepdims=True), cfg.moe_norm_min
    )
    return _routed_swiglu(p, x, topk_p, topk_i, e)


def moe_mlp_granite(
    cfg: ModelConfig,
    p: Params,
    x: jax.Array,
    moe_top_k: Optional[int] = None,
) -> jax.Array:
    """GraniteMoE block (HF GraniteMoeTopKGating/GraniteMoeMoE): top-k
    on RAW router logits then softmax over the selected k; experts use
    a fused input_linear whose output halves are (gate, up) CONTIGUOUS
    chunks with silu GLU, and an unbiased output_linear."""
    t, h = x.shape
    e = cfg.num_experts
    k = cfg.num_experts_per_tok
    if moe_top_k is not None:
        k = max(1, min(k, moe_top_k))
    logits = linear(x, p["router"]).astype(jnp.float32)
    topk_v, topk_i = jax.lax.top_k(logits, k)
    topk_p = jax.nn.softmax(topk_v, axis=-1)
    order, _, sorted_token, group_sizes = _sort_by_expert(topk_i, t, k, e)
    xs = x[sorted_token]
    gu = jax.lax.ragged_dot(xs, p["input_w"], group_sizes)  # [T*k, 2I]
    inter = gu.shape[-1] // 2
    hidden = (
        jax.nn.silu(gu[..., :inter].astype(jnp.float32))
        * gu[..., inter:].astype(jnp.float32)
    ).astype(x.dtype)
    y = jax.lax.ragged_dot(hidden, p["output_w"], group_sizes)
    weights = topk_p.reshape(-1)[order].astype(jnp.float32)
    out = jax.ops.segment_sum(
        y.astype(jnp.float32) * weights[:, None], sorted_token,
        num_segments=t,
    )
    return out.astype(x.dtype)


def moe_mlp_deepseek(
    cfg: ModelConfig,
    p: Params,
    x: jax.Array,
    moe_top_k: Optional[int] = None,
) -> jax.Array:
    """DeepSeek V2/V3 routed experts (HF DeepseekV2MoEGate /
    DeepseekV3TopkRouter): V3 scores = sigmoid(logits) with the
    e_score_correction_bias added for SELECTION only (weights gather the
    un-biased scores); V2 scores = softmax(logits). Group-limited
    routing keeps topk_group groups (group score: V3 = sum of top-2
    biased scores, V2 = max). Weights optionally renormalized, then
    scaled by routed_scaling_factor."""
    t, h = x.shape
    e = cfg.num_experts
    k = cfg.num_experts_per_tok
    if moe_top_k is not None:
        k = max(1, min(k, moe_top_k))
    logits = linear(x, p["router"]).astype(jnp.float32)
    v3 = cfg.moe_topk_method == "noaux_tc"
    if v3:
        scores = jax.nn.sigmoid(logits)
        choice = scores + p["e_score_bias"].astype(jnp.float32)[None, :]
    else:
        scores = jax.nn.softmax(logits, axis=-1)
        choice = scores
    if cfg.n_group > 1 and cfg.moe_topk_method in (
        "noaux_tc",
        "group_limited_greedy",
    ):
        g = cfg.n_group
        per_group = choice.reshape(t, g, e // g)
        if v3:  # group score = sum of the group's top-2
            top2, _ = jax.lax.top_k(per_group, 2)
            group_scores = jnp.sum(top2, axis=-1)
        else:  # V2: group max
            group_scores = jnp.max(per_group, axis=-1)
        _, group_idx = jax.lax.top_k(group_scores, cfg.topk_group)
        group_mask = jnp.zeros((t, g), bool).at[
            jnp.arange(t)[:, None], group_idx
        ].set(True)
        choice = jnp.where(
            jnp.repeat(group_mask, e // g, axis=1), choice, 0.0
        )
    _, topk_i = jax.lax.top_k(choice, k)
    gather_from = scores if v3 else choice
    topk_p = jnp.take_along_axis(gather_from, topk_i, axis=1)
    if cfg.norm_topk_prob:
        topk_p = topk_p / (jnp.sum(topk_p, axis=-1, keepdims=True) + 1e-20)
    topk_p = topk_p * cfg.routed_scaling_factor
    return _routed_swiglu(p, x, topk_p, topk_i, e)


def moe_mlp_phimoe(
    cfg: ModelConfig,
    p: Params,
    x: jax.Array,
    moe_top_k: Optional[int] = None,
) -> jax.Array:
    """PhiMoE sparsemixer routing at inference (HF modeling_phimoe
    ``sparsemixer``, jitter/training branches elided): expert 1 =
    argmax; its weight = softmax over the gates that survive the
    sparsity mask ((max - s) / max(|s|, max) <= 2 * jitter_eps);
    expert 2 repeats the procedure with expert 1 masked to -inf."""
    e = cfg.num_experts
    eps2 = 2.0 * cfg.router_jitter_eps
    logits = linear(x, p["router"]).astype(jnp.float32)

    def pick(scores):
        m = jnp.max(scores, axis=-1, keepdims=True)
        factor = jnp.maximum(jnp.abs(logits), m)  # ORIGINAL |scores|
        masked = jnp.where((m - scores) / factor > eps2, -jnp.inf, scores)
        gates = jax.nn.softmax(masked, axis=-1)
        idx = jnp.argmax(scores, axis=-1)
        w = jnp.take_along_axis(gates, idx[:, None], axis=-1)[:, 0]
        return idx, w

    e1, w1 = pick(logits)
    masked2 = jnp.where(
        jax.nn.one_hot(e1, e, dtype=bool), -jnp.inf, logits
    )
    e2, w2 = pick(masked2)
    k = 2
    if moe_top_k is not None and moe_top_k < 2:
        k = 1
    topk_i = jnp.stack([e1, e2], axis=-1)[:, :k]
    topk_p = jnp.stack([w1, w2], axis=-1)[:, :k]
    return _routed_swiglu(p, x, topk_p, topk_i, e)


def _mlp_block(
    cfg: ModelConfig,
    layer_idx: int,
    p: Params,
    x: jax.Array,
    moe_top_k: Optional[int],
) -> jax.Array:
    if "moe" in p:
        if cfg.moe_style == "gpt_oss":
            out = moe_mlp_gpt_oss(cfg, p["moe"], x, moe_top_k)
        elif cfg.moe_style == "granite":
            out = moe_mlp_granite(cfg, p["moe"], x, moe_top_k)
        elif cfg.moe_style == "ernie":
            out = moe_mlp_ernie(cfg, p["moe"], x, moe_top_k)
        elif cfg.moe_style == "phimoe":
            out = moe_mlp_phimoe(cfg, p["moe"], x, moe_top_k)
        elif cfg.moe_style == "llama4":
            out = moe_mlp_llama4(cfg, p["moe"], x, moe_top_k)
        elif cfg.moe_style.startswith("deepseek"):
            out = moe_mlp_deepseek(cfg, p["moe"], x, moe_top_k)
        else:
            out = moe_mlp(cfg, p["moe"], x, moe_top_k)
        if "shared_mlp" in p:
            # shared experts: dense MLP added to the routed output —
            # ungated (DeepSeek) or scaled by sigmoid(shared_expert_gate)
            # (Qwen3-Next, HF Qwen3NextSparseMoeBlock:848-851);
            # Granite 4.0 ships a fused-GLU input_linear variant
            sm = p["shared_mlp"]
            if "input_w" in sm:
                gu = linear(x, sm["input_w"]).astype(jnp.float32)
                inter = gu.shape[-1] // 2
                shared = linear(
                    (jax.nn.silu(gu[..., :inter]) * gu[..., inter:]).astype(
                        x.dtype
                    ),
                    sm["output_w"],
                )
            else:
                shared = swiglu_mlp(x, p["shared_mlp"], cfg.hidden_act)
            if cfg.shared_expert_gated:
                shared = shared * jax.nn.sigmoid(
                    linear(x, p["shared_gate"]).astype(jnp.float32)
                ).astype(shared.dtype)
            out = out + shared
        return out
    if (
        "gate_proj" not in p["mlp"]
        and "gate_up_proj" not in p["mlp"]
    ):
        # gateless MLP (Nemotron): down(act(up(x)))
        mlp = p["mlp"]
        y = linear(x, mlp["up_proj"], mlp.get("up_bias")).astype(
            jnp.float32
        )
        if cfg.hidden_act == "relu2":
            y = jnp.square(jax.nn.relu(y))
        elif cfg.hidden_act == "xielu":
            # Apertus xIELU (HF XIELUActivation._xielu_python):
            # per-layer learnable alpha_p/alpha_n stored pre-softplus
            ap = jax.nn.softplus(mlp["xielu_alpha_p"].astype(jnp.float32))
            beta = mlp.get("xielu_beta", jnp.float32(0.5)).astype(
                jnp.float32
            )
            eps = mlp.get("xielu_eps", jnp.float32(-1e-6)).astype(
                jnp.float32
            )
            an = beta + jax.nn.softplus(
                mlp["xielu_alpha_n"].astype(jnp.float32)
            )
            y = jnp.where(
                y > 0,
                ap * y * y + beta * y,
                (jnp.expm1(jnp.minimum(y, eps)) - y) * an + beta * y,
            )
        elif cfg.hidden_act in ("gelu", "gelu_pytorch_tanh", "gelu_new"):
            y = jax.nn.gelu(y, approximate=cfg.hidden_act != "gelu")
        else:
            y = jax.nn.silu(y)
        return linear(
            y.astype(x.dtype), mlp["down_proj"], mlp.get("down_bias")
        )
    return swiglu_mlp(x, p["mlp"], cfg.hidden_act)


# attend(kv_pool, layer, q, k, v, sinks) -> (attn_out, kv_pool)
AttendFn = Callable[..., Tuple[jax.Array, jax.Array]]


def cross_window_attention(
    q: jax.Array,  # [T, qh, hd] (post q_norm)
    ck: jax.Array,  # [S, Lc, kvh, hd] K (post k_norm) per slot
    cv: jax.Array,  # [S, Lc, kvh, hd] V per slot
    tok_lo: jax.Array,  # [S, Lc] i32: kv j visible iff lo <= p < hi
    tok_hi: jax.Array,  # [S, Lc] i32
    width: jax.Array,  # [S] i32 — the request's full padded cross width
    row_slot: Optional[jax.Array],  # [T] i32 (None = row i IS slot i)
    pos: jax.Array,  # [T] i32 text position of each query row
    scale: float,
) -> Tuple[jax.Array, jax.Array]:
    """Mllama text->vision cross attention (HF MllamaTextCrossAttention
    + _prepare_cross_attention_mask semantics, modeling_mllama.py:48-73).

    Every cross-KV position j carries the TOKEN window [tok_lo, tok_hi)
    of text positions allowed to attend it (built from the processor's
    per-image spans, processing_mllama.py get_cross_attention_token_mask;
    padding tiles carry an empty window). HF's full-row fixup is
    reproduced exactly: a query row with NO visible kv attends the
    request's whole padded width with zero bias, and its returned
    full_row flag is 0 (the caller multiplies the MLP path by it).
    Rows whose slot has no images (width == 0) return zeros — combined
    with full_row == 0 this reproduces HF's skip of the cross layer for
    text-only inputs.

    Returns (attn_out [T, qh, hd] in q.dtype, full_row [T] f32).
    """
    s, lc, kvh, hd = ck.shape
    t, qh, _ = q.shape
    g = qh // kvh
    qf = q.reshape(t, kvh, g, hd)
    if row_slot is None:
        k_r, v_r = ck, cv  # decode fast path: row i == slot i
        lo_r, hi_r, w_r = tok_lo, tok_hi, width
        valid = jnp.ones((t,), bool)
    else:
        valid = row_slot < s
        rs = jnp.minimum(row_slot, s - 1)
        k_r, v_r = ck[rs], cv[rs]
        lo_r, hi_r, w_r = tok_lo[rs], tok_hi[rs], width[rs]
        w_r = jnp.where(valid, w_r, 0)
    p1 = pos[:, None]
    vis = (lo_r <= p1) & (p1 < hi_r) & valid[:, None]  # [T, Lc]
    any_vis = jnp.any(vis, axis=-1)  # [T]
    in_width = (
        jnp.arange(lc, dtype=jnp.int32)[None, :] < w_r[:, None]
    )  # [T, Lc]
    allowed = jnp.where(any_vis[:, None], vis, in_width)
    scores = jnp.einsum(
        "tkgd,tlkd->tkgl", qf, k_r,
        preferred_element_type=jnp.float32,
    ) * scale
    scores = jnp.where(allowed[:, None, None, :], scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.where(
        jnp.isfinite(scores), jnp.exp(scores - m_safe), 0.0
    )
    l = jnp.sum(e, axis=-1, keepdims=True)
    w = (e / jnp.maximum(l, 1e-30)).astype(v_r.dtype)
    out = jnp.einsum(
        "tkgl,tlkd->tkgd", w, v_r, preferred_element_type=jnp.float32
    )
    full_row = (any_vis & valid).astype(jnp.float32)
    return out.reshape(t, qh, hd).astype(q.dtype), full_row


def _cross_block(
    cfg: ModelConfig,
    layer_idx: int,
    p: Params,
    x: jax.Array,
    attn_fn: Callable[[jax.Array], Tuple[jax.Array, jax.Array]],
    moe_top_k: Optional[int],
) -> jax.Array:
    """Mllama cross-attention decoder block (HF
    MllamaCrossAttentionDecoderLayer.forward, modeling_mllama.py:673-723):
    tanh-gated cross attention and tanh-gated MLP, the MLP masked by the
    full-text-row flag. ``attn_fn(q_normed) -> (attn [T,qh,hd],
    full_row [T])`` owns the KV source (serving buffers or dense)."""
    cp = p["cross"]
    t = x.shape[0]
    residual = x
    h = _bnorm(cfg, x, p, "input_layernorm")
    q = linear(h, cp["q_proj"]).reshape(
        t, cfg.num_attention_heads, cfg.head_dim
    )
    q = rms_norm(q, cp["q_norm"], cfg.rms_norm_eps)
    attn, full_row = attn_fn(q)
    attn = linear(attn.reshape(t, -1), cp["o_proj"])
    gate_a = jnp.tanh(cp["attn_gate"].astype(jnp.float32)).astype(x.dtype)
    x = residual + gate_a * attn
    residual = x
    h = _bnorm(cfg, x, p, "post_attention_layernorm")
    mlp = _mlp_block(cfg, layer_idx, p, h, moe_top_k)
    mlp = mlp * full_row[:, None].astype(mlp.dtype)
    gate_m = jnp.tanh(cp["mlp_gate"].astype(jnp.float32)).astype(x.dtype)
    return residual + gate_m * mlp


def mixer_api(cfg: ModelConfig):
    """(mixer config, module) for layer_types "mamba": Mamba-2 SSD by
    default; Mamba-1 selective scan when mamba_cfg carries version=1
    (original Mamba / Falcon-Mamba / Jamba — models/mamba1.py)."""
    d = dict(cfg.mamba_cfg)
    if d.pop("version", 2) == 1:
        from . import mamba1 as mod

        return mod.Mamba1Config(**d), mod
    from . import mamba2 as mod

    return mod.MambaMixerConfig(**d), mod


def _stack(
    params: Params,
    cfg: ModelConfig,
    token_ids: jax.Array,
    positions: jax.Array,
    kv_pool: Optional[jax.Array],
    attend: AttendFn,
    moe_top_k: Optional[int] = None,
    token_embeds: Optional[jax.Array] = None,  # [T, H] multimodal override
    embeds_mask: Optional[jax.Array] = None,  # [T] bool: use override row
    ssm_fn: Optional[Callable] = None,  # (layer, params, h) -> out
    deepstack_embeds: Optional[jax.Array] = None,  # [n_ds, T, H]
    cross_fn: Optional[Callable] = None,  # (layer, params, x) -> x
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Shared layer stack. ``attend(kv_pool, layer, q, k, v) ->
    (attn_out, kv_pool)`` encapsulates cache writing + attention;
    ``ssm_fn(layer, mamba_params, h) -> out`` does the same for hybrid
    Mamba2 layers (cfg.layer_types entries "mamba").

    ``token_embeds``/``embeds_mask`` inject precomputed embeddings
    (vision features) at selected rows — the TPU-native path for
    multimodal prefill (image embeds flow through the normal chunked
    prefill, SURVEY.md §7 hard-part 6)."""
    x = embed(token_ids, params["embed_tokens"])
    if cfg.embed_scale:
        # Gemma scales embeddings by sqrt(hidden) in the embed dtype
        x = x * jnp.asarray(cfg.embed_scale, dtype=x.dtype)
    if cfg.learned_pos_embed:
        # GPT-BigCode: learned absolute positions instead of rope.
        # positions feed rope for rotary models; here the same vector
        # indexes wpe (rope positions == absolute token positions)
        pos = positions[0] if positions.ndim > 1 else positions
        x = x + params["pos_embed"][pos].astype(x.dtype)
    if token_embeds is not None:
        mask = (
            embeds_mask[:, None]
            if embeds_mask is not None
            else jnp.ones((x.shape[0], 1), bool)
        )
        x = jnp.where(mask, token_embeds.astype(x.dtype), x)
    rope_dim = (
        cfg.mla["qk_rope_head_dim"]
        if cfg.mla is not None
        else int(cfg.head_dim * cfg.partial_rotary_factor)
    )
    cos, sin = rope_cos_sin(
        positions,
        rope_dim,
        cfg.rope_theta,
        cfg.rope_scaling,
        tuple(cfg.mrope_section) if cfg.mrope_section else None,
        mrope_interleaved=cfg.mrope_interleaved,
    )
    cos_l = sin_l = None
    if cfg.rope_local_theta is not None and cfg.layer_types is not None:
        # dual rope: sliding layers rotate with the local base
        # frequency and NO scaling (Gemma3 / OLMo3)
        cos_l, sin_l = rope_cos_sin(
            positions, rope_dim, cfg.rope_local_theta, None,
        )
    a1 = cfg.rms_add_one
    rc = cfg.residual_cfg
    for i, p in enumerate(params["layers"]):
        # OLMo2 post-norm blocks: sublayers read the raw stream
        if (
            cfg.layer_types is not None
            and cfg.layer_types[i] == "cross_attention"
        ):
            # Mllama cross-attention block: owns its norms/gates/MLP
            # (full-text-row mask) — _cross_block via the caller's
            # cross_fn, which binds the KV source
            x = cross_fn(i, p, x)
            continue
        h = x if cfg.post_norm_blocks else _bnorm(
            cfg, x, p, "input_layernorm"
        )
        if cfg.layer_types is not None and cfg.layer_types[i] in (
            "mamba",
            "linear_attention",
            "gdn",
            "short_conv",
            "rg_lru",
        ):
            # recurrent mixer block (Mamba SSD / lightning linear
            # attention / gated DeltaNet): the caller's ssm_fn owns
            # state plumbing (serving) or runs stateless (dense parity)
            mix_out = ssm_fn(i, p, h)
            if rc is not None:
                # MiniMax norm-as-residual: the NORMED value is the
                # residual, scaled by alpha/beta (HF MiniMaxDecoderLayer)
                x = h * rc["linear_alpha"] + mix_out * rc["linear_beta"]
                h = _bnorm(cfg, x, p, "post_attention_layernorm")
                mlp_out = _mlp_block(cfg, i, p, h, moe_top_k)
                x = h * rc["mlp_alpha"] + mlp_out * rc["mlp_beta"]
            elif cfg.block_has_mlp:  # Bamba/Granite-4.0-style
                rm = cfg.residual_multiplier
                if rm != 1.0:
                    mix_out = mix_out * jnp.asarray(rm, mix_out.dtype)
                x = x + mix_out
                h = _bnorm(cfg, x, p, "post_attention_layernorm")
                mlp_out = _mlp_block(cfg, i, p, h, moe_top_k)
                if rm != 1.0:
                    mlp_out = mlp_out * jnp.asarray(rm, mlp_out.dtype)
                x = x + mlp_out
            else:  # pure Mamba2: block = norm -> mixer only
                x = x + mix_out
            continue
        use_rope = cfg.use_rope and not (
            cfg.nope_full_layers
            and cfg.sliding_window is not None
            and _layer_window(cfg, i) is None
        )
        if cfg.nope_layers is not None and i in cfg.nope_layers:
            use_rope = False  # SmolLM3 explicit per-layer NoPE
        c_i, s_i = (
            (cos_l, sin_l)
            if cos_l is not None and _layer_window(cfg, i) is not None
            else (cos, sin)
        )
        q, k, v = _qkv(cfg, p, h, c_i, s_i, use_rope=use_rope)
        if cfg.attn_temp_tuning and not use_rope:
            # Llama 4 NoPE layers: temperature-tuned queries
            # (HF Llama4TextAttention.forward, arXiv 2501.19399)
            pos1 = positions[0] if positions.ndim > 1 else positions
            t_scales = (
                jnp.log1p(
                    jnp.floor(
                        (pos1.astype(jnp.float32) + 1.0)
                        / cfg.attn_temp_floor
                    )
                )
                * cfg.attn_temp_scale
                + 1.0
            )
            q = (q.astype(jnp.float32) * t_scales[:, None, None]).astype(
                q.dtype
            )
        attn_out, kv_pool = attend(kv_pool, i, q, k, v, p.get("sinks"))
        t = attn_out.shape[0]
        if cfg.mla is not None:
            # V was zero-padded to qk head_dim in the pool; the real
            # value channels are the leading v_head_dim
            attn_out = attn_out[..., : cfg.mla["v_head_dim"]]
        attn_out = attn_out.reshape(t, -1)
        if cfg.attn_out_gate:
            # Qwen3-Next gated attention: q_proj's gate half modulates
            # the attention output before o_proj (HF
            # Qwen3NextAttention.forward:396)
            attn_out = attn_out * jax.nn.sigmoid(
                linear(h, p["attn_gate"]).astype(jnp.float32)
            ).astype(attn_out.dtype)
        attn_out = linear(attn_out, p["o_proj"], p.get("o_bias"))
        if cfg.parallel_residual:
            # Phi/Cohere: attention and MLP both read the SAME normed
            # input; one residual add (HF PhiDecoderLayer.forward).
            # GPT-NeoX reads the MLP from its OWN pre-norm of the raw
            # stream (HF GPTNeoXLayer use_parallel_residual)
            mlp_in = (
                _bnorm(cfg, x, p, "post_attention_layernorm")
                if cfg.parallel_residual_separate_norms
                else h
            )
            x = x + attn_out + _mlp_block(cfg, i, p, mlp_in, moe_top_k)
        elif rc is not None:
            # MiniMax norm-as-residual (see recurrent branch above)
            x = h * rc["full_alpha"] + attn_out * rc["full_beta"]
            h = _bnorm(cfg, x, p, "post_attention_layernorm")
            mlp_out = _mlp_block(cfg, i, p, h, moe_top_k)
            x = h * rc["mlp_alpha"] + mlp_out * rc["mlp_beta"]
        elif cfg.post_norm_blocks:
            # OLMo2: norm the sublayer OUTPUTS, raw-stream inputs
            x = x + _bnorm(cfg, attn_out, p, "post_attention_layernorm")
            mlp_out = _mlp_block(cfg, i, p, x, moe_top_k)
            x = x + _bnorm(cfg, mlp_out, p, "post_feedforward_layernorm")
        elif cfg.sandwich_norms:
            attn_out = _bnorm(cfg, attn_out, p, "post_attention_layernorm")
            x = x + attn_out
            h = _bnorm(cfg, x, p, "pre_feedforward_layernorm")
            mlp_out = _mlp_block(cfg, i, p, h, moe_top_k)
            mlp_out = _bnorm(cfg, mlp_out, p, "post_feedforward_layernorm")
            x = x + mlp_out
        else:
            rm = cfg.residual_multiplier
            if rm != 1.0:
                # Granite mup-style residual scaling
                attn_out = attn_out * jnp.asarray(rm, attn_out.dtype)
            x = x + attn_out
            h = _bnorm(cfg, x, p, "post_attention_layernorm")
            mlp_out = _mlp_block(cfg, i, p, h, moe_top_k)
            if rm != 1.0:
                mlp_out = mlp_out * jnp.asarray(rm, mlp_out.dtype)
            x = x + mlp_out
        if deepstack_embeds is not None and i < deepstack_embeds.shape[0]:
            # Qwen3-VL deepstack: intermediate-ViT features add to the
            # hidden states after early layers (rows are pre-zeroed for
            # text/decode positions; HF _deepstack_process)
            x = x + deepstack_embeds[i].astype(x.dtype)
    x = _bnorm(cfg, x, params, "norm")
    return x, kv_pool


def _lightning_serving(
    cfg, p, layer_idx, h, states, m, is_prefill, is_decode, row_slot,
    n_slots, any_prefill, d0, pslot, new_ssm_states,
):
    """Lightning mixer inside the ragged serving step: batched decode
    rank-1 state updates for decode rows, block-formulated prefill with
    carried state for the (single) prefilling sequence's front-rolled
    rows — mirrors the Mamba plumbing exactly."""
    from .lightning_attn import (
        lightning_sequence,
        lightning_step,
        slope_rate,
    )

    kvst, dummy = states[m]
    rate = jnp.asarray(
        slope_rate(
            cfg.num_attention_heads, layer_idx, cfg.num_hidden_layers
        )
    )
    eps = 1e-6  # HF hardcodes the lightning norm eps (not config eps)
    slot_or_drop = jnp.where(is_decode, row_slot, n_slots)
    x_slots = jnp.zeros((n_slots, h.shape[-1]), h.dtype).at[
        slot_or_drop
    ].set(h, mode="drop")
    active = jnp.zeros((n_slots,), bool).at[slot_or_drop].set(
        True, mode="drop"
    )
    y_dec, kv1 = lightning_step(p, rate, eps, x_slots, active, kvst)
    h_roll = jnp.roll(h, -d0, axis=0)
    valid_roll = jnp.roll(is_prefill, -d0, axis=0)
    init = jnp.where(
        any_prefill, kvst[jnp.minimum(pslot, n_slots - 1)], 0.0
    )
    y_seq, kv_p = lightning_sequence(
        p, rate, eps, h_roll, valid_roll, init,
        block=(cfg.linear_cfg or {}).get("block_size", 64),
    )
    y_seq = jnp.roll(y_seq, d0, axis=0)
    kv2 = kv1.at[pslot].set(kv_p, mode="drop")
    new_ssm_states[m] = (kv2, dummy)
    y = jnp.where(
        is_prefill[:, None],
        y_seq,
        jnp.where(is_decode[:, None], y_dec[row_slot], 0.0),
    )
    return y.astype(h.dtype)


def unified_forward(
    params: Params,
    cfg: ModelConfig,
    token_ids: jax.Array,  # [T] ragged batch: all seqs' new tokens
    positions: jax.Array,  # [T] absolute positions
    kv_pages: List[jax.Array],  # per-layer [pages, ps, 2*kvh, hd]
    kv_dest: jax.Array,  # [T] flat page slot per token (OOB -> dropped)
    kv_lens: jax.Array,  # [S]
    page_indices: jax.Array,  # [S, pages_per_seq]
    cu_q_lens: jax.Array,  # [S+1]
    num_seqs: jax.Array,  # [1]
    moe_top_k: Optional[int] = None,
    token_embeds: Optional[jax.Array] = None,
    embeds_mask: Optional[jax.Array] = None,
    kv_scale: Optional[float] = None,
    mesh=None,
    ssm_ctx: Optional[Dict[str, Any]] = None,
    deepstack_embeds: Optional[jax.Array] = None,
    decode_only: bool = False,
    bidir_lo: Optional[jax.Array] = None,  # [S] bidir span start
    bidir_hi: Optional[jax.Array] = None,  # [S] bidir span end
    cross_ctx: Optional[Dict[str, Any]] = None,
) -> Tuple[jax.Array, List[jax.Array], Optional[List[Tuple]]]:
    """One step for a ragged mixed prefill/decode batch.

    ``decode_only`` marks the zero-upload decode fast path (row i =
    slot i, one token each) so attention can take the
    decode-specialized kernel (ops/ragged_attention.py).

    Writes each layer's new K/V into the page pool (single scatter),
    then ragged paged attention over the updated pages. Returns
    (hidden [T, H], updated kv_pages, updated ssm_states or None).

    ``kv_scale`` activates quantized-KV pools (int8 pages store
    value/kv_scale; fp8 pages use kv_scale=1.0) — the kernel dequantizes
    on read (reference memory_cache.py:491-595 KV quantization,
    redesigned as quantize-on-write into the paged pool).

    Hybrid SSM (``ssm_ctx``): kv_pages hold ATTENTION layers only (in
    layer order); mamba layers carry per-slot recurrent state instead.
    ssm_ctx = {"states": [(conv [S+?,cd,K], ssm [S,nh,hd,ds])...],
    "row_slot": [T] (slot per row, = num slots for padding),
    "from_device": [T] bool (decode rows)}. Decode rows take a batched
    closed-form update; the (single) prefilling sequence's contiguous
    rows are rolled to the front and scanned with its carried state
    (the scheduler guarantees at most one prefill per step for hybrid
    models).
    """
    from ..ops.ragged_attention import (
        attention_with_kv_write,
        interleave_kv,
        ragged_attention,
        write_kv_pages,
    )

    scale = cfg.attn_scale or cfg.head_dim**-0.5

    if cfg.model_type == "gemma3n_text":
        # Gemma-3n: AltUp/LAuReL/per-layer-embedding stack with
        # KV-shared layers aliasing earlier pools (models/gemma3n_text.py)
        from . import gemma3n_text

        g_pool_of, g_writes = gemma3n_text.pool_plan(cfg)
        g_pages = list(kv_pages)

        def g_attend(i, q, k, v):
            pi = g_pool_of[i]
            if g_writes[i]:
                g_pages[pi] = write_kv_pages(
                    g_pages[pi], interleave_kv(k, v), kv_dest, kv_scale
                )
            window = (
                cfg.sliding_window
                if cfg.layer_types[i].startswith("sliding_attention")
                else None
            )
            return ragged_attention(
                q, g_pages[pi], kv_lens, page_indices, cu_q_lens,
                num_seqs, scale, sliding_window=window,
                k_scale=kv_scale, v_scale=kv_scale, mesh=mesh,
                decode_only=decode_only,
            )

        hidden = gemma3n_text.forward(
            params, cfg, token_ids,
            positions[0] if positions.ndim > 1 else positions,
            g_attend, token_embeds, embeds_mask,
        )
        return hidden, g_pages, None

    if params.get("stacked_layers") is not None:
        # stacked execution (ops/stacked_decode_pallas.py): weights are
        # stacked [L, O, K] and the KV pool is ONE array with layer l's
        # pages at rows [l*P, (l+1)*P). Decode steps run the whole
        # stack in a single pallas dispatch; ragged prefill/verify
        # steps run the normal layer loop over trace-time slices.
        return _stacked_unified(
            params, cfg, token_ids, positions, kv_pages, kv_dest,
            kv_lens, page_indices, cu_q_lens, num_seqs, moe_top_k,
            token_embeds, embeds_mask, kv_scale, decode_only,
            bidir_lo, bidir_hi,
        )

    new_pages: List[jax.Array] = []
    # kv pool index per layer: hybrid models pool only attention layers;
    # Mllama cross-attention layers use per-slot cross buffers instead
    _REC = ("mamba", "linear_attention", "gdn", "short_conv", "rg_lru")
    _NONPAGED = _REC + ("cross_attention",)
    if cfg.layer_types is not None and any(
        lt in _NONPAGED for lt in cfg.layer_types
    ):
        attn_layers = [
            i for i, lt in enumerate(cfg.layer_types) if lt not in _NONPAGED
        ]
        pool_of = {i: j for j, i in enumerate(attn_layers)}
        mamba_of = {
            i: j
            for j, i in enumerate(
                i for i, lt in enumerate(cfg.layer_types) if lt in _REC
            )
        }
    else:
        pool_of = None
        mamba_of = {}

    cross_fn = None
    if cross_ctx is not None:
        cross_of = {
            i: j for j, i in enumerate(sorted(cfg.cross_attention_layers))
        }
        c_pos = cross_ctx["positions"]
        if c_pos.ndim > 1:
            c_pos = c_pos[0]

        def cross_fn(i, layer_p, x):
            ck, cv = cross_ctx["kv"][cross_of[i]]

            def attn_fn(qn):
                return cross_window_attention(
                    qn, ck, cv,
                    cross_ctx["tok_lo"], cross_ctx["tok_hi"],
                    cross_ctx["width"], cross_ctx.get("row_slot"),
                    c_pos, scale,
                )

            return _cross_block(cfg, i, layer_p, x, attn_fn, moe_top_k)

    def attend(_, i, q, k, v, sinks=None):
        pi = pool_of[i] if pool_of is not None else i
        out, pages_i = attention_with_kv_write(
            q,
            kv_pages[pi],
            interleave_kv(k, v),
            kv_dest,
            kv_lens,
            page_indices,
            cu_q_lens,
            num_seqs,
            scale,
            sliding_window=_layer_window(cfg, i),
            softcap=cfg.attn_softcap,
            k_scale=kv_scale,
            v_scale=kv_scale,
            mesh=mesh,
            sinks=sinks,
            decode_only=decode_only,
            bidir_lo=bidir_lo,
            bidir_hi=bidir_hi,
            chunk_size=_layer_chunk(cfg, i),
        )
        new_pages.append(pages_i)
        return out, None

    ssm_fn = None
    new_ssm_states: Optional[List[Tuple]] = None
    if ssm_ctx is not None and ssm_ctx.get("mode") == "segments":
        # speculative-verify mode: every slot contributes a FIXED-length
        # segment of L = T / n_slots contiguous rows; each recurrent
        # layer scans the segment from the slot's carried state (vmap
        # over slots). ``valid`` [T] masks the rows that advance state;
        # with commit=False the state write-back is skipped entirely
        # (read-only logits pass — spec rollback support, reference
        # scheduler.py _mtp_step semantics for hybrid targets).
        states = ssm_ctx["states"]
        seg_valid = ssm_ctx["valid"]  # [T] bool
        commit = ssm_ctx.get("commit", True)
        n_slots = states[0][0].shape[0]
        new_ssm_states = [None] * len(states)

        def ssm_fn(i, layer_p, h):
            m = mamba_of[i]
            conv, ssm = states[m]
            seg = h.shape[0] // n_slots
            hx = h.reshape(n_slots, seg, -1)
            vx = seg_valid.reshape(n_slots, seg)
            if cfg.layer_types[i] == "gdn":
                from .gated_deltanet import DeltaNetConfig, gdn_sequence

                dc = DeltaNetConfig(**cfg.gdn_cfg)
                p = layer_p["gdn"]
                fn = lambda x, v, c, s: gdn_sequence(p, dc, x, v, c, s)
            elif cfg.layer_types[i] == "short_conv":
                from .short_conv import conv_sequence

                kk = cfg.conv_cfg["kernel"]
                p = layer_p["short_conv"]
                fn = lambda x, v, c, s: conv_sequence(p, kk, x, v, c, s)
            elif cfg.layer_types[i] == "rg_lru":
                # spec-verify segments are always past position 0, so
                # no reset (pos0) handling is needed here
                from .rg_lru import RgLruConfig
                from .rg_lru import mixer_sequence as rg_sequence

                rcx = RgLruConfig(**cfg.rglru_cfg)
                p = layer_p["rg_lru"]
                fn = lambda x, v, c, s: rg_sequence(p, rcx, x, v, c, s)
            else:
                mcx, mod = mixer_api(cfg)
                p = layer_p["mamba"]
                fn = lambda x, v, c, s: mod.mixer_sequence(
                    p, mcx, x, v, c, s
                )
            y, conv_n, ssm_n = jax.vmap(fn)(hx, vx, conv, ssm)
            new_ssm_states[m] = (
                (conv_n.astype(conv.dtype), ssm_n) if commit
                else (conv, ssm)
            )
            return y.reshape(h.shape[0], -1).astype(h.dtype)

    elif ssm_ctx is not None:
        mc = mixer_mod = None
        if cfg.mamba_cfg is not None:
            mc, mixer_mod = mixer_api(cfg)
        states = ssm_ctx["states"]
        row_slot = ssm_ctx["row_slot"]  # [T] i32, == n_slots for padding
        from_device = ssm_ctx["from_device"]  # [T] bool
        n_slots = states[0][0].shape[0]
        new_ssm_states = [None] * len(states)
        valid_row = row_slot < n_slots
        is_prefill = valid_row & (~from_device)
        is_decode = valid_row & from_device
        any_prefill = jnp.any(is_prefill)
        d0 = jnp.argmax(is_prefill)  # first prefill row (0 if none)
        pslot = jnp.where(
            any_prefill, row_slot[d0], jnp.int32(n_slots)
        )

        def _mixer_serving(step_fn, seq_fn, h, m):
            """Shared slot plumbing for (conv, state)-shaped recurrent
            mixers (Mamba SSD, gated DeltaNet): batched closed-form
            decode for decode rows; the (single) prefilling sequence's
            contiguous rows rolled to the front and scanned with its
            carried state."""
            conv, ssm = states[m]
            # decode rows -> their slots (one closed-form step each)
            slot_or_drop = jnp.where(is_decode, row_slot, n_slots)
            x_slots = jnp.zeros(
                (n_slots, h.shape[-1]), h.dtype
            ).at[slot_or_drop].set(h, mode="drop")
            active = jnp.zeros((n_slots,), bool).at[slot_or_drop].set(
                True, mode="drop"
            )
            y_dec, conv1, ssm1 = step_fn(x_slots, active, conv, ssm)
            # the one prefilling sequence: roll its contiguous rows to
            # the front so the conv window stitches onto its state
            h_roll = jnp.roll(h, -d0, axis=0)
            valid_roll = jnp.roll(is_prefill, -d0, axis=0)
            init_conv = jnp.where(
                any_prefill, conv[jnp.minimum(pslot, n_slots - 1)], 0.0
            )
            init_ssm = jnp.where(
                any_prefill, ssm[jnp.minimum(pslot, n_slots - 1)], 0.0
            )
            y_seq, conv_p, ssm_p = seq_fn(
                h_roll, valid_roll, init_conv, init_ssm
            )
            y_seq = jnp.roll(y_seq, d0, axis=0)
            conv2 = conv1.at[pslot].set(
                conv_p.astype(conv1.dtype), mode="drop"
            )
            ssm2 = ssm1.at[pslot].set(ssm_p, mode="drop")
            new_ssm_states[m] = (conv2, ssm2)
            y = jnp.where(
                is_prefill[:, None],
                y_seq,
                jnp.where(is_decode[:, None], y_dec[row_slot], 0.0),
            )
            return y.astype(h.dtype)

        def ssm_fn(i, layer_p, h):
            m = mamba_of[i]
            if cfg.layer_types[i] == "linear_attention":
                return _lightning_serving(
                    cfg, layer_p["lightning"], i, h, states, m,
                    is_prefill, is_decode, row_slot, n_slots,
                    any_prefill, d0, pslot, new_ssm_states,
                )
            if cfg.layer_types[i] == "gdn":
                from .gated_deltanet import (
                    DeltaNetConfig,
                    gdn_sequence,
                    gdn_step,
                )

                dc = DeltaNetConfig(**cfg.gdn_cfg)
                p = layer_p["gdn"]
                return _mixer_serving(
                    lambda x, a, c, s: gdn_step(p, dc, x, a, c, s),
                    lambda x, v, c, s: gdn_sequence(p, dc, x, v, c, s),
                    h, m,
                )
            if cfg.layer_types[i] == "short_conv":
                from .short_conv import conv_sequence, conv_step

                kk = cfg.conv_cfg["kernel"]
                p = layer_p["short_conv"]
                return _mixer_serving(
                    lambda x, a, c, s: conv_step(p, kk, x, a, c, s),
                    lambda x, v, c, s: conv_sequence(p, kk, x, v, c, s),
                    h, m,
                )
            if cfg.layer_types[i] == "rg_lru":
                from .rg_lru import RgLruConfig
                from .rg_lru import mixer_sequence as rg_sequence
                from .rg_lru import mixer_step as rg_step

                rcx = RgLruConfig(**cfg.rglru_cfg)
                p = layer_p["rg_lru"]
                # HF reset: rows at absolute position 0 use gamma
                # multiplier 1 and drop the carried state. _mixer_serving
                # front-rolls the prefilling sequence's rows by d0, so
                # the pos0 mask rolls identically; decode rows are never
                # at position 0 (prompts have >= 1 token)
                pvec = positions[0] if positions.ndim > 1 else positions
                pos0_roll = jnp.roll(pvec == 0, -d0, axis=0)
                return _mixer_serving(
                    lambda x, a, c, s: rg_step(p, rcx, x, a, c, s),
                    lambda x, v, c, s: rg_sequence(
                        p, rcx, x, v, c, s, pos0=pos0_roll
                    ),
                    h, m,
                )
            p = layer_p["mamba"]
            return _mixer_serving(
                lambda x, a, c, s: mixer_mod.mixer_step(p, mc, x, a, c, s),
                lambda x, v, c, s: mixer_mod.mixer_sequence(
                    p, mc, x, v, c, s
                ),
                h, m,
            )

    hidden, _ = _stack(
        params, cfg, token_ids, positions, None, attend, moe_top_k,
        token_embeds, embeds_mask, ssm_fn=ssm_fn,
        deepstack_embeds=deepstack_embeds, cross_fn=cross_fn,
    )
    return hidden, new_pages, new_ssm_states


def _stacked_unified(
    params: Params,
    cfg: ModelConfig,
    token_ids: jax.Array,
    positions: jax.Array,
    kv_pages: List[jax.Array],
    kv_dest: jax.Array,
    kv_lens: jax.Array,
    page_indices: jax.Array,
    cu_q_lens: jax.Array,
    num_seqs: jax.Array,
    moe_top_k: Optional[int],
    token_embeds: Optional[jax.Array],
    embeds_mask: Optional[jax.Array],
    kv_scale: Optional[float],
    decode_only: bool,
    bidir_lo: Optional[jax.Array],
    bidir_hi: Optional[jax.Array],
) -> Tuple[jax.Array, List[jax.Array], None]:
    """Stacked-layout forward (see ops/stacked_decode_pallas.py)."""
    from ..ops import stacked_decode_pallas as sdp
    from ..ops.ragged_attention import (
        interleave_kv,
        ragged_attention,
        write_kv_pages,
    )

    sl: "sdp.StackedLayers" = params["stacked_layers"]
    pages_all = kv_pages[0]
    L = sl.qkv_w.shape[0]
    P = pages_all.shape[0] // L
    ps = pages_all.shape[1]
    oob_flat = L * P * ps
    scale = cfg.attn_scale or cfg.head_dim**-0.5

    if decode_only:
        assert bidir_lo is None and token_embeds is None
        x = embed(token_ids, params["embed_tokens"])
        if cfg.embed_scale:
            x = x * jnp.asarray(cfg.embed_scale, dtype=x.dtype)
        cos, sin = rope_cos_sin(
            positions, cfg.head_dim, cfg.rope_theta, cfg.rope_scaling
        )
        s = token_ids.shape[0]
        hidden, kv_new = sdp.stacked_decode(
            sl,
            x,
            cos,
            sin,
            pages_all,
            page_indices,
            kv_lens,
            params["norm"],
            num_heads=cfg.num_attention_heads,
            num_kv_heads=cfg.num_key_value_heads,
            scale=scale,
            k_scale=kv_scale,
            v_scale=kv_scale,
            eps=cfg.rms_norm_eps,
            interpret=jax.default_backend() != "tpu",
        )
        # ONE all-layer pool scatter (replaces L per-layer scatters)
        offs = jnp.arange(L, dtype=jnp.int32)[:, None] * (P * ps)
        dest = jnp.where(
            kv_dest[None, :] < P * ps, kv_dest[None, :] + offs, oob_flat
        ).reshape(-1)
        kvh = cfg.num_key_value_heads
        pages_all = write_kv_pages(
            pages_all,
            kv_new.reshape(L * s, 2 * kvh, cfg.head_dim),
            dest,
            kv_scale,
        )
        return hidden, [pages_all], None

    # ragged prefill/verify steps: normal layer loop over trace-time
    # slices of the stacked arrays (measured copy-free on TPU)
    holder = [pages_all]

    def attend(_, i, q, k, v, sinks=None):
        dest = jnp.where(
            kv_dest < P * ps, kv_dest + i * P * ps, oob_flat
        )
        holder[0] = write_kv_pages(
            holder[0], interleave_kv(k, v), dest, kv_scale
        )
        out = ragged_attention(
            q,
            holder[0],
            kv_lens,
            page_indices + i * P,
            cu_q_lens,
            num_seqs,
            scale,
            k_scale=kv_scale,
            v_scale=kv_scale,
            bidir_lo=bidir_lo,
            bidir_hi=bidir_hi,
        )
        return out, None

    pview = {k: v for k, v in params.items() if k != "stacked_layers"}
    pview["layers"] = sdp.layer_views(sl, cfg)
    hidden, _ = _stack(
        pview, cfg, token_ids, positions, None, attend, moe_top_k,
        token_embeds, embeds_mask,
    )
    return hidden, [holder[0]], None


def compute_logits(params: Params, cfg: ModelConfig, hidden: jax.Array) -> jax.Array:
    head = params.get("lm_head")
    if head is None:
        head = params["embed_tokens"]
    logits = lm_head_logits(hidden, head)
    if "lm_head_bias" in params:  # Phi-2 biased lm_head
        logits = logits + params["lm_head_bias"].astype(logits.dtype)
    if cfg.logit_scale is not None:  # Cohere
        logits = logits * jnp.asarray(cfg.logit_scale, logits.dtype)
    if cfg.final_softcap:
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    return logits


_logits = compute_logits


def prefill(
    params: Params,
    cfg: ModelConfig,
    token_ids: jax.Array,  # [C]
    positions: jax.Array,  # [C]
    kv_pool: jax.Array,
    block_table: jax.Array,  # [max_blocks]
    moe_top_k: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Process one sequence's prompt chunk. Returns (hidden [C,H], kv_pool)."""
    scale = cfg.attn_scale or cfg.head_dim**-0.5

    def attend(pool, i, q, k, v, sinks=None):
        pool = att.write_kv(pool, i, k, v, block_table, positions)
        out = att.paged_attention_prefill(
            q, pool, i, block_table, positions, scale, _layer_window(cfg, i),
            cfg.attn_softcap, chunk=_layer_chunk(cfg, i),
        )
        return out, pool

    hidden, kv_pool = _stack(
        params, cfg, token_ids, positions, kv_pool, attend, moe_top_k
    )
    return hidden, kv_pool


def prefill_logits(
    params: Params,
    cfg: ModelConfig,
    token_ids: jax.Array,
    positions: jax.Array,
    kv_pool: jax.Array,
    block_table: jax.Array,
    moe_top_k: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Prefill a chunk and return logits of the LAST token only [V]."""
    hidden, kv_pool = prefill(
        params, cfg, token_ids, positions, kv_pool, block_table, moe_top_k
    )
    return _logits(params, cfg, hidden[-1:]).reshape(-1), kv_pool


def decode(
    params: Params,
    cfg: ModelConfig,
    token_ids: jax.Array,  # [S]
    positions: jax.Array,  # [S]
    kv_pool: jax.Array,
    block_tables: jax.Array,  # [S, max_blocks]
    moe_top_k: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """One decode step for the whole batch. Returns (logits [S,V], kv_pool)."""
    scale = cfg.attn_scale or cfg.head_dim**-0.5

    def attend(pool, i, q, k, v, sinks=None):
        pool = att.write_kv_batch(pool, i, k, v, block_tables, positions)
        out = att.paged_attention_decode(
            q, pool, i, block_tables, positions, scale, _layer_window(cfg, i),
            chunk=_layer_chunk(cfg, i),
        )
        return out, pool

    hidden, kv_pool = _stack(
        params, cfg, token_ids, positions, kv_pool, attend, moe_top_k
    )
    return _logits(params, cfg, hidden), kv_pool


def dense_forward(
    params: Params,
    cfg: ModelConfig,
    token_ids: jax.Array,  # [T]
    moe_top_k: Optional[int] = None,
    token_embeds: Optional[jax.Array] = None,
    embeds_mask: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,  # [T] or [3, T] (mrope)
    deepstack_embeds: Optional[jax.Array] = None,
    cross_ctx: Optional[Dict[str, Any]] = None,
) -> jax.Array:
    """Full-sequence causal forward without any KV cache -> logits [T, V]."""
    scale = cfg.attn_scale or cfg.head_dim**-0.5

    if cfg.model_type == "gemma3n_text":
        from . import gemma3n_text

        last_kv: Dict[str, Tuple[jax.Array, jax.Array]] = {}

        def g_attend(i, q, k, v):
            lt = cfg.layer_types[i]
            base = lt.replace("_shared", "")
            if k is not None:
                last_kv[base] = (k, v)
            k, v = last_kv[base]
            window = (
                cfg.sliding_window
                if base == "sliding_attention"
                else None
            )
            return att.dense_causal_attention(q, k, v, scale, window, None)

        if positions is None:
            positions = jnp.arange(token_ids.shape[0])
        hidden = gemma3n_text.forward(
            params, cfg, token_ids, positions, g_attend,
            token_embeds, embeds_mask,
        )
        return _logits(params, cfg, hidden)

    def attend(pool, i, q, k, v, sinks=None):
        out = att.dense_causal_attention(
            q, k, v, scale, _layer_window(cfg, i), cfg.attn_softcap,
            sinks=sinks, chunk=_layer_chunk(cfg, i),
        )
        return out, pool

    if positions is None:
        positions = jnp.arange(token_ids.shape[0])

    ssm_fn = None
    if cfg.has_recurrent:
        mc = mixer_mod = None
        if cfg.mamba_cfg is not None:
            mc, mixer_mod = mixer_api(cfg)

        def ssm_fn(i, layer_p, h):
            if cfg.layer_types[i] == "linear_attention":
                from .lightning_attn import (
                    lightning_sequence,
                    slope_rate,
                )

                rate = jnp.asarray(
                    slope_rate(
                        cfg.num_attention_heads, i, cfg.num_hidden_layers
                    )
                )
                y, _ = lightning_sequence(
                    layer_p["lightning"], rate, 1e-6, h,
                    None,
                    jnp.zeros(
                        (
                            cfg.num_attention_heads,
                            cfg.head_dim,
                            cfg.head_dim,
                        ),
                        jnp.float32,
                    ),
                    block=(cfg.linear_cfg or {}).get("block_size", 64),
                )
                return y
            if cfg.layer_types[i] == "gdn":
                from .gated_deltanet import DeltaNetConfig, gdn_sequence

                dc = DeltaNetConfig(**cfg.gdn_cfg)
                y, _, _ = gdn_sequence(
                    layer_p["gdn"], dc, h, None,
                    jnp.zeros((dc.conv_dim, dc.conv_kernel), h.dtype),
                    jnp.zeros(
                        (dc.num_v_heads, dc.head_k_dim, dc.head_v_dim),
                        jnp.float32,
                    ),
                )
                return y
            if cfg.layer_types[i] == "short_conv":
                from .short_conv import conv_sequence

                kk = cfg.conv_cfg["kernel"]
                y, _, _ = conv_sequence(
                    layer_p["short_conv"], kk, h, None,
                    jnp.zeros((cfg.hidden_size, kk), h.dtype),
                    jnp.zeros((1, 1), jnp.float32),
                )
                return y
            if cfg.layer_types[i] == "rg_lru":
                from .rg_lru import RgLruConfig
                from .rg_lru import mixer_sequence as rg_sequence

                rcx = RgLruConfig(**cfg.rglru_cfg)
                pvec = positions[0] if positions.ndim > 1 else positions
                y, _, _ = rg_sequence(
                    layer_p["rg_lru"], rcx, h, None,
                    jnp.zeros((rcx.lru_width, rcx.conv_kernel), h.dtype),
                    jnp.zeros((rcx.lru_width,), jnp.float32),
                    pos0=pvec == 0,
                )
                return y
            c0, s0 = (
                z[0] for z in mixer_mod.init_mixer_states(mc, 1, h.dtype)
            )
            y, _, _ = mixer_mod.mixer_sequence(
                layer_p["mamba"], mc, h, None, c0, s0
            )
            return y

    cross_fn = None
    if cross_ctx is not None:
        cross_of = {
            i: j for j, i in enumerate(sorted(cfg.cross_attention_layers))
        }
        c_pos = positions[0] if positions.ndim > 1 else positions

        def cross_fn(i, layer_p, x):
            ck, cv = cross_ctx["kv"][cross_of[i]]

            def attn_fn(qn):
                return cross_window_attention(
                    qn, ck, cv,
                    cross_ctx["tok_lo"], cross_ctx["tok_hi"],
                    cross_ctx["width"], cross_ctx.get("row_slot"),
                    c_pos, scale,
                )

            return _cross_block(cfg, i, layer_p, x, attn_fn, moe_top_k)

    hidden, _ = _stack(
        params, cfg, token_ids, positions, None, attend, moe_top_k,
        token_embeds, embeds_mask, ssm_fn=ssm_fn,
        deepstack_embeds=deepstack_embeds, cross_fn=cross_fn,
    )
    return _logits(params, cfg, hidden)

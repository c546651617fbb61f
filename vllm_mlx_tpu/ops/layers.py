# SPDX-License-Identifier: Apache-2.0
"""Core transformer layer ops (pure functions, XLA-fusable).

These are the building blocks shared by every model family in
``vllm_mlx_tpu.models``. All functions are shape-polymorphic in the
leading (token) dimension only via separate jit traces; inside a trace
everything is static-shaped so XLA can tile onto the MXU.

Matmuls run in the param dtype (bfloat16) with float32 accumulation;
normalization and softmax statistics are computed in float32.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def rms_norm(
    x: jax.Array, weight: jax.Array, eps: float, add_one: bool = False
) -> jax.Array:
    """RMSNorm with fp32 statistics, output in input dtype.
    ``add_one``: Gemma-style ``(1 + weight)`` scaling."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    if add_one:
        w = 1.0 + w
    return (w * xf).astype(dtype)


def _rope_inv_freq(
    head_dim: int, rope_theta: float, rope_scaling: Optional[Dict[str, Any]]
):
    """(inverse frequencies, attention factor) — host numpy, so results
    can be cached across jit traces without leaking tracers. Implements
    HF llama3 / linear / yarn scaling (transformers
    modeling_rope_utils.py semantics); the attention factor multiplies
    cos/sin (yarn mscale)."""
    import math

    import numpy as np

    attention_factor = 1.0
    inv_freq = 1.0 / (
        rope_theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim)
    )
    if rope_scaling:
        rope_type = rope_scaling.get("rope_type", rope_scaling.get("type", ""))
        if rope_type == "yarn":
            # NTK-by-parts interpolation (GPT-OSS, DeepSeek V2/V3,
            # Qwen long-context finetunes)
            dim = head_dim
            base = rope_theta
            factor = rope_scaling["factor"]
            attention_factor = rope_scaling.get("attention_factor")
            mscale = rope_scaling.get("mscale")
            mscale_all_dim = rope_scaling.get("mscale_all_dim")
            old_ctx = (
                rope_scaling.get("original_max_position_embeddings") or 4096
            )

            def get_mscale(scale, m=1):
                return 1.0 if scale <= 1 else 0.1 * m * math.log(scale) + 1.0

            if attention_factor is None:
                if mscale and mscale_all_dim:
                    attention_factor = float(
                        get_mscale(factor, mscale)
                        / get_mscale(factor, mscale_all_dim)
                    )
                else:
                    attention_factor = get_mscale(factor)
            beta_fast = rope_scaling.get("beta_fast") or 32
            beta_slow = rope_scaling.get("beta_slow") or 1

            def corr_dim(num_rot):
                return (
                    dim * math.log(old_ctx / (num_rot * 2 * math.pi))
                ) / (2 * math.log(base))

            low, high = corr_dim(beta_fast), corr_dim(beta_slow)
            if rope_scaling.get("truncate", True):
                low, high = math.floor(low), math.ceil(high)
            low, high = max(low, 0), min(high, dim - 1)
            if low == high:
                high += 0.001
            ramp = np.clip(
                (np.arange(dim // 2, dtype=np.float32) - low) / (high - low),
                0.0,
                1.0,
            )
            extrap_factor = 1.0 - ramp
            inv_freq = (inv_freq / factor) * (
                1.0 - extrap_factor
            ) + inv_freq * extrap_factor
        elif rope_type == "llama3":
            factor = rope_scaling["factor"]
            low_factor = rope_scaling["low_freq_factor"]
            high_factor = rope_scaling["high_freq_factor"]
            old_ctx = rope_scaling["original_max_position_embeddings"]
            low_freq_wavelen = old_ctx / low_factor
            high_freq_wavelen = old_ctx / high_factor
            wavelen = 2.0 * np.pi / inv_freq
            # smooth interpolation between scaled and unscaled bands
            smooth = (old_ctx / wavelen - low_factor) / (high_factor - low_factor)
            smooth = np.clip(smooth, 0.0, 1.0)
            scaled = inv_freq / factor
            mid = (1.0 - smooth) * scaled + smooth * inv_freq
            inv_freq = np.where(
                wavelen < high_freq_wavelen,
                inv_freq,
                np.where(wavelen > low_freq_wavelen, scaled, mid),
            )
        elif rope_type == "linear":
            inv_freq = inv_freq / rope_scaling["factor"]
        elif rope_type == "longrope":
            # Phi-3/Phi-3.5(-MoE) su-scaled rope (HF
            # _compute_longrope_parameters): per-frequency
            # short/long extension factors + a sqrt attention factor.
            # HF switches factor sets DYNAMICALLY when the sequence
            # crosses original_max (leaving earlier cached K rotated
            # with the other set); serving picks ONE set at load from
            # the configured max_position_embeddings — self-consistent
            # across the whole KV cache (config.py injects the two max
            # lengths into rope_scaling).
            original = int(
                rope_scaling.get("original_max_position_embeddings")
                or rope_scaling.get("max_position_embeddings")
                or 4096
            )
            max_pos = int(
                rope_scaling.get("max_position_embeddings") or original
            )
            factor = max_pos / original
            attn = rope_scaling.get("attention_factor")
            if attn is None:
                attn = (
                    1.0
                    if factor <= 1.0
                    else math.sqrt(1 + math.log(factor) / math.log(original))
                )
            attention_factor = float(attn)
            ext = (
                rope_scaling["long_factor"]
                if max_pos > original
                else rope_scaling["short_factor"]
            )
            inv_freq = 1.0 / (
                np.asarray(ext, np.float64)
                * rope_theta
                ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
            )
        # "default"/None and unknown types: plain RoPE
    return inv_freq.astype(np.float32), float(attention_factor)


@functools.lru_cache(maxsize=32)
def _rope_inv_freq_cached(
    head_dim: int, rope_theta: float, rope_scaling_items: Optional[tuple]
):
    scaling = dict(rope_scaling_items) if rope_scaling_items else None
    return _rope_inv_freq(head_dim, rope_theta, scaling)


def rope_cos_sin(
    positions: jax.Array,
    head_dim: int,
    rope_theta: float,
    rope_scaling: Optional[Dict[str, Any]] = None,
    mrope_section: Optional[Tuple[int, ...]] = None,
    mrope_interleaved: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for the given integer positions. Shapes [T, head_dim//2].

    ``positions`` may be [3, T] (Qwen-VL multimodal RoPE, HF
    ``apply_multimodal_rotary_pos_emb`` semantics): rotary channels are
    split into ``mrope_section`` chunks taking angles from the temporal /
    height / width position components respectively. 1-D positions on an
    mrope model are equivalent to all three components being equal."""
    items = (
        tuple(
            (k, tuple(v) if isinstance(v, list) else v)
            for k, v in sorted(rope_scaling.items())
        )
        if rope_scaling
        else None
    )
    inv_freq_np, attn_factor = _rope_inv_freq_cached(
        head_dim, float(rope_theta), items
    )
    inv_freq = jnp.asarray(inv_freq_np)
    if positions.ndim == 2:  # [3, T] multimodal components
        if not mrope_section:
            raise ValueError("3-component positions require mrope_section")
        angles3 = (
            positions.astype(jnp.float32)[:, :, None] * inv_freq[None, None, :]
        )  # [3, T, head_dim//2]
        import numpy as _np

        half = int(inv_freq.shape[0])
        if mrope_interleaved:
            # Qwen3-VL: channels cycle [T H W T H W ...] up to each
            # section's reach (HF apply_interleaved_mrope: H at indices
            # 1,4,7,..<3*sec_h; W at 2,5,8,..<3*sec_w; T elsewhere)
            sel = _np.zeros(half, _np.int32)
            sel[1 : min(3 * mrope_section[1], half) : 3] = 1
            sel[2 : min(3 * mrope_section[2], half) : 3] = 2
            angles = angles3[sel, :, _np.arange(half)].T  # [T, half]
        else:
            parts = []
            off = 0
            for comp, sec in enumerate(mrope_section):
                parts.append(angles3[comp, :, off : off + sec])
                off += sec
            angles = jnp.concatenate(parts, axis=-1)  # [T, head_dim//2]
    else:
        angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    if attn_factor != 1.0:
        # yarn: the attention (mscale) factor multiplies cos/sin
        return jnp.cos(angles) * attn_factor, jnp.sin(angles) * attn_factor
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(q_or_k: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply non-interleaved (HF "rotate_half") rotary embedding.

    q_or_k: [T, heads, head_dim]; cos/sin: [T, head_dim//2].
    Computed in fp32, returned in the input dtype.
    """
    dtype = q_or_k.dtype
    x = q_or_k.astype(jnp.float32)
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    c = cos[:, None, :]
    s = sin[:, None, :]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(dtype)


def linear(x: jax.Array, w, b: Optional[jax.Array] = None) -> jax.Array:
    """x @ w.T with optional bias. ``w`` is stored HF-style [out, in],
    either a dense array or a quantized dict (ops.quant)."""
    from .quant import QuantizedTensor, quant_matmul

    if isinstance(w, QuantizedTensor):
        y = quant_matmul(x, w)
    else:
        y = jax.lax.dot_general(
            x,
            w,
            (((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def swiglu_mlp(x: jax.Array, p: Params, act: str = "silu") -> jax.Array:
    """Gated MLP: down( act(gate(x)) * up(x) ); act silu (Llama/Qwen)
    or tanh-approx gelu (Gemma)."""
    if "gate_up_proj" in p:
        # quantized decode fusion (ops/quant.py fuse_projections): one
        # kernel for both projections, split halves on the output axis
        gu = linear(x, p["gate_up_proj"], p.get("gate_up_bias"))
        inter = gu.shape[-1] // 2
        g, u = gu[..., :inter], gu[..., inter:]
    else:
        g = linear(x, p["gate_proj"], p.get("gate_bias"))
        u = linear(x, p["up_proj"], p.get("up_bias"))
    gf = g.astype(jnp.float32)
    if act in ("gelu_pytorch_tanh", "gelu_new", "gelu_tanh"):
        a = jax.nn.gelu(gf, approximate=True)
    elif act == "gelu":
        a = jax.nn.gelu(gf, approximate=False)
    else:
        a = jax.nn.silu(gf)
    h = a.astype(x.dtype) * u
    return linear(h, p["down_proj"], p.get("down_bias"))


def embed(token_ids: jax.Array, embedding) -> jax.Array:
    from .quant import QuantizedTensor, dequantize
    from dataclasses import replace as _dc_replace

    if isinstance(embedding, QuantizedTensor):
        rows = jnp.take(embedding.w_q, token_ids, axis=0)
        scales = jnp.take(embedding.scale, token_ids, axis=0)
        if embedding.bits == 8:
            return rows.astype(jnp.bfloat16) * scales.astype(jnp.bfloat16)
        return dequantize(
            _dc_replace(embedding, w_q=rows, scale=scales)
        )
    return jnp.take(embedding, token_ids, axis=0)


def lm_head_logits(x: jax.Array, head_weight) -> jax.Array:
    """Final projection to vocab logits, fp32 output for sampling accuracy."""
    from .quant import QuantizedTensor, quant_matmul

    if isinstance(head_weight, QuantizedTensor):
        return quant_matmul(x, head_weight)
    return jax.lax.dot_general(
        x,
        head_weight,
        (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

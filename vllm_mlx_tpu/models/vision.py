# SPDX-License-Identifier: Apache-2.0
"""Vision encoders (CLIP / SigLIP ViT) + multimodal projector in JAX.

The reference's vision towers come from mlx-vlm (reference
models/mllm.py:1207); the TPU build owns them. One standard pre-LN ViT
covers CLIP (class token, quick-gelu) and SigLIP (no class token, gelu
tanh) — the towers used by LLaVA / PaliGemma / Gemma3-style VLMs — and
the LLaVA 2-layer MLP projector maps vision features into the LM's
embedding space.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.layers import linear

Params = Dict[str, Any]


@dataclass
class VisionConfig:
    model_type: str = "clip_vision_model"
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    image_size: int = 224
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"  # clip: quick_gelu, siglip: gelu_tanh
    use_class_token: bool = True

    @classmethod
    def from_hf_config(cls, cfg: Dict[str, Any]) -> "VisionConfig":
        mt = cfg.get("model_type", "clip_vision_model")
        return cls(
            model_type=mt,
            hidden_size=cfg.get("hidden_size", 768),
            intermediate_size=cfg.get("intermediate_size", 3072),
            num_hidden_layers=cfg.get("num_hidden_layers", 12),
            num_attention_heads=cfg.get("num_attention_heads", 12),
            image_size=cfg.get("image_size", 224),
            patch_size=cfg.get("patch_size", 14),
            num_channels=cfg.get("num_channels", 3),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-5
                                   if mt.startswith("clip") else 1e-6),
            hidden_act=cfg.get(
                "hidden_act",
                "quick_gelu" if mt.startswith("clip") else "gelu_pytorch_tanh",
            ),
            use_class_token=mt.startswith("clip"),
        )

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + (1 if self.use_class_token else 0)


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _act(name: str, x):
    xf = x.astype(jnp.float32)
    if name == "quick_gelu":
        return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)
    if name in ("gelu_pytorch_tanh", "gelu_new"):
        return jax.nn.gelu(xf, approximate=True).astype(x.dtype)
    return jax.nn.gelu(xf, approximate=False).astype(x.dtype)


def vit_encode(
    params: Params,
    cfg: VisionConfig,
    pixel_values: jax.Array,
    run_layers: Optional[int] = None,
    apply_post_ln: bool = True,
) -> jax.Array:
    """pixel_values [B, C, H, W] -> patch features [B, seq, hidden].

    ``run_layers`` truncates the stack (HF ``vision_feature_layer``
    semantics: hidden_states[i] = after layer i; -2 -> run L-1 layers,
    no post-layernorm)."""
    b = pixel_values.shape[0]
    # patch embedding: conv == unfold + matmul (kernel [D, C, P, P])
    p = cfg.patch_size
    x = jax.lax.conv_general_dilated(
        pixel_values.astype(jnp.float32),
        params["patch_embed"].astype(jnp.float32),
        window_strides=(p, p),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # [B, D, H/p, W/p]
    d = x.shape[1]
    x = x.reshape(b, d, -1).transpose(0, 2, 1)  # [B, patches, D]
    if "patch_bias" in params:
        x = x + params["patch_bias"]
    if cfg.use_class_token:
        cls = jnp.broadcast_to(params["class_embed"], (b, 1, d))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][None, : x.shape[1]]
    x = x.astype(pixel_values.dtype)
    if "pre_ln_w" in params:
        x = _ln(x, params["pre_ln_w"], params["pre_ln_b"], cfg.layer_norm_eps)

    h = cfg.num_attention_heads
    hd = cfg.hidden_size // h
    scale = hd**-0.5
    layers = params["layers"]
    if run_layers is not None:
        layers = layers[: max(0, run_layers)]
    for lp in layers:
        res = x
        y = _ln(x, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        q = linear(y, lp["q_w"], lp["q_b"]).reshape(b, -1, h, hd)
        k = linear(y, lp["k_w"], lp["k_b"]).reshape(b, -1, h, hd)
        v = linear(y, lp["v_w"], lp["v_b"]).reshape(b, -1, h, hd)
        scores = (
            jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        )
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
        ).reshape(b, -1, cfg.hidden_size).astype(x.dtype)
        x = res + linear(ctx, lp["o_w"], lp["o_b"])
        res = x
        y = _ln(x, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        y = _act(cfg.hidden_act, linear(y, lp["fc1_w"], lp["fc1_b"]))
        x = res + linear(y, lp["fc2_w"], lp["fc2_b"])
    if apply_post_ln and "post_ln_w" in params:
        x = _ln(x, params["post_ln_w"], params["post_ln_b"], cfg.layer_norm_eps)
    return x


def llava_project(params: Params, features: jax.Array, act: str = "gelu") -> jax.Array:
    """LLaVA multimodal projector: linear -> gelu -> linear."""
    x = _act(act, linear(features, params["fc1_w"], params["fc1_b"]))
    return linear(x, params["fc2_w"], params["fc2_b"])


def load_vision_params(
    tensors: Dict[str, np.ndarray], cfg: VisionConfig, dtype=jnp.float32
) -> Params:
    """Map HF CLIPVisionModel/SiglipVisionModel tensors (already filtered
    to the vision tower, names relative to ``vision_model.``)."""
    layers: list = [dict() for _ in range(cfg.num_hidden_layers)]
    params: Params = {"layers": layers}

    def put(t):
        return jnp.asarray(t).astype(dtype)

    for n, t in tensors.items():
        if n == "embeddings.patch_embedding.weight":
            params["patch_embed"] = put(t)
        elif n == "embeddings.patch_embedding.bias":
            params["patch_bias"] = put(t)
        elif n == "embeddings.class_embedding":
            params["class_embed"] = put(t)
        elif n == "embeddings.position_embedding.weight":
            params["pos_embed"] = put(t)
        elif n in ("pre_layrnorm.weight", "pre_layernorm.weight"):
            params["pre_ln_w"] = put(t)
        elif n in ("pre_layrnorm.bias", "pre_layernorm.bias"):
            params["pre_ln_b"] = put(t)
        elif n == "post_layernorm.weight":
            params["post_ln_w"] = put(t)
        elif n == "post_layernorm.bias":
            params["post_ln_b"] = put(t)
        elif n.startswith("encoder.layers."):
            parts = n.split(".")
            i = int(parts[2])
            rest = ".".join(parts[3:])
            key = {
                "self_attn.q_proj.weight": "q_w",
                "self_attn.q_proj.bias": "q_b",
                "self_attn.k_proj.weight": "k_w",
                "self_attn.k_proj.bias": "k_b",
                "self_attn.v_proj.weight": "v_w",
                "self_attn.v_proj.bias": "v_b",
                "self_attn.out_proj.weight": "o_w",
                "self_attn.out_proj.bias": "o_b",
                "layer_norm1.weight": "ln1_w",
                "layer_norm1.bias": "ln1_b",
                "layer_norm2.weight": "ln2_w",
                "layer_norm2.bias": "ln2_b",
                "mlp.fc1.weight": "fc1_w",
                "mlp.fc1.bias": "fc1_b",
                "mlp.fc2.weight": "fc2_w",
                "mlp.fc2.bias": "fc2_b",
            }.get(rest)
            if key:
                layers[i][key] = put(t)
    return params

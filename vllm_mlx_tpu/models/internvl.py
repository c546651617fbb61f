# SPDX-License-Identifier: Apache-2.0
"""InternVL 3 (HF-native) — BEiT-style tower + pixel-shuffle connector.

The reference serves InternVL through mlx-vlm; the TPU build owns the
tower. Architecture (HF modeling_internvl.py):

  * `InternVLVisionModel`: conv patch embed + CLS token + absolute
    position embeddings, pre-LN blocks with LAYER-SCALE (lambda_1/2
    vectors), optional full-width q/k RMSNorm, plain gelu MLP; final
    layernorm is Identity when use_mean_pooling,
  * connector: drop CLS, reshape to the patch grid, PIXEL SHUFFLE with
    scale 0.5 (InternVL's own view/permute order — reimplemented
    literally), LayerNorm + 2-layer projector,
  * tiling (HF GotOcr2ImageProcessor.crop_image_to_patches): aspect-
    closest (cols x rows) canvas within min/max tiles, resize, crop
    row-major, plus a thumbnail tile when more than one,
  * prompt: each <image> becomes <img> + IMG_CONTEXT * (seq_len *
    n_tiles) + </img>. Fully causal attention.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.layers import linear

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


@dataclass
class InternVLVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 448
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-6
    hidden_act: str = "gelu"
    norm_type: str = "layer_norm"  # | "rms_norm"
    use_qk_norm: bool = False
    attention_bias: bool = True

    @classmethod
    def from_hf_config(cls, cfg: Dict[str, Any]) -> "InternVLVisionConfig":
        size = cfg.get("image_size", 448)
        patch = cfg.get("patch_size", 14)
        if isinstance(size, (list, tuple)):
            size = size[0]
        if isinstance(patch, (list, tuple)):
            patch = patch[0]
        return cls(
            hidden_size=cfg.get("hidden_size", 1024),
            intermediate_size=cfg.get("intermediate_size", 4096),
            num_hidden_layers=cfg.get("num_hidden_layers", 24),
            num_attention_heads=cfg.get("num_attention_heads", 16),
            image_size=size,
            patch_size=patch,
            num_channels=cfg.get("num_channels", 3),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-6),
            hidden_act=cfg.get("hidden_act", "gelu"),
            norm_type=cfg.get("norm_type", "layer_norm"),
            use_qk_norm=cfg.get("use_qk_norm", False),
            attention_bias=cfg.get("attention_bias", True),
        )


def _norm(x, w, b, kind: str, eps: float):
    xf = x.astype(jnp.float32)
    if kind == "rms_norm":
        n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
        return (n * w.astype(jnp.float32)).astype(x.dtype)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _flat_rms(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return (n * w.astype(jnp.float32)).astype(x.dtype)


def internvl_encode(
    params: Params, cfg: InternVLVisionConfig, pixel_values: jax.Array
) -> jax.Array:
    """[B, C, S, S] -> last hidden [B, 1 + n_patches, D] (HF
    InternVLVisionModel; final layernorm applied if the checkpoint
    carries one)."""
    p = cfg.patch_size
    b = pixel_values.shape[0]
    x = jax.lax.conv_general_dilated(
        pixel_values.astype(jnp.float32),
        params["patch_embed"].astype(jnp.float32),
        window_strides=(p, p),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    d = x.shape[1]
    x = x.reshape(b, d, -1).transpose(0, 2, 1)
    if "patch_bias" in params:
        x = x + params["patch_bias"]
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1)
    if "pos_embed" in params:
        x = x + params["pos_embed"][None, : x.shape[1]]
    x = x.astype(jnp.float32)

    h = cfg.num_attention_heads
    hd = cfg.hidden_size // h
    scale = hd**-0.5
    for lp in params["layers"]:
        y = _norm(
            x, lp["ln1_w"], lp.get("ln1_b"), cfg.norm_type,
            cfg.layer_norm_eps,
        )
        q = linear(y, lp["q_w"], lp.get("q_b"))
        k = linear(y, lp["k_w"], lp.get("k_b"))
        v = linear(y, lp["v_w"], lp.get("v_b"))
        if "q_norm_w" in lp:  # full-width qk RMSNorm
            q = _flat_rms(q, lp["q_norm_w"])
            k = _flat_rms(k, lp["k_norm_w"])
        q = q.reshape(b, -1, h, hd)
        k = k.reshape(b, -1, h, hd)
        v = v.reshape(b, -1, h, hd)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).reshape(b, -1, cfg.hidden_size)
        attn = linear(ctx, lp["o_w"], lp.get("o_b"))
        x = x + attn * lp["lambda1"].astype(jnp.float32)
        y = _norm(
            x, lp["ln2_w"], lp.get("ln2_b"), cfg.norm_type,
            cfg.layer_norm_eps,
        )
        y = linear(y, lp["fc1_w"], lp.get("fc1_b")).astype(jnp.float32)
        y = jax.nn.gelu(y, approximate=False)
        y = linear(y, lp["fc2_w"], lp.get("fc2_b"))
        x = x + y * lp["lambda2"].astype(jnp.float32)
    if "final_ln_w" in params:
        x = _norm(
            x, params["final_ln_w"], params.get("final_ln_b"),
            "layer_norm", cfg.layer_norm_eps,
        )
    return x


def pixel_shuffle_internvl(x: jax.Array, scale: float = 0.5) -> jax.Array:
    """HF InternVLModel.pixel_shuffle, literal view/permute order:
    [B, W, H, C] -> [B, W*s, H*s, C/s^2]."""
    b, w, h, c = x.shape
    x = x.reshape(b, w, int(h * scale), int(c / scale))
    x = jnp.transpose(x, (0, 2, 1, 3))
    x = x.reshape(b, int(h * scale), int(w * scale), int(c / scale**2))
    return jnp.transpose(x, (0, 2, 1, 3))


class InternVLModel:
    """InternVL for the unified serving engine (same interface as
    models/mllm.MultimodalLM at variable rows per image)."""

    supports_audio = False

    def __init__(self, model_path: str, dtype: Optional[str] = None) -> None:
        self.model_path = model_path
        self._dtype = dtype
        self._loaded = False

    def load(self) -> "InternVLModel":
        if self._loaded:
            return self
        from . import loader

        with open(os.path.join(self.model_path, "config.json")) as f:
            cfg = json.load(f)
        tc = dict(cfg.get("text_config", {}))
        self.cfg = ModelConfig.from_hf_config(tc)
        self.vision_cfg = InternVLVisionConfig.from_hf_config(
            cfg.get("vision_config", {})
        )
        self.image_token_id = cfg.get(
            "image_token_id", cfg.get("image_token_index", 0)
        )
        self.downsample_ratio = cfg.get("downsample_ratio", 0.5)
        jdt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            self._dtype or self.cfg.dtype
        ]

        def put(t):
            return jnp.asarray(np.asarray(t)).astype(jdt)

        vision: Params = {
            "layers": [
                dict() for _ in range(self.vision_cfg.num_hidden_layers)
            ]
        }
        projector: Params = {}
        for name, t in loader.iter_safetensors(self.model_path):
            if "vision_tower." in name:
                sub = name.split("vision_tower.", 1)[1]
                if sub == "embeddings.cls_token":
                    vision["cls_token"] = put(np.asarray(t)[0])
                elif sub == "embeddings.position_embeddings":
                    vision["pos_embed"] = put(np.asarray(t)[0])
                elif sub == "embeddings.patch_embeddings.projection.weight":
                    vision["patch_embed"] = put(t)
                elif sub == "embeddings.patch_embeddings.projection.bias":
                    vision["patch_bias"] = put(t)
                elif sub.startswith("layernorm."):
                    key = (
                        "final_ln_w"
                        if sub.endswith("weight")
                        else "final_ln_b"
                    )
                    vision[key] = put(t)
                elif sub.startswith("encoder.layer."):
                    parts = sub.split(".")
                    i = int(parts[2])
                    rest = ".".join(parts[3:])
                    key = {
                        "attention.q_proj.weight": "q_w",
                        "attention.q_proj.bias": "q_b",
                        "attention.k_proj.weight": "k_w",
                        "attention.k_proj.bias": "k_b",
                        "attention.v_proj.weight": "v_w",
                        "attention.v_proj.bias": "v_b",
                        "attention.projection_layer.weight": "o_w",
                        "attention.projection_layer.bias": "o_b",
                        "attention.q_norm.weight": "q_norm_w",
                        "attention.k_norm.weight": "k_norm_w",
                        "layernorm_before.weight": "ln1_w",
                        "layernorm_before.bias": "ln1_b",
                        "layernorm_after.weight": "ln2_w",
                        "layernorm_after.bias": "ln2_b",
                        "lambda_1": "lambda1",
                        "lambda_2": "lambda2",
                        "mlp.fc1.weight": "fc1_w",
                        "mlp.fc1.bias": "fc1_b",
                        "mlp.fc2.weight": "fc2_w",
                        "mlp.fc2.bias": "fc2_b",
                    }.get(rest)
                    if key:
                        vision["layers"][i][key] = put(t)
            elif "multi_modal_projector." in name:
                sub = name.split("multi_modal_projector.", 1)[1]
                key = {
                    "layer_norm.weight": "ln_w",
                    "layer_norm.bias": "ln_b",
                    "linear_1.weight": "fc1_w",
                    "linear_1.bias": "fc1_b",
                    "linear_2.weight": "fc2_w",
                    "linear_2.bias": "fc2_b",
                }.get(sub)
                if key:
                    projector[key] = put(t)
        self.vision_params = vision
        self.projector = projector
        self.params = loader.load_params(
            self.model_path, self.cfg, dtype=self._dtype
        )
        vcfg = self.vision_cfg
        ratio = self.downsample_ratio

        def _encode(vision_params, projector, pixel_values):
            hidden = internvl_encode(vision_params, vcfg, pixel_values)
            feats = hidden[:, 1:]  # drop CLS
            b = feats.shape[0]
            side = int(round(feats.shape[1] ** 0.5))
            feats = feats.reshape(b, side, side, -1)
            feats = pixel_shuffle_internvl(feats, ratio)
            feats = feats.reshape(b, feats.shape[1] * feats.shape[2], -1)
            y = _norm(
                feats, projector["ln_w"], projector["ln_b"],
                "layer_norm", 1e-5,
            )
            y = linear(y, projector["fc1_w"], projector.get("fc1_b"))
            y = jax.nn.gelu(
                y.astype(jnp.float32), approximate=False
            )
            return linear(y, projector["fc2_w"], projector.get("fc2_b"))

        self._encode_jit = jax.jit(_encode)
        self._loaded = True
        return self

    @property
    def text_config(self) -> ModelConfig:
        return self.cfg

    @property
    def lm_params(self) -> Params:
        return self.params

    def encode_tiles(self, tiles: np.ndarray) -> np.ndarray:
        """[N, C, S, S] -> flattened features [N * seq, H_lm] f32."""
        out = self._encode_jit(
            self.vision_params, self.projector, jnp.asarray(tiles)
        )
        out = np.asarray(out, np.float32)
        return out.reshape(-1, out.shape[-1])

    def build_multimodal_prompt(
        self,
        token_ids: List[int],
        image_features: List[np.ndarray],  # per image [rows, H]
    ) -> Tuple[List[int], np.ndarray, np.ndarray]:
        """Fill the (already expanded) IMG_CONTEXT rows in order."""
        h = self.cfg.hidden_size
        t = len(token_ids)
        embeds = np.zeros((t, h), np.float32)
        mask = np.zeros(t, bool)
        ids_arr = np.asarray(token_ids)
        img_rows = np.flatnonzero(ids_arr == self.image_token_id)
        flat = (
            np.concatenate(image_features, axis=0)
            if image_features
            else np.zeros((0, h), np.float32)
        )
        if len(img_rows) != flat.shape[0]:
            raise ValueError(
                f"{len(img_rows)} image-context rows != {flat.shape[0]}"
                " feature rows"
            )
        embeds[img_rows] = flat
        mask[img_rows] = True
        return token_ids, embeds, mask

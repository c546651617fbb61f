# SPDX-License-Identifier: Apache-2.0
"""Pixtral: variable-resolution 2-D-rope ViT + LLaVA projector +
Mistral LM.

The reference serves Pixtral through mlx-vlm (reference
docs/guides/multimodal.md "Pixtral"); the TPU build owns the tower.
Architecture (HF modeling_pixtral.py + LlavaForConditionalGeneration):

  * `PixtralVisionModel`: bias-free patch conv (16x16), RMSNorm
    ``ln_pre``, transformer layers of (RMSNorm -> bias-free MHA with
    2-D rope -> RMSNorm -> gated-SiLU MLP), NO final norm. Rope
    frequencies interleave height (even) and width (odd) channels and
    are indexed by ``h * max_patches_per_side + w``
    (position_ids_in_meshgrid).
  * images keep their aspect ratio (resized so the long edge fits
    ``image_size``, rounded up to patch multiples) — each image is
    encoded separately here, which equals HF's concat + block-diagonal
    mask (attention never crosses images).
  * LLaVA 2-layer projector (multi_modal_projector.linear_1/2).
  * prompt layout (PixtralProcessor): per image, ``[IMG]`` * w_patches
    then ``[IMG_BREAK]`` per row, with ``[IMG_END]`` closing the last
    row. Only [IMG] rows carry features; BREAK/END are ordinary
    embeddings. Attention is fully causal (no bidirectional spans).
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.layers import linear

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


@dataclass
class PixtralVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 1024
    patch_size: int = 16
    num_channels: int = 3
    rope_theta: float = 10000.0
    hidden_act: str = "silu"
    head_dim: int = 64

    @classmethod
    def from_hf_config(cls, cfg: Dict[str, Any]) -> "PixtralVisionConfig":
        hs = cfg.get("hidden_size", 1024)
        heads = cfg.get("num_attention_heads", 16)
        return cls(
            hidden_size=hs,
            intermediate_size=cfg.get("intermediate_size", 4096),
            num_hidden_layers=cfg.get("num_hidden_layers", 24),
            num_attention_heads=heads,
            image_size=cfg.get("image_size", 1024),
            patch_size=cfg.get("patch_size", 16),
            num_channels=cfg.get("num_channels", 3),
            rope_theta=cfg.get("rope_theta", 10000.0),
            hidden_act=cfg.get("hidden_act", "silu"),
            head_dim=cfg.get("head_dim", hs // heads),
        )


@dataclass
class PixtralMMConfig:
    text: ModelConfig
    vision: PixtralVisionConfig
    image_token_id: int
    image_break_token_id: int
    image_end_token_id: int
    vision_feature_layer: int = -1
    projector_act: str = "gelu"
    # Mistral-Small-3.x (HF Mistral3ForConditionalGeneration): RMSNorm
    # + learned 2x2 patch merge before the projector; [IMG] tokens are
    # at MERGED granularity
    projector_style: str = "llava"  # "llava" | "mistral3"
    spatial_merge_size: int = 1

    @classmethod
    def from_pretrained(cls, path: str) -> "PixtralMMConfig":
        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        tc = dict(cfg.get("text_config", {}))
        tc.setdefault("model_type", "mistral")
        is_m3 = cfg.get("model_type") == "mistral3"
        return cls(
            text=ModelConfig.from_hf_config(tc),
            vision=PixtralVisionConfig.from_hf_config(
                cfg.get("vision_config", {})
            ),
            image_token_id=cfg.get(
                "image_token_index", cfg.get("image_token_id", 10)
            ),
            image_break_token_id=cfg.get("image_break_token_id", 12),
            image_end_token_id=cfg.get("image_end_token_id", 13),
            vision_feature_layer=cfg.get("vision_feature_layer", -1),
            projector_act=cfg.get("projector_hidden_act", "gelu"),
            projector_style="mistral3" if is_m3 else "llava",
            spatial_merge_size=(
                cfg.get("spatial_merge_size", 2) if is_m3 else 1
            ),
        )


def _rms(x, w, eps=1e-5):
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return (n * w.astype(jnp.float32)).astype(x.dtype)


def _pixtral_rope(cfg: PixtralVisionConfig, position_ids: np.ndarray):
    """cos/sin [P, head_dim] — height freqs on even channel pairs,
    width freqs on odd (HF PixtralRotaryEmbedding)."""
    dim = cfg.head_dim
    side = cfg.image_size // cfg.patch_size
    freqs = 1.0 / (
        cfg.rope_theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
    )
    h = np.arange(side)[:, None]
    w = np.arange(side)[:, None]
    freqs_h = h * freqs[::2][None, :]  # [side, dim//4]
    freqs_w = w * freqs[1::2][None, :]
    inv = np.concatenate(
        [
            np.repeat(freqs_h[:, None, :], side, axis=1),
            np.repeat(freqs_w[None, :, :], side, axis=0),
        ],
        axis=-1,
    ).reshape(-1, dim // 2)
    emb = np.concatenate([inv, inv], axis=-1)[position_ids]  # [P, dim]
    return (
        jnp.asarray(np.cos(emb), jnp.float32),
        jnp.asarray(np.sin(emb), jnp.float32),
    )


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def pixtral_encode(
    params: Params,
    cfg: PixtralVisionConfig,
    pixel_values: jax.Array,  # [1, C, H, W] one image (patch-multiple)
    run_layers: Optional[int] = None,
) -> jax.Array:
    """One image -> [n_patches, hidden] (HF PixtralVisionModel)."""
    p = cfg.patch_size
    x = jax.lax.conv_general_dilated(
        pixel_values.astype(jnp.float32),
        params["patch_embed"].astype(jnp.float32),
        window_strides=(p, p),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # [1, D, h, w]
    _, d, gh, gw = x.shape
    x = x.reshape(d, gh * gw).T  # [P, D] row-major (h, w)
    x = _rms(x, params["ln_pre_w"])
    side = cfg.image_size // cfg.patch_size
    pos = (np.arange(gh)[:, None] * side + np.arange(gw)[None, :]).reshape(-1)
    cos, sin = _pixtral_rope(cfg, pos)

    heads = cfg.num_attention_heads
    hd = cfg.head_dim
    scale = hd**-0.5
    layers = params["layers"]
    if run_layers is not None:
        layers = layers[: max(0, run_layers)]
    for lp in layers:
        res = x
        y = _rms(x, lp["attn_norm_w"])
        q = linear(y, lp["q_w"]).reshape(-1, heads, hd)
        k = linear(y, lp["k_w"]).reshape(-1, heads, hd)
        v = linear(y, lp["v_w"]).reshape(-1, heads, hd)
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        q = (qf * cos[:, None, :] + _rotate_half(qf) * sin[:, None, :])
        k = (kf * cos[:, None, :] + _rotate_half(kf) * sin[:, None, :])
        scores = jnp.einsum(
            "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum(
            "hqk,khd->qhd", probs, v.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).reshape(-1, heads * hd).astype(x.dtype)
        x = res + linear(ctx, lp["o_w"])
        res = x
        y = _rms(x, lp["ffn_norm_w"])
        gate = jax.nn.silu(linear(y, lp["gate_w"]).astype(jnp.float32))
        y = (gate * linear(y, lp["up_w"]).astype(jnp.float32)).astype(x.dtype)
        x = res + linear(y, lp["down_w"])
    return x


def load_pixtral_params(
    path: str, cfg: PixtralMMConfig, dtype: Optional[str] = None
) -> Params:
    from . import loader

    jdt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        dtype or cfg.text.dtype
    ]

    def put(t):
        return jnp.asarray(t).astype(jdt)

    vision: Params = {
        "layers": [dict() for _ in range(cfg.vision.num_hidden_layers)]
    }
    projector: Params = {}
    for name, tensor in loader.iter_safetensors(path):
        if "vision_tower." in name:
            sub = name.split("vision_tower.", 1)[1]
            if sub == "patch_conv.weight":
                vision["patch_embed"] = put(tensor)
            elif sub == "ln_pre.weight":
                vision["ln_pre_w"] = put(tensor)
            elif sub.startswith("transformer.layers."):
                parts = sub.split(".")
                i = int(parts[2])
                rest = ".".join(parts[3:])
                key = {
                    "attention.q_proj.weight": "q_w",
                    "attention.k_proj.weight": "k_w",
                    "attention.v_proj.weight": "v_w",
                    "attention.o_proj.weight": "o_w",
                    "attention_norm.weight": "attn_norm_w",
                    "ffn_norm.weight": "ffn_norm_w",
                    "feed_forward.gate_proj.weight": "gate_w",
                    "feed_forward.up_proj.weight": "up_w",
                    "feed_forward.down_proj.weight": "down_w",
                }.get(rest)
                if key:
                    vision["layers"][i][key] = put(tensor)
        elif "multi_modal_projector." in name:
            sub = name.split("multi_modal_projector.", 1)[1]
            key = {
                "linear_1.weight": "fc1_w",
                "linear_1.bias": "fc1_b",
                "linear_2.weight": "fc2_w",
                "linear_2.bias": "fc2_b",
                # Mistral3 projector extras
                "norm.weight": "norm_w",
                "patch_merger.merging_layer.weight": "merge_w",
            }.get(sub)
            if key:
                projector[key] = put(tensor)
    lm_params = loader.load_params(path, cfg.text, dtype=dtype)
    return {"vision": vision, "projector": projector, "lm": lm_params}


class PixtralVLM:
    """Pixtral for the unified serving engine: per-image encode +
    row-structured [IMG]/[IMG_BREAK]/[IMG_END] prompt expansion."""

    supports_audio = False

    def __init__(self, model_path: str, dtype: Optional[str] = None) -> None:
        self.model_path = model_path
        self._dtype = dtype
        self.cfg: Optional[PixtralMMConfig] = None
        self.params: Optional[Params] = None
        self._loaded = False

    def load(self) -> "PixtralVLM":
        if self._loaded:
            return self
        self.cfg = PixtralMMConfig.from_pretrained(self.model_path)
        self.params = load_pixtral_params(
            self.model_path, self.cfg, self._dtype
        )
        self._loaded = True
        return self

    @property
    def text_config(self) -> ModelConfig:
        return self.cfg.text

    @property
    def lm_params(self) -> Params:
        return self.params["lm"]

    def encode_image(self, pixel_values: np.ndarray) -> np.ndarray:
        """ONE image [C, H, W] (patch-multiple dims) ->
        [n_tokens, H_lm] f32 projected features (merged granularity for
        Mistral-3)."""
        cfg = self.cfg
        fl = cfg.vision_feature_layer
        n_layers = cfg.vision.num_hidden_layers
        run_layers = n_layers + 1 + fl if fl < 0 else fl
        feats = pixtral_encode(
            self.params["vision"],
            cfg.vision,
            jnp.asarray(pixel_values)[None],
            run_layers=run_layers,
        )
        proj = self.params["projector"]
        if cfg.projector_style == "mistral3":
            # HF Mistral3MultiModalProjector: RMSNorm (text eps) ->
            # unfold-style 2x2 merge -> merging_layer -> linear_1 ->
            # gelu -> linear_2
            m = cfg.spatial_merge_size
            gh = pixel_values.shape[1] // cfg.vision.patch_size
            gw = pixel_values.shape[2] // cfg.vision.patch_size
            d = feats.shape[-1]
            xf = feats.astype(jnp.float32)
            var = jnp.mean(xf * xf, -1, keepdims=True)
            xf = xf * jax.lax.rsqrt(var + cfg.text.rms_norm_eps) * (
                proj["norm_w"].astype(jnp.float32)
            )
            x = xf.reshape(gh // m, m, gw // m, m, d)
            # torch unfold layout: channel-major then kernel (i, j)
            x = jnp.transpose(x, (0, 2, 4, 1, 3)).reshape(-1, d * m * m)
            x = linear(x, proj["merge_w"])
            x = linear(x, proj["fc1_w"], proj.get("fc1_b"))
            x = jax.nn.gelu(
                x.astype(jnp.float32), approximate=False
            ).astype(x.dtype)
            out = linear(x, proj["fc2_w"], proj.get("fc2_b"))
            return np.asarray(out, dtype=np.float32)
        from .vision import llava_project

        out = llava_project(proj, feats[None], cfg.projector_act)[0]
        return np.asarray(out, dtype=np.float32)

    def image_token_rows(self, grid_h: int, grid_w: int) -> List[int]:
        """[IMG]*w + [IMG_BREAK] per row; last BREAK -> [IMG_END]."""
        cfg = self.cfg
        out: List[int] = []
        for r in range(grid_h):
            out.extend([cfg.image_token_id] * grid_w)
            out.append(
                cfg.image_end_token_id
                if r == grid_h - 1
                else cfg.image_break_token_id
            )
        return out

    def expand_image_tokens(
        self,
        token_ids: List[int],
        grids: List[Tuple[int, int]],  # (grid_h, grid_w) per image
    ) -> List[int]:
        """Replace each single [IMG] placeholder with the full
        row-structured block (HF PixtralProcessor expansion)."""
        out: List[int] = []
        img_i = 0
        for tid in token_ids:
            if tid == self.cfg.image_token_id and img_i < len(grids):
                gh, gw = grids[img_i]
                img_i += 1
                out.extend(self.image_token_rows(gh, gw))
            else:
                out.append(tid)
        return out

    def build_multimodal_prompt(
        self,
        token_ids: List[int],  # already expanded
        image_features: List[np.ndarray],  # each [n_patches, H]
    ) -> Tuple[List[int], np.ndarray, np.ndarray]:
        """Fill [IMG] rows (BREAK/END rows keep token embeddings)."""
        h = self.cfg.text.hidden_size
        t = len(token_ids)
        embeds = np.zeros((t, h), np.float32)
        mask = np.zeros(t, bool)
        ids_arr = np.asarray(token_ids)
        img_rows = np.flatnonzero(ids_arr == self.cfg.image_token_id)
        flat = (
            np.concatenate(image_features, axis=0)
            if image_features
            else np.zeros((0, h), np.float32)
        )
        if len(img_rows) != flat.shape[0]:
            raise ValueError(
                f"{len(img_rows)} [IMG] rows != {flat.shape[0]} patch"
                " features"
            )
        embeds[img_rows] = flat
        mask[img_rows] = True
        return token_ids, embeds, mask

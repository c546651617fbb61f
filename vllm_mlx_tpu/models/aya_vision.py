# SPDX-License-Identifier: Apache-2.0
"""Aya Vision (Cohere) — SigLIP tower + pixel-shuffle SwiGLU adapter
over a Command-R text stack.

Architecture (HF modeling_aya_vision.py):
  * SigLIP ViT (the shared models/vision.py tower), feature layer -1
    with strategy "full" (+ post-LN last_hidden_state semantics),
  * adapter: InternVL-order pixel shuffle (downsample_factor), then
    LayerNorm -> linear_1 -> SwiGLU chunk (x, gate -> silu(gate) * x)
    -> linear_2,
  * tiling: GotOcr2 crop-to-patches (aspect-closest canvas +
    thumbnail LAST), prompt = <|START_OF_IMG|> + TILE_{i} markers +
    <|IMG_PATCH|> rows per tile + TILE_GLOBAL + <|END_OF_IMG|>
    (AyaVisionProcessor._prompt_split_image). Fully causal.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.layers import linear
from .vision import VisionConfig, load_vision_params, vit_encode

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


class AyaVisionModel:
    """Aya Vision for the unified serving engine."""

    supports_audio = False

    def __init__(self, model_path: str, dtype: Optional[str] = None) -> None:
        self.model_path = model_path
        self._dtype = dtype
        self._loaded = False

    def load(self) -> "AyaVisionModel":
        if self._loaded:
            return self
        from . import loader

        with open(os.path.join(self.model_path, "config.json")) as f:
            cfg = json.load(f)
        self.cfg = ModelConfig.from_hf_config(cfg.get("text_config", {}))
        self.vision_cfg = VisionConfig.from_hf_config(
            cfg.get("vision_config", {})
        )
        self.image_token_id = cfg.get(
            "image_token_id", cfg.get("image_token_index", 0)
        )
        self.downsample_factor = cfg.get("downsample_factor", 2)
        self.vision_feature_layer = cfg.get("vision_feature_layer", -1)
        self.adapter_eps = cfg.get("adapter_layer_norm_eps", 1e-6)
        jdt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            self._dtype or self.cfg.dtype
        ]
        vision_tensors: Dict[str, np.ndarray] = {}
        projector: Params = {}
        for name, tensor in loader.iter_safetensors(self.model_path):
            if "vision_tower." in name:
                sub = name.split("vision_tower.", 1)[1]
                if sub.startswith("vision_model."):
                    sub = sub[len("vision_model."):]
                vision_tensors[sub] = tensor
            elif "multi_modal_projector." in name:
                sub = name.split("multi_modal_projector.", 1)[1]
                key = {
                    "layernorm.weight": "ln_w",
                    "layernorm.bias": "ln_b",
                    "linear_1.weight": "fc1_w",
                    "linear_1.bias": "fc1_b",
                    "linear_2.weight": "fc2_w",
                    "linear_2.bias": "fc2_b",
                }.get(sub)
                if key:
                    projector[key] = jnp.asarray(tensor).astype(jdt)
        self.vision_params = load_vision_params(
            vision_tensors, self.vision_cfg, dtype=jdt
        )
        self.projector = projector
        self.params = loader.load_params(
            self.model_path, self.cfg, dtype=self._dtype
        )
        vcfg = self.vision_cfg
        ds = self.downsample_factor
        fl = self.vision_feature_layer
        eps = self.adapter_eps

        def _encode(vision_params, projector, pixel_values):
            n_layers = vcfg.num_hidden_layers
            run_layers = n_layers + 1 + fl if fl < 0 else fl
            feats = vit_encode(
                vision_params, vcfg, pixel_values,
                run_layers=run_layers,
                # HF takes hidden_states[-1] WITHOUT the extra post-LN
                # when indexing hidden states; strategy "full" keeps all
                apply_post_ln=False,
            )
            b, seq, c = feats.shape
            side = int(round(seq**0.5))
            x = feats.reshape(b, side, side, c)
            # InternVL-order pixel shuffle
            x = x.reshape(b, side, side // ds, c * ds)
            x = jnp.transpose(x, (0, 2, 1, 3))
            x = x.reshape(b, side // ds, side // ds, c * ds * ds)
            x = jnp.transpose(x, (0, 2, 1, 3))
            x = x.reshape(b, (side // ds) ** 2, c * ds * ds)
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, -1, keepdims=True)
            var = jnp.var(xf, -1, keepdims=True)
            xf = (
                (xf - mu) * jax.lax.rsqrt(var + eps)
                * projector["ln_w"].astype(jnp.float32)
                + projector["ln_b"].astype(jnp.float32)
            )
            y = linear(xf, projector["fc1_w"], projector.get("fc1_b"))
            half = y.shape[-1] // 2
            y = jax.nn.silu(
                y[..., half:].astype(jnp.float32)
            ) * y[..., :half].astype(jnp.float32)
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
        """[N, C, S, S] -> per-tile features [N, rows, H_lm] f32."""
        out = self._encode_jit(
            self.vision_params, self.projector, jnp.asarray(tiles)
        )
        return np.asarray(out, np.float32)

    def image_prompt_string(self, n_tiles: int, rows_per_tile: int) -> str:
        """HF AyaVisionProcessor._prompt_split_image: tiles 1..n-1 with
        TILE_{i} markers, the GLOBAL (thumbnail) tile last."""
        s = "<|START_OF_IMG|>"
        patch = "<|IMG_PATCH|>" * rows_per_tile
        if n_tiles > 1:
            for i in range(1, n_tiles):
                s += f"TILE_{i}" + patch
        s += "TILE_GLOBAL" + patch + "<|END_OF_IMG|>"
        return s

    def build_multimodal_prompt(
        self,
        token_ids: List[int],
        image_features: List[np.ndarray],  # per image [n_tiles, rows, H]
    ) -> Tuple[List[int], np.ndarray, np.ndarray]:
        """Fill the (already expanded) IMG_PATCH rows in tile order."""
        h = self.cfg.hidden_size
        t = len(token_ids)
        embeds = np.zeros((t, h), np.float32)
        mask = np.zeros(t, bool)
        ids_arr = np.asarray(token_ids)
        img_rows = np.flatnonzero(ids_arr == self.image_token_id)
        flat = (
            np.concatenate(
                [f.reshape(-1, f.shape[-1]) for f in image_features], axis=0
            )
            if image_features
            else np.zeros((0, h), np.float32)
        )
        if len(img_rows) != flat.shape[0]:
            raise ValueError(
                f"{len(img_rows)} IMG_PATCH rows != {flat.shape[0]}"
                " feature rows"
            )
        embeds[img_rows] = flat
        mask[img_rows] = True
        return token_ids, embeds, mask

# SPDX-License-Identifier: Apache-2.0
"""Multimodal (vision-language) model: LLaVA-style architectures.

The reference's MLLM stack wraps mlx-vlm models (reference
models/mllm.py:1207 ``MLXMultimodalLM``); the TPU build owns the tower:
a JAX ViT (models/vision.py) + projector + the shared decoder LM. Vision
features are injected into the serving engine through the unified step's
embedding-override rows — image embeds flow through the normal chunked
prefill (SURVEY.md §7 hard-part 6), so MLLM requests batch with text
requests in the same compiled step.
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
from .vision import (
    VisionConfig,
    llava_project,
    load_vision_params,
    vit_encode,
)

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


@dataclass
class MultimodalConfig:
    text: ModelConfig
    vision: VisionConfig
    image_token_id: int
    # None = full tower incl. post-layernorm (DeepSeek-VL: the aligner
    # reads vision_model(...).last_hidden_state)
    vision_feature_layer: Optional[int] = -2
    vision_feature_select_strategy: str = "default"  # drop CLS
    projector_act: str = "gelu"

    @classmethod
    def from_pretrained(cls, path: str) -> "MultimodalConfig":
        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        text = ModelConfig.from_hf_config(cfg.get("text_config", {}))
        vision = VisionConfig.from_hf_config(cfg.get("vision_config", {}))
        if cfg.get("model_type") == "deepseek_vl":
            # DeepSeek-VL (HF modeling_deepseek_vl.py): SigLIP tower
            # read at last_hidden_state (post-LN), 2-layer GELU aligner
            return cls(
                text=text,
                vision=vision,
                image_token_id=cfg.get(
                    "image_token_id", cfg.get("image_token_index", 0)
                ),
                vision_feature_layer=None,
                vision_feature_select_strategy="full",
            )
        return cls(
            text=text,
            vision=vision,
            image_token_id=cfg.get("image_token_index", cfg.get("image_token_id", 0)),
            vision_feature_layer=cfg.get("vision_feature_layer", -2),
            vision_feature_select_strategy=cfg.get(
                "vision_feature_select_strategy", "default"
            ),
            projector_act=cfg.get("projector_hidden_act", "gelu"),
        )

    @property
    def tokens_per_image(self) -> int:
        n = self.vision.num_patches
        if (
            self.vision.use_class_token
            and self.vision_feature_select_strategy == "full"
        ):
            n += 1
        return n


def load_multimodal_params(
    path: str, cfg: MultimodalConfig, dtype: Optional[str] = None
) -> Params:
    """Split a LLaVA-style checkpoint into vision / projector / LM parts."""
    from . import loader

    jdt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        dtype or cfg.text.dtype
    ]
    vision_tensors: Dict[str, np.ndarray] = {}
    projector: Params = {}
    for name, tensor in loader.iter_safetensors(path):
        if (
            ".vision_tower." in name
            or name.startswith("vision_tower.")
            or ".vision_model." in name
            or name.startswith("vision_model.")
        ):
            marker = (
                "vision_tower." if "vision_tower." in name
                else "vision_model."
            )
            sub = name.rsplit(marker, 1)[1]
            if sub.startswith("vision_model."):
                sub = sub[len("vision_model."):]
            vision_tensors[sub] = tensor
        elif "multi_modal_projector." in name or ".aligner." in name or (
            name.startswith("aligner.")
        ):
            sub = name.split(
                "multi_modal_projector.", 1
            )[1] if "multi_modal_projector." in name else name.split(
                "aligner.", 1
            )[1]
            key = {
                "linear_1.weight": "fc1_w",
                "linear_1.bias": "fc1_b",
                "linear_2.weight": "fc2_w",
                "linear_2.bias": "fc2_b",
                # DeepSeek-VL aligner names
                "linear1.weight": "fc1_w",
                "linear1.bias": "fc1_b",
                "linear2.weight": "fc2_w",
                "linear2.bias": "fc2_b",
            }.get(sub)
            if key:
                projector[key] = jnp.asarray(tensor).astype(jdt)
    lm_params = loader.load_params(path, cfg.text, dtype=dtype)
    vision_params = load_vision_params(vision_tensors, cfg.vision, dtype=jdt)
    return {
        "vision": vision_params,
        "projector": projector,
        "lm": lm_params,
    }


class MultimodalLM:
    """LLaVA-style VLM: encode images once, splice features into prompt
    embeddings at image-token rows, serve through the unified engine."""

    def __init__(self, model_path: str, dtype: Optional[str] = None) -> None:
        self.model_path = model_path
        self._dtype = dtype
        self.cfg: Optional[MultimodalConfig] = None
        self.params: Optional[Params] = None
        self._encode_jit = None
        self._loaded = False

    def load(self) -> "MultimodalLM":
        if self._loaded:
            return self
        self.cfg = MultimodalConfig.from_pretrained(self.model_path)
        self.params = load_multimodal_params(
            self.model_path, self.cfg, self._dtype
        )
        cfg = self.cfg

        def _encode(vision_params, projector, pixel_values):
            # run ViT up to vision_feature_layer (HF hidden_states
            # index); feature_layer None = full stack + post-LN
            # (DeepSeek-VL last_hidden_state)
            n_layers = cfg.vision.num_hidden_layers
            fl = cfg.vision_feature_layer
            if fl is None:
                run_layers = n_layers
            else:
                run_layers = n_layers + 1 + fl if fl < 0 else fl
            feats = vit_encode(
                vision_params,
                cfg.vision,
                pixel_values,
                run_layers=run_layers,
                apply_post_ln=fl is None,
            )
            if (
                cfg.vision.use_class_token
                and cfg.vision_feature_select_strategy == "default"
            ):
                feats = feats[:, 1:]
            return llava_project(projector, feats, cfg.projector_act)

        self._encode_jit = jax.jit(_encode)
        self._loaded = True
        return self

    @property
    def text_config(self) -> ModelConfig:
        return self.cfg.text

    @property
    def lm_params(self) -> Params:
        return self.params["lm"]

    def encode_images(self, pixel_values: np.ndarray) -> np.ndarray:
        """[B, C, H, W] -> projected features [B, tokens_per_image, H_lm]."""
        out = self._encode_jit(
            self.params["vision"],
            self.params["projector"],
            jnp.asarray(pixel_values),
        )
        return np.asarray(out, dtype=np.float32)

    def build_multimodal_prompt(
        self,
        token_ids: List[int],
        image_features: List[np.ndarray],  # each [tokens_per_image, H]
    ) -> Tuple[List[int], np.ndarray, np.ndarray]:
        """Expand each image placeholder token into ``tokens_per_image``
        rows carrying the image features. Returns
        (expanded_token_ids, prompt_embeds [T,H], embeds_mask [T])."""
        h = self.cfg.text.hidden_size
        out_ids: List[int] = []
        rows: List[Optional[np.ndarray]] = []
        img_i = 0
        for tid in token_ids:
            if tid == self.cfg.image_token_id and img_i < len(image_features):
                feats = image_features[img_i]
                img_i += 1
                for r in range(feats.shape[0]):
                    out_ids.append(self.cfg.image_token_id)
                    rows.append(feats[r])
            else:
                out_ids.append(tid)
                rows.append(None)
        embeds = np.zeros((len(out_ids), h), np.float32)
        mask = np.zeros(len(out_ids), bool)
        for i, r in enumerate(rows):
            if r is not None:
                embeds[i] = r
                mask[i] = True
        return out_ids, embeds, mask

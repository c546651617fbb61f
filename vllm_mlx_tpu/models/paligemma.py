# SPDX-License-Identifier: Apache-2.0
"""PaliGemma: SigLIP tower + linear projector + Gemma LM, prefix-LM.

The reference serves PaliGemma through mlx-vlm (reference
docs/guides/multimodal.md "PaliGemma"); the TPU build owns the tower.
Architecture (HF modeling_paligemma.py):

  * SigLIP ViT (`vision_tower.vision_model`) — full stack + post-LN,
  * `PaliGemmaMultiModalProjector`: ONE biased linear
    [Dv -> projection_dim]; projected features are then divided by
    sqrt(text hidden_size) (modeling_paligemma.py get_image_features),
  * prompt = <image> * image_seq_length * n_images + BOS + text + "\n"
    (processing_paligemma.build_string_from_input),
  * PREFIX-LM attention: at inference the ENTIRE prompt attends to
    itself bidirectionally (modeling_paligemma.py _update_causal_mask
    zeroes the mask over the input sequence); generated tokens are
    causal. Served as one bidirectional span [0, prompt_len) through
    ops/ragged_bidir_kernel.py — so the whole prompt must fit in one
    prefill chunk (enforced at admission).

The LM is Gemma 1 (paligemma) or Gemma 2 (paligemma2) — both already
first-class in config.py/decoder.py.
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
from .vision import VisionConfig, load_vision_params, vit_encode

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


@dataclass
class PaliGemmaConfig:
    text: ModelConfig
    vision: VisionConfig
    image_token_id: int
    image_seq_length: int  # soft tokens per image (num_patches)
    projection_dim: int

    @classmethod
    def from_pretrained(cls, path: str) -> "PaliGemmaConfig":
        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        tc = dict(cfg.get("text_config", {}))
        tc.setdefault("model_type", "gemma")
        vc = cfg.get("vision_config", {})
        vision = VisionConfig.from_hf_config(vc)
        return cls(
            text=ModelConfig.from_hf_config(tc),
            vision=vision,
            image_token_id=cfg.get(
                "image_token_index", cfg.get("image_token_id", 257152)
            ),
            image_seq_length=cfg.get(
                "image_seq_length", vision.num_patches
            ),
            projection_dim=vc.get(
                "projection_dim", cfg.get("projection_dim", 2048)
            ),
        )


def load_paligemma_params(
    path: str, cfg: PaliGemmaConfig, dtype: Optional[str] = None
) -> Params:
    from . import loader

    jdt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        dtype or cfg.text.dtype
    ]
    vision_tensors: Dict[str, np.ndarray] = {}
    projector: Params = {}
    for name, tensor in loader.iter_safetensors(path):
        if "vision_tower." in name:
            sub = name.split("vision_tower.", 1)[1]
            if sub.startswith("vision_model."):
                sub = sub[len("vision_model."):]
            vision_tensors[sub] = tensor
        elif "multi_modal_projector." in name:
            sub = name.split("multi_modal_projector.", 1)[1]
            if sub == "linear.weight":
                projector["w"] = jnp.asarray(tensor).astype(jdt)
            elif sub == "linear.bias":
                projector["b"] = jnp.asarray(tensor).astype(jdt)
    lm_params = loader.load_params(path, cfg.text, dtype=dtype)
    vision_params = load_vision_params(vision_tensors, cfg.vision, dtype=jdt)
    return {"vision": vision_params, "projector": projector, "lm": lm_params}


class PaliGemmaVLM:
    """PaliGemma for the unified serving engine."""

    supports_audio = False

    def __init__(self, model_path: str, dtype: Optional[str] = None) -> None:
        self.model_path = model_path
        self._dtype = dtype
        self.cfg: Optional[PaliGemmaConfig] = None
        self.params: Optional[Params] = None
        self._encode_jit = None
        self._loaded = False

    def load(self) -> "PaliGemmaVLM":
        if self._loaded:
            return self
        self.cfg = PaliGemmaConfig.from_pretrained(self.model_path)
        self.params = load_paligemma_params(
            self.model_path, self.cfg, self._dtype
        )
        cfg = self.cfg
        inv_scale = float(cfg.text.hidden_size) ** -0.5

        def _encode(vision_params, projector, pixel_values):
            feats = vit_encode(
                vision_params, cfg.vision, pixel_values, apply_post_ln=True
            )
            proj = linear(
                feats.astype(jnp.float32),
                projector["w"].astype(jnp.float32),
                projector["b"].astype(jnp.float32),
            )
            return proj * inv_scale

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
        """[B, C, H, W] -> [B, image_seq_length, H_lm] f32 (already
        scaled by 1/sqrt(text hidden) per HF get_image_features)."""
        out = self._encode_jit(
            self.params["vision"],
            self.params["projector"],
            jnp.asarray(pixel_values),
        )
        return np.asarray(out, dtype=np.float32)

    def build_prompt_ids(
        self, tokenizer, text: str, n_images: int
    ) -> List[int]:
        """HF build_string_from_input: image tokens, BOS, text, "\\n"."""
        img = [self.cfg.image_token_id] * (
            self.cfg.image_seq_length * n_images
        )
        bos = tokenizer.bos_token_id
        body = tokenizer.encode(text + "\n", add_special_tokens=False)
        return img + ([bos] if bos is not None else []) + body

    def build_multimodal_prompt(
        self,
        token_ids: List[int],
        image_features: List[np.ndarray],  # each [image_seq_length, H]
    ) -> Tuple[List[int], np.ndarray, np.ndarray]:
        """Fill the leading image rows with projector features."""
        h = self.cfg.text.hidden_size
        t = len(token_ids)
        embeds = np.zeros((t, h), np.float32)
        mask = np.zeros(t, bool)
        pos = 0
        img_tok = self.cfg.image_token_id
        for feats in image_features:
            n = feats.shape[0]
            while pos < t and token_ids[pos] != img_tok:
                pos += 1
            if pos + n > t or any(
                token_ids[pos + j] != img_tok for j in range(n)
            ):
                raise ValueError("image token layout mismatch")
            embeds[pos : pos + n] = feats
            mask[pos : pos + n] = True
            pos += n
        return token_ids, embeds, mask

# SPDX-License-Identifier: Apache-2.0
"""Gemma 3 multimodal: SigLIP tower + avg-pool projector + Gemma3 LM.

The reference serves Gemma 3 through mlx-vlm (reference
models/mllm.py:1207, docs/guides/multimodal.md "Gemma 3"); the TPU
build owns the tower. Architecture (HF modeling_gemma3.py):

  * SigLIP ViT (`vision_tower.vision_model`, no class token,
    gelu-tanh) — full stack incl. post-layernorm,
  * `Gemma3MultiModalProjector`: transpose the patch grid back to 2-D,
    average-pool patches down to ``mm_tokens_per_image`` soft tokens
    (e.g. 64x64 -> 16x16 = 256), Gemma RMSNorm (zero-centered 1+w
    weight) over the VISION width, then a bare [Dv, Dt] matmul,
  * the soft tokens replace the ``<image_soft_token>`` rows of the
    expanded prompt; each image's run attends BIDIRECTIONALLY to
    itself (HF token_type_ids or-mask) — served through the
    bidirectional-span ragged kernel (ops/ragged_bidir_kernel.py).

Prompt expansion mirrors HF Gemma3Processor.full_image_sequence: each
``<start_of_image>`` the chat template emits becomes
``\\n\\n<start_of_image> <soft>*N <end_of_image>\\n\\n``.
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
from .vision import VisionConfig, load_vision_params, vit_encode

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


@dataclass
class Gemma3MMConfig:
    text: ModelConfig
    vision: VisionConfig
    image_token_id: int  # <image_soft_token>
    boi_token_id: int  # <start_of_image>
    eoi_token_id: int  # <end_of_image>
    mm_tokens_per_image: int = 256

    @classmethod
    def from_pretrained(cls, path: str) -> "Gemma3MMConfig":
        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        tc = dict(cfg.get("text_config", {}))
        tc.setdefault("model_type", "gemma3_text")
        return cls(
            text=ModelConfig.from_hf_config(tc),
            vision=VisionConfig.from_hf_config(cfg.get("vision_config", {})),
            image_token_id=cfg.get(
                "image_token_index", cfg.get("image_token_id", 262144)
            ),
            boi_token_id=cfg.get(
                "boi_token_index", cfg.get("boi_token_id", 255999)
            ),
            eoi_token_id=cfg.get(
                "eoi_token_index", cfg.get("eoi_token_id", 256000)
            ),
            mm_tokens_per_image=cfg.get("mm_tokens_per_image", 256),
        )


def _gemma_rmsnorm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return n * (1.0 + w.astype(jnp.float32))


def gemma3_project(
    proj: Params, feats: jax.Array, cfg: Gemma3MMConfig
) -> jax.Array:
    """[B, patches, Dv] -> [B, mm_tokens_per_image, Dt] (HF
    Gemma3MultiModalProjector.forward)."""
    b, p, dv = feats.shape
    side = int(round(p**0.5))
    tok_side = int(round(cfg.mm_tokens_per_image**0.5))
    k = side // tok_side
    x = feats.reshape(b, side, side, dv).astype(jnp.float32)
    # average-pool the patch grid down to tok_side x tok_side
    x = x.reshape(b, tok_side, k, tok_side, k, dv).mean(axis=(2, 4))
    x = x.reshape(b, tok_side * tok_side, dv)
    x = _gemma_rmsnorm(x, proj["soft_emb_norm_w"], cfg.vision.layer_norm_eps)
    return jnp.einsum(
        "btd,de->bte", x, proj["mm_input_projection"].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


def load_gemma3_mm_params(
    path: str, cfg: Gemma3MMConfig, dtype: Optional[str] = None
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
            if sub == "mm_input_projection_weight":
                projector["mm_input_projection"] = jnp.asarray(tensor)
            elif sub == "mm_soft_emb_norm.weight":
                projector["soft_emb_norm_w"] = jnp.asarray(tensor)
    lm_params = loader.load_params(path, cfg.text, dtype=dtype)
    vision_params = load_vision_params(vision_tensors, cfg.vision, dtype=jdt)
    return {"vision": vision_params, "projector": projector, "lm": lm_params}


class Gemma3VLM:
    """Gemma 3 VLM for the unified serving engine: encode images once,
    splice soft tokens into the expanded prompt, mark each image's run
    as a bidirectional attention span."""

    supports_audio = False

    def __init__(self, model_path: str, dtype: Optional[str] = None) -> None:
        self.model_path = model_path
        self._dtype = dtype
        self.cfg: Optional[Gemma3MMConfig] = None
        self.params: Optional[Params] = None
        self._encode_jit = None
        self._loaded = False

    def load(self) -> "Gemma3VLM":
        if self._loaded:
            return self
        self.cfg = Gemma3MMConfig.from_pretrained(self.model_path)
        self.params = load_gemma3_mm_params(
            self.model_path, self.cfg, self._dtype
        )
        cfg = self.cfg

        def _encode(vision_params, projector, pixel_values):
            feats = vit_encode(
                vision_params, cfg.vision, pixel_values, apply_post_ln=True
            )
            return gemma3_project(projector, feats, cfg)

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
        """[B, C, H, W] -> [B, mm_tokens_per_image, H_lm] f32."""
        out = self._encode_jit(
            self.params["vision"],
            self.params["projector"],
            jnp.asarray(pixel_values),
        )
        return np.asarray(out, dtype=np.float32)

    def expand_image_tokens(
        self, tokenizer, prompt: str
    ) -> Tuple[List[int], List[Tuple[int, int]]]:
        """Replace each ``<start_of_image>`` with HF's
        full_image_sequence and tokenize. Returns (token_ids,
        [(lo, hi)) soft-token runs])."""
        boi = tokenizer.decode([self.cfg.boi_token_id])
        soft = tokenizer.decode([self.cfg.image_token_id])
        eoi = tokenizer.decode([self.cfg.eoi_token_id])
        full = "\n\n" + boi + soft * self.cfg.mm_tokens_per_image + eoi + "\n\n"
        expanded = prompt.replace(boi, full)
        ids = tokenizer.encode(expanded)
        return ids, self.soft_token_runs(ids)

    def soft_token_runs(self, ids: List[int]) -> List[Tuple[int, int]]:
        """Maximal runs of <image_soft_token> — one per image. These are
        HF's token_type_ids==1 groups: the bidirectional spans."""
        runs: List[Tuple[int, int]] = []
        start = None
        for i, t in enumerate(ids):
            if t == self.cfg.image_token_id:
                if start is None:
                    start = i
            elif start is not None:
                runs.append((start, i))
                start = None
        if start is not None:
            runs.append((start, len(ids)))
        return runs

    def build_multimodal_prompt(
        self,
        token_ids: List[int],
        image_features: List[np.ndarray],  # each [mm_tokens, H]
    ) -> Tuple[List[int], np.ndarray, np.ndarray]:
        """Fill the (already expanded) soft-token rows with projector
        features, in image order. Returns (ids, embeds [T,H], mask)."""
        h = self.cfg.text.hidden_size
        t = len(token_ids)
        embeds = np.zeros((t, h), np.float32)
        mask = np.zeros(t, bool)
        runs = self.soft_token_runs(token_ids)
        if len(runs) != len(image_features):
            raise ValueError(
                f"prompt has {len(runs)} image runs but "
                f"{len(image_features)} images were provided"
            )
        for (lo, hi), feats in zip(runs, image_features):
            if hi - lo != feats.shape[0]:
                raise ValueError(
                    f"image run {hi - lo} rows != {feats.shape[0]} soft tokens"
                )
            embeds[lo:hi] = feats
            mask[lo:hi] = True
        return token_ids, embeds, mask

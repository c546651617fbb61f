# SPDX-License-Identifier: Apache-2.0
"""Idefics3 / SmolVLM: SigLIP-shaped tower + pixel-shuffle connector +
Llama LM with tiled high-resolution images.

The reference serves Idefics through mlx-vlm (reference
docs/guides/multimodal.md "Idefics"); the TPU build owns the tower.
Architecture (HF modeling_idefics3.py):

  * `Idefics3VisionTransformer`: SigLIP layout (patch conv with bias,
    learned position embeddings, pre-LN blocks with biased qkv/o and
    tanh-gelu MLP, post layernorm) — the shared ViT in
    models/vision.py covers it,
  * `Idefics3Connector`: pixel-shuffle with ``scale_factor`` (space to
    depth: seq/(sf^2) tokens of dim Dv*sf^2) then ONE bias-free linear
    onto the text width,
  * tiling (HF image_processing_idefics3.py): the image is resized and
    split into up-to-NxM square tiles of ``max_image_size`` plus a
    global downscale; the prompt interleaves
    ``<fake_token_around_image><row_r_col_c>`` + image tokens per tile
    (processing_idefics3.get_image_prompt_string). Attention is fully
    causal.
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
class Idefics3MMConfig:
    text: ModelConfig
    vision: VisionConfig
    image_token_id: int
    scale_factor: int = 2

    @classmethod
    def from_pretrained(cls, path: str) -> "Idefics3MMConfig":
        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        tc = dict(cfg.get("text_config", {}))
        tc.setdefault("model_type", "llama")
        return cls(
            text=ModelConfig.from_hf_config(tc),
            vision=VisionConfig.from_hf_config(cfg.get("vision_config", {})),
            image_token_id=cfg.get(
                "image_token_id", cfg.get("image_token_index", 128257)
            ),
            scale_factor=cfg.get("scale_factor", 2),
        )

    @property
    def image_seq_len(self) -> int:
        """Soft tokens per tile after the pixel shuffle."""
        side = self.vision.image_size // self.vision.patch_size
        return (side // self.scale_factor) ** 2


def pixel_shuffle(x: jax.Array, scale_factor: int) -> jax.Array:
    """[B, seq, D] -> [B, seq/sf^2, D*sf^2] (HF Idefics3Connector)."""
    b, seq, d = x.shape
    side = int(round(seq**0.5))
    x = x.reshape(b, side, side, d)
    x = x.reshape(b, side, side // scale_factor, d * scale_factor)
    x = jnp.transpose(x, (0, 2, 1, 3))
    x = x.reshape(
        b,
        side // scale_factor,
        side // scale_factor,
        d * scale_factor * scale_factor,
    )
    x = jnp.transpose(x, (0, 2, 1, 3))
    return x.reshape(b, seq // (scale_factor**2), d * scale_factor**2)


def load_idefics3_params(
    path: str, cfg: Idefics3MMConfig, dtype: Optional[str] = None
) -> Params:
    from . import loader

    jdt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        dtype or cfg.text.dtype
    ]
    vision_tensors: Dict[str, np.ndarray] = {}
    proj_w = None
    for name, tensor in loader.iter_safetensors(path):
        if "vision_model." in name:
            vision_tensors[name.split("vision_model.", 1)[1]] = tensor
        elif name.endswith("connector.modality_projection.proj.weight"):
            proj_w = jnp.asarray(tensor).astype(jdt)
    lm_params = loader.load_params(path, cfg.text, dtype=dtype)
    vision_params = load_vision_params(vision_tensors, cfg.vision, dtype=jdt)
    # HF Idefics3VisionEmbeddings assigns positions by bucketizing
    # fractional coords scaled by (1 - 1e-6): for full square tiles the
    # per-axis bucket is max(i - 1, 0), NOT arange (adjacent leading
    # patches share an embedding row). Bake that remap into the table
    # so the shared ViT's arange indexing reproduces it exactly.
    side = cfg.vision.image_size // cfg.vision.patch_size
    ax = np.maximum(np.arange(side) - 1, 0)
    ids = (ax[:, None] * side + ax[None, :]).reshape(-1)
    vision_params["pos_embed"] = vision_params["pos_embed"][ids]
    return {"vision": vision_params, "proj_w": proj_w, "lm": lm_params}


class Idefics3VLM:
    """Idefics3/SmolVLM for the unified serving engine."""

    supports_audio = False

    def __init__(self, model_path: str, dtype: Optional[str] = None) -> None:
        self.model_path = model_path
        self._dtype = dtype
        self.cfg: Optional[Idefics3MMConfig] = None
        self.params: Optional[Params] = None
        self._encode_jit = None
        self._loaded = False

    def load(self) -> "Idefics3VLM":
        if self._loaded:
            return self
        self.cfg = Idefics3MMConfig.from_pretrained(self.model_path)
        self.params = load_idefics3_params(
            self.model_path, self.cfg, self._dtype
        )
        cfg = self.cfg

        def _encode(vision_params, proj_w, pixel_values):
            feats = vit_encode(
                vision_params, cfg.vision, pixel_values, apply_post_ln=True
            )
            shuffled = pixel_shuffle(feats, cfg.scale_factor)
            return jnp.einsum(
                "btd,ed->bte",
                shuffled.astype(jnp.float32),
                proj_w.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )

        self._encode_jit = jax.jit(_encode)
        self._loaded = True
        return self

    @property
    def text_config(self) -> ModelConfig:
        return self.cfg.text

    @property
    def lm_params(self) -> Params:
        return self.params["lm"]

    def encode_tiles(self, pixel_values: np.ndarray) -> np.ndarray:
        """[N_tiles, C, S, S] -> [N_tiles, image_seq_len, H_lm] f32."""
        out = self._encode_jit(
            self.params["vision"],
            self.params["proj_w"],
            jnp.asarray(pixel_values),
        )
        return np.asarray(out, dtype=np.float32)

    def image_prompt_string(
        self,
        rows: int,
        cols: int,
        fake_token: str = "<fake_token_around_image>",
        image_token: str = "<image>",
        global_token: str = "<global-img>",
    ) -> str:
        """HF processing_idefics3.get_image_prompt_string."""
        seq = image_token * self.cfg.image_seq_len
        if rows == 0 and cols == 0:
            return f"{fake_token}{global_token}{seq}{fake_token}"
        s = ""
        for r in range(rows):
            for c in range(cols):
                s += f"{fake_token}<row_{r + 1}_col_{c + 1}>{seq}"
            s += "\n"
        s += f"\n{fake_token}{global_token}{seq}{fake_token}"
        return s

    def expand_image_tokens(
        self, prompt: str, grids: List[Tuple[int, int]]
    ) -> str:
        """Replace each single ``<image>`` placeholder the chat template
        emitted with that image's full tiled prompt string."""
        out = []
        parts = prompt.split("<image>")
        if len(parts) - 1 != len(grids):
            raise ValueError(
                f"prompt has {len(parts) - 1} <image> placeholders for "
                f"{len(grids)} images"
            )
        for i, part in enumerate(parts[:-1]):
            rows, cols = grids[i]
            out.append(part)
            out.append(self.image_prompt_string(rows, cols))
        out.append(parts[-1])
        return "".join(out)

    def build_multimodal_prompt(
        self,
        token_ids: List[int],
        tile_features: List[np.ndarray],  # per image [n_tiles, seq, H]
    ) -> Tuple[List[int], np.ndarray, np.ndarray]:
        """Fill <image> rows with tile features in tile order (row-major
        tiles then the global tile — HF inputs_merger order)."""
        h = self.cfg.text.hidden_size
        t = len(token_ids)
        embeds = np.zeros((t, h), np.float32)
        mask = np.zeros(t, bool)
        ids_arr = np.asarray(token_ids)
        img_rows = np.flatnonzero(ids_arr == self.cfg.image_token_id)
        flat = (
            np.concatenate(
                [f.reshape(-1, f.shape[-1]) for f in tile_features], axis=0
            )
            if tile_features
            else np.zeros((0, h), np.float32)
        )
        if len(img_rows) != flat.shape[0]:
            raise ValueError(
                f"{len(img_rows)} <image> rows != {flat.shape[0]} tile"
                " feature rows"
            )
        embeds[img_rows] = flat
        mask[img_rows] = True
        return token_ids, embeds, mask

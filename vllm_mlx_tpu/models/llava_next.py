# SPDX-License-Identifier: Apache-2.0
"""LLaVA-NeXT (LLaVA-1.6) — anyres tiled CLIP tower.

The reference serves LLaVA variants through mlx-vlm (reference
docs/guides/multimodal.md "LLaVA"); the TPU build owns the tower.
Architecture (HF modeling_llava_next.py):

  * the image picks its best grid resolution from
    ``image_grid_pinpoints``, is aspect-fit resized + padded there and
    divided into CLIP-size tiles; the resized ORIGINAL (the "base"
    image) rides along as tile 0,
  * every tile runs the plain LLaVA path (CLIP feature layer -2, drop
    CLS, 2-layer projector),
  * packing (``pack_image_features``): base features first, then the
    spatial tiles re-assembled into one big grid, UNPADDED back to the
    original aspect, with the learned ``image_newline`` embedding
    appended at the end of every row,
  * the single ``<image>`` placeholder expands to the packed row count.
    Fully causal attention.
"""

from __future__ import annotations

import json
import logging
import math
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .mllm import MultimodalLM

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


def select_best_resolution(
    original_size: Tuple[int, int],
    possible_resolutions: Sequence[Sequence[int]],
) -> Tuple[int, int]:
    """HF select_best_resolution (max effective, min wasted)."""
    oh, ow = original_size
    best = None
    max_eff = 0
    min_waste = float("inf")
    for h, w in possible_resolutions:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = w * h - eff
        if eff > max_eff or (eff == max_eff and waste < min_waste):
            max_eff, min_waste, best = eff, waste, (h, w)
    return best


def patch_output_size(
    oh: int, ow: int, th: int, tw: int
) -> Tuple[int, int]:
    """HF get_patch_output_size (aspect-fit with ceil, clamped)."""
    scale_w = tw / ow
    scale_h = th / oh
    if scale_w < scale_h:
        return min(math.ceil(oh * scale_w), th), tw
    return th, min(math.ceil(ow * scale_h), tw)


def unpad_bounds(
    grid_h: int, grid_w: int, orig_h: int, orig_w: int
) -> Tuple[int, int, int, int]:
    """Row/col slice of the assembled feature grid that survives HF
    unpad_image: returns (r0, r1, c0, c1)."""
    orig_ar = orig_w / orig_h
    cur_ar = grid_w / grid_h
    if orig_ar > cur_ar:
        scale = grid_w / orig_w
        new_h = int(round(orig_h * scale, 7))
        pad = (grid_h - new_h) // 2
        return pad, grid_h - pad, 0, grid_w
    scale = grid_h / orig_h
    new_w = int(round(orig_w * scale, 7))
    pad = (grid_w - new_w) // 2
    return 0, grid_h, pad, grid_w - pad


def _torch_bilinear_resize(
    x: np.ndarray, out_h: int, out_w: int
) -> np.ndarray:
    """[H, W, C] -> [out_h, out_w, C], torch F.interpolate(mode=
    'bilinear', align_corners=False) semantics (half-pixel centers,
    edge-clamped)."""
    def axis(src, dst):
        pos = (np.arange(dst) + 0.5) * (src / dst) - 0.5
        base = np.floor(pos).astype(np.int64)
        frac = pos - base
        i0 = np.clip(base, 0, src - 1)
        i1 = np.clip(base + 1, 0, src - 1)
        return i0, i1, frac.astype(np.float64)

    r0, r1, rf = axis(x.shape[0], out_h)
    c0, c1, cf = axis(x.shape[1], out_w)
    xf = x.astype(np.float64)
    rows = xf[r0] * (1 - rf)[:, None, None] + xf[r1] * rf[:, None, None]
    out = (
        rows[:, c0] * (1 - cf)[None, :, None]
        + rows[:, c1] * cf[None, :, None]
    )
    return out.astype(np.float32)


class LlavaNextVLM(MultimodalLM):
    """LLaVA-NeXT for the unified serving engine: per-tile LLaVA encode
    + anyres packing with the learned image_newline row."""

    def __init__(self, model_path: str, dtype: Optional[str] = None) -> None:
        super().__init__(model_path, dtype)
        with open(os.path.join(model_path, "config.json")) as f:
            raw = json.load(f)
        self.image_grid_pinpoints: List[List[int]] = raw.get(
            "image_grid_pinpoints",
            [[336, 672], [672, 336], [672, 672], [1008, 336], [336, 1008]],
        )
        self._image_newline: Optional[np.ndarray] = None

    def load(self) -> "LlavaNextVLM":
        if self._loaded:
            return self
        super().load()
        from . import loader

        for name, tensor in loader.iter_safetensors(self.model_path):
            if name.endswith("image_newline"):
                self._image_newline = np.asarray(tensor, np.float32)
        if self._image_newline is None:
            raise ValueError("llava_next checkpoint lacks image_newline")
        return self

    @property
    def side(self) -> int:
        return self.cfg.vision.image_size // self.cfg.vision.patch_size

    def pack_features(
        self,
        tile_features: np.ndarray,  # [1 + n_tiles, side*side, H]
        grid: Tuple[int, int],  # (num_patch_h, num_patch_w)
        orig_size: Tuple[int, int],  # (orig_h, orig_w) pixels
    ) -> np.ndarray:
        """HF pack_image_features for one image: base tile first, then
        the unpadded spatial grid with image_newline per row."""
        side = self.side
        h_lm = tile_features.shape[-1]
        base = tile_features[0]
        nph, npw = grid
        spatial = tile_features[1:].reshape(nph, npw, side, side, h_lm)
        # [nph*side, npw*side, H]
        spatial = spatial.transpose(0, 2, 1, 3, 4).reshape(
            nph * side, npw * side, h_lm
        )
        r0, r1, c0, c1 = unpad_bounds(
            nph * side, npw * side, orig_size[0], orig_size[1]
        )
        spatial = spatial[r0:r1, c0:c1]
        rows, cols = spatial.shape[:2]
        nl = np.broadcast_to(
            self._image_newline[None, None, :], (rows, 1, h_lm)
        )
        spatial = np.concatenate([spatial, nl], axis=1).reshape(-1, h_lm)
        return np.concatenate([base, spatial], axis=0)

    def encode_anyres(
        self,
        tiles: np.ndarray,  # [1 + n_tiles, C, S, S] (base first)
        grid: Tuple[int, int],
        orig_size: Tuple[int, int],
    ) -> np.ndarray:
        """Tiles -> packed features [n_rows, H_lm] f32."""
        feats = self.encode_images(tiles)  # [n, side*side, H]
        return self.pack_features(feats, grid, orig_size)


class LlavaOnevisionVLM(LlavaNextVLM):
    """LLaVA-OneVision: the LLaVA-NeXT anyres path with a SigLIP tower
    (feature layer -1, strategy full) and an ``anyres_max_N`` cap — the
    unpadded spatial grid is BILINEARLY downscaled (torch half-pixel
    semantics) when it exceeds N base-tile areas by >10% (HF
    modeling_llava_onevision.pack_image_features)."""

    def __init__(self, model_path: str, dtype: Optional[str] = None) -> None:
        super().__init__(model_path, dtype)
        with open(os.path.join(model_path, "config.json")) as f:
            raw = json.load(f)
        ar = raw.get("vision_aspect_ratio", "anyres_max_9")
        self.max_num_patches = int(str(ar).replace("anyres_max_", ""))

    def pack_features(
        self,
        tile_features: np.ndarray,
        grid: Tuple[int, int],
        orig_size: Tuple[int, int],
    ) -> np.ndarray:
        side = self.side
        h_lm = tile_features.shape[-1]
        base = tile_features[0]
        nph, npw = grid
        spatial = tile_features[1:].reshape(nph, npw, side, side, h_lm)
        spatial = spatial.transpose(0, 2, 1, 3, 4).reshape(
            nph * side, npw * side, h_lm
        )
        r0, r1, c0, c1 = unpad_bounds(
            nph * side, npw * side, orig_size[0], orig_size[1]
        )
        spatial = spatial[r0:r1, c0:c1]
        ch, cw = spatial.shape[:2]
        ratio = math.sqrt(ch * cw / (self.max_num_patches * side**2))
        if ratio > 1.1:
            spatial = _torch_bilinear_resize(
                spatial, int(ch // ratio), int(cw // ratio)
            )
        rows = spatial.shape[0]
        nl = np.broadcast_to(
            self._image_newline[None, None, :], (rows, 1, h_lm)
        )
        spatial = np.concatenate([spatial, nl], axis=1).reshape(-1, h_lm)
        return np.concatenate([base, spatial], axis=0)

# SPDX-License-Identifier: Apache-2.0
"""Qwen3-VL vision tower + deepstack + interleaved M-RoPE (JAX).

The reference's benchmark VLM family (reference
docs/benchmarks/image.md:15-28, served through mlx-vlm). Architecture
(HF ``Qwen3VLVisionModel`` / ``Qwen3VLTextModel`` parity,
transformers/models/qwen3_vl/modeling_qwen3_vl.py):

* dynamic-resolution ViT: Conv3d patch embed (+bias), LEARNED position
  embeddings bilinearly interpolated from a ``num_grid_per_side``² grid
  onto each image's grid, 2-D rotary from (row, col) coords, LayerNorm
  blocks with fused-qkv attention and a plain GELU MLP, full attention
  within each frame (no window attention);
* deepstack: features tapped at ``deepstack_visual_indexes`` ViT layers
  pass through their own post-shuffle mergers and are ADDED to the LM
  hidden states after decoder layers 0..n-1 at visual rows;
* interleaved M-RoPE in the decoder: rotary channels cycle
  [T H W T H W ...] (ops/layers.rope_cos_sin mrope_interleaved);
* videos position as per-frame grids (t=1 each) separated by timestamp
  text — HF get_rope_index's "timestamps rather than absolute time".

TPU mapping mirrors models/qwen_vl.py: host numpy does the grid
bookkeeping; the device program is dense MXU matmuls + segment-masked
attention, compiled once per patch count.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.layers import apply_rope, linear
from .qwen_vl import compute_mrope_positions

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


@dataclass
class Qwen3VLVisionConfig:
    depth: int = 27
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 16
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    out_hidden_size: int = 3584
    num_position_embeddings: int = 2304
    deepstack_visual_indexes: Tuple[int, ...] = (8, 16, 24)
    hidden_act: str = "gelu_pytorch_tanh"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size**2

    @property
    def num_grid_per_side(self) -> int:
        return int(self.num_position_embeddings**0.5)

    @classmethod
    def from_hf_config(cls, cfg: Dict[str, Any]) -> "Qwen3VLVisionConfig":
        return cls(
            depth=cfg.get("depth", 27),
            hidden_size=cfg.get("hidden_size", 1152),
            intermediate_size=cfg.get("intermediate_size", 4304),
            num_heads=cfg.get("num_heads", 16),
            in_channels=cfg.get("in_channels", 3),
            patch_size=cfg.get("patch_size", 16),
            temporal_patch_size=cfg.get("temporal_patch_size", 2),
            spatial_merge_size=cfg.get("spatial_merge_size", 2),
            out_hidden_size=cfg.get("out_hidden_size", 3584),
            num_position_embeddings=cfg.get("num_position_embeddings", 2304),
            deepstack_visual_indexes=tuple(
                cfg.get("deepstack_visual_indexes", (8, 16, 24))
            ),
            hidden_act=cfg.get("hidden_act", "gelu_pytorch_tanh"),
        )


# ------------------------------------------------------------------ host prep
def _merge_order_rowcol(t: int, h: int, w: int, merge: int) -> np.ndarray:
    """(row, col) per patch in spatial-merge-group order (HF
    ``rot_pos_emb``: blocks outer, intra-block inner, tiled over t)."""
    bh, bw = h // merge, w // merge
    rows = (
        np.arange(bh)[:, None, None, None] * merge
        + np.arange(merge)[None, None, :, None]
    )
    cols = (
        np.arange(bw)[None, :, None, None] * merge
        + np.arange(merge)[None, None, None, :]
    )
    rows = np.broadcast_to(rows, (bh, bw, merge, merge)).reshape(-1)
    cols = np.broadcast_to(cols, (bh, bw, merge, merge)).reshape(-1)
    pair = np.stack([rows, cols], axis=-1)
    return np.tile(pair, (t, 1)).astype(np.int32)


def _pos_embed_interp_idx(
    grid: Tuple[int, int, int], side: int, merge: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Bilinear interpolation (indices [4, t*h*w], weights [4, t*h*w])
    into the learned pos-embed table, already permuted to merge-group
    order (HF ``fast_pos_embed_interpolate``)."""
    t, h, w = grid
    h_idxs = np.linspace(0, side - 1, h, dtype=np.float32)
    w_idxs = np.linspace(0, side - 1, w, dtype=np.float32)
    h_floor = h_idxs.astype(np.int32)
    w_floor = w_idxs.astype(np.int32)
    h_ceil = np.clip(h_floor + 1, None, side - 1)
    w_ceil = np.clip(w_floor + 1, None, side - 1)
    dh = h_idxs - h_floor
    dw = w_idxs - w_floor
    base_h = h_floor * side
    base_h_ceil = h_ceil * side
    idx = np.stack(
        [
            (base_h[:, None] + w_floor[None, :]).reshape(-1),
            (base_h[:, None] + w_ceil[None, :]).reshape(-1),
            (base_h_ceil[:, None] + w_floor[None, :]).reshape(-1),
            (base_h_ceil[:, None] + w_ceil[None, :]).reshape(-1),
        ]
    )
    wts = np.stack(
        [
            ((1 - dh)[:, None] * (1 - dw)[None, :]).reshape(-1),
            ((1 - dh)[:, None] * dw[None, :]).reshape(-1),
            (dh[:, None] * (1 - dw)[None, :]).reshape(-1),
            (dh[:, None] * dw[None, :]).reshape(-1),
        ]
    ).astype(np.float32)
    # permute h*w raster order -> merge-group order, tile over t
    perm = (
        np.arange(h * w)
        .reshape(h // merge, merge, w // merge, merge)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )
    idx = idx[:, perm]
    wts = wts[:, perm]
    idx = np.tile(idx, (1, t))
    wts = np.tile(wts, (1, t))
    return idx.astype(np.int32), wts


def _frame_segments(grid_thw: Sequence[Tuple[int, int, int]]) -> np.ndarray:
    seg = []
    sid = 0
    for t, h, w in grid_thw:
        for _ in range(t):
            seg.extend([sid] * (h * w))
            sid += 1
    return np.asarray(seg, np.int32)


def prepare_vision_inputs(
    cfg: Qwen3VLVisionConfig,
    flatten_patches: np.ndarray,  # [N, C*tp*p*p] in merge-group order
    grid_thw: Sequence[Tuple[int, int, int]],
) -> Dict[str, np.ndarray]:
    n = flatten_patches.shape[0]
    pos = np.concatenate(
        [_merge_order_rowcol(t, h, w, cfg.spatial_merge_size)
         for t, h, w in grid_thw]
    )
    # rotary table: dim head_dim//2 split half row / half col
    dim = cfg.head_dim // 2
    inv_freq = 1.0 / (
        10000.0 ** (np.arange(0, dim, 2, dtype=np.float32) / dim)
    )
    angles = pos[:, :, None].astype(np.float32) * inv_freq[None, None, :]
    angles = angles.reshape(n, -1)  # [N, head_dim//2]
    idxs, wts = zip(
        *(
            _pos_embed_interp_idx(g, cfg.num_grid_per_side,
                                  cfg.spatial_merge_size)
            for g in grid_thw
        )
    )
    return {
        "patches": np.ascontiguousarray(flatten_patches, dtype=np.float32),
        "cos": np.cos(angles),
        "sin": np.sin(angles),
        "seg": _frame_segments(grid_thw),
        "pos_idx": np.concatenate(idxs, axis=1),
        "pos_w": np.concatenate(wts, axis=1),
    }


# -------------------------------------------------------------- device encode
def _layer_norm(x, w, b, eps: float = 1e-6):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (
        (xf - mean) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
        + b.astype(jnp.float32)
    ).astype(x.dtype)


def _attn(x, p, cfg: Qwen3VLVisionConfig, cos, sin, seg):
    n = x.shape[0]
    h = cfg.num_heads
    hd = cfg.head_dim
    qkv = linear(x, p["qkv_w"], p["qkv_b"])
    q, k, v = (
        qkv[:, : h * hd],
        qkv[:, h * hd : 2 * h * hd],
        qkv[:, 2 * h * hd :],
    )
    q = apply_rope(q.reshape(n, h, hd), cos, sin)
    k = apply_rope(k.reshape(n, h, hd), cos, sin)
    v = v.reshape(n, h, hd)
    scores = jnp.einsum(
        "qhd,khd->hqk", q, k, preferred_element_type=jnp.float32
    ) * (hd**-0.5)
    mask = seg[:, None] == seg[None, :]
    scores = jnp.where(mask[None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    ctx = (
        jnp.einsum("hqk,khd->qhd", probs, v,
                   preferred_element_type=jnp.float32)
        .reshape(n, h * hd)
        .astype(x.dtype)
    )
    return linear(ctx, p["proj_w"], p["proj_b"])


def _mlp(x, p, act: str):
    y = linear(x, p["fc1_w"], p["fc1_b"]).astype(jnp.float32)
    y = jax.nn.gelu(y, approximate=(act == "gelu_pytorch_tanh"))
    return linear(y.astype(x.dtype), p["fc2_w"], p["fc2_b"])


def _merger(x, m, unit: int, hidden: int, postshuffle: bool):
    if postshuffle:
        x = x.reshape(-1, hidden * unit)
        x = _layer_norm(x, m["ln_w"], m["ln_b"])
    else:
        x = _layer_norm(x, m["ln_w"], m["ln_b"])
        x = x.reshape(-1, hidden * unit)
    x = linear(x, m["fc1_w"], m["fc1_b"])
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
    return linear(x, m["fc2_w"], m["fc2_b"])


def vision_encode(
    params: Params,
    cfg: Qwen3VLVisionConfig,
    patches: jax.Array,  # [N, C*tp*p*p]
    cos: jax.Array,  # [N, head_dim//2]
    sin: jax.Array,
    seg: jax.Array,  # [N] frame segment ids
    pos_idx: jax.Array,  # [4, N]
    pos_w: jax.Array,  # [4, N]
) -> Tuple[jax.Array, jax.Array]:
    """-> (features [N/unit, out_hidden],
           deepstack [n_ds, N/unit, out_hidden])."""
    x = linear(patches, params["patch_embed"], params.get("patch_embed_b"))
    pe = params["pos_embed"]  # [side*side, hidden]
    interp = (
        pe[pos_idx[0]] * pos_w[0][:, None]
        + pe[pos_idx[1]] * pos_w[1][:, None]
        + pe[pos_idx[2]] * pos_w[2][:, None]
        + pe[pos_idx[3]] * pos_w[3][:, None]
    )
    x = x + interp.astype(x.dtype)
    ds_feats = []
    for i, p in enumerate(params["blocks"]):
        h = _layer_norm(x, p["norm1_w"], p["norm1_b"])
        x = x + _attn(h, p, cfg, cos, sin, seg)
        h = _layer_norm(x, p["norm2_w"], p["norm2_b"])
        x = x + _mlp(h, p, cfg.hidden_act)
        if i in cfg.deepstack_visual_indexes:
            k = cfg.deepstack_visual_indexes.index(i)
            ds_feats.append(
                _merger(
                    x,
                    params["ds_mergers"][k],
                    cfg.merge_unit,
                    cfg.hidden_size,
                    postshuffle=True,
                )
            )
    out = _merger(
        x, params["merger"], cfg.merge_unit, cfg.hidden_size,
        postshuffle=False,
    )
    return out, jnp.stack(ds_feats) if ds_feats else jnp.zeros(
        (0,) + out.shape, out.dtype
    )


# -------------------------------------------------------------- weight loading
def load_qwen3_vl_vision_params(
    tensors: Dict[str, np.ndarray], cfg: Qwen3VLVisionConfig, dtype=jnp.float32
) -> Params:
    """Map HF ``visual.``-prefixed tensors (names relative to visual.)."""
    blocks: List[Dict] = [dict() for _ in range(cfg.depth)]
    ds: List[Dict] = [dict() for _ in cfg.deepstack_visual_indexes]
    params: Params = {"blocks": blocks, "merger": {}, "ds_mergers": ds}

    def put(t):
        return jnp.asarray(np.asarray(t)).astype(dtype)

    merger_keys = {
        "norm.weight": "ln_w",
        "norm.bias": "ln_b",
        "linear_fc1.weight": "fc1_w",
        "linear_fc1.bias": "fc1_b",
        "linear_fc2.weight": "fc2_w",
        "linear_fc2.bias": "fc2_b",
    }
    for name, t in tensors.items():
        if name == "patch_embed.proj.weight":
            params["patch_embed"] = put(
                np.asarray(t).reshape(np.asarray(t).shape[0], -1)
            )
        elif name == "patch_embed.proj.bias":
            params["patch_embed_b"] = put(t)
        elif name == "pos_embed.weight":
            params["pos_embed"] = put(t)
        elif name.startswith("merger."):
            key = merger_keys.get(name[len("merger."):])
            if key:
                params["merger"][key] = put(t)
        elif name.startswith("deepstack_merger_list."):
            parts = name.split(".")
            k = int(parts[1])
            key = merger_keys.get(".".join(parts[2:]))
            if key:
                ds[k][key] = put(t)
        elif name.startswith("blocks."):
            parts = name.split(".")
            i = int(parts[1])
            rest = ".".join(parts[2:])
            key = {
                "norm1.weight": "norm1_w",
                "norm1.bias": "norm1_b",
                "norm2.weight": "norm2_w",
                "norm2.bias": "norm2_b",
                "attn.qkv.weight": "qkv_w",
                "attn.qkv.bias": "qkv_b",
                "attn.proj.weight": "proj_w",
                "attn.proj.bias": "proj_b",
                "mlp.linear_fc1.weight": "fc1_w",
                "mlp.linear_fc1.bias": "fc1_b",
                "mlp.linear_fc2.weight": "fc2_w",
                "mlp.linear_fc2.bias": "fc2_b",
            }.get(rest)
            if key:
                blocks[i][key] = put(t)
    return params


# ------------------------------------------------------------------ the model
class Qwen3VLModel:
    """Qwen3-VL: deepstack vision encode + interleaved-M-RoPE prompt
    construction, served through the unified engine's embeds-override
    rows plus per-layer deepstack additions (same interface as
    models/qwen_vl.QwenVLModel with an extra deepstack return)."""

    def __init__(self, model_path: str, dtype: Optional[str] = None) -> None:
        self.model_path = model_path
        self._dtype = dtype
        self._loaded = False

    def load(self) -> "Qwen3VLModel":
        if self._loaded:
            return self
        from . import loader

        with open(os.path.join(self.model_path, "config.json")) as f:
            cfg = json.load(f)
        text_cfg = cfg.get("text_config") or cfg
        self.cfg = ModelConfig.from_hf_config(text_cfg)
        self.cfg.mrope_interleaved = True
        if self.cfg.mrope_section is None:
            rs = (text_cfg.get("rope_scaling") or {}).get("mrope_section")
            self.cfg.mrope_section = list(rs) if rs else [24, 20, 20]
        self.vision_cfg = Qwen3VLVisionConfig.from_hf_config(
            cfg.get("vision_config", {})
        )
        self.cfg.num_deepstack_layers = len(
            self.vision_cfg.deepstack_visual_indexes
        )
        self.image_token_id = cfg.get("image_token_id", 151655)
        self.video_token_id = cfg.get("video_token_id", 151656)
        self.vision_start_token_id = cfg.get("vision_start_token_id", 151652)

        jdt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            self._dtype or self.cfg.dtype
        ]
        vision_tensors: Dict[str, np.ndarray] = {}
        for name, tensor in loader.iter_safetensors(self.model_path):
            if ".visual." in name or name.startswith("visual."):
                vision_tensors[name.split("visual.", 1)[1]] = tensor
        self.vision_params = load_qwen3_vl_vision_params(
            vision_tensors, self.vision_cfg, dtype=jdt
        )
        self.params = loader.load_params(
            self.model_path, self.cfg, dtype=self._dtype
        )
        self._encode_jits: Dict[int, Any] = {}
        self._loaded = True
        return self

    @property
    def text_config(self) -> ModelConfig:
        return self.cfg

    @property
    def lm_params(self) -> Params:
        return self.params

    # --------------------------------------------------------------- encoding
    def encode_media(
        self, flatten_patches: np.ndarray, grid_thw: Tuple[int, int, int]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """One image/video clip -> (features [rows, H],
        deepstack [n_ds, rows, H]) float32, merge-group row order
        (which IS the LM placeholder order)."""
        prep = prepare_vision_inputs(
            self.vision_cfg, flatten_patches, [grid_thw]
        )
        n = prep["patches"].shape[0]
        fn = self._encode_jits.get(n)
        if fn is None:
            fn = jax.jit(partial(vision_encode, cfg=self.vision_cfg))
            self._encode_jits[n] = fn
        out, ds = fn(
            self.vision_params,
            patches=jnp.asarray(prep["patches"]),
            cos=jnp.asarray(prep["cos"]),
            sin=jnp.asarray(prep["sin"]),
            seg=jnp.asarray(prep["seg"]),
            pos_idx=jnp.asarray(prep["pos_idx"]),
            pos_w=jnp.asarray(prep["pos_w"]),
        )
        return np.asarray(out, np.float32), np.asarray(ds, np.float32)

    # --------------------------------------------------------- prompt building
    def build_multimodal_prompt(
        self,
        token_ids: List[int],
        media_features: List[Tuple[np.ndarray, np.ndarray]],
        media_grids: List[Tuple[int, int, int]],
        second_per_grid_ts: Optional[List[float]] = None,
    ) -> Tuple[List[int], np.ndarray, np.ndarray, np.ndarray, int, np.ndarray]:
        """Expand placeholders; compute interleaved-mrope positions with
        per-frame temporal grids (HF Qwen3VL get_rope_index splits video
        grids into t=1 frames). Returns (ids, embeds [T,H], mask [T],
        positions [3,T], delta, deepstack [n_ds, T, H])."""
        h = self.cfg.hidden_size
        n_ds = self.cfg.num_deepstack_layers
        out_ids: List[int] = []
        rows: List[Optional[Tuple[np.ndarray, np.ndarray]]] = []
        media: List[Dict[str, Any]] = []
        mi = 0
        for tid in token_ids:
            if (
                tid in (self.image_token_id, self.video_token_id)
                and mi < len(media_features)
            ):
                feats, ds = media_features[mi]
                grid = media_grids[mi]
                mi += 1
                # Qwen3-VL positions treat every temporal slice as its
                # own t=1 grid (timestamp text separates frames)
                t = grid[0]
                for _ in range(t):
                    media.append({"grid": (1, grid[1], grid[2])})
                for r in range(feats.shape[0]):
                    out_ids.append(tid)
                    rows.append((feats[r], ds[:, r] if n_ds else None))
            else:
                out_ids.append(tid)
                rows.append(None)
        embeds = np.zeros((len(out_ids), h), np.float32)
        mask = np.zeros(len(out_ids), bool)
        deepstack = np.zeros((n_ds, len(out_ids), h), np.float32)
        for i, r in enumerate(rows):
            if r is not None:
                embeds[i] = r[0]
                mask[i] = True
                if r[1] is not None:
                    deepstack[:, i] = r[1]
        positions, delta = compute_mrope_positions(
            out_ids,
            media,
            self.image_token_id,
            self.video_token_id,
            self.vision_cfg.spatial_merge_size,
            tokens_per_second=0.0,  # Qwen3: timestamps, not absolute time
        )
        return out_ids, embeds, mask, positions, delta, deepstack


def is_qwen3_vl_config(cfg: Dict[str, Any]) -> bool:
    return cfg.get("model_type", "") in ("qwen3_vl", "qwen3_vl_moe")

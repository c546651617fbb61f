# SPDX-License-Identifier: Apache-2.0
"""Qwen2-VL / Qwen2.5-VL vision tower + M-RoPE multimodal model (JAX).

The reference serves Qwen-VL checkpoints through mlx-vlm (reference
models/mllm.py:1207 ``MLXMultimodalLM``); the TPU build owns the tower.
Architecture (HF ``Qwen2_5_VisionTransformerPretrainedModel`` parity):

* naive-dynamic-resolution ViT over flattened ``temporal×patch×patch``
  patches with 2-D rotary embeddings derived from each patch's (h, w)
  grid coordinates;
* window attention (Qwen2.5) — patches are permuted into
  ``window_size``-aligned groups host-side and attend within
  block-diagonal segments; designated ``fullatt_block_indexes`` layers
  attend across the whole frame;
* a 2×2 spatial-merge MLP projector into the LM embedding space;
* M-RoPE in the decoder: rotary channels are split into
  (temporal, height, width) sections (see ops/layers.rope_cos_sin);
  text tokens after the prompt advance all three components equally, so
  the serving engine's decode path stays 1-D with a per-slot delta.

TPU mapping: the permutation / segment bookkeeping is tiny host numpy;
the device program is dense MXU matmuls + segment-masked attention, one
compiled variant per patch count (images are encoded once and cached by
content hash, so recompiles are rare in serving).
"""

from __future__ import annotations

import json
import logging
import math
import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.layers import apply_rope, linear, rms_norm

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


@dataclass
class QwenVLVisionConfig:
    variant: str = "qwen2_5"  # "qwen2_5" (RMSNorm+SwiGLU+windows) | "qwen2"
    depth: int = 32
    hidden_size: int = 1280
    intermediate_size: int = 3420
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    out_hidden_size: int = 3584
    window_size: int = 112
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    hidden_act: str = "silu"
    tokens_per_second: float = 2.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size**2

    @classmethod
    def from_hf_config(cls, cfg: Dict[str, Any], text_hidden: int) -> "QwenVLVisionConfig":
        mt = cfg.get("model_type", "qwen2_5_vl")
        if "2_5" in mt or cfg.get("fullatt_block_indexes") is not None:
            return cls(
                variant="qwen2_5",
                depth=cfg.get("depth", 32),
                hidden_size=cfg.get("hidden_size", 1280),
                intermediate_size=cfg.get("intermediate_size", 3420),
                num_heads=cfg.get("num_heads", 16),
                in_channels=cfg.get("in_channels", cfg.get("in_chans", 3)),
                patch_size=cfg.get("patch_size", 14),
                temporal_patch_size=cfg.get("temporal_patch_size", 2),
                spatial_merge_size=cfg.get("spatial_merge_size", 2),
                out_hidden_size=cfg.get("out_hidden_size", text_hidden),
                window_size=cfg.get("window_size", 112),
                fullatt_block_indexes=tuple(
                    cfg.get("fullatt_block_indexes", (7, 15, 23, 31))
                ),
                hidden_act=cfg.get("hidden_act", "silu"),
                tokens_per_second=cfg.get("tokens_per_second", 2.0),
            )
        # Qwen2-VL: LayerNorm blocks, quick-gelu MLP, full attention everywhere
        embed_dim = cfg.get("embed_dim", 1280)
        return cls(
            variant="qwen2",
            depth=cfg.get("depth", 32),
            hidden_size=embed_dim,
            intermediate_size=int(embed_dim * cfg.get("mlp_ratio", 4.0)),
            num_heads=cfg.get("num_heads", 16),
            in_channels=cfg.get("in_channels", cfg.get("in_chans", 3)),
            patch_size=cfg.get("patch_size", 14),
            temporal_patch_size=cfg.get("temporal_patch_size", 2),
            spatial_merge_size=cfg.get("spatial_merge_size", 2),
            out_hidden_size=cfg.get("hidden_size", text_hidden),
            window_size=0,  # no window attention
            fullatt_block_indexes=tuple(range(cfg.get("depth", 32))),
            hidden_act=cfg.get("hidden_act", "quick_gelu"),
        )


# ------------------------------------------------------------------ host prep
def rot_pos_ids(grid_thw: Sequence[Tuple[int, int, int]], merge: int) -> np.ndarray:
    """(h, w) grid coordinate per patch, in spatial-merge-group order
    (HF ``rot_pos_emb``). Returns [total_patches, 2] int32."""
    out = []
    for t, h, w in grid_thw:
        hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
        hpos = (
            hpos.reshape(h // merge, merge, w // merge, merge)
            .transpose(0, 2, 1, 3)
            .reshape(-1)
        )
        wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))
        wpos = (
            wpos.reshape(h // merge, merge, w // merge, merge)
            .transpose(0, 2, 1, 3)
            .reshape(-1)
        )
        pair = np.stack([hpos, wpos], axis=-1)
        out.append(np.tile(pair, (t, 1)))
    return np.concatenate(out, axis=0).astype(np.int32)


def window_index(
    grid_thw: Sequence[Tuple[int, int, int]], cfg: QwenVLVisionConfig
) -> Tuple[np.ndarray, np.ndarray]:
    """Window-attention permutation of spatial-merge groups + per-patch
    window segment ids (HF ``get_window_index``; cu_window_seqlens is
    converted to segment ids for TPU-friendly masking).

    Returns (index [n_groups] int32 — merge-group gather order,
             win_seg [total_patches] int32 — window id in permuted order).
    """
    merge = cfg.spatial_merge_size
    unit = cfg.merge_unit
    vit_ws = max(1, cfg.window_size // merge // cfg.patch_size)
    indices: List[np.ndarray] = []
    seqlens: List[int] = []
    base = 0
    for t, h, w in grid_thw:
        lh, lw = h // merge, w // merge
        idx = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h = (-lh) % vit_ws
        pad_w = (-lw) % vit_ws
        nh, nw = (lh + pad_h) // vit_ws, (lw + pad_w) // vit_ws
        padded = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
        padded[:, :lh, :lw] = idx
        padded = padded.reshape(t, nh, vit_ws, nw, vit_ws)
        padded = padded.transpose(0, 1, 3, 2, 4).reshape(
            t, nh * nw, vit_ws, vit_ws
        )
        lens = (padded != -100).sum(axis=(2, 3)).reshape(-1)
        flat = padded.reshape(-1)
        indices.append(flat[flat != -100] + base)
        seqlens.extend(int(x) for x in lens if x > 0)
        base += t * lh * lw
    index = np.concatenate(indices).astype(np.int32)
    win_seg = np.repeat(
        np.arange(len(seqlens), dtype=np.int32),
        np.asarray(seqlens, np.int64) * unit,
    )
    return index, win_seg


def full_segments(grid_thw: Sequence[Tuple[int, int, int]]) -> np.ndarray:
    """Frame segment id per patch in NATURAL order (full-attention
    layers attend within each frame: grid_h*grid_w patches per t)."""
    seg = []
    sid = 0
    for t, h, w in grid_thw:
        for _ in range(t):
            seg.extend([sid] * (h * w))
            sid += 1
    return np.asarray(seg, np.int32)


def _vision_inv_freq(head_dim: int, theta: float = 10000.0) -> np.ndarray:
    dim = head_dim // 2
    return 1.0 / (
        theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim)
    )


def prepare_vision_inputs(
    cfg: QwenVLVisionConfig,
    flatten_patches: np.ndarray,  # [N, C*tp*p*p]
    grid_thw: Sequence[Tuple[int, int, int]],
) -> Dict[str, np.ndarray]:
    """Host-side bookkeeping for one encode call: permute patches into
    window order, cos/sin tables, segment ids, inverse permutation."""
    n = flatten_patches.shape[0]
    unit = cfg.merge_unit
    pos = rot_pos_ids(grid_thw, cfg.spatial_merge_size)  # [N, 2]
    inv_freq = _vision_inv_freq(cfg.head_dim)
    angles = pos[:, :, None].astype(np.float32) * inv_freq[None, None, :]
    angles = angles.reshape(n, -1)  # [N, head_dim//2]

    index, win_seg = window_index(grid_thw, cfg)
    # expand merge-group permutation to patch rows
    patch_perm = (
        index[:, None] * unit + np.arange(unit)[None, :]
    ).reshape(-1)
    fseg = full_segments(grid_thw)[patch_perm]
    return {
        "patches": np.ascontiguousarray(
            flatten_patches[patch_perm], dtype=np.float32
        ),
        "cos": np.cos(angles[patch_perm]),
        "sin": np.sin(angles[patch_perm]),
        "full_seg": fseg,
        "win_seg": win_seg,
        "inverse": np.argsort(index).astype(np.int32),
    }


# -------------------------------------------------------------- device encode
def _seg_attention(
    x: jax.Array,
    p: Params,
    cfg: QwenVLVisionConfig,
    cos: jax.Array,
    sin: jax.Array,
    seg: jax.Array,
) -> jax.Array:
    n = x.shape[0]
    h = cfg.num_heads
    hd = cfg.head_dim
    qkv = linear(x, p["qkv_w"], p["qkv_b"])  # [N, 3D]
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
    ctx = jnp.einsum(
        "hqk,khd->qhd", probs, v, preferred_element_type=jnp.float32
    ).reshape(n, h * hd).astype(x.dtype)
    return linear(ctx, p["proj_w"], p["proj_b"])


def _vision_norm(x, w, b, variant: str, eps: float = 1e-6):
    if variant == "qwen2_5":
        return rms_norm(x, w, eps)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _vision_mlp(x, p, cfg: QwenVLVisionConfig):
    if cfg.variant == "qwen2_5":  # SwiGLU with bias
        g = linear(x, p["gate_w"], p["gate_b"]).astype(jnp.float32)
        u = linear(x, p["up_w"], p["up_b"]).astype(jnp.float32)
        return linear(
            (jax.nn.silu(g) * u).astype(x.dtype), p["down_w"], p["down_b"]
        )
    y = linear(x, p["fc1_w"], p["fc1_b"]).astype(jnp.float32)
    y = (y * jax.nn.sigmoid(1.702 * y)).astype(x.dtype)  # quick_gelu
    return linear(y, p["fc2_w"], p["fc2_b"])


def vision_encode(
    params: Params,
    cfg: QwenVLVisionConfig,
    patches: jax.Array,  # [N, C*tp*p*p] window-permuted
    cos: jax.Array,  # [N, head_dim//2]
    sin: jax.Array,
    full_seg: jax.Array,  # [N]
    win_seg: jax.Array,  # [N]
) -> jax.Array:
    """Window-permuted patches -> merged features [N/unit, out_hidden]."""
    x = linear(patches, params["patch_embed"]).astype(jnp.float32)
    x = x.astype(patches.dtype)
    for i, p in enumerate(params["blocks"]):
        seg = full_seg if i in cfg.fullatt_block_indexes else win_seg
        h = _vision_norm(x, p["norm1_w"], p.get("norm1_b"), cfg.variant)
        x = x + _seg_attention(h, p, cfg, cos, sin, seg)
        h = _vision_norm(x, p["norm2_w"], p.get("norm2_b"), cfg.variant)
        x = x + _vision_mlp(h, p, cfg)
    m = params["merger"]
    x = _vision_norm(x, m["ln_w"], m.get("ln_b"), cfg.variant)
    x = x.reshape(-1, cfg.hidden_size * cfg.merge_unit)
    x = linear(x, m["fc1_w"], m["fc1_b"])
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
    return linear(x, m["fc2_w"], m["fc2_b"])


# -------------------------------------------------------------- weight loading
def load_qwen_vl_vision_params(
    tensors: Dict[str, np.ndarray], cfg: QwenVLVisionConfig, dtype=jnp.float32
) -> Params:
    """Map HF ``visual.``-prefixed tensors (names relative to visual.)."""
    blocks: List[Dict] = [dict() for _ in range(cfg.depth)]
    params: Params = {"blocks": blocks, "merger": {}}

    def put(t):
        return jnp.asarray(np.asarray(t)).astype(dtype)

    for name, t in tensors.items():
        if name == "patch_embed.proj.weight":
            params["patch_embed"] = put(
                np.asarray(t).reshape(np.asarray(t).shape[0], -1)
            )
        elif name.startswith("merger."):
            key = {
                "merger.ln_q.weight": "ln_w",
                "merger.ln_q.bias": "ln_b",
                "merger.mlp.0.weight": "fc1_w",
                "merger.mlp.0.bias": "fc1_b",
                "merger.mlp.2.weight": "fc2_w",
                "merger.mlp.2.bias": "fc2_b",
            }.get(name)
            if key:
                params["merger"][key] = put(t)
        elif name.startswith("blocks."):
            parts = name.split(".")
            i = int(parts[1])
            rest = ".".join(parts[2:])
            d = cfg.hidden_size
            if rest == "attn.qkv.weight":
                w = np.asarray(t)
                blocks[i]["qkv_w"] = put(w)
            elif rest == "attn.qkv.bias":
                blocks[i]["qkv_b"] = put(t)
            else:
                key = {
                    "norm1.weight": "norm1_w",
                    "norm1.bias": "norm1_b",
                    "norm2.weight": "norm2_w",
                    "norm2.bias": "norm2_b",
                    "attn.proj.weight": "proj_w",
                    "attn.proj.bias": "proj_b",
                    "mlp.gate_proj.weight": "gate_w",
                    "mlp.gate_proj.bias": "gate_b",
                    "mlp.up_proj.weight": "up_w",
                    "mlp.up_proj.bias": "up_b",
                    "mlp.down_proj.weight": "down_w",
                    "mlp.down_proj.bias": "down_b",
                    "mlp.fc1.weight": "fc1_w",
                    "mlp.fc1.bias": "fc1_b",
                    "mlp.fc2.weight": "fc2_w",
                    "mlp.fc2.bias": "fc2_b",
                }.get(rest)
                if key:
                    blocks[i][key] = put(t)
    return params


# --------------------------------------------------------------- M-RoPE index
def compute_mrope_positions(
    token_ids: Sequence[int],
    media: List[Dict[str, Any]],
    image_token_id: int,
    video_token_id: int,
    merge: int,
    tokens_per_second: float = 0.0,
) -> Tuple[np.ndarray, int]:
    """(t, h, w) position per token of an EXPANDED multimodal prompt +
    the decode position delta (HF ``get_rope_index`` semantics,
    modeling_qwen2_5_vl.py:956).

    ``media``: ordered dicts {"grid": (t, h, w), "second_per_grid_t":
    float} for each image/video, matching placeholder runs in order.
    """
    ids = np.asarray(token_ids, np.int64)
    n = len(ids)
    out = np.zeros((3, n), np.int32)
    st = 0  # cursor into ids
    st_idx = 0  # next position start
    mi = 0
    is_media = (ids == image_token_id) | (ids == video_token_id)
    while st < n:
        if not is_media[st] or mi >= len(media):
            # text run (placeholder tokens beyond the supplied media —
            # e.g. a literal "<|image_pad|>" typed in the prompt — were
            # never expanded and position like ordinary text)
            ed = st
            while ed < n and (not is_media[ed] or mi >= len(media)):
                ed += 1
            out[:, st:ed] = np.arange(st_idx, st_idx + (ed - st))
            st_idx += ed - st
            st = ed
            continue
        m = media[mi]
        mi += 1
        t, h, w = m["grid"]
        lh, lw = h // merge, w // merge
        count = t * lh * lw
        if ids[st] == video_token_id:
            if tokens_per_second:  # Qwen2.5-VL absolute-time alignment
                # HF casts second_per_grid_t to the position dtype (int64)
                # BEFORE multiplying (modeling_qwen2_5_vl.py:1147) — mirror
                # the truncation for exact parity.
                spg = float(int(m.get("second_per_grid_t", 1.0)))
                t_index = (
                    np.arange(t, dtype=np.float64) * spg * tokens_per_second
                ).astype(np.int64)
            else:  # Qwen2-VL: raw temporal-patch index
                t_index = np.arange(t, dtype=np.int64)
        else:
            t_index = np.zeros(t, np.int64)
        tpos = np.repeat(t_index, lh * lw)
        hpos = np.tile(np.repeat(np.arange(lh), lw), t)
        wpos = np.tile(np.arange(lw), t * lh)
        out[0, st : st + count] = tpos + st_idx
        out[1, st : st + count] = hpos + st_idx
        out[2, st : st + count] = wpos + st_idx
        st_idx = int(out[:, st : st + count].max()) + 1
        st += count
    delta = int(out.max()) + 1 - n if n else 0
    return out, delta


# ------------------------------------------------------------------ the model
class QwenVLModel:
    """Qwen2-VL / Qwen2.5-VL: dynamic-resolution vision encode + M-RoPE
    prompt construction, served through the unified engine's
    embeds-override rows (same interface as models/mllm.MultimodalLM)."""

    def __init__(self, model_path: str, dtype: Optional[str] = None) -> None:
        self.model_path = model_path
        self._dtype = dtype
        self._loaded = False

    def load(self) -> "QwenVLModel":
        if self._loaded:
            return self
        from . import loader

        with open(os.path.join(self.model_path, "config.json")) as f:
            cfg = json.load(f)
        text_cfg = cfg.get("text_config") or cfg
        self.text_cfg_raw = dict(text_cfg)
        self.cfg = ModelConfig.from_hf_config(text_cfg)
        if self.cfg.mrope_section is None:
            rs = (cfg.get("rope_scaling") or {}).get("mrope_section")
            if rs:
                self.cfg.mrope_section = list(rs)
        self.vision_cfg = QwenVLVisionConfig.from_hf_config(
            cfg.get("vision_config", {}), self.cfg.hidden_size
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
        self.vision_params = load_qwen_vl_vision_params(
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
    ) -> np.ndarray:
        """One image/video clip -> merged features
        [t*h*w/merge_unit, out_hidden] float32 (natural spatial order)."""
        prep = prepare_vision_inputs(
            self.vision_cfg, flatten_patches, [grid_thw]
        )
        n = prep["patches"].shape[0]
        fn = self._encode_jits.get(n)
        if fn is None:
            fn = jax.jit(partial(vision_encode, cfg=self.vision_cfg))
            self._encode_jits[n] = fn
        out = fn(
            self.vision_params,
            patches=jnp.asarray(prep["patches"]),
            cos=jnp.asarray(prep["cos"]),
            sin=jnp.asarray(prep["sin"]),
            full_seg=jnp.asarray(prep["full_seg"]),
            win_seg=jnp.asarray(prep["win_seg"]),
        )
        out = np.asarray(out, np.float32)
        return out[prep["inverse"]]

    # --------------------------------------------------------- prompt building
    def build_multimodal_prompt(
        self,
        token_ids: List[int],
        media_features: List[np.ndarray],  # per media [rows, H] merged
        media_grids: List[Tuple[int, int, int]],
        media_is_video: Optional[List[bool]] = None,
        second_per_grid_ts: Optional[List[float]] = None,
    ) -> Tuple[List[int], np.ndarray, np.ndarray, np.ndarray, int]:
        """Expand each image/video placeholder token into its merged-row
        count carrying the features, and compute M-RoPE positions.

        Returns (expanded_ids, prompt_embeds [T,H], embeds_mask [T],
        mrope_positions [3,T], mrope_delta)."""
        h = self.cfg.hidden_size
        out_ids: List[int] = []
        rows: List[Optional[np.ndarray]] = []
        media: List[Dict[str, Any]] = []
        mi = 0
        for tid in token_ids:
            if (
                tid in (self.image_token_id, self.video_token_id)
                and mi < len(media_features)
            ):
                feats = media_features[mi]
                grid = media_grids[mi]
                spg = (
                    second_per_grid_ts[mi]
                    if second_per_grid_ts is not None
                    else 1.0
                )
                mi += 1
                media.append({"grid": grid, "second_per_grid_t": spg})
                for r in range(feats.shape[0]):
                    out_ids.append(tid)
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
        tps = (
            self.vision_cfg.tokens_per_second
            if self.vision_cfg.variant == "qwen2_5"
            else 0.0
        )
        positions, delta = compute_mrope_positions(
            out_ids,
            media,
            self.image_token_id,
            self.video_token_id,
            self.vision_cfg.spatial_merge_size,
            tokens_per_second=tps,
        )
        return out_ids, embeds, mask, positions, delta


def is_qwen_vl_config(cfg: Dict[str, Any]) -> bool:
    mt = cfg.get("model_type", "")
    return mt in ("qwen2_vl", "qwen2_5_vl")

# SPDX-License-Identifier: Apache-2.0
"""GLM-4V / GLM-4.5V vision tower + M-RoPE multimodal model (JAX).

The reference serves GLM-4V checkpoints through mlx-vlm (reference
models/mllm.py:1207); the TPU build owns the tower. Architecture (HF
``Glm4vVisionModel`` parity):

* qwen2-vl-shaped dynamic-resolution ViT: conv3d patch embed over
  flattened ``temporal x patch x patch`` patches (== one matmul), 2-D
  rotary from each patch's (h, w) merge-group coordinates, per-frame
  full attention (no windows);
* plus three GLM twists: an RMS ``post_conv_layernorm``, LEARNED
  position embeddings bicubically interpolated to each image's grid
  (HF F.interpolate, a = -0.75, half-pixel centers — reimplemented
  exactly on host numpy), and a conv ``downsample`` for the 2x2
  spatial merge followed by a gated-MLP ``merger``;
* text stack: GLM-4 pair-interleaved rotary over the FULL head dim
  (glm4v_text) or GLM-4.5's partial standard rotary + MoE
  (glm4v_moe_text), both with M-RoPE (t, h, w) sections. Image
  position indexing equals Qwen2-VL's raw-t rule, so the shared
  compute_mrope_positions applies with tokens_per_second = 0.

Videos: GLM-4V interleaves per-frame timestamp text tokens — not
wired; image chat only (ValueError on video input).
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
from ..ops.layers import apply_rope, linear, rms_norm
from .qwen_vl import (
    _vision_inv_freq,
    compute_mrope_positions,
    full_segments,
    rot_pos_ids,
)

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


@dataclass
class Glm4vVisionConfig:
    depth: int = 24
    hidden_size: int = 1536
    intermediate_size: int = 13696  # merger context dim
    out_hidden_size: int = 4096  # vision MLP intermediate + output dim
    num_heads: int = 12
    in_channels: int = 3
    image_size: int = 336  # pos-embed native grid = image_size/patch
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    rms_norm_eps: float = 1e-5
    hidden_act: str = "silu"
    attention_bias: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size**2

    @classmethod
    def from_hf_config(cls, cfg: Dict[str, Any]) -> "Glm4vVisionConfig":
        return cls(
            depth=cfg.get("depth", 24),
            hidden_size=cfg.get("hidden_size", 1536),
            intermediate_size=cfg.get("intermediate_size", 13696),
            out_hidden_size=cfg.get("out_hidden_size", 4096),
            num_heads=cfg.get("num_heads", 12),
            in_channels=cfg.get("in_channels", 3),
            image_size=cfg.get("image_size", 336),
            patch_size=cfg.get("patch_size", 14),
            temporal_patch_size=cfg.get("temporal_patch_size", 2),
            spatial_merge_size=cfg.get("spatial_merge_size", 2),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            hidden_act=cfg.get("hidden_act", "silu"),
            attention_bias=cfg.get("attention_bias", False),
        )


def _torch_bicubic_weights(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (PyTorch's bicubic, A = -0.75)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1,
        (a + 2) * ax**3 - (a + 3) * ax**2 + 1,
        np.where(
            ax < 2,
            a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a,
            0.0,
        ),
    )
    return w


def _bicubic_axis(src: int, dst: int) -> Tuple[np.ndarray, np.ndarray]:
    """(indices [dst, 4], weights [dst, 4]) for one axis — half-pixel
    centers, edge-clamped taps (torch F.interpolate bicubic,
    align_corners=False)."""
    pos = (np.arange(dst) + 0.5) * (src / dst) - 0.5
    base = np.floor(pos).astype(np.int64)
    frac = pos - base
    taps = np.stack([base - 1, base, base + 1, base + 2], axis=1)
    dist = taps - pos[:, None]
    w = _torch_bicubic_weights(dist.astype(np.float64))
    w = w / w.sum(axis=1, keepdims=True)
    return np.clip(taps, 0, src - 1), w


def interpolate_pos_embed(
    table: np.ndarray,  # [orig*orig, D]
    orig: int,
    grid_h: int,
    grid_w: int,
) -> np.ndarray:
    """Bicubic-resample the learned position table to (grid_h, grid_w)
    — exact HF Glm4vVisionEmbeddings semantics. Returns
    [grid_h*grid_w, D] f32."""
    d = table.shape[-1]
    x = table.reshape(orig, orig, d).astype(np.float64)
    ih, wh = _bicubic_axis(orig, grid_h)
    iw, ww = _bicubic_axis(orig, grid_w)
    # rows: [grid_h, 4, orig, d] -> weighted sum
    xr = (x[ih] * wh[:, :, None, None]).sum(axis=1)  # [grid_h, orig, d]
    xc = (xr[:, iw] * ww[None, :, :, None]).sum(axis=2)  # [gh, gw, d]
    return xc.reshape(grid_h * grid_w, d).astype(np.float32)


def _glm_rms(x, w, eps):
    return rms_norm(x, w, eps)


def _seg_attention(x, p, cfg: Glm4vVisionConfig, cos, sin, seg):
    n = x.shape[0]
    h = cfg.num_heads
    hd = cfg.head_dim
    qkv = linear(x, p["qkv_w"], p.get("qkv_b"))
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
    return linear(ctx, p["proj_w"], p.get("proj_b"))


def _gated_mlp(x, p, act: str):
    g = linear(x, p["gate_w"], p.get("gate_b")).astype(jnp.float32)
    u = linear(x, p["up_w"], p.get("up_b")).astype(jnp.float32)
    act_fn = jax.nn.silu if act == "silu" else jax.nn.gelu
    return linear((act_fn(g) * u).astype(x.dtype), p["down_w"], p.get("down_b"))


def vision_encode(
    params: Params,
    cfg: Glm4vVisionConfig,
    patches: jax.Array,  # [N, C*tp*p*p] natural (merge-group) order
    pos_embed: jax.Array,  # [N, hidden] interpolated learned positions
    cos: jax.Array,  # [N, head_dim//2]
    sin: jax.Array,
    seg: jax.Array,  # [N] frame segment ids
) -> jax.Array:
    """Patches -> merged features [N/unit, out_hidden] (HF
    Glm4vVisionModel.forward)."""
    x = linear(patches, params["patch_embed"], params.get("patch_bias"))
    x = _glm_rms(x, params["post_conv_ln_w"], cfg.rms_norm_eps)
    x = x + pos_embed.astype(x.dtype)
    for p in params["blocks"]:
        h = _glm_rms(x, p["norm1_w"], cfg.rms_norm_eps)
        x = x + _seg_attention(h, p, cfg, cos, sin, seg)
        h = _glm_rms(x, p["norm2_w"], cfg.rms_norm_eps)
        x = x + _gated_mlp(h, p, cfg.hidden_act)
    x = _glm_rms(x, params["post_ln_w"], cfg.rms_norm_eps)
    # 2x2 spatial merge via the downsample conv == matmul over the
    # [D, m, m]-flattened group (weight reshaped to [out, D*m*m])
    m = cfg.spatial_merge_size
    d = cfg.hidden_size
    x = x.reshape(-1, m, m, d)
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(-1, d * m * m)
    x = linear(x, params["downsample_w"], params.get("downsample_b"))
    # merger: proj -> LayerNorm -> gelu -> gated MLP
    mg = params["merger"]
    x = linear(x, mg["proj_w"], mg.get("proj_b"))
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * mg["ln_w"] + mg["ln_b"]
    x = jax.nn.gelu(xf, approximate=False).astype(x.dtype)
    return _gated_mlp(x, mg, cfg.hidden_act)


def load_glm4v_vision_params(
    tensors: Dict[str, np.ndarray], cfg: Glm4vVisionConfig, dtype=jnp.float32
) -> Tuple[Params, np.ndarray]:
    """Map HF ``visual.``-relative tensors. Returns (params,
    pos_table [orig*orig, hidden] f32 — kept host-side for per-grid
    bicubic interpolation)."""
    blocks: List[Dict] = [dict() for _ in range(cfg.depth)]
    params: Params = {"blocks": blocks, "merger": {}}
    pos_table: Optional[np.ndarray] = None

    def put(t):
        return jnp.asarray(np.asarray(t)).astype(dtype)

    for name, t in tensors.items():
        if name == "patch_embed.proj.weight":
            params["patch_embed"] = put(
                np.asarray(t).reshape(np.asarray(t).shape[0], -1)
            )
        elif name == "patch_embed.proj.bias":
            params["patch_bias"] = put(t)
        elif name == "embeddings.position_embedding.weight":
            pos_table = np.asarray(t, dtype=np.float32)
        elif name == "post_conv_layernorm.weight":
            params["post_conv_ln_w"] = put(t)
        elif name == "post_layernorm.weight":
            params["post_ln_w"] = put(t)
        elif name == "downsample.weight":
            w = np.asarray(t)  # [out, D, m, m]
            params["downsample_w"] = put(w.reshape(w.shape[0], -1))
        elif name == "downsample.bias":
            params["downsample_b"] = put(t)
        elif name.startswith("merger."):
            key = {
                "merger.proj.weight": "proj_w",
                "merger.proj.bias": "proj_b",
                "merger.post_projection_norm.weight": "ln_w",
                "merger.post_projection_norm.bias": "ln_b",
                "merger.gate_proj.weight": "gate_w",
                "merger.gate_proj.bias": "gate_b",
                "merger.up_proj.weight": "up_w",
                "merger.up_proj.bias": "up_b",
                "merger.down_proj.weight": "down_w",
                "merger.down_proj.bias": "down_b",
            }.get(name)
            if key in ("ln_w", "ln_b"):
                params["merger"][key] = jnp.asarray(
                    np.asarray(t)
                ).astype(jnp.float32)
            elif key:
                params["merger"][key] = put(t)
        elif name.startswith("blocks."):
            parts = name.split(".")
            i = int(parts[1])
            rest = ".".join(parts[2:])
            key = {
                "norm1.weight": "norm1_w",
                "norm2.weight": "norm2_w",
                "attn.qkv.weight": "qkv_w",
                "attn.qkv.bias": "qkv_b",
                "attn.proj.weight": "proj_w",
                "attn.proj.bias": "proj_b",
                "mlp.gate_proj.weight": "gate_w",
                "mlp.up_proj.weight": "up_w",
                "mlp.down_proj.weight": "down_w",
            }.get(rest)
            if key:
                blocks[i][key] = put(t)
    return params, pos_table


class Glm4vModel:
    """GLM-4V / GLM-4.5V for the unified serving engine — the same
    interface as models/qwen_vl.QwenVLModel (encode_media +
    build_multimodal_prompt with M-RoPE positions)."""

    def __init__(self, model_path: str, dtype: Optional[str] = None) -> None:
        self.model_path = model_path
        self._dtype = dtype
        self._loaded = False

    def load(self) -> "Glm4vModel":
        if self._loaded:
            return self
        from . import loader

        with open(os.path.join(self.model_path, "config.json")) as f:
            cfg = json.load(f)
        text_cfg = cfg.get("text_config") or cfg
        self.cfg = ModelConfig.from_hf_config(text_cfg)
        if self.cfg.mrope_section is None:
            rs = (cfg.get("rope_scaling") or {}).get("mrope_section")
            if rs:
                self.cfg.mrope_section = list(rs)
        self.vision_cfg = Glm4vVisionConfig.from_hf_config(
            cfg.get("vision_config", {})
        )
        self.image_token_id = cfg.get("image_token_id", 151343)
        self.video_token_id = cfg.get("video_token_id", 151344)

        jdt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            self._dtype or self.cfg.dtype
        ]
        vision_tensors: Dict[str, np.ndarray] = {}
        for name, tensor in loader.iter_safetensors(self.model_path):
            if ".visual." in name or name.startswith("visual."):
                vision_tensors[name.split("visual.", 1)[1]] = tensor
        self.vision_params, self.pos_table = load_glm4v_vision_params(
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
        """One image -> merged features [t*h*w/unit, out_hidden] f32."""
        cfg = self.vision_cfg
        t, h, w = grid_thw
        n = flatten_patches.shape[0]
        pos = rot_pos_ids([grid_thw], cfg.spatial_merge_size)  # [N, 2]
        inv_freq = _vision_inv_freq(cfg.head_dim)
        angles = pos[:, :, None].astype(np.float32) * inv_freq[None, None, :]
        angles = angles.reshape(n, -1)
        seg = full_segments([grid_thw])
        # learned positions: bicubic table resampled to this grid, then
        # gathered at each patch's merge-group (h, w) coordinate
        orig = cfg.image_size // cfg.patch_size
        interp = interpolate_pos_embed(self.pos_table, orig, h, w)
        # pos already carries each patch's (h, w) coordinate in
        # merge-group order, tiled over t — gather directly
        pos_rows = interp.reshape(h, w, -1)[pos[:, 0], pos[:, 1]]

        fn = self._encode_jits.get(n)
        if fn is None:
            fn = jax.jit(partial(vision_encode, cfg=cfg))
            self._encode_jits[n] = fn
        out = fn(
            self.vision_params,
            patches=jnp.asarray(flatten_patches, jnp.float32),
            pos_embed=jnp.asarray(pos_rows),
            cos=jnp.asarray(np.cos(angles)),
            sin=jnp.asarray(np.sin(angles)),
            seg=jnp.asarray(seg),
        )
        return np.asarray(out, np.float32)

    # --------------------------------------------------------- prompt building
    def build_multimodal_prompt(
        self,
        token_ids: List[int],
        media_features: List[np.ndarray],
        media_grids: List[Tuple[int, int, int]],
        media_is_video: Optional[List[bool]] = None,
        second_per_grid_ts: Optional[List[float]] = None,
    ) -> Tuple[List[int], np.ndarray, np.ndarray, np.ndarray, int]:
        """Expand image placeholders and compute M-RoPE positions (GLM
        image t-indexing == Qwen2-VL raw-t rule)."""
        h = self.cfg.hidden_size
        out_ids: List[int] = []
        rows: List[Optional[np.ndarray]] = []
        media: List[Dict[str, Any]] = []
        mi = 0
        for tid in token_ids:
            if tid == self.image_token_id and mi < len(media_features):
                feats = media_features[mi]
                media.append({"grid": media_grids[mi]})
                mi += 1
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
        positions, delta = compute_mrope_positions(
            out_ids,
            media,
            self.image_token_id,
            self.video_token_id,
            self.vision_cfg.spatial_merge_size,
            tokens_per_second=0.0,  # GLM images: raw t-index rule
        )
        return out_ids, embeds, mask, positions, delta

# SPDX-License-Identifier: Apache-2.0
"""Llama 4 vision (Scout/Maverick are natively multimodal — the
reference serves the family via mlx-lm/mlx-vlm; docs/reference/models.md
row 1 "Llama 3.x, 4.x").

Architecture (HF modeling_llama4.py Llama4VisionModel):
  * patch embed = Unfold(patch) -> bias-free linear (channel-major
    c*k*k patch vectors),
  * class embedding appended at the END, learned positional embedding,
  * layernorm_pre -> encoder: pre-LN blocks, biased qkv/o, 2-D rope
    with COMPLEX pair rotation (first half of pair-angles from the x
    coordinate, second half from y; zero angles on the cls row),
    non-causal, gelu MLP with biases -> layernorm_post,
  * drop cls, pixel_shuffle(ratio) -> Llama4VisionMLP2
    (gelu(fc2(gelu(fc1(x)))), bias-free) -> multi_modal_projector
    linear_1 (bias-free) into the text hidden size.

Tiling (HF Llama4ImageProcessorFast): best-fit canvas from all
(h_tiles x w_tiles) factorizations with h*w <= max_patches, aspect
preserving resize + zero pad, split row-major, plus a GLOBAL tile when
tiled. Prompt expansion (Llama4Processor._prompt_split_image): local
patch runs with <|tile_x/y_separator|>, then <|image|> + the global
run, wrapped in <|image_start|>/<|image_end|>.
"""

from __future__ import annotations

import json
import logging
import math
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.layers import linear

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


def _vision_rope_angles(
    image_size: int, patch_size: int, head_dim: int, rope_theta: float
) -> np.ndarray:
    """[P+1, head_dim//2] rotation angles (HF Llama4VisionRotaryEmbedding):
    pair-angle channels are [x-freqs | y-freqs], cls row (last) zero."""
    idx = image_size // patch_size
    img_idx = np.arange(idx * idx, dtype=np.int64).reshape(-1, 1)
    img_idx = np.concatenate([img_idx, img_idx[:1]], axis=0)
    img_idx[-1, -1] = -2  # cls sentinel
    fx = img_idx % idx
    fy = img_idx // idx
    freq_dim = head_dim // 2
    rope_freq = 1.0 / (
        rope_theta
        ** (np.arange(0, freq_dim, 2)[: freq_dim // 2].astype(np.float64) / freq_dim)
    )
    freqs_x = np.repeat((fx + 1)[..., None] * rope_freq[None, None, :], 2, -1)
    freqs_y = np.repeat((fy + 1)[..., None] * rope_freq[None, None, :], 2, -1)
    freqs = np.concatenate([freqs_x, freqs_y], axis=-1)[..., ::2]
    freqs = np.where(img_idx.reshape(-1, 1, 1) < 0, 0.0, freqs)
    return freqs.reshape(freqs.shape[0], -1).astype(np.float32)


def _rot_pairs(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Complex rotation of adjacent channel pairs (view_as_complex map);
    cos/sin are [T, head_dim//2] per-pair angles."""
    xf = x.astype(jnp.float32)
    c = jnp.repeat(cos, 2, axis=-1)[:, None, :]
    s = jnp.repeat(sin, 2, axis=-1)[:, None, :]
    even = xf[..., 0::2]
    odd = xf[..., 1::2]
    rh = jnp.stack([-odd, even], axis=-1).reshape(xf.shape)
    return (xf * c + rh * s).astype(x.dtype)


def _ln(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, eps: float):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return (
        (xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
        + b.astype(jnp.float32)
    ).astype(x.dtype)


def llama4_vision_encode(
    p: Params, vc: Dict[str, Any], pixel_values: jnp.ndarray
) -> jnp.ndarray:
    """[N, 3, S, S] tiles -> projected features
    [N, (S/patch * ps_ratio)^2, text_hidden]."""
    n = pixel_values.shape[0]
    ps = vc["patch_size"]
    side = vc["image_size"] // ps
    eps = vc["norm_eps"]
    heads = vc["num_attention_heads"]
    hd = vc["hidden_size"] // heads
    # unfold patch embed: torch Unfold flattens (c, ky, kx) c-major
    x = pixel_values.reshape(n, 3, side, ps, side, ps)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(
        n, side * side, 3 * ps * ps
    )
    x = linear(x, p["patch_w"])
    # cls token appended at the END + learned positions
    cls = jnp.broadcast_to(p["cls"][None, None, :], (n, 1, x.shape[-1]))
    x = jnp.concatenate([x, cls.astype(x.dtype)], axis=1)
    x = x + p["pos"][None].astype(x.dtype)
    x = _ln(x, p["ln_pre_w"], p["ln_pre_b"], eps)
    cos, sin = p["rope_cos"], p["rope_sin"]  # [P+1, hd//2]
    t = x.shape[1]
    scale = hd**-0.5

    def one(xi):
        for lp in p["layers"]:
            h = _ln(xi, lp["ln1_w"], lp["ln1_b"], eps)
            q = linear(h, lp["q_w"], lp["q_b"]).reshape(t, heads, hd)
            k = linear(h, lp["k_w"], lp["k_b"]).reshape(t, heads, hd)
            v = linear(h, lp["v_w"], lp["v_b"]).reshape(t, heads, hd)
            q = _rot_pairs(q, cos, sin)
            k = _rot_pairs(k, cos, sin)
            att = jnp.einsum(
                "qhd,khd->hqk", q.astype(jnp.float32),
                k.astype(jnp.float32),
            ) * scale
            att = jax.nn.softmax(att, axis=-1)
            o = jnp.einsum(
                "hqk,khd->qhd", att, v.astype(jnp.float32)
            ).reshape(t, heads * hd).astype(xi.dtype)
            xi = xi + linear(o, lp["o_w"], lp["o_b"])
            h = _ln(xi, lp["ln2_w"], lp["ln2_b"], eps)
            h = linear(h, lp["fc1_w"], lp["fc1_b"])
            h = jax.nn.gelu(h.astype(jnp.float32), approximate=False)
            h = linear(h.astype(xi.dtype), lp["fc2_w"], lp["fc2_b"])
            xi = xi + h
        return xi

    x = jax.vmap(one)(x)
    x = _ln(x, p["ln_post_w"], p["ln_post_b"], eps)
    x = x[:, :-1, :]  # drop cls
    # pixel shuffle (HF pixel_shuffle: two transposed half-merges)
    r = vc["pixel_shuffle_ratio"]
    b, np_, c = x.shape
    sde = int(math.sqrt(np_))
    x = x.reshape(b, sde, sde, c)
    x = x.reshape(b, sde, int(sde * r), int(c / r))
    x = jnp.transpose(x, (0, 2, 1, 3))
    x = x.reshape(b, int(sde * r), int(sde * r), int(c / (r * r)))
    x = jnp.transpose(x, (0, 2, 1, 3))
    x = x.reshape(b, int(sde * r) ** 2, int(c / (r * r)))
    # MLP2: gelu(fc2(gelu(fc1(x)))), bias-free
    x = jax.nn.gelu(
        linear(x, p["ad_fc1_w"]).astype(jnp.float32), approximate=False
    ).astype(x.dtype)
    x = jax.nn.gelu(
        linear(x, p["ad_fc2_w"]).astype(jnp.float32), approximate=False
    ).astype(x.dtype)
    # multi-modal projector into the text hidden size
    return linear(x, p["proj_w"])


class Llama4VLM:
    """Llama 4 multimodal for the unified serving engine."""

    supports_audio = False

    def __init__(self, model_path: str, dtype: Optional[str] = None) -> None:
        self.model_path = model_path
        self._dtype = dtype
        self._loaded = False

    def load(self) -> "Llama4VLM":
        if self._loaded:
            return self
        from . import loader

        with open(os.path.join(self.model_path, "config.json")) as f:
            cfg = json.load(f)
        tc = cfg.get("text_config", {})
        vc = cfg.get("vision_config", {})
        self.cfg = ModelConfig.from_hf_config(tc)
        self.image_token_id = cfg.get(
            "image_token_index", cfg.get("image_token_id", 0)
        )
        self.vision_cfg = {
            "hidden_size": vc.get("hidden_size", 768),
            "num_hidden_layers": vc.get("num_hidden_layers", 34),
            "num_attention_heads": vc.get("num_attention_heads", 16),
            "image_size": vc.get("image_size", 448),
            "patch_size": vc.get("patch_size", 14),
            "norm_eps": vc.get("norm_eps", 1e-5),
            "pixel_shuffle_ratio": vc.get("pixel_shuffle_ratio", 0.5),
            "rope_theta": vc.get("rope_theta", 10000),
        }
        r = self.vision_cfg["pixel_shuffle_ratio"]
        self.downsample_ratio = int(round(1.0 / (r * r)))
        jdt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            self._dtype or self.cfg.dtype
        ]

        def put(t):
            return jnp.asarray(np.asarray(t)).astype(jdt)

        n_layers = self.vision_cfg["num_hidden_layers"]
        vp: Params = {"layers": [dict() for _ in range(n_layers)]}
        lmap = {
            "self_attn.q_proj.weight": "q_w", "self_attn.q_proj.bias": "q_b",
            "self_attn.k_proj.weight": "k_w", "self_attn.k_proj.bias": "k_b",
            "self_attn.v_proj.weight": "v_w", "self_attn.v_proj.bias": "v_b",
            "self_attn.o_proj.weight": "o_w", "self_attn.o_proj.bias": "o_b",
            "input_layernorm.weight": "ln1_w",
            "input_layernorm.bias": "ln1_b",
            "post_attention_layernorm.weight": "ln2_w",
            "post_attention_layernorm.bias": "ln2_b",
            "mlp.fc1.weight": "fc1_w", "mlp.fc1.bias": "fc1_b",
            "mlp.fc2.weight": "fc2_w", "mlp.fc2.bias": "fc2_b",
        }
        top = {
            "patch_embedding.linear.weight": "patch_w",
            "class_embedding": "cls",
            "positional_embedding_vlm": "pos",
            "layernorm_pre.weight": "ln_pre_w",
            "layernorm_pre.bias": "ln_pre_b",
            "layernorm_post.weight": "ln_post_w",
            "layernorm_post.bias": "ln_post_b",
            "vision_adapter.mlp.fc1.weight": "ad_fc1_w",
            "vision_adapter.mlp.fc2.weight": "ad_fc2_w",
        }
        for name, tensor in loader.iter_safetensors(self.model_path):
            if "vision_model." in name:
                sub = name.split("vision_model.", 1)[1]
                if sub in top:
                    vp[top[sub]] = put(tensor)
                elif sub.startswith("model.layers."):
                    parts = sub.split(".", 3)
                    i, rest = int(parts[2]), parts[3]
                    if rest in lmap:
                        vp["layers"][i][lmap[rest]] = put(tensor)
            elif "multi_modal_projector.linear_1.weight" in name:
                vp["proj_w"] = put(tensor)
        angles = _vision_rope_angles(
            self.vision_cfg["image_size"],
            self.vision_cfg["patch_size"],
            self.vision_cfg["hidden_size"]
            // self.vision_cfg["num_attention_heads"],
            self.vision_cfg["rope_theta"],
        )
        vp["rope_cos"] = jnp.asarray(np.cos(angles))
        vp["rope_sin"] = jnp.asarray(np.sin(angles))
        self.vision_params = vp
        self.params = loader.load_params(
            self.model_path, self.cfg, dtype=self._dtype
        )
        vc_static = dict(self.vision_cfg)
        self._encode_jit = jax.jit(
            lambda p, px: llama4_vision_encode(p, vc_static, px)
        )
        self._loaded = True
        return self

    @property
    def text_config(self) -> ModelConfig:
        return self.cfg

    @property
    def lm_params(self) -> Params:
        return self.params

    @property
    def tokens_per_tile(self) -> int:
        side = self.vision_cfg["image_size"] // self.vision_cfg["patch_size"]
        return side * side // self.downsample_ratio

    def encode_tiles(self, tiles: np.ndarray) -> np.ndarray:
        """[N, 3, S, S] -> per-tile features [N, rows, H_lm] f32."""
        out = self._encode_jit(self.vision_params, jnp.asarray(tiles))
        return np.asarray(out, np.float32)

    def image_prompt_string(self, aspect_ratio: Tuple[int, int]) -> str:
        """HF Llama4Processor._prompt_split_image."""
        rh, rw = aspect_ratio
        npc = self.tokens_per_tile
        s = "<|image_start|>"
        if rh * rw > 1:
            for _ in range(rh):
                for xx in range(rw):
                    s += "<|patch|>" * npc
                    if xx < rw - 1:
                        s += "<|tile_x_separator|>"
                s += "<|tile_y_separator|>"
        s += "<|image|>" + "<|patch|>" * npc + "<|image_end|>"
        return s

    def build_multimodal_prompt(
        self,
        token_ids: List[int],
        image_features: List[np.ndarray],  # per image [n_tiles, rows, H]
    ) -> Tuple[List[int], np.ndarray, np.ndarray]:
        """Fill <|patch|> rows in tile order (locals row-major, then the
        global tile — pixel_values order matches the prompt layout)."""
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
                f"{len(img_rows)} <|patch|> rows != {flat.shape[0]}"
                " feature rows"
            )
        embeds[img_rows] = flat
        mask[img_rows] = True
        return token_ids, embeds, mask

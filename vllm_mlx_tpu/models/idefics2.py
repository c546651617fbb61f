# SPDX-License-Identifier: Apache-2.0
"""Idefics2: SigLIP-shaped tower + perceiver resampler over Mistral.

The reference lists idefics2-8b in its supported multimodal table
(reference docs/reference/models.md "Idefics"); the TPU build owns the
tower. Architecture (HF modeling_idefics2.py):

  * ``Idefics2VisionTransformer``: same SigLIP layout as Idefics3 but
    over ASPECT-PRESERVING inputs (shortest edge 378, longest 980) —
    patch positions come from bucketizing fractional patch coordinates
    onto the square table (Idefics2VisionEmbeddings.forward), computed
    here per image grid on the host and swapped into the shared ViT's
    position table,
  * ``Idefics2Connector``: swiglu ``modality_projection`` onto the text
    width, then a ``Idefics2PerceiverResampler``: learned latents
    cross-attend to [context; latents] (GQA, no rope) through
    resampler_depth pre-RMSNorm blocks -> exactly resampler_n_latents
    soft tokens per image,
  * prompt: each ``<image>`` expands to ``<fake_token_around_image>`` +
    ``<image>`` * image_seq_len + ``<fake_token_around_image>`` (x5
    with do_image_splitting: 4 half-resolution crops + the original,
    image_processing_idefics2.split_image), with doubled fake tokens
    between adjacent images collapsed (processing_idefics2.__call__).
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
class PerceiverConfig:
    hidden_size: int  # text width
    n_latents: int = 64
    depth: int = 3
    n_heads: int = 16
    head_dim: int = 96
    num_key_value_heads: int = 4
    rms_norm_eps: float = 1e-6


@dataclass
class Idefics2MMConfig:
    text: ModelConfig
    vision: VisionConfig
    perceiver: PerceiverConfig
    image_token_id: int

    @classmethod
    def from_pretrained(cls, path: str) -> "Idefics2MMConfig":
        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        tc = dict(cfg.get("text_config", {}))
        tc.setdefault("model_type", "mistral")
        pc = cfg.get("perceiver_config", {})
        text = ModelConfig.from_hf_config(tc)
        return cls(
            text=text,
            vision=VisionConfig.from_hf_config(cfg.get("vision_config", {})),
            perceiver=PerceiverConfig(
                hidden_size=text.hidden_size,
                n_latents=pc.get("resampler_n_latents", 64),
                depth=pc.get("resampler_depth", 3),
                n_heads=pc.get("resampler_n_heads", 16),
                head_dim=pc.get("resampler_head_dim", 96),
                num_key_value_heads=pc.get("num_key_value_heads", 4),
                rms_norm_eps=pc.get("rms_norm_eps", 1e-6),
            ),
            image_token_id=cfg.get("image_token_id", 32001),
        )


def bucket_position_ids(
    nh: int, nw: int, table_side: int
) -> np.ndarray:
    """HF Idefics2VisionEmbeddings: fractional patch coords bucketized
    onto the square position table, row-major flattened [nh * nw]."""
    bounds = np.arange(1, table_side) / table_side
    fh = np.arange(nh) / nh * (1 - 1e-6)
    fw = np.arange(nw) / nw * (1 - 1e-6)
    bh = np.searchsorted(bounds, fh, side="right")
    bw = np.searchsorted(bounds, fw, side="right")
    return (bh[:, None] * table_side + bw[None, :]).reshape(-1)


def _rms(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return (n * w.astype(jnp.float32)).astype(x.dtype)


def _swiglu(p: Params, x: jax.Array) -> jax.Array:
    g = jax.nn.silu((x @ p["gate_w"].T).astype(jnp.float32))
    return (
        (g * (x @ p["up_w"].T).astype(jnp.float32)).astype(x.dtype)
        @ p["down_w"].T
    )


def perceiver_resample(
    p: Params, pc: PerceiverConfig, context: jax.Array
) -> jax.Array:
    """context [B, seq, H_text] -> [B, n_latents, H_text] (HF
    Idefics2PerceiverResampler: latents query [context; latents])."""
    b = context.shape[0]
    lat = jnp.broadcast_to(
        p["latents"], (b, pc.n_latents, pc.hidden_size)
    ).astype(context.dtype)
    nh, kvh, hd = pc.n_heads, pc.num_key_value_heads, pc.head_dim
    scale = hd**-0.5
    for lp in p["layers"]:
        ln = _rms(lat, lp["latents_norm"], pc.rms_norm_eps)
        cn = _rms(context, lp["context_norm"], pc.rms_norm_eps)
        kv_in = jnp.concatenate([cn, ln], axis=1)
        q = (ln @ lp["q_w"].T).reshape(b, pc.n_latents, nh, hd)
        k = (kv_in @ lp["k_w"].T).reshape(b, -1, kvh, hd)
        v = (kv_in @ lp["v_w"].T).reshape(b, -1, kvh, hd)
        q = q.reshape(b, pc.n_latents, kvh, nh // kvh, hd)
        scores = jnp.einsum(
            "bqkgh,bmkh->bkgqm", q, k,
            preferred_element_type=jnp.float32,
        ) * scale
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum(
            "bkgqm,bmkh->bqkgh", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).reshape(b, pc.n_latents, nh * hd).astype(lat.dtype)
        lat = lat + ctx @ lp["o_w"].T
        lat = lat + _swiglu(lp["mlp"], _rms(
            lat, lp["post_attn_norm"], pc.rms_norm_eps
        ))
    return _rms(lat, p["norm"], pc.rms_norm_eps)


def load_idefics2_params(
    path: str, cfg: Idefics2MMConfig, dtype: Optional[str] = None
) -> Params:
    from . import loader

    jdt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        dtype or cfg.text.dtype
    ]

    def put(t):
        return jnp.asarray(t).astype(jdt)

    vision_tensors: Dict[str, np.ndarray] = {}
    conn: Params = {
        "mlp": {},
        "perceiver": {
            "layers": [dict() for _ in range(cfg.perceiver.depth)]
        },
    }
    for name, tensor in loader.iter_safetensors(path):
        if "vision_model." in name:
            vision_tensors[name.split("vision_model.", 1)[1]] = tensor
        elif "connector.modality_projection." in name:
            sub = name.split("modality_projection.", 1)[1]
            key = {
                "gate_proj.weight": "gate_w",
                "up_proj.weight": "up_w",
                "down_proj.weight": "down_w",
            }.get(sub)
            if key:
                conn["mlp"][key] = put(tensor)
        elif "connector.perceiver_resampler." in name:
            sub = name.split("perceiver_resampler.", 1)[1]
            pr = conn["perceiver"]
            if sub == "latents":
                pr["latents"] = put(tensor)
            elif sub == "norm.weight":
                pr["norm"] = put(tensor)
            elif sub.startswith("layers."):
                parts = sub.split(".")
                i = int(parts[1])
                rest = ".".join(parts[2:])
                ld = pr["layers"][i]
                key = {
                    "input_latents_norm.weight": "latents_norm",
                    "input_context_norm.weight": "context_norm",
                    "self_attn.q_proj.weight": "q_w",
                    "self_attn.k_proj.weight": "k_w",
                    "self_attn.v_proj.weight": "v_w",
                    "self_attn.o_proj.weight": "o_w",
                    "post_attention_layernorm.weight": "post_attn_norm",
                }.get(rest)
                if key:
                    ld[key] = put(tensor)
                elif rest.startswith("mlp."):
                    mkey = {
                        "mlp.gate_proj.weight": "gate_w",
                        "mlp.up_proj.weight": "up_w",
                        "mlp.down_proj.weight": "down_w",
                    }.get(rest)
                    if mkey:
                        ld.setdefault("mlp", {})[mkey] = put(tensor)
    lm_params = loader.load_params(path, cfg.text, dtype=dtype)
    vision_params = load_vision_params(vision_tensors, cfg.vision, dtype=jdt)
    return {
        "vision": vision_params,
        "connector": conn,
        "lm": lm_params,
    }


class Idefics2VLM:
    """Idefics2 for the unified serving engine."""

    supports_audio = False

    def __init__(self, model_path: str, dtype: Optional[str] = None) -> None:
        self.model_path = model_path
        self._dtype = dtype
        self.cfg: Optional[Idefics2MMConfig] = None
        self.params: Optional[Params] = None
        self._encode_jit = None
        self._loaded = False

    def load(self) -> "Idefics2VLM":
        if self._loaded:
            return self
        self.cfg = Idefics2MMConfig.from_pretrained(self.model_path)
        self.params = load_idefics2_params(
            self.model_path, self.cfg, self._dtype
        )
        cfg = self.cfg

        def _encode(vision_params, connector, pixel_values):
            feats = vit_encode(
                vision_params, cfg.vision, pixel_values, apply_post_ln=True
            )
            proj = _swiglu(connector["mlp"], feats)
            return perceiver_resample(
                connector["perceiver"], cfg.perceiver, proj
            ).astype(jnp.float32)

        self._encode_jit = jax.jit(_encode)
        self._loaded = True
        return self

    @property
    def text_config(self) -> ModelConfig:
        return self.cfg.text

    @property
    def lm_params(self) -> Params:
        return self.params["lm"]

    def encode_image(self, pixel_values: np.ndarray) -> np.ndarray:
        """One (sub-)image [3, H, W] -> [n_latents, H_lm] f32. H/W need
        not be square or patch-aligned (HF floors to the patch grid);
        positions bucketize onto the square table per grid."""
        pv = np.asarray(pixel_values)
        p = self.cfg.vision.patch_size
        nh, nw = pv.shape[-2] // p, pv.shape[-1] // p
        pv = pv[..., : nh * p, : nw * p]
        side = self.cfg.vision.image_size // p
        ids = bucket_position_ids(nh, nw, side)
        vp = dict(self.params["vision"])
        vp["pos_embed"] = np.asarray(vp["pos_embed"])[ids]
        out = self._encode_jit(
            vp, self.params["connector"], jnp.asarray(pv[None])
        )
        return np.asarray(out[0], dtype=np.float32)

    def encode_tiles(self, tiles: List[np.ndarray]) -> np.ndarray:
        """Per-image list of sub-images (1 or 5 with splitting), each
        [3, H, W] possibly different sizes -> [n_sub * n_latents, H_lm]."""
        return np.concatenate(
            [self.encode_image(t) for t in tiles], axis=0
        )

    def image_prompt_string(
        self,
        n_sub_images: int,
        fake_token: str = "<fake_token_around_image>",
        image_token: str = "<image>",
    ) -> str:
        """HF processing_idefics2: per image, fake + <image>*seq + fake,
        repeated per sub-image (doubled fake tokens collapse later)."""
        one = f"{fake_token}{image_token * self.cfg.perceiver.n_latents}{fake_token}"
        return one * n_sub_images

    def expand_image_tokens(
        self, prompt: str, n_subs: List[int],
        fake_token: str = "<fake_token_around_image>",
    ) -> str:
        """Replace each ``<image>`` placeholder with its expansion and
        collapse doubled fake tokens (HF processing_idefics2.__call__)."""
        parts = prompt.split("<image>")
        if len(parts) - 1 != len(n_subs):
            raise ValueError(
                f"prompt has {len(parts) - 1} <image> placeholders for "
                f"{len(n_subs)} images"
            )
        out = [parts[0]]
        for i, n in enumerate(n_subs):
            out.append(self.image_prompt_string(n))
            out.append(parts[i + 1])
        return "".join(out).replace(
            f"{fake_token}{fake_token}", fake_token
        )

    def build_multimodal_prompt(
        self,
        token_ids: List[int],
        tile_features: List[np.ndarray],  # per image [n_sub*latents, H]
    ) -> Tuple[List[int], np.ndarray, np.ndarray]:
        """Fill <image> rows with resampled features in order."""
        h = self.cfg.text.hidden_size
        t = len(token_ids)
        embeds = np.zeros((t, h), np.float32)
        mask = np.zeros(t, bool)
        ids_arr = np.asarray(token_ids)
        img_rows = np.flatnonzero(ids_arr == self.cfg.image_token_id)
        flat = (
            np.concatenate(tile_features, axis=0)
            if tile_features
            else np.zeros((0, h), np.float32)
        )
        if len(img_rows) != flat.shape[0]:
            raise ValueError(
                f"{len(img_rows)} <image> rows != {flat.shape[0]} "
                "feature rows"
            )
        embeds[img_rows] = flat
        mask[img_rows] = True
        return token_ids, embeds, mask

# SPDX-License-Identifier: Apache-2.0
"""Mllama (Llama-3.2-Vision): tiled ViT + cross-attention VLM.

The reference serves this family through mlx-vlm; here the tower and
the text-side cross-attention are TPU-native:

  * vision: tiled CLIP-style ViT with gated tile/position embeddings,
    a 32-layer local encoder, an 8-layer tanh-gated global encoder, and
    5 intermediate-layer taps concatenated into a 7680-dim feature
    (HF modeling_mllama.py MllamaVisionModel.forward).
  * text: standard Llama self-attention layers with tanh-gated
    cross-attention layers interleaved (config cross_attention_layers).
    The <|image|> token is NOT expanded in the token stream — vision
    reaches the LM only through per-request cross-KV buffers
    (models/decoder.py cross_window_attention). Each cross-KV position
    carries a [tok_lo, tok_hi) window of text positions allowed to
    attend it, built from the processor's per-image token spans
    (HF processing_mllama.py get_cross_attention_token_mask) — this
    reproduces HF's dense cross_attention_mask exactly, including the
    full-row fixup, with zero per-step uploads at decode.

Checkpoint layout (HF MllamaForConditionalGeneration):
    vision_model.* / multi_modal_projector.* / language_model.*
The language model's embed_tokens has vocab_size + 8 rows (the image
token sits past lm_head's vocab).
"""

from __future__ import annotations

import json
import logging
import math
import os
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig

logger = logging.getLogger(__name__)

Params = Dict[str, Any]

# sentinel for "visible to every later text position" (open image span)
OPEN_END = np.int32(2**30)


@dataclass
class MllamaVisionConfig:
    hidden_size: int = 1280
    num_hidden_layers: int = 32
    num_global_layers: int = 8
    attention_heads: int = 16
    intermediate_size: int = 5120
    image_size: int = 448
    patch_size: int = 14
    max_num_tiles: int = 4
    num_channels: int = 3
    intermediate_layers_indices: Tuple[int, ...] = (3, 7, 15, 23, 30)
    norm_eps: float = 1e-5
    vision_output_dim: int = 7680
    supported_aspect_ratios: Tuple[Tuple[int, int], ...] = (
        (1, 1), (1, 2), (1, 3), (1, 4), (2, 1), (2, 2), (3, 1), (4, 1),
    )

    @classmethod
    def from_hf_config(cls, cfg: Dict[str, Any]) -> "MllamaVisionConfig":
        kw = {}
        for f in (
            "hidden_size", "num_hidden_layers", "num_global_layers",
            "attention_heads", "intermediate_size", "image_size",
            "patch_size", "max_num_tiles", "num_channels", "norm_eps",
            "vision_output_dim",
        ):
            if f in cfg:
                kw[f] = cfg[f]
        if "intermediate_layers_indices" in cfg:
            kw["intermediate_layers_indices"] = tuple(
                cfg["intermediate_layers_indices"]
            )
        if "supported_aspect_ratios" in cfg:
            kw["supported_aspect_ratios"] = tuple(
                tuple(x) for x in cfg["supported_aspect_ratios"]
            )
        return cls(**kw)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1

    @property
    def num_padded_patches(self) -> int:
        n = self.num_patches
        return n + (-n) % 8

    @property
    def max_aspect_ratio_id(self) -> int:
        return len(self.supported_aspect_ratios)


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (
        (xf - mean) * jax.lax.rsqrt(var + eps)
        * w.astype(jnp.float32) + b.astype(jnp.float32)
    ).astype(x.dtype)


def _encoder_layer(cfg: MllamaVisionConfig, lp: Params, x, bias, gated):
    """One MllamaVisionEncoderLayer (modeling_mllama.py:274-313):
    pre-LN attention + pre-LN GELU MLP; gated layers scale each sublayer
    output by tanh(gate) BEFORE the residual add."""
    b, t, d = x.shape
    h = cfg.attention_heads
    hd = d // h
    scale = hd**-0.5
    res = x
    y = _ln(x, lp["ln1_w"], lp["ln1_b"], cfg.norm_eps)
    q = (y @ lp["q_w"].T).reshape(b, t, h, hd)
    k = (y @ lp["k_w"].T).reshape(b, t, h, hd)
    v = (y @ lp["v_w"].T).reshape(b, t, h, hd)
    scores = (
        jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    )
    if bias is not None:
        scores = scores + bias[:, None, :, :]
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    ctx = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    ).reshape(b, t, d).astype(x.dtype)
    attn = ctx @ lp["o_w"].T
    if gated:
        attn = attn * jnp.tanh(lp["gate_attn"].astype(jnp.float32)).astype(
            attn.dtype
        )
    x = res + attn
    res = x
    y = _ln(x, lp["ln2_w"], lp["ln2_b"], cfg.norm_eps)
    y = jax.nn.gelu(
        (y @ lp["fc1_w"].T + lp["fc1_b"]).astype(jnp.float32),
        approximate=False,
    ).astype(x.dtype)
    y = y @ lp["fc2_w"].T + lp["fc2_b"]
    if gated:
        y = y * jnp.tanh(lp["gate_ffn"].astype(jnp.float32)).astype(y.dtype)
    return res + y


def vision_encode(
    params: Params,
    cfg: MllamaVisionConfig,
    pixel_values: jax.Array,  # [N, max_tiles, C, H, W]
    aspect_ratio_ids: jax.Array,  # [N] i32
    aspect_ratio_mask: jax.Array,  # [N, max_tiles] i32
) -> jax.Array:
    """[N images] -> features [N, max_tiles, num_patches, 7680]
    (HF MllamaVisionModel.forward, modeling_mllama.py)."""
    n, tiles, c, hh, ww = pixel_values.shape
    d = cfg.hidden_size
    p = cfg.patch_size
    # patch conv (no bias)
    x = jax.lax.conv_general_dilated(
        pixel_values.reshape(n * tiles, c, hh, ww).astype(jnp.float32),
        params["patch_embed"].astype(jnp.float32),
        window_strides=(p, p),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    npatches = x.shape[-2] * x.shape[-1]
    x = x.reshape(n * tiles, d, npatches).transpose(0, 2, 1)
    x = x.astype(params["class_embed"].dtype)
    # pre-tile positional embedding (gated, per aspect-ratio id)
    pre = params["pre_tile"]
    emb = pre["embed"][aspect_ratio_ids].reshape(n, cfg.max_num_tiles, 1, d)
    emb = emb * jnp.tanh(pre["gate"].astype(jnp.float32)).astype(emb.dtype)
    x = (x.reshape(n, tiles, npatches, d) + emb).reshape(
        n * tiles, npatches, d
    )
    # class token
    cls = jnp.broadcast_to(params["class_embed"], (n * tiles, 1, d))
    x = jnp.concatenate([cls, x], axis=1)
    np1 = npatches + 1
    # gated positional embedding: (1-tanh(g))*pos + tanh(g)*tile_pos[ar]
    gp = params["gated_pos"]
    g = jnp.tanh(gp["gate"].astype(jnp.float32))
    x = x.reshape(n, tiles, np1, d)
    x = x + ((1.0 - g) * gp["embed"].astype(jnp.float32)).astype(x.dtype)[
        None, None
    ]
    tile_pos = gp["tile_embed"][aspect_ratio_ids].reshape(
        n, cfg.max_num_tiles, np1, d
    )
    x = x + (g * tile_pos.astype(jnp.float32)).astype(x.dtype)
    x = _ln(x, params["ln_pre_w"], params["ln_pre_b"], cfg.norm_eps)
    # pad patches to a multiple of 8
    pad = (-np1) % 8
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    npad = np1 + pad
    # aspect-ratio attention bias (HF _prepare_aspect_ratio_attention_mask
    # verbatim: bias = min where query AND key are both padding)
    am = aspect_ratio_mask.astype(jnp.float32)  # [N, tiles]
    col = jnp.arange(npad)
    patch_valid = (col < np1).astype(jnp.float32)  # pad patches -> 0
    valid = am[:, :, None] * patch_valid[None, None, :]  # [N, tiles, npad]
    inv = (1.0 - valid).reshape(n, tiles * npad)
    neg = jnp.float32(jnp.finfo(jnp.float32).min)
    bias = inv[:, :, None] * inv[:, None, :] * neg  # [N, L, L]
    x = x.reshape(n, tiles * npad, d)
    # local encoder, tapping intermediate layer outputs
    taps = {}
    for i, lp in enumerate(params["local_layers"]):
        x = _encoder_layer(cfg, lp, x, bias, gated=False)
        if i in cfg.intermediate_layers_indices:
            taps[i] = x
    x = _ln(x, params["ln_post_w"], params["ln_post_b"], cfg.norm_eps)
    # post-tile embedding + global encoder
    post = params["post_tile"]
    emb = post["embed"][aspect_ratio_ids].reshape(n, cfg.max_num_tiles, 1, d)
    emb = emb * jnp.tanh(post["gate"].astype(jnp.float32)).astype(emb.dtype)
    x = (x.reshape(n, tiles, npad, d) + emb).reshape(n, tiles * npad, d)
    for lp in params["global_layers"]:
        x = _encoder_layer(cfg, lp, x, bias, gated=True)
    # unpad + append intermediate taps. HF STACKS the taps on a new
    # last dim then flattens (torch.stack(..., dim=-1) + reshape) — tap
    # features interleave PER CHANNEL (c0t0, c0t1, c1t0, ...), not
    # tap-major concat
    x = x.reshape(n, tiles, npad, d)[:, :, :np1]
    inter = jnp.stack(
        [
            taps[i].reshape(n, tiles, npad, d)[:, :, :np1]
            for i in cfg.intermediate_layers_indices
        ],
        axis=-1,
    ).reshape(n, tiles, np1, d * len(cfg.intermediate_layers_indices))
    return jnp.concatenate([x, inter], axis=-1)  # [N, tiles, np1, 7680]


# --------------------------------------------------------------------- spans
def cross_attention_token_spans(
    token_ids: List[int], image_token_id: int, num_images: int
) -> List[Tuple[int, int]]:
    """Per-image [start, end) text-token spans (HF processing_mllama.py
    get_cross_attention_token_mask): image i is visible from its
    <|image|> token position until the next image token; the LAST image
    (and any consecutive group ending the list) stays open to the end
    of the sequence — including all generated tokens (HF generate
    repeats the final mask row). Open ends are encoded as OPEN_END."""
    locs = [i for i, t in enumerate(token_ids) if t == image_token_id]
    locs = locs[:num_images]
    if not locs:
        return []
    n = len(token_ids)
    if len(locs) == 1:
        spans = [[locs[0], n]]
    else:
        spans = [[a, b] for a, b in zip(locs[:-1], locs[1:])]
        spans.append([locs[-1], n])
        # consecutive image tokens form a group attending all subsequent
        # text together (HF reverse loop: a length-1 span inherits the
        # following span's end)
        last_end = spans[-1][1]
        for sp in spans[::-1]:
            if sp[0] == sp[1] - 1:
                sp[1] = last_end
            last_end = sp[1]
    # spans reaching the end of the prompt stay open through generation
    # (HF generate repeats the final mask row for each new token)
    return [(a, int(OPEN_END) if b >= n else b) for a, b in spans]


def build_cross_meta(
    spans: List[Tuple[int, int]],
    num_tiles: List[int],
    max_num_tiles: int,
    tokens_per_tile: int,
    capacity: int,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Per-cross-KV-position token windows.

    Image i occupies kv positions [i*max_num_tiles*tokens_per_tile, ...)
    — its VALID tiles carry the image's [start, end) span; padding tiles
    carry an empty window (never attended when any image is visible;
    HF's zeroed full rows attend the whole width, which the kernel
    handles via the returned width). Returns (tok_lo [cap], tok_hi
    [cap], width)."""
    tok_lo = np.full(capacity, int(OPEN_END), np.int32)
    tok_hi = np.zeros(capacity, np.int32)
    per_img = max_num_tiles * tokens_per_tile
    width = len(spans) * per_img
    if width > capacity:
        raise ValueError(
            f"cross-KV width {width} exceeds capacity {capacity}; raise "
            "--max-cross-tokens or send fewer images"
        )
    for i, (a, b) in enumerate(spans):
        nt = num_tiles[i] if i < len(num_tiles) else max_num_tiles
        lo = i * per_img
        hi = lo + nt * tokens_per_tile
        tok_lo[lo:hi] = a
        tok_hi[lo:hi] = b
    return tok_lo, tok_hi, width


def build_dense_cross_ctx(
    lm_params: Params,
    tcfg: ModelConfig,
    cross_states: jax.Array,  # [W, H]
    tok_lo: np.ndarray,  # [Lc] i32
    tok_hi: np.ndarray,
    width: int,
    seq_len: int,
) -> Dict[str, Any]:
    """Single-sequence cross_ctx for decoder.dense_forward (parity
    tests): per-layer K = k_norm(k_proj(states)), V = v_proj(states) —
    the same projection admit_cross performs into the serving buffers."""
    from ..ops.layers import linear, rms_norm

    lc = tok_lo.shape[0]
    cs = cross_states
    if cs.shape[0] < lc:
        cs = jnp.pad(cs, ((0, lc - cs.shape[0]), (0, 0)))
    kv = []
    for li in sorted(tcfg.cross_attention_layers):
        cp = lm_params["layers"][li]["cross"]
        k = linear(cs, cp["k_proj"]).reshape(
            lc, tcfg.num_key_value_heads, tcfg.head_dim
        )
        k = rms_norm(k, cp["k_norm"], tcfg.rms_norm_eps)
        v = linear(cs, cp["v_proj"]).reshape(
            lc, tcfg.num_key_value_heads, tcfg.head_dim
        )
        kv.append((k[None], v[None]))
    return {
        "kv": kv,
        "tok_lo": jnp.asarray(tok_lo, jnp.int32)[None],
        "tok_hi": jnp.asarray(tok_hi, jnp.int32)[None],
        "width": jnp.asarray([width], jnp.int32),
        "row_slot": jnp.zeros((seq_len,), jnp.int32),
        "positions": jnp.arange(seq_len, dtype=jnp.int32),
    }


# --------------------------------------------------------------------- model
class MllamaMultimodalLM:
    """Engine-facing wrapper: owns the vision tower + projector and
    builds per-request cross payloads; the text stack loads through the
    shared decoder (cross layers in params['layers'][i]['cross'])."""

    def __init__(self, model_path: str, dtype: Optional[str] = None):
        self.model_path = model_path
        self._dtype = dtype
        self._loaded = False

    def load(self) -> "MllamaMultimodalLM":
        if self._loaded:
            return self
        with open(os.path.join(self.model_path, "config.json")) as f:
            cfg = json.load(f)
        self.vision_cfg = MllamaVisionConfig.from_hf_config(
            cfg.get("vision_config", {})
        )
        self.text_cfg = ModelConfig.from_hf_config(
            {**cfg.get("text_config", {}),
             "model_type": "mllama_text_model"}
        )
        self.image_token_id = cfg.get("image_token_index", 128256)
        from . import loader

        params = load_mllama_params(
            self.model_path, self.vision_cfg, self.text_cfg, self._dtype
        )
        self.vision_params = params["vision"]
        self.projector = params["projector"]
        self._lm_params = params["lm"]
        self._encode_jit = jax.jit(self._encode)
        self._loaded = True
        return self

    @property
    def text_config(self) -> ModelConfig:
        return self.text_cfg

    @property
    def lm_params(self) -> Params:
        return self._lm_params

    @property
    def tokens_per_tile(self) -> int:
        return self.vision_cfg.num_patches

    def _encode(self, vision_params, projector, pixel_values, ar_ids, ar_mask):
        feats = vision_encode(
            vision_params, self.vision_cfg, pixel_values, ar_ids, ar_mask
        )  # [N, tiles, np1, 7680]
        n, tiles, np1, _ = feats.shape
        cs = feats @ projector["w"].T.astype(feats.dtype)
        cs = cs + projector["b"].astype(cs.dtype)
        return cs.reshape(n * tiles * np1, -1)

    def encode_images(
        self,
        pixel_values: np.ndarray,  # [N, max_tiles, C, H, W]
        aspect_ratio_ids: np.ndarray,  # [N]
        aspect_ratio_mask: np.ndarray,  # [N, max_tiles]
    ) -> jax.Array:
        """-> cross_attention_states [N*max_tiles*num_patches, H_text]
        (device array; stays on device for cross-KV projection)."""
        return self._encode_jit(
            self.vision_params,
            self.projector,
            jnp.asarray(pixel_values),
            jnp.asarray(aspect_ratio_ids, jnp.int32),
            jnp.asarray(aspect_ratio_mask, jnp.int32),
        )


def load_mllama_params(
    path: str,
    vcfg: MllamaVisionConfig,
    tcfg: ModelConfig,
    dtype: Optional[str] = None,
) -> Params:
    """Split an HF MllamaForConditionalGeneration checkpoint."""
    from . import loader

    jdt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        dtype or tcfg.dtype
    ]

    def put(t):
        return jnp.asarray(np.asarray(t)).astype(jdt)

    vision: Params = {
        "local_layers": [dict() for _ in range(vcfg.num_hidden_layers)],
        "global_layers": [dict() for _ in range(vcfg.num_global_layers)],
        "gated_pos": {},
        "pre_tile": {},
        "post_tile": {},
    }
    projector: Params = {}
    for name, tensor in loader.iter_safetensors(path):
        if name.startswith("multi_modal_projector."):
            key = "w" if name.endswith("weight") else "b"
            projector[key] = put(tensor)
            continue
        if not name.startswith("vision_model."):
            continue
        n = name[len("vision_model."):]
        if n == "patch_embedding.weight":
            vision["patch_embed"] = put(tensor)
        elif n == "class_embedding":
            vision["class_embed"] = put(tensor)
        elif n == "gated_positional_embedding.gate":
            vision["gated_pos"]["gate"] = put(tensor)
        elif n == "gated_positional_embedding.embedding":
            vision["gated_pos"]["embed"] = put(tensor)
        elif n == "gated_positional_embedding.tile_embedding.weight":
            vision["gated_pos"]["tile_embed"] = put(tensor)
        elif n.startswith(("pre_tile_positional_embedding.",
                           "post_tile_positional_embedding.")):
            tgt = vision[
                "pre_tile" if n.startswith("pre_") else "post_tile"
            ]
            if n.endswith("gate"):
                tgt["gate"] = put(tensor)
            else:
                tgt["embed"] = put(tensor)
        elif n.startswith("layernorm_pre."):
            vision["ln_pre_w" if n.endswith("weight") else "ln_pre_b"] = put(
                tensor
            )
        elif n.startswith("layernorm_post."):
            vision[
                "ln_post_w" if n.endswith("weight") else "ln_post_b"
            ] = put(tensor)
        elif n.startswith(("transformer.layers.",
                           "global_transformer.layers.")):
            is_global = n.startswith("global_")
            rest = n.split("layers.", 1)[1]
            idx_s, sub = rest.split(".", 1)
            lp = vision["global_layers" if is_global else "local_layers"][
                int(idx_s)
            ]
            m = {
                "self_attn.q_proj.weight": "q_w",
                "self_attn.k_proj.weight": "k_w",
                "self_attn.v_proj.weight": "v_w",
                "self_attn.o_proj.weight": "o_w",
                "input_layernorm.weight": "ln1_w",
                "input_layernorm.bias": "ln1_b",
                "post_attention_layernorm.weight": "ln2_w",
                "post_attention_layernorm.bias": "ln2_b",
                "mlp.fc1.weight": "fc1_w",
                "mlp.fc1.bias": "fc1_b",
                "mlp.fc2.weight": "fc2_w",
                "mlp.fc2.bias": "fc2_b",
                "gate_attn": "gate_attn",
                "gate_ffn": "gate_ffn",
            }.get(sub)
            if m:
                lp[m] = put(tensor)
    lm = loader.load_params(path, tcfg, dtype=dtype)
    return {"vision": vision, "projector": projector, "lm": lm}

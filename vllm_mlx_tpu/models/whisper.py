# SPDX-License-Identifier: Apache-2.0
"""Whisper encoder-decoder in JAX.

The reference wraps mlx-audio's native Whisper (reference audio/stt.py:32
``STTEngine``); the TPU build owns the model: conv+transformer encoder
runs once per 30 s segment, the decoder greedy-decodes *all segments as
one batch* with a dense KV cache — long audio becomes one batched
compiled program rather than a per-file loop (north star RTF > 100x,
SURVEY.md section 2.6).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.layers import linear

Params = Dict[str, Any]


@dataclass
class WhisperConfig:
    vocab_size: int = 51865
    num_mel_bins: int = 80
    d_model: int = 384
    encoder_layers: int = 4
    encoder_attention_heads: int = 6
    decoder_layers: int = 4
    decoder_attention_heads: int = 6
    encoder_ffn_dim: int = 1536
    decoder_ffn_dim: int = 1536
    max_source_positions: int = 1500
    max_target_positions: int = 448
    decoder_start_token_id: int = 50258
    eos_token_id: int = 50257
    suppress_tokens: Optional[List[int]] = None
    begin_suppress_tokens: Optional[List[int]] = None
    forced_decoder_ids: Optional[List[List[int]]] = None

    @classmethod
    def from_pretrained(cls, path: str) -> "WhisperConfig":
        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        gen = {}
        gc_path = os.path.join(path, "generation_config.json")
        if os.path.exists(gc_path):
            with open(gc_path) as f:
                gen = json.load(f)
        return cls(
            vocab_size=cfg["vocab_size"],
            num_mel_bins=cfg.get("num_mel_bins", 80),
            d_model=cfg["d_model"],
            encoder_layers=cfg["encoder_layers"],
            encoder_attention_heads=cfg["encoder_attention_heads"],
            decoder_layers=cfg["decoder_layers"],
            decoder_attention_heads=cfg["decoder_attention_heads"],
            encoder_ffn_dim=cfg["encoder_ffn_dim"],
            decoder_ffn_dim=cfg["decoder_ffn_dim"],
            max_source_positions=cfg.get("max_source_positions", 1500),
            max_target_positions=cfg.get("max_target_positions", 448),
            decoder_start_token_id=cfg.get("decoder_start_token_id", 50258),
            eos_token_id=cfg.get("eos_token_id", 50257),
            suppress_tokens=gen.get("suppress_tokens")
            or cfg.get("suppress_tokens"),
            begin_suppress_tokens=gen.get("begin_suppress_tokens")
            or cfg.get("begin_suppress_tokens"),
            forced_decoder_ids=gen.get("forced_decoder_ids")
            or cfg.get("forced_decoder_ids"),
        )


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _gelu(x):
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def _mha(
    q: jax.Array,  # [B, Tq, D]
    k: jax.Array,  # [B, Tk, D]
    v: jax.Array,
    heads: int,
    mask: Optional[jax.Array] = None,  # [Tq, Tk] bool or additive f32
) -> jax.Array:
    b, tq, d = q.shape
    tk = k.shape[1]
    hd = d // heads
    qh = q.reshape(b, tq, heads, hd)
    kh = k.reshape(b, tk, heads, hd)
    vh = v.reshape(b, tk, heads, hd)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * (hd**-0.5)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, vh, preferred_element_type=jnp.float32
    )
    return out.reshape(b, tq, d).astype(q.dtype)


def _attn_block(p, x_q, x_kv, heads, mask=None):
    q = linear(x_q, p["q_w"], p.get("q_b"))
    k = linear(x_kv, p["k_w"], p.get("k_b"))
    v = linear(x_kv, p["v_w"], p.get("v_b"))
    out = _mha(q, k, v, heads, mask)
    return linear(out, p["o_w"], p.get("o_b"))


def encode(params: Params, cfg: WhisperConfig, mel: jax.Array) -> jax.Array:
    """mel [B, n_mels, 3000] -> encoder states [B, 1500, D]."""
    enc = params["encoder"]
    x = mel.transpose(0, 2, 1)  # [B, T, n_mels]
    # conv1: k=3 s=1 p=1 ; conv2: k=3 s=2 p=1 (weights [D, C, 3])
    x = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        enc["conv1_w"].astype(jnp.float32),
        window_strides=(1,),
        padding=((1, 1),),
        dimension_numbers=("NWC", "OIW", "NWC"),
    ) + enc["conv1_b"]
    x = _gelu(x)
    x = jax.lax.conv_general_dilated(
        x,
        enc["conv2_w"].astype(jnp.float32),
        window_strides=(2,),
        padding=((1, 1),),
        dimension_numbers=("NWC", "OIW", "NWC"),
    ) + enc["conv2_b"]
    x = _gelu(x).astype(mel.dtype)
    x = x + enc["pos"][None, : x.shape[1]]
    for p in enc["layers"]:
        h = _ln(x, p["ln1_w"], p["ln1_b"])
        x = x + _attn_block(p["self"], h, h, cfg.encoder_attention_heads)
        h = _ln(x, p["ln2_w"], p["ln2_b"])
        h = _gelu(linear(h, p["fc1_w"], p["fc1_b"]))
        x = x + linear(h, p["fc2_w"], p["fc2_b"])
    return _ln(x, enc["ln_w"], enc["ln_b"])


def decoder_cross_kv(
    params: Params, cfg: WhisperConfig, enc_out: jax.Array
) -> List[Tuple[jax.Array, jax.Array]]:
    """Precompute each decoder layer's cross-attention K/V once."""
    out = []
    for p in params["decoder"]["layers"]:
        k = linear(enc_out, p["cross"]["k_w"], p["cross"].get("k_b"))
        v = linear(enc_out, p["cross"]["v_w"], p["cross"].get("v_b"))
        out.append((k, v))
    return out


def decode_step(
    params: Params,
    cfg: WhisperConfig,
    tokens: jax.Array,  # [B, T] (prompt) or [B, 1] (incremental)
    pos_offset: jax.Array,  # scalar: position of tokens[:, 0]
    self_kv: List[jax.Array],  # per layer [B, max_len, 2, D]
    cross_kv: List[Tuple[jax.Array, jax.Array]],
    kv_len: jax.Array,  # scalar: valid cache length before this call
) -> Tuple[jax.Array, List[jax.Array]]:
    """Returns (logits [B, T, V], updated self_kv)."""
    dec = params["decoder"]
    b, t = tokens.shape
    x = jnp.take(dec["embed_tokens"], tokens, axis=0)
    positions = pos_offset + jnp.arange(t)
    x = x + jnp.take(dec["pos"], positions, axis=0)[None]
    max_len = self_kv[0].shape[1]
    new_kv = []
    for i, p in enumerate(dec["layers"]):
        h = _ln(x, p["ln1_w"], p["ln1_b"])
        q = linear(h, p["self"]["q_w"], p["self"].get("q_b"))
        k_new = linear(h, p["self"]["k_w"], p["self"].get("k_b"))
        v_new = linear(h, p["self"]["v_w"], p["self"].get("v_b"))
        kv = jax.lax.dynamic_update_slice(
            self_kv[i],
            jnp.stack([k_new, v_new], axis=2).astype(self_kv[i].dtype),
            (0, kv_len, 0, 0),
        )
        new_kv.append(kv)
        k_all = kv[:, :, 0]
        v_all = kv[:, :, 1]
        cache_pos = jnp.arange(max_len)
        q_pos = positions
        mask = jnp.where(
            cache_pos[None, :] <= q_pos[:, None], 0.0, -1e9
        )  # [T, max_len]
        heads = cfg.decoder_attention_heads
        attn = _mha(q, k_all, v_all, heads, mask[None, None])
        x = x + linear(attn, p["self"]["o_w"], p["self"].get("o_b"))
        h = _ln(x, p["ln2_w"], p["ln2_b"])
        qc = linear(h, p["cross"]["q_w"], p["cross"].get("q_b"))
        kc, vc = cross_kv[i]
        attn = _mha(qc, kc, vc, heads)
        x = x + linear(attn, p["cross"]["o_w"], p["cross"].get("o_b"))
        h = _ln(x, p["ln3_w"], p["ln3_b"])
        h = _gelu(linear(h, p["fc1_w"], p["fc1_b"]))
        x = x + linear(h, p["fc2_w"], p["fc2_b"])
    x = _ln(x, dec["ln_w"], dec["ln_b"])
    logits = jnp.einsum(
        "btd,vd->btv", x, dec["embed_tokens"],
        preferred_element_type=jnp.float32,
    )
    return logits, new_kv


def init_self_kv(
    cfg: WhisperConfig, batch: int, dtype=jnp.float32
) -> List[jax.Array]:
    return [
        jnp.zeros(
            (batch, cfg.max_target_positions, 2, cfg.d_model), dtype=dtype
        )
        for _ in range(cfg.decoder_layers)
    ]


def load_whisper_params(
    path: str, cfg: WhisperConfig, dtype=jnp.float32
) -> Params:
    from .loader import iter_safetensors

    enc: Params = {"layers": [dict() for _ in range(cfg.encoder_layers)]}
    dec: Params = {"layers": [dict() for _ in range(cfg.decoder_layers)]}

    def put(t):
        return jnp.asarray(t).astype(dtype)

    def attn_key(rest):
        m = {
            "q_proj.weight": ("q_w", None), "q_proj.bias": ("q_b", None),
            "k_proj.weight": ("k_w", None), "k_proj.bias": ("k_b", None),
            "v_proj.weight": ("v_w", None), "v_proj.bias": ("v_b", None),
            "out_proj.weight": ("o_w", None), "out_proj.bias": ("o_b", None),
        }
        return m.get(rest, (None, None))[0]

    for name, tensor in iter_safetensors(path):
        n = name
        if n.startswith("model."):
            n = n[6:]
        if n.startswith("encoder."):
            sub = n[8:]
            if sub == "conv1.weight":
                enc["conv1_w"] = put(tensor)
            elif sub == "conv1.bias":
                enc["conv1_b"] = put(tensor)
            elif sub == "conv2.weight":
                enc["conv2_w"] = put(tensor)
            elif sub == "conv2.bias":
                enc["conv2_b"] = put(tensor)
            elif sub == "embed_positions.weight":
                enc["pos"] = put(tensor)
            elif sub == "layer_norm.weight":
                enc["ln_w"] = put(tensor)
            elif sub == "layer_norm.bias":
                enc["ln_b"] = put(tensor)
            elif sub.startswith("layers."):
                parts = sub.split(".")
                i = int(parts[1])
                rest = ".".join(parts[2:])
                ld = enc["layers"][i]
                if rest.startswith("self_attn."):
                    key = attn_key(rest[len("self_attn."):])
                    if key:
                        ld.setdefault("self", {})[key] = put(tensor)
                elif rest == "self_attn_layer_norm.weight":
                    ld["ln1_w"] = put(tensor)
                elif rest == "self_attn_layer_norm.bias":
                    ld["ln1_b"] = put(tensor)
                elif rest == "final_layer_norm.weight":
                    ld["ln2_w"] = put(tensor)
                elif rest == "final_layer_norm.bias":
                    ld["ln2_b"] = put(tensor)
                elif rest == "fc1.weight":
                    ld["fc1_w"] = put(tensor)
                elif rest == "fc1.bias":
                    ld["fc1_b"] = put(tensor)
                elif rest == "fc2.weight":
                    ld["fc2_w"] = put(tensor)
                elif rest == "fc2.bias":
                    ld["fc2_b"] = put(tensor)
        elif n.startswith("decoder."):
            sub = n[8:]
            if sub == "embed_tokens.weight":
                dec["embed_tokens"] = put(tensor)
            elif sub == "embed_positions.weight":
                dec["pos"] = put(tensor)
            elif sub == "layer_norm.weight":
                dec["ln_w"] = put(tensor)
            elif sub == "layer_norm.bias":
                dec["ln_b"] = put(tensor)
            elif sub.startswith("layers."):
                parts = sub.split(".")
                i = int(parts[1])
                rest = ".".join(parts[2:])
                ld = dec["layers"][i]
                if rest.startswith("self_attn."):
                    key = attn_key(rest[len("self_attn."):])
                    if key:
                        ld.setdefault("self", {})[key] = put(tensor)
                elif rest.startswith("encoder_attn."):
                    key = attn_key(rest[len("encoder_attn."):])
                    if key:
                        ld.setdefault("cross", {})[key] = put(tensor)
                elif rest == "self_attn_layer_norm.weight":
                    ld["ln1_w"] = put(tensor)
                elif rest == "self_attn_layer_norm.bias":
                    ld["ln1_b"] = put(tensor)
                elif rest == "encoder_attn_layer_norm.weight":
                    ld["ln2_w"] = put(tensor)
                elif rest == "encoder_attn_layer_norm.bias":
                    ld["ln2_b"] = put(tensor)
                elif rest == "final_layer_norm.weight":
                    ld["ln3_w"] = put(tensor)
                elif rest == "final_layer_norm.bias":
                    ld["ln3_b"] = put(tensor)
                elif rest == "fc1.weight":
                    ld["fc1_w"] = put(tensor)
                elif rest == "fc1.bias":
                    ld["fc1_b"] = put(tensor)
                elif rest == "fc2.weight":
                    ld["fc2_w"] = put(tensor)
                elif rest == "fc2.bias":
                    ld["fc2_b"] = put(tensor)
    return {"encoder": enc, "decoder": dec}

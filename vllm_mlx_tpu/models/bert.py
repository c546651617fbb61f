# SPDX-License-Identifier: Apache-2.0
"""BERT-family encoder (BERT / RoBERTa / XLM-RoBERTa / ModernBERT) in
JAX.

Backs the embedding and rerank towers. The reference hand-writes exactly
this forward in MLX for its reranker (reference rerank_forward.py:16-253
classifier_forward/encoder-layer/activations) and delegates embeddings
to mlx-embeddings; here one batched implementation serves both.
ModernBERT (reference docs/reference/models.md embeddings table) adds
rotary positions, alternating global/local symmetric-window attention,
GeGLU MLPs and bias-free LayerNorms (HF modeling_modernbert.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.layers import linear

Params = Dict[str, Any]


@dataclass
class BertConfig:
    model_type: str = "bert"
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"
    pad_token_id: int = 0
    num_labels: int = 1
    # ModernBERT: every n-th layer attends globally, the rest use a
    # symmetric |i-j| <= local_attention // 2 window; rope thetas per
    # layer kind (HF ModernBertAttention.__init__)
    global_attn_every_n_layers: int = 3
    local_attention: int = 128
    global_rope_theta: float = 160000.0
    local_rope_theta: Optional[float] = 10000.0

    @property
    def position_offset(self) -> int:
        # RoBERTa-style models offset positions by pad_token_id + 1
        return (
            self.pad_token_id + 1
            if self.model_type in ("roberta", "xlm-roberta", "camembert")
            else 0
        )

    @classmethod
    def from_hf_config(cls, cfg: Dict[str, Any]) -> "BertConfig":
        return cls(
            model_type=cfg.get("model_type", "bert"),
            vocab_size=cfg.get("vocab_size", 30522),
            hidden_size=cfg.get("hidden_size", 768),
            num_hidden_layers=cfg.get("num_hidden_layers", 12),
            num_attention_heads=cfg.get("num_attention_heads", 12),
            intermediate_size=cfg.get("intermediate_size", 3072),
            max_position_embeddings=cfg.get("max_position_embeddings", 512),
            type_vocab_size=cfg.get("type_vocab_size", 2),
            layer_norm_eps=cfg.get(
                "layer_norm_eps", cfg.get("norm_eps", 1e-12)
            ),
            hidden_act=cfg.get(
                "hidden_activation", cfg.get("hidden_act", "gelu")
            ),
            pad_token_id=cfg.get("pad_token_id", 0),
            num_labels=len(cfg.get("id2label", {0: ""})) or 1,
            global_attn_every_n_layers=cfg.get(
                "global_attn_every_n_layers", 3
            ),
            local_attention=cfg.get("local_attention", 128),
            global_rope_theta=cfg.get("global_rope_theta", 160000.0),
            local_rope_theta=cfg.get("local_rope_theta", 10000.0),
        )

    @classmethod
    def from_pretrained(cls, path: str) -> "BertConfig":
        import json
        import os

        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_config(json.load(f))


def _layer_norm(x, weight, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * weight + bias).astype(x.dtype)


def _act(name: str, x):
    if name in ("gelu", "gelu_new", "gelu_pytorch_tanh"):
        approx = name != "gelu"
        return jax.nn.gelu(x.astype(jnp.float32), approximate=approx).astype(
            x.dtype
        )
    if name == "relu":
        return jnp.maximum(x, 0)
    if name == "silu":
        return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)
    raise ValueError(f"unknown activation {name}")


def _rope_rotate(x: jax.Array, theta: float) -> jax.Array:
    """Standard rotate-half rope over the full head_dim, positions
    0..L-1 (HF ModernBertRotaryEmbedding). x: [B, L, h, hd]."""
    hd = x.shape[-1]
    inv = 1.0 / (
        theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)
    )
    ang = jnp.arange(x.shape[1], dtype=jnp.float32)[:, None] * inv[None]
    cos = jnp.cos(ang)[None, :, None, :]  # [1, L, 1, hd/2]
    sin = jnp.sin(ang)[None, :, None, :]
    x1, x2 = x[..., : hd // 2], x[..., hd // 2 :]
    xf1 = x1.astype(jnp.float32)
    xf2 = x2.astype(jnp.float32)
    return jnp.concatenate(
        [xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1
    ).astype(x.dtype)


def _encode_modernbert(
    params: Params,
    cfg: BertConfig,
    input_ids: jax.Array,  # [B, L]
    attention_mask: jax.Array,  # [B, L] 1=token
) -> jax.Array:
    """ModernBERT forward (HF ModernBertModel): rotary positions,
    layer 0's attn_norm is Identity, global attention on every
    global_attn_every_n_layers-th layer, symmetric local window
    otherwise, GeGLU MLP (act(input-half) * gate-half)."""
    b, l = input_ids.shape
    emb = params["embeddings"]
    zero = jnp.zeros((cfg.hidden_size,), jnp.float32)
    x = jnp.take(emb["word"], input_ids, axis=0)
    x = _layer_norm(x, emb["ln_w"], zero, cfg.layer_norm_eps)

    h = cfg.num_attention_heads
    hd = cfg.hidden_size // h
    scale = hd**-0.5
    pad_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
    pos = jnp.arange(l)
    near = (
        jnp.abs(pos[:, None] - pos[None, :]) <= cfg.local_attention // 2
    )
    local_bias = pad_bias + jnp.where(near, 0.0, -1e9)[None, None]
    for i, p in enumerate(params["layers"]):
        is_global = i % cfg.global_attn_every_n_layers == 0
        hin = (
            x
            if i == 0
            else _layer_norm(x, p["attn_ln_w"], zero, cfg.layer_norm_eps)
        )
        qkv = linear(hin, p["qkv_w"], None).reshape(b, l, 3, h, hd)
        theta = (
            cfg.global_rope_theta
            if is_global
            else (cfg.local_rope_theta or cfg.global_rope_theta)
        )
        q = _rope_rotate(qkv[:, :, 0], theta)
        k = _rope_rotate(qkv[:, :, 1], theta)
        v = qkv[:, :, 2]
        scores = (
            jnp.einsum(
                "bqhd,bkhd->bhqk", q, k,
                preferred_element_type=jnp.float32,
            )
            * scale
            + (pad_bias if is_global else local_bias)
        )
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v,
            preferred_element_type=jnp.float32,
        ).reshape(b, l, cfg.hidden_size).astype(x.dtype)
        x = x + linear(ctx, p["o_w"], None)
        hin = _layer_norm(x, p["ff_ln_w"], zero, cfg.layer_norm_eps)
        wi = linear(hin, p["ff1_w"], None)
        inp, gate = jnp.split(wi, 2, axis=-1)
        x = x + linear(_act(cfg.hidden_act, inp) * gate, p["ff2_w"], None)
    return _layer_norm(
        x, params["final_ln_w"], zero, cfg.layer_norm_eps
    )


def encode(
    params: Params,
    cfg: BertConfig,
    input_ids: jax.Array,  # [B, L]
    attention_mask: jax.Array,  # [B, L] 1=token
    token_type_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Returns final hidden states [B, L, H]."""
    if cfg.model_type == "modernbert":
        return _encode_modernbert(params, cfg, input_ids, attention_mask)
    b, l = input_ids.shape
    emb = params["embeddings"]
    positions = jnp.arange(l) + cfg.position_offset
    x = (
        jnp.take(emb["word"], input_ids, axis=0)
        + jnp.take(emb["position"], positions, axis=0)[None]
    )
    if "token_type" in emb:
        tt = (
            token_type_ids
            if token_type_ids is not None
            else jnp.zeros_like(input_ids)
        )
        x = x + jnp.take(emb["token_type"], tt, axis=0)
    x = _layer_norm(x, emb["ln_w"], emb["ln_b"], cfg.layer_norm_eps)

    h = cfg.num_attention_heads
    hd = cfg.hidden_size // h
    scale = hd**-0.5
    # additive mask: [B, 1, 1, L]
    bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
    for p in params["layers"]:
        q = linear(x, p["q_w"], p["q_b"]).reshape(b, l, h, hd)
        k = linear(x, p["k_w"], p["k_b"]).reshape(b, l, h, hd)
        v = linear(x, p["v_w"], p["v_b"]).reshape(b, l, h, hd)
        scores = (
            jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
            * scale
            + bias
        )
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
        ).reshape(b, l, cfg.hidden_size).astype(x.dtype)
        attn_out = linear(ctx, p["o_w"], p["o_b"])
        x = _layer_norm(
            x + attn_out, p["attn_ln_w"], p["attn_ln_b"], cfg.layer_norm_eps
        )
        ff = _act(cfg.hidden_act, linear(x, p["ff1_w"], p["ff1_b"]))
        ff = linear(ff, p["ff2_w"], p["ff2_b"])
        x = _layer_norm(x + ff, p["ff_ln_w"], p["ff_ln_b"], cfg.layer_norm_eps)
    return x


def mean_pool(hidden: jax.Array, attention_mask: jax.Array) -> jax.Array:
    """Masked mean over tokens -> [B, H]."""
    m = attention_mask[..., None].astype(jnp.float32)
    s = jnp.sum(hidden.astype(jnp.float32) * m, axis=1)
    return s / jnp.maximum(jnp.sum(m, axis=1), 1e-9)


def cls_pool(hidden: jax.Array) -> jax.Array:
    return hidden[:, 0, :]


def classify(
    params: Params, cfg: BertConfig, hidden: jax.Array
) -> jax.Array:
    """Sequence-classification logits [B, num_labels] (XLM-R head:
    dense+tanh over CLS, then out_proj — reference rerank_forward.py:16)."""
    head = params["classifier"]
    x = cls_pool(hidden)
    if "dense_w" in head:
        x = jnp.tanh(
            linear(x, head["dense_w"], head["dense_b"]).astype(jnp.float32)
        ).astype(x.dtype)
    return linear(x, head["out_w"], head["out_b"]).astype(jnp.float32)


def load_bert_params(path: str, cfg: BertConfig, dtype=jnp.float32) -> Params:
    """Map HF bert/roberta/xlm-roberta (+SequenceClassification) or
    modernbert weights."""
    from .loader import iter_safetensors

    layers: list = [dict() for _ in range(cfg.num_hidden_layers)]
    params: Params = {"embeddings": {}, "layers": layers}

    def put(t):
        return jnp.asarray(t).astype(dtype)

    if cfg.model_type == "modernbert":
        for name, tensor in iter_safetensors(path):
            n = name[len("model."):] if name.startswith("model.") else name
            if n == "embeddings.tok_embeddings.weight":
                params["embeddings"]["word"] = put(tensor)
            elif n == "embeddings.norm.weight":
                params["embeddings"]["ln_w"] = put(tensor)
            elif n == "final_norm.weight":
                params["final_ln_w"] = put(tensor)
            elif n.startswith("layers."):
                parts = n.split(".")
                i = int(parts[1])
                rest = ".".join(parts[2:])
                key = {
                    "attn_norm.weight": "attn_ln_w",
                    "attn.Wqkv.weight": "qkv_w",
                    "attn.Wo.weight": "o_w",
                    "mlp_norm.weight": "ff_ln_w",
                    "mlp.Wi.weight": "ff1_w",
                    "mlp.Wo.weight": "ff2_w",
                }.get(rest)
                if key:
                    layers[i][key] = put(tensor)
        return params

    for name, tensor in iter_safetensors(path):
        n = name
        for prefix in ("bert.", "roberta.", "model."):
            if n.startswith(prefix):
                n = n[len(prefix):]
                break
        if n.startswith("embeddings."):
            sub = n[len("embeddings."):]
            key = {
                "word_embeddings.weight": "word",
                "position_embeddings.weight": "position",
                "token_type_embeddings.weight": "token_type",
                "LayerNorm.weight": "ln_w",
                "LayerNorm.bias": "ln_b",
            }.get(sub)
            if key:
                params["embeddings"][key] = put(tensor)
        elif n.startswith("encoder.layer."):
            parts = n.split(".")
            i = int(parts[2])
            rest = ".".join(parts[3:])
            key = {
                "attention.self.query.weight": "q_w",
                "attention.self.query.bias": "q_b",
                "attention.self.key.weight": "k_w",
                "attention.self.key.bias": "k_b",
                "attention.self.value.weight": "v_w",
                "attention.self.value.bias": "v_b",
                "attention.output.dense.weight": "o_w",
                "attention.output.dense.bias": "o_b",
                "attention.output.LayerNorm.weight": "attn_ln_w",
                "attention.output.LayerNorm.bias": "attn_ln_b",
                "intermediate.dense.weight": "ff1_w",
                "intermediate.dense.bias": "ff1_b",
                "output.dense.weight": "ff2_w",
                "output.dense.bias": "ff2_b",
                "output.LayerNorm.weight": "ff_ln_w",
                "output.LayerNorm.bias": "ff_ln_b",
            }.get(rest)
            if key:
                layers[i][key] = put(tensor)
        elif n.startswith("pooler.dense."):
            params.setdefault("pooler", {})[
                "w" if n.endswith("weight") else "b"
            ] = put(tensor)
        elif n.startswith("classifier."):
            head = params.setdefault("classifier", {})
            key = {
                "classifier.dense.weight": "dense_w",
                "classifier.dense.bias": "dense_b",
                "classifier.out_proj.weight": "out_w",
                "classifier.out_proj.bias": "out_b",
                "classifier.weight": "out_w",
                "classifier.bias": "out_b",
            }.get(n)
            if key:
                head[key] = put(tensor)
    return params

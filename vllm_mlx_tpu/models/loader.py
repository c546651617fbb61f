# SPDX-License-Identifier: Apache-2.0
"""Checkpoint loading: HF safetensors -> JAX param pytrees.

The reference delegates weight loading to mlx-lm (reference
utils/tokenizer.py:52 ``load_model_with_fallback``); the TPU build owns
it. HF parameter names are mapped onto the pytree layout consumed by
``models.decoder``. MoE expert weights are stacked into
``[num_experts, ...]`` arrays transposed for ``jax.lax.ragged_dot``.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig

Params = Dict[str, Any]

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "float16": jnp.float16,
}


def iter_safetensors(model_path: str) -> Iterator[Tuple[str, np.ndarray]]:
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors files in {model_path}")
    for f in files:
        with safe_open(f, framework="numpy") as st:
            for name in st.keys():
                yield name, st.get_tensor(name)


_GPT2_TOP = {
    "transformer.wte.weight": "embed_tokens.weight",  # GPT-BigCode
    "transformer.word_embeddings.weight": "embed_tokens.weight",  # Falcon
    "transformer.wpe.weight": "pos_embed.weight",
    "transformer.ln_f.weight": "norm.weight",
    "transformer.ln_f.bias": "norm.bias",
}

_GPT2_LAYER = {
    # GPT-BigCode (HF GPTBigCodeBlock)
    "ln_1.weight": "input_layernorm.weight",
    "ln_1.bias": "input_layernorm.bias",
    "ln_2.weight": "post_attention_layernorm.weight",
    "ln_2.bias": "post_attention_layernorm.bias",
    "attn.c_attn.weight": "self_attn.qkv_proj.weight",
    "attn.c_attn.bias": "self_attn.qkv_proj.bias",
    "attn.c_proj.weight": "self_attn.o_proj.weight",
    "attn.c_proj.bias": "self_attn.o_proj.bias",
    "mlp.c_fc.weight": "mlp.c_fc.weight",
    "mlp.c_fc.bias": "mlp.c_fc.bias",
    "mlp.c_proj.weight": "mlp.c_proj.weight",
    "mlp.c_proj.bias": "mlp.c_proj.bias",
    # Falcon (HF FalconDecoderLayer, classic 7B layout)
    "self_attention.query_key_value.weight": "self_attn.qkv_proj.weight",
    "self_attention.query_key_value.bias": "self_attn.qkv_proj.bias",
    "self_attention.dense.weight": "self_attn.o_proj.weight",
    "self_attention.dense.bias": "self_attn.o_proj.bias",
    "mlp.dense_h_to_4h.weight": "mlp.c_fc.weight",
    "mlp.dense_h_to_4h.bias": "mlp.c_fc.bias",
    "mlp.dense_4h_to_h.weight": "mlp.c_proj.weight",
    "mlp.dense_4h_to_h.bias": "mlp.c_proj.bias",
}


_NEOX_LAYER = {
    "attention.query_key_value.weight": "self_attn.qkv_interleaved.weight",
    "attention.query_key_value.bias": "self_attn.qkv_interleaved.bias",
    "attention.dense.weight": "self_attn.o_proj.weight",
    "attention.dense.bias": "self_attn.o_proj.bias",
    "mlp.dense_h_to_4h.weight": "mlp.c_fc.weight",
    "mlp.dense_h_to_4h.bias": "mlp.c_fc.bias",
    "mlp.dense_4h_to_h.weight": "mlp.c_proj.weight",
    "mlp.dense_4h_to_h.bias": "mlp.c_proj.bias",
}


def _neox_rename(name: str) -> str:
    """GPT-NeoX/Pythia names onto the standard scheme. The fused qkv is
    INTERLEAVED per head ([h, 3, hd] rows — HF GPTNeoXAttention), so it
    maps to a dedicated qkv_interleaved key the parser de-interleaves."""
    top = {
        "gpt_neox.embed_in.weight": "embed_tokens.weight",
        "gpt_neox.final_layer_norm.weight": "norm.weight",
        "gpt_neox.final_layer_norm.bias": "norm.bias",
        "embed_out.weight": "lm_head.weight",
    }
    if name in top:
        return top[name]
    if name.startswith("gpt_neox.layers."):
        parts = name.split(".", 3)
        rest = _NEOX_LAYER.get(parts[3], parts[3])
        return f"layers.{parts[2]}.{rest}"
    return name


def _gpt2_style_rename(name: str) -> str:
    """Canonicalize GPT-2-family checkpoint names (GPT-BigCode /
    Falcon ``transformer.h.N.*``) onto the standard scheme so the main
    parser handles them: fused c_attn/query_key_value ride the Phi-3
    qkv_proj split (rows [q; k; v] with cfg head sizes — GPT-BigCode
    MQA stores q(H) then k,v(kv_dim) exactly like that)."""
    if name in _GPT2_TOP:
        return _GPT2_TOP[name]
    if name.startswith("transformer.h."):
        parts = name.split(".", 3)
        rest = _GPT2_LAYER.get(parts[3], parts[3])
        return f"layers.{parts[2]}.{rest}"
    return name


def _rg_rename(name: str) -> str:
    """RecurrentGemma (Griffin) names onto the standard scheme (applied
    after _strip). Attention temporal blocks carry {q,k,v,o}_proj and
    map straight to self_attn; recurrent temporal blocks (linear_x/y/
    out, conv_1d, rg_lru.*) map to a dedicated ``rg.`` prefix the
    parser assembles into the layer's rg_lru mixer dict."""
    if name == "final_norm.weight":
        return "norm.weight"
    if not name.startswith("layers."):
        return name
    pre, _, rest = name.partition(".")
    idx, _, rest = rest.partition(".")
    if rest.startswith("temporal_pre_norm."):
        rest = "input_layernorm." + rest.split(".", 1)[1]
    elif rest.startswith("channel_pre_norm."):
        rest = "post_attention_layernorm." + rest.split(".", 1)[1]
    elif rest.startswith("mlp_block."):
        rest = "mlp." + rest.split(".", 1)[1]
    elif rest.startswith("temporal_block."):
        sub = rest.split(".", 1)[1]
        if sub.split(".", 1)[0] in ("q_proj", "k_proj", "v_proj", "o_proj"):
            rest = "self_attn." + sub
        else:
            rest = "rg." + sub
    return f"{pre}.{idx}.{rest}"


def _strip(name: str) -> str:
    for prefix in (
        "model.language_model.",  # Qwen-VL (new transformers layout)
        "model.text_model.",  # Idefics3/SmolVLM
        "thinker.model.",  # Qwen2.5-Omni (thinker LM inside the omni tree)
        "thinker.",  # Qwen2.5-Omni thinker lm_head
        "model.",
        "language_model.model.",
        "language_model.",
        "text_model.",
        "backbone.",  # Mamba2
    ):
        if name.startswith(prefix):
            return name[len(prefix):]
    return name


def _parse_layer_tensor(
    cfg: ModelConfig,
    ld: Params,
    rest: str,
    tensor: np.ndarray,
    put,
    stage: Dict[str, Dict[int, np.ndarray]],
    lt: Optional[str],
) -> None:
    """Map one ``layers.{i}.<rest>`` checkpoint tensor into the layer
    dict ``ld`` (shared by load_params and load_mtp_params; ``stage``
    collects per-expert MoE weights for stacking, ``lt`` is the layer's
    layer_types entry or None)."""
    if rest.startswith("cross_attn.") or rest.startswith("cross_attn_"):
        # Mllama cross-attention layers (HF MllamaCrossAttentionDecoderLayer)
        sub = rest.split(".", 1)[1] if "." in rest else rest
        key = {
            "q_proj.weight": "q_proj",
            "k_proj.weight": "k_proj",
            "v_proj.weight": "v_proj",
            "o_proj.weight": "o_proj",
            "q_norm.weight": "q_norm",
            "k_norm.weight": "k_norm",
            "cross_attn_attn_gate": "attn_gate",
            "cross_attn_mlp_gate": "mlp_gate",
        }.get(rest if rest.startswith("cross_attn_") else sub)
        if key:
            ld.setdefault("cross", {})[key] = put(tensor)
        return
    if rest in (
        "input_layernorm.weight",
        "norm.weight",
        "operator_norm.weight",  # LFM2
        "attention_layernorm.weight",  # Apertus pre-attention norm
    ):
        # "norm.weight" = pure-Mamba2 block norm
        ld["input_layernorm"] = put(tensor)
    elif rest == "input_layernorm.bias":
        ld["input_layernorm_bias"] = put(tensor)
    elif rest == "post_attention_layernorm.bias":
        ld["post_attention_layernorm_bias"] = put(tensor)
    elif cfg.model_type in ("glm4", "glm4v_text") and rest in (
        # GLM-4 sandwich norms map onto the gemma-style slots:
        # post_self_attn -> post_attention (scales attn out),
        # post_attention -> pre_feedforward (pre-MLP norm),
        # post_mlp -> post_feedforward (scales MLP out)
        "post_self_attn_layernorm.weight",
        "post_attention_layernorm.weight",
        "post_mlp_layernorm.weight",
    ):
        key = {
            "post_self_attn_layernorm.weight":
                "post_attention_layernorm",
            "post_attention_layernorm.weight":
                "pre_feedforward_layernorm",
            "post_mlp_layernorm.weight":
                "post_feedforward_layernorm",
        }[rest]
        ld[key] = put(tensor)
    elif rest in (
        "post_attention_layernorm.weight",
        "pre_ff_layernorm.weight",  # Bamba
        "ffn_norm.weight",  # LFM2
        "feedforward_layernorm.weight",  # Apertus pre-MLP norm
    ):
        ld["post_attention_layernorm"] = put(tensor)
    elif rest.startswith("mlp.act_fn."):
        # Apertus xIELU learnable activation parameters (kept f32;
        # alpha_p/alpha_n are pre-softplus, beta/eps are buffers)
        key = "xielu_" + rest.rsplit(".", 1)[1]
        ld.setdefault("mlp", {})[key] = jnp.asarray(
            np.asarray(tensor).reshape(-1)[:1]
        ).astype(jnp.float32)
    elif rest.startswith("conv.") and cfg.conv_cfg is not None:
        # LFM2 gated short conv (models/short_conv.py)
        sub = rest.split(".", 1)[1]
        sc = ld.setdefault("short_conv", {})
        t = np.asarray(tensor)
        if sub == "conv.weight":  # [H, 1, K] -> [H, K]
            sc["conv_w"] = jnp.asarray(
                t.reshape(t.shape[0], t.shape[-1])
            ).astype(jnp.float32)
        else:
            key = {
                "conv.bias": "conv_b",
                "in_proj.weight": "in_w",
                "in_proj.bias": "in_b",
                "out_proj.weight": "out_w",
                "out_proj.bias": "out_b",
            }.get(sub)
            if key in ("in_w", "out_w"):
                sc[key] = put(t)
            elif key is not None:
                sc[key] = jnp.asarray(t).astype(jnp.float32)
    elif rest.startswith("rg."):
        # RecurrentGemma RG-LRU mixer (models/rg_lru.py). Matmul
        # weights cast to jdt; conv taps, gates and the recurrence
        # parameter stay float32 (decay-sensitive)
        sub = rest[3:]
        rd = ld.setdefault("rg_lru", {})
        t = np.asarray(tensor)
        jdt_keys = {
            "linear_x.weight": "x_w",
            "linear_x.bias": "x_b",
            "linear_y.weight": "y_w",
            "linear_y.bias": "y_b",
            "linear_out.weight": "out_w",
            "linear_out.bias": "out_b",
        }
        f32_keys = {
            "conv_1d.bias": "conv_b",
            "rg_lru.recurrent_param": "a_param",
            "rg_lru.input_gate_weight": "ig_w",
            "rg_lru.input_gate_bias": "ig_b",
            "rg_lru.recurrent_gate_weight": "rg_w",
            "rg_lru.recurrent_gate_bias": "rg_b",
        }
        if sub == "conv_1d.weight":  # [d, 1, K] -> [d, K]
            rd["conv_w"] = jnp.asarray(
                t.reshape(t.shape[0], t.shape[-1])
            ).astype(jnp.float32)
        elif sub in jdt_keys:
            rd[jdt_keys[sub]] = put(t)
        elif sub in f32_keys:
            rd[f32_keys[sub]] = jnp.asarray(t).astype(jnp.float32)
    elif rest.startswith(("mixer.", "mamba.")):
        # Mamba2 SSD mixer (kept float32: states/decays are
        # precision-sensitive; matmul weights cast to jdt)
        sub = rest.split(".", 1)[1]
        md = ld.setdefault("mamba", {})
        t = np.asarray(tensor)
        key = {
            "in_proj.weight": "in_w",
            "in_proj.bias": "in_b",
            "conv1d.bias": "conv_b",
            "dt_bias": "dt_bias",
            "A_log": "a_log",
            "D": "d",
            "norm.weight": "norm_w",
            "out_proj.weight": "out_w",
            "out_proj.bias": "out_b",
            # Mamba-1 extras (models/mamba1.py): x_proj -> (dt, B, C),
            # explicit dt_proj, Jamba's learned dt/B/C RMSNorms
            "x_proj.weight": "x_w",
            "dt_proj.weight": "dt_w",
            "dt_proj.bias": "dt_b",
            "dt_layernorm.weight": "dt_norm_w",
            "b_layernorm.weight": "b_norm_w",
            "c_layernorm.weight": "c_norm_w",
        }.get(sub)
        if sub == "conv1d.weight":  # [cd, 1, K] -> [cd, K]
            md["conv_w"] = jnp.asarray(
                t.reshape(t.shape[0], t.shape[-1])
            ).astype(jnp.float32)
        elif key in ("in_w", "out_w"):
            md[key] = put(t)
        elif key is not None:
            md[key] = jnp.asarray(t).astype(jnp.float32)
    elif rest == "pre_feedforward_layernorm.weight":
        ld["pre_feedforward_layernorm"] = put(tensor)
    elif rest == "post_feedforward_layernorm.weight":
        ld["post_feedforward_layernorm"] = put(tensor)
    elif rest == "self_attn.sinks":
        # GPT-OSS learned per-head attention sink logits (f32:
        # they enter the softmax max/denominator directly)
        ld["sinks"] = jnp.asarray(tensor).astype(jnp.float32)
    elif (
        cfg.model_type == "minimax"
        and lt == "linear_attention"
        and rest.startswith("self_attn.")
    ):
        # lightning layer: HEAD-MAJOR fused qkv stays fused
        key = {
            "self_attn.qkv_proj.weight": "qkv_w",
            "self_attn.out_proj.weight": "out_w",
            "self_attn.output_gate.weight": "gate_w",
            "self_attn.norm.weight": "norm_w",
        }.get(rest)
        if key:
            ld.setdefault("lightning", {})[key] = put(tensor)
    elif rest.startswith("linear_attn."):
        # Qwen3-Next gated DeltaNet. The checkpoint interleaves
        # per-k-head groups in in_proj_qkvz/in_proj_ba (HF
        # fix_query_key_value_ordering); canonicalize to
        # [q | k | v | z] / [b | a] here so the runtime split is
        # a plain slice (models/gated_deltanet.py _project)
        sub = rest.split(".", 1)[1]
        gd = ld.setdefault("gdn", {})
        t = np.asarray(tensor)
        g = cfg.gdn_cfg
        nk, nv = g["num_k_heads"], g["num_v_heads"]
        dk, dv = g["head_k_dim"], g["head_v_dim"]
        r = nv // nk
        if sub == "in_proj_qkvz.weight":
            w = t.reshape(nk, 2 * dk + 2 * r * dv, -1)
            gd["qkvz_w"] = put(np.concatenate([
                w[:, :dk].reshape(nk * dk, -1),
                w[:, dk : 2 * dk].reshape(nk * dk, -1),
                w[:, 2 * dk : 2 * dk + r * dv].reshape(nv * dv, -1),
                w[:, 2 * dk + r * dv :].reshape(nv * dv, -1),
            ], axis=0))
        elif sub == "in_proj_ba.weight":
            w = t.reshape(nk, 2 * r, -1)
            gd["ba_w"] = put(np.concatenate([
                w[:, :r].reshape(nv, -1),
                w[:, r:].reshape(nv, -1),
            ], axis=0))
        elif sub == "conv1d.weight":  # [cd, 1, K] -> [cd, K]
            gd["conv_w"] = jnp.asarray(
                t.reshape(t.shape[0], t.shape[-1])
            ).astype(jnp.float32)
        elif sub == "out_proj.weight":
            gd["out_w"] = put(t)
        else:
            key = {
                "dt_bias": "dt_bias",
                "A_log": "a_log",
                "norm.weight": "norm_w",
            }.get(sub)
            if key is not None:
                gd[key] = jnp.asarray(t).astype(jnp.float32)
    elif (
        cfg.attn_out_gate
        and rest == "self_attn.q_proj.weight"
    ):
        # Qwen3-Next: q_proj rows are per-head [query(hd),
        # gate(hd)] pairs — split into q_proj + attn_gate
        t = np.asarray(tensor)
        nh, hd = cfg.num_attention_heads, cfg.head_dim
        w = t.reshape(nh, 2 * hd, -1)
        ld["q_proj"] = put(w[:, :hd].reshape(nh * hd, -1))
        ld["attn_gate"] = put(w[:, hd:].reshape(nh * hd, -1))
    elif rest.startswith("self_attn.qkv_interleaved.") or (
        cfg.model_type == "persimmon"
        and rest.startswith("self_attn.query_key_value.")
    ):
        # GPT-NeoX/Persimmon fused qkv: rows interleaved PER HEAD
        # [h, 3, hd] (HF GPTNeoXAttention/Persimmon _split_heads view)
        # — de-interleave to q/k/v
        t = np.asarray(tensor)
        nh, hd = cfg.num_attention_heads, cfg.head_dim
        kind = rest.rsplit(".", 1)[1]
        w = t.reshape(nh, 3, hd, *t.shape[1:])
        names = (
            ("q_proj", "k_proj", "v_proj")
            if kind == "weight"
            else ("q_bias", "k_bias", "v_bias")
        )
        for j, nm in enumerate(names):
            ld[nm] = put(
                w[:, j].reshape(nh * hd, *t.shape[1:])
            )
    elif rest.startswith("self_attn.qkv_proj."):
        # Phi-3 fused qkv: split rows [q; k; v]
        t = np.asarray(tensor)
        nh = cfg.num_attention_heads * cfg.head_dim
        nkv = cfg.num_key_value_heads * cfg.head_dim
        kind = rest.rsplit(".", 1)[1]
        names = (
            ("q_proj", "k_proj", "v_proj")
            if kind == "weight"
            else ("q_bias", "k_bias", "v_bias")
        )
        ld[names[0]] = put(t[:nh])
        ld[names[1]] = put(t[nh : nh + nkv])
        ld[names[2]] = put(t[nh + nkv :])
    elif rest.startswith("mlp.gate_up_proj."):
        # GLM-4 / Phi-3 fused gate_up: gate rows first
        t = np.asarray(tensor)
        inter = cfg.intermediate_size
        kind = rest.rsplit(".", 1)[1]
        names = (
            ("gate_proj", "up_proj")
            if kind == "weight"
            else ("gate_bias", "up_bias")
        )
        ld.setdefault("mlp", {})[names[0]] = put(t[:inter])
        ld.setdefault("mlp", {})[names[1]] = put(t[inter:])
    elif rest.startswith("self_attn."):
        sub = rest[len("self_attn."):]
        proj, kind = sub.rsplit(".", 1)
        if proj in ("q_proj", "k_proj", "v_proj", "o_proj", "out_proj"):
            if proj == "out_proj":  # LFM2 names o_proj "out_proj"
                proj = "o_proj"
            key = proj if kind == "weight" else proj[0] + "_bias"
            if proj == "o_proj" and kind == "bias":
                key = "o_bias"
            ld[key] = put(tensor)
        elif proj in ("q_norm", "k_norm") and kind == "weight":
            ld[proj] = put(tensor)
        elif proj in ("query_layernorm", "key_layernorm") and kind == "weight":
            # Hunyuan naming for the post-rope per-head norms
            ld[proj[0] + "_norm"] = put(tensor)
        elif proj in ("q_layernorm", "k_layernorm"):
            # LFM2/Persimmon naming for the per-head qk norms
            # (Persimmon's carry a bias)
            key = proj[0] + "_norm" + ("" if kind == "weight" else "_bias")
            ld[key] = put(tensor)
        elif proj in (
            # DeepSeek MLA projections (HF modeling_deepseek_v3)
            "q_a_proj",
            "q_b_proj",
            "q_a_layernorm",
            "kv_a_layernorm",
            "kv_b_proj",
        ):
            key = proj if kind == "weight" else proj[:-5] + "_bias"
            ld[key] = put(tensor)
        elif proj == "kv_a_proj_with_mqa":
            ld["kv_a_proj" if kind == "weight" else "kv_a_bias"] = (
                put(tensor)
            )
        elif proj == "dense":  # Phi names o_proj "dense"
            ld["o_proj" if kind == "weight" else "o_bias"] = put(tensor)
    elif rest.startswith("mlp.experts.") and rest.split(".")[2] in (
        "gate_up_proj",
        "gate_up_proj_bias",
        "down_proj",
        "down_proj_bias",
    ):
        # GPT-OSS experts ship pre-stacked: gate_up_proj
        # [E, H, 2I] / down_proj [E, I, H] already in
        # ragged_dot's [E, contract, out] layout; biases [E, .]
        sub = rest.split(".")[2]
        key = {
            "gate_up_proj": "gate_up_w",
            "gate_up_proj_bias": "gate_up_b",
            "down_proj": "down_w",
            "down_proj_bias": "down_b",
        }[sub]
        ld.setdefault("moe", {})[key] = put(tensor)
    elif rest in (
        "feed_forward.experts.gate_up_proj",
        "feed_forward.experts.down_proj",
    ):
        # Llama 4 experts ship pre-stacked in ragged_dot's
        # [E, contract, out] layout already (HF Llama4TextExperts:
        # gate_up_proj [E, H, 2I], down_proj [E, I, H]); gate/up are
        # the HALVES of the fused tensor (torch .chunk(2, dim=-1))
        moe = ld.setdefault("moe", {})
        t = np.asarray(tensor)
        if rest.endswith("gate_up_proj"):
            inter = t.shape[-1] // 2
            moe["gate_w"] = put(t[..., :inter])
            moe["up_w"] = put(t[..., inter:])
        else:
            moe["down_w"] = put(t)
    elif rest.startswith(
        (
            "mlp.experts.",
            "block_sparse_moe.experts.",
            "feed_forward.experts.",  # Jamba
        )
    ):
        # mlp.experts.{e}.{gate,up,down}_proj.weight and the
        # Mixtral naming block_sparse_moe.experts.{e}.w1/w2/w3
        parts2 = rest.split(".")
        e = int(parts2[2])
        proj = {
            "w1": "gate_proj",
            "w2": "down_proj",
            "w3": "up_proj",
        }.get(parts2[3], parts2[3])
        stage.setdefault(proj, {})[e] = tensor
    elif rest in (
        "mlp.gate.weight",
        "block_sparse_moe.gate.weight",
        "mlp.gate.wg.weight",  # Hunyuan MoE router naming
    ):
        ld.setdefault("moe", {})["router"] = put(tensor)
    elif rest == "block_sparse_moe.router.layer.weight":
        # GraniteMoE router naming
        ld.setdefault("moe", {})["router"] = put(tensor)
    elif rest in (
        "block_sparse_moe.input_linear.weight",
        "block_sparse_moe.output_linear.weight",
    ):
        # GraniteMoE pre-stacked experts [E, out, in] -> ragged_dot's
        # [E, in, out]
        key = (
            "input_w" if "input_linear" in rest else "output_w"
        )
        ld.setdefault("moe", {})[key] = put(
            np.swapaxes(np.asarray(tensor), 1, 2)
        )
    elif rest in (
        "mlp.gate.e_score_correction_bias",
        "mlp.moe_statics.e_score_correction_bias",  # ERNIE MoE
    ):
        # selection bias (f32 like HF's buffer); ERNIE stores [1, E]
        ld.setdefault("moe", {})["e_score_bias"] = jnp.asarray(
            np.asarray(tensor).reshape(-1)
        ).astype(jnp.float32)
    elif rest in ("mlp.router.weight", "feed_forward.router.weight"):
        ld.setdefault("moe", {})["router"] = put(tensor)
    elif rest == "mlp.router.bias":
        ld.setdefault("moe", {})["router_bias"] = put(tensor)
    elif rest.startswith(
        (
            "mlp.shared_experts.",
            "mlp.shared_expert.",
            "mlp.shared_mlp.",
            "feed_forward.shared_expert.",  # Llama 4
        )
    ):
        # shared experts: a dense MLP beside the routed experts
        # (DeepSeek plural / Qwen3-Next singular / Hunyuan shared_mlp)
        proj = rest.split(".")[2]
        if proj in ("gate_proj", "up_proj", "down_proj"):
            ld.setdefault("shared_mlp", {})[proj] = put(tensor)
    elif rest in (
        "shared_mlp.input_linear.weight",
        "shared_mlp.output_linear.weight",
    ):
        # Granite 4.0 fused-GLU shared MLP
        key = "input_w" if "input_linear" in rest else "output_w"
        ld.setdefault("shared_mlp", {})[key] = put(tensor)
    elif rest == "mlp.shared_expert_gate.weight":
        # Qwen3-Next: sigmoid gate scaling the shared expert
        ld["shared_gate"] = put(tensor)
    elif rest.startswith(
        (
            "mlp.c_fc.", "mlp.c_proj.", "mlp.fc1.", "mlp.fc2.",
            "mlp.dense_h_to_4h.", "mlp.dense_4h_to_h.",  # Persimmon
        )
    ):
        # gateless MLP namings: Starcoder2 c_fc/c_proj, Phi fc1/fc2
        proj = (
            "up_proj"
            if (
                ".c_fc." in rest
                or ".fc1." in rest
                or ".dense_h_to_4h." in rest
            )
            else "down_proj"
        )
        kind = rest.rsplit(".", 1)[1]
        key = proj if kind == "weight" else proj.split("_")[0] + "_bias"
        ld.setdefault("mlp", {})[key] = put(tensor)
    elif rest.startswith(("mlp.", "feed_forward.")) and rest.endswith(
        ".weight"
    ):
        proj = rest.split(".")[1]
        # LFM2 feed_forward.w1/w3/w2 = gate/up/down
        proj = {"w1": "gate_proj", "w3": "up_proj", "w2": "down_proj"}.get(
            proj, proj
        )
        if proj in ("gate_proj", "up_proj", "down_proj"):
            ld.setdefault("mlp", {})[proj] = put(tensor)
    elif rest.startswith(("mlp.", "feed_forward.")) and rest.endswith(
        ".bias"
    ):
        proj = rest.split(".")[1]
        if proj in ("gate_proj", "up_proj", "down_proj"):
            ld.setdefault("mlp", {})[proj.split("_")[0] + "_bias"] = put(tensor)


def _stack_moe(ld: Params, projs: Dict[str, Dict[int, np.ndarray]], put) -> None:
    """Stack staged per-expert weights: ragged_dot wants rhs
    [E, K_contract, N_out]."""
    if not projs:
        return
    moe = ld.setdefault("moe", {})
    for proj, experts in projs.items():
        stacked = np.stack([experts[e] for e in sorted(experts)], axis=0)
        # HF expert weight is [out, in]; transpose to [E, in, out].
        stacked = np.swapaxes(stacked, 1, 2)
        key = {"gate_proj": "gate_w", "up_proj": "up_w", "down_proj": "down_w"}[
            proj
        ]
        moe[key] = put(stacked)


def load_params(
    model_path: str, cfg: ModelConfig, dtype: Optional[str] = None
) -> Params:
    """Load a HF checkpoint directory into the decoder param pytree."""
    if cfg.model_type == "gemma3n_text":
        from . import gemma3n_text

        return gemma3n_text.load_text_params(model_path, cfg, dtype)
    jdt = _DTYPES[dtype or cfg.dtype]
    layers: list = [dict() for _ in range(cfg.num_hidden_layers)]
    params: Params = {"layers": layers}
    # staging for MoE expert stacking: {layer: {proj: {expert: np.ndarray}}}
    moe_stage: Dict[int, Dict[str, Dict[int, np.ndarray]]] = {}

    def put(arr: np.ndarray, *, cast: bool = True) -> jax.Array:
        a = jnp.asarray(arr)
        return a.astype(jdt) if cast else a

    for name, tensor in iter_safetensors(model_path):
        n = _strip(name)
        if cfg.model_type in ("gpt_bigcode", "falcon", "gpt2"):
            n = _gpt2_style_rename(n)
            if cfg.model_type == "gpt2" and n.endswith(
                (
                    "qkv_proj.weight",
                    "o_proj.weight",
                    "c_fc.weight",
                    "c_proj.weight",
                )
            ):
                # GPT-2 Conv1D stores weights TRANSPOSED ([in, out])
                tensor = np.ascontiguousarray(np.asarray(tensor).T)
        elif cfg.model_type == "gpt_neox":
            n = _neox_rename(n)
        elif cfg.model_type == "recurrent_gemma":
            n = _rg_rename(n)
        if n in ("embed_tokens.weight", "embeddings.weight"):
            params["embed_tokens"] = put(tensor)
        elif n == "pos_embed.weight":
            # learned absolute positions (GPT-BigCode wpe)
            params["pos_embed"] = put(tensor)
        elif n in (
            "norm.weight",
            "norm_f.weight",
            "final_layernorm.weight",
            "embedding_norm.weight",  # LFM2 (applied at the END)
        ):
            params["norm"] = put(tensor)
        elif n in ("norm.bias", "final_layernorm.bias"):
            params["norm_bias"] = put(tensor)  # Nemotron LayerNorm1P
        elif n in ("lm_head.weight",):
            params["lm_head"] = put(tensor)
        elif n == "lm_head.bias":  # Phi-2 biased lm_head
            params["lm_head_bias"] = put(tensor)
        elif n.startswith("layers."):
            parts = n.split(".")
            i = int(parts[1])
            _parse_layer_tensor(
                cfg,
                layers[i],
                ".".join(parts[2:]),
                tensor,
                put,
                moe_stage.setdefault(i, {}),
                cfg.layer_types[i] if cfg.layer_types else None,
            )

    for i, projs in moe_stage.items():
        _stack_moe(layers[i], projs, put)

    if cfg.tie_word_embeddings:
        params.pop("lm_head", None)
    return params


def load_mtp_params(
    model_path: str, cfg: ModelConfig, dtype: Optional[str] = None
) -> Optional[Params]:
    """Load an in-checkpoint MTP head (qwen3_next-style ``mtp.*``
    tensors; reference patches/qwen3_5_mtp.py:70-340). Returns None if
    the checkpoint has no MTP head.

    Expected names (relative): mtp.fc.weight [H, 2H],
    mtp.pre_fc_norm_embedding.weight, mtp.pre_fc_norm_hidden.weight,
    mtp.norm.weight, mtp.layers.0.* — a FULL decoder layer parsed by
    the same mapping as the target model's layers (qwen3_next MTP
    layers carry gated attention + MoE with a shared expert; reference
    qwen3_next_mtp.py builds a full Qwen3NextDecoderLayer at a
    full-attention index). Embeddings and lm_head are shared with the
    target model."""
    jdt = _DTYPES[dtype or cfg.dtype]
    layer: Params = {}
    out: Params = {"layer": layer}
    stage: Dict[str, Dict[int, np.ndarray]] = {}

    def put(arr, *, cast: bool = True):
        a = jnp.asarray(np.asarray(arr))
        return a.astype(jdt) if cast else a

    import glob as _glob

    from safetensors import safe_open

    found = False
    mtp_items = []
    for f in sorted(
        _glob.glob(os.path.join(model_path, "*.safetensors"))
    ):
        with safe_open(f, framework="numpy") as st:
            for name in st.keys():
                if _strip(name).startswith("mtp."):
                    mtp_items.append((_strip(name), st.get_tensor(name)))
    for n, tensor in mtp_items:
        found = True
        rest = n[len("mtp."):]
        if rest == "fc.weight":
            out["fc"] = put(tensor)
        elif rest == "pre_fc_norm_embedding.weight":
            out["pre_norm_emb"] = put(tensor)
        elif rest == "pre_fc_norm_hidden.weight":
            out["pre_norm_hidden"] = put(tensor)
        elif rest in ("norm.weight", "final_layernorm.weight"):
            out["norm"] = put(tensor)
        elif rest.startswith("layers."):
            _parse_layer_tensor(
                cfg, layer, rest.split(".", 2)[2], tensor, put, stage,
                None,
            )
    _stack_moe(layer, stage, put)
    if not found:
        return None
    required = {"fc", "pre_norm_emb", "pre_norm_hidden", "norm"}
    if not required.issubset(out) or "input_layernorm" not in layer:
        raise ValueError(
            f"incomplete MTP head in {model_path}: have {sorted(out)}"
        )
    return out


def init_params(cfg: ModelConfig, seed: int = 0, dtype: Optional[str] = None) -> Params:
    """Random-init params with the right shapes (tests / synthetic bench)."""
    jdt = _DTYPES[dtype or cfg.dtype]
    rng = np.random.default_rng(seed)
    h, hd = cfg.hidden_size, cfg.head_dim
    nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads

    def w(*shape, scale=0.02):
        return jnp.asarray(
            rng.standard_normal(shape, dtype=np.float32) * scale, dtype=jdt
        )

    def ones(*shape):
        return jnp.ones(shape, dtype=jdt)

    moe_layers = set(cfg.moe_layer_indices())
    layers = []
    for i in range(cfg.num_hidden_layers):
        ld: Params = {
            "input_layernorm": ones(h),
            "post_attention_layernorm": ones(h),
            **(
                {
                    "pre_feedforward_layernorm": ones(h),
                    "post_feedforward_layernorm": ones(h),
                }
                if cfg.sandwich_norms
                else {}
            ),
            "q_proj": w(nh * hd, h),
            "k_proj": w(nkv * hd, h),
            "v_proj": w(nkv * hd, h),
            "o_proj": w(h, nh * hd),
        }
        if cfg.mla is not None:
            # DeepSeek MLA projections replace q/k/v_proj
            m = cfg.mla
            qk_hd = m["qk_nope_head_dim"] + m["qk_rope_head_dim"]
            ld.pop("q_proj"), ld.pop("k_proj"), ld.pop("v_proj")
            if m.get("q_lora_rank"):
                ld["q_a_proj"] = w(m["q_lora_rank"], h)
                ld["q_a_layernorm"] = ones(m["q_lora_rank"])
                ld["q_b_proj"] = w(nh * qk_hd, m["q_lora_rank"])
            else:
                ld["q_proj"] = w(nh * qk_hd, h)
            ld["kv_a_proj"] = w(
                m["kv_lora_rank"] + m["qk_rope_head_dim"], h
            )
            ld["kv_a_layernorm"] = ones(m["kv_lora_rank"])
            ld["kv_b_proj"] = w(
                nh * (m["qk_nope_head_dim"] + m["v_head_dim"]),
                m["kv_lora_rank"],
            )
            ld["o_proj"] = w(h, nh * m["v_head_dim"])
        elif cfg.attention_bias:
            ld["q_bias"] = jnp.zeros(nh * hd, dtype=jdt)
            ld["k_bias"] = jnp.zeros(nkv * hd, dtype=jdt)
            ld["v_bias"] = jnp.zeros(nkv * hd, dtype=jdt)
        if cfg.has_sinks:
            ld["sinks"] = jnp.asarray(
                rng.standard_normal(nh, dtype=np.float32) * 0.5
            )
        if cfg.use_qk_norm:
            ld["q_norm"] = ones(hd)
            ld["k_norm"] = ones(hd)
        if i in moe_layers:
            e, mi = cfg.num_experts, cfg.moe_intermediate_size
            if cfg.moe_style == "gpt_oss":
                ld["moe"] = {
                    "router": w(e, h),
                    "router_bias": jnp.zeros(e, dtype=jdt),
                    "gate_up_w": w(e, h, 2 * mi),
                    "gate_up_b": jnp.zeros((e, 2 * mi), dtype=jdt),
                    "down_w": w(e, mi, h),
                    "down_b": jnp.zeros((e, h), dtype=jdt),
                }
            else:
                ld["moe"] = {
                    "router": w(e, h),
                    "gate_w": w(e, h, mi),
                    "up_w": w(e, h, mi),
                    "down_w": w(e, mi, h),
                }
                if cfg.moe_topk_method == "noaux_tc":
                    ld["moe"]["e_score_bias"] = jnp.zeros(e, jnp.float32)
            if cfg.moe_shared_intermediate:
                si = cfg.moe_shared_intermediate
                ld["shared_mlp"] = {
                    "gate_proj": w(si, h),
                    "up_proj": w(si, h),
                    "down_proj": w(h, si),
                }
        else:
            ld["mlp"] = {
                "gate_proj": w(cfg.intermediate_size, h),
                "up_proj": w(cfg.intermediate_size, h),
                "down_proj": w(h, cfg.intermediate_size),
            }
        layers.append(ld)

    params: Params = {
        "embed_tokens": w(cfg.vocab_size, h),
        "layers": layers,
        "norm": ones(h),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(cfg.vocab_size, h)
    return params


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def load_converted_params(
    model_path: str, cfg: ModelConfig, dtype: Optional[str] = None
) -> Params:
    """Load an artifact produced by ``model_workflow.convert_model``:
    tensors are stored under their PYTREE paths (``layers.0.q_proj``),
    optionally pre-quantized as ``<name>`` int codes + ``<name>.scale``
    — no per-architecture name mapping and no load-time quantization."""
    from ..ops.quant import QuantizedTensor

    with open(os.path.join(model_path, "config.json")) as f:
        recipe = json.load(f).get("vllm_mlx_tpu_quantization", {})
    bits = {"int8": 8, "int4": 4}.get(recipe.get("quantize"))
    group = int(recipe.get("group_size", 0) or 0)
    jdt = _DTYPES[dtype or cfg.dtype]

    raw: Dict[str, np.ndarray] = {}
    for name, t in iter_safetensors(model_path):
        raw[name] = t

    def build(name: str, arr: np.ndarray):
        scale = raw.get(name + ".scale")
        if scale is not None and arr.dtype.kind in "iu":
            return QuantizedTensor(
                w_q=jnp.asarray(arr),
                scale=jnp.asarray(scale),
                bits=bits or 8,
                group_size=group if (bits or 8) == 4 else 0,
            )
        a = jnp.asarray(arr)
        return a.astype(jdt) if a.dtype.kind == "f" else a

    params: Params = {}
    for name in sorted(raw):
        if name.endswith(".scale"):
            continue
        parts = name.split(".")
        node: Any = params
        for i, p in enumerate(parts[:-1]):
            if p == "layers" or p.isdigit():
                if p == "layers":
                    node = node.setdefault("layers", [])
                else:
                    idx = int(p)
                    while len(node) <= idx:
                        node.append({})
                    node = node[idx]
            else:
                node = node.setdefault(p, {})
        node[parts[-1]] = build(name, raw[name])
    return params


def load_params_auto(
    model_path: str, cfg: ModelConfig, dtype: Optional[str] = None
) -> Params:
    """Dispatch: converted artifacts load directly, HF checkpoints map."""
    cfg_path = os.path.join(model_path, "config.json")
    try:
        with open(cfg_path) as f:
            if "vllm_mlx_tpu_quantization" in json.load(f):
                return load_converted_params(model_path, cfg, dtype)
    except (OSError, json.JSONDecodeError):
        pass
    return load_params(model_path, cfg, dtype)

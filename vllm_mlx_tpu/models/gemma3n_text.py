# SPDX-License-Identifier: Apache-2.0
"""Gemma-3n text stack (HF ``Gemma3nTextModel``, modeling_gemma3n.py).

The reference's models.md lists "Gemma 4 … (vision + audio)"
(reference docs/reference/models.md:38); this is its text decoder —
architecturally unlike every other family in this repo:

  * **AltUp** (alternating updates): the residual stream is FOUR
    parallel [T, H] states; each layer `predict`s all four from a
    routed linear map, runs attention+MLP on the active one, then
    `correct`s the other three from the innovation.
  * **LAuReL**: a rank-64 learned residual added to the attention
    branch, combined as (attn + laurel) / sqrt(2).
  * **Per-layer input embeddings**: each token carries a per-layer
    256-dim embedding (vocab rows < vocab_size_per_layer_input; other
    ids — e.g. audio/vision soft tokens — use row 0, matching HF's
    where() masking) mixed with a projection of the token embedding;
    each layer gates its corrected output through it.
  * **KV sharing**: the last 15 layers compute q only and attend the
    KV written by the LAST non-shared layer of the same attention type
    (full/sliding) — mapped here onto paged-pool ALIASING: shared
    layers read the source layer's pool and never write.
  * qk-norm + WEIGHTLESS v-norm, attention scale 1.0, dual rope
    (local theta on sliding layers), activation-sparsity gelu
    (gaussian top-k) on early layers.

The stack keeps the unified serving contract: the caller provides
``attend(layer_idx, q, k, v)`` (k/v None for shared layers) and gets
back the final [T, H] hidden state, so ModelRunner/scheduler stay
unchanged (kv pools exist only for non-shared layers).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.layers import apply_rope, linear, rms_norm, rope_cos_sin

Params = Dict[str, Any]

# norm.ppf(0.95) used by the 95%-sparsity gelu layers (HF computes it
# via torch.distributions at runtime; constant here — the pattern only
# ever contains 0.0 and 0.95 in shipped configs)
_PPF = {0.95: 1.6448536269514722}


def _rms(x, w, eps):
    return rms_norm(x, w, eps, add_one=False)


def _rms_noscale(x, eps):
    xf = x.astype(jnp.float32)
    return (
        xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    ).astype(x.dtype)


def _gelu(x):
    return jax.nn.gelu(x.astype(jnp.float32), approximate=True).astype(
        x.dtype
    )


def _mlp(lp: Params, x, sparsity: float):
    g = linear(x, lp["gate_proj"]).astype(jnp.float32)
    if sparsity > 0.0:
        # gaussian top-k (HF Gemma3nTextMLP._gaussian_topk): keep
        # activations above mean + std * ppf(sparsity)
        std_mult = _PPF.get(sparsity)
        if std_mult is None:
            from scipy.stats import norm as _norm  # pragma: no cover

            std_mult = float(_norm.ppf(sparsity))
        mu = jnp.mean(g, axis=-1, keepdims=True)
        std = jnp.std(g, axis=-1, keepdims=True)
        g = jax.nn.relu(g - (mu + std * std_mult))
    h = jax.nn.gelu(g, approximate=True).astype(x.dtype)
    u = linear(x, lp["up_proj"])
    return linear((h * u).astype(x.dtype), lp["down_proj"])


def _laurel(lp: Params, x, eps):
    y = linear(linear(x, lp["left"]), lp["right"])
    return x + _rms(y, lp["post_norm"], eps)


def _altup_modalities(ap: Params, x, eps):
    r = _rms(x, ap["router_norm"], eps) * jnp.asarray(
        1.0 / x.shape[-1], x.dtype
    )
    return jnp.tanh(linear(r, ap["router"]).astype(jnp.float32)).astype(
        x.dtype
    )


def _altup_predict(ap: Params, hs, active_idx, n, eps):
    """hs [n, T, H] -> predictions [n, T, H]."""
    mods = _altup_modalities(ap, hs[active_idx], eps)  # [T, n]
    coefs = linear(mods, ap["prediction"]).reshape(
        -1, n, n
    )  # [T, n, n]
    # HF: matmul(hs.permute(T,H,n), coefs.permute(..,n_out<-n_in)^T?):
    # predictions[j] = sum_i hs[i] * coefs[:, j, i] (after the permute
    # dance this is einsum over the input-stream axis)
    pred = jnp.einsum(
        "nth,tjn->jth", hs.astype(jnp.float32), coefs.astype(jnp.float32)
    )
    return (pred + hs.astype(jnp.float32)).astype(hs.dtype)


def _altup_correct(ap: Params, predictions, activated, active_idx, n, eps):
    mods = _altup_modalities(ap, activated, eps)  # [T, n]
    innovation = (
        activated.astype(jnp.float32)
        - predictions[active_idx].astype(jnp.float32)
    )  # [T, H]
    coefs = (
        linear(mods, ap["correction"]).astype(jnp.float32) + 1.0
    )  # [T, n]
    corrected = (
        innovation[None] * coefs.T[:, :, None]
        + predictions.astype(jnp.float32)
    )
    return corrected.astype(activated.dtype)


def pool_plan(cfg: ModelConfig) -> Tuple[Dict[int, int], Dict[int, bool]]:
    """(layer -> pool index, layer -> writes?) for the KV-shared layout:
    non-shared layers get pools in order; each shared layer aliases the
    last non-shared layer of its own attention type."""
    lt = cfg.layer_types
    pool_of: Dict[int, int] = {}
    writes: Dict[int, bool] = {}
    last_of_type: Dict[str, int] = {}
    nxt = 0
    for i, t in enumerate(lt):
        if t.endswith("_shared"):
            src = last_of_type[t[: -len("_shared")]]
            pool_of[i] = pool_of[src]
            writes[i] = False
        else:
            pool_of[i] = nxt
            writes[i] = True
            nxt += 1
            last_of_type[t] = i
    return pool_of, writes


def forward(
    params: Params,
    cfg: ModelConfig,
    token_ids: jax.Array,  # [T]
    positions: jax.Array,  # [T]
    attend: Callable,  # (layer_idx, q, k, v) -> attn_out [T, qh, hd]
    token_embeds: Optional[jax.Array] = None,
    embeds_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Gemma-3n layer stack -> final normed hidden [T, H]."""
    g = cfg.gemma3n_cfg
    n = g["altup_num_inputs"]
    active = g["altup_active_idx"]
    eps = cfg.rms_norm_eps
    h_pl = g["hidden_size_per_layer_input"]
    n_layers = cfg.num_hidden_layers
    hd = cfg.head_dim
    nh = cfg.num_attention_heads
    kvh = cfg.num_key_value_heads
    t = token_ids.shape[0]

    from ..ops.layers import embed

    x0 = embed(token_ids, params["embed_tokens"])
    x0 = x0 * jnp.asarray(cfg.embed_scale, x0.dtype)
    if "embed_vision" in params:
        # multimodal checkpoints embed ids >= the media vocab offsets
        # through the hard multimodal embedders (HF Gemma3nModel id
        # routing) — applies at BOTH prefill and decode; soft media
        # features arrive separately via token_embeds overrides
        from .gemma3n_audio import embed_hard

        v_off = g["vision_vocab_offset"]
        a_off = g["audio_vocab_offset"]
        eps_mm = g.get("mm_rms_eps", 1e-6)
        vis_ids = jnp.clip(token_ids, v_off, a_off - 1)
        vis = embed_hard(params["embed_vision"], vis_ids, v_off, eps_mm)
        aud_ids = jnp.clip(
            token_ids, a_off, a_off + g["audio_vocab_size"] - 1
        )
        aud = embed_hard(params["embed_audio"], aud_ids, a_off, eps_mm)
        x0 = jnp.where(
            (token_ids >= a_off)[:, None], aud,
            jnp.where((token_ids >= v_off)[:, None], vis, x0),
        )
    if token_embeds is not None:
        mask = (
            embeds_mask[:, None]
            if embeds_mask is not None
            else jnp.ones((t, 1), bool)
        )
        x0 = jnp.where(mask, token_embeds.astype(x0.dtype), x0)

    # per-layer inputs: projection of the token embedding + the
    # per-layer vocab embedding (ids outside the per-layer vocab use
    # row 0 — HF's where() masking covers soft tokens)
    plp = linear(x0, params["per_layer_model_projection"]).astype(
        jnp.float32
    ) * (cfg.hidden_size**-0.5)
    plp = plp.reshape(t, n_layers, h_pl)
    plp = _rms(plp, params["per_layer_projection_norm"], eps)
    pl_ids = jnp.where(
        (token_ids >= 0) & (token_ids < g["vocab_size_per_layer_input"]),
        token_ids,
        0,
    )
    pl_emb = embed(pl_ids, params["embed_tokens_per_layer"]).reshape(
        t, n_layers, h_pl
    )
    pl_emb = pl_emb * jnp.asarray(h_pl**0.5, pl_emb.dtype)
    per_layer = (
        (plp.astype(jnp.float32) + pl_emb.astype(jnp.float32))
        * (2.0**-0.5)
    ).astype(x0.dtype)

    cos_g, sin_g = rope_cos_sin(positions, hd, cfg.rope_theta, None)
    cos_l, sin_l = rope_cos_sin(positions, hd, cfg.rope_local_theta, None)

    # expand to n altup streams, magnitude-matched projections
    tm = jnp.sqrt(
        jnp.mean(x0.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    )
    streams = [x0]
    for i in range(1, n):
        y = linear(x0, params["altup_projections"][i - 1]).astype(
            jnp.float32
        )
        mag = jnp.sqrt(
            jnp.maximum(jnp.mean(y * y, axis=-1, keepdims=True), 1e-5)
        )
        streams.append((y * tm / mag).astype(x0.dtype))
    hs = jnp.stack(streams)  # [n, T, H]

    for i, lp in enumerate(params["layers"]):
        lt = cfg.layer_types[i]
        sliding = lt.startswith("sliding_attention")
        shared = lt.endswith("_shared")
        cos, sin = (cos_l, sin_l) if sliding else (cos_g, sin_g)

        predictions = _altup_predict(lp["altup"], hs, active, n, eps)
        act = predictions[active]
        act_n = _rms(act, lp["input_layernorm"], eps)
        laurel_out = _laurel(lp["laurel"], act_n, eps)

        q = linear(act_n, lp["q_proj"]).reshape(t, nh, hd)
        q = _rms(q, lp["q_norm"], eps)
        q = apply_rope(q, cos, sin)
        if shared:
            k = v = None
        else:
            k = linear(act_n, lp["k_proj"]).reshape(t, kvh, hd)
            k = _rms(k, lp["k_norm"], eps)
            k = apply_rope(k, cos, sin)
            v = linear(act_n, lp["v_proj"]).reshape(t, kvh, hd)
            v = _rms_noscale(v, eps)
        attn = attend(i, q, k, v)
        attn = linear(attn.reshape(t, -1), lp["o_proj"])
        attn = _rms(attn, lp["post_attention_layernorm"], eps)

        attn_gated = act + attn
        attn_laurel = (
            attn_gated.astype(jnp.float32)
            + laurel_out.astype(jnp.float32)
        ) * (2.0**-0.5)
        attn_laurel = attn_laurel.astype(act.dtype)

        ffw_in = _rms(attn_laurel, lp["pre_feedforward_layernorm"], eps)
        ffw = _mlp(lp["mlp"], ffw_in, g["activation_sparsity_pattern"][i])
        ffw = _rms(ffw, lp["post_feedforward_layernorm"], eps)
        activated = attn_laurel + ffw

        corrected = _altup_correct(
            lp["altup"], predictions, activated, active, n, eps
        )
        first = corrected[active]
        if g["altup_correct_scale"]:
            # HF multiplies in the f32 param dtype then casts back
            first = (
                first.astype(jnp.float32)
                * lp["altup"]["correct_output_scale"].astype(jnp.float32)
            ).astype(first.dtype)
        gate = _gelu(linear(first, lp["per_layer_input_gate"]))
        gated = gate * per_layer[:, i, :]
        proj = linear(gated, lp["per_layer_projection"])
        proj = _rms(proj, lp["post_per_layer_input_norm"], eps)
        hs = jnp.concatenate(
            [corrected[:1], corrected[1:] + proj[None]], axis=0
        )

    # collapse streams: magnitude-matched unembed projections, mean
    tm = jnp.sqrt(
        jnp.mean(hs[0].astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    )
    outs = [hs[0].astype(jnp.float32)]
    for i in range(1, n):
        y = linear(hs[i], params["altup_unembed_projections"][i - 1]).astype(
            jnp.float32
        )
        mag = jnp.sqrt(
            jnp.maximum(jnp.mean(y * y, axis=-1, keepdims=True), 1e-5)
        )
        outs.append(y * tm / mag)
    final = sum(outs) / n
    return _rms(final.astype(hs.dtype), params["norm"], eps)


def load_text_params(path: str, cfg: ModelConfig, dtype=None) -> Params:
    """Map Gemma3n(ForCausalLM|TextModel) checkpoint tensors (also the
    ``model.language_model.`` prefix of a multimodal checkpoint)."""
    import numpy as np

    from . import loader as ld

    jdt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        dtype or cfg.dtype
    ]

    def put(t):
        return jnp.asarray(np.asarray(t)).astype(jdt)

    n = cfg.gemma3n_cfg["altup_num_inputs"]
    params: Params = {
        "layers": [
            {"mlp": {}, "altup": {}, "laurel": {}}
            for _ in range(cfg.num_hidden_layers)
        ],
        "altup_projections": [None] * (n - 1),
        "altup_unembed_projections": [None] * (n - 1),
    }
    top = {
        "embed_tokens.weight": "embed_tokens",
        "embed_tokens_per_layer.weight": "embed_tokens_per_layer",
        "per_layer_model_projection.weight": "per_layer_model_projection",
        # HF's ForCausalLM save applies the reverse checkpoint-conversion
        # replace ("model" -> "model.language_model") INSIDE this tensor
        # name too (transformers modeling_gemma3n.py:1763)
        "per_layer_model.language_model_projection.weight":
            "per_layer_model_projection",
        "per_layer_projection_norm.weight": "per_layer_projection_norm",
        "norm.weight": "norm",
    }
    lmap = {
        "self_attn.q_proj.weight": "q_proj",
        "self_attn.k_proj.weight": "k_proj",
        "self_attn.v_proj.weight": "v_proj",
        "self_attn.o_proj.weight": "o_proj",
        "self_attn.q_norm.weight": "q_norm",
        "self_attn.k_norm.weight": "k_norm",
        "input_layernorm.weight": "input_layernorm",
        "post_attention_layernorm.weight": "post_attention_layernorm",
        "pre_feedforward_layernorm.weight": "pre_feedforward_layernorm",
        "post_feedforward_layernorm.weight": "post_feedforward_layernorm",
        "per_layer_input_gate.weight": "per_layer_input_gate",
        "per_layer_projection.weight": "per_layer_projection",
        "post_per_layer_input_norm.weight": "post_per_layer_input_norm",
        "mlp.gate_proj.weight": ("mlp", "gate_proj"),
        "mlp.up_proj.weight": ("mlp", "up_proj"),
        "mlp.down_proj.weight": ("mlp", "down_proj"),
        "altup.correct_output_scale": ("altup", "correct_output_scale"),
        "altup.correction_coefs.weight": ("altup", "correction"),
        "altup.prediction_coefs.weight": ("altup", "prediction"),
        "altup.modality_router.weight": ("altup", "router"),
        "altup.router_norm.weight": ("altup", "router_norm"),
        "laurel.linear_left.weight": ("laurel", "left"),
        "laurel.linear_right.weight": ("laurel", "right"),
        "laurel.post_laurel_norm.weight": ("laurel", "post_norm"),
    }
    for name, tensor in ld.iter_safetensors(path):
        for pre in (
            "model.language_model.", "language_model.model.", "model.",
        ):
            if name.startswith(pre):
                name = name[len(pre):]
                break
        if name in top:
            params[top[name]] = put(tensor)
            continue
        for fam, key in (
            ("altup_projections.", "altup_projections"),
            ("altup_unembed_projections.", "altup_unembed_projections"),
        ):
            if name.startswith(fam):
                idx = int(name[len(fam):].split(".")[0])
                params[key][idx] = put(tensor)
                break
        else:
            if name.startswith("layers."):
                _, idx_s, rest = name.split(".", 2)
                m = lmap.get(rest)
                if m is None:
                    continue
                if cfg.layer_types[int(idx_s)].endswith("_shared") and m in (
                    "k_proj", "v_proj", "k_norm"
                ):
                    # KV-shared layers never project k/v at serve time
                    # (HF reuses the source layer's cache; the
                    # checkpoint tensors exist but are dead weights)
                    continue
                lp = params["layers"][int(idx_s)]
                if isinstance(m, tuple):
                    lp[m[0]][m[1]] = put(tensor)
                else:
                    lp[m] = put(tensor)
    return params

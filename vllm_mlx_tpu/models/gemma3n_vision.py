# SPDX-License-Identifier: Apache-2.0
"""Gemma-3n vision tower: MobileNetV5-300m encoder, reconstructed.

HF serves Gemma-3n images through a timm wrapper
(``mobilenetv5_300m_enc``, transformers modeling_gemma3n.py:1912,1948),
and the reference serves the family via mlx-vlm (reference
docs/reference/models.md:38). timm is ABSENT from this image, so the
exact upstream block table has no oracle here; this module is a
best-effort reconstruction of the published MobileNetV5 architecture
(MobileNetV4 block vocabulary: Edge Residual, Universal Inverted
Bottleneck, Mobile Multi-Query Attention, plus the Multi-Scale Fusion
Adapter) with timm-compatible parameter naming so real checkpoints load
IF the layout matches — and fail loud listing every mismatch if not.

What IS oracle-tested (tests/test_gemma3n_vision.py): everything
downstream of the tower — the [B, C, 16, 16] -> [B, 256, C] reshape,
the sqrt(C) scaling, the soft-token multimodal embedder, placeholder
filling, and served generation — against HF
``Gemma3nForConditionalGeneration`` with an identical stub tower
(the same trick HF itself needs in a timm-less environment). The tower
body is mechanism-tested: stage grids, block algebra, residual/stride
invariants, parameter count in the 300M class.

TPU mapping: NHWC layout throughout (channels-last vectorizes on the
VPU/MXU; ``lax.conv_general_dilated`` lowers 1x1 convs to MXU matmuls
and depthwise convs to VPU ops), scale-only RMSNorm over the channel
axis, erf GELU, one jitted forward per static input size.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# ------------------------------------------------------------------ arch table
# Block spec vocabulary (timm notation in comments):
#   ("er",  kernel, stride, expand, ch)                 edge residual
#   ("uir", dw_start_k, dw_mid_k, stride, expand, ch)   universal inverted
#   ("mqa", heads, key_dim, value_dim, kv_stride, ch)   mobile attention
#
# mobilenetv5_300m_enc reconstruction (~300M params, stem 64ch s2; the
# published design puts attention only in the last two stages, with
# kv-downsampled MQA in stage 2 and full-resolution MQA in stage 3).
STEM_CH = 64


def _stage2() -> List[Tuple]:
    blocks: List[Tuple] = [("uir", 5, 5, 2, 6.0, 640)]
    blocks += [("uir", 5, 0, 1, 4.0, 640)] * 7
    for _ in range(13):
        blocks.append(("mqa", 12, 64, 64, 2, 640))
        blocks.append(("uir", 0, 0, 1, 2.0, 640))
    return blocks


def _stage3() -> List[Tuple]:
    blocks: List[Tuple] = [("uir", 5, 5, 2, 6.0, 1280)]
    for _ in range(18):
        blocks.append(("mqa", 16, 96, 96, 1, 1280))
        blocks.append(("uir", 0, 0, 1, 2.0, 1280))
    return blocks


MOBILENETV5_300M_ENC: List[List[Tuple]] = [
    # stage 0 — 384^2 -> 192^2
    [("er", 3, 2, 4.0, 128), ("er", 3, 1, 4.0, 128), ("er", 3, 1, 4.0, 128)],
    # stage 1 — 192^2 -> 96^2
    [
        ("uir", 3, 5, 2, 6.0, 256),
        ("uir", 5, 0, 1, 4.0, 256),
        ("uir", 3, 0, 1, 4.0, 256),
        ("uir", 5, 0, 1, 4.0, 256),
        ("uir", 3, 0, 1, 4.0, 256),
    ],
    # stage 2 — 96^2 -> 48^2, kv-strided MQA interleave
    _stage2(),
    # stage 3 — 48^2 -> 24^2, full-resolution MQA interleave
    _stage3(),
]

# MSFA fuses the last two stage outputs at the finer grid, then pools
# to a fixed output resolution (16x16 = 256 soft tokens at 768 input).
MSFA_INDICES = (2, 3)
MSFA_EXPAND = 2.0


@dataclass(frozen=True)
class Gemma3nVisionCfg:
    hidden_size: int = 2048  # MSFA output channels (= soft-token width)
    image_size: int = 768
    rms_norm_eps: float = 1e-6
    vocab_offset: int = 262_144
    vocab_size: int = 128
    soft_tokens_per_image: int = 256

    @property
    def out_res(self) -> int:
        return int(math.isqrt(self.soft_tokens_per_image))


# ------------------------------------------------------------------ primitives
def _rms2d(x: jax.Array, w: jax.Array, eps: float = 1e-6) -> jax.Array:
    # channel-axis RMS norm per spatial position (timm RmsNorm2d), NHWC
    v = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (x * jax.lax.rsqrt(v + eps).astype(x.dtype)) * w


def _gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(
        x.dtype
    )


def _conv(x: jax.Array, w: jax.Array, stride: int = 1, groups: int = 1):
    # x NHWC; w HWIO (I = cin/groups). torch 'same' padding k//2.
    k = w.shape[0]
    pad = [(k // 2, k // 2), (w.shape[1] // 2, w.shape[1] // 2)]
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def _conv_norm_act(x, p, prefix, stride=1, groups=1, act=True, eps=1e-6):
    x = _conv(x, p[f"{prefix}.conv.weight"], stride, groups)
    x = _rms2d(x, p[f"{prefix}.bn.weight"], eps)
    return _gelu(x) if act else x


# ------------------------------------------------------------------ blocks
def _edge_residual(p: Params, x, spec, eps):
    _, k, s, e, cout = spec
    cin = x.shape[-1]
    mid = int(cin * e)
    h = _conv(x, p["conv_exp.weight"], s)
    h = _gelu(_rms2d(h, p["bn1.weight"], eps))
    h = _conv(h, p["conv_pwl.weight"])
    h = _rms2d(h, p["bn2.weight"], eps)
    if s == 1 and cin == cout:
        h = h + x
    assert h.shape[-1] == cout and mid == p["conv_exp.weight"].shape[-1]
    return h


def _uib(p: Params, x, spec, eps):
    _, a, k, s, e, cout = spec
    cin = x.shape[-1]
    h = x
    if a:  # leading depthwise (no stride, no activation)
        h = _conv(h, p["dw_start.conv.weight"], 1, groups=cin)
        h = _rms2d(h, p["dw_start.bn.weight"], eps)
    h = _conv_norm_act(h, p, "pw_exp", eps=eps)
    if k:  # mid depthwise carries the stride
        mid = h.shape[-1]
        h = _conv(h, p["dw_mid.conv.weight"], s, groups=mid)
        h = _gelu(_rms2d(h, p["dw_mid.bn.weight"], eps))
    h = _conv_norm_act(h, p, "pw_proj", act=False, eps=eps)
    if "layer_scale.gamma" in p:
        h = h * p["layer_scale.gamma"]
    if s == 1 and cin == cout:
        h = h + x
    return h


def _mqa(p: Params, x, spec, eps):
    """Mobile multi-query attention: per-head 2-D queries, ONE shared
    key/value head (optionally computed on a kv_stride-downsampled
    grid) — the attention pattern is a plain [HWq, HWkv] softmax dot,
    which XLA maps onto the MXU."""
    _, heads, dk, dv, kv_s, c = spec
    b, hh, ww, cin = x.shape
    shortcut = x
    x = _rms2d(x, p["norm.weight"], eps)

    q = _conv(x, p["attn.query.proj.weight"])  # [B,H,W,heads*dk]
    q = q.reshape(b, hh * ww, heads, dk)

    def kv(side, dim):
        h = x
        if kv_s > 1:
            h = _conv(
                h, p[f"attn.{side}.down_conv.weight"], kv_s, groups=cin
            )
            h = _rms2d(h, p[f"attn.{side}.norm.weight"], eps)
        h = _conv(h, p[f"attn.{side}.proj.weight"])  # [B,h',w',dim]
        return h.reshape(b, -1, dim)

    kk = kv("key", dk)
    vv = kv("value", dv)
    logits = jnp.einsum(
        "bqhd,bkd->bhqk", q.astype(jnp.float32), kk.astype(jnp.float32)
    ) * (dk**-0.5)
    attn = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bkd->bqhd", attn, vv.astype(jnp.float32))
    o = o.reshape(b, hh, ww, heads * dv).astype(x.dtype)
    o = _conv(o, p["attn.output.proj.weight"])
    if "layer_scale.gamma" in p:
        o = o * p["layer_scale.gamma"]
    return o + shortcut


_BLOCK_FN = {"er": _edge_residual, "uir": _uib, "mqa": _mqa}


# ------------------------------------------------------------------ forward
def encode_image(
    params: Params, pixels: jax.Array, cfg: Gemma3nVisionCfg
) -> jax.Array:
    """pixels [B, 3, S, S] (HF NCHW, SigLIP-normalized) ->
    features [B, soft_tokens_per_image, hidden_size] in tower space
    (the caller scales by sqrt(hidden_size) and runs the multimodal
    embedder, mirroring HF get_image_features)."""
    x = jnp.transpose(pixels, (0, 2, 3, 1))  # NHWC
    x = _conv(x, params["conv_stem.conv.weight"], 2)
    x = _gelu(_rms2d(x, params["conv_stem.bn.weight"], cfg.rms_norm_eps))
    taps = []
    for si, stage in enumerate(MOBILENETV5_300M_ENC):
        for bi, spec in enumerate(stage):
            x = _BLOCK_FN[spec[0]](
                params[f"blocks.{si}.{bi}"], x, spec, cfg.rms_norm_eps
            )
        taps.append(x)

    # MSFA: upsample coarser taps to the finest tapped grid (nearest),
    # concat channels, pointwise FFN, avg-pool to out_res, RMS norm.
    sel = [taps[i] for i in MSFA_INDICES]
    hi = max(t.shape[1] for t in sel)
    ups = []
    for t in sel:
        if t.shape[1] != hi:
            r = hi // t.shape[1]
            t = jnp.repeat(jnp.repeat(t, r, axis=1), r, axis=2)
        ups.append(t)
    f = jnp.concatenate(ups, axis=-1)
    p = params["msfa"]
    f = _conv_norm_act(f, p, "ffn.pw_exp", eps=cfg.rms_norm_eps)
    f = _conv_norm_act(f, p, "ffn.pw_proj", act=False, eps=cfg.rms_norm_eps)
    r = f.shape[1] // cfg.out_res
    f = jax.lax.reduce_window(
        f.astype(jnp.float32),
        0.0,
        jax.lax.add,
        (1, r, r, 1),
        (1, r, r, 1),
        "VALID",
    ) / float(r * r)
    f = _rms2d(f.astype(x.dtype), p["norm.weight"], cfg.rms_norm_eps)
    b = f.shape[0]
    # HF get_image_features: [B, C, H, W] -> reshape(B, C, HW) ->
    # permute(0, 2, 1); our NHWC [B, H, W, C] row-major flatten of the
    # spatial axes is the same token order.
    return f.reshape(b, cfg.soft_tokens_per_image, cfg.hidden_size)


# ------------------------------------------------------------------ params
def _spec_shapes(cin: int, spec: Tuple) -> Dict[str, Tuple[int, ...]]:
    """HWIO conv shapes + norm widths for one block, keyed by the
    timm-compatible parameter names."""
    kind = spec[0]
    if kind == "er":
        _, k, s, e, cout = spec
        mid = int(cin * e)
        return {
            "conv_exp.weight": (k, k, cin, mid),
            "bn1.weight": (mid,),
            "conv_pwl.weight": (1, 1, mid, cout),
            "bn2.weight": (cout,),
        }
    if kind == "uir":
        _, a, k, s, e, cout = spec
        mid = int(cin * e)
        shapes: Dict[str, Tuple[int, ...]] = {}
        if a:
            shapes["dw_start.conv.weight"] = (a, a, 1, cin)
            shapes["dw_start.bn.weight"] = (cin,)
        shapes["pw_exp.conv.weight"] = (1, 1, cin, mid)
        shapes["pw_exp.bn.weight"] = (mid,)
        if k:
            shapes["dw_mid.conv.weight"] = (k, k, 1, mid)
            shapes["dw_mid.bn.weight"] = (mid,)
        shapes["pw_proj.conv.weight"] = (1, 1, mid, cout)
        shapes["pw_proj.bn.weight"] = (cout,)
        shapes["layer_scale.gamma"] = (cout,)
        return shapes
    if kind == "mqa":
        _, heads, dk, dv, kv_s, c = spec
        shapes = {
            "norm.weight": (c,),
            "attn.query.proj.weight": (1, 1, c, heads * dk),
            "attn.key.proj.weight": (1, 1, c, dk),
            "attn.value.proj.weight": (1, 1, c, dv),
            "attn.output.proj.weight": (1, 1, heads * dv, c),
            "layer_scale.gamma": (c,),
        }
        if kv_s > 1:
            for side in ("key", "value"):
                shapes[f"attn.{side}.down_conv.weight"] = (3, 3, 1, c)
                shapes[f"attn.{side}.norm.weight"] = (c,)
        return shapes
    raise ValueError(kind)


def tower_shape_table(
    cfg: Gemma3nVisionCfg,
) -> Dict[str, Dict[str, Tuple[int, ...]]]:
    """Full parameter shape table: {block_path: {param_name: shape}}."""
    table: Dict[str, Dict[str, Tuple[int, ...]]] = {
        "conv_stem": {
            "conv.weight": (3, 3, 3, STEM_CH),
            "bn.weight": (STEM_CH,),
        }
    }
    cin = STEM_CH
    for si, stage in enumerate(MOBILENETV5_300M_ENC):
        for bi, spec in enumerate(stage):
            table[f"blocks.{si}.{bi}"] = _spec_shapes(cin, spec)
            cin = spec[-1]
    fused = sum(
        MOBILENETV5_300M_ENC[i][-1][-1] for i in MSFA_INDICES
    )
    mid = int(fused * MSFA_EXPAND)
    table["msfa"] = {
        "ffn.pw_exp.conv.weight": (1, 1, fused, mid),
        "ffn.pw_exp.bn.weight": (mid,),
        "ffn.pw_proj.conv.weight": (1, 1, mid, cfg.hidden_size),
        "ffn.pw_proj.bn.weight": (cfg.hidden_size,),
        "norm.weight": (cfg.hidden_size,),
    }
    return table


def init_vision_params(
    cfg: Gemma3nVisionCfg, seed: int = 0, dtype=jnp.float32
) -> Params:
    """Random tower (tests / timing); norms at 1, layer_scale small."""
    rng = np.random.default_rng(seed)
    params: Params = {}
    for path, shapes in tower_shape_table(cfg).items():
        blk: Params = {}
        for name, shp in shapes.items():
            if name.endswith("bn.weight") or name.endswith("norm.weight"):
                blk[name] = jnp.ones(shp, dtype)
            elif name.endswith("layer_scale.gamma"):
                blk[name] = jnp.full(shp, 1e-2, dtype)
            else:
                fan_in = int(np.prod(shp[:-1])) or 1
                blk[name] = jnp.asarray(
                    rng.standard_normal(shp) / math.sqrt(fan_in), dtype
                )
        if path in ("conv_stem", "msfa"):
            params[path] = blk
        else:
            params[path] = blk
    # flatten conv_stem into top-level names used by encode_image
    stem = params.pop("conv_stem")
    params["conv_stem.conv.weight"] = stem["conv.weight"]
    params["conv_stem.bn.weight"] = stem["bn.weight"]
    return params


def load_vision_params(
    tensors: Dict[str, np.ndarray], cfg: Gemma3nVisionCfg, dtype
) -> Params:
    """Map timm-named checkpoint tensors (torch OIHW convs) onto the
    tower tree; FAIL LOUD with the complete mismatch list if the
    checkpoint's block table differs from this reconstruction."""
    want = tower_shape_table(cfg)
    missing: List[str] = []
    params: Params = {}

    def to_hwio(name: str, arr: np.ndarray, shp: Tuple[int, ...]):
        if arr.ndim == 4:  # torch OIHW -> HWIO
            arr = np.transpose(arr, (2, 3, 1, 0))
        if tuple(arr.shape) != shp:
            missing.append(
                f"{name}: checkpoint {tuple(arr.shape)} != expected {shp}"
            )
            return None
        return jnp.asarray(arr, dtype)

    used = set()
    for path, shapes in want.items():
        blk: Params = {}
        for pname, shp in shapes.items():
            full = f"{path}.{pname}"
            if full not in tensors:
                if pname == "layer_scale.gamma":
                    continue  # optional in timm
                missing.append(f"{full}: absent from checkpoint")
                continue
            used.add(full)
            v = to_hwio(full, tensors[full], shp)
            if v is not None:
                blk[pname] = v
        if path == "conv_stem":
            params["conv_stem.conv.weight"] = blk.get("conv.weight")
            params["conv_stem.bn.weight"] = blk.get("bn.weight")
        else:
            params[path] = blk
    extra = sorted(set(tensors) - used)
    if missing or extra:
        raise ValueError(
            "Gemma-3n vision tower layout mismatch (this tower is a "
            "MobileNetV5-300m reconstruction — timm absent, no oracle):\n"
            + "\n".join(missing[:40])
            + ("\n... plus unexpected checkpoint keys: "
               + ", ".join(extra[:20]) if extra else "")
        )
    return params


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))

# SPDX-License-Identifier: Apache-2.0
"""VITS / MMS-TTS text-to-speech in JAX (inference).

The reference's TTS tower wraps mlx-audio models (reference
audio/tts.py:52-227); the TPU build owns a VITS-family synthesizer —
the architecture behind Meta's MMS-TTS (1100+ languages) and the
original VITS voices:

  text encoder (relative-position transformer) -> duration predictor
  (stochastic spline-flow or deterministic conv) -> length regulator ->
  inverse residual-coupling flow -> HiFi-GAN vocoder.

HF ``VitsModel`` parity: every submodule matches transformers
modeling_vits.py numerics; with noise scales at 0 the full synthesis is
deterministic and token-exact against torch.

TPU mapping: synthesis is two compiled programs — (1) text encode +
duration over a padded text bucket, (2) flow + vocoder over a padded
frame bucket — with one host step between them to expand durations into
frame gather indices (a dynamic-shape op XLA can't trace).
"""

from __future__ import annotations

import json
import logging
import math
import os
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


@dataclass
class VitsConfig:
    vocab_size: int = 38
    hidden_size: int = 192
    num_hidden_layers: int = 6
    num_attention_heads: int = 2
    window_size: int = 4
    use_bias: bool = True
    ffn_dim: int = 768
    ffn_kernel_size: int = 3
    layer_norm_eps: float = 1e-5
    hidden_act: str = "relu"
    flow_size: int = 192
    spectrogram_bins: int = 513
    # duration predictor
    use_stochastic_duration_prediction: bool = True
    duration_predictor_kernel_size: int = 3
    duration_predictor_filter_channels: int = 256
    duration_predictor_num_flows: int = 4
    duration_predictor_flow_bins: int = 10
    duration_predictor_tail_bound: float = 5.0
    depth_separable_channels: int = 2
    depth_separable_num_layers: int = 3
    # prior flow
    prior_encoder_num_flows: int = 4
    prior_encoder_num_wavenet_layers: int = 4
    wavenet_kernel_size: int = 5
    wavenet_dilation_rate: int = 1
    # HiFi-GAN
    upsample_initial_channel: int = 512
    upsample_rates: List[int] = field(default_factory=lambda: [8, 8, 2, 2])
    upsample_kernel_sizes: List[int] = field(
        default_factory=lambda: [16, 16, 4, 4]
    )
    resblock_kernel_sizes: List[int] = field(
        default_factory=lambda: [3, 7, 11]
    )
    resblock_dilation_sizes: List[List[int]] = field(
        default_factory=lambda: [[1, 3, 5], [1, 3, 5], [1, 3, 5]]
    )
    leaky_relu_slope: float = 0.1
    # speakers / generation
    num_speakers: int = 1
    speaker_embedding_size: int = 0
    speaking_rate: float = 1.0
    noise_scale: float = 0.667
    noise_scale_duration: float = 0.8
    sampling_rate: int = 16000

    @classmethod
    def from_pretrained(cls, path: str) -> "VitsConfig":
        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        names = {f_.name for f_ in __import__("dataclasses").fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in names})

    @property
    def upsample_factor(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out


# ------------------------------------------------------------------ primitives
def conv1d(
    x: jax.Array,  # [C_in, T]
    w: jax.Array,  # [C_out, C_in/groups, K]
    b: Optional[jax.Array] = None,
    *,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x[None],
        w,
        window_strides=(1,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )[0]
    if b is not None:
        y = y + b[:, None]
    return y


def conv_transpose1d(
    x: jax.Array,  # [C_in, T]
    w: jax.Array,  # torch layout [C_in, C_out, K]
    b: Optional[jax.Array] = None,
    *,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """torch ConvTranspose1d == input-dilated conv with the flipped,
    transposed kernel."""
    k = w.shape[-1]
    w_flip = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # [C_out, C_in, K]
    y = jax.lax.conv_general_dilated(
        x[None],
        w_flip,
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[0]
    if b is not None:
        y = y + b[:, None]
    return y


def _layer_norm_ct(x: jax.Array, w, b, eps: float) -> jax.Array:
    """LayerNorm over the channel dim of a [C, T] array."""
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.var(x, axis=0, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * w[:, None] + b[:, None]


def _leaky(x, slope):
    return jnp.where(x >= 0, x, x * slope)


# ------------------------------------------------------------- rq spline flow
def _rational_quadratic_spline(
    inputs, uw, uh, ud, reverse, tail_bound,
    min_bin_width=1e-3, min_bin_height=1e-3, min_derivative=1e-3,
):
    """Monotonic rational-quadratic spline with identity tails
    (HF ``_unconstrained_rational_quadratic_spline`` numerics,
    modeling_vits.py:96-266) — fully vectorized, no boolean indexing."""
    num_bins = uw.shape[-1]
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
    x = jnp.clip(inputs, -tail_bound, tail_bound)

    constant = math.log(math.exp(1.0 - min_derivative) - 1.0)
    ud = jnp.pad(ud, [(0, 0)] * (ud.ndim - 1) + [(1, 1)],
                 constant_values=constant)

    widths = jax.nn.softmax(uw, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumw = jnp.cumsum(widths, axis=-1)
    cumw = jnp.pad(cumw, [(0, 0)] * (cumw.ndim - 1) + [(1, 0)])
    cumw = 2 * tail_bound * cumw - tail_bound
    cumw = cumw.at[..., 0].set(-tail_bound)
    cumw = cumw.at[..., -1].set(tail_bound)
    widths = cumw[..., 1:] - cumw[..., :-1]

    derivs = min_derivative + jax.nn.softplus(ud)

    heights = jax.nn.softmax(uh, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumh = jnp.cumsum(heights, axis=-1)
    cumh = jnp.pad(cumh, [(0, 0)] * (cumh.ndim - 1) + [(1, 0)])
    cumh = 2 * tail_bound * cumh - tail_bound
    cumh = cumh.at[..., 0].set(-tail_bound)
    cumh = cumh.at[..., -1].set(tail_bound)
    heights = cumh[..., 1:] - cumh[..., :-1]

    locations = cumh if reverse else cumw
    locations = locations.at[..., -1].add(1e-6)
    bin_idx = jnp.sum(
        (x[..., None] >= locations).astype(jnp.int32), axis=-1
    ) - 1
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)[..., None]

    def g(a):
        return jnp.take_along_axis(a, bin_idx, axis=-1)[..., 0]

    in_cumw = g(cumw[..., :-1])
    in_w = g(widths)
    in_cumh = g(cumh[..., :-1])
    delta = heights / widths
    in_delta = g(delta)
    in_d = g(derivs[..., :-1])
    in_d1 = g(derivs[..., 1:])
    in_h = g(heights)

    inter1 = in_d + in_d1 - 2 * in_delta
    if not reverse:
        theta = (x - in_cumw) / in_w
        tmt = theta * (1 - theta)
        numer = in_h * (in_delta * theta**2 + in_d * tmt)
        denom = in_delta + inter1 * tmt
        out = in_cumh + numer / denom
    else:
        inter2 = x - in_cumh
        inter3 = inter2 * inter1
        a = in_h * (in_delta - in_d) + inter3
        b = in_h * in_d - inter3
        c = -in_delta * inter2
        disc = jnp.maximum(b**2 - 4 * a * c, 0.0)
        root = (2 * c) / (-b - jnp.sqrt(disc) - 1e-12)
        out = root * in_w + in_cumw
    return jnp.where(inside, out, inputs)


# -------------------------------------------------------------- text encoder
def _relative_attention(
    p: Params, cfg: VitsConfig, x: jax.Array, mask: jax.Array
) -> jax.Array:
    """VitsAttention with windowed relative position embeddings
    (modeling_vits.py:842). x: [T, H], mask: [T] float."""
    t, hdim = x.shape
    nh = cfg.num_attention_heads
    hd = hdim // nh
    scale = hd**-0.5
    q = (x @ p["q_w"].T + p.get("q_b", 0)) * scale
    k = x @ p["k_w"].T + p.get("k_b", 0)
    v = x @ p["v_w"].T + p.get("v_b", 0)
    q = q.reshape(t, nh, hd).transpose(1, 0, 2)  # [nh, T, hd]
    k = k.reshape(t, nh, hd).transpose(1, 0, 2)
    v = v.reshape(t, nh, hd).transpose(1, 0, 2)
    scores = q @ k.transpose(0, 2, 1)  # [nh, T, T]

    ws = cfg.window_size
    if ws:
        # slice/pad the (2*ws+1) relative table to 2T-1 entries
        rel = p["emb_rel_k"][0]  # [2*ws+1, hd]
        pad = max(t - (ws + 1), 0)
        if pad > 0:
            rel = jnp.pad(rel, [(pad, pad), (0, 0)])
        start = max((ws + 1) - t, 0)
        rel = rel[start : start + 2 * t - 1]  # [2T-1, hd]
        rel_logits = q @ rel.T  # [nh, T, 2T-1]
        # relative -> absolute (pad/reshape trick)
        xpad = jnp.pad(rel_logits, [(0, 0), (0, 0), (0, 1)])
        flat = xpad.reshape(nh, t * 2 * t)
        flat = jnp.pad(flat, [(0, 0), (0, t - 1)])
        final = flat.reshape(nh, t + 1, 2 * t - 1)[:, :t, t - 1 :]
        scores = scores + final

    neg = jnp.finfo(scores.dtype).min
    scores = jnp.where(mask[None, None, :] > 0, scores, neg)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = probs @ v  # [nh, T, hd]

    if ws:
        relv = p["emb_rel_v"][0]
        pad = max(t - (ws + 1), 0)
        if pad > 0:
            relv = jnp.pad(relv, [(pad, pad), (0, 0)])
        start = max((ws + 1) - t, 0)
        relv = relv[start : start + 2 * t - 1]
        # absolute -> relative weights
        xpad = jnp.pad(probs, [(0, 0), (0, 0), (0, t - 1)])
        flat = xpad.reshape(nh, t * (2 * t - 1))
        flat = jnp.pad(flat, [(0, 0), (t, 0)])
        relw = flat.reshape(nh, t, 2 * t)[:, :, 1:]  # [nh, T, 2T-1]
        ctx = ctx + relw @ relv

    out = ctx.transpose(1, 0, 2).reshape(t, hdim)
    return out @ p["o_w"].T + p.get("o_b", 0)


def text_encode(
    params: Params, cfg: VitsConfig, ids: jax.Array, mask: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """ids [T], mask [T] -> (hidden [H, T], prior_means [F, T],
    prior_log_var [F, T])."""
    x = params["embed"][ids] * math.sqrt(cfg.hidden_size)  # [T, H]
    x = x * mask[:, None]
    eps = cfg.layer_norm_eps
    kf = cfg.ffn_kernel_size
    pl, pr = (kf - 1) // 2, kf // 2
    for lp in params["layers"]:
        attn = _relative_attention(lp, cfg, x, mask)
        x = _layer_norm_ct(
            (x + attn).T, lp["ln1_w"], lp["ln1_b"], eps
        ).T
        # feed-forward (conv over time)
        h = (x * mask[:, None]).T  # [H, T]
        if kf > 1:
            h = jnp.pad(h, [(0, 0), (pl, pr)])
        h = conv1d(h, lp["ff1_w"], lp["ff1_b"])
        h = jax.nn.relu(h) if cfg.hidden_act == "relu" else jax.nn.gelu(h)
        h = h * mask[None, :]
        if kf > 1:
            h = jnp.pad(h, [(0, 0), (pl, pr)])
        h = conv1d(h, lp["ff2_w"], lp["ff2_b"]) * mask[None, :]
        x = _layer_norm_ct((x + h.T).T, lp["ln2_w"], lp["ln2_b"], eps).T
    x = x * mask[:, None]
    stats = conv1d(x.T, params["proj_w"], params["proj_b"]) * mask[None, :]
    f = cfg.flow_size
    return x.T, stats[:f], stats[f:]


# ------------------------------------------------------------------- wavenet
def wavenet(
    p: Params, cfg: VitsConfig, x: jax.Array, mask: jax.Array,
    num_layers: int, cond: Optional[jax.Array] = None,
) -> jax.Array:
    """Gated dilated conv stack (modeling_vits.py:303). x: [H, T]."""
    h = cfg.hidden_size
    out = jnp.zeros_like(x)
    gc = None
    if cond is not None and "cond_w" in p:
        gc = conv1d(cond, p["cond_w"], p["cond_b"])  # [2H*L, 1]
    for i in range(num_layers):
        dilation = cfg.wavenet_dilation_rate**i
        pad = (cfg.wavenet_kernel_size * dilation - dilation) // 2
        hs = conv1d(
            x, p["in_w"][i], p["in_b"][i], padding=pad, dilation=dilation
        )  # [2H, T]
        if gc is not None:
            hs = hs + gc[i * 2 * h : (i + 1) * 2 * h]
        acts = jnp.tanh(hs[:h] + 0.0) * jax.nn.sigmoid(hs[h:])
        rs = conv1d(acts, p["rs_w"][i], p["rs_b"][i])
        if i < num_layers - 1:
            x = (x + rs[:h]) * mask[None, :]
            out = out + rs[h:]
        else:
            out = out + rs
    return out * mask[None, :]


# -------------------------------------------------------- duration predictors
def _dds_conv(
    p: Params, cfg: VitsConfig, x: jax.Array, mask: jax.Array,
    cond: Optional[jax.Array] = None,
) -> jax.Array:
    """VitsDilatedDepthSeparableConv (modeling_vits.py:598). x: [C, T]."""
    if cond is not None:
        x = x + cond
    k = cfg.duration_predictor_kernel_size
    eps = 1e-5
    for i in range(cfg.depth_separable_num_layers):
        dilation = k**i
        pad = (k * dilation - dilation) // 2
        h = conv1d(
            x * mask[None, :], p["dil_w"][i], p["dil_b"][i],
            padding=pad, dilation=dilation, groups=x.shape[0],
        )
        h = _layer_norm_ct(h, p["n1_w"][i], p["n1_b"][i], eps)
        h = jax.nn.gelu(h, approximate=False)
        h = conv1d(h, p["pt_w"][i], p["pt_b"][i])
        h = _layer_norm_ct(h, p["n2_w"][i], p["n2_b"][i], eps)
        h = jax.nn.gelu(h, approximate=False)
        x = x + h
    return x * mask[None, :]


def _conv_flow(
    p: Params, cfg: VitsConfig, x: jax.Array, mask: jax.Array,
    cond: jax.Array, reverse: bool,
) -> jax.Array:
    """VitsConvFlow spline coupling (modeling_vits.py:644). x: [2, T]."""
    half = cfg.depth_separable_channels // 2
    first, second = x[:half], x[half:]
    h = conv1d(first, p["pre_w"], p["pre_b"])
    h = _dds_conv(p["dds"], cfg, h, mask, cond)
    h = conv1d(h, p["proj_w"], p["proj_b"]) * mask[None, :]
    t = x.shape[-1]
    nb = cfg.duration_predictor_flow_bins
    h = h.reshape(half, -1, t).transpose(0, 2, 1)  # [half, T, 3*nb-1]
    denom = math.sqrt(cfg.hidden_size)
    second = _rational_quadratic_spline(
        second,
        h[..., :nb] / denom,
        h[..., nb : 2 * nb] / denom,
        h[..., 2 * nb :],
        reverse=reverse,
        tail_bound=cfg.duration_predictor_tail_bound,
    )
    return jnp.concatenate([first, second], axis=0) * mask[None, :]


def stochastic_duration_reverse(
    p: Params, cfg: VitsConfig, hidden: jax.Array, mask: jax.Array,
    noise: jax.Array, cond: Optional[jax.Array] = None,
) -> jax.Array:
    """SDP inference path (modeling_vits.py:705, reverse=True):
    noise [2, T] flows backwards through [ConvFlow*N, ElementwiseAffine].
    Returns log-durations [T]."""
    x = conv1d(hidden, p["pre_w"], p["pre_b"])
    if cond is not None and "cond_w" in p:
        x = x + conv1d(cond, p["cond_w"], p["cond_b"])
    x = _dds_conv(p["dds"], cfg, x, mask)
    x = conv1d(x, p["proj_w"], p["proj_b"]) * mask[None, :]

    latents = noise
    # flows list = [affine, cf_1..cf_N]; the HF reverse path runs
    # [cf_N..cf_2, affine] — cf_1 is dropped ("remove a useless vflow",
    # modeling_vits.py:800)
    for fp in reversed(p["flows"][2:]):
        latents = jnp.flip(latents, axis=0)
        latents = _conv_flow(fp, cfg, latents, mask, x, reverse=True)
    latents = jnp.flip(latents, axis=0)
    affine = p["flows"][0]
    latents = (
        (latents - affine["translate"]) * jnp.exp(-affine["log_scale"])
    ) * mask[None, :]
    return latents[0]


def duration_predict(
    p: Params, cfg: VitsConfig, hidden: jax.Array, mask: jax.Array,
    cond: Optional[jax.Array] = None,
) -> jax.Array:
    """Deterministic duration predictor (modeling_vits.py:805)."""
    x = hidden
    if cond is not None and "cond_w" in p:
        x = x + conv1d(cond, p["cond_w"], p["cond_b"])
    k = cfg.duration_predictor_kernel_size
    eps = cfg.layer_norm_eps
    x = conv1d(x * mask[None, :], p["c1_w"], p["c1_b"], padding=k // 2)
    x = _layer_norm_ct(jax.nn.relu(x), p["n1_w"], p["n1_b"], eps)
    x = conv1d(x * mask[None, :], p["c2_w"], p["c2_b"], padding=k // 2)
    x = _layer_norm_ct(jax.nn.relu(x), p["n2_w"], p["n2_b"], eps)
    x = conv1d(x * mask[None, :], p["proj_w"], p["proj_b"])
    return (x * mask[None, :])[0]


# ------------------------------------------------------------- flow + decoder
def flow_reverse(
    p: Params, cfg: VitsConfig, z: jax.Array, mask: jax.Array,
    cond: Optional[jax.Array] = None,
) -> jax.Array:
    """Inverse residual-coupling block (modeling_vits.py:579).
    z: [F, T] -> latents [F, T]."""
    half = cfg.flow_size // 2
    for fp in reversed(p["flows"]):
        z = jnp.flip(z, axis=0)
        first, second = z[:half], z[half:]
        h = conv1d(first, fp["pre_w"], fp["pre_b"]) * mask[None, :]
        h = wavenet(
            fp["wn"], cfg, h, mask,
            cfg.prior_encoder_num_wavenet_layers, cond,
        )
        mean = conv1d(h, fp["post_w"], fp["post_b"]) * mask[None, :]
        second = (second - mean) * mask[None, :]
        z = jnp.concatenate([first, second], axis=0)
    return z


def hifigan(
    p: Params, cfg: VitsConfig, spec: jax.Array,
    cond: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """HiFi-GAN vocoder (modeling_vits.py:464). spec [F, T] -> wave [T'].

    ``mask`` zeroes padded frames after every conv: HF runs unpadded
    tensors whose convs see implicit zeros past the true length, so a
    padded-bucket run must keep the pad region identically zero or
    bias-colored garbage leaks into the valid tail through conv
    receptive fields."""
    slope = cfg.leaky_relu_slope

    def m(x):
        return x if mask is None else x * mask[None, :]

    x = m(conv1d(m(spec), p["pre_w"], p["pre_b"], padding=3))
    if cond is not None and "cond_w" in p:
        x = m(x + conv1d(cond, p["cond_w"], p["cond_b"]))
    nk = len(cfg.resblock_kernel_sizes)
    for i, (rate, k) in enumerate(
        zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
    ):
        x = _leaky(x, slope)
        x = conv_transpose1d(
            x, p["up_w"][i], p["up_b"][i],
            stride=rate, padding=(k - rate) // 2,
        )
        if mask is not None:
            mask = jnp.repeat(mask, rate)
        x = m(x)
        acc = None
        for j in range(nk):
            rb = p["resblocks"][i * nk + j]
            kr = cfg.resblock_kernel_sizes[j]
            h = x
            for c1_w, c1_b, c2_w, c2_b, dil in zip(
                rb["c1_w"], rb["c1_b"], rb["c2_w"], rb["c2_b"],
                cfg.resblock_dilation_sizes[j],
            ):
                res = h
                h = _leaky(h, slope)
                h = m(conv1d(
                    h, c1_w, c1_b,
                    padding=(kr * dil - dil) // 2, dilation=dil,
                ))
                h = _leaky(h, slope)
                h = m(conv1d(h, c2_w, c2_b, padding=kr // 2))
                h = h + res
            acc = h if acc is None else acc + h
        x = acc / nk
    x = _leaky(x, 0.01)  # default F.leaky_relu slope
    x = m(conv1d(x, p["post_w"], None, padding=3))
    return jnp.tanh(x)[0]


# --------------------------------------------------------------- weight load
def _fold_weight_norm(sd: Dict[str, np.ndarray], base: str) -> np.ndarray:
    """Fold weight-norm (g, v) -> g * v / ||v|| (dim 0)."""
    for gk, vk in (
        (f"{base}.parametrizations.weight.original0",
         f"{base}.parametrizations.weight.original1"),
        (f"{base}.weight_g", f"{base}.weight_v"),
    ):
        if gk in sd:
            g, v = sd[gk], sd[vk]
            norm = np.sqrt(
                np.sum(v.astype(np.float64) ** 2, axis=(1, 2), keepdims=True)
            )
            return (g * v / np.maximum(norm, 1e-12)).astype(np.float32)
    return sd[f"{base}.weight"]


def load_vits_params(path: str, cfg: VitsConfig) -> Params:
    from . import loader

    sd: Dict[str, np.ndarray] = {
        name: np.asarray(t, dtype=np.float32)
        if t.dtype.kind == "f" else np.asarray(t)
        for name, t in loader.iter_safetensors(path)
    }

    def arr(k):
        return jnp.asarray(sd[k])

    def conv(base):
        w = jnp.asarray(_fold_weight_norm(sd, base))
        b = arr(f"{base}.bias") if f"{base}.bias" in sd else None
        return w, b

    params: Params = {}
    # text encoder
    params["embed"] = arr("text_encoder.embed_tokens.weight")
    layers = []
    i = 0
    while f"text_encoder.encoder.layers.{i}.attention.q_proj.weight" in sd:
        b = f"text_encoder.encoder.layers.{i}"
        lp = {
            "q_w": arr(f"{b}.attention.q_proj.weight"),
            "k_w": arr(f"{b}.attention.k_proj.weight"),
            "v_w": arr(f"{b}.attention.v_proj.weight"),
            "o_w": arr(f"{b}.attention.out_proj.weight"),
            "ln1_w": arr(f"{b}.layer_norm.weight"),
            "ln1_b": arr(f"{b}.layer_norm.bias"),
            "ln2_w": arr(f"{b}.final_layer_norm.weight"),
            "ln2_b": arr(f"{b}.final_layer_norm.bias"),
            "ff1_w": arr(f"{b}.feed_forward.conv_1.weight"),
            "ff1_b": arr(f"{b}.feed_forward.conv_1.bias"),
            "ff2_w": arr(f"{b}.feed_forward.conv_2.weight"),
            "ff2_b": arr(f"{b}.feed_forward.conv_2.bias"),
        }
        for nm in ("q", "k", "v"):
            bk = f"{b}.attention.{nm}_proj.bias"
            if bk in sd:
                lp[f"{nm}_b"] = arr(bk)
        if f"{b}.attention.out_proj.bias" in sd:
            lp["o_b"] = arr(f"{b}.attention.out_proj.bias")
        if f"{b}.attention.emb_rel_k" in sd:
            lp["emb_rel_k"] = arr(f"{b}.attention.emb_rel_k")
            lp["emb_rel_v"] = arr(f"{b}.attention.emb_rel_v")
        layers.append(lp)
        i += 1
    params["layers"] = layers
    params["proj_w"], params["proj_b"] = conv("text_encoder.project")

    def load_dds(base):
        out = {
            "dil_w": [], "dil_b": [], "pt_w": [], "pt_b": [],
            "n1_w": [], "n1_b": [], "n2_w": [], "n2_b": [],
        }
        for j in range(cfg.depth_separable_num_layers):
            out["dil_w"].append(arr(f"{base}.convs_dilated.{j}.weight"))
            out["dil_b"].append(arr(f"{base}.convs_dilated.{j}.bias"))
            out["pt_w"].append(arr(f"{base}.convs_pointwise.{j}.weight"))
            out["pt_b"].append(arr(f"{base}.convs_pointwise.{j}.bias"))
            out["n1_w"].append(arr(f"{base}.norms_1.{j}.weight"))
            out["n1_b"].append(arr(f"{base}.norms_1.{j}.bias"))
            out["n2_w"].append(arr(f"{base}.norms_2.{j}.weight"))
            out["n2_b"].append(arr(f"{base}.norms_2.{j}.bias"))
        return out

    # duration predictor
    dp: Params = {}
    if cfg.use_stochastic_duration_prediction:
        dp["pre_w"], dp["pre_b"] = conv("duration_predictor.conv_pre")
        dp["proj_w"], dp["proj_b"] = conv("duration_predictor.conv_proj")
        dp["dds"] = load_dds("duration_predictor.conv_dds")
        if "duration_predictor.cond.weight" in sd:
            dp["cond_w"], dp["cond_b"] = conv("duration_predictor.cond")
        flows: List[Params] = [
            {
                "translate": arr("duration_predictor.flows.0.translate"),
                "log_scale": arr("duration_predictor.flows.0.log_scale"),
            }
        ]
        for j in range(1, cfg.duration_predictor_num_flows + 1):
            b = f"duration_predictor.flows.{j}"
            fp = {"dds": load_dds(f"{b}.conv_dds")}
            fp["pre_w"], fp["pre_b"] = conv(f"{b}.conv_pre")
            fp["proj_w"], fp["proj_b"] = conv(f"{b}.conv_proj")
            flows.append(fp)
        dp["flows"] = flows
    else:
        dp["c1_w"], dp["c1_b"] = conv("duration_predictor.conv_1")
        dp["c2_w"], dp["c2_b"] = conv("duration_predictor.conv_2")
        dp["proj_w"], dp["proj_b"] = conv("duration_predictor.proj")
        dp["n1_w"] = arr("duration_predictor.norm_1.weight")
        dp["n1_b"] = arr("duration_predictor.norm_1.bias")
        dp["n2_w"] = arr("duration_predictor.norm_2.weight")
        dp["n2_b"] = arr("duration_predictor.norm_2.bias")
        if "duration_predictor.cond.weight" in sd:
            dp["cond_w"], dp["cond_b"] = conv("duration_predictor.cond")
    params["duration"] = dp

    # prior flow
    flows = []
    j = 0
    while f"flow.flows.{j}.conv_pre.weight" in sd:
        b = f"flow.flows.{j}"
        fp: Params = {}
        fp["pre_w"], fp["pre_b"] = conv(f"{b}.conv_pre")
        fp["post_w"], fp["post_b"] = conv(f"{b}.conv_post")
        wn = {"in_w": [], "in_b": [], "rs_w": [], "rs_b": []}
        for i2 in range(cfg.prior_encoder_num_wavenet_layers):
            wn["in_w"].append(
                jnp.asarray(
                    _fold_weight_norm(sd, f"{b}.wavenet.in_layers.{i2}")
                )
            )
            wn["in_b"].append(arr(f"{b}.wavenet.in_layers.{i2}.bias"))
            wn["rs_w"].append(
                jnp.asarray(
                    _fold_weight_norm(sd, f"{b}.wavenet.res_skip_layers.{i2}")
                )
            )
            wn["rs_b"].append(arr(f"{b}.wavenet.res_skip_layers.{i2}.bias"))
        if f"{b}.wavenet.cond_layer.bias" in sd:
            wn["cond_w"] = jnp.asarray(
                _fold_weight_norm(sd, f"{b}.wavenet.cond_layer")
            )
            wn["cond_b"] = arr(f"{b}.wavenet.cond_layer.bias")
        fp["wn"] = wn
        flows.append(fp)
        j += 1
    params["flow"] = {"flows": flows}

    # HiFi-GAN
    dec: Params = {}
    dec["pre_w"], dec["pre_b"] = conv("decoder.conv_pre")
    dec["post_w"] = jnp.asarray(_fold_weight_norm(sd, "decoder.conv_post"))
    if "decoder.cond.weight" in sd:
        dec["cond_w"], dec["cond_b"] = conv("decoder.cond")
    dec["up_w"], dec["up_b"] = [], []
    for i2 in range(len(cfg.upsample_rates)):
        w = jnp.asarray(_fold_weight_norm(sd, f"decoder.upsampler.{i2}"))
        dec["up_w"].append(w)
        dec["up_b"].append(arr(f"decoder.upsampler.{i2}.bias"))
    resblocks = []
    j = 0
    while f"decoder.resblocks.{j}.convs1.0.bias" in sd:
        b = f"decoder.resblocks.{j}"
        rb = {"c1_w": [], "c1_b": [], "c2_w": [], "c2_b": []}
        i2 = 0
        while f"{b}.convs1.{i2}.bias" in sd:
            rb["c1_w"].append(
                jnp.asarray(_fold_weight_norm(sd, f"{b}.convs1.{i2}"))
            )
            rb["c1_b"].append(arr(f"{b}.convs1.{i2}.bias"))
            rb["c2_w"].append(
                jnp.asarray(_fold_weight_norm(sd, f"{b}.convs2.{i2}"))
            )
            rb["c2_b"].append(arr(f"{b}.convs2.{i2}.bias"))
            i2 += 1
        resblocks.append(rb)
        j += 1
    dec["resblocks"] = resblocks
    params["decoder"] = dec

    if "embed_speaker.weight" in sd:
        params["embed_speaker"] = arr("embed_speaker.weight")
    return params


# ------------------------------------------------------------------ the model
class VitsTTS:
    """Two-program VITS synthesis with per-length-bucket jits."""

    _TEXT_BUCKETS = (32, 64, 128, 256, 512, 1024)
    _FRAME_BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192)

    def __init__(self, model_path: str) -> None:
        self.model_path = model_path
        self.cfg = VitsConfig.from_pretrained(model_path)
        self.params = load_vits_params(model_path, self.cfg)
        self._stage1 = jax.jit(partial(self._encode_and_duration))
        self._stage2 = jax.jit(partial(self._flow_and_decode))

    # stage 1: padded text -> (log_duration, prior stats)
    def _encode_and_duration(
        self, params, ids, mask, dur_noise, speaker
    ):
        cfg = self.cfg
        hidden, means, logvar = text_encode(params, cfg, ids, mask)
        cond = None
        if "embed_speaker" in params and cfg.speaker_embedding_size:
            cond = params["embed_speaker"][speaker][:, None]  # [E, 1]
        if cfg.use_stochastic_duration_prediction:
            logd = stochastic_duration_reverse(
                params["duration"], cfg, hidden, mask, dur_noise, cond
            )
        else:
            logd = duration_predict(params["duration"], cfg, hidden, mask, cond)
        return logd, means, logvar

    # stage 2: expanded prior -> waveform
    def _flow_and_decode(self, params, prior, out_mask, speaker):
        cfg = self.cfg
        cond = None
        if "embed_speaker" in params and cfg.speaker_embedding_size:
            cond = params["embed_speaker"][speaker][:, None]
        latents = flow_reverse(params["flow"], cfg, prior, out_mask, cond)
        return hifigan(
            params["decoder"], cfg, latents * out_mask[None, :], cond,
            mask=out_mask,
        )

    @staticmethod
    def _bucket(n: int, buckets) -> int:
        for b in buckets:
            if b >= n:
                return b
        return n

    def synthesize(
        self,
        input_ids: List[int],
        speaking_rate: Optional[float] = None,
        noise_scale: Optional[float] = None,
        noise_scale_duration: Optional[float] = None,
        speaker_id: int = 0,
        seed: int = 0,
    ) -> np.ndarray:
        """Token ids -> waveform float32 [num_samples] in [-1, 1]."""
        cfg = self.cfg
        rate = speaking_rate if speaking_rate is not None else cfg.speaking_rate
        ns = noise_scale if noise_scale is not None else cfg.noise_scale
        nsd = (
            noise_scale_duration
            if noise_scale_duration is not None
            else cfg.noise_scale_duration
        )
        t = len(input_ids)
        tb = self._bucket(t, self._TEXT_BUCKETS)
        ids = np.zeros(tb, np.int32)
        ids[:t] = input_ids
        mask = np.zeros(tb, np.float32)
        mask[:t] = 1.0
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        dur_noise = (
            jax.random.normal(k1, (2, tb), jnp.float32) * nsd * mask[None, :]
        )
        logd, means, logvar = self._stage1(
            self.params, jnp.asarray(ids), jnp.asarray(mask), dur_noise,
            jnp.int32(speaker_id),
        )
        logd = np.asarray(logd)[:t]
        durations = np.ceil(np.exp(logd) / max(rate, 1e-3)).astype(np.int64)
        durations = np.maximum(durations, 0)
        total = max(int(durations.sum()), 1)
        fb = self._bucket(total, self._FRAME_BUCKETS)
        # length-regulate: frame -> source text index
        src = np.repeat(np.arange(t), durations)
        gather = np.zeros(fb, np.int64)
        gather[:total] = src
        means = np.asarray(means)[:, :t]
        logvar = np.asarray(logvar)[:, :t]
        prior_m = means[:, gather]  # [F, fb]
        prior_lv = logvar[:, gather]
        out_mask = np.zeros(fb, np.float32)
        out_mask[:total] = 1.0
        if ns > 0:
            eps = np.asarray(
                jax.random.normal(k2, prior_m.shape, jnp.float32)
            )
            prior = prior_m + eps * np.exp(prior_lv) * ns
        else:
            prior = prior_m
        wave = self._stage2(
            self.params,
            jnp.asarray(prior * out_mask[None, :]),
            jnp.asarray(out_mask),
            jnp.int32(speaker_id),
        )
        n_samples = total * cfg.upsample_factor
        return np.asarray(wave, np.float32)[:n_samples]

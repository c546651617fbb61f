# SPDX-License-Identifier: Apache-2.0
"""Gemma-3n audio encoder (HF ``Gemma3nAudioEncoder``, a Universal
Speech Model conformer; modeling_gemma3n.py) + the multimodal embedder
and the numpy mel front-end (feature_extraction_gemma3n.py semantics).

This is what makes "Gemma 4 … (vision + audio)" (reference
docs/reference/models.md:38) serve audio NATIVELY rather than through
the STT-transcription fallback (reference models/mllm.py audio path):

  * SubSampleConvProjection: two 3x3 stride-2 convs (reverse-causal
    time padding, (1,1) freq padding) each followed by a CUMULATIVE
    group norm (stats cumsum'd over time) and relu, then a linear into
    the conformer width. Time is subsampled 4x, mel bins 128 -> 32.
  * 12 conformer blocks: half-residual feed-forwards around a chunked
    LOCAL attention (chunk 12, left context 13, right 0) with
    sinusoidal relative-position logits (the JAX relative-shift trick)
    per-dim query scales and a tanh logit cap, plus a causal depthwise
    lconv1d (GLU then kernel-5 conv).
  * 4x time reduction at the end -> ~6.25 tokens/s of audio; a 30 s
    clip is exactly the processor's 188 soft tokens.

Everything runs as one jitted call at a static [1, T_pad, 128] mel
shape; the valid-length mask rides along (True = PADDED, matching HF's
audio_mel_mask convention).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# --------------------------------------------------------------------- config
@dataclass(frozen=True)
class Gemma3nAudioCfg:
    input_feat_size: int = 128
    hidden_size: int = 1536
    rms_norm_eps: float = 1e-6
    gradient_clipping: float = 10_000_000_000.0
    chunk_size: int = 12
    context_left: int = 13
    context_right: int = 0
    logit_cap: float = 50.0
    num_heads: int = 8
    num_layers: int = 12
    conv_kernel: int = 5
    reduction_factor: int = 4
    residual_weight: float = 0.5
    sscp_channels: Tuple[int, int] = (128, 32)
    sscp_kernels: Tuple[Tuple[int, int], ...] = ((3, 3), (3, 3))
    sscp_strides: Tuple[Tuple[int, int], ...] = ((2, 2), (2, 2))
    sscp_gn_eps: float = 1e-3
    vocab_size: int = 128
    vocab_offset: int = 262_272

    @classmethod
    def from_hf(cls, cfg: Dict[str, Any]) -> "Gemma3nAudioCfg":
        def tt(v):
            return tuple(tuple(x) if isinstance(x, (list, tuple)) else x
                         for x in v)

        return cls(
            input_feat_size=cfg.get("input_feat_size", 128),
            hidden_size=cfg.get("hidden_size", 1536),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            gradient_clipping=cfg.get("gradient_clipping", 1e10),
            chunk_size=cfg.get("conf_attention_chunk_size", 12),
            context_left=cfg.get("conf_attention_context_left", 13),
            context_right=cfg.get("conf_attention_context_right", 0),
            logit_cap=cfg.get("conf_attention_logit_cap", 50.0),
            num_heads=cfg.get("conf_num_attention_heads", 8),
            num_layers=cfg.get("conf_num_hidden_layers", 12),
            conv_kernel=cfg.get("conf_conv_kernel_size", 5),
            reduction_factor=cfg.get("conf_reduction_factor", 4),
            residual_weight=cfg.get("conf_residual_weight", 0.5),
            sscp_channels=tuple(cfg.get("sscp_conv_channel_size", (128, 32))),
            sscp_kernels=tt(cfg.get("sscp_conv_kernel_size",
                                    ((3, 3), (3, 3)))),
            sscp_strides=tt(cfg.get("sscp_conv_stride_size",
                                    ((2, 2), (2, 2)))),
            sscp_gn_eps=cfg.get("sscp_conv_group_norm_eps", 1e-3),
            vocab_size=cfg.get("vocab_size", 128),
            vocab_offset=cfg.get("vocab_offset", 262_272),
        )


def _rms(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return (y * w.astype(jnp.float32)).astype(x.dtype)


def _clamp(x, c):
    return jnp.clip(x, -c, c)


# ----------------------------------------------------------------- mel front
def gemma3n_mel(
    waveform: np.ndarray,
    frame_length: int = 512,
    hop: int = 160,
    n_mels: int = 128,
    sample_rate: int = 16_000,
    f_min: float = 125.0,
    f_max: float = 7600.0,
    preemphasis: float = 0.97,
    max_samples: int = 480_000,
    pad_multiple: int = 128,
) -> Tuple[np.ndarray, np.ndarray]:
    """HF Gemma3nAudioFeatureExtractor: HTK-flavor preemphasis, periodic
    hann, overdriven FFT (1024 for the 32 ms frame), un-normed mel
    filterbank, log floor 1e-5. Returns (mel [T, n_mels] f32,
    valid mask [T] bool — True = VALID frame)."""
    wav = np.asarray(waveform, np.float32)[:max_samples]
    att = np.ones(len(wav), np.float32)
    if len(wav) % pad_multiple:
        pad = pad_multiple - len(wav) % pad_multiple
        wav = np.pad(wav, (0, pad))
        att = np.pad(att, (0, pad))

    fft_length = 2 ** math.ceil(math.log2(frame_length)) * 2  # overdrive
    size = frame_length + 1
    n_frames = (len(wav) - size) // hop + 1
    if n_frames <= 0:
        return np.zeros((0, n_mels), np.float32), np.zeros(0, bool)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(size)[None, :]
    frames = wav[idx]
    # HTK preemphasis: first sample scaled, rest first-differenced
    first = frames[:, :1] * (1.0 - preemphasis)
    rest = frames[:, 1:-1] - preemphasis * frames[:, :-2]
    frames = np.concatenate([first, rest], axis=-1)
    hann = 0.5 * (
        1 - np.cos(2 * np.pi * np.arange(frame_length) / frame_length)
    )
    stft = np.fft.rfft(frames * hann.astype(np.float32), n=fft_length)
    mag = np.abs(stft)
    fb = _mel_filters(fft_length // 2 + 1, f_min, f_max, n_mels,
                      sample_rate, fft_length)
    mel = np.log(np.maximum(mag @ fb, 1e-5)).astype(np.float32)
    mask = att[:: hop].astype(bool)[: mel.shape[0]]
    return mel, mask


def _mel_filters(n_freqs, f_min, f_max, n_mels, sample_rate, fft_length):
    """HF create_fb_matrix (norm=None)."""
    all_freqs = np.arange(n_freqs, dtype=np.float32) * (
        sample_rate / fft_length
    )
    m_min = 2595.0 * math.log10(1.0 + f_min / 700.0)
    m_max = 2595.0 * math.log10(1.0 + f_max / 700.0)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = 700.0 * (10 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = (-slopes[:, :-2]) / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return np.maximum(0.0, np.minimum(down, up)).astype(np.float32)


# ------------------------------------------------------------------- encoder
def _cumulative_group_norm(x, w, eps):
    """x [B, T, F, C]: stats over (F, C) cumsum'd over T, scale per C."""
    xf = x.astype(jnp.float32)
    b, t, f, c = xf.shape
    n = f * c
    sums = jnp.sum(xf, axis=(2, 3), keepdims=True)
    counts = jnp.arange(1, t + 1, dtype=jnp.float32).reshape(1, t, 1, 1) * n
    cum_mean = jnp.cumsum(sums, axis=1) / counts
    sq = jnp.sum((xf - cum_mean) ** 2, axis=(2, 3), keepdims=True)
    cum_var = jnp.cumsum(sq, axis=1) / counts
    y = (xf - cum_mean) * jax.lax.rsqrt(cum_var + eps)
    return (y * w.astype(jnp.float32)).astype(x.dtype)


def _sscp(p: Params, cfg: Gemma3nAudioCfg, mel: jax.Array) -> jax.Array:
    """mel [B, T, F] -> [B, T//4, hidden]."""
    x = mel[:, None]  # [B, 1, T, F]
    for i, blk in enumerate((p["conv0"], p["conv1"])):
        kh, _ = cfg.sscp_kernels[i]
        sh, sw = cfg.sscp_strides[i]
        x = jax.lax.conv_general_dilated(
            x.astype(blk["w"].dtype), blk["w"],
            window_strides=(sh, sw),
            padding=((0, kh - 1), (1, 1)),  # reverse-causal T, same-ish F
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        x = _cumulative_group_norm(
            x.transpose(0, 2, 3, 1), blk["norm_w"], cfg.sscp_gn_eps
        ).transpose(0, 3, 1, 2)
        x = jax.nn.relu(x)
    b, c, t, f = x.shape
    flat = x.transpose(0, 2, 3, 1).reshape(b, t, f * c)
    return flat @ p["proj"].T


def _block_context_idx(t_pad: int, chunk: int, left: int, right: int):
    """Gather indices [U, C] into a time axis padded with (left) on the
    front and (right + chunk - 1) on the back."""
    u = t_pad // chunk
    c = chunk + left + right
    return np.arange(u)[:, None] * chunk + np.arange(c)[None, :], u, c


def _attention(p: Params, cfg: Gemma3nAudioCfg, x, valid):
    """Chunked local attention. x [B, T, H]; valid [B, T] True=valid.
    Returns [B, T, H]."""
    b, t, _ = x.shape
    n, hd = cfg.num_heads, cfg.hidden_size // cfg.num_heads
    left = max(0, cfg.context_left - 1)
    right = cfg.context_right
    w = cfg.chunk_size

    q = (x @ p["q"].T).reshape(b, t, n, hd)
    k = (x @ p["k"].T).reshape(b, t, n, hd)
    v = (x @ p["v"].T).reshape(b, t, n, hd)
    q_scale = hd**-0.5 / math.log(2.0)  # r_softplus_0 = 1/softplus(0)
    q = q * (q_scale * jax.nn.softplus(
        p["per_dim_scale"].astype(jnp.float32)
    )).astype(q.dtype)

    t_pad = -(-t // w) * w
    pad_t = t_pad - t

    def pad_time(a, lo, hi, value=0.0):
        cfg_pad = [(0, 0)] * a.ndim
        cfg_pad[1] = (lo, hi)
        return jnp.pad(a, cfg_pad, constant_values=value)

    qb = pad_time(q, 0, pad_t).reshape(b, -1, w, n, hd)  # [B,U,W,N,H]
    idx, u, c = _block_context_idx(t_pad, w, left, right)
    kp = pad_time(k, left, right + w - 1 + pad_t)
    vp = pad_time(v, left, right + w - 1 + pad_t)
    kb = kp[:, idx]  # [B,U,C,N,H]
    vb = vp[:, idx]
    validp = pad_time(valid, left, right + w - 1 + pad_t, value=False)
    valid_b = validp[:, idx]  # [B,U,C]

    # sinusoidal relative positions [L, ..., -R] projected per head
    pos = np.arange(left, -right - 1, -1, dtype=np.float32)
    f_span = pos.shape[0]
    ch = cfg.hidden_size
    num_ts = ch // 2
    inv_ts = np.exp(
        np.arange(num_ts, dtype=np.float32)
        * -(math.log(1.0e4) / max(num_ts - 1, 1))
    )
    scaled = pos[:, None] * inv_ts[None, :]
    timing = np.concatenate([np.sin(scaled), np.cos(scaled)], axis=-1)
    sin_emb = (
        jnp.asarray(timing, x.dtype) @ p["pos_proj"].T
    ).reshape(f_span, n, hd)

    term_ac = jnp.einsum(
        "buwnh,bucnh->bnuwc",
        qb.astype(jnp.float32), kb.astype(jnp.float32),
    )
    term_bd = jnp.einsum(
        "buwnh,fnh->bnuwf",
        qb.astype(jnp.float32), sin_emb.astype(jnp.float32),
    )
    # relative shift: [B,N,U,W,F] -> [B,N,U,W,C]
    term_bd = jnp.pad(
        term_bd, [(0, 0)] * 4 + [(0, (c + 1) - f_span)]
    ).reshape(b, n, u, w * (c + 1))[:, :, :, : w * c].reshape(
        b, n, u, w, c
    )
    logits = term_ac + term_bd
    cap = cfg.logit_cap
    logits = jnp.tanh(logits / cap) * cap

    # local causal window: query w attends keys c with w <= c <= w+L+R
    wi = np.arange(w)[:, None]
    ci = np.arange(c)[None, :]
    local = (wi <= ci) & (ci <= wi + left + right)
    mask = valid_b[:, None, :, None, :] & jnp.asarray(
        local[None, None, None]
    )
    logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum(
        "bnuwc,bucnh->buwnh", probs, vb.astype(jnp.float32)
    ).astype(x.dtype)
    return ctx.reshape(b, u * w, n * hd)[:, :t]


def _ffw(p: Params, cfg: Gemma3nAudioCfg, x):
    g = cfg.gradient_clipping
    y = _rms(_clamp(x, g), p["pre_norm"])
    y = jax.nn.silu(y @ p["w1"].T) @ p["w2"].T
    y = _rms(_clamp(y, g), p["post_norm"])
    return x + y * jnp.asarray(cfg.residual_weight, x.dtype)


def _lconv(p: Params, cfg: Gemma3nAudioCfg, x):
    res = x
    y = _rms(x, p["pre_norm"], cfg.rms_norm_eps)
    y = y @ p["start"].T
    a, bgate = jnp.split(y, 2, axis=-1)
    y = a * jax.nn.sigmoid(bgate)  # GLU
    # causal depthwise conv1d, kernel K
    yt = jnp.pad(y, ((0, 0), (cfg.conv_kernel - 1, 0), (0, 0)))
    yt = jax.lax.conv_general_dilated(
        yt.transpose(0, 2, 1).astype(p["dw"].dtype),
        p["dw"],  # [H, 1, K]
        window_strides=(1,),
        padding="VALID",
        feature_group_count=cfg.hidden_size,
        dimension_numbers=("NCH", "OIH", "NCH"),
    ).transpose(0, 2, 1)
    yt = _clamp(yt, cfg.gradient_clipping)
    yt = jax.nn.silu(_rms(yt, p["conv_norm"], cfg.rms_norm_eps))
    return yt @ p["end"].T + res


def _conformer_block(p: Params, cfg: Gemma3nAudioCfg, x, valid):
    x = _ffw(p["ffw_start"], cfg, x)
    # attention sub-block
    res = x
    g = cfg.gradient_clipping
    y = _rms(_clamp(x, g), p["attn"]["pre_norm"])
    y = _attention(p["attn"], cfg, y, valid)
    y = _clamp(y @ p["attn"]["post"].T, g)
    x = res + _rms(y, p["attn"]["post_norm"])
    # lconv on validity-masked inputs
    x = _lconv(p["lconv"], cfg, x * valid[..., None].astype(x.dtype))
    x = _ffw(p["ffw_end"], cfg, x)
    return _rms(_clamp(x, g), p["norm"])


def encode(
    p: Params, cfg: Gemma3nAudioCfg, mel: jax.Array, valid: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """mel [B, T, F] + valid [B, T] (True = VALID) ->
    (encodings [B, T//16, H], valid mask [B, T//16])."""
    x = _sscp(p["sscp"], cfg, mel)
    t_sub = x.shape[1]
    stride = int(np.prod([s[0] for s in cfg.sscp_strides]))
    idx = np.minimum(np.arange(t_sub) * stride, mel.shape[1] - 1)
    cur_valid = valid[:, idx]
    for blk in p["blocks"]:
        x = _conformer_block(blk, cfg, x, cur_valid)
    if cfg.reduction_factor > 1:
        x = x[:, :: cfg.reduction_factor]
        cur_valid = cur_valid[:, :: cfg.reduction_factor]
    x = x * cur_valid[..., None].astype(x.dtype)
    return x, cur_valid


# ------------------------------------------------------------------ embedder
def embed_soft(p: Params, x: jax.Array, eps: float) -> jax.Array:
    """Gemma3nMultimodalEmbedder soft path: norm -> proj -> scaleless
    post norm."""
    y = _rms(x, p["soft_norm"], eps) @ p["proj"].T
    yf = y.astype(jnp.float32)
    return (
        yf * jax.lax.rsqrt(jnp.mean(yf * yf, -1, keepdims=True) + eps)
    ).astype(y.dtype)


def embed_hard(p: Params, ids: jax.Array, offset: int, eps: float):
    """Hard path for special/media token ids (>= vocab_offset)."""
    rows = p["embedding"][ids - offset]
    y = _rms(rows, p["hard_norm"], eps) @ p["proj"].T
    yf = y.astype(jnp.float32)
    return (
        yf * jax.lax.rsqrt(jnp.mean(yf * yf, -1, keepdims=True) + eps)
    ).astype(y.dtype)


# -------------------------------------------------------------------- loader
def load_audio_params(
    tensors: Dict[str, np.ndarray], cfg: Gemma3nAudioCfg, dtype
) -> Params:
    """Map ``audio_tower.``-relative HF tensors into the param tree."""
    def put(name):
        return jnp.asarray(np.asarray(tensors[name])).astype(dtype)

    sscp = {
        "conv0": {
            "w": put("subsample_conv_projection.conv_0.conv.weight"),
            "norm_w": put("subsample_conv_projection.conv_0.norm.weight"),
        },
        "conv1": {
            "w": put("subsample_conv_projection.conv_1.conv.weight"),
            "norm_w": put("subsample_conv_projection.conv_1.norm.weight"),
        },
        "proj": put("subsample_conv_projection.input_proj_linear.weight"),
    }
    blocks = []
    for i in range(cfg.num_layers):
        b = f"conformer.{i}."

        def ffw(sub):
            return {
                "pre_norm": put(b + sub + ".pre_layer_norm.weight"),
                "w1": put(b + sub + ".ffw_layer_1.weight"),
                "w2": put(b + sub + ".ffw_layer_2.weight"),
                "post_norm": put(b + sub + ".post_layer_norm.weight"),
            }

        blocks.append({
            "ffw_start": ffw("ffw_layer_start"),
            "attn": {
                "pre_norm": put(b + "attention.pre_attn_norm.weight"),
                "q": put(b + "attention.attn.q_proj.weight"),
                "k": put(b + "attention.attn.k_proj.weight"),
                "v": put(b + "attention.attn.v_proj.weight"),
                "per_dim_scale": put(b + "attention.attn.per_dim_scale"),
                "pos_proj": put(
                    b + "attention.attn.relative_position_embedding"
                    ".pos_proj.weight"
                ),
                "post": put(b + "attention.post.weight"),
                "post_norm": put(b + "attention.post_norm.weight"),
            },
            "lconv": {
                "pre_norm": put(b + "lconv1d.pre_layer_norm.weight"),
                "start": put(b + "lconv1d.linear_start.weight"),
                "dw": put(b + "lconv1d.depthwise_conv1d.weight"),
                "conv_norm": put(b + "lconv1d.conv_norm.weight"),
                "end": put(b + "lconv1d.linear_end.weight"),
            },
            "ffw_end": ffw("ffw_layer_end"),
            "norm": put(b + "norm.weight"),
        })
    return {"sscp": sscp, "blocks": blocks}


def load_embedder_params(
    tensors: Dict[str, np.ndarray], dtype
) -> Params:
    """Map ``embed_audio.`` / ``embed_vision.``-relative tensors."""
    def put(name):
        return jnp.asarray(np.asarray(tensors[name])).astype(dtype)

    return {
        "embedding": put("embedding.weight"),
        "hard_norm": put("hard_embedding_norm.weight"),
        "soft_norm": put("soft_embedding_norm.weight"),
        "proj": put("embedding_projection.weight"),
    }

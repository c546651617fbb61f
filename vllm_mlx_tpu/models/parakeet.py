# SPDX-License-Identifier: Apache-2.0
"""Parakeet STT: FastConformer encoder with CTC or TDT decoding.

The reference benchmarks ``parakeet-tdt-0.6b-v2`` at RTF 52.7x
(reference docs/benchmarks/audio.md:36) through mlx-audio. TPU-native
rebuild:

  * **encoder** — FastConformer (HF ``ParakeetEncoder``,
    transformers models/parakeet/modeling_parakeet.py): 8x Conv2D
    subsampling (conv+relu, then depthwise/pointwise pairs), conformer
    blocks (half-step macaron FFNs, rel-pos multi-head attention with
    Transformer-XL bias_u/bias_v and rel-shift, GLU depthwise-conv
    module with BatchNorm) — HF logits parity tested.
  * **CTC head** — pointwise conv == linear to vocab+blank
    (HF ``ParakeetForCTC``), greedy collapse decode.
  * **TDT head** — Token-and-Duration Transducer (NeMo
    parakeet-tdt; arXiv 2304.06795): LSTM prediction network + joint
    whose output splits into token logits (vocab+blank) and duration
    logits over a fixed duration set. Greedy decode emits a token and
    SKIPS duration frames per step — the ~T/8 encoder frames are
    visited sparsely, which is where TDT's speed over plain RNN-T
    comes from. transformers 4.57 has no TDT oracle (``parakeet_ctc``
    only), so the TDT head is mechanism-tested against hand-crafted
    joints and documented; the encoder under it is the HF-parity one.

Feature extraction mirrors HF ``ParakeetFeatureExtractor`` (librosa is
absent in this environment, so the slaney mel filterbank comes from the
standard formula — pinned against transformers.audio_utils
``mel_filter_bank(norm="slaney", mel_scale="slaney")``): preemphasis
0.97, centered STFT (hann win 400 / n_fft 512 / hop 160), log(mel +
2^-24), per-feature masked mean/std normalization.

TDT checkpoint contract (no public HF format exists): config.json with
``model_type: "parakeet_tdt"``, ``encoder_config`` (HF
parakeet_encoder fields), ``vocab_size`` (without blank), ``durations``
(e.g. [0, 1, 2, 3, 4]), ``pred_hidden``, ``pred_rnn_layers``,
``joint_hidden``; safetensors names ``encoder.*`` (HF encoder names),
``decoder.embed.weight``, ``decoder.lstm.{i}.weight_ih/weight_hh/
bias_ih/bias_hh``, ``joint.enc/pred/out.weight/bias``.
"""

from __future__ import annotations

import json
import logging
import math
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

Params = Dict[str, Any]

LOG_ZERO_GUARD = 2.0**-24
EPSILON = 1e-5


@dataclass
class ParakeetEncoderCfg:
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 8
    num_key_value_heads: int = 8
    intermediate_size: int = 4096
    conv_kernel_size: int = 9
    subsampling_conv_kernel_size: int = 3
    subsampling_conv_stride: int = 2
    subsampling_factor: int = 8
    subsampling_conv_channels: int = 256
    num_mel_bins: int = 80
    scale_input: bool = True
    attention_bias: bool = True
    max_position_embeddings: int = 5000
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_hf_config(cls, cfg: Dict[str, Any]) -> "ParakeetEncoderCfg":
        kw = {
            f: cfg[f]
            for f in (
                "hidden_size", "num_hidden_layers", "num_attention_heads",
                "num_key_value_heads", "intermediate_size",
                "conv_kernel_size", "subsampling_conv_kernel_size",
                "subsampling_conv_stride", "subsampling_factor",
                "subsampling_conv_channels", "num_mel_bins", "scale_input",
                "attention_bias", "max_position_embeddings",
            )
            if f in cfg
        }
        return cls(**kw)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


# ------------------------------------------------------------- mel frontend
def hz_to_mel_slaney(f):
    f = np.asarray(f, np.float64)
    mel = f / (200.0 / 3.0)
    log_region = f >= 1000.0
    logstep = math.log(6.4) / 27.0
    mel = np.where(
        log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / logstep,
        mel,
    )
    return mel


def mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    f = m * (200.0 / 3.0)
    logstep = math.log(6.4) / 27.0
    return np.where(m >= 15.0, 1000.0 * np.exp(logstep * (m - 15.0)), f)


def mel_filters_slaney(
    sr: int = 16000, n_fft: int = 512, n_mels: int = 80
) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular mel filterbank
    (librosa.filters.mel defaults — librosa is not installed here;
    pinned against transformers.audio_utils.mel_filter_bank in tests).
    Returns [n_mels, n_fft // 2 + 1] float32."""
    fmax = sr / 2.0
    mels = np.linspace(hz_to_mel_slaney(0.0), hz_to_mel_slaney(fmax),
                       n_mels + 2)
    freqs = mel_to_hz_slaney(mels)  # [n_mels + 2]
    fft_freqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    fdiff = np.diff(freqs)
    ramps = freqs[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (freqs[2 : n_mels + 2] - freqs[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


def extract_features(
    audio: np.ndarray,  # [T] or [B, T] float32 (mono, 16 kHz)
    lengths: Optional[np.ndarray] = None,  # [B] valid samples
    n_mels: int = 80,
    n_fft: int = 512,
    win_length: int = 400,
    hop: int = 160,
    preemphasis: float = 0.97,
) -> Tuple[np.ndarray, np.ndarray]:
    """HF ParakeetFeatureExtractor pipeline -> (features [B, F, n_mels]
    f32, mask [B, F] bool)."""
    x = np.asarray(audio, np.float32)
    if x.ndim == 1:
        x = x[None]
    b, t = x.shape
    if lengths is None:
        lengths = np.full(b, t, np.int64)
    timemask = np.arange(t)[None, :] < lengths[:, None]
    x = x * timemask
    if preemphasis:
        x = np.concatenate([x[:, :1], x[:, 1:] - preemphasis * x[:, :-1]],
                           axis=1)
        x = x * timemask
    # centered STFT, constant padding; hann window (periodic=False)
    # centered inside the n_fft frame (torch.stft semantics)
    pad = n_fft // 2
    xp = np.pad(x, ((0, 0), (pad, pad)))
    n_frames = 1 + t // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = xp[:, idx]  # [B, F, n_fft]
    win = np.hanning(win_length).astype(np.float32)  # periodic=False
    wpad = (n_fft - win_length) // 2
    win_full = np.pad(win, (wpad, n_fft - win_length - wpad))
    spec = np.fft.rfft(frames * win_full, axis=-1)
    mag2 = (spec.real**2 + spec.imag**2).astype(np.float32)
    filters = mel_filters_slaney(16000, n_fft, n_mels)
    mel = mag2 @ filters.T  # [B, F, n_mels]
    mel = np.log(mel + LOG_ZERO_GUARD)
    feat_lens = (lengths + 2 * pad - n_fft) // hop
    mask = np.arange(n_frames)[None, :] < feat_lens[:, None]
    m = mask[..., None]
    mel_m = mel * m
    mean = mel_m.sum(1) / feat_lens[:, None]
    var = (((mel_m - mean[:, None]) ** 2) * m).sum(1) / (
        feat_lens[:, None] - 1
    )
    mel = (mel - mean[:, None]) / (np.sqrt(var)[:, None] + EPSILON)
    return (mel * m).astype(np.float32), mask


# ------------------------------------------------------------------ encoder
def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (
        (xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
        + b.astype(jnp.float32)
    ).astype(x.dtype)


def _ff(p, x):
    y = jax.nn.silu((x @ p["fc1_w"].T + p["fc1_b"]).astype(jnp.float32))
    return (y.astype(x.dtype) @ p["fc2_w"].T) + p["fc2_b"]


def _rel_pos_embed(cfg: ParakeetEncoderCfg, length: int) -> jnp.ndarray:
    """[2L-1, D] sin/cos-interleaved rel-pos table for positions
    L-1 .. -L+1 (HF ParakeetEncoderRelPositionalEncoding)."""
    d = cfg.hidden_size
    inv_freq = 1.0 / (
        10000.0 ** (np.arange(0, d, 2, dtype=np.float64) / d)
    )
    pos = np.arange(length - 1, -length, -1, dtype=np.float64)
    freqs = pos[:, None] * inv_freq[None, :]  # [2L-1, D/2]
    emb = np.stack([np.sin(freqs), np.cos(freqs)], axis=-1).reshape(
        2 * length - 1, d
    )
    return jnp.asarray(emb.astype(np.float32))


def _rel_shift(scores: jnp.ndarray) -> jnp.ndarray:
    """[B, H, L, P] Transformer-XL relative shift."""
    b, h, q, p = scores.shape
    s = jnp.pad(scores, ((0, 0), (0, 0), (0, 0), (1, 0)))
    s = s.reshape(b, h, p + 1, q)[:, :, 1:]
    return s.reshape(b, h, q, p)


def _subsample(cfg: ParakeetEncoderCfg, p: Params, feats, lengths):
    """[B, F, mel] -> [B, F', hidden] via the Conv2D stack; returns
    (hidden, out_lengths)."""
    x = feats[:, None]  # [B, 1, F, mel] (NCHW)
    stride = cfg.subsampling_conv_stride
    k = cfg.subsampling_conv_kernel_size
    pad = (k - 1) // 2
    cur = lengths

    def conv2d(x, w, b_, stride_, groups=1, pad_=None):
        p_ = pad if pad_ is None else pad_
        out = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w.astype(jnp.float32),
            window_strides=(stride_, stride_),
            padding=((p_, p_), (p_, p_)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=groups,
        )
        return out + b_.astype(jnp.float32)[None, :, None, None]

    def mask_time(x, cur):
        ch_mask = jnp.arange(x.shape[2])[None, :] < cur[:, None]
        return x * ch_mask[:, None, :, None]

    x = conv2d(x, p["conv0_w"], p["conv0_b"], stride)
    cur = (cur + 2 * pad - k) // stride + 1
    x = mask_time(jax.nn.relu(x), cur)
    n_extra = int(math.log2(cfg.subsampling_factor)) - 1
    for i in range(n_extra):
        x = conv2d(
            x, p[f"dw{i}_w"], p[f"dw{i}_b"], stride,
            groups=cfg.subsampling_conv_channels,
        )
        cur = (cur + 2 * pad - k) // stride + 1
        x = mask_time(x, cur)
        x = conv2d(x, p[f"pw{i}_w"], p[f"pw{i}_b"], 1, pad_=0)
        x = mask_time(jax.nn.relu(x), cur)
    b, c, f, m = x.shape
    x = x.transpose(0, 2, 1, 3).reshape(b, f, c * m)
    x = x @ p["proj_w"].T.astype(jnp.float32) + p["proj_b"]
    return x, cur


def _conv_module(cfg: ParakeetEncoderCfg, p: Params, x, frame_mask):
    """Conformer conv module (GLU -> depthwise -> BatchNorm(eval) ->
    silu -> pointwise); x [B, L, D], frame_mask [B, L] bool."""
    xf = x.astype(jnp.float32)
    y = xf @ p["pw1_w"].squeeze(-1).T + p["pw1_b"]  # [B, L, 2D]
    d = x.shape[-1]
    y = y[..., :d] * jax.nn.sigmoid(y[..., d:])  # GLU over channel dim
    y = y * frame_mask[..., None]
    # depthwise conv over time: [B, L, D] -> NCH conv1d
    w = p["dw_w"].astype(jnp.float32)  # [D, 1, K]
    k = w.shape[-1]
    y = jax.lax.conv_general_dilated(
        y.transpose(0, 2, 1), w,
        window_strides=(1,), padding=((k // 2, k // 2),),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=d,
    ) + p["dw_b"].astype(jnp.float32)[None, :, None]
    # BatchNorm1d eval: running stats
    mean = p["bn_mean"].astype(jnp.float32)[None, :, None]
    var = p["bn_var"].astype(jnp.float32)[None, :, None]
    y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * p["bn_w"].astype(jnp.float32)[None, :, None] + p[
        "bn_b"
    ].astype(jnp.float32)[None, :, None]
    y = jax.nn.silu(y)
    y = y.transpose(0, 2, 1) @ p["pw2_w"].squeeze(-1).T + p["pw2_b"]
    return y.astype(x.dtype)


def _rel_attention(cfg: ParakeetEncoderCfg, p: Params, x, pos_embed, mask):
    b, l, d = x.shape
    h = cfg.num_attention_heads
    hd = cfg.head_dim
    scale = hd**-0.5
    q = (x @ p["q_w"].T + p.get("q_b", 0)).reshape(b, l, h, hd)
    k = (x @ p["k_w"].T + p.get("k_b", 0)).reshape(b, l, h, hd)
    v = (x @ p["v_w"].T + p.get("v_b", 0)).reshape(b, l, h, hd)
    rel_k = (pos_embed @ p["rel_k_w"].T).reshape(1, -1, h, hd)
    q_u = q + p["bias_u"][None, None]
    q_v = q + p["bias_v"][None, None]
    bd = jnp.einsum(
        "blhd,bphd->bhlp", q_v, jnp.broadcast_to(rel_k, (b,) + rel_k.shape[1:]),
        preferred_element_type=jnp.float32,
    )
    bd = _rel_shift(bd)[..., :l] * scale
    ac = jnp.einsum(
        "blhd,bmhd->bhlm", q_u, k, preferred_element_type=jnp.float32
    ) * scale
    scores = ac + bd
    if mask is not None:
        scores = jnp.where(mask[:, None, :, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(jnp.isfinite(probs), probs, 0.0)
    ctx = jnp.einsum(
        "bhlm,bmhd->blhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).reshape(b, l, d).astype(x.dtype)
    return ctx @ p["o_w"].T + p.get("o_b", 0)


def encode(
    params: Params,
    cfg: ParakeetEncoderCfg,
    features: jnp.ndarray,  # [B, F, mel]
    lengths: jnp.ndarray,  # [B] valid frames
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (hidden [B, F', D], out_lengths [B])."""
    x, cur = _subsample(cfg, params["subsampling"], features, lengths)
    if cfg.scale_input:
        x = x * math.sqrt(cfg.hidden_size)
    l = x.shape[1]
    pos = _rel_pos_embed(cfg, l)
    frame_mask = jnp.arange(l)[None, :] < cur[:, None]  # [B, L]
    pair = frame_mask[:, :, None] & frame_mask[:, None, :]  # [B, L, L]
    x = x.astype(jnp.float32)
    for lp in params["layers"]:
        x = x + 0.5 * _ff(lp["ff1"], _ln(x, lp["ln_ff1_w"], lp["ln_ff1_b"]))
        x = x + _rel_attention(
            cfg, lp["attn"], _ln(x, lp["ln_att_w"], lp["ln_att_b"]),
            pos, pair,
        )
        x = x + _conv_module(
            cfg, lp["conv"], _ln(x, lp["ln_conv_w"], lp["ln_conv_b"]),
            frame_mask,
        )
        x = x + 0.5 * _ff(lp["ff2"], _ln(x, lp["ln_ff2_w"], lp["ln_ff2_b"]))
        x = _ln(x, lp["ln_out_w"], lp["ln_out_b"])
    return x, cur


# ------------------------------------------------------------------- heads
def ctc_logits(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """Pointwise-conv CTC head (HF ParakeetForCTC.ctc_head)."""
    w = params["ctc_w"]  # [V, D, 1]
    return hidden @ w.squeeze(-1).T + params["ctc_b"]


def ctc_greedy(ids: np.ndarray, blank: int) -> List[int]:
    out: List[int] = []
    prev = -1
    for t in ids:
        t = int(t)
        if t != prev and t != blank:
            out.append(t)
        prev = t
    return out


def _lstm_step(p: Params, x, h, c):
    """One torch-layout LSTM cell step (gates i, f, g, o)."""
    gates = (
        x @ p["weight_ih"].T + p["bias_ih"]
        + h @ p["weight_hh"].T + p["bias_hh"]
    ).astype(jnp.float32)
    hid = h.shape[-1]
    i = jax.nn.sigmoid(gates[..., :hid])
    f = jax.nn.sigmoid(gates[..., hid : 2 * hid])
    g = jnp.tanh(gates[..., 2 * hid : 3 * hid])
    o = jax.nn.sigmoid(gates[..., 3 * hid :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def predictor_step(params: Params, token, h, c):
    """TDT prediction network: embed(token) through the LSTM stack.
    token == -1 (start-of-sequence / blank) embeds to zeros (NeMo
    prediction-network SOS convention)."""
    emb = jnp.where(
        token < 0,
        jnp.zeros((params["embed"].shape[1],), params["embed"].dtype),
        params["embed"][jnp.maximum(token, 0)],
    )
    x = emb
    hs, cs = [], []
    for i, lp in enumerate(params["lstm"]):
        h_i, c_i = _lstm_step(lp, x, h[i], c[i])
        hs.append(h_i)
        cs.append(c_i)
        x = h_i
    return x, jnp.stack(hs), jnp.stack(cs)


def joint_logits(params: Params, enc_t, pred_out):
    """TDT joint: relu(enc_proj + pred_proj) -> out; output splits into
    [vocab + blank | num_durations]."""
    y = jax.nn.relu(
        (enc_t @ params["enc_w"].T + params["enc_b"])
        + (pred_out @ params["pred_w"].T + params["pred_b"])
    )
    return y @ params["out_w"].T + params["out_b"]


def tdt_greedy_decode(
    params: Params,
    enc: jnp.ndarray,  # [L, D] one sequence's encoder output
    length: int,
    vocab_size: int,  # WITHOUT blank
    durations: Tuple[int, ...],
    pred_hidden: int,
    pred_layers: int,
    max_tokens: int = 512,
    max_symbols_per_frame: int = 10,
) -> np.ndarray:
    """Greedy TDT decode (NeMo tdt greedy semantics): at frame t, the
    joint scores token (vocab+blank) and duration; non-blank tokens are
    emitted and advance the predictor; t advances by the predicted
    duration (a 0-duration prediction may emit several tokens at one
    frame, bounded by ``max_symbols_per_frame`` before a forced +1).
    Returns emitted token ids (<= max_tokens)."""
    blank = vocab_size
    ndur = len(durations)
    dur_arr = jnp.asarray(durations, jnp.int32)

    def cond(state):
        t, n_out, sym_count, *_ = state
        return (t < length) & (n_out < max_tokens)

    def body(state):
        t, n_out, sym_count, h, c, pred_out, out_buf = state
        logits = joint_logits(params, enc[t], pred_out)
        tok = jnp.argmax(logits[: vocab_size + 1]).astype(jnp.int32)
        dur_idx = jnp.argmax(logits[vocab_size + 1 : vocab_size + 1 + ndur])
        d = dur_arr[dur_idx]
        is_tok = tok != blank
        new_pred_out, new_h, new_c = predictor_step(
            params["decoder"], tok, h, c
        )
        pred_out = jnp.where(is_tok, new_pred_out, pred_out)
        h = jnp.where(is_tok, new_h, h)
        c = jnp.where(is_tok, new_c, c)
        out_buf = out_buf.at[n_out].set(jnp.where(is_tok, tok, -1))
        n_out = n_out + is_tok.astype(jnp.int32)
        sym_count = jnp.where(d > 0, 0, sym_count + 1)
        # 0-duration guard: blank never loops in place; too many
        # symbols at one frame force an advance (NeMo max_symbols)
        force = (d == 0) & (
            (~is_tok) | (sym_count >= max_symbols_per_frame)
        )
        t = t + jnp.where(force, 1, d)
        sym_count = jnp.where(force, 0, sym_count)
        return t, n_out, sym_count, h, c, pred_out, out_buf

    h0 = jnp.zeros((pred_layers, pred_hidden), jnp.float32)
    c0 = jnp.zeros((pred_layers, pred_hidden), jnp.float32)
    pred0, h0, c0 = predictor_step(
        params["decoder"], jnp.int32(-1), h0, c0
    )
    out0 = jnp.full((max_tokens,), -1, jnp.int32)
    state = (
        jnp.int32(0), jnp.int32(0), jnp.int32(0), h0, c0, pred0, out0
    )
    _, n_out, _, _, _, _, out_buf = jax.lax.while_loop(cond, body, state)
    toks = np.asarray(out_buf)
    n = int(np.asarray(n_out))
    return toks[:n]


# ------------------------------------------------------------------ loader
def _load_encoder_params(tensors: Dict[str, np.ndarray], cfg, dtype):
    def put(t):
        return jnp.asarray(np.asarray(t)).astype(dtype)

    sub: Params = {}
    layers: List[Params] = [
        {
            "ff1": {}, "ff2": {}, "attn": {}, "conv": {},
        }
        for _ in range(cfg.num_hidden_layers)
    ]
    n_extra = int(math.log2(cfg.subsampling_factor)) - 1
    for name, t in tensors.items():
        if name.startswith("subsampling."):
            n = name[len("subsampling."):]
            if n.startswith("layers."):
                idx = int(n.split(".")[1])
                kind = "w" if n.endswith("weight") else "b"
                # layer order: conv0, relu, [dw, pw, relu] * n_extra
                if idx == 0:
                    sub[f"conv0_{kind}"] = put(t)
                else:
                    grp = (idx - 2) // 3
                    off = (idx - 2) % 3
                    sub[("dw" if off == 0 else "pw") + f"{grp}_{kind}"] = (
                        put(t)
                    )
            elif n.startswith("linear."):
                sub["proj_w" if n.endswith("weight") else "proj_b"] = put(t)
            continue
        if not name.startswith("layers."):
            continue
        parts = name.split(".")
        lp = layers[int(parts[1])]
        rest = ".".join(parts[2:])
        m = {
            "feed_forward1.linear1.weight": ("ff1", "fc1_w"),
            "feed_forward1.linear1.bias": ("ff1", "fc1_b"),
            "feed_forward1.linear2.weight": ("ff1", "fc2_w"),
            "feed_forward1.linear2.bias": ("ff1", "fc2_b"),
            "feed_forward2.linear1.weight": ("ff2", "fc1_w"),
            "feed_forward2.linear1.bias": ("ff2", "fc1_b"),
            "feed_forward2.linear2.weight": ("ff2", "fc2_w"),
            "feed_forward2.linear2.bias": ("ff2", "fc2_b"),
            "self_attn.q_proj.weight": ("attn", "q_w"),
            "self_attn.q_proj.bias": ("attn", "q_b"),
            "self_attn.k_proj.weight": ("attn", "k_w"),
            "self_attn.k_proj.bias": ("attn", "k_b"),
            "self_attn.v_proj.weight": ("attn", "v_w"),
            "self_attn.v_proj.bias": ("attn", "v_b"),
            "self_attn.o_proj.weight": ("attn", "o_w"),
            "self_attn.o_proj.bias": ("attn", "o_b"),
            "self_attn.relative_k_proj.weight": ("attn", "rel_k_w"),
            "self_attn.bias_u": ("attn", "bias_u"),
            "self_attn.bias_v": ("attn", "bias_v"),
            "conv.pointwise_conv1.weight": ("conv", "pw1_w"),
            "conv.pointwise_conv1.bias": ("conv", "pw1_b"),
            "conv.depthwise_conv.weight": ("conv", "dw_w"),
            "conv.depthwise_conv.bias": ("conv", "dw_b"),
            "conv.norm.weight": ("conv", "bn_w"),
            "conv.norm.bias": ("conv", "bn_b"),
            "conv.norm.running_mean": ("conv", "bn_mean"),
            "conv.norm.running_var": ("conv", "bn_var"),
            "conv.pointwise_conv2.weight": ("conv", "pw2_w"),
            "conv.pointwise_conv2.bias": ("conv", "pw2_b"),
            "norm_feed_forward1.weight": (None, "ln_ff1_w"),
            "norm_feed_forward1.bias": (None, "ln_ff1_b"),
            "norm_self_att.weight": (None, "ln_att_w"),
            "norm_self_att.bias": (None, "ln_att_b"),
            "norm_conv.weight": (None, "ln_conv_w"),
            "norm_conv.bias": (None, "ln_conv_b"),
            "norm_feed_forward2.weight": (None, "ln_ff2_w"),
            "norm_feed_forward2.bias": (None, "ln_ff2_b"),
            "norm_out.weight": (None, "ln_out_w"),
            "norm_out.bias": (None, "ln_out_b"),
        }.get(rest)
        if m is None:
            continue
        grp, key = m
        if grp is None:
            lp[key] = put(t)
        else:
            lp[grp][key] = put(t)
    return {"subsampling": sub, "layers": layers}


class ParakeetSTT:
    """STT backend for parakeet_ctc / parakeet_tdt checkpoints (the
    reference benchmarks parakeet through mlx-audio; here the encoder
    is HF-parity JAX and decoding is CTC-greedy or TDT-greedy)."""

    def __init__(self, model_path: str, dtype=jnp.float32) -> None:
        self.model_path = model_path
        self.dtype = dtype
        self._loaded = False

    def load(self) -> "ParakeetSTT":
        if self._loaded:
            return self
        from . import loader as ld

        with open(os.path.join(self.model_path, "config.json")) as f:
            raw = json.load(f)
        self.kind = raw.get("model_type", "parakeet_ctc")
        enc_cfg = raw.get("encoder_config", raw)
        self.cfg = ParakeetEncoderCfg.from_hf_config(enc_cfg)
        self.vocab_size = raw.get("vocab_size", 1025)
        self.durations = tuple(raw.get("durations", (0, 1, 2, 3, 4)))
        self.pred_hidden = raw.get("pred_hidden", 640)
        self.pred_layers = raw.get("pred_rnn_layers", 1)
        enc_tensors: Dict[str, np.ndarray] = {}
        head: Params = {"decoder": {"lstm": [
            {} for _ in range(self.pred_layers)
        ]}}
        for name, t in ld.iter_safetensors(self.model_path):
            if name.startswith("encoder."):
                enc_tensors[name[len("encoder."):]] = t
            elif name.startswith("ctc_head."):
                head["ctc_w" if name.endswith("weight") else "ctc_b"] = (
                    jnp.asarray(np.asarray(t)).astype(self.dtype)
                )
            elif name.startswith("decoder.embed."):
                head["decoder"]["embed"] = jnp.asarray(
                    np.asarray(t)
                ).astype(self.dtype)
            elif name.startswith("decoder.lstm."):
                parts = name.split(".")
                head["decoder"]["lstm"][int(parts[2])][parts[3]] = (
                    jnp.asarray(np.asarray(t)).astype(self.dtype)
                )
            elif name.startswith("joint."):
                parts = name.split(".")
                head[f"{parts[1]}_{'w' if parts[2] == 'weight' else 'b'}"] = (
                    jnp.asarray(np.asarray(t)).astype(self.dtype)
                )
        self.enc_params = _load_encoder_params(
            enc_tensors, self.cfg, self.dtype
        )
        self.head = head
        # tokenizer (SentencePiece-style vocab file or HF tokenizer)
        self.tokenizer = None
        try:
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(
                self.model_path, local_files_only=True
            )
        except (OSError, TypeError, ValueError, KeyError):
            logger.warning(
                "no tokenizer at %s; decoding to raw ids", self.model_path
            )
        self._encode_jit = jax.jit(
            lambda p, f, l: encode(p, self.cfg, f, l)
        )
        if self.kind == "parakeet_ctc":
            self._ctc_jit = jax.jit(
                lambda hp, h: jnp.argmax(ctc_logits(hp, h), axis=-1)
            )
        self._loaded = True
        return self

    def transcribe(
        self, audio, *, language=None, max_new_tokens: int = 512
    ) -> Dict[str, Any]:
        import time as _time

        if not self._loaded:
            self.load()
        t0 = _time.time()
        if isinstance(audio, str):
            from ..audio.mel import load_wav

            audio = load_wav(audio)
        audio = np.asarray(audio, np.float32)
        duration = len(audio) / 16000.0
        feats, mask = extract_features(
            audio, n_mels=self.cfg.num_mel_bins
        )
        lengths = mask.sum(-1).astype(np.int32)
        hidden, out_len = self._encode_jit(
            self.enc_params, jnp.asarray(feats), jnp.asarray(lengths)
        )
        n_valid = int(np.asarray(out_len)[0])
        if self.kind == "parakeet_ctc":
            ids = np.asarray(self._ctc_jit(self.head, hidden))[0][:n_valid]
            toks = ctc_greedy(ids, blank=self.vocab_size - 1)
        else:
            toks = tdt_greedy_decode(
                self.head,
                hidden[0].astype(jnp.float32),
                n_valid,
                self.vocab_size,
                self.durations,
                self.pred_hidden,
                self.pred_layers,
                max_tokens=max_new_tokens,
            ).tolist()
        if self.tokenizer is not None:
            text = self.tokenizer.decode(toks, skip_special_tokens=True)
        else:
            text = " ".join(str(t) for t in toks)
        return {
            "text": text,
            "tokens": list(map(int, toks)),
            "duration": duration,
            "wall": _time.time() - t0,
        }

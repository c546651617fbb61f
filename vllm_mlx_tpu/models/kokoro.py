# SPDX-License-Identifier: Apache-2.0
"""Kokoro-class TTS (StyleTTS2-lite + iSTFTNet vocoder) in JAX.

The reference's flagship TTS family (reference audio/tts.py:82-98 serves
``mlx-community/Kokoro-82M-*`` through mlx-audio; BASELINE RTF 22x).
This is a from-scratch JAX implementation of the published Kokoro-82M
architecture (StyleTTS2 prosody pipeline + iSTFTNet decoder):

    phonemes ──► PL-BERT (ALBERT) ──► bert_encoder ─┐
                                                    ├► DurationEncoder
    voice pack ref_s [256] = [decoder 128 | prosody 128]    │
                                                    duration_proj ► durations
    phonemes ──► TextEncoder (conv+BiLSTM) ──► asr @ alignment
    prosody:  shared BiLSTM ► F0 / N AdaIN residual stacks ► F0, N curves
    decoder:  AdainResBlk1d stack + harmonic-source iSTFTNet generator
              (magnitude/phase head + inverse STFT) ──► 24 kHz waveform

TPU-native synthesis shape policy: token and frame axes are padded to
BUCKETS so each (token_bucket, frame_bucket) pair compiles ONCE (compiles
cost minutes through this platform's remote compile service — per-length
shapes would recompile every request). Validity is threaded everywhere
the math is global over the padded axis: attention key masks, LSTM
carry resets at invalid steps (so the backward direction starts from
the true sequence end), masked AdaIN instance statistics, and
re-masking after every conv (the VITS padded-bucket lesson,
NOTES_TPU_ENV.md: bias-colored pad garbage otherwise leaks through
receptive fields).

Weight naming follows the released PyTorch state dict (bert.*,
bert_encoder.*, predictor.*, text_encoder.*, decoder.*) with
weight-norm pairs (weight_g/weight_v) fused at load. Voice packs are
[510, 1, 256] per-length style tables; style = pack[len(tokens)-1].

Grapheme→phoneme: Kokoro upstream uses espeak-ng/misaki (absent in this
image). The engine accepts raw phoneme strings directly (audio/tts.py
maps characters through the checkpoint vocab) — wire a real G2P in
front for production English.

Single-utterance (B=1) synthesis; convs are lax.conv over [1, C, L].
"""

from __future__ import annotations

import glob
import json
import math
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

TOKEN_BUCKET = 64
FRAME_BUCKET = 256


# --------------------------------------------------------------- config
@dataclass
class KokoroConfig:
    n_token: int = 178
    hidden_dim: int = 512
    style_dim: int = 128
    max_dur: int = 50
    n_layer: int = 3  # DurationEncoder depth
    text_encoder_kernel_size: int = 5
    sample_rate: int = 24000
    # PL-BERT (ALBERT)
    plbert_hidden: int = 768
    plbert_heads: int = 12
    plbert_layers: int = 12
    # iSTFTNet decoder
    upsample_rates: List[int] = field(default_factory=lambda: [10, 6])
    upsample_kernel_sizes: List[int] = field(default_factory=lambda: [20, 12])
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: List[int] = field(default_factory=lambda: [3, 7, 11])
    resblock_dilation_sizes: List[List[int]] = field(
        default_factory=lambda: [[1, 3, 5], [1, 3, 5], [1, 3, 5]]
    )
    gen_istft_n_fft: int = 20
    gen_istft_hop_size: int = 5
    vocab: Optional[Dict[str, int]] = None

    @property
    def samples_per_frame(self) -> int:
        # decode upsample (2x) * generator rates * istft hop
        return (
            2 * int(np.prod(self.upsample_rates)) * self.gen_istft_hop_size
        )

    @classmethod
    def from_json(cls, cfg: Dict[str, Any]) -> "KokoroConfig":
        pl = cfg.get("plbert", {})
        ist = cfg.get("istftnet", cfg.get("decoder", {}))
        return cls(
            n_token=cfg.get("n_token", 178),
            hidden_dim=cfg.get("hidden_dim", 512),
            style_dim=cfg.get("style_dim", 128),
            max_dur=cfg.get("max_dur", 50),
            n_layer=cfg.get("n_layer", 3),
            text_encoder_kernel_size=cfg.get("text_encoder_kernel_size", 5),
            sample_rate=cfg.get("sample_rate", 24000),
            plbert_hidden=pl.get("hidden_size", 768),
            plbert_heads=pl.get("num_attention_heads", 12),
            plbert_layers=pl.get("num_hidden_layers", 12),
            upsample_rates=list(ist.get("upsample_rates", [10, 6])),
            upsample_kernel_sizes=list(
                ist.get("upsample_kernel_sizes", [20, 12])
            ),
            upsample_initial_channel=ist.get("upsample_initial_channel", 512),
            resblock_kernel_sizes=list(
                ist.get("resblock_kernel_sizes", [3, 7, 11])
            ),
            resblock_dilation_sizes=[
                list(d)
                for d in ist.get(
                    "resblock_dilation_sizes", [[1, 3, 5]] * 3
                )
            ],
            gen_istft_n_fft=ist.get("gen_istft_n_fft", 20),
            gen_istft_hop_size=ist.get("gen_istft_hop_size", 5),
            vocab=cfg.get("vocab"),
        )


# ------------------------------------------------------------ primitives
def _valid_mask(length: int, n_valid) -> jax.Array:
    """[length] float {0,1} row-validity mask."""
    return (jnp.arange(length) < n_valid).astype(jnp.float32)


def _linear(p: Params, x: jax.Array) -> jax.Array:
    y = x.astype(jnp.float32) @ p["weight"].T
    if "bias" in p:
        y = y + p["bias"]
    return y


def _layer_norm(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    v = jnp.var(xf, axis=-1, keepdims=True)
    return (xf - m) * jax.lax.rsqrt(v + eps) * w + b


def _conv1d(
    p: Params,
    x: jax.Array,  # [C_in, L]
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """torch-semantics Conv1d on a single utterance."""
    w = p["weight"]  # [C_out, C_in/groups, K]
    y = jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32),
        w.astype(jnp.float32),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )[0]
    if "bias" in p:
        y = y + p["bias"][:, None]
    return y


def _conv_transpose1d(
    p: Params, x: jax.Array, stride: int, padding: int,
    output_padding: int = 0, groups: int = 1,
) -> jax.Array:
    """torch ConvTranspose1d via input dilation. weight [C_in, C_out/g, K]."""
    w = p["weight"]
    cin, coutg, k = w.shape
    wg = w.reshape(groups, cin // groups, coutg, k)
    wg = jnp.flip(wg, axis=-1).swapaxes(1, 2)  # [g, C_out/g, C_in/g, K]
    wg = wg.reshape(groups * coutg, cin // groups, k)
    pad = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32),
        wg.astype(jnp.float32),
        window_strides=(1,),
        padding=[(pad, pad + output_padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )[0]
    if "bias" in p:
        y = y + p["bias"][:, None]
    return y


def _lstm_dir(p: Params, xs: jax.Array, mask: jax.Array, reverse: bool) -> jax.Array:
    """One direction of a torch LSTM over [L, In] -> [L, H]. ``mask``
    resets the carry at invalid steps so the reverse direction starts
    from the true sequence end (padded-bucket exactness)."""
    w_ih = p["weight_ih"]  # [4H, In] gates (i, f, g, o)
    w_hh = p["weight_hh"]
    b = p.get("bias_ih", 0) + p.get("bias_hh", 0)
    hdim = w_hh.shape[1]
    pre = xs.astype(jnp.float32) @ w_ih.T + b  # [L, 4H]

    def step(carry, inp):
        x_t, m_t = inp
        h, c = carry
        h, c = h * m_t, c * m_t
        z = x_t + h @ w_hh.T
        i = jax.nn.sigmoid(z[:hdim])
        f = jax.nn.sigmoid(z[hdim : 2 * hdim])
        g = jnp.tanh(z[2 * hdim : 3 * hdim])
        o = jax.nn.sigmoid(z[3 * hdim :])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h * m_t, c * m_t), h * m_t

    init = (jnp.zeros(hdim, jnp.float32), jnp.zeros(hdim, jnp.float32))
    _, hs = jax.lax.scan(step, init, (pre, mask), reverse=reverse)
    return hs


def _bilstm(p: Params, xs: jax.Array, mask: jax.Array) -> jax.Array:
    """Bidirectional single-layer LSTM [L, In] -> [L, 2H]."""
    fwd = _lstm_dir(p["fwd"], xs, mask, reverse=False)
    bwd = _lstm_dir(p["bwd"], xs, mask, reverse=True)
    return jnp.concatenate([fwd, bwd], axis=-1)


def _adain(p: Params, x: jax.Array, s: jax.Array, mask: jax.Array) -> jax.Array:
    """AdaIN1d with VALID-MASKED instance statistics: x [C, L] padded,
    mask [L]; mean/var over valid columns only, pad columns zeroed."""
    h = _linear(p["fc"], s)
    c = x.shape[0]
    gamma, beta = h[:c], h[c:]
    xf = x.astype(jnp.float32) * mask[None, :]
    n = jnp.maximum(jnp.sum(mask), 1.0)
    m = jnp.sum(xf, axis=-1, keepdims=True) / n
    v = jnp.sum(jnp.square(xf - m) * mask[None, :], axis=-1, keepdims=True) / n
    xn = (xf - m) * jax.lax.rsqrt(v + 1e-5)
    return ((1.0 + gamma[:, None]) * xn + beta[:, None]) * mask[None, :]


def _adain_res_blk(
    p: Params, x: jax.Array, s: jax.Array, mask: jax.Array, upsample: bool
) -> Tuple[jax.Array, jax.Array]:
    """StyleTTS2 AdainResBlk1d: (norm -> lrelu -> [pool] -> conv) x2 with
    a (possibly 1x1-projected, possibly upsampled) shortcut; /sqrt(2).
    Returns (out, out_mask)."""
    out_mask = jnp.repeat(mask, 2) if upsample else mask
    sc = jnp.repeat(x, 2, axis=-1) if upsample else x  # nearest UpSample1d
    if "conv1x1" in p:
        sc = _conv1d(p["conv1x1"], sc)
    h = _adain(p["norm1"], x, s, mask)
    h = jax.nn.leaky_relu(h, 0.2)
    if upsample:
        h = _conv_transpose1d(
            p["pool"], h, stride=2, padding=1, output_padding=1,
            groups=h.shape[0],
        )
        h = h * out_mask[None, :]
    h = _conv1d(p["conv1"], h, padding=p["conv1"]["weight"].shape[-1] // 2)
    h = _adain(p["norm2"], h, s, out_mask)
    h = jax.nn.leaky_relu(h, 0.2)
    h = _conv1d(p["conv2"], h, padding=p["conv2"]["weight"].shape[-1] // 2)
    out = (h + sc) / math.sqrt(2.0) * out_mask[None, :]
    return out, out_mask


def _snake(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Snake activation x + sin^2(a x)/a (iSTFTNet AdaINResBlock1)."""
    a = alpha.reshape(-1, 1).astype(jnp.float32)
    return x + (1.0 / (a + 1e-9)) * jnp.square(jnp.sin(a * x))


def _adain_res_block1(
    p: Params, x: jax.Array, s: jax.Array, mask: jax.Array,
    dilations: Tuple[int, ...],
) -> jax.Array:
    """iSTFTNet AdaINResBlock1: dilated conv pairs with AdaIN + snake
    activations and additive residual (style-conditioned HiFi-GAN).
    ``dilations`` ride outside the param pytree (static under jit)."""
    n = len(p["convs1"])
    for j in range(n):
        xt = _adain(p["adain1"][j], x, s, mask)
        xt = _snake(xt, p["alpha1"][j])
        k = p["convs1"][j]["weight"].shape[-1]
        d = dilations[j]
        xt = _conv1d(p["convs1"][j], xt, padding=(k - 1) * d // 2, dilation=d)
        xt = _adain(p["adain2"][j], xt, s, mask)
        xt = _snake(xt, p["alpha2"][j])
        xt = _conv1d(p["convs2"][j], xt, padding=k // 2)
        x = (x + xt) * mask[None, :]
    return x


# ------------------------------------------------------------- PL-BERT
def _albert(
    p: Params, cfg: KokoroConfig, ids: jax.Array, n_valid
) -> jax.Array:
    """ALBERT encoder (one shared layer applied n times) -> [L, hidden];
    attention masked to the valid key prefix."""
    L = ids.shape[0]
    emb = (
        p["word_emb"][ids]
        + p["pos_emb"][:L]
        + p["type_emb"][0][None, :]
    )
    x = _layer_norm(emb, p["emb_ln_w"], p["emb_ln_b"], eps=1e-12)
    x = _linear(p["emb_proj"], x)  # [L, hidden]
    lp = p["layer"]
    nh = cfg.plbert_heads
    hd = cfg.plbert_hidden // nh
    key_ok = jnp.arange(L) < n_valid
    for _ in range(cfg.plbert_layers):
        q = _linear(lp["q"], x).reshape(L, nh, hd)
        k = _linear(lp["k"], x).reshape(L, nh, hd)
        v = _linear(lp["v"], x).reshape(L, nh, hd)
        scores = jnp.einsum("qhd,khd->hqk", q, k) / math.sqrt(hd)
        scores = jnp.where(key_ok[None, None, :], scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("hqk,khd->qhd", attn, v)
        ctx = _linear(lp["dense"], ctx.reshape(L, -1))
        x = _layer_norm(x + ctx, lp["attn_ln_w"], lp["attn_ln_b"], 1e-12)
        h = _linear(lp["ffn"], x)
        h = jax.nn.gelu(h, approximate=False)
        h = _linear(lp["ffn_out"], h)
        x = _layer_norm(x + h, lp["ffn_ln_w"], lp["ffn_ln_b"], 1e-12)
    return x


# ------------------------------------------------------------ predictor
def _ada_layer_norm(p: Params, x: jax.Array, s: jax.Array) -> jax.Array:
    """AdaLayerNorm over the channel (last) dim of [L, C] (per-row)."""
    h = _linear(p["fc"], s)
    c = x.shape[-1]
    gamma, beta = h[:c], h[c:]
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    v = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - m) * jax.lax.rsqrt(v + 1e-5)
    return (1.0 + gamma) * xn + beta


def _duration_encoder(
    p: Params, d_en: jax.Array, s: jax.Array, n_layer: int, mask: jax.Array
) -> jax.Array:
    """[L, 512] + style -> [L, 512 + style] (alternating BiLSTM /
    AdaLayerNorm, style re-concatenated after every block)."""
    L = d_en.shape[0]
    sty = jnp.broadcast_to(s, (L, s.shape[-1])) * mask[:, None]
    x = jnp.concatenate([d_en * mask[:, None], sty], axis=-1)
    for i in range(n_layer):
        x = _bilstm(p["lstms"][i], x, mask)  # [L, 512]
        x = _ada_layer_norm(p["norms"][i], x, s) * mask[:, None]
        x = jnp.concatenate([x, sty], axis=-1)
    return x  # [L, 512 + sty]


def _prosody_f0n(
    p: Params, en: jax.Array, s: jax.Array, mask: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """en [C=512+sty, F] -> (F0 [2F], N [2F], mask2 [2F]) via shared
    BiLSTM + AdaIN residual stacks (first block upsamples 2x)."""
    x = _bilstm(p["shared"], en.T, mask)  # [F, 512]
    f = x.T
    fm = mask
    for i, blk in enumerate(p["f0_blocks"]):
        f, fm = _adain_res_blk(blk, f, s, fm, upsample=(i == 0))
    f0 = _conv1d(p["f0_proj"], f)[0] * fm  # [2F]
    n = x.T
    nm = mask
    for i, blk in enumerate(p["n_blocks"]):
        n, nm = _adain_res_blk(blk, n, s, nm, upsample=(i == 0))
    n_out = _conv1d(p["n_proj"], n)[0] * nm
    return f0, n_out, fm


# ------------------------------------------------------------- decoder
def _istft(spec: jax.Array, phase: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Inverse STFT with Hann window + overlap-add (torch.istft
    semantics, center cropped)."""
    comp = spec.astype(jnp.complex64) * jnp.exp(
        1j * phase.astype(jnp.complex64)
    )
    frames = jnp.fft.irfft(comp.T, n=n_fft, axis=-1)  # [F, n_fft]
    win = jnp.hanning(n_fft + 1)[:-1].astype(jnp.float32)
    frames = frames * win[None, :]
    nf = frames.shape[0]
    out_len = n_fft + hop * (nf - 1)
    idx = (jnp.arange(nf) * hop)[:, None] + jnp.arange(n_fft)[None, :]
    sig = jnp.zeros(out_len, jnp.float32).at[idx.reshape(-1)].add(
        frames.reshape(-1)
    )
    wsum = jnp.zeros(out_len, jnp.float32).at[idx.reshape(-1)].add(
        jnp.tile(jnp.square(win), (nf,))
    )
    sig = sig / jnp.maximum(wsum, 1e-8)
    pad = n_fft // 2
    return sig[pad : out_len - pad]


def _stft_analyze(
    x: jax.Array, n_fft: int, hop: int
) -> Tuple[jax.Array, jax.Array]:
    """Magnitude/phase STFT of [T] (center-padded, Hann)."""
    pad = n_fft // 2
    xp = jnp.pad(x, (pad, pad), mode="reflect")
    nf = 1 + (xp.shape[0] - n_fft) // hop
    idx = (jnp.arange(nf) * hop)[:, None] + jnp.arange(n_fft)[None, :]
    frames = xp[idx] * jnp.hanning(n_fft + 1)[:-1][None, :]
    z = jnp.fft.rfft(frames, axis=-1)
    return (
        jnp.abs(z).T.astype(jnp.float32),
        jnp.angle(z).T.astype(jnp.float32),
    )


def _harmonic_source(
    p: Params, f0: jax.Array, sr: int, harmonics: int = 8,
    sine_amp: float = 0.1, voiced_threshold: float = 10.0,
    seed: int = 0,
) -> jax.Array:
    """SourceModuleHnNSF: per-harmonic sines from the upsampled F0
    track, merged by a learned tanh linear. f0: [T] samples."""
    t = f0.shape[0]
    uv = (f0 > voiced_threshold).astype(jnp.float32)
    h = jnp.arange(1, harmonics + 2, dtype=jnp.float32)
    rad = (f0[:, None] * h[None, :] / sr) % 1.0  # [T, H+1]
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    ini = jax.random.uniform(k1, (harmonics + 1,))
    ini = ini.at[0].set(0.0)
    phase = 2.0 * jnp.pi * (jnp.cumsum(rad, axis=0) + ini[None, :])
    noise = jax.random.normal(k2, (t, 1)) * sine_amp / 3.0
    sines = sine_amp * jnp.sin(phase) * uv[:, None] + noise
    merged = jnp.tanh(_linear(p["l_linear"], sines))  # [T, 1]
    return merged[:, 0]


def _generator(
    p: Params, cfg: KokoroConfig, x: jax.Array, s: jax.Array,
    f0_frames: jax.Array, mask: jax.Array, seed: int = 0,
) -> jax.Array:
    """iSTFTNet generator: upsample stack mixing a harmonic source in
    the STFT domain, snake-AdaIN resblocks, magnitude/phase iSTFT."""
    n_fft, hop = cfg.gen_istft_n_fft, cfg.gen_istft_hop_size
    total = int(np.prod(cfg.upsample_rates)) * hop
    f0_up = jnp.repeat(f0_frames, total)  # nearest upsample to samples
    har = _harmonic_source(p["m_source"], f0_up, cfg.sample_rate, seed=seed)
    har_spec, har_phase = _stft_analyze(har, n_fft, hop)
    har_cat = jnp.concatenate([har_spec, har_phase], axis=0)  # [n_fft+2, F]

    nk = len(cfg.resblock_kernel_sizes)
    for i, rate in enumerate(cfg.upsample_rates):
        x = jax.nn.leaky_relu(x, 0.1)
        k_up = cfg.upsample_kernel_sizes[i]
        x = _conv_transpose1d(
            p["ups"][i], x, stride=rate, padding=(k_up - rate) // 2
        )
        mask = jnp.repeat(mask, rate)[: x.shape[-1]]
        stride_f0 = int(np.prod(cfg.upsample_rates[i + 1 :]))
        if i + 1 < len(cfg.upsample_rates):
            xs_src = _conv1d(
                p["noise_convs"][i], har_cat, stride=stride_f0,
                padding=(stride_f0 + 1) // 2,
            )
        else:
            xs_src = _conv1d(p["noise_convs"][i], har_cat)
        m = min(x.shape[-1], xs_src.shape[-1], mask.shape[-1])
        x, xs_src, mask = x[:, :m], xs_src[:, :m], mask[:m]
        xs_src = _adain_res_block1(
            p["noise_res"][i], xs_src, s, mask, (1, 3, 5)
        )
        x = (x + xs_src) * mask[None, :]
        acc = None
        for j in range(nk):
            r = _adain_res_block1(
                p["resblocks"][i * nk + j], x, s, mask,
                tuple(cfg.resblock_dilation_sizes[j]),
            )
            acc = r if acc is None else acc + r
        x = acc / nk
    x = jax.nn.leaky_relu(x)
    x = jnp.pad(x, ((0, 0), (1, 0)), mode="reflect")
    x = _conv1d(p["conv_post"], x, padding=3)
    spec = jnp.exp(x[: n_fft // 2 + 1])
    phase = jnp.sin(x[n_fft // 2 + 1 :]) * jnp.pi
    return _istft(spec, phase, n_fft, hop)


def _decoder(
    p: Params, cfg: KokoroConfig, asr: jax.Array, f0: jax.Array,
    n_curve: jax.Array, s: jax.Array, frame_mask: jax.Array,
    seed: int = 0,
) -> jax.Array:
    """StyleTTS2 iSTFTNet Decoder: AdaIN residual trunk conditioned on
    downsampled F0/N curves + the generator. ``f0``/``n_curve`` arrive
    at 2x frame rate; frame_mask is at asr frame rate."""
    f0_d = _conv1d(p["f0_conv"], f0[None], stride=2, padding=1)
    n_d = _conv1d(p["n_conv"], n_curve[None], stride=2, padding=1)
    m = min(asr.shape[-1], f0_d.shape[-1], n_d.shape[-1])
    fmask = frame_mask[:m]
    asr = asr[:, :m] * fmask[None, :]
    f0_d = f0_d[:, :m] * fmask[None, :]
    n_d = n_d[:, :m] * fmask[None, :]
    x = jnp.concatenate([asr, f0_d, n_d], axis=0)
    x, xm = _adain_res_blk(p["encode"], x, s, fmask, upsample=False)
    asr_res = _conv1d(p["asr_res"], asr) * fmask[None, :]
    res = True
    for i, blk in enumerate(p["decode"]):
        if res:
            x = jnp.concatenate([x, asr_res, f0_d, n_d], axis=0)
        up = i == len(p["decode"]) - 1
        x, xm = _adain_res_blk(blk, x, s, xm, upsample=up)
        if up:
            res = False
    # generator consumes the 2x-rate trunk; F0 curve at the same 2x rate
    fu = f0[: x.shape[-1]]
    return _generator(p, cfg, x, s, fu, xm, seed=seed)


def _text_encoder(
    p: Params, cfg: KokoroConfig, ids: jax.Array, mask: jax.Array
) -> jax.Array:
    """embedding -> 3x (conv + channel LayerNorm + lrelu) -> BiLSTM."""
    x = p["embedding"][ids].T * mask[None, :]  # [512, L]
    k = cfg.text_encoder_kernel_size
    for blk in p["cnn"]:
        x = _conv1d(blk["conv"], x, padding=k // 2) * mask[None, :]
        x = _layer_norm(x.T, blk["ln_g"], blk["ln_b"]).T
        x = jax.nn.leaky_relu(x, 0.2) * mask[None, :]
    x = _bilstm(p["lstm"], x.T, mask)  # [L, 512]
    return x.T * mask[None, :]


# -------------------------------------------------------------- model
def _bucket(n: int, b: int) -> int:
    return max(b, ((n + b - 1) // b) * b)


class KokoroTTS:
    """Loads a Kokoro-82M-layout checkpoint directory:
    ``model.safetensors`` (torch state-dict names), ``config.json``,
    optional ``voices/*.safetensors`` or ``voices.safetensors`` packs."""

    def __init__(self, model_path: str) -> None:
        with open(os.path.join(model_path, "config.json")) as f:
            self.cfg = KokoroConfig.from_json(json.load(f))
        raw: Dict[str, np.ndarray] = {}
        from safetensors import safe_open

        for fn in sorted(glob.glob(os.path.join(model_path, "*.safetensors"))):
            if "voice" in os.path.basename(fn):
                continue
            with safe_open(fn, framework="numpy") as st:
                for name in st.keys():
                    raw[name] = st.get_tensor(name)
        self.params = _map_params(raw, self.cfg)
        self.voices = _load_voices(model_path)
        self._dur_jit = jax.jit(self._durations)
        self._synth_jit = jax.jit(self._synthesize_impl)

    def synthesize(
        self,
        token_ids: List[int],
        voice: Optional[np.ndarray] = None,
        speed: float = 1.0,
        seed: int = 0,
    ) -> np.ndarray:
        """Phoneme ids -> float32 waveform at cfg.sample_rate. Shapes
        are bucketed so repeat lengths reuse compiled programs."""
        real = [0] + list(token_ids) + [0]  # upstream pads with token 0
        n_tok = len(real)
        lb = _bucket(n_tok, TOKEN_BUCKET)
        ids = np.zeros(lb, np.int32)
        ids[:n_tok] = real
        if voice is None:
            ref = np.zeros((2 * self.cfg.style_dim,), np.float32)
        else:
            v = np.asarray(voice, np.float32)
            ref = (
                v[min(len(token_ids) - 1, v.shape[0] - 1)].reshape(-1)
                if v.ndim >= 2
                else v.reshape(-1)
            )
        # durations need one host round-trip: the alignment expansion is
        # data-dependent (same split as upstream's pred_aln_trg build)
        dur = np.asarray(
            self._dur_jit(
                self.params, jnp.asarray(ids), jnp.asarray(ref),
                jnp.int32(n_tok),
            )
        )[:n_tok]
        dur = np.maximum(np.round(dur / max(speed, 0.25)), 1).astype(np.int64)
        total = int(dur.sum())
        fb = _bucket(total, FRAME_BUCKET)
        aln = np.zeros((lb, fb), np.float32)
        t0 = 0
        for i, d in enumerate(dur):
            aln[i, t0 : t0 + d] = 1.0
            t0 += d
        wave = self._synth_jit(
            self.params, jnp.asarray(ids), jnp.asarray(ref),
            jnp.asarray(aln), jnp.int32(n_tok), jnp.int32(total),
            jnp.int32(seed),
        )
        return np.asarray(wave, np.float32)[
            : total * self.cfg.samples_per_frame
        ]

    def _durations(self, p, ids, ref, n_tok) -> jax.Array:
        cfg = self.cfg
        mask = _valid_mask(ids.shape[0], n_tok)
        bert = _albert(p["bert"], cfg, ids, n_tok)
        d_en = _linear(p["bert_encoder"], bert)  # [L, 512]
        s = ref[cfg.style_dim :]
        d = _duration_encoder(
            p["duration_encoder"], d_en, s, cfg.n_layer, mask
        )
        x = _bilstm(p["predictor_lstm"], d, mask)
        logits = _linear(p["duration_proj"], x)  # [L, max_dur]
        return jnp.sum(jax.nn.sigmoid(logits), axis=-1) * mask

    def _synthesize_impl(self, p, ids, ref, aln, n_tok, n_frames, seed):
        cfg = self.cfg
        tok_mask = _valid_mask(ids.shape[0], n_tok)
        frame_mask = _valid_mask(aln.shape[1], n_frames)
        s_pros = ref[cfg.style_dim :]
        s_dec = ref[: cfg.style_dim]
        bert = _albert(p["bert"], cfg, ids, n_tok)
        d_en = _linear(p["bert_encoder"], bert)
        d = _duration_encoder(
            p["duration_encoder"], d_en, s_pros, cfg.n_layer, tok_mask
        )  # [L, 640]
        en = d.T @ aln  # [640, F]
        f0, n_curve, _ = _prosody_f0n(
            p["prosody"], en, s_pros, frame_mask
        )
        t_en = _text_encoder(p["text_encoder"], cfg, ids, tok_mask)
        asr = t_en @ aln  # [512, F]
        return _decoder(
            p["decoder"], cfg, asr, f0, n_curve, s_dec, frame_mask,
            seed=seed,
        )


# ------------------------------------------------------------- loading
def _fuse_wn(raw: Dict[str, np.ndarray], prefix: str) -> Optional[Params]:
    """weight-norm fused params at ``prefix`` (weight_g/weight_v or
    plain weight) + optional bias."""
    out: Params = {}
    g, v = raw.get(prefix + ".weight_g"), raw.get(prefix + ".weight_v")
    if g is not None and v is not None:
        vf = v.astype(np.float32)
        norm = np.sqrt(
            np.sum(vf * vf, axis=tuple(range(1, vf.ndim)), keepdims=True)
        )
        out["weight"] = jnp.asarray(
            g.astype(np.float32) / (norm + 1e-12) * vf
        )
    elif prefix + ".weight" in raw:
        out["weight"] = jnp.asarray(raw[prefix + ".weight"], jnp.float32)
    else:
        return None
    if prefix + ".bias" in raw:
        out["bias"] = jnp.asarray(raw[prefix + ".bias"], jnp.float32)
    return out


def _lin(raw, prefix) -> Params:
    p = _fuse_wn(raw, prefix)
    if p is None:
        raise KeyError(f"missing tensor {prefix}.weight")
    return p


def _lstm_params(raw, prefix) -> Params:
    def side(sfx):
        d = {
            "weight_ih": jnp.asarray(
                raw[f"{prefix}.weight_ih_l0{sfx}"], jnp.float32
            ),
            "weight_hh": jnp.asarray(
                raw[f"{prefix}.weight_hh_l0{sfx}"], jnp.float32
            ),
        }
        if f"{prefix}.bias_ih_l0{sfx}" in raw:
            d["bias_ih"] = jnp.asarray(
                raw[f"{prefix}.bias_ih_l0{sfx}"], jnp.float32
            )
            d["bias_hh"] = jnp.asarray(
                raw[f"{prefix}.bias_hh_l0{sfx}"], jnp.float32
            )
        return d

    return {"fwd": side(""), "bwd": side("_reverse")}


def _adain_blk_params(raw, prefix) -> Params:
    p: Params = {
        "conv1": _lin(raw, prefix + ".conv1"),
        "conv2": _lin(raw, prefix + ".conv2"),
        "norm1": {"fc": _lin(raw, prefix + ".norm1.fc")},
        "norm2": {"fc": _lin(raw, prefix + ".norm2.fc")},
    }
    sc = _fuse_wn(raw, prefix + ".conv1x1")
    if sc is not None:
        p["conv1x1"] = sc
    pool = _fuse_wn(raw, prefix + ".pool")
    if pool is not None:
        p["pool"] = pool
    return p


def _adain_res1_params(raw, prefix, dilations) -> Params:
    n = len(dilations)
    return {
        "convs1": [_lin(raw, f"{prefix}.convs1.{j}") for j in range(n)],
        "convs2": [_lin(raw, f"{prefix}.convs2.{j}") for j in range(n)],
        "adain1": [
            {"fc": _lin(raw, f"{prefix}.adain1.{j}.fc")} for j in range(n)
        ],
        "adain2": [
            {"fc": _lin(raw, f"{prefix}.adain2.{j}.fc")} for j in range(n)
        ],
        "alpha1": [
            jnp.asarray(raw[f"{prefix}.alpha1.{j}"], jnp.float32)
            for j in range(n)
        ],
        "alpha2": [
            jnp.asarray(raw[f"{prefix}.alpha2.{j}"], jnp.float32)
            for j in range(n)
        ],
    }


def _map_params(raw: Dict[str, np.ndarray], cfg: KokoroConfig) -> Params:
    a = "bert.encoder.albert_layer_groups.0.albert_layers.0"
    bert = {
        "word_emb": jnp.asarray(
            raw["bert.embeddings.word_embeddings.weight"], jnp.float32
        ),
        "pos_emb": jnp.asarray(
            raw["bert.embeddings.position_embeddings.weight"], jnp.float32
        ),
        "type_emb": jnp.asarray(
            raw["bert.embeddings.token_type_embeddings.weight"], jnp.float32
        ),
        "emb_ln_w": jnp.asarray(
            raw["bert.embeddings.LayerNorm.weight"], jnp.float32
        ),
        "emb_ln_b": jnp.asarray(
            raw["bert.embeddings.LayerNorm.bias"], jnp.float32
        ),
        "emb_proj": _lin(raw, "bert.encoder.embedding_hidden_mapping_in"),
        "layer": {
            "q": _lin(raw, f"{a}.attention.query"),
            "k": _lin(raw, f"{a}.attention.key"),
            "v": _lin(raw, f"{a}.attention.value"),
            "dense": _lin(raw, f"{a}.attention.dense"),
            "attn_ln_w": jnp.asarray(
                raw[f"{a}.attention.LayerNorm.weight"], jnp.float32
            ),
            "attn_ln_b": jnp.asarray(
                raw[f"{a}.attention.LayerNorm.bias"], jnp.float32
            ),
            "ffn": _lin(raw, f"{a}.ffn"),
            "ffn_out": _lin(raw, f"{a}.ffn_output"),
            "ffn_ln_w": jnp.asarray(
                raw[f"{a}.full_layer_layer_norm.weight"], jnp.float32
            ),
            "ffn_ln_b": jnp.asarray(
                raw[f"{a}.full_layer_layer_norm.bias"], jnp.float32
            ),
        },
    }
    de = {
        "lstms": [
            _lstm_params(raw, f"predictor.text_encoder.lstms.{2 * i}")
            for i in range(cfg.n_layer)
        ],
        "norms": [
            {"fc": _lin(raw, f"predictor.text_encoder.lstms.{2 * i + 1}.fc")}
            for i in range(cfg.n_layer)
        ],
    }
    prosody = {
        "shared": _lstm_params(raw, "predictor.shared"),
        "f0_blocks": [
            _adain_blk_params(raw, f"predictor.F0.{i}") for i in range(3)
        ],
        "n_blocks": [
            _adain_blk_params(raw, f"predictor.N.{i}") for i in range(3)
        ],
        "f0_proj": _lin(raw, "predictor.F0_proj"),
        "n_proj": _lin(raw, "predictor.N_proj"),
    }
    te = {
        "embedding": jnp.asarray(
            raw["text_encoder.embedding.weight"], jnp.float32
        ),
        "cnn": [
            {
                "conv": _lin(raw, f"text_encoder.cnn.{i}.0"),
                "ln_g": jnp.asarray(
                    raw[f"text_encoder.cnn.{i}.1.gamma"], jnp.float32
                ),
                "ln_b": jnp.asarray(
                    raw[f"text_encoder.cnn.{i}.1.beta"], jnp.float32
                ),
            }
            for i in range(3)
        ],
        "lstm": _lstm_params(raw, "text_encoder.lstm"),
    }
    nk = len(cfg.resblock_kernel_sizes)
    dec = {
        "encode": _adain_blk_params(raw, "decoder.encode"),
        "decode": [
            _adain_blk_params(raw, f"decoder.decode.{i}") for i in range(4)
        ],
        "f0_conv": _lin(raw, "decoder.F0_conv"),
        "n_conv": _lin(raw, "decoder.N_conv"),
        "asr_res": _lin(raw, "decoder.asr_res.0"),
        "m_source": {
            "l_linear": _lin(raw, "decoder.generator.m_source.l_linear")
        },
        "ups": [
            _lin(raw, f"decoder.generator.ups.{i}")
            for i in range(len(cfg.upsample_rates))
        ],
        "noise_convs": [
            _lin(raw, f"decoder.generator.noise_convs.{i}")
            for i in range(len(cfg.upsample_rates))
        ],
        "noise_res": [
            _adain_res1_params(
                raw, f"decoder.generator.noise_res.{i}", [1, 3, 5]
            )
            for i in range(len(cfg.upsample_rates))
        ],
        "resblocks": [
            _adain_res1_params(
                raw,
                f"decoder.generator.resblocks.{i * nk + j}",
                cfg.resblock_dilation_sizes[j],
            )
            for i in range(len(cfg.upsample_rates))
            for j in range(nk)
        ],
        "conv_post": _lin(raw, "decoder.generator.conv_post"),
    }
    return {
        "bert": bert,
        "bert_encoder": _lin(raw, "bert_encoder"),
        "duration_encoder": de,
        "predictor_lstm": _lstm_params(raw, "predictor.lstm"),
        "duration_proj": _lin(raw, "predictor.duration_proj.linear_layer"),
        "prosody": prosody,
        "text_encoder": te,
        "decoder": dec,
    }


def _load_voices(model_path: str) -> Dict[str, np.ndarray]:
    """voices/*.safetensors (one tensor per file) or voices.safetensors
    (named tensors) -> {voice: [510, 1, 256]}."""
    from safetensors import safe_open

    out: Dict[str, np.ndarray] = {}
    vdir = os.path.join(model_path, "voices")
    files = sorted(glob.glob(os.path.join(vdir, "*.safetensors")))
    single = os.path.join(model_path, "voices.safetensors")
    if os.path.exists(single):
        files.append(single)
    for fn in files:
        with safe_open(fn, framework="numpy") as st:
            keys = list(st.keys())
            for kname in keys:
                name = (
                    os.path.splitext(os.path.basename(fn))[0]
                    if len(keys) == 1 and fn != single
                    else kname
                )
                out[name] = st.get_tensor(kname)
    return out

# SPDX-License-Identifier: Apache-2.0
"""Log-mel spectrogram frontend (Whisper-compatible).

The reference gets this from mlx-audio's native pipeline
(reference audio/stt.py:64-160); here it is an XLA program: framed STFT
via rFFT + a slaney-normalized mel filterbank (librosa-compatible, the
exact filters Whisper ships), computed on device in one jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH_S = 30
N_SAMPLES = SAMPLE_RATE * CHUNK_LENGTH_S  # 480000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000


def _hz_to_mel(f):
    # slaney scale (librosa default)
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz,
        min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
        mel,
    )


def _mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel,
        min_log_hz * np.exp(logstep * (m - min_log_mel)),
        freqs,
    )


@functools.lru_cache(maxsize=4)
def mel_filterbank(
    n_mels: int = 80, sr: int = SAMPLE_RATE, n_fft: int = N_FFT
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank [n_mels, n_fft//2+1]
    (librosa.filters.mel equivalent)."""
    fmax = sr / 2
    fft_freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
    mel_pts = np.linspace(_hz_to_mel(0.0), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def log_mel_spectrogram(
    audio: jax.Array,  # [B, n_samples] float32, 16 kHz
    n_mels: int = 80,
) -> jax.Array:
    """Whisper log-mel: [B, n_mels, n_frames]."""
    b, n = audio.shape
    window = jnp.asarray(np.hanning(N_FFT + 1)[:-1].astype(np.float32))
    pad = N_FFT // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = n // HOP_LENGTH
    # frame: [B, n_frames+?, N_FFT]
    idx = (
        jnp.arange(n_frames + 1)[:, None] * HOP_LENGTH
        + jnp.arange(N_FFT)[None, :]
    )
    frames = x[:, idx] * window  # [B, F+1, N_FFT]
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    mag = jnp.abs(spec[:, :-1, :]) ** 2  # drop last frame (whisper)
    mel = jnp.asarray(mel_filterbank(n_mels))  # [n_mels, n_fft//2+1]
    mspec = jnp.einsum("mf,btf->bmt", mel, mag)
    log_spec = jnp.log10(jnp.maximum(mspec, 1e-10))
    log_spec = jnp.maximum(
        log_spec, jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    )
    return (log_spec + 4.0) / 4.0


def pad_or_trim(audio: np.ndarray, length: int = N_SAMPLES) -> np.ndarray:
    if audio.shape[-1] >= length:
        return audio[..., :length]
    return np.pad(audio, (0, length - audio.shape[-1]))


def load_wav(path: str, target_sr: int = SAMPLE_RATE) -> np.ndarray:
    """Load a WAV file to float32 mono at 16 kHz (scipy; no ffmpeg)."""
    from scipy.io import wavfile
    from scipy.signal import resample_poly

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    if sr != target_sr:
        from math import gcd

        g = gcd(int(sr), target_sr)
        data = resample_poly(data, target_sr // g, sr // g).astype(np.float32)
    return data

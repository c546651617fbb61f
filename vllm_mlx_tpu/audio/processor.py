# SPDX-License-Identifier: Apache-2.0
"""Audio source separation (reference audio/processor.py:33-193 —
SAM-Audio text-guided separation, marked optional in SURVEY §2.6).

The SAM-Audio checkpoints are MLX-community conversions with no public
TPU/JAX port and this image has no egress to fetch weights, so the
full model is gated. What ships here is the serving surface plus a
spectral-mask fallback so the API is exercisable end to end:
``separate(..., description="speech")`` isolates the voiced band via
an STFT magnitude mask (not a learned model — a placeholder until a
JAX SAM-Audio checkpoint can be loaded via ``load``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class SeparationResult:
    target: np.ndarray  # isolated audio
    residual: np.ndarray  # everything else
    sample_rate: int
    peak_memory: float = 0.0


class AudioProcessor:
    """Text-guided source separation engine.

    ``load`` accepts a local JAX SAM-Audio checkpoint directory; until
    one is provided, ``separate`` falls back to a deterministic
    spectral band mask (speech band 80–4000 Hz) so callers and tests
    can exercise the pipeline without weights.
    """

    def __init__(self, model_name: str | None = None) -> None:
        self.model_name = model_name
        self._model = None

    def load(self, path: str | None = None) -> None:
        if path is None:
            return  # fallback mode
        raise NotImplementedError(
            "no public TPU/JAX SAM-Audio checkpoint format is defined "
            "yet; run in fallback mode (load() with no path)"
        )

    def separate(
        self,
        audio: np.ndarray,
        sample_rate: int = 16000,
        description: str = "speech",
    ) -> SeparationResult:
        """Split ``audio`` [T] into (target, residual) per
        ``description``. Fallback: an STFT band mask covering the
        speech range when the description mentions voice/speech,
        else its complement."""
        x = np.asarray(audio, np.float32).reshape(-1)
        n_fft, hop = 512, 128
        pad = (-(len(x) - n_fft)) % hop if len(x) > n_fft else n_fft - len(x)
        xp = np.pad(x, (0, pad))
        frames = np.lib.stride_tricks.sliding_window_view(xp, n_fft)[::hop]
        win = np.hanning(n_fft).astype(np.float32)
        spec = np.fft.rfft(frames * win, axis=-1)
        freqs = np.fft.rfftfreq(n_fft, 1.0 / sample_rate)
        band = (freqs >= 80.0) & (freqs <= 4000.0)
        voice_like = any(
            w in description.lower()
            for w in ("speech", "voice", "talk", "vocal")
        )
        mask = band if voice_like else ~band
        tgt_spec = spec * mask[None, :]
        res_spec = spec * (~mask)[None, :]

        def istft(s):
            fr = np.fft.irfft(s, n=n_fft, axis=-1) * win
            out = np.zeros(len(xp), np.float32)
            norm = np.zeros(len(xp), np.float32)
            for i, f in enumerate(fr):
                out[i * hop : i * hop + n_fft] += f
                norm[i * hop : i * hop + n_fft] += win**2
            return (out / np.maximum(norm, 1e-8))[: len(x)]

        return SeparationResult(
            target=istft(tgt_spec),
            residual=istft(res_spec),
            sample_rate=sample_rate,
        )

    def save(self, audio: np.ndarray, path: str, sample_rate: int = 16000):
        """Write a mono 16-bit WAV (stdlib wave — soundfile is not in
        the image)."""
        import struct
        import wave

        pcm = np.clip(audio, -1.0, 1.0)
        pcm16 = (pcm * 32767.0).astype(np.int16)
        with wave.open(path, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sample_rate)
            f.writeframes(struct.pack(f"<{len(pcm16)}h", *pcm16))

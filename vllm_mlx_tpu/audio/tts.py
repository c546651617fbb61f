# SPDX-License-Identifier: Apache-2.0
"""Text-to-speech engine over the JAX VITS synthesizer (reference
audio/tts.py:52-227 ``TTSEngine`` over mlx-audio Kokoro/других).

The TPU build serves VITS-family checkpoints (Meta MMS-TTS — 1100+
languages — and original VITS voices): text is normalized and romanized
by the checkpoint's own tokenizer (uroman-style vocab filtering +
blank interspersal), synthesized on device, and returned as WAV/PCM.
"""

from __future__ import annotations

import io
import logging
import struct
import time
from typing import Any, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """float32 [-1, 1] -> 16-bit PCM WAV bytes (stdlib only — no
    soundfile in the image)."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    hdr += b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm


class TTSEngine:
    """Loads a VITS/MMS checkpoint + its tokenizer; thread-safe
    synthesis for the /v1/audio/speech handler."""

    def __init__(self, model_path: str) -> None:
        self.model_path = model_path
        self.model = None
        self.tokenizer = None
        self.stats: Dict[str, Any] = {
            "requests": 0, "audio_seconds": 0.0, "synth_seconds": 0.0,
        }

    def load(self) -> "TTSEngine":
        from ..models.vits import VitsTTS

        t0 = time.time()
        self.model = VitsTTS(self.model_path)
        self.tokenizer = self._load_tokenizer(self.model_path)
        logger.info(
            "TTS model loaded from %s in %.1fs (rate=%d Hz, %d speakers)",
            self.model_path, time.time() - t0,
            self.model.cfg.sampling_rate, self.model.cfg.num_speakers,
        )
        return self

    @staticmethod
    def _load_tokenizer(path: str):
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(path)

    @property
    def sample_rate(self) -> int:
        return self.model.cfg.sampling_rate

    def voices(self) -> List[Dict[str, Any]]:
        n = max(1, self.model.cfg.num_speakers) if self.model else 0
        return [
            {"id": str(i), "name": f"speaker_{i}", "model": self.model_path}
            for i in range(n)
        ]

    def _resolve_voice(self, voice: Optional[str]) -> int:
        if voice in (None, "", "default", "alloy"):
            return 0
        try:
            idx = int(voice)
        except ValueError:
            idx = int(voice.rsplit("_", 1)[-1]) if "_" in str(voice) else -1
        n = max(1, self.model.cfg.num_speakers)
        if not 0 <= idx < n:
            raise ValueError(
                f"unknown voice {voice!r} (model has {n} speakers)"
            )
        return idx

    def synthesize(
        self,
        text: str,
        voice: Optional[str] = None,
        speed: float = 1.0,
        seed: int = 0,
    ) -> np.ndarray:
        """Text -> float32 waveform at ``sample_rate``."""
        if self.model is None:
            raise RuntimeError("TTS engine not loaded")
        speaker = self._resolve_voice(voice)
        enc = self.tokenizer(text, return_tensors="np")
        ids = [int(x) for x in enc["input_ids"][0]]
        if not ids:
            raise ValueError("input text produced no tokens")
        t0 = time.time()
        wave = self.model.synthesize(
            ids,
            speaking_rate=self.model.cfg.speaking_rate * max(speed, 0.25),
            speaker_id=speaker,
            seed=seed,
        )
        dt = time.time() - t0
        self.stats["requests"] += 1
        self.stats["audio_seconds"] += len(wave) / self.sample_rate
        self.stats["synth_seconds"] += dt
        return wave

    def synthesize_wav(
        self,
        text: str,
        voice: Optional[str] = None,
        speed: float = 1.0,
        response_format: str = "wav",
        seed: int = 0,
    ) -> bytes:
        wave = self.synthesize(text, voice=voice, speed=speed, seed=seed)
        if response_format == "pcm":
            return (
                np.clip(wave, -1, 1) * 32767.0
            ).astype("<i2").tobytes()
        if response_format != "wav":
            raise ValueError(
                f"response_format {response_format!r} not supported "
                "(wav, pcm)"
            )
        return encode_wav(wave, self.sample_rate)

    def get_stats(self) -> Dict[str, Any]:
        s = dict(self.stats)
        if s["synth_seconds"] > 0:
            s["rtf"] = s["audio_seconds"] / s["synth_seconds"]
        return s

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
    """Loads a VITS/MMS or Kokoro-class checkpoint + its tokenizer;
    thread-safe synthesis for the /v1/audio/speech handler. Family
    detection mirrors the reference (reference audio/tts.py:84-99
    ``_detect_family``): a Kokoro/StyleTTS2 config (``istftnet`` /
    ``plbert`` sections or a phoneme ``vocab``) loads the iSTFTNet
    pipeline (models/kokoro.py); anything else loads VITS."""

    def __init__(self, model_path: str) -> None:
        self.model_path = model_path
        self.model = None
        self.family = "vits"
        self.tokenizer = None
        self.stats: Dict[str, Any] = {
            "requests": 0, "audio_seconds": 0.0, "synth_seconds": 0.0,
        }

    @staticmethod
    def _detect_family(model_path: str) -> str:
        import json
        import os

        try:
            with open(os.path.join(model_path, "config.json")) as f:
                j = json.load(f)
        except OSError:
            return "vits"
        if (
            "istftnet" in j
            or "plbert" in j
            or "kokoro" in str(j.get("model_type", "")).lower()
            or "kokoro" in os.path.basename(str(model_path)).lower()
        ):
            return "kokoro"
        return "vits"

    def load(self) -> "TTSEngine":
        t0 = time.time()
        self.family = self._detect_family(self.model_path)
        if self.family == "kokoro":
            from ..models.kokoro import KokoroTTS

            self.model = KokoroTTS(self.model_path)
            logger.info(
                "Kokoro TTS loaded from %s in %.1fs (rate=%d Hz, "
                "%d voices)",
                self.model_path, time.time() - t0,
                self.model.cfg.sample_rate, len(self.model.voices),
            )
            return self
        from ..models.vits import VitsTTS

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
        if self.family == "kokoro":
            return self.model.cfg.sample_rate
        return self.model.cfg.sampling_rate

    def voices(self) -> List[Dict[str, Any]]:
        if self.family == "kokoro":
            names = sorted(self.model.voices) or ["default"]
            return [
                {"id": n, "name": n, "model": self.model_path}
                for n in names
            ]
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

    def _kokoro_tokens(self, text: str) -> List[int]:
        """Phoneme string -> ids via the checkpoint's vocab. Kokoro
        upstream phonemizes with espeak-ng/misaki (absent here): raw
        phoneme input passes through; plain text falls back to
        character-level mapping of whatever the vocab covers."""
        vocab = self.model.cfg.vocab or {}
        ids = [vocab[ch] for ch in text if ch in vocab]
        if not ids:
            raise ValueError(
                "input produced no phoneme tokens — pass espeak-style "
                "phonemes (no phonemizer is available in this build)"
            )
        return ids

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
        t0 = time.time()
        if self.family == "kokoro":
            vname = voice if voice not in (None, "", "default", "alloy") \
                else (sorted(self.model.voices)[0] if self.model.voices
                      else None)
            if vname is not None and vname not in self.model.voices:
                raise ValueError(f"unknown voice {vname!r}")
            pack = self.model.voices.get(vname) if vname else None
            wave = self.model.synthesize(
                self._kokoro_tokens(text), voice=pack,
                speed=max(speed, 0.25), seed=seed,
            )
        else:
            speaker = self._resolve_voice(voice)
            enc = self.tokenizer(text, return_tensors="np")
            ids = [int(x) for x in enc["input_ids"][0]]
            if not ids:
                raise ValueError("input text produced no tokens")
            wave = self.model.synthesize(
                ids,
                speaking_rate=self.model.cfg.speaking_rate
                * max(speed, 0.25),
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

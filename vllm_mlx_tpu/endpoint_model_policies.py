# SPDX-License-Identifier: Apache-2.0
"""Per-endpoint model-name policy (reference endpoint_model_policies.py:
82-120): well-known upstream aliases map to the locally loaded engine,
and clearly-wrong model kinds are rejected with a helpful error."""

from __future__ import annotations

from typing import Optional, Tuple

# Model-name markers that indicate the WRONG kind of model per endpoint.
_EMBEDDING_MARKERS = ("embed", "bge-", "gte-", "e5-", "minilm")
_RERANK_MARKERS = ("rerank", "cross-encoder")
_STT_MARKERS = ("whisper", "parakeet", "stt")
_TTS_MARKERS = ("kokoro", "tts", "chatterbox", "vibevoice", "cosyvoice")

# OpenAI upstream names commonly sent by clients; alias to the local model.
_OPENAI_ALIASES = {
    "text-embedding-3-small",
    "text-embedding-3-large",
    "text-embedding-ada-002",
    "whisper-1",
    "gpt-4o-transcribe",
    "gpt-4o-mini-transcribe",
    "tts-1",
    "tts-1-hd",
    "gpt-4o-mini-tts",
}


def resolve_embedding_model_name(
    requested: str, loaded: Optional[str]
) -> Tuple[Optional[str], Optional[str]]:
    """Returns (resolved_name, error). Aliases OpenAI embedding names to
    the loaded model; rejects chat/stt-looking names."""
    low = requested.lower()
    if any(m in low for m in _STT_MARKERS + _TTS_MARKERS):
        return None, (
            f"model {requested!r} is not an embedding model"
        )
    if requested in _OPENAI_ALIASES or any(
        m in low for m in _EMBEDDING_MARKERS
    ):
        return loaded or requested, None
    return loaded or requested, None


def resolve_stt_model_name(
    requested: str, loaded: Optional[str]
) -> Tuple[Optional[str], Optional[str]]:
    low = requested.lower()
    if any(m in low for m in _EMBEDDING_MARKERS + _RERANK_MARKERS):
        return None, f"model {requested!r} is not a speech-to-text model"
    return loaded or requested, None


def resolve_tts_model_name(
    requested: str, loaded: Optional[str]
) -> Tuple[Optional[str], Optional[str]]:
    low = requested.lower()
    if any(m in low for m in _EMBEDDING_MARKERS + _RERANK_MARKERS + _STT_MARKERS):
        return None, f"model {requested!r} is not a text-to-speech model"
    return loaded or requested, None

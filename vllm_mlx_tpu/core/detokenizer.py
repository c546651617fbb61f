# SPDX-License-Identifier: Apache-2.0
"""Incremental UTF-8-safe streaming detokenizer.

The reference uses mlx-lm's NaiveStreamingDetokenizer pool
(reference scheduler.py:1286-1295, 2173-2210; 1.79-2.39x faster than
re-decoding, docs/benchmarks/llm.md:56-75). Here detokenization is
offset-based and O(1) per token: re-decode only a small trailing window
and emit the stable delta, holding back text that ends in an incomplete
UTF-8 sequence (the U+FFFD replacement char) until it completes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

_REPLACEMENT = "�"


@dataclass
class DetokenizerState:
    token_ids: List[int] = field(default_factory=list)
    prefix_offset: int = 0  # start of the re-decode window (token index)
    read_offset: int = 0  # tokens already reflected in ``text``
    text: str = ""


class StreamingDetokenizer:
    """Wraps a HF (fast) tokenizer for per-request incremental decoding."""

    def __init__(self, tokenizer, skip_special_tokens: bool = True) -> None:
        self._tok = tokenizer
        self._skip_special = skip_special_tokens

    def new_state(self, prompt_tail: Optional[List[int]] = None) -> DetokenizerState:
        """``prompt_tail``: a few trailing prompt tokens give byte-level BPE
        the left context it needs for correct leading-space handling."""
        st = DetokenizerState()
        if prompt_tail:
            st.token_ids = list(prompt_tail)
            st.prefix_offset = 0
            st.read_offset = len(st.token_ids)
        return st

    def _decode(self, ids: List[int]) -> str:
        return self._tok.decode(ids, skip_special_tokens=self._skip_special)

    def step(self, state: DetokenizerState, token_id: int) -> str:
        """Append one token; return newly stable text (may be empty)."""
        state.token_ids.append(token_id)
        window = state.token_ids[state.prefix_offset :]
        prev = state.token_ids[state.prefix_offset : state.read_offset]
        full = self._decode(window)
        prefix = self._decode(prev) if prev else ""
        if full.endswith(_REPLACEMENT):
            return ""  # mid-UTF-8; wait for more tokens
        delta = full[len(prefix) :] if full.startswith(prefix) else ""
        if not full.startswith(prefix):
            # Tokenizer merge changed earlier text (rare); re-emit nothing
            # now, resync the window.
            state.prefix_offset = state.read_offset
            state.read_offset = len(state.token_ids)
            return ""
        if delta:
            state.text += delta
            # Slide the window: keep a small tail for context.
            state.prefix_offset = max(0, len(state.token_ids) - 6)
            state.read_offset = len(state.token_ids)
        return delta

    def flush(self, state: DetokenizerState) -> str:
        """Emit any held-back text at end of generation."""
        window = state.token_ids[state.prefix_offset :]
        prev = state.token_ids[state.prefix_offset : state.read_offset]
        full = self._decode(window)
        prefix = self._decode(prev) if prev else ""
        delta = full[len(prefix) :] if full.startswith(prefix) else ""
        if delta:
            state.text += delta
            state.read_offset = len(state.token_ids)
        return delta

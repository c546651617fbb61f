# SPDX-License-Identifier: Apache-2.0
"""System-prompt canonicalization for prefix-cache stability (reference
api/prompt_canonicalize.py:1-51).

Agent frameworks regenerate byte-varying system prompts for identical
conversations (CRLF vs LF, trailing whitespace, duplicated system
messages) — every variant is a prefix-cache miss. Canonicalization is
deliberately conservative: it never rewrites words, only normalizes
byte-level noise:

  * CRLF / CR -> LF
  * trailing whitespace stripped per line (system messages only)
  * trailing newlines collapsed to none at message end
  * consecutive system messages merged into one (double-newline joined)
"""

from __future__ import annotations

from typing import Any, Dict, List


def _canon_text(text: str) -> str:
    lines = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    return "\n".join(line.rstrip() for line in lines).rstrip("\n")


def canonicalize_messages(
    messages: List[Dict[str, Any]]
) -> List[Dict[str, Any]]:
    """Returns a new message list with stable system-prompt bytes."""
    out: List[Dict[str, Any]] = []
    for m in messages:
        if m.get("role") != "system" or not isinstance(
            m.get("content"), str
        ):
            out.append(m)
            continue
        text = _canon_text(m["content"])
        if (
            out
            and out[-1].get("role") == "system"
            and isinstance(out[-1].get("content"), str)
        ):
            merged = out[-1]["content"]
            out[-1] = {
                **out[-1],
                "content": (merged + "\n\n" + text) if text else merged,
            }
        else:
            out.append({**m, "content": text})
    return out

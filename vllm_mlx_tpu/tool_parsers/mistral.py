# SPDX-License-Identifier: Apache-2.0
"""Mistral tool parser: ``[TOOL_CALLS][{...}, ...]``
(reference tool_parsers/mistral_tool_parser.py)."""

from __future__ import annotations

import json
from typing import List

from .abstract_tool_parser import (
    ExtractedToolCalls,
    ToolParser,
    parse_tool_json,
    register_tool_parser,
    scan_balanced_json,
)

MARKER = "[TOOL_CALLS]"


@register_tool_parser("mistral")
class MistralToolParser(ToolParser):
    stream_markers = [MARKER]
    stream_incremental = True  # array of calls streams call-by-call
    stream_close_markers = ["]"]

    def extract_tool_calls(self, text: str) -> ExtractedToolCalls:
        if MARKER not in text:
            return ExtractedToolCalls(False, [], text)
        before, after = text.split(MARKER, 1)
        span = scan_balanced_json(after, 0)
        if span is None:
            return ExtractedToolCalls(False, [], text)
        a, b = span
        try:
            val = json.loads(after[a:b])
        except json.JSONDecodeError:
            return ExtractedToolCalls(False, [], text)
        vals = val if isinstance(val, list) else [val]
        calls: List[dict] = []
        for v in vals:
            tc = parse_tool_json(v)
            if tc:
                calls.append(tc)
        if not calls:
            return ExtractedToolCalls(False, [], text)
        content = (before + after[b:]).strip()
        return ExtractedToolCalls(True, calls, content or None)

# SPDX-License-Identifier: Apache-2.0
"""Format-agnostic JSON tool-call extraction ("auto").

Parity with the reference's format-agnostic path (reference
api/tool_calling.py:126 ``parse_tool_calls``): scans free text — and
fenced ```json blocks — for balanced JSON objects/arrays that look like
tool calls ({"name": ..., "arguments"|"parameters": ...}).
"""

from __future__ import annotations

import json
import re
from typing import Any, List

from .abstract_tool_parser import (
    ExtractedToolCalls,
    ToolParser,
    parse_tool_json,
    register_tool_parser,
    scan_balanced_json,
)

_FENCE_RE = re.compile(r"```(?:json|tool_call|tool)?\s*\n?(.*?)```", re.DOTALL)


def _try_parse_value(raw: str) -> List[dict]:
    try:
        val = json.loads(raw)
    except json.JSONDecodeError:
        return []
    vals = val if isinstance(val, list) else [val]
    out = []
    for v in vals:
        tc = parse_tool_json(v)
        if tc:
            out.append(tc)
    return out


@register_tool_parser("auto")
@register_tool_parser("json")
class JsonToolParser(ToolParser):
    stream_markers = ["{", "[", "```"]

    def extract_tool_calls(self, text: str) -> ExtractedToolCalls:
        calls: List[dict] = []
        content_parts: List[str] = []
        remaining = text

        # fenced blocks first
        spans = []
        for m in _FENCE_RE.finditer(text):
            found = _try_parse_value(m.group(1).strip())
            if found:
                calls.extend(found)
                spans.append((m.start(), m.end()))
        if spans:
            last = 0
            for a, b in spans:
                content_parts.append(text[last:a])
                last = b
            content_parts.append(text[last:])
            content = "".join(content_parts).strip()
            return ExtractedToolCalls(True, calls, content or None)

        # bare balanced JSON scan
        pos = 0
        content = ""
        while True:
            span = scan_balanced_json(remaining, pos)
            if span is None:
                content += remaining[pos:]
                break
            a, b = span
            found = _try_parse_value(remaining[a:b])
            if found:
                calls.extend(found)
                content += remaining[pos:a]
                pos = b
            else:
                content += remaining[pos : a + 1]
                pos = a + 1
        if calls:
            return ExtractedToolCalls(True, calls, content.strip() or None)
        return ExtractedToolCalls(False, [], text)

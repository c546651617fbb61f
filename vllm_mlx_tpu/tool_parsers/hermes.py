# SPDX-License-Identifier: Apache-2.0
"""Hermes-style ``<tool_call>{json}</tool_call>`` parser
(reference tool_parsers/hermes_tool_parser.py)."""

from __future__ import annotations

import json
import re
from typing import List

from .abstract_tool_parser import (
    ExtractedToolCalls,
    ToolParser,
    parse_tool_json,
    register_tool_parser,
)

_TAG_RE = re.compile(r"<tool_call>\s*(.*?)\s*</tool_call>", re.DOTALL)
_OPEN_ONLY_RE = re.compile(r"<tool_call>\s*(.*)\s*$", re.DOTALL)


@register_tool_parser("hermes")
class HermesToolParser(ToolParser):
    stream_markers = ["<tool_call>"]
    stream_incremental = True  # name + argument-fragment deltas
    stream_close_markers = ["</tool_call>"]

    def extract_tool_calls(self, text: str) -> ExtractedToolCalls:
        calls: List[dict] = []
        spans = []
        for m in _TAG_RE.finditer(text):
            try:
                obj = json.loads(m.group(1))
            except json.JSONDecodeError:
                continue
            tc = parse_tool_json(obj)
            if tc:
                calls.append(tc)
                spans.append((m.start(), m.end()))
        if not calls:
            # truncated final call (no closing tag) — best-effort repair
            m = _OPEN_ONLY_RE.search(text)
            if m:
                try:
                    obj = json.loads(m.group(1))
                    tc = parse_tool_json(obj)
                    if tc:
                        calls.append(tc)
                        spans.append((m.start(), len(text)))
                except json.JSONDecodeError:
                    pass
        if not calls:
            return ExtractedToolCalls(False, [], text)
        content = ""
        last = 0
        for a, b in spans:
            content += text[last:a]
            last = b
        content += text[last:]
        return ExtractedToolCalls(True, calls, content.strip() or None)

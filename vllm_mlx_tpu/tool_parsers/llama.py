# SPDX-License-Identifier: Apache-2.0
"""Llama 3.x tool parser: JSON dict(s) with ``parameters``, optionally
behind ``<|python_tag|>`` (reference tool_parsers/llama_tool_parser.py)."""

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

PYTHON_TAG = "<|python_tag|>"


@register_tool_parser("llama")
@register_tool_parser("llama3_json")
class LlamaToolParser(ToolParser):
    stream_markers = [PYTHON_TAG, "{"]
    stream_incremental = True  # JSON regions stream; python-tag falls back

    def extract_tool_calls(self, text: str) -> ExtractedToolCalls:
        work = text
        if PYTHON_TAG in work:
            work = work.split(PYTHON_TAG, 1)[1]
        calls: List[dict] = []
        pos = 0
        # llama emits one or more JSON dicts, ';'-separated
        while True:
            span = scan_balanced_json(work, pos)
            if span is None:
                break
            a, b = span
            try:
                obj = json.loads(work[a:b])
            except json.JSONDecodeError:
                pos = a + 1
                continue
            tc = parse_tool_json(obj)
            if tc:
                calls.append(tc)
            pos = b
        if not calls:
            return ExtractedToolCalls(False, [], text)
        prefix = text.split(PYTHON_TAG, 1)[0] if PYTHON_TAG in text else ""
        return ExtractedToolCalls(True, calls, prefix.strip() or None)

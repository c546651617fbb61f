# SPDX-License-Identifier: Apache-2.0
"""Qwen family tool parsers.

``qwen``: Hermes-style ``<tool_call>`` JSON (Qwen2.5/Qwen3 default chat
template). ``qwen3_xml``: Qwen3-Coder XML-ish
``<tool_call><function=name><parameter=key>value</parameter>...`` format
(reference tool_parsers/qwen3_xml_tool_parser.py).
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, List

from .abstract_tool_parser import (
    ExtractedToolCalls,
    ToolParser,
    make_tool_call,
    register_tool_parser,
)
from .hermes import HermesToolParser

_FN_RE = re.compile(
    r"<function=([^>\s]+)>(.*?)(?:</function>|$)", re.DOTALL
)
_PARAM_RE = re.compile(
    r"<parameter=([^>\s]+)>\s*(.*?)\s*(?:</parameter>|(?=<parameter=)|$)",
    re.DOTALL,
)


def _coerce(value: str) -> Any:
    v = value.strip()
    try:
        return json.loads(v)
    except Exception:
        return v


@register_tool_parser("qwen")
class QwenToolParser(HermesToolParser):
    pass


@register_tool_parser("qwen3_xml")
@register_tool_parser("qwen3_coder")
class Qwen3XmlToolParser(ToolParser):
    stream_markers = ["<tool_call>"]

    def extract_tool_calls(self, text: str) -> ExtractedToolCalls:
        calls: List[dict] = []
        spans = []
        for m in re.finditer(
            r"<tool_call>(.*?)(?:</tool_call>|$)", text, re.DOTALL
        ):
            body = m.group(1)
            fm = _FN_RE.search(body)
            if not fm:
                continue
            name = fm.group(1)
            params: Dict[str, Any] = {}
            for pm in _PARAM_RE.finditer(fm.group(2)):
                params[pm.group(1)] = _coerce(pm.group(2))
            calls.append(make_tool_call(name, params))
            spans.append((m.start(), m.end()))
        if not calls:
            return ExtractedToolCalls(False, [], text)
        content = ""
        last = 0
        for a, b in spans:
            content += text[last:a]
            last = b
        content += text[last:]
        return ExtractedToolCalls(True, calls, content.strip() or None)

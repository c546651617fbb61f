# SPDX-License-Identifier: Apache-2.0
"""GPT-OSS harmony channel tool parser (reference
tool_parsers/harmony_tool_parser.py).

Harmony tool calls appear on the commentary channel addressed to a
function recipient:

  <|channel|>commentary to=functions.NAME <|constrain|>json<|message|>
  {"arg": ...}<|call|>

Final user-visible text lives on the final channel; analysis-channel
content is reasoning (handled by the harmony reasoning parser).
"""

from __future__ import annotations

import json
import re
from typing import List

from .abstract_tool_parser import (
    ExtractedToolCalls,
    ToolParser,
    make_tool_call,
    register_tool_parser,
)

_CALL_RE = re.compile(
    r"<\|channel\|>commentary to=functions\.([\w\-\.]+).*?<\|message\|>"
    r"(.*?)(?:<\|call\|>|<\|end\|>|$)",
    re.DOTALL,
)
_FINAL_RE = re.compile(
    r"<\|channel\|>final<\|message\|>(.*?)(?:<\|end\|>|<\|return\|>|$)",
    re.DOTALL,
)


@register_tool_parser("harmony")
@register_tool_parser("gpt_oss")
@register_tool_parser("openai")
class HarmonyToolParser(ToolParser):
    stream_markers = ["<|channel|>"]

    def extract_tool_calls(self, text: str) -> ExtractedToolCalls:
        calls: List[dict] = []
        for m in _CALL_RE.finditer(text):
            try:
                args = json.loads(m.group(2).strip())
            except json.JSONDecodeError:
                continue
            calls.append(make_tool_call(m.group(1), args))
        finals = _FINAL_RE.findall(text)
        content = "".join(finals).strip() if finals else None
        if not calls:
            if "<|channel|>" in text:
                return ExtractedToolCalls(False, [], content or "")
            return ExtractedToolCalls(False, [], text)
        return ExtractedToolCalls(True, calls, content)

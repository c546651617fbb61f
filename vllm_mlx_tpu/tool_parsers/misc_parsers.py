# SPDX-License-Identifier: Apache-2.0
"""Additional model-family tool parsers (reference tool_parsers/:
deepseek, granite, xlam, nemotron, minimax, glm47, kimi, gemma,
functionary)."""

from __future__ import annotations

import json
import re
from typing import List

from .abstract_tool_parser import (
    ExtractedToolCalls,
    ToolParser,
    make_tool_call,
    parse_tool_json,
    register_tool_parser,
    scan_balanced_json,
)
from .hermes import HermesToolParser
from .json_parser import JsonToolParser


def _collect_json_list(text: str) -> List[dict]:
    """All tool calls found in a chunk of text containing JSON value(s)."""
    calls: List[dict] = []
    pos = 0
    while True:
        span = scan_balanced_json(text, pos)
        if span is None:
            break
        a, b = span
        try:
            val = json.loads(text[a:b])
        except json.JSONDecodeError:
            pos = a + 1
            continue
        vals = val if isinstance(val, list) else [val]
        for v in vals:
            tc = parse_tool_json(v)
            if tc:
                calls.append(tc)
        pos = b
    return calls


class _MarkerJsonParser(ToolParser):
    """Tool calls = JSON after a literal marker (optionally closed)."""

    marker = ""
    end_marker = ""

    @property
    def stream_markers(self):  # type: ignore[override]
        return [self.marker]

    def extract_tool_calls(self, text: str) -> ExtractedToolCalls:
        if self.marker not in text:
            return ExtractedToolCalls(False, [], text)
        before, after = text.split(self.marker, 1)
        if self.end_marker and self.end_marker in after:
            body, tail = after.split(self.end_marker, 1)
        else:
            body, tail = after, ""
        calls = _collect_json_list(body)
        if not calls:
            return ExtractedToolCalls(False, [], text)
        content = (before + tail).strip()
        return ExtractedToolCalls(True, calls, content or None)


@register_tool_parser("granite")
class GraniteToolParser(_MarkerJsonParser):
    """IBM Granite: ``<|tool_call|>[{...}]`` (or '<tool_call>' variants)."""

    marker = "<|tool_call|>"

    def extract_tool_calls(self, text: str) -> ExtractedToolCalls:
        r = super().extract_tool_calls(text)
        if r.tools_called:
            return r
        # granite sometimes emits a bare JSON list of calls
        stripped = text.strip()
        if stripped.startswith("["):
            calls = _collect_json_list(stripped)
            if calls:
                return ExtractedToolCalls(True, calls, None)
        return ExtractedToolCalls(False, [], text)


@register_tool_parser("nemotron")
class NemotronToolParser(_MarkerJsonParser):
    """Nemotron: ``<TOOLCALL>[{...}]</TOOLCALL>``."""

    marker = "<TOOLCALL>"
    end_marker = "</TOOLCALL>"


@register_tool_parser("minimax")
class MinimaxToolParser(_MarkerJsonParser):
    """MiniMax: ``<tool_calls>\\n{...}\\n{...}\\n</tool_calls>``."""

    marker = "<tool_calls>"
    end_marker = "</tool_calls>"


@register_tool_parser("xlam")
class XlamToolParser(ToolParser):
    """Salesforce xLAM: the whole response is a JSON list of calls."""

    stream_markers = ["[", "{"]

    def extract_tool_calls(self, text: str) -> ExtractedToolCalls:
        stripped = text.strip()
        if stripped.startswith("```"):
            stripped = re.sub(r"^```\w*\n?|```$", "", stripped).strip()
        if not stripped.startswith(("[", "{")):
            return ExtractedToolCalls(False, [], text)
        calls = _collect_json_list(stripped)
        if calls:
            return ExtractedToolCalls(True, calls, None)
        return ExtractedToolCalls(False, [], text)


_DS_CALL_RE = re.compile(
    r"<｜tool▁call▁begin｜>(\w+)<｜tool▁sep｜>([^\n<]+)\n"
    r"```json\n(.*?)\n```<｜tool▁call▁end｜>",
    re.DOTALL,
)


@register_tool_parser("deepseek")
@register_tool_parser("deepseek_v3")
class DeepseekToolParser(ToolParser):
    """DeepSeek V3: unicode-marker blocks with fenced JSON arguments."""

    stream_markers = ["<｜tool▁calls▁begin｜>", "<｜tool▁call▁begin｜>"]

    def extract_tool_calls(self, text: str) -> ExtractedToolCalls:
        calls = []
        for m in _DS_CALL_RE.finditer(text):
            name = m.group(2).strip()
            try:
                args = json.loads(m.group(3))
            except json.JSONDecodeError:
                continue
            calls.append(make_tool_call(name, args))
        if not calls:
            return ExtractedToolCalls(False, [], text)
        content = text.split("<｜tool▁calls▁begin｜>", 1)[0].strip()
        return ExtractedToolCalls(True, calls, content or None)


@register_tool_parser("kimi")
@register_tool_parser("kimi_k2")
class KimiToolParser(ToolParser):
    """Kimi K2: section markers with ``functions.name:idx`` headers."""

    stream_markers = ["<|tool_calls_section_begin|>", "<|tool_call_begin|>"]
    _RE = re.compile(
        r"<\|tool_call_begin\|>\s*functions\.([\w\-\.]+):\d+\s*"
        r"<\|tool_call_argument_begin\|>(.*?)<\|tool_call_end\|>",
        re.DOTALL,
    )

    def extract_tool_calls(self, text: str) -> ExtractedToolCalls:
        calls = []
        for m in self._RE.finditer(text):
            try:
                args = json.loads(m.group(2))
            except json.JSONDecodeError:
                continue
            calls.append(make_tool_call(m.group(1), args))
        if not calls:
            return ExtractedToolCalls(False, [], text)
        content = text.split("<|tool_calls_section_begin|>", 1)[0].strip()
        return ExtractedToolCalls(True, calls, content or None)


@register_tool_parser("glm47")
@register_tool_parser("glm4")
class GlmToolParser(ToolParser):
    """GLM-4.x: ``<tool_call>name\\n<arg_key>k</arg_key><arg_value>v</arg_value>``.

    The Poolside Laguna template uses the same XML framing with
    schema-aware string handling — see tool_parsers/poolside.py."""

    stream_markers = ["<tool_call>"]
    _BLOCK_RE = re.compile(
        r"<tool_call>\s*([\w\-\.]+)\s*(.*?)(?:</tool_call>|$)", re.DOTALL
    )
    _ARG_RE = re.compile(
        r"<arg_key>(.*?)</arg_key>\s*<arg_value>(.*?)</arg_value>",
        re.DOTALL,
    )

    def extract_tool_calls(self, text: str) -> ExtractedToolCalls:
        calls = []
        spans = []
        for m in self._BLOCK_RE.finditer(text):
            body = m.group(2)
            if body.strip().startswith("{"):
                continue  # hermes-style; other parser's job
            args = {}
            for am in self._ARG_RE.finditer(body):
                key = am.group(1).strip()
                val = am.group(2).strip()
                try:
                    args[key] = json.loads(val)
                except json.JSONDecodeError:
                    args[key] = val
            calls.append(make_tool_call(m.group(1), args))
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


@register_tool_parser("gemma")
@register_tool_parser("gemma4")
class GemmaToolParser(JsonToolParser):
    """Gemma: fenced ```tool_code / JSON blocks (JSON superset parser)."""


@register_tool_parser("functionary")
class FunctionaryToolParser(ToolParser):
    """Functionary v2: ``name\\n{json}`` segments split by <|from|> or >>>."""

    stream_markers = [">>>"]
    _SEG_RE = re.compile(r">>>([\w\-\.]+)\n(\{.*?\})(?=>>>|$)", re.DOTALL)

    def extract_tool_calls(self, text: str) -> ExtractedToolCalls:
        calls = []
        for m in self._SEG_RE.finditer(text):
            name = m.group(1)
            if name == "all":
                continue
            try:
                args = json.loads(m.group(2))
            except json.JSONDecodeError:
                continue
            calls.append(make_tool_call(name, args))
        if not calls:
            return ExtractedToolCalls(False, [], text)
        prefix = text.split(">>>", 1)[0]
        # ">>>all" segments carry user-visible content
        content_parts = [prefix]
        for m in re.finditer(r">>>all\n(.*?)(?=>>>|$)", text, re.DOTALL):
            content_parts.append(m.group(1))
        content = "".join(content_parts).strip()
        return ExtractedToolCalls(True, calls, content or None)

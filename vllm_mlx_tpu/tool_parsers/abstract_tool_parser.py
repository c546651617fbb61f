# SPDX-License-Identifier: Apache-2.0
"""Tool parser base class, registry, and buffered streaming state."""

from __future__ import annotations

import json
import logging
import re
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple, Type

logger = logging.getLogger(__name__)


@dataclass
class ExtractedToolCalls:
    tools_called: bool = False
    tool_calls: List[Dict[str, Any]] = field(default_factory=list)
    content: Optional[str] = None


def make_tool_call(name: str, arguments: Any) -> Dict[str, Any]:
    if not isinstance(arguments, str):
        arguments = json.dumps(arguments, ensure_ascii=False)
    return {
        "id": f"call_{uuid.uuid4().hex[:24]}",
        "type": "function",
        "function": {"name": name, "arguments": arguments},
    }


def scan_balanced_json(text: str, start: int) -> Optional[Tuple[int, int]]:
    """Find the span of a balanced JSON object/array starting at or after
    ``start``. Returns (begin, end_exclusive) or None.

    String-aware balanced scanning (the reference does the same to pull
    tool JSON out of free text, reference api/tool_calling.py:459-584).
    """
    begin = -1
    for i in range(start, len(text)):
        if text[i] in "{[":
            begin = i
            break
    if begin == -1:
        return None
    stack = []
    in_str = False
    esc = False
    for i in range(begin, len(text)):
        c = text[i]
        if in_str:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
            continue
        if c == '"':
            in_str = True
        elif c in "{[":
            stack.append(c)
        elif c in "}]":
            if not stack:
                return None
            opener = stack.pop()
            if (opener == "{" and c != "}") or (opener == "[" and c != "]"):
                return None
            if not stack:
                return begin, i + 1
    return None


def parse_tool_json(obj: Any) -> Optional[Dict[str, Any]]:
    """Normalize a parsed JSON value into an OpenAI tool call, accepting
    the common key variants ({name, arguments|parameters|input})."""
    if not isinstance(obj, dict):
        return None
    name = obj.get("name")
    if not name or not isinstance(name, str):
        fn = obj.get("function")
        if isinstance(fn, dict) and isinstance(fn.get("name"), str):
            name = fn["name"]
            obj = fn
        else:
            return None
    args = None
    for key in ("arguments", "parameters", "input", "args"):
        if key in obj:
            args = obj[key]
            break
    if args is None:
        args = {}
    if isinstance(args, str):
        try:
            args = json.loads(args)
        except json.JSONDecodeError:
            pass
    return make_tool_call(name, args)


class ToolParserStreamState:
    """Buffered streaming: pass content through until a tool-call marker
    might be starting, then buffer; parse everything at flush.

    ``markers`` are literal strings that introduce a tool-call region.
    """

    def __init__(self, parser: "ToolParser", markers: List[str]) -> None:
        self.parser = parser
        self.markers = markers
        self.buffer = ""
        self.capturing = False
        self._content_sent = ""

    def _possible_marker_suffix(self, text: str) -> int:
        """Length of the longest suffix of ``text`` that is a strict
        prefix of any marker (must be held back)."""
        best = 0
        for m in self.markers:
            for k in range(1, min(len(m), len(text)) + 1):
                if text.endswith(m[:k]):
                    best = max(best, k)
        return best

    def feed(self, text: str) -> List[Dict[str, Any]]:
        """Returns OpenAI delta dicts to emit ({"content": ...} or
        {"tool_calls": [...]})."""
        self.buffer += text
        if self.capturing:
            return []
        for m in self.markers:
            idx = self.buffer.find(m)
            if idx != -1:
                emit = self.buffer[:idx]
                self.capturing = True
                self.buffer = self.buffer[idx:]
                out = []
                if emit:
                    self._content_sent += emit
                    out.append({"content": emit})
                return out
        hold = self._possible_marker_suffix(self.buffer)
        emit = self.buffer[: len(self.buffer) - hold] if hold else self.buffer
        self.buffer = self.buffer[len(self.buffer) - hold:] if hold else ""
        if emit:
            self._content_sent += emit
            return [{"content": emit}]
        return []

    def flush(self) -> List[Dict[str, Any]]:
        out: List[Dict[str, Any]] = []
        if self.capturing and self.buffer:
            parsed = self.parser.extract_tool_calls(self.buffer)
            if parsed.tools_called:
                deltas = []
                for i, tc in enumerate(parsed.tool_calls):
                    deltas.append(
                        {
                            "tool_calls": [
                                {
                                    "index": i,
                                    "id": tc["id"],
                                    "type": "function",
                                    "function": tc["function"],
                                }
                            ]
                        }
                    )
                if parsed.content:
                    out.append({"content": parsed.content})
                out.extend(deltas)
            elif self.buffer:
                out.append({"content": self.buffer})
        elif self.buffer:
            out.append({"content": self.buffer})
        self.buffer = ""
        return out


class ToolParser:
    """Base parser: whole-text extraction + streaming state factory."""

    name = "base"
    stream_markers: List[str] = []

    def __init__(self, tokenizer=None) -> None:
        self.tokenizer = tokenizer

    def extract_tool_calls(self, text: str) -> ExtractedToolCalls:
        raise NotImplementedError

    def make_stream_state(self) -> ToolParserStreamState:
        return ToolParserStreamState(self, self.stream_markers)

    def adjust_request_prompt(self, prompt: str) -> str:
        return prompt


_REGISTRY: Dict[str, Type[ToolParser]] = {}


def register_tool_parser(name: str) -> Callable[[Type[ToolParser]], Type[ToolParser]]:
    def deco(cls: Type[ToolParser]) -> Type[ToolParser]:
        _REGISTRY[name] = cls
        cls.name = name
        return cls

    return deco


def get_tool_parser(name: str, tokenizer=None) -> ToolParser:
    if name not in _REGISTRY:
        logger.warning("unknown tool parser %r; using 'auto'", name)
        name = "auto"
    return _REGISTRY[name](tokenizer)


def list_tool_parsers() -> List[str]:
    return sorted(_REGISTRY)

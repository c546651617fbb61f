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


class Qwen3XmlStreamState:
    """Parameter-granular streaming for the Qwen3-Coder XML format
    (reference tool_parsers/qwen3_xml_tool_parser.py streams the same
    way): ``function.name`` goes out when ``<function=...>`` closes,
    then one arguments-JSON fragment per completed ``<parameter=...>``
    (values need coercion, so a parameter can only be typed once its
    end tag arrives), then the closing ``}``.

    Fragments concatenate to the exact arguments JSON of the buffered
    parse.
    """

    def __init__(self, parser: "Qwen3XmlToolParser") -> None:
        self.parser = parser
        self.buffer = ""
        self.capturing = False
        self.tool_index = 0
        self._pos = 0
        self._phase = "seek_call"  # seek_call|seek_function|params
        self._nparams = 0
        self._call_open = False

    def _delta_start(self, name: str):
        import uuid as _uuid

        return {
            "tool_calls": [
                {
                    "index": self.tool_index,
                    "id": f"call_{_uuid.uuid4().hex[:24]}",
                    "type": "function",
                    "function": {"name": name, "arguments": ""},
                }
            ]
        }

    def _delta_args(self, fragment: str):
        return {
            "tool_calls": [
                {
                    "index": self.tool_index,
                    "function": {"arguments": fragment},
                }
            ]
        }

    def feed(self, text: str):
        self.buffer += text
        out = []
        if not self.capturing:
            idx = self.buffer.find("<tool_call>")
            if idx == -1:
                # hold back a possible marker prefix, stream the rest
                hold = 0
                for k in range(1, min(len("<tool_call>"), len(self.buffer)) + 1):
                    if self.buffer.endswith("<tool_call>"[:k]):
                        hold = k
                        break
                emit = self.buffer[: len(self.buffer) - hold]
                self.buffer = self.buffer[len(self.buffer) - hold:]
                return [{"content": emit}] if emit else []
            if idx:
                out.append({"content": self.buffer[:idx]})
            self.buffer = self.buffer[idx:]
            self.capturing = True
            self._pos = 0
        out.extend(self._drive(final=False))
        return out

    def _drive(self, final: bool):
        out = []
        b = self.buffer
        while True:
            if self._phase == "seek_call":
                idx = b.find("<tool_call>", self._pos)
                if idx == -1:
                    return out
                self._pos = idx + len("<tool_call>")
                self._phase = "seek_function"
            if self._phase == "seek_function":
                m = re.compile(r"<function=([^>\s]+)>").search(b, self._pos)
                if not m:
                    return out
                out.append(self._delta_start(m.group(1)))
                self._call_open = True
                self._nparams = 0
                self._pos = m.end()
                self._phase = "params"
            if self._phase == "params":
                m = re.compile(r"<parameter=([^>\s]+)>").search(b, self._pos)
                endf = b.find("</function>", self._pos)
                if m and (endf == -1 or m.start() < endf):
                    # need the parameter's END before typing its value
                    nxt = re.compile(
                        r"</parameter>|<parameter=|</function>"
                    ).search(b, m.end())
                    if not nxt:
                        if not final:
                            return out
                        val = b[m.end():].strip()
                    else:
                        val = b[m.end(): nxt.start()].strip()
                        if nxt.group(0) == "</parameter>":
                            self._pos = nxt.end()
                        else:
                            self._pos = nxt.start()
                    prefix = "{" if self._nparams == 0 else ", "
                    frag = (
                        f"{prefix}{json.dumps(m.group(1))}: "
                        f"{json.dumps(_coerce(val), ensure_ascii=False)}"
                    )
                    out.append(self._delta_args(frag))
                    self._nparams += 1
                    if not nxt:  # truncated stream: close on the loop
                        self._pos = len(b)
                    continue
                if endf != -1 or final:
                    frag = "{}" if self._nparams == 0 else "}"
                    out.append(self._delta_args(frag))
                    self.tool_index += 1
                    self._call_open = False
                    self._pos = (
                        endf + len("</function>") if endf != -1 else len(b)
                    )
                    self._phase = "seek_call"
                    continue
                return out

    def flush(self):
        out = self._drive(final=bool(self.capturing and self._call_open))
        if self.capturing and self.tool_index == 0 and not self._call_open:
            # marker appeared but no function parsed: emit as content
            if self.buffer:
                out.append({"content": self.buffer})
        self.buffer = ""
        return out


@register_tool_parser("qwen3_xml")
@register_tool_parser("qwen3_coder")
class Qwen3XmlToolParser(ToolParser):
    stream_markers = ["<tool_call>"]

    def make_stream_state(self):
        return Qwen3XmlStreamState(self)

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

# SPDX-License-Identifier: Apache-2.0
"""Poolside v1 (Laguna chat template) tool parser.

Format (reference tool_parsers/poolside_v1_tool_parser.py:34-356 — a
glm47 subclass): ``<tool_call>name\n<arg_key>k</arg_key>
<arg_value>v</arg_value>...</tool_call>``. What distinguishes it from
plain GLM-4.7 parsing:

  * schema awareness: argument values whose parameter is declared
    ``"type": "string"`` in the request's tool schema are taken RAW
    (never JSON-deserialized), every other value is coerced;
  * tool names are validated against the request's tools — calls to
    undeclared names are rejected wholesale;
  * string argument values stream INCREMENTALLY (JSON-escaped
    fragments inside an open ``"..."``), non-string values only once
    their ``</arg_value>`` closes;
  * an unclosed trailing ``<tool_call>`` is stripped from content.
"""

from __future__ import annotations

import json
import re
import uuid
from typing import Any, Dict, List, Optional, Set

from .abstract_tool_parser import (
    ExtractedToolCalls,
    register_tool_parser,
)
from .misc_parsers import GlmToolParser

_START = "<tool_call>"
_END = "</tool_call>"
_KEY_START = "<arg_key>"
_KEY_END = "</arg_key>"
_VALUE_START = "<arg_value>"
_VALUE_END = "</arg_value>"

_UNCLOSED_RE = re.compile(r"<tool_call>.*$", re.DOTALL)
_BLOCK_RE = re.compile(
    r"<tool_call>\s*([^\n<]+?)\s*(?:\n|(?=<))(.*?)</tool_call>",
    re.DOTALL,
)
_ARG_RE = re.compile(
    r"<arg_key>(.*?)</arg_key>\s*<arg_value>(.*?)</arg_value>", re.DOTALL
)


def _deserialize(raw: str) -> Any:
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        return raw


def _escape(value: str) -> str:
    """JSON-escape string content without the surrounding quotes."""
    return json.dumps(value, ensure_ascii=False)[1:-1]


def _hold_partial_suffix(buffer: str, marker: str):
    """Split off a trailing strict-prefix of ``marker`` (held back until
    the next chunk disambiguates it)."""
    for size in range(min(len(marker) - 1, len(buffer)), 0, -1):
        if buffer.endswith(marker[:size]):
            return buffer[:-size], buffer[-size:]
    return buffer, ""


@register_tool_parser("poolside_v1")
@register_tool_parser("poolside")
class PoolsideV1ToolParser(GlmToolParser):
    stream_markers = [_START]

    def __init__(self, tokenizer=None) -> None:
        super().__init__(tokenizer)
        self.tools: Optional[List[dict]] = None

    def set_tools(self, tools) -> None:
        self.tools = list(tools) if tools else None

    # -- schema helpers ------------------------------------------------
    def _valid_names(self) -> Set[str]:
        names: Set[str] = set()
        for tool in self.tools or []:
            if not isinstance(tool, dict):
                continue
            fn = tool.get("function", tool)
            if isinstance(fn, dict) and isinstance(fn.get("name"), str):
                names.add(fn["name"])
        return names

    def _string_params(self, tool_name: str) -> Set[str]:
        for tool in self.tools or []:
            if not isinstance(tool, dict):
                continue
            fn = tool.get("function", tool)
            if not isinstance(fn, dict) or fn.get("name") != tool_name:
                continue
            params = fn.get("parameters")
            props = (
                params.get("properties", {})
                if isinstance(params, dict)
                else {}
            )
            return {
                k
                for k, schema in props.items()
                if isinstance(schema, dict)
                and schema.get("type") == "string"
            }
        return set()

    # -- whole-text extraction ------------------------------------------
    def extract_tool_calls(self, text: str) -> ExtractedToolCalls:
        valid = self._valid_names()
        calls: List[Dict[str, Any]] = []
        for m in _BLOCK_RE.finditer(text):
            name = m.group(1).strip().split("\n")[0].strip()
            if not name or (valid and name not in valid):
                continue
            string_params = self._string_params(name)
            args: Dict[str, Any] = {}
            for am in _ARG_RE.findall(m.group(2) or ""):
                key = am[0].strip()
                if not key or key in args:
                    continue
                raw = am[1]
                args[key] = (
                    raw if key in string_params
                    else _deserialize(raw.strip())
                )
            calls.append(
                {
                    "id": f"call_{uuid.uuid4().hex[:24]}",
                    "type": "function",
                    "function": {
                        "name": name,
                        "arguments": json.dumps(args, ensure_ascii=False),
                    },
                }
            )
        marker = text.find(_START)
        content = text[:marker] if marker >= 0 else text
        content = content.strip() or None
        if calls:
            return ExtractedToolCalls(True, calls, content)
        if marker >= 0:
            # no complete valid call: suppress the unclosed region
            content = _UNCLOSED_RE.sub("", text).strip() or None
        return ExtractedToolCalls(False, [], content)

    def make_stream_state(self):
        return PoolsideStreamState(self)


class PoolsideStreamState:
    """Streaming state machine mirroring the reference semantics:
    content passes through until ``<tool_call>``; the name delta goes
    out once a newline/``<arg_key>``/``</tool_call>`` terminates it;
    schema-declared string values stream as escaped fragments inside an
    open quote; other values emit once closed; ``</tool_call>`` closes
    the arguments object."""

    def __init__(self, parser: PoolsideV1ToolParser) -> None:
        self.parser = parser
        self.buffer = ""
        self.capturing = False  # inside a <tool_call> region
        self.tool_index = -1
        self._ids: List[str] = []
        self._args_started: List[bool] = []
        self._seen_keys: List[Set[str]] = []
        self._name: Optional[str] = None
        self._pending_key: Optional[str] = None
        self._streaming_string = False
        self._reject = False

    # -- delta builders -------------------------------------------------
    def _delta(self, out, *, name=None, arguments=""):
        if self._reject:
            return
        for d in out:
            tcs = d.get("tool_calls")
            if tcs and tcs[0]["index"] == self.tool_index:
                if name is not None:
                    tcs[0]["function"]["name"] = name
                tcs[0]["function"]["arguments"] += arguments
                return
        entry = {
            "index": self.tool_index,
            "id": self._ids[self.tool_index],
            "type": "function",
            "function": {"arguments": arguments},
        }
        if name is not None:
            entry["function"]["name"] = name
        out.append({"tool_calls": [entry]})

    def _begin_call(self):
        self.tool_index += 1
        self._ids.append(f"call_{uuid.uuid4().hex[:24]}")
        self._args_started.append(False)
        self._seen_keys.append(set())
        self.capturing = True
        self._name = None
        self._pending_key = None
        self._streaming_string = False
        self._reject = False

    def _finish_call(self):
        self.capturing = False
        self._name = None
        self._pending_key = None
        self._streaming_string = False
        self._reject = False

    def _discard_through_end(self) -> bool:
        end = self.buffer.find(_END)
        if end < 0:
            return False
        self.buffer = self.buffer[end + len(_END):]
        self._finish_call()
        return True

    def _arg_prefix(self, key: str) -> Optional[str]:
        seen = self._seen_keys[self.tool_index]
        if not key or key in seen:
            return None
        seen.add(key)
        sep = "{" if not self._args_started[self.tool_index] else ", "
        self._args_started[self.tool_index] = True
        return sep + json.dumps(key, ensure_ascii=False) + ": "

    # -- state steps (each returns keep_going) ---------------------------
    def _step_text(self, out) -> bool:
        start = self.buffer.find(_START)
        if start < 0:
            emitted, self.buffer = _hold_partial_suffix(
                self.buffer, _START
            )
            if emitted:
                out.append({"content": emitted})
            return False
        content = self.buffer[:start]
        if content:
            out.append({"content": content})
        self.buffer = self.buffer[start + len(_START):]
        self._begin_call()
        return True

    def _step_name(self, out) -> bool:
        positions = [
            p
            for p in (
                self.buffer.find("\n"),
                self.buffer.find(_KEY_START),
                self.buffer.find(_END),
            )
            if p >= 0
        ]
        if not positions:
            return False
        cut = min(positions)
        name = self.buffer[:cut].strip()
        if self.buffer.startswith("\n", cut):
            self.buffer = self.buffer[cut + 1:]
        else:
            self.buffer = self.buffer[cut:]
        valid = self.parser._valid_names()
        if not name or (valid and name not in valid):
            self._reject = True
            return self._discard_through_end()
        self._name = name
        self._delta(out, name=name)
        return True

    def _step_string_value(self, out) -> bool:
        end = self.buffer.find(_VALUE_END)
        if end >= 0:
            frag = _escape(self.buffer[:end])
            self.buffer = self.buffer[end + len(_VALUE_END):]
            self._delta(out, arguments=frag + '"')
            self._streaming_string = False
            self._pending_key = None
            return True
        if _END in self.buffer:
            self._reject = True
            return self._discard_through_end()
        emitted, self.buffer = _hold_partial_suffix(
            self.buffer, _VALUE_END
        )
        if emitted:
            self._delta(out, arguments=_escape(emitted))
        return False

    def _step_pending_key(self, out) -> bool:
        vstart = self.buffer.find(_VALUE_START)
        if vstart < 0:
            if _END in self.buffer:
                self._reject = True
                return self._discard_through_end()
            return False
        self.buffer = self.buffer[vstart + len(_VALUE_START):]
        key = (self._pending_key or "").strip()
        prefix = self._arg_prefix(key)
        if prefix is None:  # duplicate/empty key: skip its value
            self._pending_key = None
            return True
        if key in self.parser._string_params(self._name or ""):
            self._delta(out, arguments=prefix + '"')
            self._streaming_string = True
            return True
        vend = self.buffer.find(_VALUE_END)
        if vend < 0:
            # un-consume: need the whole value before coercion
            self.buffer = _VALUE_START + self.buffer
            self._seen_keys[self.tool_index].discard(key)
            self._args_started[self.tool_index] = (
                len(self._seen_keys[self.tool_index]) > 0
            )
            return False
        raw = self.buffer[:vend].strip()
        self.buffer = self.buffer[vend + len(_VALUE_END):]
        self._pending_key = None
        self._delta(
            out,
            arguments=prefix
            + json.dumps(_deserialize(raw), ensure_ascii=False),
        )
        return True

    def _step_body(self, out) -> bool:
        end = self.buffer.find(_END)
        kstart = self.buffer.find(_KEY_START)
        if end >= 0 and (kstart < 0 or end < kstart):
            self.buffer = self.buffer[end + len(_END):]
            if self._args_started[self.tool_index]:
                self._delta(out, arguments="}")
            else:
                self._delta(out, arguments="{}")
            self._finish_call()
            return True
        if kstart < 0:
            return False
        self.buffer = self.buffer[kstart + len(_KEY_START):]
        kend = self.buffer.find(_KEY_END)
        if kend < 0:
            self.buffer = _KEY_START + self.buffer
            return False
        self._pending_key = self.buffer[:kend]
        self.buffer = self.buffer[kend + len(_KEY_END):]
        return True

    def feed(self, text: str) -> List[Dict[str, Any]]:
        self.buffer += text
        out: List[Dict[str, Any]] = []
        while True:
            if not self.capturing:
                keep = self._step_text(out)
            elif self._name is None:
                keep = self._step_name(out)
            elif self._streaming_string:
                keep = self._step_string_value(out)
            elif self._pending_key is not None:
                keep = self._step_pending_key(out)
            else:
                keep = self._step_body(out)
            if not keep:
                return out

    def flush(self) -> List[Dict[str, Any]]:
        out = self.feed("")
        if self.capturing and self._streaming_string:
            # truncated mid string value: close the JSON string
            self._delta(out, arguments='"')
        if self.capturing and self.tool_index >= 0 and not self._reject:
            if self._name is not None:
                if self._args_started[self.tool_index]:
                    self._delta(out, arguments="}")
                else:
                    self._delta(out, arguments="{}")
        self.buffer = ""
        self.capturing = False
        return out

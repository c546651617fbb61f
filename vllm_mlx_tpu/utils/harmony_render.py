# SPDX-License-Identifier: Apache-2.0
"""Canonical Harmony prompt rendering for GPT-OSS serving (reference
utils/harmony_render.py:217).

GPT-OSS models are trained on the Harmony chat format:

    <|start|>system<|message|>...<|end|>
    <|start|>developer<|message|># Instructions ... # Tools ...<|end|>
    <|start|>user<|message|>...<|end|>
    <|start|>assistant<|channel|>final<|message|>...<|end|>

Rendering it OURSELVES (instead of trusting whatever chat template a
checkpoint ships) buys two things: byte-stable prompts for the prefix
cache (the date line is pinned, tool schemas render deterministically
with sorted keys), and correct channel framing for the harmony
tool/reasoning parsers. Tools render in the TypeScript-namespace style
Harmony uses."""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

DEFAULT_MODEL_IDENTITY = (
    "You are ChatGPT, a large language model trained by OpenAI."
)
DEFAULT_KNOWLEDGE_CUTOFF = "2024-06"
# pinned by default: a live date in the system prompt would break
# byte-stable prefix caching across days (reference
# api/prompt_canonicalize.py motivation)
DEFAULT_CURRENT_DATE = "2025-01-01"


def _ts_type(schema: Dict[str, Any]) -> str:
    """JSON schema -> TypeScript-ish type (Harmony tool rendering)."""
    if not isinstance(schema, dict):
        return "any"
    if "enum" in schema:
        return " | ".join(json.dumps(v) for v in schema["enum"])
    t = schema.get("type")
    if t == "string":
        return "string"
    if t in ("number", "integer"):
        return "number"
    if t == "boolean":
        return "boolean"
    if t == "array":
        return f"{_ts_type(schema.get('items', {}))}[]"
    if t == "object" or "properties" in schema:
        props = schema.get("properties") or {}
        required = set(schema.get("required") or [])
        parts = []
        for name in sorted(props):
            p = props[name]
            opt = "" if name in required else "?"
            desc = p.get("description")
            line = ""
            if desc:
                line += f"// {desc}\n"
            line += f"{name}{opt}: {_ts_type(p)},"
            parts.append(line)
        inner = "\n".join(parts)
        return "{\n" + inner + "\n}" if inner else "object"
    return "any"


def render_tools_namespace(tools: List[Dict[str, Any]]) -> str:
    """OpenAI tools -> Harmony ``namespace functions`` block."""
    lines = ["## functions", "", "namespace functions {", ""]
    for t in tools:
        fn = t.get("function", t)
        name = fn.get("name", "")
        desc = fn.get("description") or ""
        params = fn.get("parameters") or {}
        if desc:
            for dline in desc.strip().splitlines():
                lines.append(f"// {dline}")
        if params.get("properties"):
            lines.append(
                f"type {name} = (_: {_ts_type(params)}) => any;"
            )
        else:
            lines.append(f"type {name} = () => any;")
        lines.append("")
    lines.append("} // namespace functions")
    return "\n".join(lines)


def render_harmony_prompt(
    messages: List[Dict[str, Any]],
    tools: Optional[List[Dict[str, Any]]] = None,
    *,
    reasoning_effort: str = "medium",
    model_identity: str = DEFAULT_MODEL_IDENTITY,
    knowledge_cutoff: str = DEFAULT_KNOWLEDGE_CUTOFF,
    current_date: Optional[str] = DEFAULT_CURRENT_DATE,
    add_generation_prompt: bool = True,
) -> str:
    """Messages (OpenAI chat format) -> canonical Harmony prompt."""
    sys_lines = [model_identity, f"Knowledge cutoff: {knowledge_cutoff}"]
    if current_date:
        sys_lines.append(f"Current date: {current_date}")
    sys_lines.append("")
    sys_lines.append(f"Reasoning: {reasoning_effort}")
    sys_lines.append("")
    sys_lines.append(
        "# Valid channels: analysis, commentary, final. "
        "Channel must be included for every message."
    )
    if tools:
        sys_lines.append(
            "Calls to these tools must go to the commentary channel: "
            "'functions'."
        )
    out = [f"<|start|>system<|message|>{chr(10).join(sys_lines)}<|end|>"]

    dev_sections = []
    system_content = "\n\n".join(
        _content_text(m) for m in messages if m.get("role") == "system"
    ).strip()
    if system_content:
        dev_sections.append("# Instructions\n\n" + system_content)
    if tools:
        dev_sections.append("# Tools\n\n" + render_tools_namespace(tools))
    if dev_sections:
        out.append(
            "<|start|>developer<|message|>"
            + "\n\n".join(dev_sections)
            + "<|end|>"
        )

    for m in messages:
        role = m.get("role")
        if role == "system":
            continue
        text = _content_text(m)
        if role == "user":
            out.append(f"<|start|>user<|message|>{text}<|end|>")
        elif role == "assistant":
            if m.get("tool_calls"):
                for tc in m["tool_calls"]:
                    fn = tc.get("function", {})
                    out.append(
                        "<|start|>assistant<|channel|>commentary "
                        f"to=functions.{fn.get('name', '')} "
                        "<|constrain|>json<|message|>"
                        f"{fn.get('arguments', '{}')}<|call|>"
                    )
            if text:
                out.append(
                    "<|start|>assistant<|channel|>final"
                    f"<|message|>{text}<|end|>"
                )
        elif role == "tool":
            name = m.get("name", "")
            out.append(
                f"<|start|>functions.{name} to=assistant"
                f"<|channel|>commentary<|message|>{text}<|end|>"
            )
    if add_generation_prompt:
        out.append("<|start|>assistant")
    return "".join(out)


def _content_text(m: Dict[str, Any]) -> str:
    c = m.get("content")
    if isinstance(c, str):
        return c
    if isinstance(c, list):
        return "".join(
            p.get("text", "")
            for p in c
            if isinstance(p, dict) and p.get("type") == "text"
        )
    return "" if c is None else str(c)

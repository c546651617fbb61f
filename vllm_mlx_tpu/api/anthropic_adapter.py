# SPDX-License-Identifier: Apache-2.0
"""Anthropic <-> OpenAI message conversion.

Parity with the reference adapter (reference api/anthropic_adapter.py:31
``anthropic_to_openai``, :102 ``openai_to_anthropic``, content-block/
tool/stop-reason mapping :165-320), written against the two public API
shapes.
"""

from __future__ import annotations

import json
import uuid
from typing import Any, Dict, List, Optional, Tuple

from .anthropic_models import AnthropicMessagesRequest


def _flatten_system(system: Any) -> Optional[str]:
    if system is None:
        return None
    if isinstance(system, str):
        return system
    parts = []
    for block in system:
        if isinstance(block, dict) and block.get("type") == "text":
            parts.append(block.get("text", ""))
    return "\n".join(parts) if parts else None


def _convert_content_blocks(
    content: Any,
) -> Tuple[Any, List[Dict[str, Any]], List[Dict[str, Any]]]:
    """Returns (openai_content, tool_calls, tool_results)."""
    if isinstance(content, str):
        return content, [], []
    text_parts: List[Dict[str, Any]] = []
    tool_calls: List[Dict[str, Any]] = []
    tool_results: List[Dict[str, Any]] = []
    for block in content:
        btype = block.get("type")
        if btype == "text":
            text_parts.append({"type": "text", "text": block.get("text", "")})
        elif btype == "thinking":
            pass  # assistant thinking is not replayed into the prompt
        elif btype == "image":
            src = block.get("source", {})
            if src.get("type") == "url":
                url = src.get("url", "")
            else:
                media = src.get("media_type", "image/png")
                url = f"data:{media};base64,{src.get('data', '')}"
            text_parts.append(
                {"type": "image_url", "image_url": {"url": url}}
            )
        elif btype == "tool_use":
            tool_calls.append(
                {
                    "id": block.get("id") or f"call_{uuid.uuid4().hex[:12]}",
                    "type": "function",
                    "function": {
                        "name": block.get("name", ""),
                        "arguments": json.dumps(block.get("input", {})),
                    },
                }
            )
        elif btype == "tool_result":
            inner = block.get("content")
            if isinstance(inner, list):
                inner = "".join(
                    b.get("text", "")
                    for b in inner
                    if isinstance(b, dict) and b.get("type") == "text"
                )
            tool_results.append(
                {
                    "role": "tool",
                    "tool_call_id": block.get("tool_use_id", ""),
                    "content": inner if inner is not None else "",
                }
            )
    if len(text_parts) == 1 and text_parts[0].get("type") == "text":
        content_out: Any = text_parts[0]["text"]
    elif text_parts:
        content_out = text_parts
    else:
        content_out = None
    return content_out, tool_calls, tool_results


def anthropic_to_openai(req: AnthropicMessagesRequest) -> Dict[str, Any]:
    """Convert an Anthropic Messages request into OpenAI chat kwargs."""
    messages: List[Dict[str, Any]] = []
    system = _flatten_system(req.system)
    if system:
        messages.append({"role": "system", "content": system})
    for m in req.messages:
        content, tool_calls, tool_results = _convert_content_blocks(m.content)
        if m.role == "assistant":
            msg: Dict[str, Any] = {"role": "assistant"}
            if content is not None:
                msg["content"] = content
            if tool_calls:
                msg["tool_calls"] = tool_calls
            messages.append(msg)
        else:
            # tool results become their own tool-role messages first
            messages.extend(tool_results)
            if content is not None or not tool_results:
                messages.append({"role": "user", "content": content or ""})

    out: Dict[str, Any] = {
        "model": req.model,
        "messages": messages,
        "max_tokens": req.max_tokens,
        "stream": req.stream,
    }
    if req.temperature is not None:
        out["temperature"] = req.temperature
    if req.top_p is not None:
        out["top_p"] = req.top_p
    if req.top_k is not None:
        out["top_k"] = req.top_k
    if req.stop_sequences:
        out["stop"] = list(req.stop_sequences)
    if req.tools:
        out["tools"] = [
            {
                "type": "function",
                "function": {
                    "name": t.name,
                    "description": t.description,
                    "parameters": t.input_schema or {},
                },
            }
            for t in req.tools
        ]
    if req.tool_choice:
        tc = req.tool_choice
        kind = tc.get("type")
        if kind == "auto":
            out["tool_choice"] = "auto"
        elif kind == "any":
            out["tool_choice"] = "required"
        elif kind == "tool":
            out["tool_choice"] = {
                "type": "function",
                "function": {"name": tc.get("name", "")},
            }
    return out


def convert_stop_reason(openai_reason: Optional[str]) -> Optional[str]:
    return {
        "stop": "end_turn",
        "length": "max_tokens",
        "tool_calls": "tool_use",
        "abort": "end_turn",
        None: None,
    }.get(openai_reason, "end_turn")


def openai_to_anthropic(
    *,
    model: str,
    text: str,
    reasoning: Optional[str],
    tool_calls: Optional[List[Dict[str, Any]]],
    finish_reason: Optional[str],
    prompt_tokens: int,
    completion_tokens: int,
    cached_tokens: int = 0,
) -> Dict[str, Any]:
    """Build an Anthropic Messages response body."""
    content: List[Dict[str, Any]] = []
    if reasoning:
        content.append(
            {"type": "thinking", "thinking": reasoning, "signature": ""}
        )
    if text:
        content.append({"type": "text", "text": text})
    stop_reason = convert_stop_reason(finish_reason)
    for tc in tool_calls or []:
        fn = tc.get("function", {})
        try:
            args = json.loads(fn.get("arguments") or "{}")
        except json.JSONDecodeError:
            args = {}
        content.append(
            {
                "type": "tool_use",
                "id": tc.get("id") or f"toolu_{uuid.uuid4().hex[:12]}",
                "name": fn.get("name", ""),
                "input": args,
            }
        )
        stop_reason = "tool_use"
    return {
        "id": f"msg_{uuid.uuid4().hex[:24]}",
        "type": "message",
        "role": "assistant",
        "model": model,
        "content": content,
        "stop_reason": stop_reason,
        "stop_sequence": None,
        "usage": {
            "input_tokens": prompt_tokens,
            "output_tokens": completion_tokens,
            "cache_read_input_tokens": cached_tokens,
            "cache_creation_input_tokens": 0,
        },
    }

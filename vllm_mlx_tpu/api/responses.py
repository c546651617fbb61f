# SPDX-License-Identifier: Apache-2.0
"""OpenAI Responses API (/v1/responses) — reference api/responses_models.py
+ server.py:5136. Input items are converted to chat messages; output is
the Responses item/event shape (message items with output_text content,
SSE events response.created / response.output_text.delta /
response.completed)."""

from __future__ import annotations

import json
import time
import uuid
from typing import Any, Dict, List, Optional, Tuple


def input_to_messages(inp: Any, instructions: Optional[str]) -> List[Dict]:
    """Responses `input` (string or item list) -> chat messages."""
    messages: List[Dict[str, Any]] = []
    if instructions:
        messages.append({"role": "system", "content": instructions})
    if isinstance(inp, str):
        messages.append({"role": "user", "content": inp})
        return messages
    for item in inp or []:
        if not isinstance(item, dict):
            continue
        itype = item.get("type", "message")
        if itype == "message":
            role = item.get("role", "user")
            if role == "developer":  # Responses alias for system
                role = "system"
            content = item.get("content")
            if isinstance(content, list):
                parts: List[Any] = []
                has_media = False
                for c in content:
                    ctype = c.get("type")
                    if ctype in ("input_text", "output_text", "text"):
                        parts.append(
                            {"type": "text", "text": c.get("text", "")}
                        )
                    elif ctype == "input_image":
                        has_media = True
                        parts.append(
                            {
                                "type": "image_url",
                                "image_url": {
                                    "url": c.get("image_url", "")
                                },
                            }
                        )
                if has_media:  # multimodal chat content parts
                    messages.append({"role": role, "content": parts})
                    continue
                content = "".join(p["text"] for p in parts)
            messages.append({"role": role, "content": content or ""})
        elif itype == "reasoning":
            continue  # prior-turn reasoning items are not re-fed
        elif itype == "function_call":
            messages.append(
                {
                    "role": "assistant",
                    "tool_calls": [
                        {
                            "id": item.get("call_id", ""),
                            "type": "function",
                            "function": {
                                "name": item.get("name", ""),
                                "arguments": item.get("arguments", "{}"),
                            },
                        }
                    ],
                }
            )
        elif itype == "function_call_output":
            messages.append(
                {
                    "role": "tool",
                    "tool_call_id": item.get("call_id", ""),
                    "content": item.get("output", ""),
                }
            )
    return messages


def make_response_body(
    *,
    response_id: str,
    model: str,
    text: str,
    reasoning: Optional[str],
    tool_calls: Optional[List[Dict[str, Any]]],
    finish_reason: Optional[str],
    prompt_tokens: int,
    completion_tokens: int,
    status: str = "completed",
) -> Dict[str, Any]:
    output: List[Dict[str, Any]] = []
    if reasoning:
        output.append(
            {
                "type": "reasoning",
                "id": f"rs_{uuid.uuid4().hex[:20]}",
                "summary": [{"type": "summary_text", "text": reasoning}],
            }
        )
    for tc in tool_calls or []:
        fn = tc.get("function", {})
        output.append(
            {
                "type": "function_call",
                "id": f"fc_{uuid.uuid4().hex[:20]}",
                "call_id": tc.get("id", ""),
                "name": fn.get("name", ""),
                "arguments": fn.get("arguments", "{}"),
                "status": "completed",
            }
        )
    if text or not output:
        output.append(
            {
                "type": "message",
                "id": f"msg_{uuid.uuid4().hex[:20]}",
                "role": "assistant",
                "status": "completed",
                "content": [
                    {"type": "output_text", "text": text, "annotations": []}
                ],
            }
        )
    return {
        "id": response_id,
        "object": "response",
        "created_at": int(time.time()),
        "status": status,
        "model": model,
        "output": output,
        "output_text": text,
        "usage": {
            "input_tokens": prompt_tokens,
            "output_tokens": completion_tokens,
            "total_tokens": prompt_tokens + completion_tokens,
        },
        "incomplete_details": (
            {"reason": "max_output_tokens"} if finish_reason == "length" else None
        ),
    }

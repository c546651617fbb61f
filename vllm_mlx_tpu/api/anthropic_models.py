# SPDX-License-Identifier: Apache-2.0
"""Anthropic Messages API schemas (reference api/anthropic_models.py).

Independently derived from the public Anthropic Messages API shape.
"""

from __future__ import annotations

import time
import uuid
from typing import Any, Dict, List, Literal, Optional, Union

from pydantic import BaseModel, ConfigDict, Field


class _Permissive(BaseModel):
    model_config = ConfigDict(extra="allow")


class AnthropicTextBlock(_Permissive):
    type: Literal["text"] = "text"
    text: str = ""


class AnthropicThinkingBlock(_Permissive):
    type: Literal["thinking"] = "thinking"
    thinking: str = ""
    signature: str = ""


class AnthropicImageSource(_Permissive):
    type: str = "base64"  # base64 | url
    media_type: Optional[str] = None
    data: Optional[str] = None
    url: Optional[str] = None


class AnthropicImageBlock(_Permissive):
    type: Literal["image"] = "image"
    source: AnthropicImageSource


class AnthropicToolUseBlock(_Permissive):
    type: Literal["tool_use"] = "tool_use"
    id: str = ""
    name: str = ""
    input: Dict[str, Any] = Field(default_factory=dict)


class AnthropicToolResultBlock(_Permissive):
    type: Literal["tool_result"] = "tool_result"
    tool_use_id: str = ""
    content: Union[str, List[Dict[str, Any]], None] = None
    is_error: Optional[bool] = None


AnthropicContentBlock = Union[
    AnthropicTextBlock,
    AnthropicThinkingBlock,
    AnthropicImageBlock,
    AnthropicToolUseBlock,
    AnthropicToolResultBlock,
]


class AnthropicMessage(_Permissive):
    role: Literal["user", "assistant"]
    content: Union[str, List[Dict[str, Any]]]


class AnthropicTool(_Permissive):
    name: str
    description: Optional[str] = None
    input_schema: Optional[Dict[str, Any]] = None


class AnthropicThinkingConfig(_Permissive):
    type: str = "enabled"  # enabled | disabled
    budget_tokens: Optional[int] = None


class AnthropicMessagesRequest(_Permissive):
    model: str
    messages: List[AnthropicMessage]
    max_tokens: int = 1024
    system: Union[str, List[Dict[str, Any]], None] = None
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    top_k: Optional[int] = None
    stop_sequences: Optional[List[str]] = None
    stream: bool = False
    tools: Optional[List[AnthropicTool]] = None
    tool_choice: Optional[Dict[str, Any]] = None
    thinking: Optional[AnthropicThinkingConfig] = None
    metadata: Optional[Dict[str, Any]] = None


class AnthropicUsage(_Permissive):
    input_tokens: int = 0
    output_tokens: int = 0
    cache_read_input_tokens: int = 0
    cache_creation_input_tokens: int = 0


class AnthropicMessagesResponse(_Permissive):
    id: str = Field(default_factory=lambda: f"msg_{uuid.uuid4().hex[:24]}")
    type: Literal["message"] = "message"
    role: Literal["assistant"] = "assistant"
    model: str = ""
    content: List[Dict[str, Any]] = Field(default_factory=list)
    stop_reason: Optional[str] = None
    stop_sequence: Optional[str] = None
    usage: AnthropicUsage = Field(default_factory=AnthropicUsage)


class AnthropicCountTokensRequest(_Permissive):
    model: str
    messages: List[AnthropicMessage]
    system: Union[str, List[Dict[str, Any]], None] = None
    tools: Optional[List[AnthropicTool]] = None


class AnthropicCountTokensResponse(_Permissive):
    input_tokens: int = 0


class AnthropicErrorResponse(_Permissive):
    type: Literal["error"] = "error"
    error: Dict[str, Any] = Field(default_factory=dict)

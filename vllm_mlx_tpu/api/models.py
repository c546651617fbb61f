# SPDX-License-Identifier: Apache-2.0
"""Pydantic schemas for the OpenAI-compatible API surface.

Parity with the reference's api/models.py:24-575 (requests/responses/
chunks, multimodal content parts, response_format) — independently
derived from the public OpenAI API shape.
"""

from __future__ import annotations

import time
import uuid
from typing import Any, Dict, List, Literal, Optional, Union

from pydantic import BaseModel, ConfigDict, Field


class _Permissive(BaseModel):
    model_config = ConfigDict(extra="allow")


# --------------------------------------------------------------- content parts
class TextContentPart(_Permissive):
    type: Literal["text"] = "text"
    text: str = ""


class ImageUrl(_Permissive):
    url: str
    detail: Optional[str] = None


class ImageContentPart(_Permissive):
    type: Literal["image_url"] = "image_url"
    image_url: Union[ImageUrl, str]


class VideoUrl(_Permissive):
    url: str


class VideoContentPart(_Permissive):
    type: Literal["video_url"] = "video_url"
    video_url: Union[VideoUrl, str]


class AudioUrl(_Permissive):
    url: str


class AudioContentPart(_Permissive):
    type: Literal["audio_url"] = "audio_url"
    audio_url: Union[AudioUrl, str]


class InputAudio(_Permissive):
    data: str
    format: Optional[str] = "wav"


class InputAudioContentPart(_Permissive):
    type: Literal["input_audio"] = "input_audio"
    input_audio: InputAudio


ContentPart = Union[
    TextContentPart,
    ImageContentPart,
    VideoContentPart,
    AudioContentPart,
    InputAudioContentPart,
]


# ------------------------------------------------------------------- messages
class FunctionCall(_Permissive):
    name: str
    arguments: str = ""


class ToolCall(_Permissive):
    id: str
    type: Literal["function"] = "function"
    function: FunctionCall


class ChatMessage(_Permissive):
    role: str
    content: Optional[Union[str, List[Dict[str, Any]]]] = None
    name: Optional[str] = None
    tool_calls: Optional[List[ToolCall]] = None
    tool_call_id: Optional[str] = None
    reasoning_content: Optional[str] = None
    reasoning: Optional[str] = None


class FunctionDef(_Permissive):
    name: str
    description: Optional[str] = None
    parameters: Optional[Dict[str, Any]] = None
    strict: Optional[bool] = None


class Tool(_Permissive):
    type: Literal["function"] = "function"
    function: FunctionDef


class JsonSchemaSpec(_Permissive):
    name: Optional[str] = None
    schema_: Optional[Dict[str, Any]] = Field(default=None, alias="schema")
    strict: Optional[bool] = None


class ResponseFormat(_Permissive):
    type: Literal["text", "json_object", "json_schema"] = "text"
    json_schema: Optional[JsonSchemaSpec] = None


class StreamOptions(_Permissive):
    include_usage: bool = False


# ------------------------------------------------------------------- requests
class ChatCompletionRequest(_Permissive):
    model: str
    messages: List[ChatMessage]
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    top_k: Optional[int] = None
    min_p: Optional[float] = None
    n: int = 1
    max_tokens: Optional[int] = None
    max_completion_tokens: Optional[int] = None
    stream: bool = False
    stream_options: Optional[StreamOptions] = None
    stop: Optional[Union[str, List[str]]] = None
    presence_penalty: Optional[float] = None
    frequency_penalty: Optional[float] = None
    repetition_penalty: Optional[float] = None
    seed: Optional[int] = None
    logprobs: Optional[bool] = None
    top_logprobs: Optional[int] = None
    user: Optional[str] = None
    tools: Optional[List[Tool]] = None
    tool_choice: Optional[Union[str, Dict[str, Any]]] = None
    parallel_tool_calls: Optional[bool] = None
    response_format: Optional[ResponseFormat] = None
    reasoning_effort: Optional[str] = None
    chat_template_kwargs: Optional[Dict[str, Any]] = None

    def effective_max_tokens(self, default: int = 32768) -> int:
        return self.max_completion_tokens or self.max_tokens or default

    def stop_list(self) -> List[str]:
        if self.stop is None:
            return []
        return [self.stop] if isinstance(self.stop, str) else list(self.stop)


class CompletionRequest(_Permissive):
    model: str
    prompt: Union[str, List[str], List[int], List[List[int]]]
    suffix: Optional[str] = None
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    top_k: Optional[int] = None
    min_p: Optional[float] = None
    n: int = 1
    max_tokens: Optional[int] = None
    stream: bool = False
    stream_options: Optional[StreamOptions] = None
    stop: Optional[Union[str, List[str]]] = None
    presence_penalty: Optional[float] = None
    frequency_penalty: Optional[float] = None
    repetition_penalty: Optional[float] = None
    seed: Optional[int] = None
    logprobs: Optional[int] = None
    echo: bool = False
    user: Optional[str] = None

    def stop_list(self) -> List[str]:
        if self.stop is None:
            return []
        return [self.stop] if isinstance(self.stop, str) else list(self.stop)


class EmbeddingRequest(_Permissive):
    model: str
    input: Union[str, List[str], List[int], List[List[int]]]
    encoding_format: Literal["float", "base64"] = "float"
    dimensions: Optional[int] = None
    user: Optional[str] = None


class RerankRequest(_Permissive):
    model: str
    query: str
    documents: List[str]
    top_n: Optional[int] = None
    return_documents: bool = True


# ------------------------------------------------------------------ responses
class Usage(_Permissive):
    prompt_tokens: int = 0
    completion_tokens: int = 0
    total_tokens: int = 0
    prompt_tokens_details: Optional[Dict[str, Any]] = None


def make_usage(
    prompt_tokens: int, completion_tokens: int, cached_tokens: int = 0
) -> Usage:
    details = {"cached_tokens": cached_tokens} if cached_tokens else None
    return Usage(
        prompt_tokens=prompt_tokens,
        completion_tokens=completion_tokens,
        total_tokens=prompt_tokens + completion_tokens,
        prompt_tokens_details=details,
    )


class ChatCompletionMessage(_Permissive):
    role: str = "assistant"
    content: Optional[str] = None
    reasoning_content: Optional[str] = None
    tool_calls: Optional[List[ToolCall]] = None


class ChatCompletionChoice(_Permissive):
    index: int = 0
    message: ChatCompletionMessage
    finish_reason: Optional[str] = None
    logprobs: Optional[Dict[str, Any]] = None


class ChatCompletionResponse(_Permissive):
    id: str = Field(
        default_factory=lambda: f"chatcmpl-{uuid.uuid4().hex[:24]}"
    )
    object: Literal["chat.completion"] = "chat.completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: List[ChatCompletionChoice] = Field(default_factory=list)
    usage: Optional[Usage] = None


class DeltaMessage(_Permissive):
    role: Optional[str] = None
    content: Optional[str] = None
    reasoning_content: Optional[str] = None
    tool_calls: Optional[List[Dict[str, Any]]] = None


class ChatCompletionChunkChoice(_Permissive):
    index: int = 0
    delta: DeltaMessage = Field(default_factory=DeltaMessage)
    finish_reason: Optional[str] = None


class ChatCompletionChunk(_Permissive):
    id: str = ""
    object: Literal["chat.completion.chunk"] = "chat.completion.chunk"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: List[ChatCompletionChunkChoice] = Field(default_factory=list)
    usage: Optional[Usage] = None


class CompletionChoice(_Permissive):
    index: int = 0
    text: str = ""
    finish_reason: Optional[str] = None
    logprobs: Optional[Dict[str, Any]] = None


class CompletionResponse(_Permissive):
    id: str = Field(default_factory=lambda: f"cmpl-{uuid.uuid4().hex[:24]}")
    object: Literal["text_completion"] = "text_completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: List[CompletionChoice] = Field(default_factory=list)
    usage: Optional[Usage] = None


class ModelInfo(_Permissive):
    id: str
    object: Literal["model"] = "model"
    created: int = Field(default_factory=lambda: int(time.time()))
    owned_by: str = "vllm-mlx-tpu"


class ModelList(_Permissive):
    object: Literal["list"] = "list"
    data: List[ModelInfo] = Field(default_factory=list)


class EmbeddingData(_Permissive):
    object: Literal["embedding"] = "embedding"
    index: int = 0
    embedding: Union[List[float], str] = Field(default_factory=list)


class EmbeddingResponse(_Permissive):
    object: Literal["list"] = "list"
    data: List[EmbeddingData] = Field(default_factory=list)
    model: str = ""
    usage: Optional[Usage] = None


class RerankResult(_Permissive):
    index: int
    relevance_score: float
    document: Optional[Union[str, Dict[str, str]]] = None


class RerankResponse(_Permissive):
    id: str = Field(default_factory=lambda: f"rerank-{uuid.uuid4().hex[:16]}")
    model: str = ""
    results: List[RerankResult] = Field(default_factory=list)
    usage: Optional[Usage] = None


class ErrorInfo(_Permissive):
    message: str
    type: str = "invalid_request_error"
    param: Optional[str] = None
    code: Optional[str] = None


class ErrorResponse(_Permissive):
    error: ErrorInfo

# SPDX-License-Identifier: Apache-2.0
"""Reasoning parser base + tag-based implementation + registry."""

from __future__ import annotations

import logging
from typing import Callable, Dict, List, Optional, Tuple, Type

logger = logging.getLogger(__name__)


class ReasoningStreamState:
    """Incremental splitter: route text into (reasoning, content) deltas.

    Handles: optional opening tag at stream start (some templates
    pre-open thinking, so a stream may begin mid-reasoning), partial
    tags straddling chunk boundaries.
    """

    def __init__(
        self,
        start_tag: str,
        end_tag: str,
        starts_in_reasoning: bool = False,
    ) -> None:
        self.start_tag = start_tag
        self.end_tag = end_tag
        self.buffer = ""
        self.mode = "detect"  # detect | reasoning | content
        self.starts_in_reasoning = starts_in_reasoning
        self._seen_any = False

    def _partial_suffix(self, text: str, tag: str) -> int:
        for k in range(min(len(tag), len(text)), 0, -1):
            if text.endswith(tag[:k]) and k < len(tag):
                return k
        return 0

    def feed(self, text: str) -> Tuple[str, str]:
        """Returns (reasoning_delta, content_delta)."""
        self.buffer += text
        reasoning_out = []
        content_out = []
        while self.buffer:
            if self.mode == "detect":
                stripped = self.buffer.lstrip()
                if not self._seen_any and not stripped:
                    break  # only whitespace so far
                if stripped.startswith(self.start_tag):
                    ws_len = len(self.buffer) - len(stripped)
                    self.buffer = stripped[len(self.start_tag):]
                    self.mode = "reasoning"
                    self._seen_any = True
                    continue
                if self.start_tag.startswith(stripped) or (
                    not self._seen_any
                    and stripped
                    and self.start_tag.startswith(stripped)
                ):
                    break  # could still become the start tag
                if self.starts_in_reasoning:
                    self.mode = "reasoning"
                else:
                    self.mode = "content"
                self._seen_any = True
                continue
            if self.mode == "reasoning":
                idx = self.buffer.find(self.end_tag)
                if idx != -1:
                    reasoning_out.append(self.buffer[:idx])
                    self.buffer = self.buffer[idx + len(self.end_tag):]
                    self.mode = "content"
                    continue
                hold = self._partial_suffix(self.buffer, self.end_tag)
                emit = self.buffer[: len(self.buffer) - hold]
                self.buffer = self.buffer[len(self.buffer) - hold:]
                if emit:
                    reasoning_out.append(emit)
                break
            # content mode: pass everything through
            content_out.append(self.buffer)
            self.buffer = ""
        return "".join(reasoning_out), "".join(content_out)

    def flush(self) -> Tuple[str, str]:
        buf, self.buffer = self.buffer, ""
        if self.mode == "reasoning":
            return buf, ""
        return "", buf


class ReasoningParser:
    name = "base"

    def __init__(self, tokenizer=None) -> None:
        self.tokenizer = tokenizer

    def extract_reasoning(self, text: str) -> Tuple[Optional[str], str]:
        """Whole-text split -> (reasoning or None, content)."""
        raise NotImplementedError

    def make_stream_state(self) -> ReasoningStreamState:
        raise NotImplementedError


class TagReasoningParser(ReasoningParser):
    """Splits on start/end tags (e.g. ``<think>...</think>``)."""

    start_tag = "<think>"
    end_tag = "</think>"
    # models whose chat template pre-opens thinking (stream starts inside)
    starts_in_reasoning = False

    def extract_reasoning(self, text: str) -> Tuple[Optional[str], str]:
        work = text
        lstripped = work.lstrip()
        if lstripped.startswith(self.start_tag):
            body = lstripped[len(self.start_tag):]
            if self.end_tag in body:
                reasoning, content = body.split(self.end_tag, 1)
                return reasoning.strip("\n"), content.lstrip("\n")
            return body, ""
        if self.starts_in_reasoning and self.end_tag in work:
            reasoning, content = work.split(self.end_tag, 1)
            return reasoning.strip("\n"), content.lstrip("\n")
        if self.end_tag in work:
            reasoning, content = work.split(self.end_tag, 1)
            return reasoning.strip("\n"), content.lstrip("\n")
        return None, text

    def make_stream_state(self) -> ReasoningStreamState:
        return ReasoningStreamState(
            self.start_tag, self.end_tag, self.starts_in_reasoning
        )


_REGISTRY: Dict[str, Type[ReasoningParser]] = {}


def register_reasoning_parser(
    name: str,
) -> Callable[[Type[ReasoningParser]], Type[ReasoningParser]]:
    def deco(cls: Type[ReasoningParser]) -> Type[ReasoningParser]:
        _REGISTRY[name] = cls
        cls.name = name
        return cls

    return deco


def get_reasoning_parser(name: str, tokenizer=None) -> ReasoningParser:
    if name not in _REGISTRY:
        logger.warning("unknown reasoning parser %r; using 'think'", name)
        name = "think"
    return _REGISTRY[name](tokenizer)


def list_reasoning_parsers() -> List[str]:
    return sorted(_REGISTRY)


@register_reasoning_parser("think")
class ThinkParser(TagReasoningParser):
    """Generic ``<think>`` tags (reference reasoning/think_parser.py)."""


@register_reasoning_parser("qwen3")
@register_reasoning_parser("poolside_v1")
class Qwen3ReasoningParser(TagReasoningParser):
    """Qwen3: template may pre-open ``<think>`` so streams can begin
    mid-reasoning (reference reasoning/qwen3_parser.py; Poolside Laguna
    uses the identical boundary — reference
    reasoning/poolside_v1_parser.py subclasses the qwen3 parser)."""

    starts_in_reasoning = False


@register_reasoning_parser("deepseek_r1")
class DeepseekR1Parser(TagReasoningParser):
    """DeepSeek-R1 always starts inside thinking; the opening tag is part
    of the prompt (reference reasoning/deepseek_r1_parser.py)."""

    starts_in_reasoning = True


@register_reasoning_parser("glm4")
class Glm4Parser(TagReasoningParser):
    pass


@register_reasoning_parser("gptoss")
@register_reasoning_parser("gpt_oss")
@register_reasoning_parser("harmony")
class GptOssParser(TagReasoningParser):
    """GPT-OSS harmony analysis channel rendered as tags by the template
    (full harmony channel parsing lives in api/harmony)."""

    start_tag = "<|channel|>analysis<|message|>"
    end_tag = "<|end|>"


@register_reasoning_parser("mistral")
class MistralReasoningParser(TagReasoningParser):
    """Magistral-style ``[THINK]...[/THINK]`` blocks
    (reference reasoning/mistral_parser.py)."""

    start_tag = "[THINK]"
    end_tag = "[/THINK]"


@register_reasoning_parser("gemma")
@register_reasoning_parser("gemma4")
class GemmaReasoningParser(TagReasoningParser):
    """Gemma thinking uses the generic think tags in its template
    (reference reasoning/gemma4_parser.py)."""


@register_reasoning_parser("kimi")
class KimiReasoningParser(TagReasoningParser):
    """Kimi K2 thinking blocks (``◁think▷ ... ◁/think▷``)."""

    start_tag = "◁think▷"
    end_tag = "◁/think▷"

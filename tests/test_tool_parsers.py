# SPDX-License-Identifier: Apache-2.0
"""Tool-call and reasoning parser suites (reference keeps one file per
format; consolidated here while the parser set grows)."""

import json

import pytest

from vllm_mlx_tpu.reasoning import get_reasoning_parser
from vllm_mlx_tpu.tool_parsers import get_tool_parser


def _args(tc):
    return json.loads(tc["function"]["arguments"])


class TestJsonAuto:
    def test_bare_json(self):
        p = get_tool_parser("auto")
        r = p.extract_tool_calls(
            '{"name": "search", "arguments": {"q": "cats"}}'
        )
        assert r.tools_called
        assert r.tool_calls[0]["function"]["name"] == "search"
        assert _args(r.tool_calls[0]) == {"q": "cats"}
        assert r.content is None

    def test_fenced_json(self):
        p = get_tool_parser("auto")
        r = p.extract_tool_calls(
            'Sure!\n```json\n{"name": "add", "parameters": {"a": 1, "b": 2}}\n```'
        )
        assert r.tools_called
        assert _args(r.tool_calls[0]) == {"a": 1, "b": 2}
        assert r.content == "Sure!"

    def test_array_of_calls(self):
        p = get_tool_parser("auto")
        r = p.extract_tool_calls(
            '[{"name": "a", "arguments": {}}, {"name": "b", "arguments": {"x": 1}}]'
        )
        assert len(r.tool_calls) == 2

    def test_plain_text_passthrough(self):
        p = get_tool_parser("auto")
        r = p.extract_tool_calls("Just a normal answer with no tools.")
        assert not r.tools_called
        assert r.content == "Just a normal answer with no tools."

    def test_non_tool_json_kept_as_content(self):
        p = get_tool_parser("auto")
        text = 'Here is data: {"foo": 1, "bar": 2} done'
        r = p.extract_tool_calls(text)
        assert not r.tools_called


class TestHermesQwen:
    def test_single(self):
        p = get_tool_parser("hermes")
        r = p.extract_tool_calls(
            '<tool_call>\n{"name": "get_weather", "arguments": {"city": "SF"}}\n</tool_call>'
        )
        assert r.tools_called
        assert r.tool_calls[0]["function"]["name"] == "get_weather"

    def test_multiple_and_content(self):
        p = get_tool_parser("qwen")
        r = p.extract_tool_calls(
            'Let me look.\n<tool_call>{"name": "a", "arguments": {}}</tool_call>'
            '<tool_call>{"name": "b", "arguments": {"k": 2}}</tool_call>'
        )
        assert len(r.tool_calls) == 2
        assert r.content == "Let me look."

    def test_truncated_call(self):
        p = get_tool_parser("hermes")
        r = p.extract_tool_calls(
            '<tool_call>{"name": "a", "arguments": {"x": 1}}'
        )
        assert r.tools_called

    def test_qwen3_xml(self):
        p = get_tool_parser("qwen3_xml")
        r = p.extract_tool_calls(
            "<tool_call><function=read_file>"
            "<parameter=path>/tmp/x.txt</parameter>"
            "<parameter=limit>10</parameter>"
            "</function></tool_call>"
        )
        assert r.tools_called
        assert r.tool_calls[0]["function"]["name"] == "read_file"
        assert _args(r.tool_calls[0]) == {"path": "/tmp/x.txt", "limit": 10}


class TestLlamaMistral:
    def test_llama_python_tag(self):
        p = get_tool_parser("llama")
        r = p.extract_tool_calls(
            '<|python_tag|>{"name": "get_time", "parameters": {"tz": "UTC"}}'
        )
        assert r.tools_called
        assert _args(r.tool_calls[0]) == {"tz": "UTC"}

    def test_llama_bare(self):
        p = get_tool_parser("llama")
        r = p.extract_tool_calls(
            '{"name": "f", "parameters": {"a": true}}'
        )
        assert r.tools_called

    def test_mistral(self):
        p = get_tool_parser("mistral")
        r = p.extract_tool_calls(
            '[TOOL_CALLS][{"name": "calc", "arguments": {"expr": "2+2"}}]'
        )
        assert r.tools_called
        assert r.tool_calls[0]["function"]["name"] == "calc"

    def test_mistral_no_marker(self):
        p = get_tool_parser("mistral")
        r = p.extract_tool_calls("plain text")
        assert not r.tools_called


class TestMiscParsers:
    def test_granite_marker(self):
        p = get_tool_parser("granite")
        r = p.extract_tool_calls(
            '<|tool_call|>[{"name": "f", "arguments": {"x": 1}}]'
        )
        assert r.tools_called and _args(r.tool_calls[0]) == {"x": 1}

    def test_granite_bare_list(self):
        p = get_tool_parser("granite")
        r = p.extract_tool_calls('[{"name": "f", "arguments": {}}]')
        assert r.tools_called

    def test_nemotron(self):
        p = get_tool_parser("nemotron")
        r = p.extract_tool_calls(
            'thinking<TOOLCALL>[{"name": "a", "arguments": {"q": 2}}]</TOOLCALL>done'
        )
        assert r.tools_called
        assert r.content == "thinkingdone"

    def test_minimax(self):
        p = get_tool_parser("minimax")
        r = p.extract_tool_calls(
            '<tool_calls>\n{"name": "x", "arguments": {}}\n'
            '{"name": "y", "arguments": {"a": 1}}\n</tool_calls>'
        )
        assert len(r.tool_calls) == 2

    def test_xlam(self):
        p = get_tool_parser("xlam")
        r = p.extract_tool_calls(
            '[{"name": "get_news", "arguments": {"topic": "ai"}}]'
        )
        assert r.tools_called

    def test_deepseek(self):
        p = get_tool_parser("deepseek")
        text = (
            "<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function"
            "<｜tool▁sep｜>get_weather\n```json\n{\"city\": \"SF\"}\n```"
            "<｜tool▁call▁end｜><｜tool▁calls▁end｜>"
        )
        r = p.extract_tool_calls(text)
        assert r.tools_called
        assert r.tool_calls[0]["function"]["name"] == "get_weather"

    def test_kimi(self):
        p = get_tool_parser("kimi")
        text = (
            "<|tool_calls_section_begin|><|tool_call_begin|>"
            "functions.search:0<|tool_call_argument_begin|>"
            '{"q": "x"}<|tool_call_end|><|tool_calls_section_end|>'
        )
        r = p.extract_tool_calls(text)
        assert r.tools_called
        assert r.tool_calls[0]["function"]["name"] == "search"

    def test_glm(self):
        p = get_tool_parser("glm47")
        text = (
            "<tool_call>get_time\n<arg_key>tz</arg_key>"
            "<arg_value>UTC</arg_value>\n</tool_call>"
        )
        r = p.extract_tool_calls(text)
        assert r.tools_called
        assert _args(r.tool_calls[0]) == {"tz": "UTC"}

    def test_functionary(self):
        p = get_tool_parser("functionary")
        text = '>>>get_price\n{"ticker": "ACME"}'
        r = p.extract_tool_calls(text)
        assert r.tools_called
        assert _args(r.tool_calls[0]) == {"ticker": "ACME"}

    def test_harmony(self):
        p = get_tool_parser("harmony")
        text = (
            "<|channel|>analysis<|message|>I should check the weather."
            "<|end|><|channel|>commentary to=functions.get_weather "
            "<|constrain|>json<|message|>{\"city\": \"Paris\"}<|call|>"
        )
        r = p.extract_tool_calls(text)
        assert r.tools_called
        assert r.tool_calls[0]["function"]["name"] == "get_weather"
        assert _args(r.tool_calls[0]) == {"city": "Paris"}

    def test_harmony_final_channel_content(self):
        p = get_tool_parser("harmony")
        text = (
            "<|channel|>final<|message|>The answer is 4.<|return|>"
        )
        r = p.extract_tool_calls(text)
        assert not r.tools_called
        assert r.content == "The answer is 4."

    def test_registry_covers_reference_formats(self):
        from vllm_mlx_tpu.tool_parsers import list_tool_parsers

        names = set(list_tool_parsers())
        for required in (
            "auto", "mistral", "qwen", "qwen3_xml", "llama", "hermes",
            "deepseek", "kimi", "granite", "nemotron", "xlam",
            "functionary", "glm47", "minimax", "gemma",
        ):
            assert required in names, required


class TestStreamingToolParser:
    def test_content_then_tool(self):
        p = get_tool_parser("hermes")
        st = p.make_stream_state()
        deltas = []
        for piece in [
            "I will ", "check that. <tool", "_call>{\"name\": \"f\", ",
            "\"arguments\": {}}</tool_call>",
        ]:
            deltas.extend(st.feed(piece))
        deltas.extend(st.flush())
        content = "".join(d.get("content", "") for d in deltas)
        tool_deltas = [d for d in deltas if "tool_calls" in d]
        assert content == "I will check that. "
        # incremental streaming: a name delta first, then argument
        # fragments that concatenate to the full arguments JSON
        assert tool_deltas[0]["tool_calls"][0]["function"]["name"] == "f"
        args = "".join(
            tc.get("function", {}).get("arguments", "")
            for d in tool_deltas
            for tc in d["tool_calls"]
        )
        assert json.loads(args) == {}

    def test_no_tool_passthrough(self):
        p = get_tool_parser("hermes")
        st = p.make_stream_state()
        deltas = []
        for piece in ["hello ", "world", "!"]:
            deltas.extend(st.feed(piece))
        deltas.extend(st.flush())
        assert "".join(d.get("content", "") for d in deltas) == "hello world!"


class TestReasoningParsers:
    def test_think_split(self):
        p = get_reasoning_parser("think")
        reasoning, content = p.extract_reasoning(
            "<think>step 1\nstep 2</think>\nThe answer is 42."
        )
        assert reasoning == "step 1\nstep 2"
        assert content == "The answer is 42."

    def test_no_think(self):
        p = get_reasoning_parser("think")
        reasoning, content = p.extract_reasoning("Just an answer.")
        assert reasoning is None
        assert content == "Just an answer."

    def test_unclosed_think(self):
        p = get_reasoning_parser("qwen3")
        reasoning, content = p.extract_reasoning("<think>still going")
        assert reasoning == "still going"
        assert content == ""

    def test_deepseek_starts_in_reasoning(self):
        p = get_reasoning_parser("deepseek_r1")
        reasoning, content = p.extract_reasoning(
            "thinking without tag</think>answer"
        )
        assert reasoning == "thinking without tag"
        assert content == "answer"

    def test_streaming_split(self):
        p = get_reasoning_parser("think")
        st = p.make_stream_state()
        pieces = ["<th", "ink>abc", " def</th", "ink>final ", "answer"]
        reasoning = ""
        content = ""
        for piece in pieces:
            r, c = st.feed(piece)
            reasoning += r
            content += c
        r, c = st.flush()
        reasoning += r
        content += c
        assert reasoning == "abc def"
        assert content == "final answer"

    def test_streaming_no_think(self):
        p = get_reasoning_parser("think")
        st = p.make_stream_state()
        reasoning = ""
        content = ""
        for piece in ["hello", " world"]:
            r, c = st.feed(piece)
            reasoning += r
            content += c
        r, c = st.flush()
        reasoning += r
        content += c
        assert reasoning == ""
        assert content == "hello world"

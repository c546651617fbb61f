# SPDX-License-Identifier: Apache-2.0
"""Incremental streaming tool-call deltas (VERDICT r2 #7; reference
streams per-format — tool_parsers/qwen3_xml_tool_parser.py,
abstract_tool_parser.py:40-284): function.name goes out as soon as it
parses and argument fragments stream as they decode, instead of the
whole call buffering until flush."""

import asyncio
import json

import pytest

from vllm_mlx_tpu.tool_parsers import get_tool_parser


def _stream_chars(parser_name, text, chunk=3):
    """Feed text in small chunks; returns the full flat delta list."""
    parser = get_tool_parser(parser_name)
    state = parser.make_stream_state()
    deltas = []
    for i in range(0, len(text), chunk):
        deltas.extend(state.feed(text[i : i + chunk]))
    deltas.extend(state.flush())
    return deltas


def _reassemble(deltas):
    """Rebuild OpenAI tool calls + content from a delta stream."""
    content = ""
    calls = {}
    for d in deltas:
        if "content" in d:
            content += d["content"]
        for tc in d.get("tool_calls", []):
            c = calls.setdefault(
                tc["index"], {"name": "", "arguments": "", "id": None}
            )
            if tc.get("id"):
                c["id"] = tc["id"]
            fn = tc.get("function", {})
            if fn.get("name"):
                c["name"] = fn["name"]
            c["arguments"] += fn.get("arguments", "")
    return content, [calls[i] for i in sorted(calls)]


ARG_OBJ = {"city": "Paris", "n": 3, "note": 'quo"te {braces}'}


class TestHermesIncremental:
    TEXT = (
        "Let me check. <tool_call>\n"
        + json.dumps({"name": "get_weather", "arguments": ARG_OBJ})
        + "\n</tool_call>"
    )

    def test_multiple_argument_deltas_for_one_call(self):
        deltas = _stream_chars("hermes", self.TEXT, chunk=4)
        arg_deltas = [
            d
            for d in deltas
            if d.get("tool_calls")
            and d["tool_calls"][0].get("function", {}).get("arguments")
        ]
        # the whole point: arguments arrive in MANY fragments
        assert len(arg_deltas) > 3
        content, calls = _reassemble(deltas)
        assert content.strip() == "Let me check."
        assert len(calls) == 1
        assert calls[0]["name"] == "get_weather"
        assert calls[0]["id"].startswith("call_")
        assert json.loads(calls[0]["arguments"]) == ARG_OBJ

    def test_name_emitted_before_arguments_complete(self):
        parser = get_tool_parser("hermes")
        state = parser.make_stream_state()
        head = self.TEXT[: self.TEXT.find('"arguments"')]
        deltas = state.feed(head)
        named = [
            tc
            for d in deltas
            for tc in d.get("tool_calls", [])
            if tc.get("function", {}).get("name")
        ]
        assert named and named[0]["function"]["name"] == "get_weather"

    def test_two_sequential_calls_get_indices(self):
        text = (
            "<tool_call>"
            + json.dumps({"name": "a", "arguments": {"x": 1}})
            + "</tool_call><tool_call>"
            + json.dumps({"name": "b", "arguments": {"y": 2}})
            + "</tool_call>"
        )
        _, calls = _reassemble(_stream_chars("hermes", text, chunk=5))
        assert [c["name"] for c in calls] == ["a", "b"]
        assert json.loads(calls[0]["arguments"]) == {"x": 1}
        assert json.loads(calls[1]["arguments"]) == {"y": 2}

    def test_malformed_region_falls_back_to_buffered(self):
        text = "<tool_call>not json at all"
        deltas = _stream_chars("hermes", text, chunk=4)
        # no crash; the region surfaces as content (repair found no call)
        content, calls = _reassemble(deltas)
        assert not calls or calls == []

    def test_string_valued_arguments_decode(self):
        text = (
            "<tool_call>"
            + json.dumps(
                {"name": "f", "arguments": json.dumps({"q": "x"})}
            )
            + "</tool_call>"
        )
        _, calls = _reassemble(_stream_chars("hermes", text, chunk=6))
        assert json.loads(calls[0]["arguments"]) == {"q": "x"}


class TestMistralIncremental:
    def test_array_of_calls_streams(self):
        text = (
            "[TOOL_CALLS]["
            + json.dumps({"name": "a", "arguments": {"x": 1}})
            + ", "
            + json.dumps({"name": "b", "arguments": {"y": [1, 2]}})
            + "]"
        )
        deltas = _stream_chars("mistral", text, chunk=4)
        _, calls = _reassemble(deltas)
        assert [c["name"] for c in calls] == ["a", "b"]
        assert json.loads(calls[1]["arguments"]) == {"y": [1, 2]}


class TestLlamaIncremental:
    def test_bare_json_streams(self):
        text = json.dumps({"name": "f", "parameters": ARG_OBJ})
        deltas = _stream_chars("llama", text, chunk=4)
        arg_deltas = [
            d
            for d in deltas
            if d.get("tool_calls")
            and d["tool_calls"][0].get("function", {}).get("arguments")
        ]
        assert len(arg_deltas) > 2
        _, calls = _reassemble(deltas)
        assert calls[0]["name"] == "f"
        assert json.loads(calls[0]["arguments"]) == ARG_OBJ


class TestQwen3XmlIncremental:
    TEXT = (
        "thinking...<tool_call><function=get_weather>"
        "<parameter=city>\nParis\n</parameter>"
        "<parameter=n>3</parameter>"
        "<parameter=note>plain text</parameter>"
        "</function></tool_call>"
    )

    def test_parameter_granular_deltas(self):
        deltas = _stream_chars("qwen3_xml", self.TEXT, chunk=5)
        arg_deltas = [
            d
            for d in deltas
            if d.get("tool_calls")
            and d["tool_calls"][0].get("function", {}).get("arguments")
        ]
        # one fragment per parameter + the closing brace
        assert len(arg_deltas) == 4
        content, calls = _reassemble(deltas)
        assert content == "thinking..."
        assert calls[0]["name"] == "get_weather"
        args = json.loads(calls[0]["arguments"])
        assert args == {"city": "Paris", "n": 3, "note": "plain text"}

    def test_matches_buffered_parse(self):
        parser = get_tool_parser("qwen3_xml")
        buffered = parser.extract_tool_calls(self.TEXT)
        _, calls = _reassemble(_stream_chars("qwen3_xml", self.TEXT))
        assert json.loads(calls[0]["arguments"]) == json.loads(
            buffered.tool_calls[0]["function"]["arguments"]
        )

    def test_truncated_stream_closes_json(self):
        text = (
            "<tool_call><function=f><parameter=a>1</parameter>"
            "<parameter=b>partial val"
        )
        _, calls = _reassemble(_stream_chars("qwen3_xml", text, chunk=7))
        args = json.loads(calls[0]["arguments"])  # flush closed the JSON
        assert args["a"] == 1 and args["b"] == "partial val"


class TestSSEDeltasOverHttp:
    """VERDICT done-criterion: an SSE stream carries MULTIPLE tool_calls
    argument deltas for ONE call. A scripted engine stands in for the
    model (the reference tests its streaming parsers the same way)."""

    def _scripted_engine(self, chunks):
        from vllm_mlx_tpu.engine.base import BaseEngine, GenerationOutput

        class Scripted(BaseEngine):
            model_path = "scripted"
            is_running = True
            tokenizer = None
            model_config = None

            async def start(self):
                pass

            async def stop(self):
                pass

            async def generate(self, *a, **k):
                raise NotImplementedError

            async def stream_generate(self, *a, **k):
                raise NotImplementedError

            async def chat(self, *a, **k):
                raise NotImplementedError

            def abort_request(self, rid):
                pass

            def get_stats(self):
                return {}

            async def stream_chat(self, messages, **kw):
                for i, c in enumerate(chunks):
                    yield GenerationOutput(
                        text=c,
                        token_ids=[i],
                        finished=(i == len(chunks) - 1),
                        finish_reason=(
                            "stop" if i == len(chunks) - 1 else None
                        ),
                        prompt_tokens=3,
                        completion_tokens=i + 1,
                    )

        return Scripted()

    def test_sse_stream_has_argument_deltas(self):
        from aiohttp.test_utils import TestClient, TestServer

        from vllm_mlx_tpu.api.server import build_app

        body = (
            "<tool_call>"
            + json.dumps({"name": "get_weather", "arguments": ARG_OBJ})
            + "</tool_call>"
        )
        chunks = ["I will call. "] + [
            body[i : i + 6] for i in range(0, len(body), 6)
        ]
        eng = self._scripted_engine(chunks)
        app = build_app(
            eng,
            served_models=["scripted"],
            default_max_tokens=64,
            tool_parser_name="hermes",
        )

        async def go():
            client = TestClient(TestServer(app))
            await client.start_server()
            resp = await client.post(
                "/v1/chat/completions",
                json={
                    "model": "scripted",
                    "messages": [{"role": "user", "content": "hi"}],
                    "stream": True,
                    "tools": [
                        {
                            "type": "function",
                            "function": {
                                "name": "get_weather",
                                "parameters": {"type": "object"},
                            },
                        }
                    ],
                },
            )
            raw = await resp.text()
            await client.close()
            return raw

        raw = asyncio.new_event_loop().run_until_complete(go())
        deltas = []
        finish = None
        for line in raw.splitlines():
            if not line.startswith("data: ") or line == "data: [DONE]":
                continue
            obj = json.loads(line[len("data: "):])
            if not obj.get("choices"):
                continue
            ch = obj["choices"][0]
            if ch.get("finish_reason"):
                finish = ch["finish_reason"]
            deltas.append(ch.get("delta", {}))
        arg_deltas = [
            d
            for d in deltas
            if d.get("tool_calls")
            and d["tool_calls"][0].get("function", {}).get("arguments")
        ]
        assert len(arg_deltas) > 2, raw
        content, calls = _reassemble(deltas)
        assert "I will call." in content
        assert calls[0]["name"] == "get_weather"
        assert json.loads(calls[0]["arguments"]) == ARG_OBJ
        assert finish == "tool_calls"


class TestAnthropicToolUseStreaming:
    """Anthropic /v1/messages streams tool_use blocks with incremental
    input_json_delta events (Anthropic event protocol)."""

    def test_input_json_delta_events(self):
        from aiohttp.test_utils import TestClient, TestServer

        from vllm_mlx_tpu.api.server import build_app

        body = (
            "Sure. <tool_call>"
            + json.dumps({"name": "get_weather", "arguments": ARG_OBJ})
            + "</tool_call>"
        )
        chunks = [body[i : i + 6] for i in range(0, len(body), 6)]
        sc = TestSSEDeltasOverHttp()
        eng = sc._scripted_engine(chunks)
        app = build_app(
            eng,
            served_models=["scripted"],
            default_max_tokens=64,
            tool_parser_name="hermes",
        )

        async def go():
            client = TestClient(TestServer(app))
            await client.start_server()
            resp = await client.post(
                "/v1/messages",
                json={
                    "model": "scripted",
                    "max_tokens": 64,
                    "messages": [{"role": "user", "content": "hi"}],
                    "stream": True,
                    "tools": [
                        {
                            "name": "get_weather",
                            "input_schema": {"type": "object"},
                        }
                    ],
                },
            )
            raw = await resp.text()
            await client.close()
            return raw

        raw = asyncio.new_event_loop().run_until_complete(go())
        events = []
        for line in raw.splitlines():
            if line.startswith("data: "):
                events.append(json.loads(line[6:]))
        starts = [
            e
            for e in events
            if e["type"] == "content_block_start"
            and e["content_block"]["type"] == "tool_use"
        ]
        assert len(starts) == 1
        assert starts[0]["content_block"]["name"] == "get_weather"
        jdeltas = [
            e["delta"]["partial_json"]
            for e in events
            if e["type"] == "content_block_delta"
            and e["delta"]["type"] == "input_json_delta"
        ]
        assert len(jdeltas) > 2  # incremental fragments
        assert json.loads("".join(jdeltas)) == ARG_OBJ
        stop = next(e for e in events if e["type"] == "message_delta")
        assert stop["delta"]["stop_reason"] == "tool_use"
        text = "".join(
            e["delta"]["text"]
            for e in events
            if e["type"] == "content_block_delta"
            and e["delta"]["type"] == "text_delta"
        )
        assert text.strip() == "Sure."

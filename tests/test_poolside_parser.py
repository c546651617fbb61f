# SPDX-License-Identifier: Apache-2.0
"""Poolside v1 (Laguna) tool parser: schema-aware extraction +
incremental string-value streaming (reference
tool_parsers/poolside_v1_tool_parser.py:34-356)."""

import json

from vllm_mlx_tpu.tool_parsers import get_tool_parser

TOOLS = [
    {
        "type": "function",
        "function": {
            "name": "write_file",
            "parameters": {
                "type": "object",
                "properties": {
                    "path": {"type": "string"},
                    "content": {"type": "string"},
                    "mode": {"type": "integer"},
                },
            },
        },
    },
    {
        "type": "function",
        "function": {"name": "get_time", "parameters": {}},
    },
]


def _parser():
    p = get_tool_parser("poolside_v1")
    p.set_tools(TOOLS)
    return p


def _args(tc):
    return json.loads(tc["function"]["arguments"])


def _stream(p, text, chunk=3):
    state = p.make_stream_state()
    deltas = []
    for i in range(0, len(text), chunk):
        deltas.extend(state.feed(text[i: i + chunk]))
    deltas.extend(state.flush())
    return deltas


def _reassemble(deltas):
    content = ""
    calls = {}
    for d in deltas:
        if "content" in d:
            content += d["content"]
        for tc in d.get("tool_calls", []):
            c = calls.setdefault(
                tc["index"], {"name": "", "arguments": ""}
            )
            fn = tc.get("function", {})
            if fn.get("name"):
                c["name"] = fn["name"]
            c["arguments"] += fn.get("arguments", "")
    return content, [calls[i] for i in sorted(calls)]


class TestPoolsideExtract:
    def test_string_param_taken_raw(self):
        # a string param whose value LOOKS like JSON stays a string
        text = (
            "<tool_call>write_file\n"
            "<arg_key>path</arg_key><arg_value>/tmp/x.json</arg_value>"
            "<arg_key>content</arg_key><arg_value>{\"a\": 1}</arg_value>"
            "<arg_key>mode</arg_key><arg_value>420</arg_value>"
            "</tool_call>"
        )
        r = _parser().extract_tool_calls(text)
        assert r.tools_called
        args = _args(r.tool_calls[0])
        assert args["content"] == '{"a": 1}'  # raw, not deserialized
        assert args["mode"] == 420  # non-string coerced
        assert args["path"] == "/tmp/x.json"

    def test_unknown_tool_rejected(self):
        text = (
            "<tool_call>rm_rf\n<arg_key>path</arg_key>"
            "<arg_value>/</arg_value></tool_call>"
        )
        r = _parser().extract_tool_calls(text)
        assert not r.tools_called

    def test_duplicate_keys_first_wins(self):
        text = (
            "<tool_call>write_file\n"
            "<arg_key>path</arg_key><arg_value>first</arg_value>"
            "<arg_key>path</arg_key><arg_value>second</arg_value>"
            "</tool_call>"
        )
        r = _parser().extract_tool_calls(text)
        assert _args(r.tool_calls[0]) == {"path": "first"}

    def test_unclosed_tool_call_stripped_from_content(self):
        text = "Let me write that file.\n<tool_call>write_file\n<arg_key>pa"
        r = _parser().extract_tool_calls(text)
        assert not r.tools_called
        assert r.content == "Let me write that file."

    def test_content_before_call(self):
        text = (
            "Working on it.\n<tool_call>get_time\n</tool_call>"
        )
        r = _parser().extract_tool_calls(text)
        assert r.tools_called
        assert r.content == "Working on it."
        assert _args(r.tool_calls[0]) == {}

    def test_no_schema_falls_back_to_coercion(self):
        p = get_tool_parser("poolside_v1")  # no set_tools
        text = (
            "<tool_call>anything\n<arg_key>n</arg_key>"
            "<arg_value>3</arg_value></tool_call>"
        )
        r = p.extract_tool_calls(text)
        assert r.tools_called
        assert _args(r.tool_calls[0]) == {"n": 3}


class TestPoolsideStreaming:
    def test_string_value_streams_incrementally(self):
        text = (
            "<tool_call>write_file\n"
            "<arg_key>content</arg_key>"
            "<arg_value>line \"one\"\nline two</arg_value>"
            "</tool_call>"
        )
        p = _parser()
        deltas = _stream(p, text, chunk=4)
        content, calls = _reassemble(deltas)
        assert calls[0]["name"] == "write_file"
        assert json.loads(calls[0]["arguments"]) == {
            "content": 'line "one"\nline two'
        }
        # the string value must arrive over MULTIPLE argument deltas
        arg_deltas = [
            tc["function"].get("arguments", "")
            for d in deltas
            for tc in d.get("tool_calls", [])
            if tc["function"].get("arguments")
        ]
        assert len(arg_deltas) > 2

    def test_streamed_matches_extract(self):
        text = (
            "before text <tool_call>write_file\n"
            "<arg_key>path</arg_key><arg_value>/a/b</arg_value>"
            "<arg_key>mode</arg_key><arg_value>384</arg_value>"
            "</tool_call>"
        )
        p = _parser()
        content, calls = _reassemble(_stream(p, text, chunk=2))
        full = p.extract_tool_calls(text)
        assert content.strip() == full.content
        assert json.loads(calls[0]["arguments"]) == _args(
            full.tool_calls[0]
        )

    def test_multiple_calls_indexed(self):
        text = (
            "<tool_call>get_time\n</tool_call>"
            "<tool_call>write_file\n<arg_key>path</arg_key>"
            "<arg_value>x</arg_value></tool_call>"
        )
        _, calls = _reassemble(_stream(_parser(), text, chunk=5))
        assert [c["name"] for c in calls] == ["get_time", "write_file"]
        assert json.loads(calls[0]["arguments"]) == {}
        assert json.loads(calls[1]["arguments"]) == {"path": "x"}

    def test_rejected_call_emits_nothing(self):
        text = (
            "<tool_call>not_a_tool\n<arg_key>x</arg_key>"
            "<arg_value>1</arg_value></tool_call>after"
        )
        deltas = _stream(_parser(), text, chunk=3)
        content, calls = _reassemble(deltas)
        assert not calls or all(not c["name"] for c in calls)
        assert "after" in content

    def test_plain_content_passthrough(self):
        deltas = _stream(_parser(), "just a normal answer", chunk=4)
        content, calls = _reassemble(deltas)
        assert content == "just a normal answer"
        assert not calls

    def test_truncated_string_value_closes_json(self):
        # stream ends mid string value: flush closes the JSON string
        text = (
            "<tool_call>write_file\n"
            "<arg_key>content</arg_key><arg_value>partial tex"
        )
        _, calls = _reassemble(_stream(_parser(), text, chunk=4))
        args = json.loads(calls[0]["arguments"])
        assert args["content"].startswith("partial")

    def test_registry(self):
        from vllm_mlx_tpu.tool_parsers import list_tool_parsers

        assert "poolside_v1" in list_tool_parsers()

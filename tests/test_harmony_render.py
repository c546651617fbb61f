# SPDX-License-Identifier: Apache-2.0
"""Canonical Harmony prompt rendering + prompt canonicalization
(VERDICT r2 missing #9; reference utils/harmony_render.py:217,
api/prompt_canonicalize.py:1-51)."""

import json

from vllm_mlx_tpu.api.prompt_canonicalize import canonicalize_messages
from vllm_mlx_tpu.utils.harmony_render import (
    render_harmony_prompt,
    render_tools_namespace,
)

TOOLS = [
    {
        "type": "function",
        "function": {
            "name": "get_weather",
            "description": "Get weather for a city",
            "parameters": {
                "type": "object",
                "properties": {
                    "city": {"type": "string", "description": "City name"},
                    "units": {"enum": ["c", "f"]},
                    "days": {"type": "integer"},
                },
                "required": ["city"],
            },
        },
    }
]


class TestHarmonyRender:
    def test_structure(self):
        p = render_harmony_prompt(
            [
                {"role": "system", "content": "Be terse."},
                {"role": "user", "content": "hi"},
            ],
            TOOLS,
        )
        assert p.startswith("<|start|>system<|message|>")
        assert "Reasoning: medium" in p
        assert "# Valid channels: analysis, commentary, final." in p
        assert "<|start|>developer<|message|># Instructions" in p
        assert "Be terse." in p
        assert "# Tools" in p and "namespace functions" in p
        assert "type get_weather = (_: {" in p
        assert '"c" | "f"' in p
        assert "city: string," in p  # required: no '?'
        assert "days?: number," in p  # optional
        assert p.endswith("<|start|>user<|message|>hi<|end|><|start|>assistant")

    def test_byte_stable_across_calls(self):
        msgs = [
            {"role": "system", "content": "X"},
            {"role": "user", "content": "q"},
        ]
        assert render_harmony_prompt(msgs, TOOLS) == render_harmony_prompt(
            msgs, TOOLS
        )
        # the date is PINNED by default — no live-date cache busting
        assert "Current date: 2025-01-01" in render_harmony_prompt(msgs)

    def test_assistant_and_tool_turns(self):
        p = render_harmony_prompt(
            [
                {"role": "user", "content": "weather?"},
                {
                    "role": "assistant",
                    "content": "",
                    "tool_calls": [
                        {
                            "function": {
                                "name": "get_weather",
                                "arguments": json.dumps({"city": "Paris"}),
                            }
                        }
                    ],
                },
                {"role": "tool", "name": "get_weather", "content": "20C"},
            ],
            TOOLS,
        )
        assert (
            "<|channel|>commentary to=functions.get_weather "
            "<|constrain|>json<|message|>" in p
        )
        assert "<|start|>functions.get_weather to=assistant" in p

    def test_no_tools_no_namespace(self):
        p = render_harmony_prompt([{"role": "user", "content": "x"}])
        assert "namespace functions" not in p
        assert "commentary channel" not in p


class TestCanonicalize:
    def test_crlf_and_trailing_ws(self):
        msgs = [
            {"role": "system", "content": "line one  \r\nline two\t\r\n\n"},
            {"role": "user", "content": "keep  \r\n as-is"},
        ]
        out = canonicalize_messages(msgs)
        assert out[0]["content"] == "line one\nline two"
        assert out[1]["content"] == "keep  \r\n as-is"  # non-system untouched

    def test_merges_consecutive_system(self):
        out = canonicalize_messages(
            [
                {"role": "system", "content": "a"},
                {"role": "system", "content": "b"},
                {"role": "user", "content": "u"},
            ]
        )
        assert len(out) == 2
        assert out[0]["content"] == "a\n\nb"

    def test_idempotent(self):
        msgs = [{"role": "system", "content": "x \r\ny"}]
        once = canonicalize_messages(msgs)
        assert canonicalize_messages(once) == once

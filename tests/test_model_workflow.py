# SPDX-License-Identifier: Apache-2.0
"""Model workflow (inspect/qualification) + output-collector merge."""

import asyncio

import pytest

from vllm_mlx_tpu.core.output_collector import (
    RequestOutputCollector,
    RequestStreamState,
    merge_outputs,
)
from vllm_mlx_tpu.core.request import RequestOutput
from vllm_mlx_tpu.model_workflow import inspect_model, verify_checkpoint

from test_server import tiny_model_dir  # noqa: F401


class TestModelWorkflow:
    def test_inspect(self, tiny_model_dir):  # noqa: F811
        info = inspect_model(tiny_model_dir)
        assert info["model_type"] == "llama"
        assert info["servable_as"] == "llm"
        assert info["weights"]["param_count"] > 0
        assert info["tokenizer"]["tokenizer_json"]
        assert info["kv_bytes_per_1k_tokens_bf16"] > 0

    def test_qualification_ok(self, tiny_model_dir):  # noqa: F811
        assert verify_checkpoint(tiny_model_dir) == []

    def test_qualification_missing(self, tmp_path):
        problems = verify_checkpoint(str(tmp_path))
        assert problems


class TestOutputCollector:
    def test_merge_semantics(self):
        a = RequestOutput(
            request_id="r", new_token_ids=[1], new_logprobs=[-0.1],
            new_text="he", output_token_ids=[1], output_text="he",
        )
        b = RequestOutput(
            request_id="r", new_token_ids=[2], new_logprobs=[-0.2],
            new_text="llo", output_token_ids=[1, 2], output_text="hello",
            finished=True, finish_reason="stop", completion_tokens=2,
        )
        m = merge_outputs(a, b)
        assert m.new_token_ids == [1, 2]
        assert m.new_text == "hello"
        assert m.new_logprobs == [-0.1, -0.2]
        assert m.finished and m.finish_reason == "stop"
        assert m.output_text == "hello"

    def test_collector_merges_backlog(self):
        async def go():
            loop = asyncio.get_running_loop()
            c = RequestOutputCollector(loop)
            for i in range(3):
                c._put(
                    RequestOutput(
                        request_id="r",
                        new_token_ids=[i],
                        new_text=str(i),
                        output_token_ids=list(range(i + 1)),
                        output_text="".join(map(str, range(i + 1))),
                        finished=(i == 2),
                        finish_reason="stop" if i == 2 else None,
                    )
                )
            out = await c.get()
            assert out.new_token_ids == [0, 1, 2]
            assert out.new_text == "012"
            assert out.finished

        asyncio.run(go())

    def test_stream_interval_gating(self):
        st = RequestStreamState(stream_interval=3)
        outs = [
            RequestOutput(request_id="r", new_token_ids=[i])
            for i in range(5)
        ]
        sent = [st.should_send(o) for o in outs]
        assert sent == [False, False, True, False, False]
        fin = RequestOutput(request_id="r", new_token_ids=[9], finished=True)
        assert st.should_send(fin)

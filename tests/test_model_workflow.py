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


class TestConvertRegisterQualify:
    """acquire/convert/register/qualify workflow (reference
    model_workflow.py:369-680)."""

    @pytest.fixture(scope="class")
    def tiny_llama_dir(self, tmp_path_factory):
        import torch
        from transformers import LlamaConfig, LlamaForCausalLM

        torch.manual_seed(0)
        d = tmp_path_factory.mktemp("wf_model")
        cfg = LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=512,
        )
        LlamaForCausalLM(cfg).eval().save_pretrained(
            d, safe_serialization=True
        )
        return str(d)

    def test_convert_int8_roundtrip(self, tiny_llama_dir, tmp_path):
        """Converted pre-quantized artifact loads through the auto
        loader and generates identically to load-time quantization."""
        import jax.numpy as jnp
        import numpy as np

        from vllm_mlx_tpu.config import ModelConfig
        from vllm_mlx_tpu.model_workflow import convert_model
        from vllm_mlx_tpu.models import decoder, loader
        from vllm_mlx_tpu.ops.quant import quantize_params

        out = str(tmp_path / "artifact-int8")
        manifest = convert_model(
            tiny_llama_dir, out, dtype="float32", quantize="int8"
        )
        assert manifest["status"] == "succeeded"
        assert (tmp_path / "artifact-int8" / "model.safetensors").exists()

        cfg = ModelConfig.from_pretrained(out)
        converted = loader.load_params_auto(out, cfg, dtype="float32")
        reference = quantize_params(
            loader.load_params(tiny_llama_dir, cfg, dtype="float32"),
            bits=8,
        )
        ids = np.random.default_rng(0).integers(2, 128, size=9).tolist()
        la = decoder.dense_forward(converted, cfg, jnp.asarray(ids))
        lb = decoder.dense_forward(reference, cfg, jnp.asarray(ids))
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=1e-5, atol=1e-5
        )

    def test_convert_dry_run(self, tiny_llama_dir, tmp_path):
        from vllm_mlx_tpu.model_workflow import convert_model

        m = convert_model(
            tiny_llama_dir, str(tmp_path / "x"), dry_run=True
        )
        assert m["status"] == "dry_run"
        assert not (tmp_path / "x").exists()

    def test_register_manifest(self, tiny_llama_dir):
        import json
        import os

        from vllm_mlx_tpu.model_workflow import register_model

        payload = register_model(
            tiny_llama_dir, model_id="tiny", served_model_name="tiny-prod",
            tool_call_parser="hermes",
            serving_defaults={"temperature": 0.6},
        )
        assert payload["qualification_required"] is True
        assert payload["production_ready"] is False
        assert os.path.exists(payload["manifest_path"])
        with open(payload["manifest_path"]) as f:
            on_disk = json.load(f)
        assert on_disk["served_model_name"] == "tiny-prod"
        assert on_disk["parser_policy"]["tool_call_parser"] == "hermes"

    def test_qualify_dry_run(self, tmp_path):
        from vllm_mlx_tpu.model_workflow import qualify_model

        out = str(tmp_path / "qual.json")
        payload = qualify_model(
            "tiny", "http://localhost:9", dry_run=True, output_path=out
        )
        assert payload["status"] == "dry_run"
        assert (tmp_path / "qual.json").exists()

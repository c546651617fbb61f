# SPDX-License-Identifier: Apache-2.0
"""api/utils + endpoint policy behaviors."""

import json

from vllm_mlx_tpu.api.utils import clean_output_text, is_mllm_model
from vllm_mlx_tpu.endpoint_model_policies import (
    resolve_embedding_model_name,
    resolve_stt_model_name,
    resolve_tts_model_name,
)


class TestCleanOutput:
    def test_plain_passthrough(self):
        assert clean_output_text("hello world") == "hello world"

    def test_control_tokens_stripped(self):
        assert clean_output_text("answer<|im_end|>") == "answer"
        assert clean_output_text("x<|eot_id|>y</s>") == "xy"

    def test_harmony_final_channel(self):
        text = (
            "<|channel|>analysis<|message|>thinking here<|end|>"
            "<|channel|>final<|message|>The answer is 4.<|return|>"
        )
        assert clean_output_text(text) == "The answer is 4."

    def test_harmony_no_final(self):
        text = "<|channel|>analysis<|message|>only thinking<|end|>"
        assert clean_output_text(text) == ""


class TestMllmDetection:
    def test_text_model(self, tmp_path):
        d = tmp_path / "m"
        d.mkdir()
        (d / "config.json").write_text(json.dumps({"model_type": "llama"}))
        assert not is_mllm_model(str(d))

    def test_vision_config(self, tmp_path):
        d = tmp_path / "m"
        d.mkdir()
        (d / "config.json").write_text(
            json.dumps({"model_type": "qwen3_vl", "vision_config": {}})
        )
        assert is_mllm_model(str(d))

    def test_missing_config(self, tmp_path):
        assert not is_mllm_model(str(tmp_path / "nope"))


class TestEndpointPolicies:
    def test_embedding_alias(self):
        name, err = resolve_embedding_model_name(
            "text-embedding-3-small", "local-bge"
        )
        assert name == "local-bge" and err is None

    def test_embedding_rejects_stt(self):
        name, err = resolve_embedding_model_name("whisper-large", "bge")
        assert err is not None

    def test_stt_alias(self):
        name, err = resolve_stt_model_name("whisper-1", "local-whisper")
        assert name == "local-whisper" and err is None

    def test_stt_rejects_embedding(self):
        _, err = resolve_stt_model_name("bge-m3", "w")
        assert err is not None

    def test_tts_rejects_whisper(self):
        _, err = resolve_tts_model_name("whisper-1", "kokoro")
        assert err is not None


class TestHardwareDetection:
    """optimizations.py rebuild (reference optimizations.py:34-190)."""

    def test_detect_hardware(self):
        from vllm_mlx_tpu.optimizations import detect_hardware

        hw = detect_hardware()
        assert hw.num_devices >= 1
        assert hw.platform  # cpu under the test conftest
        assert hw.device_kind
        assert hw.summary()

    def test_bandwidth_probe(self):
        from vllm_mlx_tpu.optimizations import measure_memory_bandwidth

        r = measure_memory_bandwidth(size_mb=4, iters=2)
        assert r["gb_per_s"] > 0

    def test_recommended_settings(self):
        from vllm_mlx_tpu.optimizations import recommended_settings

        s = recommended_settings()
        assert s["dtype"] in ("bfloat16", "float32")


class TestPluginAndParserAliases:
    def test_vllm_plugin_inactive_without_vllm(self):
        from vllm_mlx_tpu.vllm_plugin import (
            TpuJaxPlatform,
            tpu_platform_plugin,
        )

        assert tpu_platform_plugin() is None  # vllm not in the image
        TpuJaxPlatform.verify_quantization("int8")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            TpuJaxPlatform.verify_quantization("awq")

    def test_poolside_aliases(self):
        from vllm_mlx_tpu.tool_parsers import get_tool_parser
        from vllm_mlx_tpu.reasoning import get_reasoning_parser

        tp = get_tool_parser("poolside_v1")
        out = tp.extract_tool_calls(
            "<tool_call>look_up\n<arg_key>q</arg_key>"
            "<arg_value>\"tpu\"</arg_value></tool_call>"
        )
        assert out.tools_called
        assert out.tool_calls[0]["function"]["name"] == "look_up"
        rp = get_reasoning_parser("poolside_v1")
        think, ans = rp.extract_reasoning("<think>hm</think>yes")
        assert think == "hm" and ans == "yes"

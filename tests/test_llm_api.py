# SPDX-License-Identifier: Apache-2.0
"""LanguageModel high-level API (reference MLXLanguageModel parity:
examples/simple_generate.py generate/stream_generate/chat shapes)."""

import pytest

from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
from vllm_mlx_tpu.models.llm import LanguageModel

from test_server import tiny_model_dir  # noqa: F401  (fixture)


@pytest.fixture(scope="module")
def lm(tiny_model_dir):  # noqa: F811
    from vllm_mlx_tpu.config import ModelConfig

    model = LanguageModel(
        tiny_model_dir,
        cache_config=CacheConfig(
            block_size=8, num_blocks=64, kv_dtype="float32"
        ),
        scheduler_config=SchedulerConfig(
            max_num_seqs=2, max_prefill_tokens=64,
            prefill_chunk_sizes=[32, 64], max_model_len=256,
        ),
    )
    cfg = ModelConfig.from_pretrained(tiny_model_dir)
    cfg.dtype = "float32"
    model.load(config=cfg)
    return model


def test_generate(lm):
    out = lm.generate("hello world", max_tokens=8, temperature=0.0)
    assert out.finish_reason in ("stop", "length")
    assert out.prompt_tokens > 0
    assert out.completion_tokens == len(out.token_ids) > 0
    assert out.generation_time > 0
    assert out.tokens_per_second > 0


def test_stream_generate(lm):
    chunks = list(
        lm.stream_generate("the quick brown", max_tokens=6, temperature=0.0)
    )
    assert chunks[-1].finished
    text = "".join(c.text for c in chunks)
    full = lm.generate("the quick brown", max_tokens=6, temperature=0.0)
    assert text == full.text


def test_chat(lm):
    out = lm.chat(
        [{"role": "user", "content": "hi"}], max_tokens=6, temperature=0.0
    )
    assert isinstance(out.text, str)
    assert out.finish_reason in ("stop", "length")


def test_sampled_generation_differs_by_seed(lm):
    a = lm.generate("hello", max_tokens=8, temperature=1.5, top_p=1.0)
    assert a.completion_tokens > 0

# SPDX-License-Identifier: Apache-2.0
"""Thinking-aware constrained decoding (VERDICT r2 #6; reference
constrained/thinking_processor.py:60-283): a reasoning model under JSON
mode gets an unconstrained think phase, then the close tag is forced
when the budget runs out, then the FSM enforces the schema."""

import asyncio
import json

import pytest

from vllm_mlx_tpu.config import CacheConfig, ModelConfig, SchedulerConfig

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from tokenizers import (
        Tokenizer,
        decoders,
        models,
        pre_tokenizers,
        trainers,
    )
    from transformers import (
        LlamaConfig,
        LlamaForCausalLM,
        PreTrainedTokenizerFast,
    )

    d = tmp_path_factory.mktemp("think_model")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=340,
        special_tokens=["</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(
        ["the quick brown fox </think> thinks deeply"] * 8, trainer
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, eos_token="</s>", pad_token="</s>"
    )
    fast.save_pretrained(d)
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=tok.get_vocab_size(),
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        eos_token_id=fast.eos_token_id,
    )
    LlamaForCausalLM(cfg).eval().save_pretrained(d, safe_serialization=True)
    return str(d)


def _engine(tiny_model_dir):
    from vllm_mlx_tpu.engine.batched import BatchedEngine

    eng = BatchedEngine(
        tiny_model_dir,
        cache_config=CacheConfig(
            block_size=8, num_blocks=64, kv_dtype="float32"
        ),
        scheduler_config=SchedulerConfig(
            max_num_seqs=2,
            max_prefill_tokens=64,
            prefill_chunk_sizes=[16, 64],
            max_model_len=256,
        ),
    )
    mc = ModelConfig.from_pretrained(tiny_model_dir)
    mc.dtype = "float32"
    eng._model_config = mc
    return eng


SCHEMA = {
    "type": "object",
    "properties": {"a": {"type": "integer"}},
    "required": ["a"],
}


def test_budget_forces_close_then_schema(tiny_model_dir):
    """Random weights never emit </think> naturally: after the budget,
    the close tag is forced token-by-token and the suffix is
    schema-valid JSON."""

    async def go():
        eng = _engine(tiny_model_dir)
        await eng.start()
        try:
            text = ""
            async for chunk in eng.stream_generate(
                "the quick brown",
                temperature=0.0,
                max_tokens=80,
                json_schema_enforce=SCHEMA,
                thinking_budget=6,
            ):
                text += chunk.text
            assert "</think>" in text
            think, tail = text.split("</think>", 1)
            # the think phase ran unconstrained for ~budget tokens
            assert len(think) > 0
            obj = json.loads(tail)
            assert isinstance(obj["a"], int)
        finally:
            await eng.stop()

    asyncio.run(go())


def test_zero_budget_means_fsm_from_token_0(tiny_model_dir):
    async def go():
        eng = _engine(tiny_model_dir)
        await eng.start()
        try:
            text = ""
            async for chunk in eng.stream_generate(
                "the quick brown",
                temperature=0.0,
                max_tokens=48,
                json_schema_enforce=SCHEMA,
            ):
                text += chunk.text
            obj = json.loads(text)
            assert isinstance(obj["a"], int)
            assert "</think>" not in text
        finally:
            await eng.stop()

    asyncio.run(go())


def test_natural_close_engages_fsm(tiny_model_dir):
    """Scheduler-level transition (the REAL _process_one_token): when
    the model emits the close tag on its own before the budget, the
    think phase ends and the FSM engages with its state untouched."""

    async def go():
        eng = _engine(tiny_model_dir)
        await eng.start()
        try:
            sched = eng.scheduler
            req = eng._make_request(
                "the quick",
                temperature=0.0,
                max_tokens=160,
                json_schema_enforce=SCHEMA,
                thinking_budget=100,
            )
            assert req.think_phase == "think"
            end_ids = req.think_end_ids
            assert 0 < len(end_ids) <= 8
            init_state = req.fsm_state
            for t in [5, 6, 7] + list(end_ids):
                sched._process_one_token(req, t, 0.0)
            assert req.think_phase is None
            assert req.fsm_state == init_state  # untouched while thinking
            # next enforced token now advances the FSM
            import numpy as np

            mask = req.enforcer.allowed_mask(req.fsm_state)
            tok_id = int(np.flatnonzero(mask)[0])
            sched._process_one_token(req, tok_id, 0.0)
            assert req.fsm_state != init_state
        finally:
            await eng.stop()

    asyncio.run(go())

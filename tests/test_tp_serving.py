# SPDX-License-Identifier: Apache-2.0
"""Tensor-parallel SERVING path (VERDICT r2 #1): ``--tp-size`` builds a
mesh inside BatchedEngine and the full engine stack (scheduler, prefix
cache, speculative rounds, FSM masks) runs over it.

All tests run on the 8-virtual-device CPU mesh (tests/conftest.py) with
tp=2 and assert token-identity against the tp=1 engine — TP must be a
pure layout change (reference has no TP at all; SURVEY §2.8).
"""

import asyncio
import json

import jax
import numpy as np
import pytest

from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs >=2 virtual devices"
)


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    """Tiny Llama checkpoint with TP-divisible geometry (4 q heads,
    2 kv heads, intermediate 128 — all divide tp=2)."""
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

    d = tmp_path_factory.mktemp("tp_model")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=320,
        special_tokens=["</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(
        ["the quick brown fox jumps over the lazy dog"] * 8, trainer
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


def _engine(tiny_model_dir, **kw):
    from vllm_mlx_tpu.config import ModelConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine

    eng = BatchedEngine(
        tiny_model_dir,
        cache_config=CacheConfig(
            block_size=8, num_blocks=64, kv_dtype="float32"
        ),
        scheduler_config=SchedulerConfig(
            max_num_seqs=4,
            max_prefill_tokens=64,
            prefill_chunk_sizes=[16, 64],
            max_model_len=256,
        ),
        **kw,
    )
    mc = ModelConfig.from_pretrained(tiny_model_dir)
    mc.dtype = "float32"
    eng._model_config = mc
    return eng


async def _greedy(eng, prompt, max_tokens=12, **kw):
    out_tokens, out_text = [], ""
    async for chunk in eng.stream_generate(
        prompt, temperature=0.0, max_tokens=max_tokens, **kw
    ):
        out_tokens.extend(chunk.token_ids)
        out_text += chunk.text
    return out_tokens, out_text


def test_tp2_engine_token_identical_to_tp1(tiny_model_dir):
    """The headline contract: serving with --tp-size 2 produces the
    exact token stream of tp=1."""

    async def go():
        e1 = _engine(tiny_model_dir)
        await e1.start()
        ref, ref_text = await _greedy(e1, "the quick brown fox")
        await e1.stop()

        e2 = _engine(tiny_model_dir, tp_size=2)
        await e2.start()
        assert e2.mesh is not None and e2.mesh.shape["tp"] == 2
        # params actually sharded: q_proj row dim split over tp
        q = e2.scheduler.runner.params["layers"][0]["q_proj"]
        assert q.sharding.shard_shape(q.shape)[0] == q.shape[0] // 2
        got, got_text = await _greedy(e2, "the quick brown fox")
        await e2.stop()
        assert got == ref and got_text == ref_text
        assert len(ref) == 12

    asyncio.run(go())


def test_tp2_http_serving_token_identical(tiny_model_dir):
    """HTTP request through the aiohttp app on a tp=2 engine matches
    the tp=1 engine's completion (VERDICT r2 #1 done-criterion)."""
    from aiohttp.test_utils import TestClient, TestServer

    from vllm_mlx_tpu.api.server import build_app

    async def serve_one(tp_size):
        eng = _engine(
            tiny_model_dir, **({"tp_size": tp_size} if tp_size > 1 else {})
        )
        await eng.start()
        app = build_app(eng, served_models=["tiny"], default_max_tokens=16)
        client = TestClient(TestServer(app))
        await client.start_server()
        resp = await client.post(
            "/v1/completions",
            json={
                "model": "tiny",
                "prompt": "the quick brown",
                "max_tokens": 10,
                "temperature": 0.0,
            },
        )
        data = await resp.json()
        await client.close()
        await eng.stop()
        assert resp.status == 200, data
        return data["choices"][0]["text"]

    async def go():
        ref = await serve_one(1)
        got = await serve_one(2)
        assert got == ref

    asyncio.run(go())


def test_tp2_speculative_token_identical(tiny_model_dir):
    """TP x speculative decoding (VERDICT r2 weak #5): draft params and
    draft KV pages shard over the same mesh; greedy output is identical
    to the plain tp=1 engine."""

    async def go():
        e1 = _engine(tiny_model_dir)
        await e1.start()
        ref, _ = await _greedy(e1, "the quick brown fox jumps")
        await e1.stop()

        e2 = _engine(
            tiny_model_dir,
            tp_size=2,
            speculative_model=tiny_model_dir,  # self-draft: always accepts
            num_speculative_tokens=2,
        )
        await e2.start()
        runner = e2.scheduler.runner
        assert runner.state.draft_pages is not None
        # draft pool sharded over tp on the combined-kv-head axis
        dp = runner.state.draft_pages[0]
        assert dp.sharding.shard_shape(dp.shape)[2] == dp.shape[2] // 2
        got, _ = await _greedy(e2, "the quick brown fox jumps")
        await e2.stop()
        assert got == ref

    asyncio.run(go())


def test_tp2_fsm_constrained_json(tiny_model_dir):
    """TP x FSM-constrained decoding: packed vocab bitmasks apply under
    the mesh and the output is schema-valid JSON."""

    async def go():
        eng = _engine(tiny_model_dir, tp_size=2)
        await eng.start()
        schema = {
            "type": "object",
            "properties": {"a": {"type": "integer"}},
            "required": ["a"],
        }
        _, text = await _greedy(
            eng,
            "the quick brown",
            max_tokens=48,
            json_schema_enforce=schema,
        )
        await eng.stop()
        obj = json.loads(text)
        assert isinstance(obj["a"], int)

    asyncio.run(go())


def test_state_pspecs_cover_optional_state():
    """state_pspecs must mirror RunnerState's optional fields
    (draft_pages, ssm_states) or device_put fails on pytree mismatch
    (VERDICT r2 missing #2)."""
    import jax.numpy as jnp

    from vllm_mlx_tpu.core.model_runner import RunnerState
    from vllm_mlx_tpu.ops.sampling import SamplingState
    from vllm_mlx_tpu.parallel.mesh import make_mesh, shard_runner_state

    mesh = make_mesh(dp=1, tp=2)
    slots = 2
    state = RunnerState(
        kv_pages=[jnp.zeros((4, 8, 4, 16), jnp.float32)],
        device_tokens=jnp.zeros((slots,), jnp.int32),
        sampling=SamplingState.init(slots, 64),
        step_count=jnp.zeros((), jnp.int32),
        block_tables=jnp.zeros((slots, 4), jnp.int32),
        kv_lens=jnp.zeros((slots,), jnp.int32),
        n_active=jnp.zeros((), jnp.int32),
        rope_deltas=jnp.zeros((slots,), jnp.int32),
        draft_pages=[jnp.zeros((4, 8, 4, 16), jnp.float32)],
        ssm_states=[
            (
                jnp.zeros((slots, 8, 4), jnp.float32),
                jnp.zeros((slots, 2, 4, 8), jnp.float32),
            )
        ],
    )
    sharded = shard_runner_state(mesh, state)
    kv = sharded.kv_pages[0]
    assert kv.sharding.shard_shape(kv.shape)[2] == kv.shape[2] // 2
    dp = sharded.draft_pages[0]
    assert dp.sharding.shard_shape(dp.shape)[2] == dp.shape[2] // 2
    conv, ssm = sharded.ssm_states[0]
    # replicated (mixer params carry no TP rule)
    assert conv.sharding.shard_shape(conv.shape) == conv.shape
    assert ssm.sharding.shard_shape(ssm.shape) == ssm.shape


def test_tp_dp_mutually_exclusive(tiny_model_dir):
    from vllm_mlx_tpu.engine.batched import BatchedEngine

    with pytest.raises(ValueError, match="mutually exclusive"):
        BatchedEngine(
            tiny_model_dir, tp_size=2, device=jax.devices()[0]
        )

# SPDX-License-Identifier: Apache-2.0
"""Data-parallel engine replicas behind the least-loaded router
(SURVEY §2.8 DP)."""

import asyncio

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import LlamaConfig, LlamaForCausalLM, PreTrainedTokenizerFast

    d = tmp_path_factory.mktemp("dp_model")
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=300,
        special_tokens=["</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(["the quick brown fox jumps"] * 8, trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, eos_token="</s>", pad_token="</s>"
    )
    fast.save_pretrained(d)
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=tok.get_vocab_size(), hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=512,
        eos_token_id=fast.eos_token_id,
    )
    LlamaForCausalLM(cfg).eval().save_pretrained(d, safe_serialization=True)
    return str(d)


def test_dp_replicas_route_and_agree(tiny_model_dir):
    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.dp import DPEngine

    async def go():
        eng = DPEngine(
            tiny_model_dir,
            dp_size=2,
            cache_config=CacheConfig(
                block_size=8, num_blocks=32, kv_dtype="float32"
            ),
            scheduler_config=SchedulerConfig(
                max_num_seqs=2, max_prefill_tokens=64,
                prefill_chunk_sizes=[16, 64], max_model_len=256,
            ),
        )
        await eng.start()
        try:
            assert eng.is_running and len(eng.replicas) == 2

            async def run_one(i):
                out = None
                async for chunk in eng.stream_generate(
                    "the quick brown", request_id=f"r{i}",
                    temperature=0.0, max_tokens=8,
                ):
                    out = chunk
                return out.token_ids if hasattr(out, "token_ids") else out

            results = await asyncio.gather(*[run_one(i) for i in range(4)])
            # identical greedy outputs regardless of which replica served
            texts = [getattr(r, "text", r) for r in results]
            assert len(set(map(str, texts))) == 1
            stats = eng.get_stats()
            assert stats["dp_size"] == 2
            per_finished = [
                p.get("num_finished", 0) for p in stats["replicas"]
            ]
            assert sum(per_finished) == 4
            assert all(n > 0 for n in per_finished)  # both replicas used
            assert stats["num_finished"] == 4
        finally:
            await eng.stop()

    asyncio.run(go())


def test_dp_abort_routes_home(tiny_model_dir):
    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.dp import DPEngine

    async def go():
        eng = DPEngine(
            tiny_model_dir,
            dp_size=2,
            cache_config=CacheConfig(
                block_size=8, num_blocks=32, kv_dtype="float32"
            ),
            scheduler_config=SchedulerConfig(
                max_num_seqs=2, max_prefill_tokens=64,
                prefill_chunk_sizes=[16, 64], max_model_len=256,
            ),
        )
        await eng.start()
        try:
            agen = eng.stream_generate(
                "the quick", request_id="doomed",
                temperature=0.0, max_tokens=200,
            )
            got_one = False
            async for _ in agen:
                if not got_one:
                    got_one = True
                    eng.abort_request("doomed")
            assert got_one
        finally:
            await eng.stop()

    asyncio.run(go())


def test_dp_tp_composition(tiny_model_dir):
    """dp=2 x tp=2 over the 8-virtual-device CPU mesh: each replica
    owns a DISJOINT tp-submesh, greedy outputs are identical across
    replicas and equal to a plain single-engine run (VERDICT r3 #9 —
    the v5e-8 dp=2 x tp=4 shape at test scale)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")

    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine
    from vllm_mlx_tpu.engine.dp import DPEngine

    cache = dict(block_size=8, num_blocks=32, kv_dtype="float32")
    sched = dict(
        max_num_seqs=2, max_prefill_tokens=64,
        prefill_chunk_sizes=[16, 64], max_model_len=256,
    )

    async def go():
        # reference: a single tp=2 engine (tp=2 vs tp=1 identity is
        # test_tp_serving's contract; here we isolate the DP routing)
        ref_engine = BatchedEngine(
            tiny_model_dir,
            tp_size=2,
            cache_config=CacheConfig(**cache),
            scheduler_config=SchedulerConfig(**sched),
        )
        await ref_engine.start()
        try:
            ref = await ref_engine.generate(
                "the quick brown", temperature=0.0, max_tokens=8
            )
        finally:
            await ref_engine.stop()

        eng = DPEngine(
            tiny_model_dir,
            dp_size=2,
            tp_size=2,
            cache_config=CacheConfig(**cache),
            scheduler_config=SchedulerConfig(**sched),
        )
        await eng.start()
        try:
            meshes = [r.mesh for r in eng.replicas]
            assert all(m is not None and m.shape["tp"] == 2 for m in meshes)
            devs = [tuple(map(str, m.devices.flat)) for m in meshes]
            assert not (set(devs[0]) & set(devs[1])), "submeshes overlap"

            # sequential sends: concurrent requests would batch inside
            # a replica, and a different ragged bucket can flip logits
            # ties on this tiny random model (the round-robin tie-break
            # still alternates replicas across sends)
            results = [
                await eng.generate(
                    "the quick brown", request_id=f"dtp{i}",
                    temperature=0.0, max_tokens=8,
                )
                for i in range(4)
            ]
            for r in results:
                assert r.token_ids == ref.token_ids
        finally:
            await eng.stop()

    asyncio.run(go())

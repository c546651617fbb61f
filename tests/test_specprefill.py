# SPDX-License-Identifier: Apache-2.0
"""SpecPrefill: attention-guided sparse prefill (reference
specprefill.py:53-829)."""

import numpy as np
import pytest

from vllm_mlx_tpu.config import CacheConfig, ModelConfig, SchedulerConfig
from vllm_mlx_tpu.core.model_runner import ModelRunner
from vllm_mlx_tpu.core.request import Request, SamplingParams
from vllm_mlx_tpu.core.scheduler import Scheduler
from vllm_mlx_tpu.models import loader
from vllm_mlx_tpu.specprefill import (
    SpecPrefillScorer,
    prune_prompt,
    select_chunks,
)


@pytest.fixture(scope="module")
def tiny_cfg():
    return ModelConfig(
        model_type="llama", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=2048, dtype="float32",
    )


@pytest.fixture(scope="module")
def tiny_params(tiny_cfg):
    return loader.init_params(tiny_cfg, seed=11, dtype="float32")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(23)


class TestSelectChunks:
    def test_keep_all(self):
        imp = np.linspace(0, 1, 100)
        assert len(select_chunks(imp, keep_pct=1.0)) == 100

    def test_top_chunks_win(self):
        imp = np.zeros(128)
        imp[32:64] = 10.0  # chunk 1 (size 32)
        idx = select_chunks(imp, keep_pct=0.25, chunk_size=32)
        assert set(idx) == set(range(32, 64))

    def test_backbone_spacing(self):
        imp = np.zeros(320)
        imp[:32] = 5.0
        idx = select_chunks(
            imp, keep_pct=0.5, chunk_size=32, backbone_pct=0.3
        )
        chunks = sorted(set(i // 32 for i in idx))
        assert 9 in chunks  # backbone reaches the end
        assert 0 in chunks  # top chunk kept

    def test_token_target_met(self):
        imp = np.random.default_rng(0).random(1000)
        idx = select_chunks(imp, keep_pct=0.3, chunk_size=32)
        assert len(idx) >= 300


class TestScorer:
    def test_scores_shape_and_determinism(self, tiny_cfg, tiny_params, rng):
        scorer = SpecPrefillScorer(tiny_params, tiny_cfg)
        toks = rng.integers(2, 128, size=100).tolist()
        a = scorer.score_tokens(toks, n_lookahead=4)
        b = scorer.score_tokens(toks, n_lookahead=4)
        assert a.shape == (100,)
        assert np.all(np.isfinite(a)) and np.all(a >= 0)
        np.testing.assert_array_equal(a, b)

    def test_prune_keeps_anchor_and_tail(self, tiny_cfg, tiny_params, rng):
        scorer = SpecPrefillScorer(tiny_params, tiny_cfg)
        toks = rng.integers(2, 128, size=300).tolist()
        pruned, positions, delta = prune_prompt(
            toks, scorer, keep_pct=0.3, keep_tail=16
        )
        assert len(pruned) < 300
        assert delta == 300 - len(pruned)
        assert positions[0] == 0  # attention sink kept
        assert list(positions[-16:]) == list(range(284, 300))  # tail kept
        assert all(
            toks[p] == t for p, t in zip(positions, pruned)
        )


class TestRopeOverridePlumbing:
    def test_pruned_prompt_matches_dense_reference(
        self, tiny_cfg, tiny_params, rng
    ):
        """Serving a pruned prompt with original-position rope must be
        token-identical to a dense forward over the gathered tokens with
        explicit positions — validates the override end-to-end
        (chunked prefill rows, decode fast path delta, kv compaction)."""
        import jax.numpy as jnp

        from vllm_mlx_tpu.models import decoder

        full = rng.integers(2, 128, size=60).tolist()
        kept = sorted(
            set([0] + rng.choice(np.arange(1, 59), 30, replace=False).tolist()
                + [59])
        )
        pruned = [full[i] for i in kept]
        positions = np.asarray(kept, np.int32)
        delta = len(full) - len(pruned)

        runner = ModelRunner(
            tiny_cfg, tiny_params,
            CacheConfig(block_size=8, num_blocks=64, kv_dtype="float32"),
            SchedulerConfig(max_num_seqs=2, max_prefill_tokens=64,
                            prefill_chunk_sizes=[16, 64], max_model_len=256),
        )
        sched = Scheduler(runner, tokenizer=None, stop_tokens=set())
        req = Request(
            request_id="sp",
            prompt=list(pruned),
            sampling_params=SamplingParams(temperature=0.0, max_tokens=10),
            rope_positions=positions,
            mrope_delta=delta,
        )
        sched.add_request(req)
        outs = {}
        steps = 0
        while sched.has_unfinished():
            for o in sched.step():
                if o.finished:
                    outs[o.request_id] = o
            steps += 1
            assert steps < 200
        got = outs["sp"].output_token_ids

        # dense reference: pruned tokens at original rope positions;
        # generated tokens continue at len(full) + i
        seq = list(pruned)
        pos = list(kept)
        expected = []
        for i in range(10):
            logits = decoder.dense_forward(
                tiny_params, tiny_cfg, jnp.asarray(seq, jnp.int32),
                positions=jnp.asarray(pos, jnp.int32),
            )
            nxt = int(np.argmax(np.asarray(logits[-1])))
            expected.append(nxt)
            seq.append(nxt)
            pos.append(len(full) + i)
        assert got == expected

    def test_pruned_requests_never_share_prefix_cache(
        self, tiny_cfg, tiny_params, rng
    ):
        from vllm_mlx_tpu.cache.prefix_cache import PrefixCache

        pc = PrefixCache(8)
        runner = ModelRunner(
            tiny_cfg, tiny_params,
            CacheConfig(block_size=8, num_blocks=64, kv_dtype="float32"),
            SchedulerConfig(max_num_seqs=2, max_prefill_tokens=64,
                            prefill_chunk_sizes=[16, 64], max_model_len=256),
        )
        sched = Scheduler(
            runner, tokenizer=None, stop_tokens=set(), prefix_cache=pc
        )
        toks = rng.integers(2, 128, size=40).tolist()

        def run(rid, rope):
            req = Request(
                request_id=rid, prompt=list(toks),
                sampling_params=SamplingParams(temperature=0.0, max_tokens=2),
                rope_positions=rope, mrope_delta=0 if rope is None else 5,
            )
            sched.add_request(req)
            steps = 0
            while sched.has_unfinished():
                sched.step()
                steps += 1
                assert steps < 100
            return req

        # pruned request: published nothing, fetched nothing
        rope = np.arange(5, 45, dtype=np.int32)  # shifted positions
        run("p1", rope)
        assert sched.block_mgr.num_cached_blocks == 0
        r2 = run("p2", rope)
        assert r2.cached_tokens == 0


class TestEngineIntegration:
    def test_maybe_specprefill_prunes_long_prompts(
        self, tiny_cfg, tiny_params, rng
    ):
        from vllm_mlx_tpu.engine.batched import BatchedEngine

        eng = BatchedEngine.__new__(BatchedEngine)
        eng._specprefill = SpecPrefillScorer(tiny_params, tiny_cfg)
        eng.specprefill_keep_pct = 0.3
        eng.specprefill_min_tokens = 64
        eng._tokenizer = None

        long_ids = rng.integers(2, 128, size=200).tolist()
        req = Request(
            request_id="x", prompt=long_ids,
            sampling_params=SamplingParams(max_tokens=4),
            prompt_token_ids=list(long_ids),
        )
        eng._maybe_specprefill(req)
        assert len(req.prompt_token_ids) < 200
        assert req.rope_positions is not None
        assert req.mrope_delta == 200 - len(req.prompt_token_ids)

        short = Request(
            request_id="y", prompt=[1, 2, 3],
            sampling_params=SamplingParams(max_tokens=4),
            prompt_token_ids=[1, 2, 3],
        )
        eng._maybe_specprefill(short)
        assert short.rope_positions is None

# SPDX-License-Identifier: Apache-2.0
"""Gemma-3n text stack parity + serving (HF modeling_gemma3n.py,
Gemma3nForCausalLM). The reference lists the family as "Gemma 4 …
(vision + audio)" (reference docs/reference/models.md:38); this file
pins the exotic text decoder: AltUp 4-stream residuals, LAuReL,
per-layer input embeddings, KV-shared layers (pool aliasing), dual
rope (local theta on sliding layers), activation-sparsity gelu, and
weightless v-norm. HF logits parity at f32 and token-identical served
generation through the scheduler (chunked prefill crossing the
KV-share boundary)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from vllm_mlx_tpu.config import ModelConfig  # noqa: E402
from vllm_mlx_tpu.models import decoder, loader  # noqa: E402

# layers 4/5 are KV-shared: 4 (sliding) aliases layer 2, 5 (full)
# aliases layer 3 — both attention types exercised on both sides
LAYER_TYPES = [
    "sliding_attention",
    "full_attention",
    "sliding_attention",
    "full_attention",
    "sliding_attention",
    "full_attention",
]


def _make(tmp_path_factory, seed: int, name: str):
    from transformers import Gemma3nForCausalLM, Gemma3nTextConfig

    torch.manual_seed(seed)
    cfg = Gemma3nTextConfig(
        vocab_size=96,
        vocab_size_per_layer_input=96,
        hidden_size=32,
        hidden_size_per_layer_input=8,
        intermediate_size=64,
        num_hidden_layers=6,
        num_attention_heads=2,
        num_key_value_heads=1,
        head_dim=16,
        sliding_window=8,
        layer_types=list(LAYER_TYPES),
        num_kv_shared_layers=2,
        laurel_rank=4,
        activation_sparsity_pattern=[0.95, 0.95, 0.0, 0.0, 0.0, 0.0],
        pad_token_id=0,
    )
    model = Gemma3nForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp(name)
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    return _make(tmp_path_factory, seed=3, name="g3n")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(45)


class TestConfigAndPools:
    def test_config_map(self, tiny):
        _, path = tiny
        cfg = ModelConfig.from_pretrained(path)
        assert cfg.model_type == "gemma3n_text"
        assert cfg.layer_types == [
            "sliding_attention",
            "full_attention",
            "sliding_attention",
            "full_attention",
            "sliding_attention_shared",
            "full_attention_shared",
        ]
        assert cfg.attn_scale == 1.0
        assert cfg.final_softcap == 30.0
        assert cfg.rope_theta == 1_000_000.0
        assert cfg.rope_local_theta == 10_000.0
        g = cfg.gemma3n_cfg
        assert g["num_kv_shared_layers"] == 2
        assert g["activation_sparsity_pattern"][:2] == [0.95, 0.95]

    def test_pool_plan(self, tiny):
        from vllm_mlx_tpu.models.gemma3n_text import pool_plan

        _, path = tiny
        cfg = ModelConfig.from_pretrained(path)
        pool_of, writes = pool_plan(cfg)
        assert pool_of == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2, 5: 3}
        assert writes == {
            0: True, 1: True, 2: True, 3: True, 4: False, 5: False,
        }


class TestDenseParity:
    def test_logits_match_hf(self, tiny, rng):
        model, path = tiny
        cfg = ModelConfig.from_pretrained(path)
        params = loader.load_params(path, cfg, dtype="float32")
        # shared layers carry no k/v projections
        assert "k_proj" in params["layers"][3]
        assert "k_proj" not in params["layers"][4]
        assert "correct_output_scale" in params["layers"][0]["altup"]
        # 23 tokens > sliding_window=8 so the local mask binds
        ids = rng.integers(2, 96, size=23).tolist()
        with torch.no_grad():
            ref = model(torch.tensor([ids])).logits[0].numpy()
        mine = np.asarray(
            decoder.dense_forward(params, cfg, jnp.asarray(ids, jnp.int32))
        )
        np.testing.assert_allclose(mine, ref, rtol=2e-3, atol=2e-3)

    def test_sparsity_gelu_binds(self, tiny, rng):
        """Zeroing the activation-sparsity pattern must CHANGE layer-0
        logits (guards against silently skipping the gaussian top-k)."""
        _, path = tiny
        cfg = ModelConfig.from_pretrained(path)
        params = loader.load_params(path, cfg, dtype="float32")
        ids = jnp.asarray(rng.integers(2, 96, size=7), jnp.int32)
        a = np.asarray(decoder.dense_forward(params, cfg, ids))
        cfg.gemma3n_cfg["activation_sparsity_pattern"] = [0.0] * 6
        b = np.asarray(decoder.dense_forward(params, cfg, ids))
        assert np.abs(a - b).max() > 1e-4


class TestServed:
    def test_served_matches_hf_generate(self, tiny, rng):
        """Two concurrent requests through the scheduler with chunked
        prefill; decode crosses the sliding window so the aliased pools
        serve both the writing layers and the KV-shared readers."""
        from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
        from vllm_mlx_tpu.core.model_runner import ModelRunner
        from vllm_mlx_tpu.core.request import Request, SamplingParams
        from vllm_mlx_tpu.core.scheduler import Scheduler

        model, path = tiny
        prompts = {
            "a": rng.integers(2, 96, size=21).tolist(),
            "b": rng.integers(2, 96, size=6).tolist(),
        }
        max_new = 12
        refs = {}
        with torch.no_grad():
            for rid, pr in prompts.items():
                refs[rid] = model.generate(
                    torch.tensor([pr]),
                    attention_mask=torch.ones((1, len(pr)), dtype=torch.long),
                    max_new_tokens=max_new,
                    do_sample=False,
                )[0, len(pr):].tolist()
        cfg = ModelConfig.from_pretrained(path)
        cfg.dtype = "float32"
        params = loader.load_params(path, cfg, dtype="float32")
        runner = ModelRunner(
            cfg, params,
            CacheConfig(block_size=8, num_blocks=64, kv_dtype="float32"),
            SchedulerConfig(max_num_seqs=2, max_prefill_tokens=64,
                            prefill_chunk_sizes=[16, 64],
                            max_model_len=256),
        )
        # only the 4 non-shared layers own pools
        assert len(runner.state.kv_pages) == 4
        sched = Scheduler(runner, tokenizer=None, stop_tokens=set())
        for rid, pr in prompts.items():
            sched.add_request(Request(
                request_id=rid, prompt=list(pr),
                sampling_params=SamplingParams(
                    temperature=0.0, max_tokens=max_new
                ),
            ))
        outs = {}
        steps = 0
        while sched.has_unfinished():
            for o in sched.step():
                if o.finished:
                    outs[o.request_id] = o
            steps += 1
            assert steps < 300
        import sys as _sys

        _sys.path.insert(0, "tests")
        from vlm_test_utils import assert_tied_greedy_text

        for rid in prompts:
            assert_tied_greedy_text(
                outs[rid].output_token_ids, refs[rid], model, prompts[rid]
            )

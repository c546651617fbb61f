# SPDX-License-Identifier: Apache-2.0
"""Hybrid-SSM prefix caching (VERDICT r2 #10; reference
utils/mamba_cache.py:99-201 gates rather than disables): KV blocks
alias as usual, and per-request (conv, ssm) state snapshots at the
prompt's last full block boundary make the hit restorable. Token
identity against HF greedy is the bar — a wrong restored state would
change tokens immediately."""

import numpy as np
import pytest

from vllm_mlx_tpu.config import CacheConfig, ModelConfig, SchedulerConfig
from vllm_mlx_tpu.models import loader

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_bamba(tmp_path_factory):
    from transformers import BambaConfig, BambaForCausalLM

    torch.manual_seed(1)
    cfg = BambaConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        attn_layer_indices=[1],
        mamba_n_heads=4,
        mamba_d_state=16,
        mamba_n_groups=2,
        mamba_d_conv=4,
        mamba_expand=2,
        mamba_chunk_size=8,
        max_position_embeddings=512,
        tie_word_embeddings=False,
    )
    model = BambaForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("bamba_pc")
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(31)


def _build(path, with_cache=True):
    from vllm_mlx_tpu.cache.prefix_cache import PrefixCache
    from vllm_mlx_tpu.cache.ssm_cache import SsmStateCache
    from vllm_mlx_tpu.core.model_runner import ModelRunner
    from vllm_mlx_tpu.core.scheduler import Scheduler

    cfg = ModelConfig.from_pretrained(path)
    cfg.dtype = "float32"
    params = loader.load_params(path, cfg, dtype="float32")
    runner = ModelRunner(
        cfg,
        params,
        CacheConfig(block_size=8, num_blocks=64, kv_dtype="float32"),
        SchedulerConfig(
            max_num_seqs=2,
            max_prefill_tokens=64,
            prefill_chunk_sizes=[16, 64],
            max_model_len=256,
        ),
    )
    pc = PrefixCache(8) if with_cache else None
    ssm = SsmStateCache() if with_cache else None
    sched = Scheduler(
        runner, tokenizer=None, stop_tokens=set(),
        prefix_cache=pc, ssm_cache=ssm,
    )
    return sched, ssm


def _run(sched, rid, prompt, max_new=10):
    from vllm_mlx_tpu.core.request import Request, SamplingParams

    sched.add_request(
        Request(
            request_id=rid,
            prompt=list(prompt),
            sampling_params=SamplingParams(temperature=0.0,
                                           max_tokens=max_new),
        )
    )
    out = None
    steps = 0
    while sched.has_unfinished():
        for o in sched.step():
            if o.finished and o.request_id == rid:
                out = o
        steps += 1
        assert steps < 400
    return out


def test_hybrid_prefix_hit_token_identical(tiny_bamba, rng):
    model, path = tiny_bamba
    prompt = rng.integers(2, 96, size=37).tolist()  # 4 full blocks + 5
    longer = prompt + rng.integers(2, 96, size=7).tolist()
    with torch.no_grad():
        ref_a = model.generate(
            torch.tensor([prompt]), max_new_tokens=10, do_sample=False
        )[0, len(prompt):].tolist()
        ref_b = model.generate(
            torch.tensor([longer]), max_new_tokens=10, do_sample=False
        )[0, len(longer):].tolist()

    import sys as _sys

    _sys.path.insert(0, "tests")
    from vlm_test_utils import assert_tied_greedy_text

    sched, ssm = _build(path)
    out_a = _run(sched, "a", prompt)
    assert_tied_greedy_text(out_a.output_token_ids, ref_a, model, prompt)
    # one snapshot captured at the last full block boundary (32 tokens)
    stats = ssm.get_stats()
    assert stats["stored"] >= 1

    # same prompt again: resumes from the snapshot, still identical
    # (engine-vs-engine identity stays strict — that's the invariant)
    out_a2 = _run(sched, "a2", prompt)
    assert out_a2.output_token_ids == out_a.output_token_ids
    assert ssm.get_stats()["hits"] >= 1
    assert out_a2.cached_tokens == 32

    # longer prompt sharing the prefix: restore + re-prefill the tail
    out_b = _run(sched, "b", longer)
    assert_tied_greedy_text(out_b.output_token_ids, ref_b, model, longer)
    assert out_b.cached_tokens == 32


def test_hybrid_no_snapshot_means_full_prefill(tiny_bamba, rng):
    """A matched KV chain WITHOUT a state snapshot is unusable: the
    request re-prefills from scratch (cached_tokens == 0) instead of
    serving corrupt state."""
    model, path = tiny_bamba
    prompt = rng.integers(2, 96, size=21).tolist()
    sched, ssm = _build(path)
    out1 = _run(sched, "x", prompt)
    # sabotage: drop the snapshots but keep the KV chain
    ssm.clear()
    out2 = _run(sched, "y", prompt)
    assert out2.cached_tokens == 0
    assert out2.output_token_ids == out1.output_token_ids


def test_hybrid_cache_disabled_still_works(tiny_bamba, rng):
    model, path = tiny_bamba
    prompt = rng.integers(2, 96, size=19).tolist()
    with torch.no_grad():
        ref = model.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False
        )[0, len(prompt):].tolist()
    sched, _ = _build(path, with_cache=False)
    out = _run(sched, "p", prompt, max_new=8)
    import sys as _sys

    _sys.path.insert(0, "tests")
    from vlm_test_utils import assert_tied_greedy_text

    assert_tied_greedy_text(out.output_token_ids, ref, model, prompt)

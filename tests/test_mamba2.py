# SPDX-License-Identifier: Apache-2.0
"""Mamba2 / Bamba (hybrid attention+SSD) parity vs HuggingFace and
serving through the unified engine (reference utils/mamba_cache.py —
hybrid SSM support)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from vllm_mlx_tpu.config import ModelConfig  # noqa: E402
from vllm_mlx_tpu.models import decoder, loader  # noqa: E402


@pytest.fixture(scope="module")
def tiny_mamba2(tmp_path_factory):
    from transformers import Mamba2Config, Mamba2ForCausalLM

    torch.manual_seed(0)
    cfg = Mamba2Config(
        vocab_size=96,
        hidden_size=32,
        num_hidden_layers=2,
        num_heads=4,
        head_dim=16,  # expand*hidden / heads = 64/4
        state_size=16,
        n_groups=2,
        conv_kernel=4,
        expand=2,
        chunk_size=8,
        tie_word_embeddings=False,
    )
    model = Mamba2ForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("mamba2")
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


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
    d = tmp_path_factory.mktemp("bamba")
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(31)


class TestDenseParity:
    def test_mamba2_logits_match_hf(self, tiny_mamba2, rng):
        model, path = tiny_mamba2
        cfg = ModelConfig.from_pretrained(path)
        assert cfg.layer_types == ["mamba", "mamba"]
        assert not cfg.block_has_mlp
        params = loader.load_params(path, cfg, dtype="float32")
        ids = rng.integers(2, 96, size=21).tolist()
        with torch.no_grad():
            ref = model(torch.tensor([ids])).logits[0].numpy()
        mine = np.asarray(
            decoder.dense_forward(params, cfg, jnp.asarray(ids, jnp.int32))
        )
        np.testing.assert_allclose(mine, ref, rtol=2e-3, atol=2e-3)

    def test_bamba_logits_match_hf(self, tiny_bamba, rng):
        model, path = tiny_bamba
        cfg = ModelConfig.from_pretrained(path)
        assert cfg.layer_types == ["mamba", "full_attention", "mamba"]
        assert cfg.block_has_mlp
        assert cfg.partial_rotary_factor == 0.5
        params = loader.load_params(path, cfg, dtype="float32")
        ids = rng.integers(2, 96, size=17).tolist()
        with torch.no_grad():
            ref = model(torch.tensor([ids])).logits[0].numpy()
        mine = np.asarray(
            decoder.dense_forward(params, cfg, jnp.asarray(ids, jnp.int32))
        )
        np.testing.assert_allclose(mine, ref, rtol=2e-3, atol=2e-3)


class TestStatefulStep:
    def test_sequence_then_steps_matches_full_scan(self, tiny_mamba2, rng):
        """Carrying (conv, ssm) state: scanning a prefix then stepping
        token-by-token equals one full-sequence scan (the serving
        contract: chunked prefill + decode)."""
        from vllm_mlx_tpu.models.mamba2 import (
            MambaMixerConfig,
            init_mixer_states,
            mixer_sequence,
            mixer_step,
        )

        _, path = tiny_mamba2
        cfg = ModelConfig.from_pretrained(path)
        params = loader.load_params(path, cfg, dtype="float32")
        mc = MambaMixerConfig(**cfg.mamba_cfg)
        p = params["layers"][0]["mamba"]
        x = jnp.asarray(
            rng.standard_normal((12, cfg.hidden_size)) * 0.3, jnp.float32
        )
        y_full, conv_full, ssm_full = mixer_sequence(
            p, mc, x, None,
            jnp.zeros((mc.conv_dim, mc.conv_kernel), jnp.float32),
            jnp.zeros((mc.num_heads, mc.head_dim, mc.state_size),
                      jnp.float32),
        )
        # prefix of 7, then 5 single-token steps
        y_pre, conv, ssm = mixer_sequence(
            p, mc, x[:7], None,
            jnp.zeros((mc.conv_dim, mc.conv_kernel), jnp.float32),
            jnp.zeros((mc.num_heads, mc.head_dim, mc.state_size),
                      jnp.float32),
        )
        ys = [np.asarray(y_pre)]
        conv_b = conv[None]
        ssm_b = ssm[None]
        for t in range(7, 12):
            y_t, conv_b, ssm_b = mixer_step(
                p, mc, x[t][None], jnp.asarray([True]), conv_b, ssm_b
            )
            ys.append(np.asarray(y_t))
        got = np.concatenate(ys, axis=0)
        np.testing.assert_allclose(
            got, np.asarray(y_full), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(conv_b[0]), np.asarray(conv_full), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ssm_b[0]), np.asarray(ssm_full), rtol=1e-4,
            atol=1e-4,
        )

    def test_bamba_served_matches_hf_generate(self, tiny_bamba, rng):
        """Hybrid model through the continuous-batching scheduler:
        chunked prefill (in-step scan with carried state), batched
        decode (closed-form per-slot update), attention layers on the
        paged pool — token-identical to HF greedy generate. Two
        concurrent requests share compiled steps."""
        from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
        from vllm_mlx_tpu.core.model_runner import ModelRunner
        from vllm_mlx_tpu.core.request import Request, SamplingParams
        from vllm_mlx_tpu.core.scheduler import Scheduler

        model, path = tiny_bamba
        cfg = ModelConfig.from_pretrained(path)
        cfg.dtype = "float32"
        params = loader.load_params(path, cfg, dtype="float32")
        prompt_a = rng.integers(2, 96, size=37).tolist()
        prompt_b = rng.integers(2, 96, size=9).tolist()
        with torch.no_grad():
            ref_a = model.generate(
                torch.tensor([prompt_a]), max_new_tokens=12, do_sample=False
            )[0, len(prompt_a):].tolist()
            ref_b = model.generate(
                torch.tensor([prompt_b]), max_new_tokens=12, do_sample=False
            )[0, len(prompt_b):].tolist()

        runner = ModelRunner(
            cfg, params,
            CacheConfig(block_size=8, num_blocks=64, kv_dtype="float32"),
            SchedulerConfig(max_num_seqs=2, max_prefill_tokens=64,
                            prefill_chunk_sizes=[16, 64],
                            max_model_len=256),
        )
        assert runner.has_ssm and runner.num_attn_layers == 1
        sched = Scheduler(runner, tokenizer=None, stop_tokens=set())
        for rid, pr in (("a", prompt_a), ("b", prompt_b)):
            sched.add_request(Request(
                request_id=rid, prompt=list(pr),
                sampling_params=SamplingParams(temperature=0.0,
                                               max_tokens=12),
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

        assert_tied_greedy_text(
            outs["a"].output_token_ids, ref_a, model, prompt_a
        )
        assert_tied_greedy_text(
            outs["b"].output_token_ids, ref_b, model, prompt_b
        )

    def test_mamba2_served_matches_hf_generate(self, tiny_mamba2, rng):
        """Pure-SSM model (no attention layers at all) end-to-end."""
        from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
        from vllm_mlx_tpu.core.model_runner import ModelRunner
        from vllm_mlx_tpu.core.request import Request, SamplingParams
        from vllm_mlx_tpu.core.scheduler import Scheduler

        model, path = tiny_mamba2
        cfg = ModelConfig.from_pretrained(path)
        cfg.dtype = "float32"
        params = loader.load_params(path, cfg, dtype="float32")
        prompt = rng.integers(2, 96, size=23).tolist()
        with torch.no_grad():
            ref = model.generate(
                torch.tensor([prompt]), max_new_tokens=10, do_sample=False
            )[0, len(prompt):].tolist()
        runner = ModelRunner(
            cfg, params,
            CacheConfig(block_size=8, num_blocks=32, kv_dtype="float32"),
            SchedulerConfig(max_num_seqs=2, max_prefill_tokens=64,
                            prefill_chunk_sizes=[16, 64],
                            max_model_len=256),
        )
        assert runner.num_attn_layers == 0
        sched = Scheduler(runner, tokenizer=None, stop_tokens=set())
        sched.add_request(Request(
            request_id="m", prompt=list(prompt),
            sampling_params=SamplingParams(temperature=0.0, max_tokens=10),
        ))
        outs = {}
        steps = 0
        while sched.has_unfinished():
            for o in sched.step():
                if o.finished:
                    outs[o.request_id] = o
            steps += 1
            assert steps < 200
        import sys as _sys

        _sys.path.insert(0, "tests")
        from vlm_test_utils import assert_tied_greedy_text

        assert_tied_greedy_text(
            outs["m"].output_token_ids, ref, model, prompt
        )

    def test_padded_rows_are_noops(self, tiny_mamba2, rng):
        from vllm_mlx_tpu.models.mamba2 import (
            MambaMixerConfig,
            mixer_sequence,
        )

        _, path = tiny_mamba2
        cfg = ModelConfig.from_pretrained(path)
        params = loader.load_params(path, cfg, dtype="float32")
        mc = MambaMixerConfig(**cfg.mamba_cfg)
        p = params["layers"][0]["mamba"]
        x = jnp.asarray(
            rng.standard_normal((10, cfg.hidden_size)) * 0.3, jnp.float32
        )
        zeros_c = jnp.zeros((mc.conv_dim, mc.conv_kernel), jnp.float32)
        zeros_s = jnp.zeros(
            (mc.num_heads, mc.head_dim, mc.state_size), jnp.float32
        )
        y_ref, conv_ref, ssm_ref = mixer_sequence(
            p, mc, x[:6], None, zeros_c, zeros_s
        )
        valid = jnp.asarray([True] * 6 + [False] * 4)
        y_pad, conv_pad, ssm_pad = mixer_sequence(
            p, mc, x, valid, zeros_c, zeros_s
        )
        np.testing.assert_allclose(
            np.asarray(y_pad[:6]), np.asarray(y_ref), rtol=1e-5, atol=1e-5
        )
        assert np.allclose(np.asarray(y_pad[6:]), 0.0)
        np.testing.assert_allclose(
            np.asarray(conv_pad), np.asarray(conv_ref), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(ssm_pad), np.asarray(ssm_ref), rtol=1e-5, atol=1e-5
        )


def test_max_kv_size_rejected_for_hybrids(tiny_bamba):
    from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
    from vllm_mlx_tpu.engine.batched import BatchedEngine

    _, path = tiny_bamba
    eng = BatchedEngine(
        path,
        cache_config=CacheConfig(block_size=8, num_blocks=16,
                                 kv_dtype="float32"),
        scheduler_config=SchedulerConfig(max_num_seqs=1, max_kv_size=64,
                                         max_model_len=128),
    )
    with pytest.raises(ValueError, match="max-kv-size"):
        eng._load()

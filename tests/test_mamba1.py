# SPDX-License-Identifier: Apache-2.0
"""Mamba-1 (selective scan) parity + serving: original Mamba,
Falcon-Mamba (weightless B/C/dt RMS) and the Jamba hybrid (NoPE
attention + Mamba-1 + MoE interleave). HF logits parity, stateful
chunk/step consistency, and token-identical served generation."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from vllm_mlx_tpu.config import ModelConfig  # noqa: E402
from vllm_mlx_tpu.models import decoder, loader  # noqa: E402


@pytest.fixture(scope="module")
def tiny_mamba1(tmp_path_factory):
    from transformers import MambaConfig, MambaForCausalLM

    torch.manual_seed(0)
    cfg = MambaConfig(
        vocab_size=96,
        hidden_size=32,
        num_hidden_layers=2,
        state_size=8,
        conv_kernel=4,
        expand=2,
        time_step_rank=8,
        tie_word_embeddings=False,
    )
    model = MambaForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("mamba1")
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


@pytest.fixture(scope="module")
def tiny_falcon_mamba(tmp_path_factory):
    from transformers import FalconMambaConfig, FalconMambaForCausalLM

    torch.manual_seed(1)
    cfg = FalconMambaConfig(
        vocab_size=96,
        hidden_size=32,
        num_hidden_layers=2,
        state_size=8,
        conv_kernel=4,
        expand=2,
        time_step_rank=8,
        tie_word_embeddings=False,
    )
    model = FalconMambaForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("falcon_mamba")
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


@pytest.fixture(scope="module")
def tiny_jamba(tmp_path_factory):
    from transformers import JambaConfig, JambaForCausalLM

    torch.manual_seed(2)
    cfg = JambaConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_experts=4,
        num_experts_per_tok=2,
        expert_layer_period=2,
        expert_layer_offset=1,
        attn_layer_period=2,
        attn_layer_offset=1,
        mamba_d_state=8,
        mamba_d_conv=4,
        mamba_expand=2,
        mamba_dt_rank=8,
        use_mamba_kernels=False,
        tie_word_embeddings=False,
    )
    model = JambaForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("jamba")
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(33)


class TestDenseParity:
    def test_mamba1_logits_match_hf(self, tiny_mamba1, rng):
        model, path = tiny_mamba1
        cfg = ModelConfig.from_pretrained(path)
        assert cfg.layer_types == ["mamba", "mamba"]
        assert cfg.mamba_cfg["version"] == 1
        assert not cfg.block_has_mlp
        params = loader.load_params(path, cfg, dtype="float32")
        assert "x_w" in params["layers"][0]["mamba"]
        ids = rng.integers(2, 96, size=21).tolist()
        with torch.no_grad():
            ref = model(torch.tensor([ids])).logits[0].numpy()
        mine = np.asarray(
            decoder.dense_forward(params, cfg, jnp.asarray(ids, jnp.int32))
        )
        np.testing.assert_allclose(mine, ref, rtol=2e-3, atol=2e-3)

    def test_falcon_mamba_logits_match_hf(self, tiny_falcon_mamba, rng):
        model, path = tiny_falcon_mamba
        cfg = ModelConfig.from_pretrained(path)
        assert cfg.mamba_cfg["mixer_rms_eps"] is not None
        params = loader.load_params(path, cfg, dtype="float32")
        ids = rng.integers(2, 96, size=17).tolist()
        with torch.no_grad():
            ref = model(torch.tensor([ids])).logits[0].numpy()
        mine = np.asarray(
            decoder.dense_forward(params, cfg, jnp.asarray(ids, jnp.int32))
        )
        np.testing.assert_allclose(mine, ref, rtol=2e-3, atol=2e-3)

    def test_jamba_logits_match_hf(self, tiny_jamba, rng):
        model, path = tiny_jamba
        cfg = ModelConfig.from_pretrained(path)
        assert cfg.layer_types == [
            "mamba", "full_attention", "mamba", "full_attention",
        ]
        assert not cfg.use_rope and not cfg.norm_topk_prob
        params = loader.load_params(path, cfg, dtype="float32")
        # expert layers carry MoE, the others a dense MLP
        assert "moe" in params["layers"][1]
        assert "moe" not in params["layers"][0]
        assert "dt_norm_w" in params["layers"][0]["mamba"]
        ids = rng.integers(2, 96, size=17).tolist()
        with torch.no_grad():
            ref = model(torch.tensor([ids])).logits[0].numpy()
        mine = np.asarray(
            decoder.dense_forward(params, cfg, jnp.asarray(ids, jnp.int32))
        )
        np.testing.assert_allclose(mine, ref, rtol=2e-3, atol=2e-3)


class TestStatefulStep:
    def test_sequence_then_steps_matches_full_scan(self, tiny_mamba1, rng):
        """Scanning a prefix then stepping token-by-token equals one
        full-sequence scan (chunked prefill + decode contract)."""
        from vllm_mlx_tpu.models.mamba1 import (
            Mamba1Config,
            mixer_sequence,
            mixer_step,
        )

        _, path = tiny_mamba1
        cfg = ModelConfig.from_pretrained(path)
        params = loader.load_params(path, cfg, dtype="float32")
        p = params["layers"][0]["mamba"]
        d = dict(cfg.mamba_cfg)
        d.pop("version")
        mc = Mamba1Config(**d)
        x = jnp.asarray(
            rng.standard_normal((12, cfg.hidden_size)), jnp.float32
        )
        y_full, conv_f, ssm_f = mixer_sequence(
            p, mc, x, None,
            jnp.zeros((mc.d_inner, mc.conv_kernel), jnp.float32),
            jnp.zeros((mc.d_inner, mc.d_state), jnp.float32),
        )
        # prefix of 7, then 5 single steps
        y_pre, conv, ssm = mixer_sequence(
            p, mc, x[:7], None,
            jnp.zeros((mc.d_inner, mc.conv_kernel), jnp.float32),
            jnp.zeros((mc.d_inner, mc.d_state), jnp.float32),
        )
        ys = [np.asarray(y_pre)]
        conv_b = conv[None]
        ssm_b = ssm[None]
        for t in range(7, 12):
            y_t, conv_b, ssm_b = mixer_step(
                p, mc, x[t : t + 1], jnp.asarray([True]), conv_b, ssm_b
            )
            ys.append(np.asarray(y_t))
        y_cat = np.concatenate(ys, axis=0)
        np.testing.assert_allclose(
            y_cat, np.asarray(y_full), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(conv_b[0]), np.asarray(conv_f), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ssm_b[0]), np.asarray(ssm_f), rtol=2e-4, atol=2e-4
        )

    def test_chunked_scan_matches_stepwise(self, tiny_mamba1, rng):
        """The chunked associative scan == per-token recurrence."""
        from vllm_mlx_tpu.models.mamba1 import _scan_chunked

        a = jnp.asarray(
            np.exp(-rng.random((37, 6, 4))), jnp.float32
        )
        b = jnp.asarray(rng.standard_normal((37, 6, 4)), jnp.float32)
        h0 = jnp.asarray(rng.standard_normal((6, 4)), jnp.float32)
        hs, h_last = _scan_chunked(a, b, h0, chunk=8)
        ref = np.asarray(h0)
        for t in range(37):
            ref = np.asarray(a[t]) * ref + np.asarray(b[t])
            np.testing.assert_allclose(
                np.asarray(hs[t]), ref, rtol=1e-5, atol=1e-5
            )
        np.testing.assert_allclose(
            np.asarray(h_last), ref, rtol=1e-5, atol=1e-5
        )


class TestServed:
    def _serve(self, model, path, rng, prompts, max_new=10):
        from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
        from vllm_mlx_tpu.core.model_runner import ModelRunner
        from vllm_mlx_tpu.core.request import Request, SamplingParams
        from vllm_mlx_tpu.core.scheduler import Scheduler

        cfg = ModelConfig.from_pretrained(path)
        cfg.dtype = "float32"
        params = loader.load_params(path, cfg, dtype="float32")
        refs = {}
        with torch.no_grad():
            for rid, pr in prompts.items():
                refs[rid] = model.generate(
                    torch.tensor([pr]),
                    attention_mask=torch.ones(
                        (1, len(pr)), dtype=torch.long
                    ),
                    max_new_tokens=max_new,
                    do_sample=False,
                )[0, len(pr):].tolist()
        runner = ModelRunner(
            cfg, params,
            CacheConfig(block_size=8, num_blocks=64, kv_dtype="float32"),
            SchedulerConfig(max_num_seqs=2, max_prefill_tokens=64,
                            prefill_chunk_sizes=[16, 64],
                            max_model_len=256),
        )
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

    def test_mamba1_served_matches_hf_generate(self, tiny_mamba1, rng):
        model, path = tiny_mamba1
        self._serve(
            model, path, rng,
            {"m": rng.integers(2, 96, size=23).tolist()},
        )

    def test_jamba_served_matches_hf_generate(self, tiny_jamba, rng):
        """Hybrid NoPE-attention/Mamba-1/MoE through the scheduler,
        two concurrent requests, chunked prefill."""
        model, path = tiny_jamba
        self._serve(
            model, path, rng,
            {
                "a": rng.integers(2, 96, size=37).tolist(),
                "b": rng.integers(2, 96, size=9).tolist(),
            },
            max_new=12,
        )

    def test_falcon_mamba_served_matches_hf_generate(
        self, tiny_falcon_mamba, rng
    ):
        model, path = tiny_falcon_mamba
        self._serve(
            model, path, rng,
            {"f": rng.integers(2, 96, size=19).tolist()},
        )

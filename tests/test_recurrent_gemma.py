# SPDX-License-Identifier: Apache-2.0
"""RecurrentGemma (Griffin) parity + serving: RG-LRU gated linear
recurrence mixer interleaved with sliding-window MQA attention (HF
modeling_recurrent_gemma.py). HF logits parity (including position-0
reset and bf16-rounded embed normalizer), stateful chunk/step
consistency, and token-identical served generation through the
scheduler with chunked prefill."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from vllm_mlx_tpu.config import ModelConfig  # noqa: E402
from vllm_mlx_tpu.models import decoder, loader  # noqa: E402


def _make_rg(tmp_path_factory, window: int, seed: int, name: str):
    from transformers import (
        RecurrentGemmaConfig,
        RecurrentGemmaForCausalLM,
    )

    torch.manual_seed(seed)
    cfg = RecurrentGemmaConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=2,
        num_key_value_heads=1,
        lru_width=32,
        head_dim=16,
        attention_window_size=window,
        partial_rotary_factor=0.5,
        conv1d_width=4,
        logits_soft_cap=30.0,
        pad_token_id=0,
    )
    model = RecurrentGemmaForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp(name)
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


@pytest.fixture(scope="module")
def tiny_rg(tmp_path_factory):
    # window >= any test seq length: HF's prefill mask is pure causal
    # (its window only binds at decode through the rotating KV cache),
    # so dense parity is only well-defined when the window doesn't bind
    return _make_rg(tmp_path_factory, window=64, seed=0, name="rg64")


@pytest.fixture(scope="module")
def tiny_rg_win8(tmp_path_factory):
    # small window for served-decode parity: prompts stay <= 8 tokens
    # (prefill identical), generation crosses the window boundary so
    # our paged sliding-window decode is checked against HF's rotating
    # cache token-by-token
    return _make_rg(tmp_path_factory, window=8, seed=7, name="rg8")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(41)


class TestDenseParity:
    def test_logits_match_hf(self, tiny_rg, rng):
        model, path = tiny_rg
        cfg = ModelConfig.from_pretrained(path)
        assert cfg.layer_types == ["rg_lru", "rg_lru", "sliding_attention"]
        assert cfg.rglru_cfg == {
            "lru_width": 32, "num_blocks": 2, "conv_kernel": 4,
        }
        assert cfg.sliding_window == 64
        assert cfg.final_softcap == 30.0
        assert cfg.intermediate_size == 32  # HF halves it in the MLP
        params = loader.load_params(path, cfg, dtype="float32")
        lp = params["layers"][0]["rg_lru"]
        assert lp["ig_w"].shape == (2, 16, 16)
        assert lp["conv_w"].shape == (32, 4)
        assert "o_bias" in params["layers"][2]  # o_proj bias, qkv none
        assert "q_bias" not in params["layers"][2]
        # long enough to exercise the window-8 sliding attention
        ids = rng.integers(2, 96, size=23).tolist()
        with torch.no_grad():
            ref = model(torch.tensor([ids])).logits[0].numpy()
        mine = np.asarray(
            decoder.dense_forward(params, cfg, jnp.asarray(ids, jnp.int32))
        )
        np.testing.assert_allclose(mine, ref, rtol=2e-3, atol=2e-3)


class TestStatefulStep:
    def test_sequence_then_steps_matches_full_scan(self, tiny_rg, rng):
        """Prefix scan (from position 0, exercising the reset) followed
        by single-token steps equals one full-sequence scan."""
        from vllm_mlx_tpu.models.rg_lru import (
            RgLruConfig,
            mixer_sequence,
            mixer_step,
        )

        _, path = tiny_rg
        cfg = ModelConfig.from_pretrained(path)
        params = loader.load_params(path, cfg, dtype="float32")
        p = params["layers"][0]["rg_lru"]
        mc = RgLruConfig(**cfg.rglru_cfg)
        x = jnp.asarray(
            rng.standard_normal((12, cfg.hidden_size)), jnp.float32
        )
        pos0 = jnp.arange(12) == 0
        y_full, conv_f, rec_f = mixer_sequence(
            p, mc, x, None,
            jnp.zeros((mc.lru_width, mc.conv_kernel), jnp.float32),
            jnp.zeros((mc.lru_width,), jnp.float32),
            pos0=pos0,
        )
        y_pre, conv, rec = mixer_sequence(
            p, mc, x[:7], None,
            jnp.zeros((mc.lru_width, mc.conv_kernel), jnp.float32),
            jnp.zeros((mc.lru_width,), jnp.float32),
            pos0=pos0[:7],
        )
        ys = [np.asarray(y_pre)]
        conv_b, rec_b = conv[None], rec[None]
        for t in range(7, 12):
            y_t, conv_b, rec_b = mixer_step(
                p, mc, x[t : t + 1], jnp.asarray([True]), conv_b, rec_b
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
            np.asarray(rec_b[0]), np.asarray(rec_f), rtol=2e-4, atol=2e-4
        )

    def test_pos0_reset_vs_hf(self, tiny_rg, rng):
        """The layer-0 mixer output matches HF's recurrent block exactly
        (multiplier 1 at position 0, sqrt(1-a^2) after)."""
        from vllm_mlx_tpu.models.rg_lru import RgLruConfig, mixer_sequence

        model, path = tiny_rg
        cfg = ModelConfig.from_pretrained(path)
        params = loader.load_params(path, cfg, dtype="float32")
        p = params["layers"][0]["rg_lru"]
        mc = RgLruConfig(**cfg.rglru_cfg)
        x = rng.standard_normal((9, cfg.hidden_size)).astype(np.float32)
        block = model.model.layers[0].temporal_block
        with torch.no_grad():
            ref = block(
                torch.tensor(x[None]),
                torch.arange(9)[None],
                None,
                cache_position=torch.arange(9),
                use_cache=False,
            ).numpy()[0]
        y, _, _ = mixer_sequence(
            p, mc, jnp.asarray(x), None,
            jnp.zeros((mc.lru_width, mc.conv_kernel), jnp.float32),
            jnp.zeros((mc.lru_width,), jnp.float32),
            pos0=jnp.arange(9) == 0,
        )
        np.testing.assert_allclose(
            np.asarray(y), ref, rtol=2e-4, atol=2e-4
        )


class TestServed:
    def test_served_matches_hf_generate(self, tiny_rg, rng):
        """Two concurrent requests through the scheduler with chunked
        prefill (chunk 16 splits the longer prompt so the RG-LRU state
        carry + pos0 reset are both exercised)."""
        model, path = tiny_rg
        self._serve(
            model, path,
            {
                "a": rng.integers(2, 96, size=37).tolist(),
                "b": rng.integers(2, 96, size=9).tolist(),
            },
        )

    def test_served_windowed_decode_matches_hf(self, tiny_rg_win8, rng):
        """Prompt EXACTLY == window (8), then generate well past it:
        our paged sliding-window decode must track HF's rotating KV
        cache token-by-token. (prompt==window is the one regime where
        HF's rotating cache is a faithful last-w-keys reference: for
        prompt < window it shifts a zero-filled slot into the attended
        range, and for prompt > window its prefill mask ignores the
        window entirely.)"""
        model, path = tiny_rg_win8
        self._serve(
            model, path,
            {"w": rng.integers(2, 96, size=8).tolist()},
        )

    def _serve(self, model, path, prompts, max_new=12):
        from vllm_mlx_tpu.config import CacheConfig, SchedulerConfig
        from vllm_mlx_tpu.core.model_runner import ModelRunner
        from vllm_mlx_tpu.core.request import Request, SamplingParams
        from vllm_mlx_tpu.core.scheduler import Scheduler
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

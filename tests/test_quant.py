# SPDX-License-Identifier: Apache-2.0
"""Weight quantization: roundtrip error bounds, quantized matmul
equivalence, and end-to-end generation with a quantized model."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_mlx_tpu.ops import quant
from vllm_mlx_tpu.ops.layers import linear


def test_int8_roundtrip_error(rng):
    w = jnp.asarray(rng.standard_normal((64, 128), dtype=np.float32))
    q = quant.quantize_int8(w)
    assert q.w_q.dtype == jnp.int8
    deq = np.asarray(quant.dequantize(q, dtype=jnp.float32))
    err = np.abs(deq - np.asarray(w))
    # per-row error ~ scale/2 rounding + bf16 scale storage error
    scale = np.asarray(q.scale, np.float32)
    assert (err <= scale * 1.1 + 1e-6).all()


def test_int8_matmul_matches_dequant(rng):
    w = jnp.asarray(rng.standard_normal((32, 64), dtype=np.float32))
    x = jnp.asarray(rng.standard_normal((5, 64), dtype=np.float32))
    q = quant.quantize_int8(w)
    y_q = np.asarray(quant.quant_matmul(x, q))
    y_ref = np.asarray(x) @ np.asarray(
        quant.dequantize(q, dtype=jnp.float32)
    ).T
    # W8A8: activation quantization adds ~1% relative error
    np.testing.assert_allclose(y_q, y_ref, rtol=0.1, atol=0.2)


def test_int4_matmul_matches_dequant(rng):
    w = jnp.asarray(rng.standard_normal((16, 256), dtype=np.float32))
    x = jnp.asarray(rng.standard_normal((3, 256), dtype=np.float32))
    q = quant.quantize_int4(w, group_size=128)
    assert str(q.w_q.dtype) == "uint8"  # nibble-packed half-split
    assert q.w_q.shape == (16, 128) and q.shape == (16, 256)
    y_q = np.asarray(quant.quant_matmul(x, q))
    y_ref = np.asarray(x) @ np.asarray(
        quant.dequantize(q, dtype=jnp.float32)
    ).T
    np.testing.assert_allclose(y_q, y_ref, rtol=2e-2, atol=2e-2)


def test_linear_dispatches_quantized(rng):
    w = jnp.asarray(rng.standard_normal((32, 64), dtype=np.float32))
    x = jnp.asarray(rng.standard_normal((4, 64), dtype=np.float32))
    q = quant.quantize_int8(w)
    y_dense = np.asarray(linear(x, w))
    y_quant = np.asarray(linear(x, q))
    # int8 per-channel keeps ~2 decimal digits on standard-normal weights
    np.testing.assert_allclose(y_quant, y_dense, rtol=0.1, atol=0.15)


def test_quantize_params_structure(rng):
    from vllm_mlx_tpu.config import ModelConfig
    from vllm_mlx_tpu.models import loader

    cfg = ModelConfig(
        model_type="qwen3", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, use_qk_norm=True,
        dtype="float32",
    )
    params = loader.init_params(cfg, seed=0, dtype="float32")
    qp = quant.quantize_params(params, bits=8)
    l0 = qp["layers"][0]
    assert quant.is_quantized(l0["q_proj"])
    assert quant.is_quantized(l0["mlp"]["gate_proj"])
    assert not quant.is_quantized(l0["input_layernorm"])
    assert not quant.is_quantized(qp["embed_tokens"])
    assert quant.is_quantized(qp["lm_head"])


def test_quantized_generation_runs(rng):
    """Quantized model generates (scheduler end-to-end, CPU)."""
    from vllm_mlx_tpu.config import ModelConfig
    from vllm_mlx_tpu.models import loader
    from test_scheduler import make_scheduler, run_to_completion, _req

    cfg = ModelConfig(
        model_type="llama", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, eos_token_ids=[1], dtype="float32",
    )
    params = quant.quantize_params(
        loader.init_params(cfg, seed=7, dtype="float32"), bits=8
    )
    sched = make_scheduler(cfg, params)
    prompt = rng.integers(2, 128, size=9).tolist()
    sched.add_request(_req("q", prompt, max_tokens=8))
    outs = run_to_completion(sched)
    assert len(outs["q"].output_token_ids) >= 1


class TestKVQuant:
    """Quantized KV pools (reference memory_cache.py:491-595, redesigned
    as quantize-on-write into the paged pool; the attention kernel
    dequantizes on read via k_scale/v_scale)."""

    def _attend(self, kv_dtype, kv_scale, rng):
        from vllm_mlx_tpu.ops.ragged_attention import (
            interleave_kv,
            make_kv_pages,
            ragged_attention,
            write_kv_pages,
        )

        t, kvh, hd, ps = 16, 2, 16, 8
        k = jnp.asarray(rng.standard_normal((t, kvh, hd)) * 0.5, jnp.float32)
        v = jnp.asarray(rng.standard_normal((t, kvh, hd)) * 0.5, jnp.float32)
        q = jnp.asarray(rng.standard_normal((t, 4, hd)) * 0.5, jnp.float32)
        pages = make_kv_pages(1, 4, ps, kvh, hd, dtype=kv_dtype)[0]
        dest = jnp.arange(t, dtype=jnp.int32)  # pages 0-1
        pages = write_kv_pages(pages, interleave_kv(k, v), dest, kv_scale)
        out = ragged_attention(
            q, pages,
            kv_lens=jnp.asarray([t], jnp.int32),
            page_indices=jnp.asarray([[0, 1, 2, 3]], jnp.int32),
            cu_q_lens=jnp.asarray([0, t, t], jnp.int32),
            num_seqs=jnp.asarray([1], jnp.int32),
            scale=hd ** -0.5,
            k_scale=kv_scale,
            v_scale=kv_scale,
        )
        return np.asarray(out)

    def test_int8_kv_attention_close_to_float(self, rng):
        ref = self._attend(jnp.float32, None, np.random.default_rng(5))
        got = self._attend(jnp.int8, 0.02, np.random.default_rng(5))
        np.testing.assert_allclose(got, ref, atol=0.03, rtol=0.05)

    def test_fp8_kv_attention_close_to_float(self, rng):
        ref = self._attend(jnp.float32, None, np.random.default_rng(6))
        got = self._attend(jnp.float8_e4m3fn, 1.0, np.random.default_rng(6))
        np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.08)

    @pytest.mark.parametrize("kv_dtype", ["fp8_e4m3", "int8"])
    def test_engine_generates_with_quantized_kv(self, kv_dtype, rng):
        """End-to-end smoke: continuous batching on a quantized pool
        produces a full-length generation and token ids stay close to
        the float pool (identical for this tiny model)."""
        from vllm_mlx_tpu.config import (
            CacheConfig,
            ModelConfig,
            SchedulerConfig,
        )
        from vllm_mlx_tpu.core.model_runner import ModelRunner
        from vllm_mlx_tpu.core.request import Request, SamplingParams
        from vllm_mlx_tpu.core.scheduler import Scheduler
        from vllm_mlx_tpu.models import loader

        cfg = ModelConfig(
            model_type="llama", vocab_size=128, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, dtype="float32",
        )
        params = loader.init_params(cfg, seed=9, dtype="float32")
        prompt = np.random.default_rng(4).integers(2, 128, size=24).tolist()

        def run(kvd, scale=0.05):
            runner = ModelRunner(
                cfg, params,
                CacheConfig(block_size=8, num_blocks=32, kv_dtype=kvd,
                            kv_scale=scale),
                SchedulerConfig(max_num_seqs=2, max_prefill_tokens=64,
                                prefill_chunk_sizes=[16, 64],
                                max_model_len=256),
            )
            sched = Scheduler(runner, tokenizer=None, stop_tokens=set())
            req = Request(
                request_id="q", prompt=list(prompt),
                sampling_params=SamplingParams(temperature=0.0,
                                               max_tokens=8),
            )
            sched.add_request(req)
            steps = 0
            out = None
            while sched.has_unfinished():
                for o in sched.step():
                    if o.finished:
                        out = o
                steps += 1
                assert steps < 100
            return out.output_token_ids

        ref = run("float32")
        got = run(kv_dtype)
        assert len(got) == 8
        # tiny-model greedy is robust to 8-bit KV error
        assert got == ref


def test_fused_projection_identity(rng):
    """fuse_projections must not change greedy outputs: the fused
    qkv/gate_up kernel produces the same logits as separate
    projections (scheduler end-to-end, CPU)."""
    from vllm_mlx_tpu.config import ModelConfig
    from vllm_mlx_tpu.models import loader
    from test_scheduler import make_scheduler, run_to_completion, _req

    cfg = ModelConfig(
        model_type="qwen3", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, use_qk_norm=True, eos_token_ids=[1],
        dtype="float32",
    )
    base = quant.quantize_params(
        loader.init_params(cfg, seed=11, dtype="float32"), bits=8
    )
    import copy

    fused = quant.fuse_projections(copy.deepcopy(base))
    l0 = fused["layers"][0]
    assert "qkv_proj" in l0 and "q_proj" not in l0
    assert "gate_up_proj" in l0["mlp"]
    prompts = {
        "a": rng.integers(2, 128, size=9).tolist(),
        "b": rng.integers(2, 128, size=5).tolist(),
    }
    outs = {}
    for name, params in (("sep", base), ("fused", fused)):
        sched = make_scheduler(cfg, params)
        for rid, p in prompts.items():
            sched.add_request(_req(f"{name}-{rid}", p, max_tokens=8))
        res = run_to_completion(sched)
        outs[name] = {
            rid: res[f"{name}-{rid}"].output_token_ids for rid in prompts
        }
    assert outs["sep"] == outs["fused"]

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
    assert str(q.w_q.dtype) == "int4"
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

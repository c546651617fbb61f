# SPDX-License-Identifier: Apache-2.0
"""Quantized-expert MoE: gathered dequant grouped matmul
(ops.moe_quant_pallas) — the capacity path for the reference's headline
MoE rows (Qwen3-30B-A3B-4bit decode, reference README.md:88,
docs/benchmarks/llm.md:17: 30B MoE experts are 29 GB bf16 but 7.3 GB
int4, the only way they fit a 16 GB v5e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_mlx_tpu.ops import quant
from vllm_mlx_tpu.ops.moe_quant_pallas import (
    _block_map,
    dequantize_expert_stack,
    quantize_expert_stack,
    routed_swiglu_quant,
)

E, H, I = 8, 256, 256  # lane-aligned: I/2 and H/2 multiples of 128


@pytest.fixture(scope="module")
def stacks(rng_module=None):
    rng = np.random.default_rng(11)
    gate = jnp.asarray(rng.standard_normal((E, H, I), dtype=np.float32) * 0.1)
    up = jnp.asarray(rng.standard_normal((E, H, I), dtype=np.float32) * 0.1)
    down = jnp.asarray(rng.standard_normal((E, I, H), dtype=np.float32) * 0.1)
    return gate, up, down


@pytest.fixture(scope="module")
def routing():
    rng = np.random.default_rng(5)
    t, k = 7, 2
    topk_i = jnp.asarray(
        np.stack([rng.choice(E, size=k, replace=False) for _ in range(t)])
    ).astype(jnp.int32)
    p = rng.random((t, k)).astype(np.float32)
    topk_p = jnp.asarray(p / p.sum(-1, keepdims=True))
    x = jnp.asarray(rng.standard_normal((t, H), dtype=np.float32) * 0.5)
    return x, topk_p, topk_i


def _dense_reference(x, topk_p, topk_i, gate, up, down, input_scaled=False):
    """Per-token loop over selected experts — the unambiguous oracle."""
    t, k = topk_i.shape
    out = np.zeros((t, gate.shape[2]), np.float32)
    xf = np.asarray(x, np.float32)
    g_, u_, d_ = (np.asarray(a, np.float32) for a in (gate, up, down))
    for ti in range(t):
        for ki in range(k):
            e = int(topk_i[ti, ki])
            w = float(topk_p[ti, ki])
            xi = xf[ti] * (w if input_scaled else 1.0)
            g = xi @ g_[e]
            u = xi @ u_[e]
            h = (g / (1 + np.exp(-g))) * u
            y = h @ d_[e]
            out[ti] += y * (1.0 if input_scaled else w)
    return out


@pytest.mark.parametrize("bits", [8, 4])
def test_quantize_roundtrip(stacks, bits):
    gate, _, _ = stacks
    q = quantize_expert_stack(gate, bits=bits)
    assert q.bits == bits
    assert q.shape == gate.shape
    back = dequantize_expert_stack(q, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(gate)).max()
    # int8: per-column amax/127 step; int4 grouped: amax/7 step
    amax = float(jnp.abs(gate).max())
    assert err <= amax * (1.1 / (127 if bits == 8 else 7))


def test_block_map_covers_every_row_once():
    rng = np.random.default_rng(0)
    t, k, e, block = 13, 3, 8, 8
    topk_i = jnp.asarray(rng.integers(0, e, size=(t, k)))
    be, gather, order, sorted_token = _block_map(topk_i, t, k, e, block)
    m = t * k
    g = np.asarray(gather)
    valid = g[g < m]
    # every sorted row appears exactly once
    assert sorted(valid.tolist()) == list(range(m))
    # block expert ids match the sorted expert of each valid row
    sorted_expert = np.asarray(topk_i).reshape(-1)[np.asarray(order)]
    be_np = np.asarray(be)
    for b in range(be_np.shape[0]):
        rows = g[b * block : (b + 1) * block]
        for r in rows[rows < m]:
            assert sorted_expert[r] == be_np[b]


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("input_scaled", [False, True])
def test_fallback_matches_dense_reference(stacks, routing, bits,
                                          input_scaled):
    gate, up, down = stacks
    x, topk_p, topk_i = routing
    qg = quantize_expert_stack(gate, bits=bits)
    qu = quantize_expert_stack(up, bits=bits)
    qd = quantize_expert_stack(down, bits=bits)
    got = routed_swiglu_quant(
        x, topk_p, topk_i, qg, qu, qd, E, input_scaled=input_scaled
    )
    ref = _dense_reference(
        x, topk_p, topk_i,
        dequantize_expert_stack(qg, jnp.float32),
        dequantize_expert_stack(qu, jnp.float32),
        dequantize_expert_stack(qd, jnp.float32),
        input_scaled=input_scaled,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("t,k", [(1, 2), (7, 2), (40, 3)])
def test_gathered_kernel_interpret_matches_fallback(stacks, bits, t, k):
    """The pallas path (interpret mode on CPU) must agree with the
    dequantize-then-ragged_dot fallback."""
    gate, up, down = stacks
    rng = np.random.default_rng(t * 10 + k)
    topk_i = jnp.asarray(
        np.stack([rng.choice(E, size=k, replace=False) for _ in range(t)])
    ).astype(jnp.int32)
    p = rng.random((t, k)).astype(np.float32)
    topk_p = jnp.asarray(p / p.sum(-1, keepdims=True))
    x = jnp.asarray(
        rng.standard_normal((t, H), dtype=np.float32) * 0.5
    ).astype(jnp.bfloat16)
    qg = quantize_expert_stack(gate, bits=bits)
    qu = quantize_expert_stack(up, bits=bits)
    qd = quantize_expert_stack(down, bits=bits)
    got = routed_swiglu_quant(
        x, topk_p, topk_i, qg, qu, qd, E, interpret=True
    )
    ref = routed_swiglu_quant(x, topk_p, topk_i, qg, qu, qd, E)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(ref, np.float32),
        rtol=3e-2,
        atol=3e-2,
    )


def test_quantize_params_expert_stacks():
    """quantize_params quantizes routed-SwiGLU stacks AND gpt_oss fused
    stacks (each in its own contraction-axis layout) but leaves
    unsupported layouts (granitemoe input_w/output_w) dense."""
    rng = np.random.default_rng(2)

    def w(*s):
        return jnp.asarray(rng.standard_normal(s, dtype=np.float32))

    params = {
        "layers": [
            {
                "moe": {
                    "router": w(E, H),
                    "gate_w": w(E, H, I),
                    "up_w": w(E, H, I),
                    "down_w": w(E, I, H),
                }
            },
            {
                "moe": {  # gpt_oss layout: reordered + quantized
                    "router": w(E, H),
                    "gate_up_w": w(E, H, 2 * I),
                    "gate_up_b": jnp.zeros((E, 2 * I)),
                    "down_w": w(E, I, H),
                    "down_b": jnp.zeros((E, H)),
                }
            },
            {
                "moe": {  # granitemoe layout: stays dense
                    "router": w(E, H),
                    "input_w": w(E, H, 2 * I),
                    "output_w": w(E, I, H),
                }
            },
        ]
    }
    qp = quant.quantize_params(params, bits=8)
    m0 = qp["layers"][0]["moe"]
    assert quant.is_quantized(m0["gate_w"]) and quant.is_quantized(
        m0["down_w"]
    )
    assert not quant.is_quantized(m0["router"])
    # contraction-axis scale layout [E, 1, N]
    assert m0["gate_w"].scale.shape == (E, 1, I)
    m1 = qp["layers"][1]["moe"]
    assert quant.is_quantized(m1["gate_up_w"])
    assert quant.is_quantized(m1["down_w"])
    assert not quant.is_quantized(m1["router"])
    m2 = qp["layers"][2]["moe"]
    assert not quant.is_quantized(m2["input_w"])
    assert not quant.is_quantized(m2["output_w"])
    # opt-out leaves stacks dense
    qp2 = quant.quantize_params(params, bits=8, quantize_experts=False)
    assert not quant.is_quantized(qp2["layers"][0]["moe"]["gate_w"])
    assert not quant.is_quantized(qp2["layers"][1]["moe"]["gate_up_w"])


def test_moe_engine_serves_quantized(rng):
    """Qwen3-MoE with int8 experts generates through the scheduler and
    stays close to the dense run (CPU fallback path)."""
    from vllm_mlx_tpu.config import CacheConfig, ModelConfig, SchedulerConfig
    from vllm_mlx_tpu.core.model_runner import ModelRunner
    from vllm_mlx_tpu.core.scheduler import Scheduler
    from vllm_mlx_tpu.models import loader

    from test_scheduler import _req, run_to_completion

    cfg = ModelConfig(
        model_type="qwen3_moe", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, use_qk_norm=True,
        num_experts=8, num_experts_per_tok=4, moe_intermediate_size=32,
        norm_topk_prob=True, eos_token_ids=[1], dtype="float32",
    )
    params = quant.quantize_params(
        loader.init_params(cfg, seed=3, dtype="float32"), bits=8
    )
    assert quant.is_quantized(params["layers"][0]["moe"]["gate_w"])
    cache = CacheConfig(block_size=8, num_blocks=64, kv_dtype="float32")
    sc = SchedulerConfig(
        max_num_seqs=4, max_prefill_tokens=64,
        prefill_chunk_sizes=[16, 64], max_model_len=256,
    )
    sched = Scheduler(ModelRunner(cfg, params, cache, sc),
                      tokenizer=None, stop_tokens={1})
    prompt = rng.integers(2, 128, size=9).tolist()
    sched.add_request(_req("q", prompt, max_tokens=8))
    outs = run_to_completion(sched)
    assert len(outs["q"].output_token_ids) >= 1


@pytest.mark.tpu
@pytest.mark.parametrize("bits", [8, 4])
def test_gathered_kernel_real_tpu(stacks, routing, bits):
    """On-chip kernel parity vs the dequantize fallback (run with
    VLLM_MLX_TPU_TEST_REAL_TPU=1 pytest -m tpu)."""
    if jax.default_backend() != "tpu":
        pytest.skip("real TPU only")
    gate, up, down = stacks
    x, topk_p, topk_i = routing
    qg = quantize_expert_stack(gate, bits=bits)
    qu = quantize_expert_stack(up, bits=bits)
    qd = quantize_expert_stack(down, bits=bits)
    got = routed_swiglu_quant(
        x.astype(jnp.bfloat16), topk_p, topk_i, qg, qu, qd, E
    )
    ref = _dense_reference(
        x.astype(jnp.bfloat16), topk_p, topk_i,
        dequantize_expert_stack(qg, jnp.float32),
        dequantize_expert_stack(qu, jnp.float32),
        dequantize_expert_stack(qd, jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), ref, rtol=5e-2, atol=5e-2
    )


# ------------------------------------------------------------- GPT-OSS
class TestGptOssQuant:
    E2, H2, I2 = 4, 256, 128  # int4-viable: K=256/128 both % 64 == 0

    @pytest.fixture(scope="class")
    def moe(self):
        rng = np.random.default_rng(21)
        return {
            "router": jnp.asarray(
                rng.standard_normal((self.E2, self.H2), dtype=np.float32)
            ),
            "gate_up_w": jnp.asarray(
                rng.standard_normal(
                    (self.E2, self.H2, 2 * self.I2), dtype=np.float32
                )
                * 0.1
            ),
            "gate_up_b": jnp.asarray(
                rng.standard_normal(
                    (self.E2, 2 * self.I2), dtype=np.float32
                )
                * 0.1
            ),
            "down_w": jnp.asarray(
                rng.standard_normal(
                    (self.E2, self.I2, self.H2), dtype=np.float32
                )
                * 0.1
            ),
            "down_b": jnp.asarray(
                rng.standard_normal((self.E2, self.H2), dtype=np.float32)
                * 0.1
            ),
        }

    def _oracle(self, x, topk_p, topk_i, moe_q, limit=7.0):
        """Dense per-token loop on the DEQUANTIZED reordered weights."""
        gu = np.asarray(
            dequantize_expert_stack(moe_q["gate_up_w"], jnp.float32)
        )
        gub = np.asarray(moe_q["gate_up_b"], np.float32)
        dw = np.asarray(
            dequantize_expert_stack(moe_q["down_w"], jnp.float32)
        )
        db = np.asarray(moe_q["down_b"], np.float32)
        t, k = topk_i.shape
        inter = gub.shape[-1] // 2
        out = np.zeros((t, dw.shape[2]), np.float32)
        xf = np.asarray(x, np.float32)
        for ti in range(t):
            for ki in range(k):
                e = int(topk_i[ti, ki])
                v = xf[ti] @ gu[e] + gub[e]
                gate = np.minimum(v[:inter], limit)
                up = np.clip(v[inter:], -limit, limit)
                h = (up + 1.0) * (gate / (1 + np.exp(-gate * 1.702)))
                out[ti] += (h @ dw[e] + db[e]) * float(topk_p[ti, ki])
        return out

    @pytest.mark.parametrize("bits", [8, 4])
    def test_fallback_matches_oracle(self, moe, bits):
        from vllm_mlx_tpu.ops.moe_quant_pallas import (
            quantize_gpt_oss_experts,
            routed_clamped_glu_quant,
        )

        rng = np.random.default_rng(3)
        t, k = 6, 2
        x = jnp.asarray(
            rng.standard_normal((t, self.H2), dtype=np.float32) * 0.5
        )
        topk_i = jnp.asarray(
            np.stack(
                [rng.choice(self.E2, size=k, replace=False)
                 for _ in range(t)]
            )
        ).astype(jnp.int32)
        p = rng.random((t, k)).astype(np.float32)
        topk_p = jnp.asarray(p / p.sum(-1, keepdims=True))
        q = quantize_gpt_oss_experts(moe, bits=bits)
        got = routed_clamped_glu_quant(
            x, topk_p, topk_i, q["gate_up_w"], q["gate_up_b"],
            q["down_w"], q["down_b"], self.E2, 7.0,
        )
        ref = self._oracle(x, topk_p, topk_i, q)
        np.testing.assert_allclose(
            np.asarray(got), ref, rtol=3e-2, atol=3e-2
        )

    @pytest.mark.parametrize("bits", [8, 4])
    def test_kernel_interpret_matches_fallback(self, moe, bits,
                                               monkeypatch):
        """Pallas path (interpret) vs fallback — with the K-chunk
        forced small so the chunked accumulator is exercised."""
        from vllm_mlx_tpu.ops import moe_quant_pallas as mqp

        monkeypatch.setattr(
            mqp, "_pick_k_chunk",
            lambda k, n, bits, group, budget=0: max(k // 2, group or 1),
        )
        rng = np.random.default_rng(9)
        t, k = 5, 2
        x = jnp.asarray(
            rng.standard_normal((t, self.H2), dtype=np.float32) * 0.5
        ).astype(jnp.bfloat16)
        topk_i = jnp.asarray(
            np.stack(
                [rng.choice(self.E2, size=k, replace=False)
                 for _ in range(t)]
            )
        ).astype(jnp.int32)
        p = rng.random((t, k)).astype(np.float32)
        topk_p = jnp.asarray(p / p.sum(-1, keepdims=True))
        q = mqp.quantize_gpt_oss_experts(moe, bits=bits)
        args = (
            x, topk_p, topk_i, q["gate_up_w"], q["gate_up_b"],
            q["down_w"], q["down_b"], self.E2, 7.0,
        )
        got = mqp.routed_clamped_glu_quant(*args, interpret=True)
        ref = mqp.routed_clamped_glu_quant(*args)
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(ref, np.float32),
            rtol=3e-2,
            atol=3e-2,
        )

    def test_quantize_params_gpt_oss_layout(self, moe):
        params = {"layers": [{"moe": dict(moe)}]}
        qp = quant.quantize_params(params, bits=4)
        m = qp["layers"][0]["moe"]
        assert quant.is_quantized(m["gate_up_w"])
        assert quant.is_quantized(m["down_w"])
        assert not quant.is_quantized(m["router"])
        # biases reordered to [gate | up] halves, not quantized
        assert not quant.is_quantized(m["gate_up_b"])
        assert not quant.is_quantized(m["down_b"])
        gub = np.asarray(moe["gate_up_b"])
        got = np.asarray(m["gate_up_b"])
        np.testing.assert_array_equal(got[:, : self.I2], gub[:, 0::2])
        np.testing.assert_array_equal(got[:, self.I2 :], gub[:, 1::2])

    def test_gpt_oss_decoder_dispatch(self, moe):
        """moe_mlp_gpt_oss routes to the quantized path and stays close
        to the dense path on the dequantized weights."""
        from vllm_mlx_tpu.config import ModelConfig
        from vllm_mlx_tpu.models.decoder import moe_mlp_gpt_oss
        from vllm_mlx_tpu.ops.moe_quant_pallas import (
            dequantize_expert_stack,
            quantize_gpt_oss_experts,
        )

        cfg = ModelConfig(
            model_type="gpt_oss", vocab_size=64, hidden_size=self.H2,
            intermediate_size=2 * self.I2, num_hidden_layers=1,
            num_attention_heads=4, num_key_value_heads=2,
            num_experts=self.E2, num_experts_per_tok=2,
            moe_intermediate_size=self.I2, moe_style="gpt_oss",
            dtype="float32",
        )
        rng = np.random.default_rng(4)
        x = jnp.asarray(
            rng.standard_normal((3, self.H2), dtype=np.float32) * 0.5
        )
        q = quantize_gpt_oss_experts(moe, bits=8)
        got = moe_mlp_gpt_oss(cfg, q, x)
        # dense run on the dequantized (reordered) weights: rebuild an
        # interleaved dense dict matching the original layout
        idx = np.concatenate(
            [np.arange(0, 2 * self.I2, 2), np.arange(1, 2 * self.I2, 2)]
        )
        inv = np.argsort(idx)
        dense = dict(moe)
        dense["gate_up_w"] = jnp.asarray(
            np.asarray(
                dequantize_expert_stack(q["gate_up_w"], jnp.float32)
            )[:, :, inv]
        )
        dense["gate_up_b"] = jnp.asarray(np.asarray(q["gate_up_b"])[:, inv])
        dense["down_w"] = dequantize_expert_stack(q["down_w"], jnp.float32)
        ref = moe_mlp_gpt_oss(cfg, dense, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2
        )


def test_quantize_params_mixed_w8e4():
    """bits=8 dense + expert_bits=4 stacks (--quantization w8e4)."""
    rng = np.random.default_rng(6)
    params = {
        "layers": [
            {
                "q_proj": jnp.asarray(
                    rng.standard_normal((H, H), dtype=np.float32)
                ),
                "moe": {
                    "router": jnp.asarray(
                        rng.standard_normal((E, H), dtype=np.float32)
                    ),
                    "gate_w": jnp.asarray(
                        rng.standard_normal((E, H, I), dtype=np.float32)
                    ),
                    "up_w": jnp.asarray(
                        rng.standard_normal((E, H, I), dtype=np.float32)
                    ),
                    "down_w": jnp.asarray(
                        rng.standard_normal((E, I, H), dtype=np.float32)
                    ),
                },
            }
        ]
    }
    qp = quant.quantize_params(params, bits=8, expert_bits=4)
    l0 = qp["layers"][0]
    assert l0["q_proj"].bits == 8
    assert l0["moe"]["gate_w"].bits == 4
    assert l0["moe"]["down_w"].bits == 4


@pytest.mark.parametrize("bits", [8, 4])
def test_swiglu_chunked_path_matches_fused(stacks, routing, bits,
                                           monkeypatch):
    """Force the three-call K-chunked path (big-expert geometries) and
    check it agrees with the fused kernel (both interpret mode)."""
    from vllm_mlx_tpu.ops import moe_quant_pallas as mqp

    gate, up, down = stacks
    x, topk_p, topk_i = routing
    xb = x.astype(jnp.bfloat16)
    qg = quantize_expert_stack(gate, bits=bits)
    qu = quantize_expert_stack(up, bits=bits)
    qd = quantize_expert_stack(down, bits=bits)
    fused = routed_swiglu_quant(xb, topk_p, topk_i, qg, qu, qd, E,
                                interpret=True)
    monkeypatch.setattr(mqp, "_FUSED_VMEM_BUDGET", 1)
    chunked = mqp.routed_swiglu_quant(xb, topk_p, topk_i, qg, qu, qd, E,
                                      interpret=True)
    np.testing.assert_allclose(
        np.asarray(chunked, np.float32),
        np.asarray(fused, np.float32),
        rtol=3e-2,
        atol=3e-2,
    )

# SPDX-License-Identifier: Apache-2.0
"""Scale benchmark: Qwen3-8B geometry, int8, batch-32 decode on one v5e.

BASELINE.md north star: "Qwen3-8B batch-32 decode tokens/sec/chip on TPU
v5e > 3x M4-Max single-stream (417.9)" => target > 1254 tok/s aggregate.

Weights are random (timing only) and quantized leaf-by-leaf during
init so the bf16 intermediate never exceeds HBM.
"""

import functools
import gc
import json
import sys
import time

import jax
import numpy as np

TARGET = 3 * 417.9


def log(msg):
    print(msg, file=sys.stderr, flush=True)


QUANT = "int8"


def init_quantized_params(cfg, seed=0):
    """Random-init directly to int8 QuantizedTensors (leafwise)."""
    import jax.numpy as jnp

    from vllm_mlx_tpu.models import loader
    from vllm_mlx_tpu.ops.quant import quantize_int8

    rng = np.random.default_rng(seed)
    h, hd = cfg.hidden_size, cfg.head_dim
    nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    salt = [0]

    def qw(*shape):
        # timing-only weights: materialize the int8 codes DIRECTLY on
        # device (host randn + quantize of 8.2B params took ~11 min;
        # the bench only measures decode throughput, values are
        # irrelevant — a cheap deterministic nonzero pattern suffices)
        from vllm_mlx_tpu.ops.quant import QuantizedTensor

        salt[0] += 1

        @functools.partial(jax.jit, static_argnums=(0, 1))
        def gen(shp, s):
            # fused in ONE program so the i32 iota intermediates never
            # materialize in HBM (eagerly they are 4 B/elt — several
            # GB transient at 8B scale, enough to OOM the pool)
            iota = jax.lax.broadcasted_iota(jnp.int32, shp, len(shp) - 1)
            row = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
            return ((iota * 31 + row * 7 + s) % 255 - 127).astype(jnp.int8)

        if QUANT == "int4":
            # nibble-packed uint8 [O, K/2] + per-group scales (the
            # fused dequant-matmul kernel's layout, ops/quant.py)
            o, k = shape
            g = 128

            @functools.partial(jax.jit, static_argnums=(0, 1))
            def gen4(shp, s):
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, shp, len(shp) - 1
                )
                row = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
                return ((iota * 31 + row * 7 + s) % 256).astype(jnp.uint8)

            return QuantizedTensor(
                w_q=gen4((o, k // 2), salt[0]),
                scale=jnp.full((o, k // g), 4e-3, jnp.bfloat16),
                bits=4,
                group_size=g,
            )
        codes = gen(shape, salt[0])
        scale = jnp.full((shape[0], 1), 2e-4, jnp.bfloat16)
        return QuantizedTensor(w_q=codes, scale=scale, bits=8)

    def ones(*shape):
        return jnp.ones(shape, dtype=jnp.bfloat16)

    layers = []
    for i in range(cfg.num_hidden_layers):
        layers.append(
            {
                "input_layernorm": ones(h),
                "post_attention_layernorm": ones(h),
                # separate projections: the fused-qkv layout OOMs HBM
                # at 8B scale (XLA materializes hoisted weight copies
                # for the wider dots inside the unrolled decode scan)
                "q_proj": qw(nh * hd, h),
                "k_proj": qw(nkv * hd, h),
                "v_proj": qw(nkv * hd, h),
                "o_proj": qw(h, nh * hd),
                "q_norm": ones(hd),
                "k_norm": ones(hd),
                "mlp": {
                    "gate_proj": qw(cfg.intermediate_size, h),
                    "up_proj": qw(cfg.intermediate_size, h),
                    "down_proj": qw(h, cfg.intermediate_size),
                },
            }
        )
        if i % 8 == 0:
            gc.collect()
    return {
        "embed_tokens": qw(cfg.vocab_size, h),
        "layers": layers,
        "norm": ones(h),
        "lm_head": qw(cfg.vocab_size, h),
    }


def main():
    from vllm_mlx_tpu.config import CacheConfig, ModelConfig, SchedulerConfig
    from vllm_mlx_tpu.core.model_runner import (
        ModelRunner,
        enable_persistent_compilation_cache,
    )
    from vllm_mlx_tpu.core.scheduler import Scheduler
    from vllm_mlx_tpu.ops.ragged_attention import (
        set_attention_block_config,
    )

    enable_persistent_compilation_cache()
    # attention-kernel tuning sweep: bench_8b.py [kv_pages] [q_block]
    # [kv_dtype]  (VERDICT r2 weak #1 — defaults 4/32/bfloat16)
    argv = sys.argv[1:]
    # timing-only ablations (WRONG OUTPUTS): "nokv" skips the per-layer
    # KV scatter, "noattn" zeroes the attention kernel — attributes
    # step-time between weights / scatters / attention
    if "nokv" in argv or "noattn" in argv or "dummyattn" in argv:
        from vllm_mlx_tpu.ops.ragged_attention import set_ablation

        set_ablation(
            skip_kv_writes="nokv" in argv,
            skip_attention="noattn" in argv,
            dummy_attention="dummyattn" in argv,
        )
        abl = ("nokv", "noattn", "dummyattn")
        log(f"ABLATION (timing-only): {[a for a in argv if a in abl]}")
        argv = [a for a in argv if a not in abl]
    if "int4" in argv:
        global QUANT
        QUANT = "int4"
        log("weights: packed-int4 (fused dequant-matmul kernel)")
        argv = [a for a in argv if a != "int4"]
    # stacked-megakernel sweeps: "stacked" turns it on; "sabl=noattn"/
    # "sabl=nokvdma" are timing-only ablations inside the kernel;
    # "sch=N" overrides the weight-chunk row cap (default 2048)
    if "stacked" in argv:
        import os

        os.environ["VLLM_MLX_TPU_STACKED"] = "1"
        log("stacked megakernel: ON")
        argv.remove("stacked")
    if "nofusedkv" in argv:
        import os

        os.environ["VLLM_MLX_TPU_FUSED_KV"] = "0"
        log("fused KV write: OFF (separate scatter per layer)")
        argv.remove("nofusedkv")
    s_abl, s_tune = {}, {}
    tune_keys = {
        "sch": "ch_cap", "sda": "depth_a", "sdb": "depth_b",
        "sbpc": "kv_bpc",
    }
    for a in list(argv):
        if a.startswith("sabl="):
            s_abl[a.split("=")[1]] = True
            argv.remove(a)
        elif a.split("=")[0] in tune_keys:
            k, v = a.split("=")
            s_tune[tune_keys[k]] = int(v)
            argv.remove(a)
    if s_abl or s_tune:
        from vllm_mlx_tpu.ops.stacked_decode_pallas import (
            set_stacked_ablation,
            set_stacked_tuning,
        )

        if s_abl:
            set_stacked_ablation(**s_abl)
            log(f"stacked ablation: {s_abl}")
        if s_tune:
            set_stacked_tuning(**s_tune)
            log(f"stacked tuning: {s_tune}")
    block_size = 32
    for a in list(argv):
        if a.startswith("block="):
            block_size = int(a.split("=")[1])
            log(f"kv block_size: {block_size}")
            argv.remove(a)
    if len(argv) >= 2:
        set_attention_block_config(int(argv[0]), int(argv[1]))
        log(f"attention blocks: kv_pages={argv[0]} q_block={argv[1]}")
    kv_dtype = argv[2] if len(argv) >= 3 else "bfloat16"
    log(f"kv dtype: {kv_dtype}")
    # Qwen3-8B geometry (Qwen/Qwen3-8B config.json)
    cfg = ModelConfig(
        model_type="qwen3",
        vocab_size=151936,
        hidden_size=4096,
        intermediate_size=12288,
        num_hidden_layers=36,
        num_attention_heads=32,
        num_key_value_heads=8,
        head_dim=128,
        rope_theta=1000000.0,
        use_qk_norm=True,
        eos_token_ids=[151645],
        dtype="bfloat16",
    )
    t0 = time.time()
    params = init_quantized_params(cfg)
    log(f"params init: {time.time()-t0:.1f}s (~8.2B, int8, fused)")
    sched = Scheduler(
        ModelRunner(
            cfg,
            params,
            CacheConfig(
                block_size=block_size,
                num_blocks=512 * 32 // block_size,
                kv_dtype=kv_dtype,
            ),
            SchedulerConfig(
                max_num_seqs=32,
                max_prefill_tokens=2048,
                prefill_chunk_sizes=[128, 2048],
                max_model_len=2048,
                decode_steps_per_dispatch=32,
            ),
        ),
        tokenizer=None,
        stop_tokens={151645},
    )

    import bench

    t0 = time.time()
    bench.run_batch(sched, 32, 64, 4, seed=96)
    log(f"warmup(compile): {time.time()-t0:.1f}s")
    best = 0.0
    for trial in range(2):
        wall, ttft, total = bench.run_batch(
            sched, 32, 64, 128, seed=5 + 100 * trial
        )
        log(
            f"8B batch-32[{trial}]: {total} tok in {wall:.2f}s "
            f"(ttft {1000*ttft:.0f} ms, agg {total/wall:.1f} tok/s)"
        )
        best = max(best, total / wall)
    print(
        json.dumps(
            {
                "metric": "qwen3_8b_batch32_decode",
                "value": round(best, 1),
                "unit": "tok/s",
                "vs_baseline": round(best / TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

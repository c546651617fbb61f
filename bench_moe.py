# SPDX-License-Identifier: Apache-2.0
"""MoE scale benchmark: Qwen3-30B-A3B geometry on one v5e.

The reference's headline MoE row: Qwen3-30B-A3B-4bit greedy decode
127.7 tok/s single-stream on M4 Max (reference README.md:88,
docs/benchmarks/llm.md:17; continuous batching 98.1 -> 233.3 tok/s at
5 concurrent, llm.md:35). 30B-A3B's expert stacks are 29 GB in bf16 —
serving them on a 16 GB chip requires the quantized-expert path
(ops/moe_quant_pallas: int4 expert stacks + the gathered dequant
grouped-matmul kernel). Decode only streams the experts the batch
actually routed to, so single-stream weight traffic is ~0.9 GB/step
(8 of 128 experts x 48 layers) instead of 14.5 GB.

Weights are random (timing only), initialized leafwise DIRECTLY in
their quantized storage so no bf16 intermediate ever exceeds HBM
(bench_8b.py lesson). The embedding is tied to lm_head for this bench
(the real checkpoint unties them; tying is storage-only — per-step
HBM traffic reads the same bytes either way) to squeeze the true
48-layer geometry onto one 16 GB part.

Args: ``layers=N`` (default 48), ``bits8`` (int8 experts — needs
~29 GB, only for reduced-layer probes), ``topk=N`` (--moe-top-k
expert reduction, reference docs/guides/moe-top-k.md), ``steps=N``
(decode_steps_per_dispatch, default 16), ``blocks=N`` (KV pool),
``kv=DTYPE`` (default int8), ``g=N`` (expert int4 group, default 256).

Prints ONE JSON line; secondary numbers to stderr.
"""

import functools
import gc
import json
import sys
import time

import numpy as np

BASELINE_SINGLE = 127.7  # reference M4 Max, README.md:88


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _gen_codes(shape, salt, dtype):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def gen(shp, s):
        iota = jax.lax.broadcasted_iota(jnp.int32, shp, len(shp) - 1)
        row = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
        v = (iota * 31 + row * 7 + s) % 255
        if dtype == jnp.int8:
            return (v - 127).astype(jnp.int8)
        return (v % 256).astype(jnp.uint8)

    return gen(shape, salt)


def init_params(cfg, expert_bits=4, group=256):
    import jax.numpy as jnp

    from vllm_mlx_tpu.ops.quant import QuantizedTensor

    h, hd = cfg.hidden_size, cfg.head_dim
    nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    e, mi = cfg.num_experts, cfg.moe_intermediate_size
    salt = [0]

    def qw(*shape):  # dense int8 (attention/embed)
        salt[0] += 1
        return QuantizedTensor(
            w_q=_gen_codes(shape, salt[0], jnp.int8),
            scale=jnp.full((shape[0], 1), 2e-4, jnp.bfloat16),
            bits=8,
        )

    def qexpert(k, n):  # expert stack [E, K, N] in moe_quant layout
        salt[0] += 1
        if expert_bits == 8:
            return QuantizedTensor(
                w_q=_gen_codes((e, k, n), salt[0], jnp.int8),
                scale=jnp.full((e, 1, n), 2e-4, jnp.bfloat16),
                bits=8,
            )
        return QuantizedTensor(
            w_q=_gen_codes((e, k, n // 2), salt[0], jnp.uint8),
            scale=jnp.full((e, k // group, n), 4e-3, jnp.bfloat16),
            bits=4,
            group_size=group,
        )

    def ones(*shape):
        return jnp.ones(shape, jnp.bfloat16)

    def bf(*shape):
        salt[0] += 1
        return (
            _gen_codes(shape, salt[0], jnp.int8).astype(jnp.bfloat16) * 2e-2
        )

    layers = []
    for i in range(cfg.num_hidden_layers):
        layers.append(
            {
                "input_layernorm": ones(h),
                "post_attention_layernorm": ones(h),
                "q_proj": qw(nh * hd, h),
                "k_proj": qw(nkv * hd, h),
                "v_proj": qw(nkv * hd, h),
                "o_proj": qw(h, nh * hd),
                "q_norm": ones(hd),
                "k_norm": ones(hd),
                "moe": {
                    "router": bf(e, h),
                    "gate_w": qexpert(h, mi),
                    "up_w": qexpert(h, mi),
                    "down_w": qexpert(mi, h),
                },
            }
        )
        if i % 8 == 0:
            gc.collect()
    return {
        "embed_tokens": qw(cfg.vocab_size, h),
        "layers": layers,
        "norm": ones(h),
    }


def main():
    from vllm_mlx_tpu.config import CacheConfig, ModelConfig, SchedulerConfig
    from vllm_mlx_tpu.core.model_runner import (
        ModelRunner,
        enable_persistent_compilation_cache,
    )
    from vllm_mlx_tpu.core.scheduler import Scheduler

    enable_persistent_compilation_cache()
    argv = sys.argv[1:]

    def intarg(name, default):
        for a in argv:
            if a.startswith(name + "="):
                return int(a.split("=")[1])
        return default

    n_layers = intarg("layers", 48)
    steps = intarg("steps", 16)
    blocks = intarg("blocks", 256)
    group = intarg("g", 256)
    topk = intarg("topk", 0) or None
    kv_dtype = "bfloat16" if "kv=bfloat16" in argv else "int8"
    expert_bits = 8 if "bits8" in argv else 4

    # Qwen/Qwen3-30B-A3B config.json (num_hidden_layers overridable for
    # capacity probes; 48 = the real model)
    cfg = ModelConfig(
        model_type="qwen3_moe",
        vocab_size=151936,
        hidden_size=2048,
        intermediate_size=6144,
        num_hidden_layers=n_layers,
        num_attention_heads=32,
        num_key_value_heads=4,
        head_dim=128,
        rope_theta=1000000.0,
        use_qk_norm=True,
        tie_word_embeddings=True,  # storage-only (see module docstring)
        num_experts=128,
        num_experts_per_tok=8,
        moe_intermediate_size=768,
        norm_topk_prob=True,
        eos_token_ids=[151645],
        dtype="bfloat16",
    )
    n_params = (
        cfg.num_hidden_layers
        * (
            128 * 3 * 2048 * 768
            + (32 + 4 + 4) * 128 * 2048 + 2048 * 32 * 128
            + 128 * 2048
        )
        + 151936 * 2048
    )
    log(
        f"geometry: {n_layers} layers, 128 experts top-8 -> "
        f"~{n_params/1e9:.1f}B params, experts int{expert_bits} (g={group})"
    )
    t0 = time.time()
    params = init_params(cfg, expert_bits=expert_bits, group=group)
    log(f"params init: {time.time()-t0:.1f}s")
    sched = Scheduler(
        ModelRunner(
            cfg,
            params,
            CacheConfig(
                block_size=32, num_blocks=blocks, kv_dtype=kv_dtype
            ),
            SchedulerConfig(
                max_num_seqs=32,
                max_prefill_tokens=2048,
                prefill_chunk_sizes=[128, 2048],
                max_model_len=512,
                decode_steps_per_dispatch=steps,
                moe_top_k=topk,
            ),
        ),
        tokenizer=None,
        stop_tokens={151645},
    )
    import jax

    import bench

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    try:
        stats = jax.devices()[0].memory_stats()
        log(
            f"HBM after init: {stats.get('bytes_in_use', 0)/2**30:.2f} GiB "
            f"in use / {stats.get('bytes_limit', 0)/2**30:.2f} GiB limit"
        )
    except Exception:
        pass

    t0 = time.time()
    bench.run_batch(sched, 1, 64, 4, seed=99)
    log(f"warmup single (compile): {time.time()-t0:.1f}s")
    t0 = time.time()
    bench.run_batch(sched, 32, 64, 4, seed=96)
    log(f"warmup batch (compile): {time.time()-t0:.1f}s")

    trials = []
    for trial in range(3):
        wall, ttft, total = bench.run_batch(
            sched, 1, 64, 128, seed=1 + 100 * trial
        )
        tps = (total - 1) / (wall - ttft) if ttft else total / wall
        log(
            f"single-stream[{trial}]: {total} tok in {wall:.2f}s "
            f"(ttft {1000*ttft:.0f} ms, decode {tps:.1f} tok/s)"
        )
        trials.append(tps)
    single = sorted(trials)[len(trials) // 2]
    log(f"single-stream: median {single:.1f} tok/s of {len(trials)}")

    for n in (8, 32):
        best = 0.0
        for trial in range(2):
            wall, ttft, total = bench.run_batch(
                sched, n, 64, 64, seed=2 + n + 100 * trial
            )
            best = max(best, total / wall)
            log(
                f"batch-{n}[{trial}]: {total} tok in {wall:.2f}s "
                f"(ttft {1000*ttft:.0f} ms, agg {total/wall:.1f} tok/s)"
            )
        log(f"batch-{n}: best {best:.1f} tok/s")

    print(
        json.dumps(
            {
                "metric": f"qwen3_30b_a3b_single_stream_decode"
                + ("" if n_layers == 48 else f"_layers{n_layers}"),
                "value": round(single, 1),
                "unit": "tok/s",
                "vs_baseline": round(single / BASELINE_SINGLE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

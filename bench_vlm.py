# SPDX-License-Identifier: Apache-2.0
"""VLM serving benchmark: Qwen3-VL-8B geometry, image chat on one v5e.

Mirrors the reference's image benchmark (Qwen3-VL-8B-4bit image chat,
docs/benchmarks/image.md:15-28: 74.8 tok/s at 224x224 degrading to
14.1 tok/s at 1920x1080, grid average 45.2) on the REAL serving path:
deepstack vision encode -> embedding-override + interleaved-M-RoPE
requests -> pipelined scheduler -> Pallas paged-attention decode.
Weights are random (timing only): text stack int8 at Qwen3-8B geometry
(bench_8b layout), vision tower bf16 at the HF Qwen3-VL-8B
vision_config geometry (depth 27, hidden 1152, deepstack taps 8/16/24,
out_hidden 4096).

Reported per image size:
  - ViT encode time (compile excluded; the engine caches compiled
    encoders per patch count, so steady-state is what a server sees)
  - served TTFT (prefill of the expanded prompt) and decode tok/s
  - total TTFT = encode + prefill (what an end user experiences)
plus a batch-32 aggregate at 448x448 (one image per request).

The vision tower is benched BEFORE the 8B text runner is built: full
(frame-segmented) attention at 1920x1088 materializes a ~4 GB f32
score tensor, which only fits alongside the 8.4 GB int8 text stack if
the encode runs while the tower is the sole resident. The serving path
is unaffected — features are host-staged numpy either way, exactly as
the engine stages them.

Prints ONE JSON line; secondary numbers go to stderr.
"""

import gc
import json
import sys
import time

import numpy as np

# docs/benchmarks/image.md:15-28 — Qwen3-VL-8B-4bit on M4 Max 128GB,
# decode tok/s over the size grid (74.8 @ 224^2 ... 14.1 @ 1920x1080).
BASELINE_AVG_DECODE = 45.2

IMG_TOK = 151655
VSTART = 151652
VEND = 151653


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# --------------------------------------------------------------- vision init
def init_vision_params(vcfg, seed=0):
    """Random-init the tower directly on device (timing-only values)."""
    import functools

    import jax
    import jax.numpy as jnp

    salt = [seed]

    def w(*shape):
        salt[0] += 1

        @functools.partial(jax.jit, static_argnums=(0, 1))
        def gen(shp, s):
            iota = jax.lax.broadcasted_iota(jnp.int32, shp, len(shp) - 1)
            row = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
            v = ((iota * 31 + row * 7 + s) % 255 - 127).astype(jnp.float32)
            return (v * (0.02 / 127.0)).astype(jnp.bfloat16)

        return gen(shape, salt[0])

    def ones(*shape):
        return jnp.ones(shape, jnp.bfloat16)

    def zeros(*shape):
        return jnp.zeros(shape, jnp.bfloat16)

    h = vcfg.hidden_size
    hm = h * vcfg.merge_unit
    out = vcfg.out_hidden_size
    patch_in = vcfg.in_channels * vcfg.temporal_patch_size * vcfg.patch_size**2

    def merger(postshuffle):
        return {
            "ln_w": ones(hm if postshuffle else h),
            "ln_b": zeros(hm if postshuffle else h),
            "fc1_w": w(hm, hm),
            "fc1_b": zeros(hm),
            "fc2_w": w(out, hm),
            "fc2_b": zeros(out),
        }

    blocks = []
    for _ in range(vcfg.depth):
        blocks.append(
            {
                "norm1_w": ones(h),
                "norm1_b": zeros(h),
                "norm2_w": ones(h),
                "norm2_b": zeros(h),
                "qkv_w": w(3 * h, h),
                "qkv_b": zeros(3 * h),
                "proj_w": w(h, h),
                "proj_b": zeros(h),
                "fc1_w": w(vcfg.intermediate_size, h),
                "fc1_b": zeros(vcfg.intermediate_size),
                "fc2_w": w(h, vcfg.intermediate_size),
                "fc2_b": zeros(h),
            }
        )
    return {
        "patch_embed": w(h, patch_in),
        "patch_embed_b": zeros(h),
        "pos_embed": w(vcfg.num_position_embeddings, h),
        "blocks": blocks,
        "merger": merger(postshuffle=False),
        "ds_mergers": [
            merger(postshuffle=True) for _ in vcfg.deepstack_visual_indexes
        ],
    }


def grid_for(width: int, height: int, vcfg):
    """HF smart_resize: dims rounded to patch*merge multiples."""
    unit = vcfg.patch_size * vcfg.spatial_merge_size
    gh = max(1, round(height / unit)) * vcfg.spatial_merge_size
    gw = max(1, round(width / unit)) * vcfg.spatial_merge_size
    return (1, gh, gw)


def encode_image(vparams, vcfg, grid, seed=0):
    """(feats [rows, out_h] f32 np, ds [n_ds, rows, out_h] f32 np,
    steady_encode_seconds)."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from vllm_mlx_tpu.models.qwen3_vl import (
        prepare_vision_inputs,
        vision_encode,
    )

    t, gh, gw = grid
    n = t * gh * gw
    rng = np.random.default_rng(seed)
    patch_in = vcfg.in_channels * vcfg.temporal_patch_size * vcfg.patch_size**2
    flat = rng.standard_normal((n, patch_in), dtype=np.float32) * 0.1
    prep = prepare_vision_inputs(vcfg, flat, [grid])
    fn = jax.jit(partial(vision_encode, cfg=vcfg))
    args = {k: jnp.asarray(v) for k, v in prep.items()}
    t0 = time.time()
    out, ds = fn(vparams, **args)
    jax.block_until_ready((out, ds))
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out, ds = fn(vparams, **args)
        jax.block_until_ready((out, ds))
        times.append(time.time() - t0)
    log(
        f"  encode {gw * vcfg.patch_size}x{gh * vcfg.patch_size} "
        f"({n} patches -> {n // vcfg.merge_unit} rows): "
        f"compile {compile_s:.1f}s, steady {min(times)*1000:.1f} ms"
    )
    return (
        np.asarray(out, np.float32),
        np.asarray(ds, np.float32),
        min(times),
    )


# ---------------------------------------------------------------- requests
def build_mm_request(rid, feats, ds, grid, cfg, rng, max_tokens=128):
    """Expanded prompt: 20 random text tokens + the image span + 4
    trailing tokens, with HF get_rope_index M-RoPE positions."""
    from vllm_mlx_tpu.core.request import Request, SamplingParams
    from vllm_mlx_tpu.models.qwen_vl import compute_mrope_positions

    rows = feats.shape[0]
    prefix = rng.integers(10, 150000, size=20).tolist()
    suffix = rng.integers(10, 150000, size=4).tolist()
    ids = prefix + [VSTART] + [IMG_TOK] * rows + [VEND] + suffix
    media = [{"grid": (1, grid[1], grid[2])} for _ in range(grid[0])]
    positions, delta = compute_mrope_positions(
        ids, media, IMG_TOK, 151656, 2, tokens_per_second=0.0
    )
    T = len(ids)
    h = cfg.hidden_size
    embeds = np.zeros((T, h), np.float32)
    mask = np.zeros(T, bool)
    start = len(prefix) + 1
    embeds[start : start + rows] = feats
    mask[start : start + rows] = True
    deepstack = np.zeros((ds.shape[0], T, h), np.float32)
    deepstack[:, start : start + rows] = ds
    req = Request(
        request_id=rid,
        prompt=ids,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=max_tokens),
    )
    req.prompt_embeds = embeds
    req.embeds_mask = mask
    req.mrope_positions = positions
    req.mrope_delta = delta
    req.deepstack_embeds = deepstack
    req.is_multimodal = True
    return req


def run_requests(sched, reqs):
    """Returns (wall, ttft, total_generated)."""
    t0 = time.time()
    for r in reqs:
        sched.add_request(r)
    ttft = None
    total = 0
    while sched.has_unfinished():
        for out in sched.step():
            if out.new_token_ids and ttft is None:
                ttft = time.time() - t0
            total += len(out.new_token_ids)
    return time.time() - t0, ttft, total


# -------------------------------------------------------------------- main
def main():
    from vllm_mlx_tpu.config import CacheConfig, ModelConfig, SchedulerConfig
    from vllm_mlx_tpu.core.model_runner import (
        ModelRunner,
        enable_persistent_compilation_cache,
    )
    from vllm_mlx_tpu.core.scheduler import Scheduler
    from vllm_mlx_tpu.models.qwen3_vl import Qwen3VLVisionConfig

    enable_persistent_compilation_cache()

    # HF Qwen/Qwen3-VL-8B-Instruct vision_config
    vcfg = Qwen3VLVisionConfig(
        depth=27,
        hidden_size=1152,
        intermediate_size=4304,
        num_heads=16,
        patch_size=16,
        temporal_patch_size=2,
        spatial_merge_size=2,
        out_hidden_size=4096,
        num_position_embeddings=2304,
        deepstack_visual_indexes=(8, 16, 24),
    )
    # the reference's image.md size grid (ends at 1920x1080; HF
    # smart_resize lands that on a 120x68 patch grid = 1920x1088)
    sizes = [(224, 224), (448, 448), (896, 896), (1920, 1080)]

    log("vision tower init (bf16, ~0.66B)...")
    t0 = time.time()
    vparams = init_vision_params(vcfg)
    log(f"vision params: {time.time()-t0:.1f}s")

    encoded = {}
    for wpx, hpx in sizes:
        grid = grid_for(wpx, hpx, vcfg)
        try:
            feats, ds, enc_s = encode_image(vparams, vcfg, grid, seed=wpx)
            encoded[(wpx, hpx)] = (feats, ds, enc_s, grid)
        except Exception as e:  # RESOURCE_EXHAUSTED on small-HBM parts
            log(f"  encode {wpx}x{hpx} FAILED ({type(e).__name__}): {e}")
    del vparams
    gc.collect()

    # Qwen3-8B text geometry + Qwen3-VL mrope/deepstack serving config
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
        mrope_section=[24, 20, 20],
        mrope_interleaved=True,
        num_deepstack_layers=len(vcfg.deepstack_visual_indexes),
    )
    import bench_8b

    t0 = time.time()
    params = bench_8b.init_quantized_params(cfg)
    log(f"text params init: {time.time()-t0:.1f}s (~8.2B int8)")
    runner = ModelRunner(
        cfg,
        params,
        CacheConfig(block_size=32, num_blocks=512, kv_dtype="bfloat16"),
        SchedulerConfig(
            max_num_seqs=32,
            max_prefill_tokens=2048,
            prefill_chunk_sizes=[128, 512, 2048],
            max_model_len=2560,
            decode_steps_per_dispatch=32,
        ),
    )
    sched = Scheduler(runner, tokenizer=None, stop_tokens={151645})

    rng = np.random.default_rng(7)
    rows_out = []
    for wpx, hpx in sizes:
        if (wpx, hpx) not in encoded:
            continue
        feats, ds, enc_s, grid = encoded[(wpx, hpx)]
        # first pass compiles this prompt bucket; second is the record
        for phase in ("warmup", "timed"):
            req = build_mm_request(
                f"vlm-{wpx}x{hpx}-{phase}", feats, ds, grid, cfg, rng
            )
            wall, ttft, total = run_requests(sched, [req])
            if phase == "warmup":
                log(f"  {wpx}x{hpx} warmup(compile): {wall:.1f}s")
                continue
            decode = (total - 1) / (wall - ttft) if ttft else total / wall
            rows_out.append(
                {
                    "size": f"{wpx}x{hpx}",
                    "prompt_tokens": req.num_prompt_tokens or len(req.prompt),
                    "encode_ms": round(enc_s * 1000, 1),
                    "prefill_ttft_ms": round(ttft * 1000, 1),
                    "total_ttft_ms": round((enc_s + ttft) * 1000, 1),
                    "decode_tok_s": round(decode, 1),
                }
            )
            log(
                f"  {wpx}x{hpx}: encode {enc_s*1000:.0f} ms + prefill "
                f"{ttft*1000:.0f} ms = TTFT {1000*(enc_s+ttft):.0f} ms, "
                f"decode {decode:.1f} tok/s ({total} tok in {wall:.2f}s)"
            )

    # batch-32 aggregate, one 448x448 image per request
    agg = None
    if (448, 448) in encoded:
        feats, ds, enc_s, grid = encoded[(448, 448)]
        for phase in ("warmup", "timed"):
            reqs = [
                build_mm_request(
                    f"b32-{phase}-{i}", feats, ds, grid, cfg, rng
                )
                for i in range(32)
            ]
            wall, ttft, total = run_requests(sched, reqs)
            if phase == "warmup":
                log(f"  batch-32 warmup(compile): {wall:.1f}s")
                continue
            agg = total / wall
            log(
                f"  batch-32 x 448x448: {total} tok in {wall:.2f}s "
                f"(ttft {1000*ttft:.0f} ms, agg {agg:.1f} tok/s)"
            )

    decode_avg = (
        sum(r["decode_tok_s"] for r in rows_out) / len(rows_out)
        if rows_out
        else 0.0
    )
    log(json.dumps({"rows": rows_out, "batch32_agg": agg}))
    print(
        json.dumps(
            {
                "metric": "qwen3_vl_8b_image_chat_decode_avg",
                "value": round(decode_avg, 1),
                "unit": "tok/s",
                "vs_baseline": round(decode_avg / BASELINE_AVG_DECODE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

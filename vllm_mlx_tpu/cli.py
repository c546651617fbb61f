# SPDX-License-Identifier: Apache-2.0
"""Command-line interface (reference cli.py: serve/bench/download/...).

``vllm-mlx-tpu serve <model>`` starts the OpenAI+Anthropic server on the
TPU engine; ``bench`` runs the local decode benchmark; ``download``
fetches a checkpoint from the HF hub (when the environment has egress).
"""

from __future__ import annotations

import argparse
import asyncio
import logging
import sys
from typing import List, Optional

logger = logging.getLogger(__name__)


def _add_serve_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("model", help="path to a local HF-format checkpoint")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--served-model-name", default=None)
    p.add_argument("--api-key", default=None)
    p.add_argument(
        "--engine",
        choices=["batched", "simple"],
        default="batched",
        help="continuous batching (default) or serialized single-request",
    )
    p.add_argument(
        "--dp-size", type=int, default=1,
        help="data-parallel engine replicas behind a least-loaded "
             "router (each pins its own device; no cross-device comms)",
    )
    p.add_argument(
        "--tp-size", type=int, default=1,
        help="tensor-parallel degree: shard attention heads / FFN / "
             "vocab / KV pool over a device mesh (Megatron layout; "
             "collectives ride ICI via XLA GSPMD). Must divide the "
             "model's attention and KV head counts",
    )
    # scheduler
    p.add_argument("--max-num-seqs", type=int, default=64)
    p.add_argument("--max-model-len", type=int, default=8192)
    p.add_argument("--max-kv-size", type=int, default=None,
                   help="rotating attention window: attend only the last "
                        "N tokens and reclaim KV blocks behind the window "
                        "(bounds per-sequence KV memory; lossy beyond N)")
    p.add_argument("--max-prefill-tokens", type=int, default=2048)
    p.add_argument(
        "--prefill-chunk-sizes",
        type=lambda s: [int(x) for x in s.split(",")],
        default=[128, 512, 2048],
        help="token-bucket sizes for the unified step",
    )
    p.add_argument("--moe-top-k", type=int, default=None,
                   help="clamp MoE experts-per-token below checkpoint value")
    p.add_argument("--decode-steps", type=int, default=16,
                   help="chained decode steps per dispatch on the decode "
                        "fast path (amortizes the ~3.5 ms host round-trip; "
                        "32 = max throughput, 1 = lowest finish latency)")
    # kv cache
    p.add_argument("--block-size", type=int, default=32)
    p.add_argument(
        "--num-kv-blocks", type=int, default=0,
        help="0 = auto-size from HBM via --memory-utilization",
    )
    p.add_argument("--memory-utilization", type=float, default=0.85)
    p.add_argument("--kv-cache-dtype", default="bfloat16",
                   choices=["bfloat16", "float32", "fp8_e4m3", "fp8_e5m2",
                            "int8"],
                   help="fp8/int8 halve KV memory and double decode "
                        "HBM bandwidth (lossy)")
    p.add_argument("--kv-scale", type=float, default=0.1,
                   help="int8 KV quantization step (value = stored * scale)")
    p.add_argument("--no-prefix-cache", action="store_true")
    p.add_argument("--host-kv-cache-gb", type=float, default=2.0,
                   help="host-DRAM spill tier size for evicted KV blocks "
                        "(0 disables)")
    p.add_argument("--kv-disk-cache-dir", default=None,
                   help="disk layer under the host tier (persists restarts)")
    p.add_argument(
        "--rate-limit", type=float, default=None,
        help="Max requests/second per client (token bucket); 429 beyond",
    )
    p.add_argument(
        "--rate-limit-burst", type=int, default=32,
        help="Token-bucket burst size for --rate-limit",
    )
    p.add_argument(
        "--request-timeout", type=float, default=None,
        help="Per-request wall-clock budget in seconds (408 beyond)",
    )
    p.add_argument(
        "--speculative-model",
        help="Draft model checkpoint for greedy speculative decoding "
        "(must share the target's tokenizer/vocab)",
    )
    p.add_argument(
        "--num-speculative-tokens", type=int, default=3,
        help="Draft tokens proposed per speculative round",
    )
    p.add_argument(
        "--specprefill-model",
        help="Draft checkpoint for attention-guided sparse prefill "
        "(SpecPrefill): long prompts keep only the important token "
        "chunks, cutting TTFT roughly by the drop ratio",
    )
    p.add_argument("--specprefill-keep-pct", type=float, default=0.3)
    p.add_argument("--specprefill-min-tokens", type=int, default=512)
    p.add_argument("--quantization",
                   choices=["none", "int8", "int4", "w8e4"],
                   default="none",
                   help="quantize weights at load time (w8e4 = int8 "
                        "dense + int4 MoE experts, the per-chip "
                        "capacity point for 30B-class MoE)")
    # api behavior
    p.add_argument("--max-tokens-default", type=int, default=32768)
    p.add_argument("--stream-interval", type=int, default=1)
    p.add_argument("--tool-call-parser", default="auto")
    p.add_argument("--reasoning-parser", default=None)
    p.add_argument("--enable-metrics", action="store_true")
    p.add_argument("--warm-prompts-file", default=None,
                   help="JSON file of prompts to pre-warm the prefix cache")
    p.add_argument("--mcp-config", default=None,
                   help="MCP servers JSON ({'mcpServers': {...}})")
    p.add_argument("--models-config", default=None,
                   help="multi-model registry YAML/JSON "
                        "({defaults: {...}, models: [{name, path, ...}]})")
    p.add_argument("--max-loaded-models", type=int, default=1)
    p.add_argument("--embedding-model", default=None,
                   help="path to a BERT-family checkpoint for /v1/embeddings")
    p.add_argument("--rerank-model", default=None,
                   help="path to a cross-encoder checkpoint for /v1/rerank")
    p.add_argument("--stt-model", default=None,
                   help="path to a Whisper checkpoint for /v1/audio/transcriptions")
    p.add_argument("--tts-model", default=None,
                   help="path to a VITS/MMS-TTS checkpoint for /v1/audio/speech")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-level", default="info")
    p.add_argument("--text-only", action="store_true",
                   help="serve only a VLM checkpoint's language model "
                        "(vision tower never loaded)")
    p.add_argument("--profile-dir", default=None,
                   help="enable POST /v1/profile/start|stop jax.profiler "
                        "traces dumped to this directory")
    p.add_argument(
        "--allow-remote-media", action="store_true",
        help="fetch http(s) image/video URLs in chat messages "
             "(SSRF-guarded: public addresses only, validated per "
             "redirect hop, size-capped)",
    )


def serve_command(args: argparse.Namespace) -> None:
    logging.basicConfig(
        level=getattr(logging, args.log_level.upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    from .api.server import serve
    from .config import CacheConfig, SchedulerConfig
    from .engine.batched import BatchedEngine
    from .engine.simple import SimpleEngine
    from .metrics import MetricsCollector

    cache_cfg = CacheConfig(
        block_size=args.block_size,
        num_blocks=args.num_kv_blocks,
        kv_dtype=args.kv_cache_dtype,
        kv_scale=args.kv_scale,
        memory_utilization=args.memory_utilization,
        host_cache_bytes=int(args.host_kv_cache_gb * 1024**3),
        disk_cache_dir=args.kv_disk_cache_dir,
    )
    sched_cfg = SchedulerConfig(
        max_num_seqs=args.max_num_seqs,
        max_prefill_tokens=args.max_prefill_tokens,
        prefill_chunk_sizes=args.prefill_chunk_sizes,
        max_model_len=args.max_model_len,
        max_kv_size=args.max_kv_size,
        moe_top_k=args.moe_top_k,
        decode_steps_per_dispatch=max(1, args.decode_steps),
    )
    stt_engine = None
    if args.stt_model:
        from .audio.stt import STTEngine

        stt_engine = STTEngine(args.stt_model).load()
    engine_cls = SimpleEngine if args.engine == "simple" else BatchedEngine
    if args.dp_size > 1:
        # dp=N alone pins one device per replica; dp=N x tp=M gives
        # each replica its own disjoint tp-submesh (engine/dp.py)
        from .engine.dp import DPEngine
        import functools

        engine_cls = functools.partial(DPEngine, dp_size=args.dp_size)
    engine = engine_cls(
        args.model,
        tp_size=args.tp_size,
        cache_config=cache_cfg,
        scheduler_config=sched_cfg,
        enable_prefix_cache=not args.no_prefix_cache,
        stream_interval=args.stream_interval,
        seed=args.seed,
        quantization=None if args.quantization == "none" else args.quantization,
        speculative_model=args.speculative_model,
        num_speculative_tokens=args.num_speculative_tokens,
        allow_remote_media=args.allow_remote_media,
        specprefill_model=args.specprefill_model,
        specprefill_keep_pct=args.specprefill_keep_pct,
        specprefill_min_tokens=args.specprefill_min_tokens,
        text_only=args.text_only,
        stt_engine=stt_engine,
    )
    metrics = MetricsCollector(engine) if args.enable_metrics else None
    served = args.served_model_name or args.model
    embedding_engine = None
    if args.embedding_model:
        from .embedding import EmbeddingEngine

        embedding_engine = EmbeddingEngine(args.embedding_model).load()
    rerank_engine = None
    if args.rerank_model:
        from .rerank import RerankEngine

        rerank_engine = RerankEngine(args.rerank_model).load()
    tts_engine = None
    if args.tts_model:
        from .audio.tts import TTSEngine

        tts_engine = TTSEngine(args.tts_model).load()
    warm_prompts = None
    if args.warm_prompts_file:
        from .prompt_warmup import load_warm_prompts

        warm_prompts = load_warm_prompts(args.warm_prompts_file)
    mcp_servers = None
    if args.mcp_config:
        from .mcp.config import load_mcp_config

        mcp_servers = load_mcp_config(args.mcp_config)
    model_manager = None
    if args.models_config:
        from .model_registry import ModelManager, load_registry_file

        model_manager = ModelManager(
            load_registry_file(args.models_config),
            max_loaded=args.max_loaded_models,
        )
    try:
        asyncio.run(
            serve(
                engine,
                host=args.host,
                port=args.port,
                served_models=[served],
                api_key=args.api_key,
                default_max_tokens=args.max_tokens_default,
                tool_parser_name=args.tool_call_parser,
                reasoning_parser_name=args.reasoning_parser,
                metrics=metrics,
                embedding_engine=embedding_engine,
                rerank_engine=rerank_engine,
                stt_engine=stt_engine,
                tts_engine=tts_engine,
                profile_dir=args.profile_dir,
                warm_prompts=warm_prompts,
                mcp_servers=mcp_servers,
                model_manager=model_manager,
                rate_limit_rps=args.rate_limit,
                rate_limit_burst=args.rate_limit_burst,
                request_timeout=args.request_timeout,
            )
        )
    except KeyboardInterrupt:
        pass


def bench_command(args: argparse.Namespace) -> None:
    if getattr(args, "bench_kv_quant", False):
        from . import benchmark

        benchmark.bench_kv_quant(
            args.model,
            quantization=None
            if args.quantization == "none" else args.quantization,
        )
        return
    if getattr(args, "bench_stt_model", None):
        from . import benchmark

        benchmark.bench_stt(args.bench_stt_model)
        return
    if getattr(args, "bench_tts_model", None):
        from . import benchmark

        benchmark.bench_tts(args.bench_tts_model)
        return
    if args.model:
        from . import benchmark

        argv = ["--model", args.model]
        if args.quantization != "none":
            argv += ["--quantization", args.quantization]
        benchmark.main(argv)
        return
    # synthetic headline benchmark (repo-root bench.py)
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


def model_acquire_command(args: argparse.Namespace) -> None:
    import json as _json

    from .model_workflow import acquire_model

    print(_json.dumps(acquire_model(
        args.model_id, target_dir=args.target_dir,
        revision=args.revision, is_mllm=args.mllm,
    ), indent=2, default=str))


def model_convert_command(args: argparse.Namespace) -> None:
    import json as _json

    from .model_workflow import convert_model

    print(_json.dumps(convert_model(
        args.source, args.output, dtype=args.dtype,
        quantize=args.quantize, group_size=args.group_size,
        dry_run=args.dry_run,
    ), indent=2, default=str))


def model_register_command(args: argparse.Namespace) -> None:
    import json as _json

    from .model_workflow import register_model

    print(_json.dumps(register_model(
        args.artifact, model_id=args.model_id,
        served_model_name=args.served_model_name,
        tool_call_parser=args.tool_call_parser,
        reasoning_parser=args.reasoning_parser,
        output_path=args.output,
    ), indent=2, default=str))


def model_qualify_command(args: argparse.Namespace) -> None:
    import json as _json

    from .model_workflow import qualify_model

    print(_json.dumps(qualify_model(
        args.model_id, args.url, repetitions=args.repetitions,
        output_path=args.output, dry_run=args.dry_run,
    ), indent=2, default=str))


def model_inspect_command(args: argparse.Namespace) -> None:
    import json as _json

    from .model_workflow import inspect_model

    print(_json.dumps(inspect_model(args.path), indent=2))


def model_verify_command(args: argparse.Namespace) -> None:
    from .model_workflow import verify_checkpoint

    problems = verify_checkpoint(args.path)
    if problems:
        for p in problems:
            print(f"FAIL: {p}")
        sys.exit(1)
    print("OK: checkpoint is servable")


def download_command(args: argparse.Namespace) -> None:
    from huggingface_hub import snapshot_download

    path = snapshot_download(
        args.model,
        allow_patterns=[
            "*.safetensors", "*.json", "*.txt", "*.model", "*.jinja",
        ],
    )
    print(path)


def bench_kv_cache_quant_command(args: argparse.Namespace) -> None:
    """``bench-kv-cache-quant`` (reference cli.py:1608): sweep decode
    throughput over KV-cache page dtypes for one checkpoint."""
    from . import benchmark

    benchmark.bench_kv_quant(
        args.model,
        kv_dtypes=[d.strip() for d in args.kv_dtypes.split(",") if d.strip()],
        quantization=args.quantization,
        batch=args.batch,
        prompt_len=args.prompt_len,
        max_tokens=args.max_tokens,
    )


def bench_serve_command(args: argparse.Namespace) -> None:
    """``bench-serve`` subcommand (reference cli.py:889): thin wrapper
    over the bench_serve module with args passed through."""
    from . import bench_serve

    rest = list(args.rest or [])
    if rest and rest[0] == "--":
        rest = rest[1:]
    bench_serve.main(rest)


def bench_detok_command(args: argparse.Namespace) -> None:
    """``bench-detok`` (reference cli.py:628): incremental streaming
    detokenization vs naive full re-decode per emitted token."""
    import time as _time

    import numpy as np

    from .core.detokenizer import StreamingDetokenizer
    from .utils.tokenizer import load_tokenizer

    tok = load_tokenizer(args.model)
    vocab = getattr(tok, "vocab_size", None) or len(tok.get_vocab())
    rng = np.random.default_rng(0)
    ids = rng.integers(1, vocab, size=args.tokens).tolist()

    t0 = _time.perf_counter()
    out_naive = []
    for i in range(1, len(ids) + 1):  # decode-all on every new token
        text = tok.decode(ids[:i])
        out_naive.append(text)
    t_naive = _time.perf_counter() - t0

    detok = StreamingDetokenizer(tok)
    state = detok.new_state()
    t0 = _time.perf_counter()
    parts = []
    for t in ids:
        parts.append(detok.step(state, t))
    parts.append(detok.flush(state))
    t_stream = _time.perf_counter() - t0
    print(
        f"tokens: {len(ids)}\n"
        f"naive full re-decode: {t_naive*1e3:8.1f} ms "
        f"({len(ids)/t_naive:,.0f} tok/s)\n"
        f"streaming detok:      {t_stream*1e3:8.1f} ms "
        f"({len(ids)/t_stream:,.0f} tok/s)\n"
        f"speedup: {t_naive/t_stream:.1f}x"
    )


def main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser(
        prog="vllm-mlx-tpu",
        description="TPU-native multimodal inference server",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    serve_p = sub.add_parser("serve", help="start the API server")
    _add_serve_args(serve_p)
    serve_p.set_defaults(func=serve_command)

    bench_p = sub.add_parser("bench", help="run the local benchmark")
    bench_p.add_argument("--model", default=None,
                         help="checkpoint to benchmark (default: synthetic)")
    bench_p.add_argument("--kv-cache-quant", dest="bench_kv_quant",
                         action="store_true",
                         help="compare decode throughput across KV dtypes "
                              "(bf16 / fp8 / int8)")
    bench_p.add_argument("--stt-model", dest="bench_stt_model", default=None,
                         help="measure Whisper transcription RTF")
    bench_p.add_argument("--tts-model", dest="bench_tts_model", default=None,
                         help="measure TTS synthesis RTF")
    bench_p.add_argument("--quantization",
                         choices=["none", "int8", "int4"], default="none")
    bench_p.set_defaults(func=bench_command)

    bs_p = sub.add_parser(
        "bench-serve",
        help="HTTP serving benchmark against a live server "
             "(concurrency grids, TTFT/TPOT percentiles, workload "
             "contracts); flags pass through to bench_serve",
    )
    bs_p.add_argument("rest", nargs=argparse.REMAINDER)
    bs_p.set_defaults(func=bench_serve_command)

    bd_p = sub.add_parser(
        "bench-detok",
        help="streaming-detokenizer benchmark: incremental decode vs "
             "naive full re-decode per token",
    )
    bd_p.add_argument("model", help="checkpoint/tokenizer path")
    bd_p.add_argument("--tokens", type=int, default=2048)
    bd_p.set_defaults(func=bench_detok_command)

    bkq_p = sub.add_parser(
        "bench-kv-cache-quant",
        help="decode throughput across KV-cache dtypes "
             "(bf16 vs fp8 vs int8 pages; reference cli.py:1608)",
    )
    bkq_p.add_argument("model", help="checkpoint path")
    bkq_p.add_argument("--kv-dtypes", default="bfloat16,fp8_e4m3,int8",
                       help="comma-separated page dtypes to sweep")
    bkq_p.add_argument("--quantization", default=None,
                       choices=["int8", "int4"])
    bkq_p.add_argument("--batch", type=int, default=8)
    bkq_p.add_argument("--prompt-len", type=int, default=512)
    bkq_p.add_argument("--max-tokens", type=int, default=128)
    bkq_p.set_defaults(func=bench_kv_cache_quant_command)

    dl_p = sub.add_parser("download", help="download a model from HF hub")
    dl_p.add_argument("model")
    dl_p.set_defaults(func=download_command)

    model_p = sub.add_parser("model", help="model workflow commands")
    model_sub = model_p.add_subparsers(dest="model_command", required=True)
    inspect_p = model_sub.add_parser("inspect", help="summarize a checkpoint")
    inspect_p.add_argument("path")
    inspect_p.set_defaults(func=model_inspect_command)
    verify_p = model_sub.add_parser(
        "qualification", help="check a checkpoint is servable"
    )
    verify_p.add_argument("path")
    verify_p.set_defaults(func=model_verify_command)
    acq_p = model_sub.add_parser(
        "acquire", help="download + write an acquisition manifest"
    )
    acq_p.add_argument("model_id")
    acq_p.add_argument("--target-dir", default=None)
    acq_p.add_argument("--revision", default=None)
    acq_p.add_argument("--mllm", action="store_true")
    acq_p.set_defaults(func=model_acquire_command)
    conv_p = model_sub.add_parser(
        "convert",
        help="cast / pre-quantize a checkpoint into a serving artifact",
    )
    conv_p.add_argument("source")
    conv_p.add_argument("output")
    conv_p.add_argument("--dtype", default="bfloat16",
                        choices=["bfloat16", "float32", "float16"])
    conv_p.add_argument("--quantize", default=None,
                        choices=["int8", "int4"])
    conv_p.add_argument("--group-size", type=int, default=64)
    conv_p.add_argument("--dry-run", action="store_true")
    conv_p.set_defaults(func=model_convert_command)
    reg_p = model_sub.add_parser(
        "register", help="write a registration handoff manifest"
    )
    reg_p.add_argument("artifact")
    reg_p.add_argument("--model-id", default=None)
    reg_p.add_argument("--served-model-name", default=None)
    reg_p.add_argument("--tool-call-parser", default=None)
    reg_p.add_argument("--reasoning-parser", default=None)
    reg_p.add_argument("--output", default=None)
    reg_p.set_defaults(func=model_register_command)
    qual_p = model_sub.add_parser(
        "qualify", help="run bench-serve workloads against a live server"
    )
    qual_p.add_argument("model_id")
    qual_p.add_argument("--url", default="http://localhost:8000")
    qual_p.add_argument("--repetitions", type=int, default=1)
    qual_p.add_argument("--output", default=None)
    qual_p.add_argument("--dry-run", action="store_true")
    qual_p.set_defaults(func=model_qualify_command)

    args = parser.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()

# SPDX-License-Identifier: Apache-2.0
"""HTTP serving benchmark (reference bench_serve.py: prompt sweeps,
concurrency grids, TTFT/TPOT stats, JSON/CSV outputs).

Drives a RUNNING server over HTTP only — measures what a client sees:
TTFT, per-token latency (TPOT), aggregate throughput, at each
concurrency level.

Usage:
    python -m vllm_mlx_tpu.bench_serve --url http://localhost:8000 \
        --model NAME --concurrency 1,4,16 --requests 32 --max-tokens 128
"""

from __future__ import annotations

import argparse
import asyncio
import json
import statistics
import sys
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import aiohttp

DEFAULT_PROMPTS = [
    "Explain the difference between a process and a thread.",
    "Write a short poem about the ocean.",
    "What are the main causes of the French Revolution?",
    "Describe how a hash table works and when to use one.",
    "Summarize the plot of Romeo and Juliet in three sentences.",
    "What is the time complexity of quicksort and why?",
    "Give three tips for writing readable Python code.",
    "How does photosynthesis convert light into chemical energy?",
]


@dataclass
class RequestResult:
    ok: bool = False
    ttft: Optional[float] = None
    total_time: float = 0.0
    completion_tokens: int = 0
    error: str = ""

    @property
    def tpot(self) -> Optional[float]:
        if self.ttft is None or self.completion_tokens <= 1:
            return None
        return (self.total_time - self.ttft) / (self.completion_tokens - 1)


async def _one_request(
    session: aiohttp.ClientSession,
    url: str,
    model: str,
    prompt: str,
    max_tokens: int,
    temperature: float,
) -> RequestResult:
    r = RequestResult()
    body = {
        "model": model,
        "messages": [{"role": "user", "content": prompt}],
        "max_tokens": max_tokens,
        "temperature": temperature,
        "stream": True,
        "stream_options": {"include_usage": True},
    }
    t0 = time.time()
    try:
        async with session.post(
            f"{url}/v1/chat/completions", json=body
        ) as resp:
            if resp.status != 200:
                r.error = f"HTTP {resp.status}: {await resp.text()}"
                return r
            async for raw_line in resp.content:
                line = raw_line.decode().strip()
                if not line.startswith("data: "):
                    continue
                payload = line[6:]
                if payload == "[DONE]":
                    break
                chunk = json.loads(payload)
                choices = chunk.get("choices") or []
                if choices and choices[0].get("delta", {}).get("content"):
                    if r.ttft is None:
                        r.ttft = time.time() - t0
                usage = chunk.get("usage")
                if usage:
                    r.completion_tokens = usage.get("completion_tokens", 0)
        r.total_time = time.time() - t0
        r.ok = True
    except Exception as e:
        r.error = str(e)
    return r


async def run_level(
    url: str,
    model: str,
    concurrency: int,
    num_requests: int,
    max_tokens: int,
    temperature: float,
    prompts: List[str],
) -> Dict:
    sem = asyncio.Semaphore(concurrency)
    results: List[RequestResult] = []
    t0 = time.time()

    async with aiohttp.ClientSession(
        timeout=aiohttp.ClientTimeout(total=600)
    ) as session:

        async def worker(i: int):
            async with sem:
                res = await _one_request(
                    session,
                    url,
                    model,
                    prompts[i % len(prompts)],
                    max_tokens,
                    temperature,
                )
                results.append(res)

        await asyncio.gather(*[worker(i) for i in range(num_requests)])
    wall = time.time() - t0
    ok = [r for r in results if r.ok]
    ttfts = [r.ttft for r in ok if r.ttft is not None]
    tpots = [r.tpot for r in ok if r.tpot is not None]
    total_tokens = sum(r.completion_tokens for r in ok)

    def pct(vals, p):
        if not vals:
            return None
        return statistics.quantiles(vals, n=100)[p - 1] if len(vals) > 1 else vals[0]

    return {
        "concurrency": concurrency,
        "requests": num_requests,
        "ok": len(ok),
        "errors": len(results) - len(ok),
        "wall_s": round(wall, 2),
        "throughput_tok_s": round(total_tokens / wall, 1) if wall else 0,
        "requests_per_s": round(len(ok) / wall, 2) if wall else 0,
        "ttft_p50_ms": round(1000 * pct(ttfts, 50), 1) if ttfts else None,
        "ttft_p95_ms": round(1000 * pct(ttfts, 95), 1) if ttfts else None,
        "tpot_p50_ms": round(1000 * pct(tpots, 50), 2) if tpots else None,
        "total_tokens": total_tokens,
    }


async def amain(args) -> List[Dict]:
    prompts = DEFAULT_PROMPTS
    if args.prompts_file:
        with open(args.prompts_file) as f:
            data = json.load(f)
        prompts = data if isinstance(data, list) else data.get("prompts", [])
    model = args.model
    if model is None:
        async with aiohttp.ClientSession() as session:
            async with session.get(f"{args.url}/v1/models") as resp:
                models = await resp.json()
                model = models["data"][0]["id"]
    rows = []
    for c in args.concurrency:
        row = await run_level(
            args.url,
            model,
            c,
            args.requests,
            args.max_tokens,
            args.temperature,
            prompts,
        )
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description="HTTP serving benchmark")
    p.add_argument("--url", default="http://localhost:8000")
    p.add_argument("--model", default=None)
    p.add_argument(
        "--concurrency",
        type=lambda s: [int(x) for x in s.split(",")],
        default=[1, 4, 16],
    )
    p.add_argument("--requests", type=int, default=32)
    p.add_argument("--max-tokens", type=int, default=128)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--prompts-file", default=None)
    p.add_argument("--output", default=None, help="write JSON results here")
    args = p.parse_args(argv)
    rows = asyncio.run(amain(args))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()

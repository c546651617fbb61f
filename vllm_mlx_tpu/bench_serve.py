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


# -------------------------------------------------------- workload contracts
@dataclass
class WorkloadCase:
    """Declarative serving contract (reference bench_serve.py:50): a
    payload plus QUALITY checks, so the bench detects behavioral
    regressions, not only speed ones."""

    name: str
    payload: Dict
    endpoint: str = "/v1/chat/completions"
    expect_status: int = 200
    expect_regex: Optional[str] = None  # must match the response text
    forbid_regex: Optional[str] = None  # must NOT match
    expect_json_valid: bool = False  # content parses as JSON
    min_tokens: int = 0
    timeout_s: float = 120.0


def builtin_workloads(model: str) -> List[WorkloadCase]:
    msg = [{"role": "user", "content": "Reply with the word apple."}]
    return [
        WorkloadCase(
            name="chat_greedy",
            payload={"model": model, "messages": msg, "max_tokens": 24,
                     "temperature": 0},
            min_tokens=1,
        ),
        WorkloadCase(
            name="chat_sampled_seeded",
            payload={"model": model, "messages": msg, "max_tokens": 24,
                     "temperature": 0.8, "seed": 7},
            min_tokens=1,
        ),
        WorkloadCase(
            name="json_schema_contract",
            payload={
                "model": model,
                "messages": [{"role": "user", "content": "emit"}],
                "max_tokens": 120,
                "temperature": 0,
                "response_format": {
                    "type": "json_schema",
                    "json_schema": {
                        "name": "t",
                        "schema": {
                            "type": "object",
                            "properties": {
                                "ok": {"type": "boolean"},
                                "n": {"type": "integer"},
                            },
                            "required": ["ok", "n"],
                            "additionalProperties": False,
                        },
                    },
                },
            },
            expect_json_valid=True,
            expect_regex=r'"ok"',
        ),
        WorkloadCase(
            name="stop_string",
            payload={"model": model, "messages": msg, "max_tokens": 64,
                     "temperature": 0, "stop": ["apple"]},
            forbid_regex=r"apple",
        ),
        WorkloadCase(
            name="completions_basic",
            endpoint="/v1/completions",
            payload={"model": model, "prompt": "Once upon a time",
                     "max_tokens": 16, "temperature": 0},
            min_tokens=1,
        ),
    ]


def _extract_text(endpoint: str, data: Dict) -> str:
    try:
        ch = data["choices"][0]
        if endpoint.endswith("chat/completions"):
            return ch["message"].get("content") or ""
        return ch.get("text") or ""
    except (KeyError, IndexError, TypeError):
        return ""


async def _fetch_metrics(session, url: str) -> Dict[str, float]:
    try:
        async with session.get(f"{url}/metrics") as resp:
            if resp.status != 200:
                return {}
            out: Dict[str, float] = {}
            for line in (await resp.text()).splitlines():
                if line.startswith("#") or " " not in line:
                    continue
                name, _, val = line.rpartition(" ")
                try:
                    out[name] = float(val)
                except ValueError:
                    pass
            return out
    except Exception:
        return {}


async def run_workloads(
    url: str, cases: List[WorkloadCase], repeat: int = 1
) -> List[Dict]:
    import re

    rows: List[Dict] = []
    async with aiohttp.ClientSession() as session:
        metrics_before = await _fetch_metrics(session, url)
        for case in cases:
            passes, fails, latencies, failures = 0, 0, [], []
            for _ in range(repeat):
                t0 = time.time()
                reasons = []
                try:
                    async with asyncio.timeout(case.timeout_s):
                        async with session.post(
                            f"{url}{case.endpoint}", json=case.payload
                        ) as resp:
                            data = await resp.json()
                            if resp.status != case.expect_status:
                                reasons.append(
                                    f"status {resp.status} != "
                                    f"{case.expect_status}"
                                )
                except TimeoutError:
                    reasons.append(f"timeout > {case.timeout_s}s")
                    data = {}
                except Exception as e:
                    reasons.append(f"error: {e}")
                    data = {}
                latencies.append(time.time() - t0)
                if not reasons:
                    text = _extract_text(case.endpoint, data)
                    usage = data.get("usage") or {}
                    if case.min_tokens and (
                        usage.get("completion_tokens", 0) < case.min_tokens
                    ):
                        reasons.append("too few completion tokens")
                    if case.expect_regex and not re.search(
                        case.expect_regex, text
                    ):
                        reasons.append(
                            f"missing /{case.expect_regex}/ in {text[:80]!r}"
                        )
                    if case.forbid_regex and re.search(
                        case.forbid_regex, text
                    ):
                        reasons.append(f"forbidden /{case.forbid_regex}/")
                    if case.expect_json_valid:
                        try:
                            json.loads(text)
                        except (json.JSONDecodeError, TypeError):
                            reasons.append(f"invalid JSON: {text[:80]!r}")
                if reasons:
                    fails += 1
                    failures.extend(reasons)
                else:
                    passes += 1
            rows.append(
                {
                    "case": case.name,
                    "passes": passes,
                    "fails": fails,
                    "p50_latency_ms": round(
                        1000 * statistics.median(latencies), 1
                    ),
                    "failures": failures[:5],
                }
            )
        metrics_after = await _fetch_metrics(session, url)
    deltas = {
        k: round(metrics_after[k] - metrics_before.get(k, 0.0), 3)
        for k in metrics_after
        if metrics_after[k] != metrics_before.get(k, 0.0)
        and ("_count" in k or "_total" in k)
    }
    if deltas:
        rows.append({"case": "_metric_deltas", "deltas": deltas})
    return rows


def load_workloads(path: str) -> List[WorkloadCase]:
    with open(path) as f:
        raw = json.load(f)
    return [WorkloadCase(**c) for c in raw]


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
    if args.workloads is not None:
        cases = (
            builtin_workloads(model)
            if args.workloads == "builtin"
            else load_workloads(args.workloads)
        )
        rows = await run_workloads(args.url, cases, repeat=args.repeat)
        for row in rows:
            print(json.dumps(row), flush=True)
        return rows
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
    p.add_argument(
        "--workloads", default=None,
        help="'builtin' or a JSON file of WorkloadCase dicts: run "
        "quality contracts (regex/JSON/token checks + metric deltas) "
        "instead of the throughput sweep",
    )
    p.add_argument("--repeat", type=int, default=3,
                   help="repetitions per workload case")
    p.add_argument("--csv", default=None, help="also write results as CSV")
    args = p.parse_args(argv)
    rows = asyncio.run(amain(args))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(rows, f, indent=2)
    if args.csv and rows:
        import csv

        keys = sorted({k for r in rows for k in r})
        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(rows)


if __name__ == "__main__":
    main()

# SPDX-License-Identifier: Apache-2.0
"""GSM8K accuracy eval against a running server (reference
tests/evals/gsm8k/gsm8k_eval.py; committed snapshot
gsm8k_qwen3_0.6b_results.json shows acc 0.40 @ 264.3 out-tok/s).

Usage:
  python tests/evals/gsm8k/gsm8k_eval.py --url http://localhost:8000 \
      --dataset /path/to/gsm8k_test.jsonl --limit 100 --output results.json

The dataset is the standard GSM8K test jsonl ({"question": ..., "answer":
"...#### 42"}); no network access is assumed — point --dataset at a local
copy.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import re
import time
from typing import List, Optional

import aiohttp

ANSWER_RE = re.compile(r"####\s*([\-0-9,\.]+)")
PRED_RES = [
    re.compile(r"####\s*([\-0-9,\.]+)"),
    re.compile(r"(?:answer is|answer:)\s*\$?([\-0-9,\.]+)", re.IGNORECASE),
    re.compile(r"\\boxed\{([\-0-9,\.]+)\}"),
]

FEW_SHOT = (
    "Solve the math word problem. Show your reasoning, then give the "
    "final numeric answer after '####'.\n\n"
    "Question: Tom has 3 apples and buys 2 more. How many does he have?\n"
    "Answer: Tom starts with 3 apples and buys 2 more, so 3 + 2 = 5.\n#### 5\n\n"
)


def _norm(num: str) -> Optional[str]:
    num = num.replace(",", "").rstrip(".")
    try:
        f = float(num)
    except ValueError:
        return None
    return str(int(f)) if f == int(f) else str(f)


def extract_gold(answer: str) -> Optional[str]:
    m = ANSWER_RE.search(answer)
    return _norm(m.group(1)) if m else None


def extract_pred(text: str) -> Optional[str]:
    for pat in PRED_RES:
        m = pat.search(text)
        if m:
            return _norm(m.group(1))
    nums = re.findall(r"[\-0-9,\.]*\d", text)
    return _norm(nums[-1]) if nums else None


async def eval_one(session, url, model, q, max_tokens):
    body = {
        "model": model,
        "messages": [
            {"role": "user", "content": FEW_SHOT + f"Question: {q}\nAnswer:"}
        ],
        "max_tokens": max_tokens,
        "temperature": 0.0,
    }
    async with session.post(f"{url}/v1/chat/completions", json=body) as resp:
        data = await resp.json()
    choice = data["choices"][0]
    return (
        choice["message"]["content"] or "",
        data.get("usage", {}).get("completion_tokens", 0),
    )


async def amain(args):
    with open(args.dataset) as f:
        rows = [json.loads(ln) for ln in f if ln.strip()]
    if args.limit:
        rows = rows[: args.limit]
    async with aiohttp.ClientSession(
        timeout=aiohttp.ClientTimeout(total=600)
    ) as session:
        if args.model is None:
            async with session.get(f"{args.url}/v1/models") as resp:
                args.model = (await resp.json())["data"][0]["id"]
        sem = asyncio.Semaphore(args.concurrency)
        results = []
        t0 = time.time()

        async def work(i, row):
            async with sem:
                text, toks = await eval_one(
                    session, args.url, args.model, row["question"],
                    args.max_tokens,
                )
                gold = extract_gold(row["answer"])
                pred = extract_pred(text)
                results.append(
                    {
                        "i": i,
                        "correct": gold is not None and pred == gold,
                        "gold": gold,
                        "pred": pred,
                        "tokens": toks,
                    }
                )

        await asyncio.gather(*[work(i, r) for i, r in enumerate(rows)])
        wall = time.time() - t0
    acc = sum(r["correct"] for r in results) / max(len(results), 1)
    total_toks = sum(r["tokens"] for r in results)
    summary = {
        "model": args.model,
        "n": len(results),
        "accuracy": round(acc, 4),
        "output_tokens_per_second": round(total_toks / wall, 1),
        "wall_s": round(wall, 1),
    }
    print(json.dumps(summary, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump({"summary": summary, "results": results}, f, indent=2)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://localhost:8000")
    p.add_argument("--model", default=None)
    p.add_argument("--dataset", required=True)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--concurrency", type=int, default=8)
    p.add_argument("--max-tokens", type=int, default=512)
    p.add_argument("--output", default=None)
    args = p.parse_args()
    asyncio.run(amain(args))


if __name__ == "__main__":
    main()

# SPDX-License-Identifier: Apache-2.0
"""bench_serve against a live in-process server: exercises concurrent
SSE streams through the full HTTP + engine stack (the reference's
bench-serve integration role, tests/test_bench_serve.py)."""

import asyncio

import pytest

from vllm_mlx_tpu import bench_serve

from test_server import server_client, tiny_model_dir  # noqa: F401


def test_concurrent_streaming_load(server_client):  # noqa: F811
    loop, client = server_client
    url = f"http://{client.server.host}:{client.server.port}"

    row = loop.run_until_complete(
        bench_serve.run_level(
            url,
            model="tiny-llama",
            concurrency=4,
            num_requests=8,
            max_tokens=8,
            temperature=0.0,
            prompts=["hello there", "the quick brown", "testing one two"],
        )
    )
    assert row["ok"] == 8
    assert row["errors"] == 0
    assert row["total_tokens"] > 0
    assert row["throughput_tok_s"] > 0
    assert row["ttft_p50_ms"] is not None


def test_sequential_level(server_client):  # noqa: F811
    loop, client = server_client
    url = f"http://{client.server.host}:{client.server.port}"
    row = loop.run_until_complete(
        bench_serve.run_level(
            url,
            model="tiny-llama",
            concurrency=1,
            num_requests=3,
            max_tokens=5,
            temperature=0.0,
            prompts=["a b c"],
        )
    )
    assert row["ok"] == 3
    assert row["requests_per_s"] > 0

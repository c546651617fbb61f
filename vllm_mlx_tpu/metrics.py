# SPDX-License-Identifier: Apache-2.0
"""Prometheus metrics (reference metrics.py:80-508).

HTTP counters/histograms, inference counters, TTFT histogram, engine
gauges (queue depths, prefix-cache hit rate, KV-pool occupancy — the TPU
analogue of the reference's Metal-memory gauges).
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)

try:
    from prometheus_client import (
        CollectorRegistry,
        Counter,
        Gauge,
        Histogram,
        generate_latest,
    )

    HAVE_PROMETHEUS = True
except Exception:  # pragma: no cover
    HAVE_PROMETHEUS = False


class MetricsCollector:
    def __init__(self, engine=None) -> None:
        self.engine = engine
        self.enabled = HAVE_PROMETHEUS
        if not self.enabled:  # pragma: no cover
            return
        self.registry = CollectorRegistry()
        ns = "vllm_mlx_tpu"
        self.http_requests = Counter(
            f"{ns}_http_requests_total",
            "HTTP requests",
            ["path", "method", "status"],
            registry=self.registry,
        )
        self.http_latency = Histogram(
            f"{ns}_http_request_duration_seconds",
            "HTTP request latency",
            ["path"],
            registry=self.registry,
            buckets=(0.01, 0.05, 0.1, 0.25, 0.5, 1, 2.5, 5, 10, 30, 60, 120),
        )
        self.prompt_tokens = Counter(
            f"{ns}_prompt_tokens_total",
            "Prompt tokens processed",
            registry=self.registry,
        )
        self.generation_tokens = Counter(
            f"{ns}_generation_tokens_total",
            "Tokens generated",
            registry=self.registry,
        )
        self.requests_finished = Counter(
            f"{ns}_requests_finished_total",
            "Finished requests",
            ["finish_reason"],
            registry=self.registry,
        )
        self.ttft = Histogram(
            f"{ns}_time_to_first_token_seconds",
            "Time to first token",
            registry=self.registry,
            buckets=(0.01, 0.025, 0.05, 0.1, 0.15, 0.25, 0.5, 1, 2.5, 5, 10),
        )
        self.running = Gauge(
            f"{ns}_requests_running", "Running requests", registry=self.registry
        )
        self.waiting = Gauge(
            f"{ns}_requests_waiting", "Waiting requests", registry=self.registry
        )
        self.prefix_hit_rate = Gauge(
            f"{ns}_prefix_cache_hit_rate",
            "Prefix cache hit rate",
            registry=self.registry,
        )
        self.kv_blocks_active = Gauge(
            f"{ns}_kv_blocks_active", "Active KV blocks", registry=self.registry
        )
        self.kv_blocks_cached = Gauge(
            f"{ns}_kv_blocks_cached",
            "Cached (reusable) KV blocks",
            registry=self.registry,
        )
        self.kv_blocks_free = Gauge(
            f"{ns}_kv_blocks_free", "Free KV blocks", registry=self.registry
        )

    # ------------------------------------------------------------- recording
    def record_http(self, path: str, method: str, status: int, dt: float):
        if not self.enabled:
            return
        self.http_requests.labels(path, method, str(status)).inc()
        self.http_latency.labels(path).observe(dt)

    def record_generation(
        self,
        prompt_tokens: int,
        completion_tokens: int,
        finish_reason: Optional[str],
        ttft_s: Optional[float] = None,
    ):
        if not self.enabled:
            return
        self.prompt_tokens.inc(max(prompt_tokens, 0))
        self.generation_tokens.inc(max(completion_tokens, 0))
        self.requests_finished.labels(finish_reason or "unknown").inc()
        if ttft_s is not None:
            self.ttft.observe(ttft_s)

    def _update_engine_gauges(self) -> None:
        if not self.enabled or self.engine is None:
            return
        try:
            stats: Dict[str, Any] = self.engine.get_stats()
        except Exception:  # pragma: no cover
            return
        self.running.set(stats.get("running", 0) or 0)
        self.waiting.set(stats.get("waiting", 0) or 0)
        pc = stats.get("prefix_cache") or {}
        self.prefix_hit_rate.set(pc.get("hit_rate", 0.0))
        self.kv_blocks_active.set(pc.get("active_blocks", 0))
        self.kv_blocks_cached.set(pc.get("cached_blocks", 0))
        self.kv_blocks_free.set(pc.get("free_blocks", 0))

    def render(self) -> str:
        if not self.enabled:  # pragma: no cover
            return ""
        self._update_engine_gauges()
        return generate_latest(self.registry).decode()

# SPDX-License-Identifier: Apache-2.0
"""Hardware detection + memory-bandwidth micro-benchmark.

TPU-native rebuild of the reference's ``optimizations.py`` (chip-family
detection ``:34-143`` and Metal memory-bandwidth micro-bench ``:144``):
here the platform is whatever JAX backend is live (TPU v5e/v6e chips,
or CPU in tests), detection reads the device descriptors instead of
sysctl, and the bandwidth probe times an on-device HBM-to-HBM copy.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


@dataclass
class HardwareInfo:
    platform: str  # "tpu" | "cpu" | ...
    device_kind: str  # e.g. "TPU v5e"
    num_devices: int
    # per-device memory (bytes); None when the backend doesn't report it
    memory_bytes: Optional[int] = None
    memory_used_bytes: Optional[int] = None
    details: Dict[str, Any] = field(default_factory=dict)

    def summary(self) -> str:
        mem = (
            f", {self.memory_bytes / 2**30:.1f} GiB HBM/device"
            if self.memory_bytes
            else ""
        )
        return (
            f"{self.num_devices}x {self.device_kind} "
            f"[{self.platform}]{mem}"
        )


def detect_hardware() -> HardwareInfo:
    """Describe the live JAX backend's devices."""
    import jax

    devices = jax.devices()
    d0 = devices[0]
    mem = used = None
    try:
        stats = d0.memory_stats() or {}
        mem = stats.get("bytes_limit")
        used = stats.get("bytes_in_use")
    except Exception:
        pass
    details: Dict[str, Any] = {}
    for attr in ("coords", "core_on_chip", "process_index"):
        v = getattr(d0, attr, None)
        if v is not None:
            details[attr] = v
    return HardwareInfo(
        platform=d0.platform,
        device_kind=getattr(d0, "device_kind", d0.platform),
        num_devices=len(devices),
        memory_bytes=mem,
        memory_used_bytes=used,
        details=details,
    )


def measure_memory_bandwidth(
    size_mb: int = 256, iters: int = 10
) -> Dict[str, float]:
    """On-device copy bandwidth (GB/s): read+write of a ``size_mb``
    buffer, steady-state average. The result reflects achievable HBM
    bandwidth for elementwise-bound kernels (the serving decode path's
    regime), not the STREAM peak."""
    import jax
    import jax.numpy as jnp

    n = size_mb * 2**20 // 4
    x = jnp.arange(n, dtype=jnp.float32)

    @jax.jit
    def copy(a):
        return a * 1.0000001

    copy(x).block_until_ready()  # compile
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = copy(y)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    nbytes = n * 4 * 2  # read + write
    return {
        "size_mb": float(size_mb),
        "seconds_per_pass": dt,
        "gb_per_s": nbytes / dt / 1e9,
    }


def recommended_settings(hw: Optional[HardwareInfo] = None) -> Dict[str, Any]:
    """Serving-config hints from the detected hardware (the reference
    derives Metal-limit hints from chip family; here: KV-pool headroom
    and default dtypes from the HBM size)."""
    hw = hw or detect_hardware()
    out: Dict[str, Any] = {
        "dtype": "bfloat16",
        "kv_cache_dtype": "bfloat16",
    }
    if hw.memory_bytes:
        gib = hw.memory_bytes / 2**30
        # leave ~15% headroom for activations + compiled programs
        out["kv_pool_budget_gib"] = round(gib * 0.85, 1)
        if gib <= 16:
            out["kv_cache_dtype"] = "fp8_e4m3"
    if hw.platform != "tpu":
        out["note"] = "non-TPU backend: use float32 for parity testing"
        out["dtype"] = "float32"
        out["kv_cache_dtype"] = "float32"
    return out

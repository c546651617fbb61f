# SPDX-License-Identifier: Apache-2.0
"""vLLM platform-plugin shim for the TPU/JAX backend.

TPU-native rebuild of the reference's vLLM integration surface
(``plugin.py:17-60`` detection entry point, ``vllm_platform.py:248-333``
platform config hooks, ``worker.py:23`` worker): the entry point
activates only when vLLM is importable AND a JAX TPU backend is live,
and the platform class adapts vLLM's config to this package's engine.

vLLM is not part of this image, so every vLLM import is deferred and
the module degrades to inert stubs — importing it never raises. The
``[project.entry-points."vllm.platform_plugins"]`` hook would be:
``tpu_jax = vllm_mlx_tpu.vllm_plugin:tpu_platform_plugin``.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

logger = logging.getLogger(__name__)


def tpu_platform_plugin() -> Optional[str]:
    """vLLM platform-detection entry point: return the platform class
    path when this process can serve on a JAX TPU backend."""
    try:
        import vllm  # noqa: F401
    except ImportError:
        logger.debug("vllm not installed; TPU platform plugin inactive")
        return None
    try:
        import jax

        if not any(d.platform == "tpu" for d in jax.devices()):
            logger.debug("no TPU devices visible; plugin inactive")
            return None
    except Exception as exc:  # jax missing or backend init failed
        logger.debug("TPU platform not available: %s", exc)
        return None
    return "vllm_mlx_tpu.vllm_plugin.TpuJaxPlatform"


class TpuJaxPlatform:
    """Minimal vLLM Platform adapter (mirrors the hooks the reference's
    MLXPlatform implements; reference vllm_platform.py:248-333).

    Only config-shaping hooks are implemented — execution routes to
    this package's own engine via :class:`TpuJaxWorker`.
    """

    device_name = "tpu"
    device_type = "tpu"

    @classmethod
    def check_and_update_config(cls, vllm_config: Any) -> None:
        parallel = getattr(vllm_config, "parallel_config", None)
        if parallel is not None and getattr(parallel, "worker_cls", "auto") == "auto":
            parallel.worker_cls = "vllm_mlx_tpu.vllm_plugin.TpuJaxWorker"
        comp = getattr(vllm_config, "compilation_config", None)
        if comp is not None and hasattr(comp, "cudagraph_capture_sizes"):
            comp.cudagraph_capture_sizes = []  # CUDA graphs: n/a on TPU
        cache = getattr(vllm_config, "cache_config", None)
        if cache is not None and getattr(cache, "block_size", None) is None:
            # match this package's KV page size default
            cache.block_size = 16

    @classmethod
    def verify_quantization(cls, quant: Optional[str]) -> None:
        supported = {None, "", "int8", "int4", "fp8"}
        if quant not in supported:
            raise ValueError(
                f"Quantization {quant!r} not supported on the TPU "
                f"backend; supported: int8, int4 (weights), fp8/int8 (KV)"
            )

    @classmethod
    def is_pin_memory_available(cls) -> bool:
        return False  # host staging is managed by jax device_put

    @classmethod
    def supports_fp8(cls) -> bool:
        return True  # fp8 KV-cache pages (ops/ragged_attention.py)

    @classmethod
    def get_current_memory_usage(cls, device: Any = None) -> float:
        try:
            import jax

            stats = jax.devices()[0].memory_stats() or {}
            return float(stats.get("bytes_in_use", 0))
        except Exception:
            return 0.0

    @classmethod
    def get_device_communicator_cls(cls) -> str:
        # collectives ride XLA/ICI via jax.shard_map — there is no
        # NCCL-style side-channel communicator to name (the reference
        # returns a module that does not exist; SURVEY §2.8)
        return "vllm_mlx_tpu.parallel.mesh.MeshCollectives"

    def __repr__(self) -> str:  # pragma: no cover
        return f"<TpuJaxPlatform device={self.device_name}>"


class TpuJaxWorker:
    """vLLM worker adapter: owns one BatchedEngine on the local chip
    mesh (reference worker.py:23 MLXWorker)."""

    def __init__(self, vllm_config: Any = None, **_: Any) -> None:
        self.vllm_config = vllm_config
        self.engine = None

    def init_device(self) -> None:
        import jax

        self.devices = jax.devices()

    def load_model(self) -> None:
        from .engine.batched import BatchedEngine

        model = getattr(
            getattr(self.vllm_config, "model_config", None), "model", None
        )
        if model is None:
            raise ValueError("vllm_config.model_config.model is required")
        self.engine = BatchedEngine(model)

# SPDX-License-Identifier: Apache-2.0
"""Model acquisition/inspection workflow (reference model_workflow.py:
manifest-based inspect/acquire/convert — no weight loading).

``inspect_model`` summarizes a local checkpoint: architecture, shapes,
parameter count/bytes, tokenizer/template presence, servability notes.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, List, Optional

SUPPORTED_DECODERS = {
    "llama", "qwen2", "qwen3", "qwen3_moe", "gemma2", "gemma3_text",
}
SUPPORTED_ENCODERS = {"bert", "roberta", "xlm-roberta"}
SUPPORTED_AUDIO = {"whisper"}


def _safetensor_info(model_path: str) -> Dict[str, Any]:
    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_params = 0
    dtypes: Dict[str, int] = {}
    try:
        from safetensors import safe_open

        for f in files:
            with safe_open(f, framework="numpy") as st:
                for name in st.keys():
                    sl = st.get_slice(name)
                    shape = sl.get_shape()
                    n = 1
                    for d in shape:
                        n *= d
                    n_params += n
                    dt = str(sl.get_dtype())
                    dtypes[dt] = dtypes.get(dt, 0) + n
    except Exception:
        pass
    return {
        "files": [os.path.basename(f) for f in files],
        "total_bytes": total_bytes,
        "param_count": n_params,
        "param_dtypes": dtypes,
    }


def inspect_model(model_path: str) -> Dict[str, Any]:
    out: Dict[str, Any] = {"path": model_path}
    cfg_path = os.path.join(model_path, "config.json")
    if not os.path.exists(cfg_path):
        out["error"] = "no config.json — not a HF-format checkpoint"
        return out
    with open(cfg_path) as f:
        cfg = json.load(f)
    mt = cfg.get("model_type", "?")
    out["model_type"] = mt
    out["architectures"] = cfg.get("architectures")
    for k in (
        "hidden_size", "num_hidden_layers", "num_attention_heads",
        "num_key_value_heads", "vocab_size", "intermediate_size",
        "max_position_embeddings", "num_experts", "sliding_window",
        "torch_dtype",
    ):
        if k in cfg:
            out[k] = cfg[k]
    out["weights"] = _safetensor_info(model_path)
    out["tokenizer"] = {
        "tokenizer_json": os.path.exists(
            os.path.join(model_path, "tokenizer.json")
        ),
        "tokenizer_config": os.path.exists(
            os.path.join(model_path, "tokenizer_config.json")
        ),
        "generation_config": os.path.exists(
            os.path.join(model_path, "generation_config.json")
        ),
    }
    if mt in SUPPORTED_DECODERS:
        out["servable_as"] = "llm"
    elif mt in SUPPORTED_ENCODERS:
        out["servable_as"] = "embedding/rerank"
    elif mt in SUPPORTED_AUDIO:
        out["servable_as"] = "stt"
    else:
        out["servable_as"] = None
        out["note"] = (
            f"model_type {mt!r} is not in this build's zoo yet "
            f"(supported: {sorted(SUPPORTED_DECODERS | SUPPORTED_ENCODERS | SUPPORTED_AUDIO)})"
        )
    # KV footprint estimate per 1k tokens (helps pool sizing)
    if mt in SUPPORTED_DECODERS:
        kvh = cfg.get("num_key_value_heads", cfg.get("num_attention_heads", 0))
        hd = cfg.get("head_dim") or (
            cfg.get("hidden_size", 0) // max(cfg.get("num_attention_heads", 1), 1)
        )
        layers = cfg.get("num_hidden_layers", 0)
        out["kv_bytes_per_1k_tokens_bf16"] = 1000 * layers * 2 * kvh * hd * 2
    return out


def verify_checkpoint(model_path: str) -> List[str]:
    """Quick servability checks; returns a list of problems (empty = ok)."""
    problems: List[str] = []
    info = inspect_model(model_path)
    if "error" in info:
        return [info["error"]]
    if not info["weights"]["files"]:
        problems.append("no .safetensors weight files")
    if not info["tokenizer"]["tokenizer_json"]:
        problems.append("no tokenizer.json (fast tokenizer required)")
    if info.get("servable_as") is None:
        problems.append(info.get("note", "unsupported model type"))
    return problems


# --------------------------------------------------------------- acquisition
LLM_ALLOW_PATTERNS = [
    "*.safetensors", "*.json", "*.txt", "*.model", "*.tiktoken",
    "tokenizer*", "*.py",
]
MLLM_ALLOW_PATTERNS = LLM_ALLOW_PATTERNS + ["preprocessor_config.json",
                                            "*.jinja"]
REGISTRATION_MANIFEST_NAME = "vllm_mlx_tpu.registration.json"


def _now_iso() -> str:
    import datetime

    return datetime.datetime.now(datetime.timezone.utc).isoformat()


def _write_manifest(path: str, payload: Dict[str, Any]) -> None:
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, default=str)


def acquire_model(
    model_id: str,
    target_dir: Optional[str] = None,
    revision: Optional[str] = None,
    is_mllm: bool = False,
    local_files_only: bool = False,
) -> Dict[str, Any]:
    """Download a checkpoint (HF hub) and write an acquisition manifest
    next to it (reference model_workflow.py:369 ``acquire_model``)."""
    from huggingface_hub import snapshot_download

    patterns = MLLM_ALLOW_PATTERNS if is_mllm else LLM_ALLOW_PATTERNS
    started = _now_iso()
    path = snapshot_download(
        model_id,
        revision=revision,
        allow_patterns=patterns,
        local_dir=target_dir,
        local_files_only=local_files_only,
    )
    manifest = {
        "kind": "vllm-mlx-tpu-acquisition",
        "schema_version": 1,
        "model_id": model_id,
        "revision": revision,
        "started_at": started,
        "completed_at": _now_iso(),
        "path": str(path),
        "inspection": inspect_model(str(path)),
    }
    _write_manifest(os.path.join(path, "vllm_mlx_tpu.acquisition.json"),
                    manifest)
    return manifest


# ---------------------------------------------------------------- conversion
def convert_model(
    source_path: str,
    output_path: str,
    *,
    dtype: str = "bfloat16",
    quantize: Optional[str] = None,  # None | "int8" | "int4"
    group_size: int = 64,
    dry_run: bool = False,
) -> Dict[str, Any]:
    """TPU-native conversion: cast a HF checkpoint to the serving dtype
    and optionally pre-quantize the projection weights, writing a
    self-describing artifact the loader serves directly (the analogue of
    the reference's mlx-lm convert recipe, model_workflow.py:477).

    Quantized tensors are stored as ``<name>`` (int8/packed-int4 codes)
    plus ``<name>.scale``; ``config.json`` gains a
    ``vllm_mlx_tpu_quantization`` block recording the recipe.
    """
    import numpy as np

    recipe = {
        "dtype": dtype,
        "quantize": quantize,
        "group_size": group_size,
    }
    manifest: Dict[str, Any] = {
        "kind": "vllm-mlx-tpu-conversion",
        "schema_version": 1,
        "source_path": source_path,
        "output_path": output_path,
        "started_at": _now_iso(),
        "recipe": recipe,
        "source_inspection": inspect_model(source_path),
    }
    if dry_run:
        manifest["status"] = "dry_run"
        return manifest

    from safetensors.numpy import save_file

    from .config import ModelConfig
    from .models import loader
    from .ops.quant import QuantizedTensor, quantize_params

    cfg = ModelConfig.from_pretrained(source_path)
    params = loader.load_params(source_path, cfg, dtype=dtype)
    if quantize in ("int8", "int4"):
        params = quantize_params(
            params, bits=8 if quantize == "int8" else 4,
            group_size=group_size,
        )

    flat: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        if isinstance(node, QuantizedTensor):
            flat[prefix] = np.asarray(node.w_q)
            flat[prefix + ".scale"] = np.asarray(
                node.scale.astype("float32")
            )
        elif isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}.{k}" if prefix else k)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}.{i}")
        elif node is not None:
            flat[prefix] = np.asarray(node)

    walk(params, "")
    os.makedirs(output_path, exist_ok=True)
    save_file(flat, os.path.join(output_path, "model.safetensors"))
    # copy config + tokenizer artifacts
    import shutil

    with open(os.path.join(source_path, "config.json")) as f:
        raw_cfg = json.load(f)
    raw_cfg["vllm_mlx_tpu_quantization"] = recipe
    with open(os.path.join(output_path, "config.json"), "w") as f:
        json.dump(raw_cfg, f, indent=2)
    for name in os.listdir(source_path):
        if name.startswith("tokenizer") or name in (
            "special_tokens_map.json", "vocab.json", "merges.txt",
            "generation_config.json", "preprocessor_config.json",
            "chat_template.jinja",
        ):
            shutil.copy(
                os.path.join(source_path, name),
                os.path.join(output_path, name),
            )
    manifest["completed_at"] = _now_iso()
    manifest["status"] = "succeeded"
    manifest["output_inspection"] = _safetensor_info(output_path)
    _write_manifest(
        os.path.join(output_path, "vllm_mlx_tpu.conversion.json"), manifest
    )
    return manifest


# -------------------------------------------------------------- registration
def register_model(
    artifact_path: str,
    *,
    model_id: Optional[str] = None,
    served_model_name: Optional[str] = None,
    tool_call_parser: Optional[str] = None,
    reasoning_parser: Optional[str] = None,
    serving_defaults: Optional[Dict[str, Any]] = None,
    output_path: Optional[str] = None,
) -> Dict[str, Any]:
    """Portable registration manifest for a finalized artifact — a
    handoff record, deliberately NOT a live-registry mutation
    (reference model_workflow.py:547)."""
    if not os.path.isdir(artifact_path):
        raise NotADirectoryError(artifact_path)
    mid = model_id or os.path.basename(os.path.normpath(artifact_path))
    payload = {
        "kind": "vllm-mlx-tpu-model-registration",
        "schema_version": 1,
        "created_at": _now_iso(),
        "model_id": mid,
        "served_model_name": served_model_name or mid,
        "artifact_path": str(artifact_path),
        "serving_defaults": serving_defaults or {},
        "parser_policy": {
            k: v
            for k, v in {
                "tool_call_parser": tool_call_parser,
                "reasoning_parser": reasoning_parser,
            }.items()
            if v is not None
        },
        "inspection": inspect_model(artifact_path),
        "qualification_required": True,
        "production_ready": False,
    }
    out = output_path or os.path.join(
        artifact_path, REGISTRATION_MANIFEST_NAME
    )
    _write_manifest(out, payload)
    payload["manifest_path"] = out
    return payload


# ------------------------------------------------------------- qualification
def qualify_model(
    model_id: str,
    server_url: str,
    *,
    repetitions: int = 1,
    output_path: Optional[str] = None,
    dry_run: bool = False,
) -> Dict[str, Any]:
    """Run (or plan) a bench-serve workload qualification against a live
    server and record the handoff manifest (reference
    model_workflow.py:630)."""
    payload: Dict[str, Any] = {
        "kind": "vllm-mlx-tpu-model-qualification",
        "schema_version": 1,
        "created_at": _now_iso(),
        "model_id": model_id,
        "server_url": server_url,
        "repetitions": repetitions,
        "production_ready": False,
    }
    if dry_run:
        payload["status"] = "dry_run"
    else:
        import asyncio

        from .bench_serve import builtin_workloads, run_workloads

        rows = asyncio.run(
            run_workloads(
                server_url, builtin_workloads(model_id),
                repeat=repetitions,
            )
        )
        payload["results"] = rows
        ok = all(r.get("passed", r.get("passes", 0) > 0) for r in rows)
        payload["status"] = "succeeded" if ok else "failed"
        payload["completed_at"] = _now_iso()
    if output_path:
        _write_manifest(output_path, payload)
        payload["manifest_path"] = output_path
    return payload

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

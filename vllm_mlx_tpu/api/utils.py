# SPDX-License-Identifier: Apache-2.0
"""API-layer text utilities (reference api/utils.py:39-515).

``clean_output_text`` strips channel/control scaffolding some models
emit (GPT-OSS harmony channels, stray end-of-turn markers);
``is_mllm_model`` inspects a checkpoint config for a vision tower.
"""

from __future__ import annotations

import json
import os
import re
from typing import Optional

_HARMONY_FINAL_RE = re.compile(
    r"<\|channel\|>final<\|message\|>(.*?)(?:<\|end\|>|<\|return\|>|$)",
    re.DOTALL,
)
_HARMONY_ANY_RE = re.compile(
    r"<\|channel\|>\w+(?:\s+to=\S+)?<\|message\|>.*?(?:<\|end\|>|<\|return\|>|$)",
    re.DOTALL,
)
_CONTROL_TOKENS = [
    "<|im_end|>",
    "<|endoftext|>",
    "<|eot_id|>",
    "<|end|>",
    "<|return|>",
    "</s>",
    "[/INST]",
]


def clean_output_text(text: str) -> str:
    """Remove channel markup and stray control tokens from model output
    (reference api/utils.py:39-133)."""
    if not text:
        return text
    if "<|channel|>" in text:
        finals = _HARMONY_FINAL_RE.findall(text)
        if finals:
            text = "".join(finals)
        else:
            text = _HARMONY_ANY_RE.sub("", text)
    for tok in _CONTROL_TOKENS:
        text = text.replace(tok, "")
    return text


_MLLM_ARCH_MARKERS = (
    "vision_config",
    "vision_tower",
    "image_token_id",
    "mm_projector",
)

_MLLM_MODEL_TYPES = {
    "qwen2_vl", "qwen2_5_vl", "qwen3_vl", "qwen3_vl_moe", "llava",
    "llava_next", "idefics", "idefics2", "idefics3", "smolvlm", "gemma3",
    "paligemma", "internvl", "pixtral", "mllama", "qwen2_audio",
    "deepseek_vl", "glm4v", "glm4v_moe", "mistral3", "aya_vision", "llava_onevision", "llama4",
}


def is_mllm_model(model_path: str) -> bool:
    """Config-based VLM detection (reference api/utils.py:408-515)."""
    cfg_path = os.path.join(model_path, "config.json")
    if not os.path.exists(cfg_path):
        return False
    try:
        with open(cfg_path) as f:
            cfg = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    if cfg.get("model_type", "") in _MLLM_MODEL_TYPES:
        return True
    return any(k in cfg for k in _MLLM_ARCH_MARKERS)

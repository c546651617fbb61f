# SPDX-License-Identifier: Apache-2.0
"""Serve a VLM checkpoint's language model as a plain text LM
(reference text_model_from_vlm.py:38 ``build_text_model``).

A Qwen-VL / LLaVA-family checkpoint embeds a complete decoder LM; for
text-only serving the vision tower is dead weight (hundreds of MB of
HBM and load time). This loads ONLY the ``language_model`` tensors into
the shared decoder param tree and normalizes the text config, so any
engine / CLI path can treat the checkpoint as its text model.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional, Tuple

from .config import ModelConfig

logger = logging.getLogger(__name__)


def is_vlm_checkpoint(model_path: str) -> bool:
    try:
        with open(os.path.join(model_path, "config.json")) as f:
            cfg = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return "vision_config" in cfg or "text_config" in cfg


def load_text_model_from_vlm(
    model_path: str, dtype: Optional[str] = None
) -> Tuple[ModelConfig, Dict[str, Any]]:
    """(text ModelConfig, decoder params) from a VLM checkpoint,
    skipping every vision/projector tensor."""
    from .models import loader

    with open(os.path.join(model_path, "config.json")) as f:
        raw = json.load(f)
    text_cfg = raw.get("text_config") or raw
    cfg = ModelConfig.from_hf_config(text_cfg)
    if cfg.mrope_section is None:
        rs = (raw.get("rope_scaling") or {}).get("mrope_section")
        if rs:
            cfg.mrope_section = list(rs)
    if not cfg.eos_token_ids and raw.get("eos_token_id") is not None:
        eos = raw["eos_token_id"]
        cfg.eos_token_ids = [eos] if isinstance(eos, int) else list(eos)
    # loader._strip already maps language_model-prefixed names; vision
    # tensors match no branch and are skipped
    params = loader.load_params(model_path, cfg, dtype=dtype)
    if "embed_tokens" not in params:
        raise ValueError(
            f"{model_path} has no language_model tensors "
            "(not a VLM checkpoint?)"
        )
    logger.info(
        "loaded text model from VLM checkpoint %s (%s, vision tower "
        "skipped)", model_path, cfg.model_type,
    )
    return cfg, params

# SPDX-License-Identifier: Apache-2.0
"""Tokenizer loading and chat templating.

TPU-native analogue of the reference's mlx-lm tokenizer plumbing
(reference utils/tokenizer.py:52-200 ``load_model_with_fallback`` eos
fixups; engine/batched.py:599 ``_apply_chat_template``). Uses HF
``transformers`` fast tokenizers (local files only — the serving path
never hits the network).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, List, Optional, Sequence, Set

logger = logging.getLogger(__name__)


def load_tokenizer(model_path: str):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(model_path, local_files_only=True)


def collect_eos_ids(tokenizer, model_path: Optional[str] = None) -> Set[int]:
    """Union of eos ids from the tokenizer and generation_config.json
    (the reference unions tokenizer-level eos sets the same way,
    scheduler.py:1297-1315)."""
    eos: Set[int] = set()
    tid = getattr(tokenizer, "eos_token_id", None)
    if tid is not None:
        if isinstance(tid, (list, tuple, set)):
            eos.update(int(t) for t in tid)
        else:
            eos.add(int(tid))
    if model_path:
        gc_path = os.path.join(model_path, "generation_config.json")
        if os.path.exists(gc_path):
            try:
                with open(gc_path) as f:
                    gc = json.load(f)
                g = gc.get("eos_token_id")
                if isinstance(g, int):
                    eos.add(g)
                elif isinstance(g, (list, tuple)):
                    eos.update(int(t) for t in g)
            except Exception as e:
                logger.warning("bad generation_config.json: %s", e)
    return eos


def apply_chat_template(
    tokenizer,
    messages: List[Dict[str, Any]],
    *,
    tools: Optional[List[Dict[str, Any]]] = None,
    add_generation_prompt: bool = True,
    enable_thinking: Optional[bool] = None,
    chat_template_kwargs: Optional[Dict[str, Any]] = None,
) -> str:
    """Render messages through the model's chat template to a prompt
    string. Falls back to a simple ChatML-ish rendering when the
    tokenizer ships no template."""
    kwargs: Dict[str, Any] = dict(chat_template_kwargs or {})
    if enable_thinking is not None:
        kwargs.setdefault("enable_thinking", enable_thinking)
    if getattr(tokenizer, "chat_template", None):
        try:
            return tokenizer.apply_chat_template(
                messages,
                tools=tools or None,
                tokenize=False,
                add_generation_prompt=add_generation_prompt,
                **kwargs,
            )
        except Exception as e:
            logger.warning("chat template failed (%s); using fallback", e)
    parts = []
    for m in messages:
        content = m.get("content", "")
        if isinstance(content, list):
            content = "".join(
                c.get("text", "") for c in content if isinstance(c, dict)
            )
        parts.append(f"<|im_start|>{m.get('role', 'user')}\n{content}<|im_end|>\n")
    if add_generation_prompt:
        parts.append("<|im_start|>assistant\n")
    return "".join(parts)

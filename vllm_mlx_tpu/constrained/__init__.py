# SPDX-License-Identifier: Apache-2.0
"""Structured output (response_format json_object / json_schema).

The reference enforces JSON via lm-format-enforcer logits masks plus a
JSON system prompt (reference constrained/json_schema_processor.py,
api/tool_calling.py:876). Round-1 TPU build: the system-prompt guidance
+ balanced-JSON extraction + truncated-JSON repair + schema validation
layers are implemented here; FSM token-mask enforcement hooks into the
sampler's ``allow_mask`` in a later round.
"""

from .json_schema import (  # noqa: F401
    build_json_system_prompt,
    extract_json,
    repair_json,
    simplify_schema,
    validate_against_schema,
)

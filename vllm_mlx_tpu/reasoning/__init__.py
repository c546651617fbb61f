# SPDX-License-Identifier: Apache-2.0
"""Reasoning-content parsers: split thinking from the final answer.

Parity with the reference's reasoning/ package (ReasoningParser ABC with
streaming deltas + registry, reference reasoning/base.py:36-113,
reasoning/__init__.py:34-76). Most families differ only in tag choice;
``TagReasoningParser`` covers them with per-family aliases.
"""

from .base import (  # noqa: F401
    ReasoningParser,
    ReasoningStreamState,
    TagReasoningParser,
    get_reasoning_parser,
    list_reasoning_parsers,
    register_reasoning_parser,
)

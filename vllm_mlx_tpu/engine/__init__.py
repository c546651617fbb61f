# SPDX-License-Identifier: Apache-2.0
"""Engine abstraction: BaseEngine, SimpleEngine, BatchedEngine."""

from .base import BaseEngine, EngineBusy, GenerationOutput  # noqa: F401
from .batched import BatchedEngine  # noqa: F401
from .simple import SimpleEngine  # noqa: F401

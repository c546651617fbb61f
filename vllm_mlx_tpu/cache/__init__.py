# SPDX-License-Identifier: Apache-2.0
"""KV-cache subsystem: prefix cache index, tiered spill (future)."""

from .prefix_cache import PrefixCache, PrefixCacheStats  # noqa: F401

# SPDX-License-Identifier: Apache-2.0
"""Vision embedding cache (reference vision_embedding_cache.py:129):
content-hash-keyed LRU of encoded (projected) image features, so
repeated images skip the ViT entirely."""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import Any, Dict, Optional

import numpy as np


def image_hash(content: bytes) -> str:
    return hashlib.sha256(content).hexdigest()


def _entry_bytes(entry: Any) -> int:
    if isinstance(entry, (tuple, list)):
        return sum(_entry_bytes(e) for e in entry)
    return int(getattr(entry, "nbytes", 64))


class VisionEmbeddingCache:
    def __init__(self, max_bytes: int = 512 * 1024 * 1024) -> None:
        self.max_bytes = max_bytes
        self._entries: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    def get(self, key: str) -> Optional[np.ndarray]:
        feats = self._entries.get(key)
        if feats is None:
            self.misses += 1
            return None
        self._entries.move_to_end(key)
        self.hits += 1
        return feats

    def put(self, key: str, feats: Any) -> None:
        """``feats`` may be a bare array or a composite entry (tuple of
        features + grid metadata, as the Qwen-VL/Pixtral paths store)."""
        if key in self._entries:
            self._entries.move_to_end(key)
            return
        size = _entry_bytes(feats)
        while self._bytes + size > self.max_bytes and self._entries:
            _, old = self._entries.popitem(last=False)
            self._bytes -= _entry_bytes(old)
        if self._bytes + size <= self.max_bytes:
            self._entries[key] = feats
            self._bytes += size

    def clear(self) -> int:
        n = len(self._entries)
        self._entries.clear()
        self._bytes = 0
        return n

    def get_stats(self) -> Dict[str, Any]:
        total = self.hits + self.misses
        return {
            "entries": len(self._entries),
            "bytes": self._bytes,
            "hits": self.hits,
            "misses": self.misses,
            "hit_rate": self.hits / total if total else 0.0,
        }

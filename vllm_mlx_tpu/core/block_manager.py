# SPDX-License-Identifier: Apache-2.0
"""Host-side paged-KV block accounting.

TPU-native analogue of the reference's block pool
(reference paged_cache.py:84-473): the pool itself is one preallocated
HBM array owned by the ModelRunner; this class only tracks integer block
ownership — free list, ref counts (for copy-on-write prefix sharing),
and the content-hash chain used by the prefix cache.

Block 0 is reserved as the scratch block: padded prefill positions and
inactive decode slots write there, and nothing ever reads it (attention
masks by sequence length).
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

SCRATCH_BLOCK = 0


def hash_block_tokens(
    parent_hash: Optional[str], token_ids: Sequence[int]
) -> str:
    """Chained content hash of a full block (reference paged_cache.py:40)."""
    h = hashlib.sha256()
    if parent_hash:
        h.update(parent_hash.encode())
    h.update(",".join(map(str, token_ids)).encode())
    return h.hexdigest()


class BlockManager:
    """Free-list allocator with ref counting and an LRU of cached blocks.

    Blocks can be in three states:
      * free (on the free list, not holding cached content)
      * active (ref_count > 0, owned by >= 1 running sequences)
      * cached (ref_count == 0 but retained for prefix reuse, evictable LRU)
    """

    def __init__(self, num_blocks: int, block_size: int) -> None:
        if num_blocks < 2:
            raise ValueError("need at least 2 blocks (block 0 is scratch)")
        self.num_blocks = num_blocks
        self.block_size = block_size
        self._free: List[int] = list(range(num_blocks - 1, 0, -1))  # pop() -> 1 first
        self.ref_count: Dict[int, int] = {}
        # content-hash -> block id for full cached blocks
        self.hash_to_block: Dict[str, int] = {}
        self.block_hash: Dict[int, str] = {}
        # cached (ref 0) blocks in LRU order (oldest first)
        self._cached_lru: "OrderedDict[int, None]" = OrderedDict()
        # called ONCE per allocation wave as ([(block, hash), ...]) just
        # before reclaimed cached blocks are handed out (spill hook for
        # the host/disk KV tier) — batched so the spill path can gather
        # the whole wave in one device dispatch instead of one blocking
        # fetch per block
        self.evict_callback = None

    # ------------------------------------------------------------------ stats
    @property
    def num_free_blocks(self) -> int:
        return len(self._free) + len(self._cached_lru)

    @property
    def num_active_blocks(self) -> int:
        return len(self.ref_count)

    @property
    def num_cached_blocks(self) -> int:
        return len(self._cached_lru)

    # ------------------------------------------------------------- allocation
    def can_allocate(self, n: int) -> bool:
        return self.num_free_blocks >= n

    def allocate(self, n: int) -> Optional[List[int]]:
        """Allocate n blocks (evicting cached blocks LRU-first if needed)."""
        if not self.can_allocate(n):
            return None
        out: List[int] = []
        evicted: List[Tuple[int, str]] = []
        for _ in range(n):
            if self._free:
                b = self._free.pop()
            else:
                b, _ = self._cached_lru.popitem(last=False)
                h = self.block_hash.get(b)
                if h is not None:
                    evicted.append((b, h))
                self._drop_hash(b)
            self.ref_count[b] = 1
            out.append(b)
        if evicted and self.evict_callback is not None:
            try:
                self.evict_callback(evicted)
            except Exception:  # pragma: no cover - spill best-effort
                pass
        return out

    def _drop_hash(self, block: int) -> None:
        h = self.block_hash.pop(block, None)
        if h is not None and self.hash_to_block.get(h) == block:
            del self.hash_to_block[h]

    def incref(self, block: int) -> None:
        if block in self._cached_lru:
            del self._cached_lru[block]
            self.ref_count[block] = 1
        else:
            self.ref_count[block] = self.ref_count.get(block, 0) + 1

    def free(self, blocks: Sequence[int], cache: bool = False) -> None:
        """Release one reference on each block. With ``cache=True``, blocks
        that carry a content hash are retained (evictable) for prefix reuse;
        otherwise refcount-0 blocks return to the free list."""
        for b in blocks:
            rc = self.ref_count.get(b)
            if rc is None:
                continue
            if rc > 1:
                self.ref_count[b] = rc - 1
                continue
            del self.ref_count[b]
            if cache and b in self.block_hash:
                self._cached_lru[b] = None
                self._cached_lru.move_to_end(b)
            else:
                self._drop_hash(b)
                self._free.append(b)

    # ----------------------------------------------------------- prefix reuse
    def register_block_hash(self, block: int, h: str) -> None:
        """Publish a full block's content hash for future prefix matching."""
        old = self.hash_to_block.get(h)
        if old is not None and old != block:
            return  # keep the existing canonical block for this content
        self.hash_to_block[h] = block
        self.block_hash[block] = h

    def lookup_prefix(self, hashes: Sequence[str]) -> List[int]:
        """Longest run of already-cached blocks matching the hash chain.
        Increfs and returns the matched blocks (caller owns them)."""
        out: List[int] = []
        for h in hashes:
            b = self.hash_to_block.get(h)
            if b is None:
                break
            out.append(b)
        for b in out:
            self.incref(b)
        return out

    def reset(self) -> None:
        self._free = list(range(self.num_blocks - 1, 0, -1))
        self.ref_count.clear()
        self.hash_to_block.clear()
        self.block_hash.clear()
        self._cached_lru.clear()

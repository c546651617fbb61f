# SPDX-License-Identifier: Apache-2.0
"""Automatic prefix caching over paged-KV block hashes.

TPU-native redesign of the reference's prefix caches
(reference memory_cache.py:635 MemoryAwarePrefixCache — token-granular
exact/prefix/supersequence/LCP matching over copied KV tensors;
prefix_cache.py:372 BlockAwarePrefixCache — 64-token block slicing with
``mx.concatenate`` reconstruction):

Here a cache "entry" is just the hash-chained blocks a finished request
leaves behind in the preallocated HBM pool. Fetch = longest block-hash
chain match + refcount (zero tensor copies, SURVEY.md section 7 design
translation); trim = dropping tail blocks; eviction = the BlockManager's
LRU reclaiming refcount-0 cached blocks when allocation needs them, so
the cache automatically fills exactly the KV memory the pool isn't
using (the reference's memory-budget machinery collapses into the pool
bound).

Block-granular chain matching subsumes the reference's four hit classes
up to block granularity: an exact or supersequence entry matches every
full block of the prompt; prefix/LCP entries match their common leading
blocks.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core.block_manager import BlockManager, hash_block_tokens

logger = logging.getLogger(__name__)


@dataclass
class PrefixCacheStats:
    queries: int = 0
    hits: int = 0
    hit_tokens: int = 0
    stored_entries: int = 0
    stored_blocks: int = 0

    @property
    def hit_rate(self) -> float:
        return self.hits / self.queries if self.queries else 0.0

    def as_dict(self) -> dict:
        return {
            "queries": self.queries,
            "hits": self.hits,
            "hit_tokens": self.hit_tokens,
            "hit_rate": self.hit_rate,
            "stored_entries": self.stored_entries,
            "stored_blocks": self.stored_blocks,
        }


def salt_tokens(tokens_slice, offset, media_spans):
    """Apply media-hash salting to a token slice whose first element
    sits at absolute row ``offset`` — produces strings identical to
    salting the full sequence, so incremental (chunk-at-a-time) hash
    chains match full-sequence ones."""
    if not media_spans:
        return tokens_slice
    out = list(tokens_slice)
    hi = offset + len(out)
    for start, end, mh in media_spans:
        for i in range(max(start, offset), min(end, hi)):
            out[i - offset] = f"{out[i - offset]}@{mh}:{i - start}"
    return out


class PrefixCache:
    """Host-side index; the KV bytes live in the pool itself.

    With a ``host_tier`` attached (cache/host_tier.py), pool-evicted
    blocks spill to host DRAM (and optionally disk), and fetches extend
    their chain match by restoring spilled blocks into fresh pool blocks
    — the TPU analogue of the reference's SSD promotion
    (reference scheduler.py:2852-2997)."""

    def __init__(
        self,
        block_size: int,
        enabled: bool = True,
        host_tier=None,
        runner=None,
    ) -> None:
        self.block_size = block_size
        self.enabled = enabled
        self.host_tier = host_tier
        self.runner = runner
        self.spiller = None
        self.stats = PrefixCacheStats()

    def attach_spill(self, block_mgr: BlockManager, runner) -> None:
        """Wire the pool-eviction spill hook.

        Spills are asynchronous: the eviction wave is gathered in ONE
        device dispatch (runner.read_blocks_async) and handed to a
        background writer (cache/host_tier.py AsyncSpillWriter), so
        admission latency doesn't scale with evicted-chain length —
        the architecture of the reference's SSD writer thread
        (reference ssd_cache.py:702-854) on the TPU host tier."""
        self.runner = runner
        if self.host_tier is None:
            return
        from .host_tier import AsyncSpillWriter

        if self.spiller is not None:
            self.spiller.close()
        self.spiller = AsyncSpillWriter(self.host_tier)

        def on_evict(pairs) -> None:
            todo = [
                (b, h)
                for b, h in pairs
                if not self.host_tier.contains(h)
                and not self.spiller.pending(h)
            ]
            if not todo:
                return
            arr = runner.read_blocks_async([b for b, _ in todo])
            self.spiller.submit(arr, [h for _, h in todo])

        block_mgr.evict_callback = on_evict

    # ------------------------------------------------------------------ fetch
    def block_hashes(
        self,
        tokens: Sequence[int],
        media_spans: Optional[Sequence[Tuple[int, int, str]]] = None,
    ) -> List[str]:
        """Chain hashes for every *full* block of the token sequence.

        ``media_spans`` salts rows covered by image/video features with
        the media CONTENT hash (+ row offset): multimodal placeholder
        tokens share ids across different images, so without salting two
        prompts differing only in pixels would collide (the reference's
        image-hash-keyed mllm_cache, mllm_cache.py:134-344). Text blocks
        before the first media span keep their plain hashes, so shared
        system prompts still hit across requests with different media."""
        bs = self.block_size
        toks = salt_tokens(list(tokens), 0, media_spans)
        out: List[str] = []
        parent: Optional[str] = None
        for i in range(len(toks) // bs):
            h = hash_block_tokens(parent, toks[i * bs : (i + 1) * bs])
            out.append(h)
            parent = h
        return out

    def fetch(
        self,
        block_mgr: BlockManager,
        tokens: Sequence[int],
        media_spans: Optional[Sequence[Tuple[int, int, str]]] = None,
    ) -> Tuple[List[int], int, str]:
        """Longest cached block-chain prefix. Increfs matched blocks and
        returns (blocks, cached_token_count, hit_type)."""
        if not self.enabled:
            return [], 0, "disabled"
        self.stats.queries += 1
        hashes = self.block_hashes(tokens, media_spans)
        blocks = block_mgr.lookup_prefix(hashes)
        tier_hit = False
        if (
            self.host_tier is not None
            and self.runner is not None
            and len(blocks) < len(hashes)
        ):
            if self.spiller is not None:
                # land in-flight spills this chain needs before lookup
                self.spiller.flush_hashes(hashes[len(blocks):])
            restored = self.host_tier.lookup_chain(hashes[len(blocks):])
            for i, kv in enumerate(restored):
                fresh = block_mgr.allocate(1)
                if fresh is None:
                    break
                b = fresh[0]
                self.runner.write_block(b, kv)
                block_mgr.register_block_hash(b, hashes[len(blocks)])
                blocks.append(b)
                tier_hit = True
        cached_tokens = len(blocks) * self.block_size
        if not blocks:
            return [], 0, "miss"
        self.stats.hits += 1
        self.stats.hit_tokens += cached_tokens
        hit = "exact" if len(blocks) == len(hashes) else "prefix"
        if tier_hit:
            hit = f"{hit}+tier"
        return blocks, cached_tokens, hit

    # ------------------------------------------------------------------ store
    def store(
        self,
        block_mgr: BlockManager,
        tokens: Sequence[int],
        blocks: Sequence[int],
        media_spans: Optional[Sequence[Tuple[int, int, str]]] = None,
        valid_tokens: Optional[int] = None,
    ) -> bool:
        """Publish a finished request's full blocks for future reuse.

        Only blocks fully covered by *KV-written* positions are hashed:
        the final sampled token's KV may never have been written, so the
        valid span defaults to ``len(tokens) - 1``. ``valid_tokens``
        caps it lower for requests that ended before computing their
        whole prompt (abort/error mid-prefill) — blocks past it hold
        uninitialized KV and must never be published. Returns True when
        the caller should retain the blocks as evictable cache entries.
        """
        if not self.enabled or not blocks:
            return False
        bs = self.block_size
        valid = max(len(tokens) - 1, 0)
        if valid_tokens is not None:
            valid = min(valid, max(valid_tokens, 0))
        n_full = min(valid // bs, len(blocks))
        if n_full == 0:
            return False
        hashes = self.block_hashes(
            list(tokens[: n_full * bs]), media_spans
        )
        for i in range(n_full):
            block_mgr.register_block_hash(blocks[i], hashes[i])
        self.stats.stored_entries += 1
        self.stats.stored_blocks += n_full
        return True

    # ------------------------------------------------------------------ admin
    def save_all(self, block_mgr: BlockManager) -> int:
        """Shutdown persistence: copy every idle cached block's KV into
        the host tier and flush the tier to disk, so a restarted server
        with the same --kv-disk-cache-dir restores warm prefixes on
        first fetch (reference memory_cache.py:1207-1415 +
        server.py:1177-1237 save/load at shutdown/startup; the model
        fingerprint guard is the tier's namespace + per-entry
        shape/dtype checks)."""
        if self.host_tier is None or self.runner is None:
            return 0
        if self.spiller is not None:
            self.spiller.flush()  # land in-flight eviction spills first
        todo = []
        for b in list(block_mgr._cached_lru):
            h = block_mgr.block_hash.get(b)
            if h is not None and not self.host_tier.contains(h):
                todo.append((b, h))
        if todo:
            # one batched gather + one blocking fetch for the whole set
            kvs = np.asarray(
                self.runner.read_blocks_async([b for b, _ in todo])
            )
            for i, (_, h) in enumerate(todo):
                self.host_tier.store(h, kvs[i])
        self.host_tier.flush_to_disk()
        return len(todo)

    def clear(self, block_mgr: BlockManager) -> int:
        """Drop every refcount-0 cached block back to the free list
        (DELETE /v1/cache semantics, reference server.py:3576)."""
        n = block_mgr.num_cached_blocks
        while block_mgr._cached_lru:
            b, _ = block_mgr._cached_lru.popitem(last=False)
            block_mgr._drop_hash(b)
            block_mgr._free.append(b)
        return n

    def get_stats(self, block_mgr: Optional[BlockManager] = None) -> dict:
        d = self.stats.as_dict()
        if block_mgr is not None:
            d["cached_blocks"] = block_mgr.num_cached_blocks
            d["active_blocks"] = block_mgr.num_active_blocks
            d["free_blocks"] = block_mgr.num_free_blocks
        if self.host_tier is not None:
            d["host_tier"] = self.host_tier.get_stats()
        return d

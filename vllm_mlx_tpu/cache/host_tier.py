# SPDX-License-Identifier: Apache-2.0
"""Tiered KV spill: host-DRAM tier with optional disk persistence.

TPU-native redesign of the reference's SSD cold tier (reference
ssd_cache.py:635 ``SSDCacheTier``: SQLite index + .npz payloads +
writer thread) per SURVEY.md §7: on TPU the first spill target is host
DRAM (device->host DMA), with disk below it for restart persistence.

Unit of storage = one hash-chained KV block (all layers), matching the
pool layout: ``[num_layers, page_size, 2*kvh, head_dim]`` per block.
Evicted prefix-cache blocks spill here; prefix fetches that miss the
pool can restore chains from this tier into freshly allocated blocks.
"""

from __future__ import annotations

import json
import logging
import os
import queue
import re
import threading
import time
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class HostKVTier:
    """LRU of spilled blocks keyed by content hash; optional disk layer."""

    def __init__(
        self,
        max_bytes: int = 2 * 1024**3,
        disk_dir: Optional[str] = None,
        disk_max_bytes: int = 32 * 1024**3,
        namespace: Optional[str] = None,
    ) -> None:
        """``namespace`` identifies the model (id + KV block shape/dtype);
        the disk layer is stored under ``disk_dir/<namespace>/`` so two
        models sharing a cache dir can never restore each other's KV
        (reference ssd_cache.py namespaces per model the same way). Each
        disk entry additionally records its shape+dtype, validated on
        load, rejecting mismatches even within a namespace.
        """
        self.max_bytes = max_bytes
        if disk_dir and namespace:
            safe = re.sub(r"[^A-Za-z0-9._-]+", "_", namespace)
            disk_dir = os.path.join(disk_dir, safe)
        self.disk_dir = disk_dir
        self.disk_max_bytes = disk_max_bytes
        self._entries: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._bytes = 0
        self.stats = {
            "stored": 0,
            "restored_blocks": 0,
            "evicted_to_disk": 0,
            "disk_hits": 0,
            "dropped": 0,
        }
        self._disk_index: Dict[str, str] = {}
        self._expected_shape: Optional[Tuple[int, ...]] = None
        self._expected_dtype: Optional[str] = None
        # the async spill writer stores from its own thread while the
        # engine thread fetches — all public entry points lock
        self._lock = threading.RLock()
        if disk_dir:
            os.makedirs(disk_dir, exist_ok=True)
            self._load_disk_index()

    # ----------------------------------------------------------------- memory
    @property
    def num_entries(self) -> int:
        return len(self._entries)

    @property
    def bytes_used(self) -> int:
        return self._bytes

    def store(self, block_hash: str, kv: np.ndarray) -> None:
        """Spill one block's KV (host numpy, already fetched off device)."""
        with self._lock:
            self._store_locked(block_hash, kv)

    def _store_locked(self, block_hash: str, kv: np.ndarray) -> None:
        if self._expected_shape is None:
            self._expected_shape = kv.shape
            self._expected_dtype = str(kv.dtype)
        if block_hash in self._entries:
            self._entries.move_to_end(block_hash)
            return
        size = kv.nbytes
        while self._bytes + size > self.max_bytes and self._entries:
            h, old = self._entries.popitem(last=False)
            self._bytes -= old.nbytes
            self._spill_to_disk(h, old)
        if self._bytes + size > self.max_bytes:
            self.stats["dropped"] += 1
            return
        self._entries[block_hash] = kv
        self._bytes += size
        self.stats["stored"] += 1

    def lookup_chain(self, hashes: Sequence[str]) -> List[np.ndarray]:
        """Longest available prefix of the hash chain (memory, then disk)."""
        with self._lock:
            out: List[np.ndarray] = []
            for h in hashes:
                kv = self._entries.get(h)
                if kv is not None:
                    self._entries.move_to_end(h)
                else:
                    kv = self._load_from_disk(h)
                if kv is None:
                    break
                out.append(kv)
            self.stats["restored_blocks"] += len(out)
            return out

    def contains(self, block_hash: str) -> bool:
        with self._lock:
            return (
                block_hash in self._entries
                or block_hash in self._disk_index
            )

    def flush_to_disk(self) -> int:
        """Persist every in-memory entry to the disk layer (shutdown
        save, reference memory_cache.py:1207-1415 save-on-shutdown).
        Entries stay resident; returns the number written."""
        if not self.disk_dir:
            return 0
        with self._lock:
            n = 0
            for h, kv in self._entries.items():
                if h not in self._disk_index:
                    self._spill_to_disk(h, kv)
                    n += 1
            return n

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()
            self._bytes = 0

    # ------------------------------------------------------------------- disk
    def _index_path(self) -> str:
        return os.path.join(self.disk_dir, "index.json")

    def _load_disk_index(self) -> None:
        try:
            with open(self._index_path()) as f:
                self._disk_index = json.load(f)
        except (OSError, json.JSONDecodeError):
            self._disk_index = {}
        # reconcile: drop index entries whose payloads vanished
        # (reference ssd_cache.py:1169 startup reconcile)
        stale = [
            h
            for h, fn in self._disk_index.items()
            if not os.path.exists(os.path.join(self.disk_dir, fn))
        ]
        for h in stale:
            del self._disk_index[h]
        if stale:
            self._save_disk_index()

    def _save_disk_index(self) -> None:
        try:
            with open(self._index_path(), "w") as f:
                json.dump(self._disk_index, f)
        except OSError as e:  # pragma: no cover
            logger.warning("could not persist disk index: %s", e)

    def _disk_bytes(self) -> int:
        total = 0
        for fn in self._disk_index.values():
            try:
                total += os.path.getsize(os.path.join(self.disk_dir, fn))
            except OSError:
                pass
        return total

    def _spill_to_disk(self, block_hash: str, kv: np.ndarray) -> None:
        if not self.disk_dir or block_hash in self._disk_index:
            return
        if self._disk_bytes() + kv.nbytes > self.disk_max_bytes:
            self.stats["dropped"] += 1
            return
        fn = f"{block_hash[:32]}.npz"
        path = os.path.join(self.disk_dir, fn)
        try:
            # bf16 isn't a numpy dtype on disk: store raw bits + dtype tag
            if kv.dtype == np.dtype("V2") or str(kv.dtype) == "bfloat16":
                np.savez(
                    path, kv=kv.view(np.uint16), dtype="bfloat16",
                    shape=np.asarray(kv.shape),
                )
            else:
                np.savez(
                    path, kv=kv, dtype=str(kv.dtype),
                    shape=np.asarray(kv.shape),
                )
            self._disk_index[block_hash] = fn
            self._save_disk_index()
            self.stats["evicted_to_disk"] += 1
        except OSError as e:
            logger.warning("disk spill failed: %s", e)

    def _load_from_disk(self, block_hash: str) -> Optional[np.ndarray]:
        fn = self._disk_index.get(block_hash)
        if not fn or not self.disk_dir:
            return None
        path = os.path.join(self.disk_dir, fn)
        try:
            with np.load(path) as z:
                kv = z["kv"]
                dtype = str(z["dtype"])
                if dtype == "bfloat16":
                    import ml_dtypes

                    kv = kv.view(ml_dtypes.bfloat16)
                if "shape" in z and tuple(z["shape"]) != kv.shape:
                    raise ValueError(
                        f"shape mismatch: {tuple(z['shape'])} vs {kv.shape}"
                    )
                if self._expected_shape is not None and (
                    kv.shape != self._expected_shape
                    or str(kv.dtype) != self._expected_dtype
                ):
                    raise ValueError(
                        "entry does not match this model's KV geometry: "
                        f"{kv.shape}/{kv.dtype} vs "
                        f"{self._expected_shape}/{self._expected_dtype}"
                    )
                self.stats["disk_hits"] += 1
                return kv
        except (OSError, KeyError, ValueError) as e:
            # corrupt entry: quarantine (reference ssd_cache.py:1109)
            logger.warning("corrupt spill entry %s: %s", fn, e)
            self._disk_index.pop(block_hash, None)
            self._save_disk_index()
            try:
                os.rename(path, path + ".corrupt")
            except OSError:
                pass
            return None

    def get_stats(self) -> Dict:
        with self._lock:
            return {
                **self.stats,
                "entries": self.num_entries,
                "bytes": self._bytes,
                "disk_entries": len(self._disk_index),
            }


class AsyncSpillWriter:
    """Background writer draining device->host KV spills off the
    scheduler hot path.

    The reference ran SSD spills on a writer thread behind a queue
    (reference ssd_cache.py:702-854); the blocking analogue here was
    worse: a synchronous per-block ``read_block`` costs ~30 ms on this
    platform (dispatch + blocking fetch, NOTES_TPU_ENV.md), so an
    admission evicting a 32-block chain stalled the engine ~1 s.

    Now an eviction wave costs the engine thread ONE batched gather
    dispatch (~micro­seconds) + ``copy_to_host_async``; the device
    array is handed to this writer, which blocks on the host copy and
    stores each block into the tier from its own thread. The gather is
    dispatched before the evicted blocks can be rewritten (allocation
    happens strictly before the step that overwrites them is
    dispatched), so the snapshot is consistent regardless of when the
    copy completes.

    Pending entries are visible synchronously: ``flush_hashes`` (used
    by the prefix-cache fetch path) and ``flush`` (shutdown save)
    materialize in-flight spills before lookups that need them."""

    def __init__(self, tier: HostKVTier) -> None:
        self.tier = tier
        self._pending: Dict[str, Tuple] = {}  # hash -> (devarray, row)
        self._lock = threading.Lock()
        self._queue: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(
            target=self._run, name="kv-spill-writer", daemon=True
        )
        self._thread.start()

    def submit(self, dev_array, hashes: Sequence[str]) -> None:
        """Queue a batched gather ([N, ...] device array, one row per
        hash) for background store. Returns immediately."""
        with self._lock:
            for i, h in enumerate(hashes):
                self._pending[h] = (dev_array, i)
        self._queue.put((dev_array, list(hashes)))

    def pending(self, block_hash: str) -> bool:
        with self._lock:
            return block_hash in self._pending

    def _materialize(self, dev_array, hashes: Sequence[str]) -> None:
        host = np.asarray(dev_array)  # blocks THIS thread only
        with self._lock:
            for i, h in enumerate(hashes):
                if self._pending.get(h, (None, None))[0] is dev_array:
                    del self._pending[h]
                    self.tier.store(h, host[i])

    def _run(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                self._queue.task_done()
                return
            try:
                self._materialize(*item)
            except Exception:  # pragma: no cover - spill best-effort
                logger.exception("async KV spill failed")
            finally:
                self._queue.task_done()

    def flush_hashes(self, hashes: Sequence[str]) -> None:
        """Synchronously land any pending spills among ``hashes`` in the
        tier (fetch path: a chain about to be restored must see blocks
        still in flight)."""
        with self._lock:
            todo = {
                id(self._pending[h][0]): self._pending[h][0]
                for h in hashes
                if h in self._pending
            }
        for arr in todo.values():
            with self._lock:
                hs = [
                    h for h, (a, _) in self._pending.items() if a is arr
                ]
            self._materialize(arr, hs)

    def flush(self) -> None:
        """Drain the whole queue (shutdown save)."""
        self._queue.join()

    def close(self) -> None:
        self._queue.put(None)
        self._thread.join(timeout=5)

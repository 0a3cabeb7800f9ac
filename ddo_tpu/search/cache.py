"""Barrier cache: per-(state, depth) pruning thresholds.

Host-side counterpart of the reference cache:
  * trait `Cache` (abstraction/cache.rs:27-55) incl. the default
    `must_explore` rule (cache.rs:32-39);
  * `SimpleCache` (implementation/cache/simple.rs:36-74): one map per
    layer, monotone `update_threshold`;
  * `EmptyCache` (implementation/cache/empty.rs:33).

Keys are the canonical packed-state key columns produced by the engine, so
lookups are exact-state equality like the reference's `DashMap<Arc<T>, ..>`.

Two surfaces:
  * exact dict lookups (`must_explore`) used when popping subproblems
    (sequential.rs:341-343);
  * bounded per-depth ARRAY tables (`snapshot`) shipped to the device so
    the engine can prune at-or-below-threshold nodes INSIDE a compilation
    (_filter_with_cache, clean.rs:710-726).  The arrays are append-only
    with keep-top-by-threshold compaction: dropping entries only weakens
    pruning (sound), and duplicate rows are resolved by max-threshold at
    lookup.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ddo_tpu.core.types import SubProblem, Threshold


#: snapshot tables always have exactly this many rows: every distinct
#: table size is a fresh XLA trace (and live executable) of the whole
#: compile kernel, so one fixed size bounds both at the cost of padded
#: compares on small stores
TABLE_ROWS = 256


def _bucket(n: int, lo: int = 64) -> int:
    return TABLE_ROWS


class Cache:
    def initialize(self, problem):
        pass

    def get_threshold(self, key: bytes, depth: int) -> Optional[Threshold]:
        return None

    def update_threshold(self, key: bytes, depth: int, value: int, explored: bool):
        pass

    def update_batch(self, depths, keys_cols, thetas, explored):
        pass

    def snapshot(self, cap: int = TABLE_ROWS):
        """Device filter tables or None (no filtering)."""
        return None

    def clear_layer(self, depth: int):
        pass

    def clear(self):
        pass

    def must_explore(self, sub: SubProblem) -> bool:
        """Default rule from abstraction/cache.rs:32-39."""
        th = self.get_threshold(sub.key, sub.depth)
        if th is None:
            return True
        return sub.value > th.value or (sub.value == th.value and not th.explored)


class EmptyCache(Cache):
    """No-op cache (cache/empty.rs)."""


class SimpleCache(Cache):
    """Per-depth threshold store (cache/simple.rs:36-74)."""

    #: per-depth array capacity for the device snapshot tables
    TABLE_CAP = 2048

    def __init__(self):
        self._by_depth = []
        self._keys = []  # per depth: np.int32 [cap, K] (lazy)
        self._vals = []  # per depth: np.int32 [cap]
        self._count = []
        self._snapshot = None  # cached built tables (invalidated on write)

    def initialize(self, problem):
        n = problem.nb_variables
        self._by_depth = [dict() for _ in range(n + 1)]
        self._keys = [None] * (n + 1)
        self._vals = [None] * (n + 1)
        self._count = [0] * (n + 1)
        self._snapshot = None

    def get_threshold(self, key, depth):
        if depth >= len(self._by_depth):
            return None
        return self._by_depth[depth].get(key)

    def update_threshold(self, key, depth, value, explored):
        # monotone max update (cache/simple.rs:62-66)
        new = Threshold(value, explored)
        layer = self._by_depth[depth]
        cur = layer.get(key)
        layer[key] = new if cur is None else cur.better_of(new)

    # ------------------------------------------------- batched/array surface
    def update_batch(self, depths, keys_cols, thetas, explored):
        """Vectorized absorption of one compiled DD's threshold records
        ((depth, key_cols, theta, explored) row batches from
        CompiledDD.cache_batch)."""
        if len(depths) == 0:
            return
        self._snapshot = None
        keys_cols = np.ascontiguousarray(keys_cols, np.int32)
        for i in range(len(depths)):
            d = int(depths[i])
            self.update_threshold(
                keys_cols[i].tobytes(), d, int(thetas[i]), bool(explored[i])
            )
        # array tables: bulk append per depth, compact on overflow
        order = np.argsort(depths, kind="stable")
        ds = np.asarray(depths)[order]
        ks = keys_cols[order]
        ts = np.asarray(thetas, np.int32)[order]
        starts = np.flatnonzero(np.diff(ds, prepend=-1))
        for s, e in zip(starts, list(starts[1:]) + [len(ds)]):
            self._append_rows(int(ds[s]), ks[s:e], ts[s:e])

    def _append_rows(self, d, rows, vals):
        K = rows.shape[1]
        cap = self.TABLE_CAP
        if self._keys[d] is None:
            self._keys[d] = np.zeros((cap, K), np.int32)
            self._vals[d] = np.zeros(cap, np.int32)
        cnt = self._count[d]
        m = len(rows)
        if cnt + m > cap:
            # keep the strongest thresholds (drop = weaker pruning, sound)
            allk = np.concatenate([self._keys[d][:cnt], rows])
            allv = np.concatenate([self._vals[d][:cnt], vals])
            keep = np.argpartition(-allv, cap // 2)[: cap // 2]
            self._keys[d][: len(keep)] = allk[keep]
            self._vals[d][: len(keep)] = allv[keep]
            cnt = len(keep)
            m = 0
        else:
            self._keys[d][cnt : cnt + m] = rows
            self._vals[d][cnt : cnt + m] = vals
        self._count[d] = cnt + m

    def snapshot(self, cap: int = TABLE_ROWS):
        """Build [n+1, T, K] device filter tables (strongest `cap`
        thresholds per depth); None while the cache is empty."""
        if self._snapshot is not None:
            return self._snapshot
        counts = [min(c, cap) for c in self._count]
        T = max(counts, default=0)
        if T == 0:
            return None
        T = _bucket(T)
        n1 = len(self._count)
        K = next(k.shape[1] for k in self._keys if k is not None)
        keys = np.zeros((n1, T, K), np.int32)
        vals = np.zeros((n1, T), np.int32)
        valid = np.zeros((n1, T), bool)
        for d in range(n1):
            c = self._count[d]
            if c == 0:
                continue
            if c > cap:
                sel = np.argpartition(-self._vals[d][:c], cap - 1)[:cap]
            else:
                sel = np.arange(c)
            m = len(sel)
            keys[d, :m] = self._keys[d][sel]
            vals[d, :m] = self._vals[d][sel]
            valid[d, :m] = True
        self._snapshot = dict(keys=keys, vals=vals, valid=valid)
        return self._snapshot

    def clear_layer(self, depth):
        if depth < len(self._by_depth):
            self._by_depth[depth].clear()
            self._count[depth] = 0
            self._snapshot = None

    def clear(self):
        for layer in self._by_depth:
            layer.clear()
        self._count = [0] * len(self._count)
        self._snapshot = None

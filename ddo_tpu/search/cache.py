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


import os as _os

#: snapshot tables always have exactly this many rows: every distinct
#: table size is a fresh XLA trace (and live executable) of the whole
#: compile kernel, so one fixed size bounds both at the cost of padded
#: compares on small stores.  Env-tunable (DDO_TABLE_ROWS) — the [C, T, K]
#: in-compilation filter compare scales linearly with it, and on CPU hosts
#: it can dominate whole solves (ALP: 2x end-to-end at T=256).
TABLE_ROWS = int(_os.environ.get("DDO_TABLE_ROWS", 256))


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
    """Per-depth threshold store (cache/simple.rs:36-74).

    Dict-free by design: records live ONLY in bounded per-depth numpy
    arrays (duplicate rows allowed — lookups take the lexicographic max
    of (value, explored), which IS the reference's monotone `better_of`
    rule).  `update_batch` is therefore pure vectorized appends (the
    per-row Python dict insertion was the measured host bottleneck of
    TSPTW supersteps), and `must_explore` probes are one [cnt, K] row
    compare — pops are few per superstep.  Capacity eviction drops the
    weakest thresholds: weaker pruning, never wrong."""

    #: per-depth array capacity (snapshot tables select the top TABLE_ROWS)
    TABLE_CAP = 2048

    def __init__(self):
        self._keys = []  # per depth: np.int32 [cap, K] (lazy)
        self._vals = []  # per depth: np.int32 [cap]
        self._expl = []  # per depth: np.uint8 [cap]
        self._count = []
        self._snapshot = None  # cached built tables (invalidated on write)

    def initialize(self, problem):
        n = problem.nb_variables
        self._keys = [None] * (n + 1)
        self._vals = [None] * (n + 1)
        self._expl = [None] * (n + 1)
        self._count = [0] * (n + 1)
        self._snapshot = None
        # key width, so snapshot() can serve all-invalid tables BEFORE the
        # first insertion: a None-table compile variant would otherwise
        # double the engine trace count (compile time matters more than
        # the padded compare on an empty store)
        try:
            import jax
            import jax.numpy as jnp
            st = jax.tree_util.tree_map(
                jnp.asarray, problem.initial_state(problem.data)
            )
            self._key_width = int(problem.pack(st).shape[0])
        except Exception:
            self._key_width = None

    @staticmethod
    def _key_row(key: bytes):
        """bytes -> int32 row (zero-padded to alignment; keys are fixed
        width within one problem so padding stays injective)."""
        if len(key) % 4:
            key = key + b"\0" * (4 - len(key) % 4)
        return np.frombuffer(key, np.int32)

    def get_threshold(self, key, depth):
        if depth >= len(self._count) or self._count[depth] == 0:
            return None
        cnt = self._count[depth]
        row = self._key_row(key)
        if self._keys[depth].shape[1] != row.shape[0]:
            return None
        hit = np.all(self._keys[depth][:cnt] == row[None, :], axis=1)
        if not hit.any():
            return None
        vals = self._vals[depth][:cnt][hit]
        expl = self._expl[depth][:cnt][hit]
        best = np.lexsort((expl, vals))[-1]  # max (value, explored)
        return Threshold(int(vals[best]), bool(expl[best]))

    def update_threshold(self, key, depth, value, explored):
        # monotone max update (cache/simple.rs:62-66): appending a row and
        # taking the per-key max at lookup is equivalent
        row = self._key_row(key).reshape(1, -1)
        self._snapshot = None
        self._append_rows(depth, row, np.asarray([value], np.int32),
                          np.asarray([explored], np.uint8))

    # ------------------------------------------------- batched/array surface
    def update_batch(self, depths, keys_cols, thetas, explored):
        """Vectorized absorption of one compiled DD's threshold records
        ((depth, key_cols, theta, explored) row batches from
        CompiledDD.cache_batch)."""
        if len(depths) == 0:
            return
        self._snapshot = None
        keys_cols = np.ascontiguousarray(keys_cols, np.int32)
        order = np.argsort(depths, kind="stable")
        ds = np.asarray(depths)[order]
        ks = keys_cols[order]
        ts = np.asarray(thetas, np.int32)[order]
        ex = np.asarray(explored, np.uint8)[order]
        starts = np.flatnonzero(np.diff(ds, prepend=-1))
        for s, e in zip(starts, list(starts[1:]) + [len(ds)]):
            self._append_rows(int(ds[s]), ks[s:e], ts[s:e], ex[s:e])

    def _append_rows(self, d, rows, vals, expl):
        K = rows.shape[1]
        cap = self.TABLE_CAP
        if self._keys[d] is None:
            self._keys[d] = np.zeros((cap, K), np.int32)
            self._vals[d] = np.zeros(cap, np.int32)
            self._expl[d] = np.zeros(cap, np.uint8)
        cnt = self._count[d]
        m = len(rows)
        if m > cap // 2:  # one giant batch: keep its strongest rows
            sel = np.argpartition(-vals, cap // 2 - 1)[: cap // 2]
            rows, vals, expl = rows[sel], vals[sel], expl[sel]
            m = len(rows)
        if cnt + m > cap:
            # keep the strongest thresholds (drop = weaker pruning, sound)
            allk = np.concatenate([self._keys[d][:cnt], rows])
            allv = np.concatenate([self._vals[d][:cnt], vals])
            alle = np.concatenate([self._expl[d][:cnt], expl])
            keep = np.argpartition(-allv, cap // 2)[: cap // 2]
            self._keys[d][: len(keep)] = allk[keep]
            self._vals[d][: len(keep)] = allv[keep]
            self._expl[d][: len(keep)] = alle[keep]
            self._count[d] = len(keep)
            return
        self._keys[d][cnt : cnt + m] = rows
        self._vals[d][cnt : cnt + m] = vals
        self._expl[d][cnt : cnt + m] = expl
        self._count[d] = cnt + m

    def snapshot(self, cap: int = TABLE_ROWS):
        """Build [n+1, T, K] device filter tables (strongest `cap`
        thresholds per depth); None while the cache is empty."""
        if self._snapshot is not None:
            return self._snapshot
        counts = [min(c, cap) for c in self._count]
        T = max(counts, default=0)
        if T == 0 and getattr(self, "_key_width", None) is None:
            return None
        T = TABLE_ROWS
        n1 = len(self._count)
        K = next(
            (k.shape[1] for k in self._keys if k is not None),
            getattr(self, "_key_width", None),
        )
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
        if depth < len(self._count):
            self._count[depth] = 0
            self._snapshot = None

    def clear(self):
        self._count = [0] * len(self._count)
        self._snapshot = None

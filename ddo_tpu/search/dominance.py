"""Pairwise state-dominance pruning across the whole search.

Host-side counterpart of:
  * trait `Dominance` incl. `partial_cmp` (abstraction/dominance.rs:37-99);
  * `SimpleDominanceChecker` (implementation/dominance/simple.rs:37-116);
  * `EmptyDominanceChecker` (implementation/dominance/empty.rs:25-48).

Store design (re-designed for batch absorption, not a port): per depth, an
APPEND-ONLY array of (key_cols, coord_cols, value) rows with capacity-
bounded keep-top-by-value compaction.  The reference's front EVICTS
entries dominated by newer ones (simple.rs:95-97); keeping stale entries
is sound by transitivity — an evicted entry was dominated-or-equalled by
a stored one, so anything it strictly dominates is also strictly
dominated by its evictor (and the evictor's value is >= under use_value,
so thresholds derived from stale entries are conservative).  Dropping
rows at compaction only weakens pruning.

The same arrays feed the per-depth `snapshot()` tables the engine uses
for IN-COMPILATION dominance filtering (clean.rs:689-708).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ddo_tpu.core.problem import Dominance
from ddo_tpu.utils.num import INF


@dataclasses.dataclass
class DominanceCheckResult:
    dominated: bool
    threshold: Optional[int]


from ddo_tpu.search.cache import TABLE_ROWS


class DominanceChecker:
    dom: Optional[Dominance] = None

    def prime(self, problem):
        """Learn the key/coord widths from the root state so `snapshot()`
        can serve all-invalid tables before the first insertion (avoids a
        second None-table compile variant of the engine)."""

    def clear_layer(self, depth: int):
        pass

    def is_dominated_or_insert(self, state, key_bytes, depth, value) -> DominanceCheckResult:
        return DominanceCheckResult(False, None)

    def is_dominated(self, state, depth, value) -> bool:
        """Check-only probe (no insertion)."""
        return False

    def insert_batch(self, depths, keys, coords, values):
        pass

    def snapshot(self, cap: int = TABLE_ROWS):
        return None


class EmptyDominanceChecker(DominanceChecker):
    pass


class SimpleDominanceChecker(DominanceChecker):
    """Keyed per-depth dominance store (simple.rs:37-116) over dense
    (key_cols, coord_cols, value) rows."""

    #: per-depth row capacity (compaction keeps the top half by value)
    STORE_CAP = 4096

    def __init__(self, dominance: Dominance, nb_variables: int):
        self.dom = dominance
        n1 = nb_variables + 1
        self._keys = [None] * n1   # np.int32 [cap, KK]
        self._coords = [None] * n1  # np.int32 [cap, CC]
        self._vals = [None] * n1    # np.int64 [cap]
        self._hash = [None] * n1    # np.int64 [cap] — key-row prefilter
        self._count = [0] * n1
        self._snapshot = None
        self._dims = None  # (KK, CC) once known/primed

    def prime(self, problem):
        try:
            import jax
            import jax.numpy as jnp
            st = jax.tree_util.tree_map(
                jnp.asarray, problem.initial_state(problem.data)
            )
            kc = self.dom.key_cols(st)
            if kc is None:
                return
            import numpy as _np
            self._dims = (
                int(_np.atleast_1d(_np.asarray(kc)).shape[0]),
                int(_np.atleast_1d(_np.asarray(self.dom.coord_cols(st))).shape[0]),
            )
        except Exception:
            pass

    @staticmethod
    def _hash_rows(keys):
        """Deterministic int64 row hash of key columns: probes compare ONE
        i64 per stored row before touching the KK-wide compares (a cutset
        probe against 4096-row fronts spent ~50s/solve in np.all reduces
        on an ALP profile; key matches are rare, so the prefilter removes
        almost all of that)."""
        k = keys.astype(np.int64).view(np.uint64) if keys.dtype == np.int64 \
            else keys.astype(np.int64).astype(np.uint64)
        mult = (np.arange(k.shape[1], dtype=np.uint64) * np.uint64(2)
                + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15)
        with np.errstate(over="ignore"):
            return (k * mult[None, :]).sum(axis=1).view(np.int64)

    # ------------------------------------------------------------- plumbing
    def _cols(self, state):
        """Host evaluation of the device hooks for a single state."""
        kc = self.dom.key_cols(state)
        if kc is None:
            return None, None
        return (
            np.atleast_1d(np.asarray(kc, np.int32)),
            np.atleast_1d(np.asarray(self.dom.coord_cols(state), np.int32)),
        )

    def clear_layer(self, depth):
        self._count[depth] = 0
        self._snapshot = None

    def _ensure(self, d, KK, CC):
        if self._keys[d] is None:
            cap = self.STORE_CAP
            self._keys[d] = np.zeros((cap, KK), np.int32)
            self._coords[d] = np.zeros((cap, CC), np.int32)
            self._vals[d] = np.zeros(cap, np.int64)
            self._hash[d] = np.zeros(cap, np.int64)

    def insert_batch(self, depths, keys, coords, values):
        """Bulk insertion (CompiledDD.exact_nodes_batch): mirrors the
        per-layer insertions of _filter_with_dominance (clean.rs:697)."""
        if len(depths) == 0:
            return
        self._snapshot = None
        keys = np.atleast_2d(np.asarray(keys, np.int32))
        coords = np.atleast_2d(np.asarray(coords, np.int32))
        values = np.asarray(values, np.int64)
        order = np.argsort(depths, kind="stable")
        ds = np.asarray(depths)[order]
        starts = np.flatnonzero(np.diff(ds, prepend=-1))
        for s, e in zip(starts, list(starts[1:]) + [len(ds)]):
            d = int(ds[s])
            sel = order[s:e]
            self._ensure(d, keys.shape[1], coords.shape[1])
            self._append(d, keys[sel], coords[sel], values[sel])

    def _append(self, d, k, c, v):
        cap = self.STORE_CAP
        cnt = self._count[d]
        m = len(k)
        if m > cap // 2:  # one giant batch: keep its strongest rows
            sel = np.argpartition(-v, cap // 2 - 1)[: cap // 2]
            k, c, v = k[sel], c[sel], v[sel]
            m = len(k)
        if cnt + m > cap:
            keep = np.argpartition(-self._vals[d][:cnt], cap // 2 - 1)[: cap // 2]
            self._keys[d][: len(keep)] = self._keys[d][keep]
            self._coords[d][: len(keep)] = self._coords[d][keep]
            self._vals[d][: len(keep)] = self._vals[d][keep]
            self._hash[d][: len(keep)] = self._hash[d][keep]
            cnt = len(keep)
        self._keys[d][cnt : cnt + m] = k
        self._coords[d][cnt : cnt + m] = c
        self._vals[d][cnt : cnt + m] = v
        self._hash[d][cnt : cnt + m] = self._hash_rows(k)
        self._count[d] = cnt + m

    # ------------------------------------------------------------- checking
    def _dominators(self, d, kcols, ccols, value):
        """Bool mask over stored rows strictly dominating (k, c, value)
        per partial_cmp (dominance.rs:57-79).

        Returns (dominators, vals, eqc).  NARROWED CONTRACT on `eqc`
        (ADVICE r3): coordinate-equality is only computed for rows passing
        the key-hash prefilter; rows outside the candidate set are always
        False even if their coordinates coincide.  Callers may only read
        `eqc` where `dominators` is True (a subset of the candidates)."""
        cnt = self._count[d]
        if cnt == 0:
            return None
        # hash prefilter: only rows whose key hash matches are compared
        cand = np.flatnonzero(
            self._hash[d][:cnt] == self._hash_rows(kcols[None, :])[0]
        )
        km_out = np.zeros(cnt, bool)
        sv = self._vals[d][:cnt]
        eqc_out = np.zeros(cnt, bool)
        if len(cand) == 0:
            return km_out, sv, eqc_out
        sk = self._keys[d][cand]
        sc = self._coords[d][cand]
        svc = sv[cand]
        km = np.all(sk == kcols[None, :], axis=1)
        ge = np.all(sc >= ccols[None, :], axis=1)
        eqc = np.all(sc == ccols[None, :], axis=1)
        if self.dom.use_value:
            dom_c = km & ge & (svc >= value) & ~(eqc & (svc == value))
        else:
            dom_c = km & ge & ~eqc
        km_out[cand] = dom_c
        eqc_out[cand] = eqc
        return km_out, sv, eqc_out

    def is_dominated(self, state, depth, value) -> bool:
        kcols, ccols = self._cols(state)
        if kcols is None:
            return False
        res = self._dominators(depth, kcols, ccols, int(value))
        return res is not None and bool(res[0].any())

    def is_dominated_cols(self, kcols, ccols, depth, value) -> bool:
        """Check-only probe from pre-computed columns (no hook calls)."""
        res = self._dominators(
            int(depth), np.asarray(kcols, np.int32),
            np.asarray(ccols, np.int32), int(value),
        )
        return res is not None and bool(res[0].any())

    def is_dominated_batch(self, depths, keys, coords, values):
        """Vectorized check-only probe over row batches: bool[M] mask of
        strictly-dominated rows (no insertion)."""
        M = len(depths)
        out = np.zeros(M, bool)
        keys = np.atleast_2d(np.asarray(keys, np.int32))
        coords = np.atleast_2d(np.asarray(coords, np.int32))
        for d in np.unique(np.asarray(depths)):
            cnt = self._count[int(d)]
            if cnt == 0:
                continue
            rows = np.flatnonzero(np.asarray(depths) == d)
            sh = self._hash[int(d)][:cnt]
            qh = self._hash_rows(keys[rows])
            # hash prefilter: (probe, stored) pairs with matching key hash
            pi, si = np.nonzero(qh[:, None] == sh[None, :])
            if len(pi) == 0:
                continue
            sk = self._keys[int(d)]
            sc = self._coords[int(d)]
            sv = self._vals[int(d)]
            qrows = rows[pi]
            km = np.all(keys[qrows] == sk[si], axis=1)
            ge = np.all(sc[si] >= coords[qrows], axis=1)
            eqc = np.all(sc[si] == coords[qrows], axis=1)
            v = np.asarray(values)[qrows]
            if self.dom.use_value:
                dominates = km & ge & (sv[si] >= v) & ~(eqc & (sv[si] == v))
            else:
                dominates = km & ge & ~eqc
            np.logical_or.at(out, qrows, dominates)
        return out

    def is_dominated_or_insert(self, state, key_bytes, depth, value):
        """simple.rs:71-111 (minus eviction — see module docstring)."""
        kcols, ccols = self._cols(state)
        if kcols is None:
            return DominanceCheckResult(False, None)
        res = self._dominators(depth, kcols, ccols, int(value))
        if res is not None:
            mask, sv, eqc = res
            if mask.any():
                if self.dom.use_value:
                    thr = int(np.min(np.where(eqc[mask], sv[mask] - 1, sv[mask])))
                    return DominanceCheckResult(True, thr)
                return DominanceCheckResult(True, None)
        self._snapshot = None
        self._ensure(depth, len(kcols), len(ccols))
        self._append(
            depth, kcols[None, :], ccols[None, :], np.asarray([value], np.int64)
        )
        return DominanceCheckResult(False, None)

    # ------------------------------------------------------------- snapshot
    def snapshot(self, cap: int = TABLE_ROWS):
        """[n+1, T, ...] device tables for in-compilation filtering."""
        if self._snapshot is not None:
            return self._snapshot
        counts = [min(c, cap) for c in self._count]
        T = max(counts, default=0)
        if T == 0 and self._dims is None:
            return None
        T = TABLE_ROWS
        n1 = len(self._count)
        KK = next(
            (k.shape[1] for k in self._keys if k is not None),
            self._dims[0] if self._dims else None,
        )
        CC = next(
            (c.shape[1] for c in self._coords if c is not None),
            self._dims[1] if self._dims else None,
        )
        keys = np.zeros((n1, T, KK), np.int32)
        coords = np.zeros((n1, T, CC), np.int32)
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
            coords[d, :m] = self._coords[d][sel]
            vals[d, :m] = self._vals[d][sel].astype(np.int32)
            valid[d, :m] = True
        self._snapshot = dict(keys=keys, coords=coords, vals=vals, valid=valid)
        return self._snapshot

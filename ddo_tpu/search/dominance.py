"""Pairwise state-dominance pruning across the whole search.

Host-side counterpart of:
  * trait `Dominance` incl. `partial_cmp` (abstraction/dominance.rs:37-99);
  * `SimpleDominanceChecker` (implementation/dominance/simple.rs:37-116):
    per-depth keyed fronts of mutually non-dominated (state, value) entries;
  * `EmptyDominanceChecker` (implementation/dominance/empty.rs:25-48).

`is_dominated_or_insert` reproduces simple.rs:71-111: a newly seen state is
checked against the front for its key; entries it dominates (strictly, or
equal) are evicted; if it is dominated the pruning threshold is the minimum
dominating value (minus one when only the value differs).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ddo_tpu.core.problem import Dominance
from ddo_tpu.core.types import SubProblem
from ddo_tpu.utils.num import INF


@dataclasses.dataclass
class DominanceCheckResult:
    dominated: bool
    threshold: Optional[int]


class DominanceChecker:
    def clear_layer(self, depth: int):
        pass

    def is_dominated_or_insert(self, state, key_bytes, depth, value) -> DominanceCheckResult:
        return DominanceCheckResult(False, None)


class EmptyDominanceChecker(DominanceChecker):
    pass


class SimpleDominanceChecker(DominanceChecker):
    def __init__(self, dominance: Dominance, nb_variables: int):
        self.dom = dominance
        self._by_depth = [dict() for _ in range(nb_variables + 1)]

    def clear_layer(self, depth):
        self._by_depth[depth].clear()

    def _partial_cmp(self, ca, va, cb, vb):
        """Returns (ordering, only_val_diff) or None — dominance.rs:57-79."""
        ordering = 0
        for a, b in zip(ca, cb):
            if a > b:
                if ordering < 0:
                    return None
                ordering = 1
            elif a < b:
                if ordering > 0:
                    return None
                ordering = -1
        if self.dom.use_value:
            if va > vb:
                if ordering < 0:
                    return None
                return (1, True) if ordering == 0 else (1, False)
            if va < vb:
                if ordering > 0:
                    return None
                return (-1, True) if ordering == 0 else (-1, False)
        return (ordering, False)

    def is_dominated_or_insert(self, state, key_bytes, depth, value):
        key = self.dom.key(state)
        if key is None:
            return DominanceCheckResult(False, None)
        front = self._by_depth[depth].setdefault(key, [])
        coords = tuple(int(x) for x in np.asarray(self.dom.coords(state)).ravel())
        dominated = False
        threshold = INF
        kept = []
        for (oc, ov) in front:
            cmp = self._partial_cmp(coords, value, oc, ov)
            if cmp is None:
                kept.append((oc, ov))
                continue
            ordering, only_val_diff = cmp
            if ordering < 0:
                dominated = True
                if self.dom.use_value:
                    threshold = min(threshold, ov - 1 if only_val_diff else ov)
                kept.append((oc, ov))
            # ordering >= 0: the stored entry is dominated/equal -> evict
        if dominated:
            self._by_depth[depth][key] = kept
            return DominanceCheckResult(True, threshold if self.dom.use_value else None)
        kept.append((coords, value))
        self._by_depth[depth][key] = kept
        return DominanceCheckResult(False, None)

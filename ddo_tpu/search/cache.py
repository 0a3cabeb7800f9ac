"""Barrier cache: per-(state, depth) pruning thresholds.

Host-side counterpart of the reference cache:
  * trait `Cache` (abstraction/cache.rs:27-55) incl. the default
    `must_explore` rule (cache.rs:32-39);
  * `SimpleCache` (implementation/cache/simple.rs:36-74): one map per
    layer, monotone `update_threshold`;
  * `EmptyCache` (implementation/cache/empty.rs:33).

Keys are the canonical packed-state bytes produced by the engine, so the
lookup is exact-state equality like the reference's `DashMap<Arc<T>, ..>`.
"""

from __future__ import annotations

from typing import Optional

from ddo_tpu.core.types import SubProblem, Threshold


class Cache:
    def initialize(self, problem):
        pass

    def get_threshold(self, key: bytes, depth: int) -> Optional[Threshold]:
        return None

    def update_threshold(self, key: bytes, depth: int, value: int, explored: bool):
        pass

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

    def __init__(self):
        self._by_depth = []

    def initialize(self, problem):
        self._by_depth = [dict() for _ in range(problem.nb_variables + 1)]

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

    def clear_layer(self, depth):
        if depth < len(self._by_depth):
            self._by_depth[depth].clear()

    def clear(self):
        for layer in self._by_depth:
            layer.clear()

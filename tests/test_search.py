"""Search-structure parity tests, ported from the reference inline suites:

  * NoDupFringe: /root/reference/ddo/src/implementation/fringe/no_duplicate.rs:390-663
  * SimpleCache monotone thresholds: implementation/cache/simple.rs
  * SimpleDominanceChecker fronts: implementation/dominance/simple.rs:118-264
    + trait semantics abstraction/dominance.rs:128-233
  * width heuristics: implementation/heuristics/width.rs:884+
  * TimeBudget: implementation/heuristics/cutoff.rs:326-344

These are pure host structures — no jax involved.
"""

import time

import numpy as np
import pytest

from ddo_tpu.core.heuristics import (
    DivBy,
    FixedWidth,
    NbUnassignedWidth,
    NoCutoff,
    TimeBudget,
    Times,
)
from ddo_tpu.core.problem import Dominance
from ddo_tpu.core.types import SubProblem, Threshold
from ddo_tpu.search.cache import SimpleCache
from ddo_tpu.search.dominance import SimpleDominanceChecker
from ddo_tpu.search.fringe import NoDupFringe, SimpleFringe


def sub(state, value, ub, depth=0, path_len=0):
    n = 4
    pv = np.zeros(n, np.int32)
    ps = np.zeros(n, bool)
    ps[:path_len] = True
    return SubProblem(
        state=np.asarray(state, np.int32), value=value, path_vals=pv,
        path_set=ps, ub=ub, depth=depth, key=np.int64(state).tobytes(),
    )


# ------------------------------------------------------------------ fringe
@pytest.mark.parametrize("fringe_cls", [SimpleFringe, NoDupFringe])
def test_fringe_len_and_clear(fringe_cls):
    """no_duplicate.rs:370-405,508-530."""
    f = fringe_cls()
    assert f.is_empty() and len(f) == 0
    assert f.pop() is None
    f.push(sub(42, 2, 5))
    assert len(f) == 1 and not f.is_empty()
    assert f.pop() is not None
    assert f.is_empty()
    f.push(sub(42, 2, 5))
    f.clear()
    assert f.is_empty()


def test_nodup_pop_order_is_max_ub_then_value_with_dedup():
    """no_duplicate.rs:413-472: pops in descending (ub, value); the two
    pushes with state 5 merge into one entry keeping the best value."""
    f = NoDupFringe()
    f.push(sub(1, 1, 1))
    f.push(sub(5, 5, 5))  # 'f' in the reference test
    f.push(sub(2, 2, 2))
    f.push(sub(4, 4, 4))
    f.push(sub(3, 3, 3))
    f.push(sub(5, 4, 5))  # 'e': same state as 'f' -> merged, never pops

    values = [f.pop().value for _ in range(5)]
    assert values == [5, 4, 3, 2, 1]
    assert f.pop() is None


def test_nodup_duplicate_push_keeps_longest_path_payload():
    """no_duplicate.rs:476-506: on duplicate push, the payload of the
    higher-value (longer-path) node wins."""
    f = NoDupFringe()
    f.push(sub(5, 4, 5, depth=1, path_len=1))
    best = sub(5, 5, 5, depth=1, path_len=2)
    f.push(best)
    got = f.pop()
    assert got.value == 5
    assert got.path_set.sum() == 2
    assert f.pop() is None


def test_nodup_duplicate_push_maxes_ub():
    """no_duplicate.rs:96-117: merged entry ub = max(old, new) even when
    the old value wins."""
    f = NoDupFringe()
    f.push(sub(7, 10, 11, depth=2))
    f.push(sub(7, 3, 99, depth=2))  # worse value, better ub
    got = f.pop()
    assert got.value == 10 and got.ub == 99


def test_nodup_same_state_different_depth_not_merged():
    f = NoDupFringe()
    f.push(sub(5, 1, 10, depth=1))
    f.push(sub(5, 2, 9, depth=2))
    assert len(f) == 2


def test_simple_fringe_allows_duplicates():
    """fringe/simple.rs: plain heap, both copies pop."""
    f = SimpleFringe()
    f.push(sub(5, 4, 5))
    f.push(sub(5, 5, 5))
    assert len(f) == 2
    assert f.pop().value == 5
    assert f.pop().value == 4


# ------------------------------------------------------------------- cache
def test_cache_monotone_update_and_must_explore():
    """cache/simple.rs:62-66 + abstraction/cache.rs:32-39."""

    class P:
        nb_variables = 3

    c = SimpleCache()
    c.initialize(P())
    k = b"state"
    c.update_threshold(k, 1, 10, False)
    assert c.get_threshold(k, 1) == Threshold(10, False)
    # lower update is ignored
    c.update_threshold(k, 1, 5, True)
    assert c.get_threshold(k, 1) == Threshold(10, False)
    # same value, explored=True wins
    c.update_threshold(k, 1, 10, True)
    assert c.get_threshold(k, 1) == Threshold(10, True)
    # higher value wins
    c.update_threshold(k, 1, 12, False)
    assert c.get_threshold(k, 1) == Threshold(12, False)

    # must_explore: value > threshold, or == with explored=False
    s = sub(0, 12, 99, depth=1)
    s.key = k
    assert c.must_explore(s)  # equal value, not explored yet
    c.update_threshold(k, 1, 12, True)
    assert not c.must_explore(s)  # equal value, explored
    s.value = 13
    assert c.must_explore(s)
    # unknown state is always explored
    s2 = sub(1, 0, 99, depth=1)
    assert c.must_explore(s2)
    # clear_layer drops only that depth
    c.update_threshold(k, 2, 7, True)
    c.clear_layer(1)
    assert c.get_threshold(k, 1) is None
    assert c.get_threshold(k, 2) == Threshold(7, True)


# --------------------------------------------------------------- dominance
class VecDominance(Dominance):
    """abstraction/dominance.rs:128-233 DummyDominance: coords = the state
    vector, optional value dimension."""

    def __init__(self, use_value):
        self.use_value = use_value

    def key_cols(self, state):
        return np.zeros(0, np.int32)  # every same-depth state comparable

    def coord_cols(self, state):
        return np.asarray(state, np.int32)


def check(dom, state, value, depth=0):
    st = np.asarray(state, np.int64)
    return dom.is_dominated_or_insert(st, st.tobytes(), depth, value)


def test_dominance_without_value():
    """dominance/simple.rs:118-190."""
    d = SimpleDominanceChecker(VecDominance(False), 4)
    assert not check(d, [3, 3], 0).dominated
    # dominated on every coordinate
    assert check(d, [2, 2], 99).dominated
    # incomparable -> inserted
    assert not check(d, [4, 1], 0).dominated
    # dominates both stored entries -> inserted, evicts them
    assert not check(d, [5, 5], 0).dominated
    assert check(d, [4, 1], 0).dominated  # now dominated by (5,5)
    assert check(d, [3, 3], 0).dominated


def test_dominance_with_value_threshold():
    """dominance/simple.rs:71-111: pruning threshold is the dominating
    value (minus one when only the value dimension differs)."""
    d = SimpleDominanceChecker(VecDominance(True), 4)
    assert not check(d, [3, 3], 10).dominated
    # same coords, lower value: dominated with threshold value-1
    r = check(d, [3, 3], 5)
    assert r.dominated and r.threshold == 9
    # strictly worse coords and value: threshold = dominating value
    r = check(d, [2, 2], 5)
    assert r.dominated and r.threshold == 10
    # better value on same coords: inserted (old entry evicted)
    assert not check(d, [3, 3], 20).dominated
    r = check(d, [3, 3], 10)
    assert r.dominated and r.threshold == 19


def test_dominance_entries_partitioned_by_depth():
    d = SimpleDominanceChecker(VecDominance(False), 4)
    assert not check(d, [3, 3], 0, depth=1).dominated
    assert not check(d, [2, 2], 0, depth=2).dominated  # other layer
    d.clear_layer(1)
    assert not check(d, [1, 1], 0, depth=1).dominated  # layer was cleared


# -------------------------------------------------------------- heuristics
def test_width_heuristics():
    """width.rs:166,397,636,875."""
    s0 = sub(0, 0, 99, depth=0)
    s2 = sub(0, 0, 99, depth=0, path_len=2)
    assert FixedWidth(7).max_width(s0) == 7
    assert NbUnassignedWidth(4).max_width(s0) == 4
    assert NbUnassignedWidth(4).max_width(s2) == 2
    assert Times(3, FixedWidth(5)).max_width(s0) == 15
    assert DivBy(2, FixedWidth(10)).max_width(s0) == 5


def test_cutoffs():
    """cutoff.rs:160,302-344."""
    assert not NoCutoff().must_stop()
    tb = TimeBudget(10.0)
    assert not tb.must_stop()
    tb2 = TimeBudget(0.0)
    time.sleep(0.01)
    assert tb2.must_stop()


# ---------------------------------------------- SubProblemRanking (pluggable)
def test_maxub_pop_order_matches_reference_example():
    """subproblem_ranking.rs test_maxub::example — pop order over six
    subproblems: ub first, then value, then the StateRanking tiebreak."""
    from ddo_tpu.search.fringe import MaxUB

    class CharRanking:  # StateRanking shim: larger char ranks higher
        def score_host(self, state):
            return int(state)

    f = SimpleFringe(ranking=MaxUB(CharRanking()))
    for ch, value, ub in [
        ("a", 42, 300), ("b", 2, 100), ("c", 24, 150),
        ("d", 13, 60), ("e", 65, 700), ("f", 19, 100),
    ]:
        f.push(sub(ord(ch), value, ub))
    order = []
    while not f.is_empty():
        order.append(chr(int(f.pop().state)))
    assert order == ["e", "a", "c", "f", "b", "d"]


def test_custom_subproblem_ranking_overrides_pop_order():
    """A user-supplied SubProblemRanking replaces MaxUB entirely
    (abstraction/heuristics.rs:88): here, deepest-first regardless of ub."""
    from ddo_tpu.search.fringe import SubProblemRanking

    class DeepestFirst(SubProblemRanking):
        def key(self, s):
            return (s.depth, s.ub)

    f = NoDupFringe(ranking=DeepestFirst())
    f.push(sub(1, 5, 100, depth=1))
    f.push(sub(2, 5, 900, depth=0))
    f.push(sub(3, 5, 50, depth=3))
    assert int(f.pop().state) == 3
    assert int(f.pop().state) == 1
    assert int(f.pop().state) == 2


def test_solver_accepts_subproblem_ranking_kwarg():
    import ddo_tpu
    from ddo_tpu.search.fringe import MaxUB
    from tests.test_engine import dummy_bundle

    _, bundle = dummy_bundle()
    solver = ddo_tpu.SequentialSolver(bundle, subproblem_ranking=MaxUB())
    completion = solver.maximize()
    assert completion.is_exact and solver.best_value() == 6

"""Randomized differential stress tests against brute-force oracles.

VERDICT r1 #10: the engine's documented divergences (recycled-merge
in-edge handling, engine/mdd.py:36-40; PSP's replaced stocking bound,
models/psp.py) were argued sound but only spot-checked.  Here hundreds of
randomized instances are solved to proved optimality and checked against
exhaustive enumeration, across widths (merging/recycling constantly
active at width 1-3), cutset types, and filtering on/off.

All instances share one (n, D) shape per family so the whole file runs on
a handful of jitted kernels.
"""

import numpy as np
import pytest

import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle, SimpleCache, SimpleDominanceChecker
from ddo_tpu.core.types import CompilationType, root_subproblem
from ddo_tpu.engine.mdd import DDCompiler
from ddo_tpu.utils.num import NEG_INF


# --------------------------------------------------------------- knapsack
def _random_knapsack(rng, n=8):
    from ddo_tpu.models.knapsack import Knapsack

    profit = rng.integers(1, 50, n)
    weight = rng.integers(1, 20, n)
    capacity = int(rng.integers(10, int(weight.sum()) + 5))
    return Knapsack(capacity, profit, weight), profit, weight, capacity


def _knapsack_oracle(profit, weight, capacity):
    n = len(profit)
    best = 0
    for m in range(1 << n):
        sel = [(m >> i) & 1 for i in range(n)]
        w = sum(s * wt for s, wt in zip(sel, weight))
        if w <= capacity:
            best = max(best, sum(s * p for s, p in zip(sel, profit)))
    return best


@pytest.mark.parametrize("seed", range(25))
def test_knapsack_differential(seed):
    from ddo_tpu.models.knapsack import KPDominance, KPRanking, KPRelax

    rng = np.random.default_rng(seed)
    pb, profit, weight, capacity = _random_knapsack(rng)
    opt = _knapsack_oracle(profit, weight, capacity)
    bundle = ModelBundle(pb, KPRelax(pb), KPRanking())

    width = int(rng.integers(1, 4))
    # relaxed/restricted root bounds must bracket the optimum at any width
    compiler = DDCompiler(bundle, 8, ddo_tpu.FRONTIER)
    root = root_subproblem(pb)
    relaxed = compiler.compile(CompilationType.RELAXED, root, NEG_INF, width)
    restricted = compiler.compile(CompilationType.RESTRICTED, root, NEG_INF, width)
    assert relaxed.best_value() >= opt
    assert restricted.best_value() is None or restricted.best_value() <= opt

    # full cutset x filtering matrix (ADVICE r2: the solver default
    # LAST_EXACT_LAYER + filtering=True had no differential coverage)
    for cutset, filtering in [
        (ddo_tpu.FRONTIER, True), (ddo_tpu.FRONTIER, False),
        (ddo_tpu.LAST_EXACT_LAYER, True), (ddo_tpu.LAST_EXACT_LAYER, False),
    ]:
        s = ddo_tpu.SequentialSolver(
            bundle, width_heu=FixedWidth(width), batch=2, buffer_width=8,
            cache=SimpleCache(), cutset_type=cutset,
            dominance=SimpleDominanceChecker(KPDominance(), pb.nb_variables),
            in_compile_filtering=filtering,
        )
        c = s.maximize()
        assert c.is_exact, (seed, cutset)
        got = s.best_value() if s.best_value() is not None else 0
        assert got == opt, (seed, cutset, got, opt)


# --------------------------------------------------------------- PSP
def _psp_oracle(pb):
    """Exhaustive search over production schedules (model solved backwards
    in time like the DP; enumerate forward over item-per-slot choices)."""
    import itertools

    n, H = pb.n_items, pb.horizon
    demands = pb.demands  # [n, H] 0/1
    stocking = pb.stocking
    changeover = pb.changeover  # [n, n]
    best = None
    for plan in itertools.product(range(n + 1), repeat=H):  # n = idle
        # check feasibility: produce before each demand
        stock = [0] * n
        cost = 0
        ok = True
        prev = None
        for t in range(H):
            it = plan[t]
            if it < n:
                stock[it] += 1
        for i in range(n):
            if stock[i] < int(demands[i].sum()):
                ok = False
        if not ok:
            continue
        # simulate: walk time forward; inventory cost = (time of demand -
        # production time) pairing produced units FIFO per item
        produced = {i: [] for i in range(n)}
        for t in range(H):
            if plan[t] < n:
                produced[plan[t]].append(t)
        for i in range(n):
            times = [t for t in range(H) if demands[i][t]]
            prod = produced[i]
            if len(prod) < len(times):
                ok = False
                break
            # assign earliest units to earliest demands; a unit must be
            # produced no later than its demand time
            prod = sorted(prod)[: len(times)]
            for p, d in zip(prod, sorted(times)):
                if p > d:
                    ok = False
                    break
                cost += stocking[i] * (d - p)
            if not ok:
                break
        if not ok:
            continue
        seq = [it for it in plan if it < n]
        for a, b in zip(seq, seq[1:]):
            cost += changeover[a][b]
        if best is None or cost < best:
            best = cost
    return best


@pytest.mark.parametrize("seed", range(10))
def test_psp_differential(seed):
    from ddo_tpu.models.psp import Psp, PspRanking, PspRelax

    rng = np.random.default_rng(100 + seed)
    n, H = 2, 6
    # demands: at most one per (item, time), feasible (cum demand <= time+1)
    while True:
        demands = (rng.random((n, H)) < 0.35).astype(np.int64)
        cum = np.cumsum(demands.sum(axis=0))
        if all(cum[t] <= t + 1 for t in range(H)) and demands.sum() > 0:
            break
    stocking = rng.integers(1, 10, n)
    changeover = rng.integers(0, 15, (n, n))
    np.fill_diagonal(changeover, 0)
    pb = Psp(H, stocking, changeover, demands)
    opt = _psp_oracle(pb)
    assert opt is not None

    bundle = ModelBundle(pb, PspRelax(pb), PspRanking())
    for width in (1, 2, 4):
        s = ddo_tpu.SequentialSolver(
            bundle, width_heu=FixedWidth(width), batch=2, buffer_width=8,
            cache=SimpleCache(),
        )
        c = s.maximize()
        assert c.is_exact
        assert -s.best_value() == opt, (seed, width, -s.best_value(), opt)

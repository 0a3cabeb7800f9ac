"""Device-side compact extraction (engine/extract.py) equivalence.

The compact route ships only selected rows across the host link instead
of whole [K, n+1, W] planes; with caps large enough to avoid truncation
it must reproduce the plane route's search trajectory EXACTLY (same
explored/expanded counts, same optimum).  Runs on the CPU backend where
compact is off by default — forced on via the solver flag.

KNOWN ALLOWED DIVERGENCE (ADVICE r4 low #4): the compact path enqueues
all cutset rows AFTER every lane's incumbent/dominance absorption while
the plane path interleaves per lane, so when an incumbent improvement
lands mid-drain the compact route may prune strictly MORE rows
(ubs > best_lb against a newer bound) — sound, but explored counts can
then differ.  The fixtures below were picked because their incumbent
updates do not interleave with cutset drains; if an engine change makes
one flaky, compare optima/bounds only for that fixture rather than the
full trajectory tuple."""

from ddo_tpu.utils.resources import resources_root as _res_root
import numpy as np
import pytest

import ddo_tpu
from ddo_tpu import (
    FixedWidth, ModelBundle, NbUnassignedWidth, SimpleCache,
    SimpleDominanceChecker,
)

R = _res_root()


def _solve(make_solver, compact):
    solver = make_solver()
    solver._compact = compact
    completion = solver.maximize()
    return (
        solver.best_value(), completion.is_exact, solver.explored_count,
        solver.expanded_nodes, solver.stats.supersteps,
        solver.best_solution(),
    )


def _assert_equiv(make_solver):
    plane = _solve(make_solver, False)
    compact = _solve(make_solver, True)
    assert plane[:5] == compact[:5]
    assert plane[0] is not None
    np.testing.assert_array_equal(plane[5][0], compact[5][0])
    np.testing.assert_array_equal(plane[5][1], compact[5][1])


def test_compact_equivalence_knapsack():
    from ddo_tpu.models.knapsack import KPDominance, KPRanking, KPRelax, read_instance

    pb = read_instance(f"{R}/knapsack/f8_l-d_kp_23_10000")
    bundle = ModelBundle(pb, KPRelax(pb), KPRanking())
    _assert_equiv(lambda: ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(2), batch=4, cache=SimpleCache(),
        cutset_type=ddo_tpu.FRONTIER,
        dominance=SimpleDominanceChecker(KPDominance(), pb.nb_variables),
    ))


def test_compact_equivalence_misp_lel():
    from ddo_tpu.models.misp import MispRanking, MispRelax, read_instance

    pb = read_instance(f"{R}/misp/johnson8-2-4.clq")
    bundle = ModelBundle(pb, MispRelax(pb), MispRanking(pb))
    _assert_equiv(lambda: ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(8), batch=4,
        cutset_type=ddo_tpu.LAST_EXACT_LAYER,
    ))


def test_compact_equivalence_lcs_long_arcs():
    """Long arcs + dominance + cache through the compact route."""
    from ddo_tpu.models.lcs import Lcs, LcsDominance, LcsRanking, LcsRelax

    rng = np.random.RandomState(7)
    strings = [list(rng.randint(0, 4, 36)), list(rng.randint(0, 4, 30)),
               list(rng.randint(0, 4, 28))]
    pb = Lcs(strings, 4)
    bundle = ModelBundle(pb, LcsRelax(pb), LcsRanking())
    _assert_equiv(lambda: ddo_tpu.SequentialSolver(
        bundle, width_heu=NbUnassignedWidth(pb.nb_variables), batch=4,
        buffer_width=16, cache=SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
        dominance=SimpleDominanceChecker(LcsDominance(), pb.nb_variables),
    ))


def test_cutset_overflow_falls_back():
    """A tiny cutset cap must not lose cutset rows: monkeypatch the caps so
    count > M and verify the solver still proves the optimum via the
    plane-path fallback."""
    from ddo_tpu.engine import extract as EX
    from ddo_tpu.models.mcp import McpRanking, McpRelax, read_instance

    pb = read_instance(f"{R}/mcp/mcp_n30_p0.1_000.mcp")
    bundle = ModelBundle(pb, McpRelax(pb), McpRanking())

    def make():
        return ddo_tpu.SequentialSolver(
            bundle, width_heu=FixedWidth(8), batch=4, cache=SimpleCache(),
            cutset_type=ddo_tpu.FRONTIER,
        )

    expect = _solve(make, True)
    orig = EX.extract_caps
    try:
        EX.extract_caps = lambda K, n1, W: (orig(K, n1, W)[0], orig(K, n1, W)[1], 2)
        got = _solve(make, True)
    finally:
        EX.extract_caps = orig
    assert got[:2] == expect[:2]

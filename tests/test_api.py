"""Tests for the one-call `ddo_tpu.maximize` API (py_ddo parity,
py_ddo/src/lib.rs:46-98 + py_ddo/examples/knapsack)."""

from ddo_tpu.utils.resources import resources_root as _res_root
import ddo_tpu
from ddo_tpu.models.knapsack import KPRanking, KPRelax, read_instance

INSTANCE = _res_root() + "/knapsack/f1_l-d_kp_10_269"


def test_maximize_defaults():
    pb = read_instance(INSTANCE)
    sol = ddo_tpu.maximize(pb, KPRelax(pb), KPRanking())
    assert not sol.aborted
    assert sol.objective == 295
    assert sol.lower_bound == 295 and sol.upper_bound == 295
    assert sol.gap == 0.0
    assert sol.duration >= 0
    # assignment is indexed by variable (lib.rs: sorted by variable id)
    assert len(sol.assignment) == pb.nb_variables
    w = sum(int(pb.weight[i]) for i, v in enumerate(sol.assignment) if v)
    p = sum(int(pb.profit[i]) for i, v in enumerate(sol.assignment) if v)
    assert w <= pb.capacity and p == 295


def test_maximize_knob_matrix():
    pb = read_instance(INSTANCE)
    for lel in (True, False):
        for use_cache in (True, False):
            sol = ddo_tpu.maximize(
                pb, KPRelax(pb), KPRanking(),
                lel=lel, use_cache=use_cache, dedup=not use_cache, width=3,
            )
            assert not sol.aborted and sol.objective == 295, (lel, use_cache)


def test_maximize_timeout_zero_aborts():
    pb = read_instance(INSTANCE)
    sol = ddo_tpu.maximize(pb, KPRelax(pb), KPRanking(), timeout=0.0)
    assert sol.aborted
    assert sol.gap == 1.0

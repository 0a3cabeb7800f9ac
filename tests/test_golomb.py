"""Golomb ruler tests: known optimal ruler lengths
(/root/reference/ddo/examples/golomb/tests.rs)."""

import pytest

import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle
from ddo_tpu.models.golomb import Golomb, GolombRanking, GolombRelax

# solve_golomb(n) == known optimum length (tests.rs:66-88)
CASES = [(2, 1), (3, 3), (4, 6), (5, 11), (6, 17), (7, 25)]


@pytest.mark.parametrize("n,opt", CASES)
def test_golomb(n, opt):
    pb = Golomb(n)
    bundle = ModelBundle(pb, GolombRelax(pb), GolombRanking())
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(10), cache=ddo_tpu.SimpleCache(),
        cutset_type=ddo_tpu.FRONTIER,
    )
    completion = solver.maximize()
    assert completion.is_exact
    assert solver.best_value() == -opt  # maximization of negated length

    # verify the ruler: decisions are the mark positions
    vals, pset = solver.best_solution()
    marks = [0] + sorted(int(v) for v, s in zip(vals, pset) if s)
    assert len(marks) == n
    dists = [b - a for i, a in enumerate(marks) for b in marks[i + 1:]]
    assert len(set(dists)) == len(dists), "distances must be all different"
    assert max(marks) == opt

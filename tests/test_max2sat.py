"""MAX2SAT tests: bundled instances with optima from
/root/reference/ddo/examples/max2sat/tests.rs + brute force cross-checks."""

from ddo_tpu.utils.resources import resources_root as _res_root
import itertools

import numpy as np
import pytest

import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle
from ddo_tpu.models.max2sat import Max2Sat, Max2SatRanking, Max2SatRelax, read_instance

RESOURCES = _res_root() + "/max2sat"

# (instance, optimum) — tests.rs
SMALL = [
    ("debug.wcnf", 24),
    ("debug2.wcnf", 13),
    ("pass.wcnf", 54),
    ("tautology.wcnf", 7),
    ("unit.wcnf", 6),
    ("negative_wt.wcnf", 4258),
]


def bundle_for(pb):
    return ModelBundle(pb, Max2SatRelax(pb), Max2SatRanking())


def brute_force(nb_vars, clauses):
    best = -(10**9)
    for bits in itertools.product([True, False], repeat=nb_vars):
        tot = 0
        for (a, b), w in clauses.items():
            sa = bits[abs(a) - 1] == (a > 0)
            sb = bits[abs(b) - 1] == (b > 0)
            if sa or sb:
                tot += w
        best = max(best, tot)
    return best


def solve(pb, width=4, batch=1):
    solver = ddo_tpu.SequentialSolver(
        bundle_for(pb), width_heu=FixedWidth(width), batch=batch,
    )
    return solver, solver.maximize()


@pytest.mark.parametrize("fname,opt", SMALL)
def test_instances(fname, opt):
    pb = read_instance(f"{RESOURCES}/{fname}")
    solver, completion = solve(pb, width=4)
    assert completion.is_exact
    assert solver.best_value() == opt


@pytest.mark.parametrize("seed", range(4))
def test_random_vs_bruteforce(seed):
    rng = np.random.default_rng(200 + seed)
    n = int(rng.integers(4, 9))
    clauses = {}
    for _ in range(int(rng.integers(4, 15))):
        a = int(rng.integers(1, n + 1)) * (1 if rng.random() < 0.5 else -1)
        b = int(rng.integers(1, n + 1)) * (1 if rng.random() < 0.5 else -1)
        a, b = min(a, b), max(a, b)
        clauses[(a, b)] = int(rng.integers(1, 20))
    pb = Max2Sat(n, clauses)
    expected = brute_force(n, clauses)
    solver, completion = solve(pb, width=int(rng.integers(2, 6)))
    assert completion.is_exact
    assert solver.best_value() == expected, f"clauses={clauses}"

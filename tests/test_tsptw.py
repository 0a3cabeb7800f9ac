"""TSPTW tests: brute-force oracle on small random instances + the
bundled Langevin N20ft301 (optimum 661.60,
/root/reference/ddo/examples/tsptw/tests.rs)."""

from ddo_tpu.utils.resources import resources_root as _res_root
import itertools

import numpy as np
import pytest

import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle, SimpleDominanceChecker
from ddo_tpu.models.tsptw import (
    Tsptw,
    TsptwDominance,
    TsptwRanking,
    TsptwRelax,
    TsptwWidth,
    read_instance,
)


def bundle_for(pb):
    return ModelBundle(pb, TsptwRelax(pb), TsptwRanking())


def brute_force(dist, twe, twl):
    """Min feasible tour time (with waiting), or None."""
    n = len(dist)
    best = None
    for perm in itertools.permutations(range(1, n)):
        t = 0
        ok = True
        cur = 0
        for j in list(perm) + [0]:
            t += dist[cur][j]
            if t < twe[j]:
                t = twe[j]
            if t > twl[j]:
                ok = False
                break
            cur = j
        if ok and (best is None or t < best):
            best = t
    return best


def solve(pb, width_heu, batch=1):
    solver = ddo_tpu.SequentialSolver(
        bundle_for(pb), width_heu=width_heu, batch=batch,
        cache=ddo_tpu.SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
        dominance=SimpleDominanceChecker(TsptwDominance(), pb.nb_variables),
        buffer_width=max(64, pb.nb_variables),
    )
    return solver, solver.maximize()


@pytest.mark.parametrize("seed", range(5))
def test_random_vs_bruteforce(seed):
    rng = np.random.default_rng(500 + seed)
    n = int(rng.integers(4, 8))
    xy = rng.uniform(0, 50, (n, 2))
    dist = np.sqrt(((xy[:, None] - xy[None, :]) ** 2).sum(-1)).astype(np.int64)
    width = int(rng.integers(20, 80))
    twe = rng.integers(0, 100, n)
    twl = twe + rng.integers(width, 250, n)
    twe[0], twl[0] = 0, 10**6
    pb = Tsptw(dist, twe, twl)
    expected = brute_force(dist.tolist(), twe.tolist(), twl.tolist())
    solver, completion = solve(pb, FixedWidth(int(rng.integers(2, 8))))
    assert completion.is_exact
    got = solver.best_value()
    if expected is None:
        assert got is None
    else:
        assert got == -expected

        # replay the returned tour: must satisfy the windows and match cost
        vals, pset = solver.best_solution()
        order = [int(vals[d]) for d in range(pb.nb_variables) if pset[d]]
        t, cur = 0, 0
        for j in order:
            t = max(t + dist[cur][j], twe[j])
            assert t <= twl[j]
            cur = j
        assert t == expected


def test_langevin_n20():
    pb = read_instance(_res_root() + "/tsptw/Langevin/N20ft301.dat")
    solver, completion = solve(pb, TsptwWidth(pb.nb_variables, 1), batch=4)
    assert completion.is_exact
    assert round(-solver.best_value() / 10000.0, 2) == 661.60


# more Langevin instances (tsptw/tests.rs, decode: -value/1e4)
LANGEVIN = [
    ("N20ft302.dat", 703.00),
    ("N20ft303.dat", 746.40),
    ("N20ft304.dat", 817.00),
]


@pytest.mark.parametrize("fname,opt", LANGEVIN)
def test_langevin_suite(fname, opt):
    pb = read_instance(f"{_res_root()}/tsptw/Langevin/{fname}")
    solver, completion = solve(pb, TsptwWidth(pb.nb_variables, 1), batch=4)
    assert completion.is_exact
    assert round(-solver.best_value() / 10000.0, 2) == opt

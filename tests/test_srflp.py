"""SRFLP tests: brute force on random instances + bundled Cl5 (optimum
1100.0, /root/reference/ddo/examples/srflp/tests.rs)."""

from ddo_tpu.utils.resources import resources_root as _res_root
import itertools

import numpy as np
import pytest

import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle
from ddo_tpu.models.srflp import (
    Srflp,
    SrflpRanking,
    SrflpRelax,
    SrflpWidth,
    read_instance,
)


def bundle_for(pb):
    return ModelBundle(pb, SrflpRelax(pb), SrflpRanking())


def brute_force(lengths, flows):
    """Min sum of flow x center distance over all arrangements."""
    n = len(lengths)
    best = None
    for perm in itertools.permutations(range(n)):
        # center positions
        pos = {}
        x = 0.0
        for d in perm:
            pos[d] = x + lengths[d] / 2.0
            x += lengths[d]
        tot = 0.0
        for i in range(n):
            for j in range(i + 1, n):
                tot += flows[i][j] * abs(pos[i] - pos[j])
        if best is None or tot < best:
            best = tot
    return best


def solve(pb, width_heu, batch=1):
    solver = ddo_tpu.SequentialSolver(
        bundle_for(pb), width_heu=width_heu, batch=batch,
        cache=ddo_tpu.SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
        buffer_width=max(64, pb.nb_variables),
    )
    return solver, solver.maximize()


@pytest.mark.parametrize("seed", range(4))
def test_random_vs_bruteforce(seed):
    rng = np.random.default_rng(700 + seed)
    n = int(rng.integers(4, 7))
    lengths = rng.integers(1, 10, n).tolist()
    flows = rng.integers(0, 8, (n, n))
    flows = (flows + flows.T).tolist()
    for i in range(n):
        flows[i][i] = 0
    pb = Srflp(lengths, flows)
    expected = brute_force(lengths, flows)
    solver, completion = solve(pb, FixedWidth(int(rng.integers(2, 8))))
    assert completion.is_exact
    got = -solver.best_value() + pb.root_value
    assert abs(got - expected) < 1e-6, f"{got} != {expected}"


def test_cl5():
    pb = read_instance(_res_root() + "/srflp/Cl5")
    solver, completion = solve(pb, SrflpWidth(pb.nb_variables, 1), batch=2)
    assert completion.is_exact
    assert -solver.best_value() + pb.root_value == 1100.0

"""MISP end-to-end tests: brute force on random graphs + bundled DIMACS
instances with optima from /root/reference/ddo/examples/misp/tests.rs."""

from ddo_tpu.utils.resources import resources_root as _res_root
import itertools

import numpy as np
import pytest

import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle, NbUnassignedWidth
from ddo_tpu.models.misp import Misp, MispRanking, MispRelax, read_instance

RESOURCES = _res_root() + "/misp"


def bundle_for(pb):
    return ModelBundle(pb, MispRelax(pb), MispRanking(pb))


def brute_force(n, edges, weight):
    adj = [set() for _ in range(n)]
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    best = 0
    for m in range(1 << n):
        sel = [i for i in range(n) if m >> i & 1]
        ok = all(b not in adj[a] for a, b in itertools.combinations(sel, 2))
        if ok:
            best = max(best, sum(weight[i] for i in sel))
    return best


def solve(pb, width, batch=1):
    solver = ddo_tpu.SequentialSolver(
        bundle_for(pb), width_heu=FixedWidth(width), batch=batch,
        cutset_type=ddo_tpu.LAST_EXACT_LAYER,
    )
    return solver, solver.maximize()


def check_independent(pb, solver, expected):
    vals, pset = solver.best_solution()
    chosen = [i for i in range(pb.nb_variables) if pset[i] and vals[i] == 1]
    # independence + weight check against instance data
    comp = np.asarray(pb._data["comp_adj"])
    for a in chosen:
        for b in chosen:
            if a != b:
                assert comp[a][b // 32] >> (b % 32) & 1, f"edge {a}-{b} violated"
    assert sum(int(pb.weight[i]) for i in chosen) == expected


@pytest.mark.parametrize("seed", range(5))
def test_random_vs_bruteforce(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(6, 13))
    edges = [
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if rng.random() < 0.35
    ]
    weight = rng.integers(1, 10, n)
    pb = Misp(n, edges, weight)
    expected = brute_force(n, edges, weight)
    solver, completion = solve(pb, width=int(rng.integers(2, 6)))
    assert completion.is_exact
    assert solver.best_value() == expected
    check_independent(pb, solver, expected)


def test_johnson8_2_4():
    # tests.rs: optimum 4
    pb = read_instance(f"{RESOURCES}/johnson8-2-4.clq")
    solver, completion = solve(pb, width=16, batch=4)
    assert completion.is_exact
    assert solver.best_value() == 4
    check_independent(pb, solver, 4)


def test_mann_a9():
    # tests.rs: optimum 16
    pb = read_instance(f"{RESOURCES}/MANN_a9.clq")
    solver, completion = solve(pb, width=32, batch=4)
    assert completion.is_exact
    assert solver.best_value() == 16
    check_independent(pb, solver, 16)


# more DIMACS instances from the reference suite (tests.rs optima)
DIMACS = [
    ("hamming6-2.clq", 32, 16),
    ("hamming6-4.clq", 4, 16),
    ("johnson8-4-4.clq", 14, 32),
    ("c-fat200-1.clq", 12, 16),
    ("c-fat200-2.clq", 24, 16),
]


@pytest.mark.parametrize("fname,opt,width", DIMACS)
def test_dimacs_instances(fname, opt, width):
    pb = read_instance(f"{RESOURCES}/{fname}")
    solver, completion = solve(pb, width=width, batch=4)
    assert completion.is_exact
    assert solver.best_value() == opt
    check_independent(pb, solver, opt)

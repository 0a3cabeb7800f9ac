"""MCP (max cut) tests: brute force on random graphs + one bundled
instance (optimum from /root/reference/ddo/examples/mcp/tests.rs)."""

from ddo_tpu.utils.resources import resources_root as _res_root
import numpy as np
import pytest

import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle
from ddo_tpu.models.mcp import Mcp, McpRanking, McpRelax, read_instance

RESOURCES = _res_root() + "/mcp"


def bundle_for(pb):
    return ModelBundle(pb, McpRelax(pb), McpRanking())


def brute_force_cut(n, w):
    best = 0
    for m in range(1 << (n - 1)):  # vertex 0 pinned to side S
        side = [(m >> (i - 1)) & 1 if i else 0 for i in range(n)]
        tot = sum(
            w[a][b]
            for a in range(n)
            for b in range(a + 1, n)
            if side[a] != side[b]
        )
        best = max(best, tot)
    return int(best)


def solve(pb, width=8, batch=1):
    solver = ddo_tpu.SequentialSolver(
        bundle_for(pb), width_heu=FixedWidth(width), batch=batch,
        cache=ddo_tpu.SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
    )
    return solver, solver.maximize()


@pytest.mark.parametrize("seed", range(4))
def test_random_vs_bruteforce(seed):
    rng = np.random.default_rng(300 + seed)
    n = int(rng.integers(4, 10))
    edges = []
    for a in range(n):
        for b in range(a + 1, n):
            if rng.random() < 0.5:
                edges.append((a, b, int(rng.integers(-10, 15))))
    pb = Mcp(n, edges)
    w = np.asarray(pb.w)
    expected = brute_force_cut(n, w)
    solver, completion = solve(pb, width=int(rng.integers(2, 6)))
    assert completion.is_exact
    assert solver.best_value() == expected


def test_bundled_instance():
    pb = read_instance(f"{RESOURCES}/mcp_n30_p0.1_000.mcp")
    solver, completion = solve(pb, width=16, batch=4)
    assert completion.is_exact
    assert solver.best_value() == 13

"""PSP tests: bundled 2-item instances (trailing line = known optimum,
tests.rs asserts e.g. instancesWith2items/1 -> 13) + brute force."""

from ddo_tpu.utils.resources import resources_root as _res_root
from functools import lru_cache

import numpy as np
import pytest

import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle
from ddo_tpu.models.psp import Psp, PspRanking, PspRelax, read_instance

RESOURCES = _res_root() + "/psp"


def bundle_for(pb):
    return ModelBundle(pb, PspRelax(pb), PspRanking())


def brute_force(pb: Psp):
    """Exact backward DP over (time, heads, next)."""
    N, H = pb.n_items, pb.horizon
    prev = pb._prev_np
    rem_tbl = np.cumsum(pb.demands, axis=1)

    @lru_cache(maxsize=None)
    def go(t, heads, nxt):
        if t < 0:
            return 0 if all(h < 0 for h in heads) else None
        rem = sum(int(rem_tbl[i][heads[i]]) for i in range(N) if heads[i] >= 0)
        if rem > t + 1:
            return None
        best = None
        if rem < t + 1:  # idle
            r = go(t - 1, heads, nxt)
            if r is not None:
                best = r
        for i in range(N):
            if heads[i] >= t:
                dur = heads[i] - t
                co = pb.changeover[i][nxt] if nxt >= 0 else 0
                c = int(co + pb.stocking[i] * dur)
                nh = list(heads)
                nh[i] = int(prev[i][heads[i]])
                r = go(t - 1, tuple(nh), i)
                if r is not None and (best is None or c + r < best):
                    best = c + r
        return best

    heads0 = tuple(int(x) for x in prev[:, H])
    return go(H - 1, heads0, -1)


def solve(pb, width=8, batch=1):
    solver = ddo_tpu.SequentialSolver(
        bundle_for(pb), width_heu=FixedWidth(width), batch=batch,
        cache=ddo_tpu.SimpleCache(),
    )
    return solver, solver.maximize()


@pytest.mark.parametrize("idx,opt", [(1, None), (2, None), (3, None)])
def test_bundled_2items(idx, opt):
    pb, optimum = read_instance(f"{RESOURCES}/instancesWith2items/{idx}")
    assert optimum is not None
    solver, completion = solve(pb, width=8, batch=2)
    assert completion.is_exact
    assert -solver.best_value() == optimum


@pytest.mark.parametrize("seed", range(4))
def test_random_vs_bruteforce(seed):
    rng = np.random.default_rng(900 + seed)
    H = int(rng.integers(4, 9))
    N = int(rng.integers(2, 4))
    demands = (rng.random((N, H)) < 0.35).astype(np.int64)
    # keep feasible: cumulative demand never exceeds elapsed periods
    for t in range(H):
        while demands[:, : t + 1].sum() > t + 1:
            nz = np.argwhere(demands[:, : t + 1])
            i, tt = nz[rng.integers(len(nz))]
            demands[i, tt] = 0
    stocking = rng.integers(1, 10, N)
    changeover = rng.integers(0, 15, (N, N))
    np.fill_diagonal(changeover, 0)
    pb = Psp(H, stocking, changeover, demands)
    expected = brute_force(pb)
    solver, completion = solve(pb, width=int(rng.integers(2, 6)))
    assert completion.is_exact
    got = solver.best_value()
    if expected is None:
        assert got is None
    else:
        assert got == -expected

"""SOP tests: brute force on random precedence instances + bundled ESC07
(optimum 2125, /root/reference/ddo/examples/sop/tests.rs)."""

from ddo_tpu.utils.resources import resources_root as _res_root
import itertools

import numpy as np
import pytest

import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle
from ddo_tpu.models.sop import Sop, SopRanking, SopRelax, SopWidth, read_instance


def bundle_for(pb):
    return ModelBundle(pb, SopRelax(pb), SopRanking())


def brute_force(dist):
    """Min path 0 -> ... -> n-1 visiting all, honoring -1 precedences."""
    n = len(dist)
    best = None
    for perm in itertools.permutations(range(1, n - 1)):
        seq = [0] + list(perm) + [n - 1]
        tot = 0
        ok = True
        done = set()
        for a, b in zip(seq, seq[1:]):
            done.add(a)
            # precedences of b must be done
            for j in range(n):
                if dist[b][j] == -1 and j not in done and j != b:
                    ok = False
                    break
            if not ok or dist[a][b] == -1:
                ok = False
                break
            tot += dist[a][b]
        if ok and (best is None or tot < best):
            best = tot
    return best


def solve(pb, width_heu, batch=1):
    solver = ddo_tpu.SequentialSolver(
        bundle_for(pb), width_heu=width_heu, batch=batch,
        cache=ddo_tpu.SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
        buffer_width=max(64, pb.nb_jobs),
    )
    return solver, solver.maximize()


@pytest.mark.parametrize("seed", range(5))
def test_random_vs_bruteforce(seed):
    rng = np.random.default_rng(600 + seed)
    n = int(rng.integers(4, 8))
    dist = rng.integers(1, 50, (n, n)).astype(np.int64)
    np.fill_diagonal(dist, 0)
    dist[:, 0] = -1  # 0 precedes everything (start)
    dist[n - 1, :] = np.where(np.arange(n) == n - 1, 0, -1)  # end after all?
    # reference semantics: -1 in dist[i][j] means j precedes i; make the
    # last job require everything, plus a random extra precedence
    dist[n - 1, :n - 1] = -1
    dist[0, 0] = 0
    if n > 4:
        a, b = 1, 2
        dist[b][a] = -1  # a must precede b
    pb = Sop(dist)
    expected = brute_force(dist.tolist())
    solver, completion = solve(pb, FixedWidth(int(rng.integers(2, 8))))
    assert completion.is_exact
    got = solver.best_value()
    if expected is None:
        assert got is None
    else:
        assert got == -expected


def test_esc07():
    pb = read_instance(_res_root() + "/sop/ESC07.sop")
    solver, completion = solve(pb, SopWidth(pb.nb_variables, 1), batch=4)
    assert completion.is_exact
    assert solver.best_value() == -2125

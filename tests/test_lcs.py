"""LCS tests: brute-force 3-string DP cross-checks on random instances
(bundled instances are 850-char texts — exercised by bench, not unit tests)."""

import numpy as np
import pytest

import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle, NbUnassignedWidth, SimpleDominanceChecker
from ddo_tpu.models.lcs import Lcs, LcsDominance, LcsRanking, LcsRelax


def brute_lcs(strings):
    """Exact multi-string LCS via DP over position tuples."""
    import itertools
    from functools import lru_cache

    m = len(strings)
    lens = [len(s) for s in strings]

    @lru_cache(maxsize=None)
    def go(pos):
        if any(p >= l for p, l in zip(pos, lens)):
            return 0
        best = 0
        chars = set(strings[0][pos[0]:])
        for c in chars:
            nxt = []
            ok = True
            for s, p in zip(strings, pos):
                try:
                    idx = s.index(c, p)
                except ValueError:
                    ok = False
                    break
                nxt.append(idx + 1)
            if ok:
                best = max(best, 1 + go(tuple(nxt)))
        return best

    return go(tuple([0] * m))


def solve(pb, width=16):
    bundle = ModelBundle(pb, LcsRelax(pb), LcsRanking())
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(width), cache=ddo_tpu.SimpleCache(),
        dominance=SimpleDominanceChecker(LcsDominance(), pb.nb_variables),
        cutset_type=ddo_tpu.FRONTIER,
    )
    return solver, solver.maximize()


@pytest.mark.parametrize("seed", range(5))
def test_random_vs_bruteforce(seed):
    rng = np.random.default_rng(400 + seed)
    m = int(rng.integers(2, 4))
    n_chars = int(rng.integers(2, 5))
    strings = [
        [int(x) for x in rng.integers(0, n_chars, int(rng.integers(5, 14)))]
        for _ in range(m)
    ]
    pb = Lcs(strings, n_chars)
    expected = brute_lcs(strings)
    solver, completion = solve(pb, width=int(rng.integers(2, 8)))
    assert completion.is_exact
    got = solver.best_value() if solver.best_value() is not None else 0
    assert got == expected, f"strings={strings}"

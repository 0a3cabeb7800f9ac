"""ALP tests: exhaustive recursive oracle on small random instances."""

import numpy as np
import pytest

import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle, SimpleDominanceChecker
from ddo_tpu.models.alp import Alp, AlpDominance, AlpRanking, AlpRelax


def brute_force(pb: Alp):
    """Min total delay over all class-interleavings and runway choices."""
    C, R = pb.nb_classes, pb.nb_runways
    nxt = [[0] for _ in range(C)]
    for i in range(pb.nb_variables - 1, -1, -1):
        nxt[pb.classes[i]].append(i)
    best = [None]

    def arrival(info, aircraft, runway):
        t, c = info[runway]
        tgt = int(pb.target[aircraft])
        if t == 0 and c == -1:
            return tgt
        if c == -1:
            return max(tgt, t + int(pb.min_sep_to[pb.classes[aircraft]]))
        return max(tgt, t + int(pb.sep[c][pb.classes[aircraft]]))

    def go(rem, info, acc):
        if best[0] is not None and acc >= best[0]:
            return
        if sum(rem) == 0:
            best[0] = acc if best[0] is None else min(best[0], acc)
            return
        for c in range(C):
            if rem[c] == 0:
                continue
            a = nxt[c][rem[c]]
            for r in range(R):
                t = arrival(info, a, r)
                if t > pb.latest[a]:
                    continue
                rem2 = list(rem)
                rem2[c] -= 1
                info2 = sorted(list(info[:r]) + list(info[r + 1:]) + [(t, c)])
                go(tuple(rem2), tuple(info2), acc + t - int(pb.target[a]))

    rem0 = [0] * C
    for c in pb.classes:
        rem0[c] += 1
    go(tuple(rem0), tuple([(0, -1)] * R), 0)
    return best[0]


@pytest.mark.parametrize("seed", range(5))
def test_random_vs_bruteforce(seed):
    rng = np.random.default_rng(800 + seed)
    n = int(rng.integers(4, 8))
    C = int(rng.integers(1, 3))
    R = int(rng.integers(1, 3))
    target = np.sort(rng.integers(0, 60, n))
    latest = target + rng.integers(30, 200, n)
    classes = rng.integers(0, C, n)
    sep = rng.integers(3, 15, (C, C))
    pb = Alp(C, R, target, latest, classes, sep)
    expected = brute_force(pb)
    bundle = ModelBundle(pb, AlpRelax(pb), AlpRanking())
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(int(rng.integers(2, 8))),
        cache=ddo_tpu.SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
        dominance=SimpleDominanceChecker(AlpDominance(), pb.nb_variables),
    )
    completion = solver.maximize()
    assert completion.is_exact
    got = solver.best_value()
    if expected is None:
        assert got is None
    else:
        assert got == -expected

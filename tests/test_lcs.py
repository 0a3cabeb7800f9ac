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


def test_dominance_semantics():
    """lcs/dominance.rs: states are compared per string position — fewer
    consumed characters everywhere (with >= value) dominates."""
    import jax.numpy as jnp

    dom = LcsDominance()
    a = {"pos": jnp.asarray([3, 5, 2])}
    b = {"pos": jnp.asarray([4, 5, 2])}
    assert dom.key(a) == dom.key(b) or dom.key(a) is not None
    # smaller positions -> larger coords -> dominates
    assert (dom.coords(a) >= dom.coords(b)).all()
    assert dom.use_value


def test_merge_takes_min_positions():
    """model.rs:182-191: merged position vector = elementwise min (the
    merged state has consumed no more of any string than any member)."""
    import jax
    import jax.numpy as jnp

    pb = Lcs([[0, 1, 0, 1], [1, 0, 1], [0, 0, 1]], 2)
    relax = LcsRelax(pb)
    states = {"pos": jnp.asarray([[3, 1, 2], [1, 2, 0]])}
    merged = relax.merge(pb.data, states, jnp.ones(2, bool))
    assert np.asarray(merged["pos"]).tolist() == [1, 1, 0]


def test_rub_matches_pairwise_two_string_lcs():
    """model.rs:205-215: the bound is the min over string pairs of the
    exact 2-string LCS of the remaining suffixes — check one pair
    against a direct DP."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    strings = [
        [int(x) for x in rng.integers(0, 3, 10)] for _ in range(2)
    ]
    pb = Lcs(strings, 3)
    relax = LcsRelax(pb)
    root = jax.tree_util.tree_map(jnp.asarray, pb.initial_state(pb.data))
    rub = int(relax.rub(pb.data, root, 0))
    assert rub == brute_lcs(strings)  # two strings: the pair bound is exact


def test_long_arcs_match_dense_expansion():
    """is_impacted_by (model.rs:162) routes unimpacted states through
    long arcs; the proved optimum must match a run with the hook
    disabled (dense per-layer expansion)."""
    class DenseLcs(Lcs):
        is_impacted_by = ddo_tpu.Problem.is_impacted_by

    rng = np.random.default_rng(11)
    strings = [
        [int(x) for x in rng.integers(0, 3, int(rng.integers(6, 10)))]
        for _ in range(3)
    ]
    a, ca = solve(Lcs(strings, 3), width=8)
    b, cb = solve(DenseLcs(strings, 3), width=8)
    assert ca.is_exact and cb.is_exact
    assert a.best_value() == b.best_value() == brute_lcs(strings)

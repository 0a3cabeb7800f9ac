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


def _rand_instance(rng, n_lo=4, n_hi=8):
    n = int(rng.integers(n_lo, n_hi))
    C = int(rng.integers(1, 3))
    R = int(rng.integers(1, 3))
    target = np.sort(rng.integers(0, 60, n))
    latest = target + rng.integers(30, 200, n)
    classes = rng.integers(0, C, n)
    sep = rng.integers(3, 15, (C, C))
    return Alp(C, R, target, latest, classes, sep)


def test_rub_admissible_at_root():
    """The r5 per-class queueing bound must never under-estimate the
    achievable value: rub(root) >= optimal value (= -min total delay)."""
    import jax
    import jax.numpy as jnp

    for seed in range(6):
        rng = np.random.default_rng(900 + seed)
        pb = _rand_instance(rng)
        expected = brute_force(pb)
        if expected is None:
            continue
        relax = AlpRelax(pb)
        root = jax.tree_util.tree_map(
            jnp.asarray, pb.initial_state(pb.data)
        )
        rub = int(relax.rub(pb.data, root, 0))
        assert rub >= -expected, (seed, rub, -expected)


def test_dominance_semantics():
    """alp/dominance.rs: same (rem, runway classes) key; a state with
    every -prev_time >= (i.e. earlier runway availability) and >= value
    dominates."""
    import jax.numpy as jnp

    dom = AlpDominance()
    a = {"rem": jnp.asarray([2, 1]), "rw_time": jnp.asarray([5, 9]),
         "rw_class": jnp.asarray([0, 1])}
    b = {"rem": jnp.asarray([2, 1]), "rw_time": jnp.asarray([7, 9]),
         "rw_class": jnp.asarray([0, 1])}
    c = {"rem": jnp.asarray([1, 1]), "rw_time": jnp.asarray([5, 9]),
         "rw_class": jnp.asarray([0, 1])}
    assert dom.key(a) == dom.key(b)        # comparable
    assert dom.key(a) != dom.key(c)        # different rem -> incomparable
    assert (dom.coords(a) >= dom.coords(b)).all()  # earlier times dominate
    assert dom.use_value


def test_merge_relaxes_members():
    """model.rs AlpRelax::merge: the merged state's runway availability
    lower-bounds every member's for every class (min times + DUMMY class
    taking the min inbound separation)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(17)
    pb = _rand_instance(rng)
    relax = AlpRelax(pb)
    R, C = pb.nb_runways, pb.nb_classes
    states = {
        "rem": jnp.asarray(rng.integers(0, 3, (3, C)), jnp.int32),
        "rw_time": jnp.sort(jnp.asarray(rng.integers(1, 40, (3, R)), jnp.int32)),
        "rw_class": jnp.sort(jnp.asarray(rng.integers(0, C, (3, R)), jnp.int32)),
    }
    merged = relax.merge(pb.data, states, jnp.ones(3, bool))
    assert (np.asarray(merged["rem"])
            <= np.asarray(states["rem"]).min(0)).all()
    assert (np.asarray(merged["rw_time"])
            <= np.asarray(states["rw_time"]).min(0)).all()
    # DUMMY class => min inbound separation for every class
    assert (np.asarray(merged["rw_class"]) == -1).all()


def test_device_loop_matches_bruteforce():
    from ddo_tpu import DeviceLoopSolver

    rng = np.random.default_rng(321)
    pb = _rand_instance(rng)
    expected = brute_force(pb)
    bundle = ModelBundle(pb, AlpRelax(pb), AlpRanking())
    solver = DeviceLoopSolver(
        bundle, width_heu=FixedWidth(4), batch=2,
        cache=ddo_tpu.SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
        dominance=SimpleDominanceChecker(AlpDominance(), pb.nb_variables),
        slab_cap=128, chunk_steps=4, cut_cap=64,
    )
    completion = solver.maximize()
    assert completion.is_exact
    got = solver.best_value()
    assert got == (-expected if expected is not None else None)

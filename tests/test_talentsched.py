"""Talent scheduling tests (optima from
/root/reference/ddo/examples/talentsched/tests.rs; objective = -best_value)."""

from ddo_tpu.utils.resources import resources_root as _res_root
import pytest

import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle
from ddo_tpu.models.talentsched import (
    TalentSched,
    TalentSchedRanking,
    TalentSchedRelax,
    read_instance,
)

RESOURCES = _res_root() + "/talentsched"

CASES = [("tiny", 29), ("tiny2", 9), ("small", 54), ("small2", 56)]


@pytest.mark.parametrize("fname,opt", CASES)
def test_instances(fname, opt):
    pb = read_instance(f"{RESOURCES}/{fname}")
    bundle = ModelBundle(pb, TalentSchedRelax(pb), TalentSchedRanking())
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(100), cache=ddo_tpu.SimpleCache(),
        cutset_type=ddo_tpu.FRONTIER, batch=2,
    )
    completion = solver.maximize()
    assert completion.is_exact
    assert -solver.best_value() == opt


import itertools

import numpy as np


def brute_force(pb: TalentSched):
    """Min total actor cost over all scene permutations (objective of
    model.rs: on-location pay; the DP objective is its negation offset
    by the mandatory filming pay, pb.initial)."""
    n, A = pb.nb_variables, pb.nb_actors
    best = None
    for perm in itertools.permutations(range(n)):
        total = 0
        for a in range(A):
            scenes = [i for i, s in enumerate(perm) if pb.actor_mat[a][s]]
            if not scenes:
                continue
            span = range(min(scenes), max(scenes) + 1)
            total += int(pb.cost[a]) * sum(int(pb.duration[perm[i]]) for i in span)
        best = total if best is None else min(best, total)
    return best


def _rand_instance(rng):
    n = int(rng.integers(3, 6))
    A = int(rng.integers(2, 5))
    cost = rng.integers(1, 9, A)
    duration = rng.integers(1, 5, n)
    actors = (rng.random((A, n)) < 0.5).astype(np.int64)
    # every scene needs at least one actor (degenerate scenes allowed by
    # the format but not interesting here)
    for s in range(n):
        if actors[:, s].sum() == 0:
            actors[rng.integers(0, A), s] = 1
    return TalentSched(n, A, cost, duration, actors)


@pytest.mark.parametrize("seed", range(4))
def test_random_vs_bruteforce(seed):
    rng = np.random.default_rng(1200 + seed)
    pb = _rand_instance(rng)
    expected = brute_force(pb)
    bundle = ModelBundle(pb, TalentSchedRelax(pb), TalentSchedRanking())
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(int(rng.integers(2, 8))), batch=2,
        cache=ddo_tpu.SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
    )
    completion = solver.maximize()
    assert completion.is_exact
    assert -solver.best_value() == expected, f"seed={seed}"


def test_merge_is_intersection_union():
    """model.rs merge: certain scenes = intersection; maybes = union of
    (scenes | maybe) minus the certain intersection."""
    import jax
    import jax.numpy as jnp
    from ddo_tpu.ops import bitset as bs

    rng = np.random.default_rng(5)
    pb = _rand_instance(rng)
    relax = TalentSchedRelax(pb)
    states = {
        "scenes": jnp.asarray([[0b0111], [0b0101]], jnp.uint32),
        "maybe": jnp.asarray([[0b1000], [0b0010]], jnp.uint32),
    }
    merged = relax.merge(pb.data, states, jnp.ones(2, bool))
    assert int(merged["scenes"][0]) == 0b0101
    assert int(merged["maybe"][0]) == 0b1010


def test_rub_admissible():
    """The fractional bound must never under-estimate the best residual
    value: at the root, initial_value + rub >= -optimal cost."""
    import jax
    import jax.numpy as jnp

    for seed in range(4):
        rng = np.random.default_rng(1300 + seed)
        pb = _rand_instance(rng)
        expected = brute_force(pb)
        relax = TalentSchedRelax(pb)
        root = jax.tree_util.tree_map(jnp.asarray, pb.initial_state(pb.data))
        rub = int(relax.rub(pb.data, root, 0))
        assert int(pb.initial) + rub >= -expected, (seed,)


def test_device_loop_matches():
    from ddo_tpu import DeviceLoopSolver

    pb = read_instance(f"{RESOURCES}/tiny")
    bundle = ModelBundle(pb, TalentSchedRelax(pb), TalentSchedRanking())
    solver = DeviceLoopSolver(
        bundle, width_heu=FixedWidth(16), batch=2,
        cache=ddo_tpu.SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
        slab_cap=128, chunk_steps=4, cut_cap=32,
    )
    completion = solver.maximize()
    assert completion.is_exact and -solver.best_value() == 29

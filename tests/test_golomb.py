"""Golomb ruler tests: known optimal ruler lengths
(/root/reference/ddo/examples/golomb/tests.rs)."""

import pytest

import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle
from ddo_tpu.models.golomb import Golomb, GolombRanking, GolombRelax

# solve_golomb(n) == known optimum length (tests.rs:66-88)
CASES = [(2, 1), (3, 3), (4, 6), (5, 11), (6, 17), (7, 25)]


@pytest.mark.parametrize("n,opt", CASES)
def test_golomb(n, opt):
    pb = Golomb(n)
    bundle = ModelBundle(pb, GolombRelax(pb), GolombRanking())
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(10), cache=ddo_tpu.SimpleCache(),
        cutset_type=ddo_tpu.FRONTIER,
    )
    completion = solver.maximize()
    assert completion.is_exact
    assert solver.best_value() == -opt  # maximization of negated length

    # verify the ruler: decisions are the mark positions
    vals, pset = solver.best_solution()
    marks = [0] + sorted(int(v) for v, s in zip(vals, pset) if s)
    assert len(marks) == n
    dists = [b - a for i, a in enumerate(marks) for b in marks[i + 1:]]
    assert len(set(dists)) == len(dists), "distances must be all different"
    assert max(marks) == opt


def test_reference_ci_width_config():
    """golomb/tests.rs runs NbUnassignedWidth(nb_variables); the engine
    must prove the same optima under that config."""
    from ddo_tpu import NbUnassignedWidth

    for n, opt in [(4, 6), (5, 11), (6, 17)]:
        pb = Golomb(n)
        bundle = ModelBundle(pb, GolombRelax(pb), GolombRanking())
        solver = ddo_tpu.SequentialSolver(
            bundle, width_heu=NbUnassignedWidth(pb.nb_variables), batch=4,
            cache=ddo_tpu.SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
        )
        completion = solver.maximize()
        assert completion.is_exact and solver.best_value() == -opt


def test_rub_is_known_optimum_table():
    """main.rs:174-177: rub = -known_optimal[n - #marks] — admissible
    because completing k more marks costs at least the optimal length of
    a k+1-mark ruler."""
    import jax
    import jax.numpy as jnp
    from ddo_tpu.models.golomb import KNOWN_OPTIMAL_COSTS

    pb = Golomb(6)
    relax = GolombRelax(pb)
    root = jax.tree_util.tree_map(jnp.asarray, pb.initial_state(pb.data))
    assert int(relax.rub(pb.data, root, 0)) == -int(KNOWN_OPTIMAL_COSTS[5])


def test_merge_is_sound_relaxation():
    """main.rs:146-171: merged marks/dists = intersections, counters =
    min — the merged state must admit every member's completions, so its
    solved value can only be >= each member's."""
    import jax
    import jax.numpy as jnp

    pb = Golomb(4)
    relax = GolombRelax(pb)
    s1 = {"marks": jnp.asarray([0b1011], jnp.uint32),
          "dists": jnp.asarray([0b0110], jnp.uint32),
          "m": jnp.asarray(3), "last": jnp.asarray(3)}
    s2 = {"marks": jnp.asarray([0b0011], jnp.uint32),
          "dists": jnp.asarray([0b0010], jnp.uint32),
          "m": jnp.asarray(2), "last": jnp.asarray(1)}
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), s1, s2
    )
    merged = relax.merge(pb.data, stacked, jnp.ones(2, bool))
    assert int(merged["marks"][0]) == 0b0011  # intersection
    assert int(merged["dists"][0]) == 0b0010
    assert int(merged["m"]) == 2 and int(merged["last"]) == 1


def test_device_loop_golomb6():
    from ddo_tpu import DeviceLoopSolver, NbUnassignedWidth

    pb = Golomb(6)
    bundle = ModelBundle(pb, GolombRelax(pb), GolombRanking())
    solver = DeviceLoopSolver(
        bundle, width_heu=NbUnassignedWidth(pb.nb_variables), batch=4,
        cache=ddo_tpu.SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
        slab_cap=256, chunk_steps=8, cut_cap=64,
    )
    completion = solver.maximize()
    assert completion.is_exact and solver.best_value() == -17

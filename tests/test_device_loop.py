"""DeviceLoopSolver equivalence: the device-resident multi-superstep
search must prove the same optima as the host-driven solver across model
families exercising every engine feature it touches (dynamic variable
order, long arcs, dominance, cache, both cutset types, spill/reseed).

Small slab/chunk parameters force the overflow machinery (slab-full
drain, cutset-overflow host replay, fringe reseed) through their paths.
"""

from ddo_tpu.utils.resources import resources_root as _res_root
import numpy as np
import pytest

import ddo_tpu
from ddo_tpu import (
    DeviceLoopSolver,
    FixedWidth,
    ModelBundle,
    NbUnassignedWidth,
    SequentialSolver,
    SimpleCache,
    SimpleDominanceChecker,
    TimeBudget,
)

R = _res_root()


def _kp_bundle(name="f1_l-d_kp_10_269"):
    from ddo_tpu.models.knapsack import KPRanking, KPRelax, read_instance

    pb = read_instance(f"{R}/knapsack/{name}")
    return pb, ModelBundle(pb, KPRelax(pb), KPRanking())


def test_knapsack_optimum_and_solution():
    pb, bundle = _kp_bundle()
    s = DeviceLoopSolver(
        bundle, width_heu=FixedWidth(2), batch=4, cache=SimpleCache(),
        cutset_type=ddo_tpu.FRONTIER, slab_cap=128, chunk_steps=6,
        cut_cap=32,
    )
    c = s.maximize()
    assert c.is_exact and s.best_value() == 295
    assert s.best_upper_bound() == 295
    vals, mask = s.best_solution()
    w = np.asarray(pb.data["weight"])
    p = np.asarray(pb.data["profit"])
    take = (vals == 1) & mask
    assert (p * take).sum() == 295
    assert (w * take).sum() <= 269


def test_knapsack_with_dominance():
    from ddo_tpu.models.knapsack import KPDominance

    pb, bundle = _kp_bundle("f2_l-d_kp_20_878")
    s = DeviceLoopSolver(
        bundle, width_heu=FixedWidth(2), batch=4, cache=SimpleCache(),
        dominance=SimpleDominanceChecker(KPDominance(), pb.nb_variables),
        slab_cap=128, chunk_steps=4, cut_cap=32,
    )
    c = s.maximize()
    assert c.is_exact and s.best_value() == 1024


def test_misp_dynamic_order_long_arcs():
    from ddo_tpu.models.misp import MispRanking, MispRelax, read_instance

    pb = read_instance(f"{R}/misp/MANN_a9.clq")
    bundle = ModelBundle(pb, MispRelax(pb), MispRanking(pb))
    s = DeviceLoopSolver(
        bundle, width_heu=FixedWidth(8), batch=4,
        cutset_type=ddo_tpu.LAST_EXACT_LAYER,
        slab_cap=256, chunk_steps=6, cut_cap=64,
    )
    c = s.maximize()
    assert c.is_exact and s.best_value() == 16


def test_golomb_nbunassigned_width():
    from ddo_tpu.models.golomb import Golomb, GolombRanking, GolombRelax

    pb = Golomb(6)
    bundle = ModelBundle(pb, GolombRelax(pb), GolombRanking())
    s = DeviceLoopSolver(
        bundle, width_heu=NbUnassignedWidth(pb.nb_variables), batch=4,
        cache=SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
        slab_cap=256, chunk_steps=8, cut_cap=64,
    )
    c = s.maximize()
    assert c.is_exact and s.best_value() == -17


def test_tiny_slab_forces_spill_and_reseed():
    """slab_cap=16 with cut_cap=8 forces slab-full drains, cutset-overflow
    host replays, and fringe reseeds on a search with hundreds of open
    nodes — the optimum must survive all of it."""
    pb, bundle = _kp_bundle()
    s = DeviceLoopSolver(
        bundle, width_heu=FixedWidth(2), batch=2, cache=SimpleCache(),
        cutset_type=ddo_tpu.FRONTIER, slab_cap=16, chunk_steps=4,
        cut_cap=8,
    )
    c = s.maximize()
    assert c.is_exact and s.best_value() == 295


def test_matches_host_solver_bounds():
    pb, bundle = _kp_bundle("f2_l-d_kp_20_878")
    host = SequentialSolver(
        bundle, width_heu=FixedWidth(4), batch=4, cache=SimpleCache()
    )
    dev = DeviceLoopSolver(
        bundle, width_heu=FixedWidth(4), batch=4, cache=SimpleCache(),
        slab_cap=128, chunk_steps=4, cut_cap=32,
    )
    ch = host.maximize()
    cd = dev.maximize()
    assert ch.is_exact and cd.is_exact
    assert host.best_value() == dev.best_value() == 1024
    assert host.best_upper_bound() == dev.best_upper_bound()


def test_cutoff_aborts_with_valid_bounds():
    pb, bundle = _kp_bundle()
    s = DeviceLoopSolver(
        bundle, width_heu=FixedWidth(2), batch=4, cache=SimpleCache(),
        cutoff=TimeBudget(0.0), slab_cap=128, chunk_steps=4, cut_cap=32,
    )
    c = s.maximize()
    assert not c.is_exact
    assert s.gap() == 1.0


def test_set_primal_closes_fast():
    pb, bundle = _kp_bundle()
    s = DeviceLoopSolver(
        bundle, width_heu=FixedWidth(2), batch=4, cache=SimpleCache(),
        slab_cap=128, chunk_steps=4, cut_cap=32,
    )
    s.set_primal(295, (np.zeros(pb.nb_variables, np.int32),
                       np.zeros(pb.nb_variables, bool)))
    c = s.maximize()
    assert c.is_exact and s.best_lower_bound() == 295


def test_width_static_descriptors():
    """Every reference-CI width heuristic must evaluate identically on
    host and device (width_static / _eval_width)."""
    import jax.numpy as jnp
    from ddo_tpu.core.types import SubProblem
    from ddo_tpu.search.device_loop import _eval_width, width_static
    from ddo_tpu.models.tsptw import TsptwWidth

    n = 10
    depth = jnp.asarray([0, 3, 7])
    pset = jnp.zeros((3, n), bool).at[1, :3].set(True).at[2, :7].set(True)

    def host(heu, d, nset):
        sub = SubProblem(state=None, value=0,
                         path_vals=np.zeros(n, np.int32),
                         path_set=np.arange(n) < nset, ub=0, depth=d)
        return heu.max_width(sub)

    for heu in [
        FixedWidth(5),
        NbUnassignedWidth(n),
        ddo_tpu.Times(3, NbUnassignedWidth(n)),
        ddo_tpu.DivBy(2, NbUnassignedWidth(n)),
        TsptwWidth(n, 2),
    ]:
        dev = np.asarray(_eval_width(width_static(heu), depth, pset))
        exp = [host(heu, d, s) for d, s in [(0, 0), (3, 3), (7, 7)]]
        assert dev.tolist() == exp, (type(heu).__name__, dev, exp)

"""Multi-device frontier parallelism on the virtual 8-device CPU mesh.

The TPU-native counterpart of the reference ParallelSolver tests
(parallel.rs:655-1338): lanes shard over a `jax.sharding.Mesh`, and the
solve must still prove the same optima as the sequential path.
"""

import jax
import numpy as np
import pytest

import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle, SimpleCache
from ddo_tpu.models.knapsack import KPRanking, KPRelax, read_instance
from ddo_tpu.parallel.mesh import MeshSolver, make_mesh


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_mesh_solver_proves_knapsack_optimum():
    pb = read_instance("/root/reference/resources/knapsack/f2_l-d_kp_20_878")
    bundle = ModelBundle(pb, KPRelax(pb), KPRanking())
    mesh = make_mesh()
    solver = MeshSolver(
        bundle, mesh=mesh, width_heu=FixedWidth(2), cache=SimpleCache()
    )
    completion = solver.maximize()
    assert completion.is_exact
    assert completion.best_value == 1024  # knapsack/tests.rs known optimum
    assert solver.best_upper_bound() == 1024
    vals, mask = solver.best_solution()
    assert int(np.sum(np.where(mask, vals, 0) * pb.profit)) == 1024


def test_mesh_solver_matches_sequential_on_random_instances():
    rng = np.random.default_rng(42)
    from ddo_tpu.models.knapsack import Knapsack

    for _ in range(2):
        n = 14
        profit = rng.integers(1, 50, n)
        weight = rng.integers(1, 30, n)
        pb = Knapsack(int(weight.sum() // 2), profit, weight)
        bundle = ModelBundle(pb, KPRelax(pb), KPRanking())

        seq = ddo_tpu.SequentialSolver(bundle, width_heu=FixedWidth(3))
        c_seq = seq.maximize()

        par = MeshSolver(bundle, mesh=make_mesh(), width_heu=FixedWidth(3))
        c_par = par.maximize()

        assert c_seq.is_exact and c_par.is_exact
        assert c_seq.best_value == c_par.best_value

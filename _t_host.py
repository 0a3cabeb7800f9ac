"""Time each host-side phase of the first few supersteps (LCS heavy)."""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np

import ddo_tpu
from ddo_tpu import ModelBundle, NbUnassignedWidth, SimpleCache, SimpleDominanceChecker
from ddo_tpu.search import solver as S

R = "/root/reference/resources"

from ddo_tpu.models.lcs import LcsDominance, LcsRanking, LcsRelax, read_instance

pb = read_instance(f"{R}/lcs/neg_12_3_1.txt")
bundle = ModelBundle(pb, LcsRelax(pb), LcsRanking())
solver = ddo_tpu.SequentialSolver(
    bundle, width_heu=NbUnassignedWidth(pb.nb_variables), batch=8,
    buffer_width=256, cache=SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
    dominance=SimpleDominanceChecker(LcsDominance(), pb.nb_variables),
)

for name in ("_maybe_update_best", "_apply_cache_updates", "_absorb_dominance",
             "_enqueue_cutset", "_filter_tables"):
    orig = getattr(solver, name)
    def wrap(orig=orig, name=name):
        def f(*a, **k):
            t0 = time.perf_counter()
            r = orig(*a, **k)
            dt = time.perf_counter() - t0
            if dt > 0.05:
                print(f"    {name}: {dt:.2f}s", flush=True)
            return r
        return f
    setattr(solver, name, wrap())

solver.cache.initialize(solver.problem)
solver.dominance.prime(solver.problem)
from ddo_tpu.core.types import root_subproblem
solver.fringe.push(root_subproblem(solver.problem))
solver.open_by_layer[0] += 1

for step in range(int(sys.argv[1]) if len(sys.argv) > 1 else 3):
    batch = solver._get_workload()
    if batch is None:
        print("done; lb =", solver.best_lb)
        break
    t0 = time.perf_counter()
    solver._process_batch(batch)
    print(f"superstep {step}: {time.perf_counter()-t0:.1f}s total "
          f"(restricted={solver.stats.restricted_s:.1f} relaxed={solver.stats.relaxed_s:.1f} "
          f"host={solver.stats.host_s:.1f} cum) lanes={len(batch)} "
          f"fringe={len(solver.fringe)} lb={solver.best_lb}", flush=True)

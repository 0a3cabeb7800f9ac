import os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import ddo_tpu
from ddo_tpu import (DeviceLoopSolver, FixedWidth, ModelBundle, NbUnassignedWidth,
                     SimpleCache, SimpleDominanceChecker, TimeBudget)
from ddo_tpu.models.alp import AlpDominance, AlpRanking, AlpRelax, read_instance

R = "/root/reference/resources"
inst = sys.argv[1]
wname = sys.argv[2] if len(sys.argv) > 2 else "nbu"
pb = read_instance(f"{R}/alp/{inst}")
bundle = ModelBundle(pb, AlpRelax(pb), AlpRanking())
w = NbUnassignedWidth(pb.nb_variables) if wname == "nbu" else FixedWidth(int(wname))
s = DeviceLoopSolver(bundle, width_heu=w, batch=8, cache=SimpleCache(),
                     cutset_type=ddo_tpu.FRONTIER,
                     dominance=SimpleDominanceChecker(AlpDominance(), pb.nb_variables),
                     slab_cap=8192, cut_cap=4096, chunk_steps=16,
                     cutoff=TimeBudget(float(os.environ.get("BUDGET", 200))))
t0 = time.perf_counter()
c = s.maximize()
print(f"{inst} w={wname}: {time.perf_counter()-t0:.1f}s value={s.best_value()} "
      f"exact={c.is_exact} ss={s.stats.supersteps} lb={s.best_lower_bound()} "
      f"ub={s.best_upper_bound()} events={s.loop_events}", flush=True)

"""LCS width sweep: wide relaxed/restricted DDs instead of deep search.

Usage: python _t_lcs_wide.py <W> <batch> <budget_s> [solver] [inst]
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import ddo_tpu
from ddo_tpu import (
    DeviceLoopSolver, FixedWidth, ModelBundle, SequentialSolver, SimpleCache,
    SimpleDominanceChecker, TimeBudget,
)
from ddo_tpu.models.lcs import LcsDominance, LcsRanking, LcsRelax, read_instance

R = os.environ.get("DDO_RESOURCES", "/root/reference/resources")
W = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
budget = float(sys.argv[3]) if len(sys.argv) > 3 else 300
kind = sys.argv[4] if len(sys.argv) > 4 else "host"
inst = sys.argv[5] if len(sys.argv) > 5 else "neg_12_3_1.txt"

pb = read_instance(f"{R}/lcs/{inst}")
bundle = ModelBundle(pb, LcsRelax(pb), LcsRanking())
kw = dict(
    width_heu=FixedWidth(W), batch=B, cache=SimpleCache(),
    cutset_type=ddo_tpu.FRONTIER,
    dominance=SimpleDominanceChecker(LcsDominance(), pb.nb_variables),
    cutoff=TimeBudget(budget),
)
if kind == "dev":
    s = DeviceLoopSolver(bundle, slab_cap=16384, cut_cap=8192, chunk_steps=8, **kw)
else:
    s = SequentialSolver(bundle, **kw)
t0 = time.perf_counter()
c = s.maximize()
dt = time.perf_counter() - t0
st = s.stats
print(
    f"lcs {inst} W={W} B={B} {kind}: {dt:.1f}s value={s.best_value()} "
    f"exact={c.is_exact} lb={s.best_lower_bound()} ub={s.best_upper_bound()} "
    f"supersteps={st.supersteps} explored={s.explored_count} "
    f"expanded={s.expanded_nodes} device={st.restricted_s + st.relaxed_s:.1f}s "
    f"host={st.host_s:.1f}s events={getattr(s, 'loop_events', None)}",
    flush=True,
)

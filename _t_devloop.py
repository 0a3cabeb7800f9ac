"""On-chip A/B: DeviceLoopSolver vs SequentialSolver on VERDICT gate rows.

Usage: python _t_devloop.py <row> [K] [chunk] [reps]
Rows: max2sat | golomb7 | golomb8 | lcs | alp
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import ddo_tpu
from ddo_tpu import (
    DeviceLoopSolver, FixedWidth, ModelBundle, NbUnassignedWidth,
    SequentialSolver, SimpleCache, SimpleDominanceChecker,
)

R = os.environ.get("DDO_RESOURCES", "/root/reference/resources")
row = sys.argv[1] if len(sys.argv) > 1 else "max2sat"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 16
reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

if row == "max2sat":
    from ddo_tpu.models.max2sat import Max2SatRanking, Max2SatRelax, read_instance
    pb = read_instance(f"{R}/max2sat/frb10-6-1.wcnf")
    bundle = ModelBundle(pb, Max2SatRelax(pb), Max2SatRanking())
    mk = lambda: DeviceLoopSolver(
        bundle, width_heu=FixedWidth(8), batch=K, cache=SimpleCache(),
        chunk_steps=chunk,
    )
    expect = 37037
elif row.startswith("golomb") and not row.endswith("nc"):
    from ddo_tpu.models.golomb import Golomb, GolombRanking, GolombRelax
    n = int(row[-1])
    pb = Golomb(n)
    bundle = ModelBundle(pb, GolombRelax(pb), GolombRanking())
    mk = lambda: DeviceLoopSolver(
        bundle, width_heu=NbUnassignedWidth(pb.nb_variables), batch=K,
        cache=SimpleCache(), cutset_type=ddo_tpu.FRONTIER, chunk_steps=chunk,
    )
    expect = {7: -25, 8: -34, 9: -44}[n]
elif row == "golomb7nc":
    from ddo_tpu.models.golomb import Golomb, GolombRanking, GolombRelax
    from ddo_tpu import EmptyCache
    pb = Golomb(7)
    bundle = ModelBundle(pb, GolombRelax(pb), GolombRanking())
    mk = lambda: DeviceLoopSolver(
        bundle, width_heu=NbUnassignedWidth(pb.nb_variables), batch=K,
        cache=EmptyCache(), cutset_type=ddo_tpu.FRONTIER, chunk_steps=chunk,
    )
    expect = -25
elif row == "lcs":
    from ddo_tpu.models.lcs import LcsDominance, LcsRanking, LcsRelax, read_instance
    from ddo_tpu import TimeBudget
    pb = read_instance(f"{R}/lcs/neg_12_3_1.txt")
    bundle = ModelBundle(pb, LcsRelax(pb), LcsRanking())
    budget = float(os.environ.get("LCS_BUDGET", "400"))
    mk = lambda: DeviceLoopSolver(
        bundle, width_heu=FixedWidth(100), batch=K, cache=SimpleCache(),
        cutset_type=ddo_tpu.FRONTIER, chunk_steps=chunk,
        dominance=SimpleDominanceChecker(LcsDominance(), pb.nb_variables),
        cutoff=TimeBudget(budget),
        slab_cap=8192, cut_cap=4096,
    )
    expect = None
elif row.startswith("alp"):
    from ddo_tpu.models.alp import AlpDominance, AlpRanking, AlpRelax, read_instance
    inst = "alp_n25_r1_c2_std10_s0" if row == "alp" else row
    pb = read_instance(f"{R}/alp/{inst}")
    bundle = ModelBundle(pb, AlpRelax(pb), AlpRanking())
    from ddo_tpu import TimeBudget
    _b = os.environ.get("BUDGET")
    mk = lambda: DeviceLoopSolver(
        bundle,
        width_heu=(FixedWidth(64) if os.environ.get("ALP_W") == "64"
                   else NbUnassignedWidth(pb.nb_variables)),
        batch=K, cache=SimpleCache(),
        cutset_type=ddo_tpu.FRONTIER,
        dominance=SimpleDominanceChecker(AlpDominance(), pb.nb_variables),
        chunk_steps=chunk, cutoff=TimeBudget(float(_b)) if _b else None,
        slab_cap=16384, cut_cap=8192,
    )
    expect = -755 if row == 'alp' else None
else:
    raise SystemExit(f"unknown row {row}")

for i in range(reps):
    s = mk()
    t0 = time.perf_counter()
    c = s.maximize()
    dt = time.perf_counter() - t0
    st = s.stats
    print(
        f"{row} K={K} chunk={chunk} rep{i}: {dt:.2f}s value={s.best_value()} "
        f"exact={c.is_exact} supersteps={st.supersteps} "
        f"explored={s.explored_count} expanded={s.expanded_nodes} "
        f"lb={s.best_lower_bound()} ub={s.best_upper_bound()} "
        f"device={st.restricted_s + st.relaxed_s:.2f}s host={st.host_s:.2f}s "
        f"events={getattr(s, 'loop_events', {})}",
        flush=True,
    )
    if expect is not None:
        assert s.best_value() == expect and c.is_exact, (s.best_value(), expect)
print("done")

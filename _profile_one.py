"""Profile one parity-heavy instance on the chip: SolverStats breakdown
(VERDICT r3 #5) under a time budget.  Usage:

    python _profile_one.py lcs neg_12_3_1.txt 120
    python _profile_one.py misp keller4.clq 120
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import ddo_tpu
from ddo_tpu import (
    FixedWidth, ModelBundle, NbUnassignedWidth, SimpleCache,
    SimpleDominanceChecker, TimeBudget,
)

R = "/root/reference/resources"


def build(fam, fname, budget):
    cutoff = TimeBudget(budget) if budget else None
    if fam == "lcs":
        from ddo_tpu.models.lcs import (
            LcsDominance, LcsRanking, LcsRelax, read_instance,
        )
        pb = read_instance(f"{R}/lcs/{fname}")
        bundle = ModelBundle(pb, LcsRelax(pb), LcsRanking())
        return ddo_tpu.SequentialSolver(
            bundle, width_heu=NbUnassignedWidth(pb.nb_variables), batch=8,
            buffer_width=int(sys.argv[4]) if len(sys.argv) > 4 else 256,
            cache=SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
            dominance=SimpleDominanceChecker(LcsDominance(), pb.nb_variables),
            cutoff=cutoff,
        )
    if fam == "misp":
        from ddo_tpu.models.misp import MispRanking, MispRelax, read_instance
        pb = read_instance(f"{R}/misp/{fname}")
        bundle = ModelBundle(pb, MispRelax(pb), MispRanking(pb))
        w = int(sys.argv[4]) if len(sys.argv) > 4 else 64
        return ddo_tpu.SequentialSolver(
            bundle, width_heu=FixedWidth(w), batch=8,
            cutset_type=ddo_tpu.LAST_EXACT_LAYER, cutoff=cutoff,
        )
    if fam == "golomb":
        from ddo_tpu.models.golomb import Golomb, GolombRanking, GolombRelax
        pb = Golomb(int(fname))
        bundle = ModelBundle(pb, GolombRelax(pb), GolombRanking())
        return ddo_tpu.SequentialSolver(
            bundle, width_heu=FixedWidth(int(sys.argv[4]) if len(sys.argv) > 4 else 10),
            batch=8, cache=SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
            cutoff=cutoff,
        )
    if fam == "sop":
        from ddo_tpu.models.sop import SopRanking, SopRelax, SopWidth, read_instance
        pb = read_instance(f"{R}/sop/{fname}")
        bundle = ModelBundle(pb, SopRelax(pb), SopRanking())
        return ddo_tpu.SequentialSolver(
            bundle, width_heu=SopWidth(pb.nb_variables, 1), batch=8,
            cache=SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
            buffer_width=max(64, pb.nb_jobs), cutoff=cutoff,
        )
    if fam == "talentsched":
        from ddo_tpu.models.talentsched import (
            TalentSchedRanking, TalentSchedRelax, read_instance,
        )
        pb = read_instance(f"{R}/talentsched/{fname}")
        bundle = ModelBundle(pb, TalentSchedRelax(pb), TalentSchedRanking())
        return ddo_tpu.SequentialSolver(
            bundle, width_heu=FixedWidth(int(sys.argv[4]) if len(sys.argv) > 4 else 100),
            batch=8, cache=SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
            cutoff=cutoff,
        )
    raise SystemExit(f"unknown family {fam}")


fam, fname = sys.argv[1], sys.argv[2]
budget = int(sys.argv[3]) if len(sys.argv) > 3 else 120
solver = build(fam, fname, budget)
t0 = time.perf_counter()
completion = solver.maximize()
dt = time.perf_counter() - t0
st = solver.stats
print(f"family={fam} inst={fname} budget={budget}s")
print(f"  time={dt:.1f}s exact={completion.is_exact} best={solver.best_value()} "
      f"lb={solver.best_lower_bound()} ub={solver.best_upper_bound()}")
print(f"  explored={solver.explored_count} expanded={solver.expanded_nodes} "
      f"supersteps={st.supersteps}")
print(f"  restricted_s={st.restricted_s:.1f} relaxed_s={st.relaxed_s:.1f} "
      f"host_s={st.host_s:.1f} total_s={st.total_s:.1f}")
if st.supersteps:
    print(f"  per-superstep: device={(st.restricted_s + st.relaxed_s) / st.supersteps * 1e3:.1f}ms "
          f"host={st.host_s / st.supersteps * 1e3:.1f}ms")
print(f"  fringe_len={len(solver.fringe)} first_active_layer={solver.first_active_layer}")

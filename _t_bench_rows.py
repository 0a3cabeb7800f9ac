"""Validate the three bench rows switched to DeviceLoopSolver in r5."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle, SimpleCache, SimpleDominanceChecker
from ddo_tpu.utils.resources import resources_root

R = resources_root()

def run(label, mk, expect):
    s = mk()
    t0 = time.perf_counter()
    c = s.maximize()
    dt = time.perf_counter() - t0
    ok = c.is_exact and s.best_value() == expect
    print(f"{label}: {dt:.2f}s value={s.best_value()} exact={c.is_exact} "
          f"{'OK' if ok else 'MISMATCH expect=' + str(expect)}", flush=True)
    assert ok

from ddo_tpu.models.max2sat import Max2SatRanking, Max2SatRelax, read_instance as m2s
m2 = m2s(f"{R}/max2sat/frb10-6-1.wcnf")
m2b = ModelBundle(m2, Max2SatRelax(m2), Max2SatRanking())
mk = lambda: ddo_tpu.DeviceLoopSolver(m2b, width_heu=FixedWidth(8), batch=8,
                                      cache=SimpleCache(), chunk_steps=16)
run("max2sat cold", mk, 37037); run("max2sat warm", mk, 37037)

from ddo_tpu.models.golomb import Golomb, GolombRanking, GolombRelax
go = Golomb(7)
gob = ModelBundle(go, GolombRelax(go), GolombRanking())
mk = lambda: ddo_tpu.DeviceLoopSolver(gob, width_heu=ddo_tpu.NbUnassignedWidth(go.nb_variables),
                                      batch=64, cache=SimpleCache(),
                                      cutset_type=ddo_tpu.FRONTIER, chunk_steps=32)
run("golomb7 cold", mk, -25); run("golomb7 warm", mk, -25)

from ddo_tpu.models.alp import AlpDominance, AlpRanking, AlpRelax, read_instance as alp
al = alp(f"{R}/alp/alp_n25_r1_c2_std10_s0")
alb = ModelBundle(al, AlpRelax(al), AlpRanking())
mk = lambda: ddo_tpu.DeviceLoopSolver(alb, width_heu=FixedWidth(64), batch=8,
                                      cache=SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
                                      dominance=SimpleDominanceChecker(AlpDominance(), al.nb_variables),
                                      chunk_steps=16)
run("alp cold", mk, -755); run("alp warm", mk, -755)
print("BENCH ROWS OK")

"""NativeSolver (C++ host runtime) vs DeviceLoopSolver on a
superstep-heavy row — the VERDICT r4 #4 comparison. CPU backend."""
import time
import jax
jax.config.update("jax_platforms", "cpu")
import ddo_tpu
from ddo_tpu import (DeviceLoopSolver, FixedWidth, ModelBundle, NativeSolver,
                     SequentialSolver, SimpleCache)
from ddo_tpu.models.knapsack import KPRanking, KPRelax, read_instance
from ddo_tpu.utils.resources import resources_root

pb = read_instance(f"{resources_root()}/knapsack/knapPI_1_500_1000_1")
bundle = ModelBundle(pb, KPRelax(pb), KPRanking())

def run(name, mk):
    s = mk()
    t0 = time.perf_counter()
    c = s.maximize()
    dt = time.perf_counter() - t0
    st = s.stats
    assert c.is_exact and s.best_value() == 28857, (name, s.best_value())
    print(f"{name}: {dt:.2f}s supersteps={st.supersteps} "
          f"device={st.restricted_s + st.relaxed_s:.2f}s host={st.host_s:.2f}s")
    return dt

for name, mk in [
    ("host SequentialSolver", lambda: SequentialSolver(
        bundle, width_heu=FixedWidth(2), batch=8, cache=SimpleCache())),
    ("NativeSolver (C++)", lambda: NativeSolver(
        bundle, width_heu=FixedWidth(2), batch=8, use_cache=True)),
    ("DeviceLoopSolver", lambda: DeviceLoopSolver(
        bundle, width_heu=FixedWidth(2), batch=8, cache=SimpleCache(),
        chunk_steps=16)),
]:
    run(name, mk)
    run(name + " (warm)", mk)

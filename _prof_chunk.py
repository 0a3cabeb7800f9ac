import os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
import ddo_tpu
from ddo_tpu import ModelBundle, NbUnassignedWidth, SimpleCache, DeviceLoopSolver
from ddo_tpu.core.types import CompilationType, root_subproblem
from ddo_tpu.engine.mdd import _compile_fused_vjit
from ddo_tpu.search.device_loop import _device_chunk
from ddo_tpu.models.golomb import Golomb, GolombRanking, GolombRelax

pb = Golomb(7)
bundle = ModelBundle(pb, GolombRelax(pb), GolombRanking())
s = DeviceLoopSolver(bundle, width_heu=NbUnassignedWidth(pb.nb_variables),
                     batch=8, cache=SimpleCache(), cutset_type=ddo_tpu.FRONTIER)
s.cache.initialize(pb)
root = root_subproblem(pb)
spec_r = s.compiler._specs[CompilationType.RESTRICTED]
spec_x = s.compiler._specs[CompilationType.RELAXED]
K = 8

# bare fused compile (host-path program)
subs = [root]*K
states = jax.tree_util.tree_map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *[x.state for x in subs])
values = jnp.zeros((K,), jnp.int32); depths = jnp.zeros((K,), jnp.int32)
ws = jnp.full((K,), 6, jnp.int32); psets = jnp.zeros((K, pb.nb_variables), bool)
actives = jnp.ones((K,), bool)

def bare():
    o = _compile_fused_vjit(spec_r, spec_x, bundle.datas, states, values, depths,
                            -10**9, ws, psets, actives)
    jax.block_until_ready(o[1]); return o
bare()
t0=time.perf_counter()
for _ in range(20): bare()
print(f"bare fused compile: {(time.perf_counter()-t0)/20*1e3:.1f} ms/superstep")

# chunk with max_steps = 1 and 16
slab = s._empty_slab(root.state)
slab = s._seed_slab(slab, [root])
best = dict(lb=jnp.asarray(-10**9+1, jnp.int32), vals=jnp.zeros((pb.nb_variables,), jnp.int32),
            set=jnp.zeros((pb.nb_variables,), bool), has=jnp.asarray(False))
ct, dt_ = s._filter_tables()
for ms in (1, 4, 16):
    def chunk():
        r = _device_chunk(spec_r, spec_x, bundle.datas, slab, best,
                          jnp.asarray(ms, jnp.int32), ct, dt_,
                          wdesc=s._wdesc, start_layer=0, Pcut=s.cut_cap)
        jax.block_until_ready(r[4]["steps"]); return r
    chunk()
    t0=time.perf_counter()
    for _ in range(10): chunk()
    dt = (time.perf_counter()-t0)/10
    print(f"chunk max_steps={ms}: {dt*1e3:.1f} ms total")

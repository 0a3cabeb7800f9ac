import json, time, sys
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from ddo_tpu import ModelBundle
from ddo_tpu.core.types import CompilationType, CutsetType, root_subproblem
from ddo_tpu.engine.mdd import DDCompiler, _compile_vjit
from ddo_tpu.models.knapsack import KPRanking, KPRelax, read_instance

pb = read_instance("/root/reference/resources/knapsack/knapPI_1_2000_1000_1")
bundle = ModelBundle(pb, KPRelax(pb), KPRanking())

def rate(K, W):
    compiler = DDCompiler(bundle, W, CutsetType.LAST_EXACT_LAYER)
    spec = compiler._specs[CompilationType.RELAXED]
    root = root_subproblem(pb)
    subs = [root]*K
    states = jax.tree_util.tree_map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *[s.state for s in subs])
    values = jnp.asarray([s.value for s in subs], jnp.int32)
    depths = jnp.asarray([s.depth for s in subs], jnp.int32)
    ws = jnp.asarray([W]*K, jnp.int32)
    psets = jnp.asarray(np.stack([s.path_set for s in subs]))
    def run():
        out = _compile_vjit(spec, bundle.datas, states, values, depths, -(10**9), ws, psets)
        jax.block_until_ready(out["expanded"])
        return out
    try:
        run()
        t0=time.perf_counter()
        reps=3
        for _ in range(reps): out=run()
        dt=(time.perf_counter()-t0)/reps
        expanded=int(np.sum(np.asarray(out["expanded"])))
        print(f"K={K} W={W}: {expanded/dt/1e6:.1f}M exp/s ({dt*1e3:.0f}ms, {expanded} nodes)", flush=True)
    except Exception as e:
        print(f"K={K} W={W}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)

for K,W in [(64,256),(128,256),(256,128)]:
    rate(K,W)

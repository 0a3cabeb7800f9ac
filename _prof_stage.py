import os, time, sys
os.environ.setdefault("DDO_DEBUG", "1")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
import ddo_tpu
from ddo_tpu import ModelBundle
from ddo_tpu.core.types import CompilationType, root_subproblem
from ddo_tpu.models.golomb import Golomb, GolombRanking, GolombRelax

stage = sys.argv[1] if len(sys.argv) > 1 else ""
if stage.startswith("A:"):
    os.environ["DD_ABLATE"] = stage[2:]
elif stage:
    os.environ["DD_STAGE"] = stage

from ddo_tpu.engine.mdd import DDCompiler, compile_kernel
import functools
@functools.partial(jax.jit, static_argnums=(0,))
def _vjit(spec, datas, rs, rv, rd, lb, ew, ps):
    return jax.vmap(lambda s, v, d, w, p: compile_kernel(spec, datas, s, v, d, lb, w, p))(rs, rv, rd, ew, ps)

import os as _os
if _os.environ.get("FAM") == "kp":
    from ddo_tpu.models.knapsack import KPRanking, KPRelax, read_instance as kpr
    pb = kpr("/root/reference/resources/knapsack/f1_l-d_kp_10_269")
    bundle = ModelBundle(pb, KPRelax(pb), KPRanking())
else:
    pb = Golomb(7)
    bundle = ModelBundle(pb, GolombRelax(pb), GolombRanking())
compiler = DDCompiler(bundle, 32, ddo_tpu.CutsetType.FRONTIER)
spec = compiler._specs[CompilationType.RELAXED]
root = root_subproblem(pb)
K = 8
subs = [root]*K
states = jax.tree_util.tree_map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *[x.state for x in subs])
values = jnp.zeros((K,), jnp.int32); depths = jnp.zeros((K,), jnp.int32)
ws = jnp.full((K,), 6, jnp.int32); psets = jnp.zeros((K, pb.nb_variables), bool)
actives = jnp.ones((K,), bool)

def run():
    o = _vjit(spec, bundle.datas, states, values, depths, -10**9, ws, psets)
    jax.block_until_ready(o["expanded"]); return o
run()
best = 1e9
for _ in range(3):
    t0=time.perf_counter()
    for _ in range(10): run()
    best = min(best, (time.perf_counter()-t0)/10)
print(f"stage={stage or 'full'}: {best*1e3:.1f} ms/dispatch")

"""Split compile-time vs steady-state chunk time for one family/shape."""
import sys
import time

import jax

if "--nocache" not in sys.argv:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

import ddo_tpu
from ddo_tpu import ModelBundle
from ddo_tpu.core.types import CompilationType, CutsetType, root_subproblem
from ddo_tpu.engine.mdd import DDCompiler, _compile_vjit

R = "/root/reference/resources"

fam = sys.argv[1]
if fam == "lcs":
    from ddo_tpu.models.lcs import LcsDominance, LcsRanking, LcsRelax, read_instance
    pb = read_instance(f"{R}/lcs/neg_12_3_1.txt")
    bundle = ModelBundle(pb, LcsRelax(pb), LcsRanking())
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 256
elif fam == "misp":
    from ddo_tpu.models.misp import MispRanking, MispRelax, read_instance
    pb = read_instance(f"{R}/misp/keller4.clq")
    bundle = ModelBundle(pb, MispRelax(pb), MispRanking(pb))
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 64

K = 8
compiler = DDCompiler(bundle, W, CutsetType.FRONTIER)
root = root_subproblem(pb)
subs = [root] * K
states = jax.tree_util.tree_map(
    lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *[s.state for s in subs])
values = jnp.asarray([s.value for s in subs], jnp.int32)
depths = jnp.asarray([s.depth for s in subs], jnp.int32)
ws = jnp.asarray([W] * K, jnp.int32)
psets = jnp.asarray(np.stack([s.path_set for s in subs]))
actives = jnp.ones((K,), bool)

for ct in (CompilationType.RESTRICTED, CompilationType.RELAXED):
    spec = compiler._specs[ct]
    t0 = time.perf_counter()
    lowered = jax.jit(_compile_vjit, static_argnums=(0,)).lower(
        spec, bundle.datas, states, values, depths, -(10**9), ws, psets, actives)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    out = compiled(bundle.datas, states, values, depths, -(10**9), ws, psets, actives)
    jax.block_until_ready(out[0]["expanded"])
    t3 = time.perf_counter()
    ts = []
    for _ in range(3):
        ta = time.perf_counter()
        out = compiled(bundle.datas, states, values, depths, -(10**9), ws, psets, actives)
        jax.block_until_ready(out[0]["expanded"])
        ts.append(time.perf_counter() - ta)
    print(f"{fam} {ct.name} W={W}: trace={t1-t0:.1f}s compile={t2-t1:.1f}s "
          f"first_run={t3-t2:.2f}s steady={min(ts):.2f}s", flush=True)

"""Kernel-rate ablation profile (DD_ABLATE bisection) for one family.

Usage: python _prof_kernel.py misp [ablate1,ablate2 ...]
Prints exp/s for the plain kernel and each ablation stage cumulative.
"""
import os
import sys
import time

os.environ.setdefault("DDO_DEBUG", "1")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np
import jax.numpy as jnp

from ddo_tpu.core.types import CompilationType, root_subproblem
from ddo_tpu import ModelBundle, LAST_EXACT_LAYER, FRONTIER

R = os.environ.get("DDO_RESOURCES", "/root/reference/resources")
FAM = sys.argv[1] if len(sys.argv) > 1 else "misp"
ABLATES = sys.argv[2].split("+") if len(sys.argv) > 2 else [""]

if FAM == "misp":
    from ddo_tpu.models.misp import MispRanking, MispRelax, read_instance
    pb = read_instance(f"{R}/misp/keller4.clq")
    bundle = ModelBundle(pb, MispRelax(pb), MispRanking(pb))
    K, W, cutset = 64, 128, LAST_EXACT_LAYER
elif FAM == "tsptw":
    from ddo_tpu.models.tsptw import TsptwRanking, TsptwRelax, read_instance
    pb = read_instance(f"{R}/tsptw/SolomonPotvinBengio/rc_201.1.txt")
    bundle = ModelBundle(pb, TsptwRelax(pb), TsptwRanking())
    K, W, cutset = 64, 128, FRONTIER
elif FAM == "knapsack":
    from ddo_tpu.models.knapsack import KPRanking, KPRelax, read_instance
    pb = read_instance(f"{R}/knapsack/knapPI_1_2000_1000_1")
    bundle = ModelBundle(pb, KPRelax(pb), KPRanking())
    K, W, cutset = 128, 256, LAST_EXACT_LAYER
else:
    raise SystemExit(f"unknown family {FAM}")


def rate(ablate, reps=5):
    os.environ["DD_ABLATE"] = ablate
    import importlib
    import ddo_tpu.engine.mdd as mdd
    from ddo_tpu.engine.mdd import DDCompiler, _compile_vjit

    compiler = DDCompiler(bundle, W, cutset)
    spec = compiler._specs[CompilationType.RELAXED]
    root = root_subproblem(bundle.problem)
    subs = [root] * K
    states = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *[s.state for s in subs]
    )
    values = jnp.asarray([s.value for s in subs], jnp.int32)
    depths = jnp.asarray([s.depth for s in subs], jnp.int32)
    ws = jnp.asarray([W] * K, jnp.int32)
    psets = jnp.asarray(np.stack([s.path_set for s in subs]))
    actives = jnp.ones((K,), bool)

    def run():
        out, _, _ = _compile_vjit(
            spec, bundle.datas, states, values, depths, -(10**9), ws, psets,
            actives,
        )
        jax.block_until_ready(out["expanded"])
        return out

    t0 = time.perf_counter()
    out = run()
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run()
        best = min(best, (time.perf_counter() - t0) / reps)
    expanded = int(np.sum(np.asarray(out["expanded"])))
    r = expanded / best
    print(f"{FAM} ablate={ablate!r:24s} rate={r:>14,.0f} exp/s  "
          f"({expanded} exp / {best*1e3:.1f} ms)  [1st-run {compile_s:.1f}s]",
          flush=True)
    jax.clear_caches()
    return r


for a in ABLATES:
    rate(a)

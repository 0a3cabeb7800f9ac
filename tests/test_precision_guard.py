"""MXU-precision regression guard (VERDICT r3 #6).

The engine and the models perform integer-exact gathers and table lookups
as one-hot f32 contractions on the MXU (ops/segments.py, models/lcs.py).
The MXU's DEFAULT precision is a single bf16 pass: an UNPINNED
matrix-matrix `dot_general` over integer-valued f32 data rounds values
above 2^8 and silently corrupts the solve — the round-3 LCS wrong-answer
class (answers 4x too large, PARITY_RESULTS_r3) was exactly this, caught
only because the final objective was absurd.

This guard turns the class into a CI failure: it traces the FULL engine
compile kernel (forward scan + finalization, which inlines every model
hook and every ops/segments helper) for one small instance of every
problem family and asserts that EVERY `dot_general` — including those
inside nested jaxprs (scan bodies, cond branches, pallas_call kernels) —
carries a pinned precision.  The whole framework is integer-only, so
there is no legitimate default-precision matmul anywhere in a compiled
kernel; any new unpinned contraction is a bug by construction.

Mutation-checked (as VERDICT r3 #6 prescribes): dropping the
`precision="float32"` from `ops/segments.onehot_take_i32` or from
`models/lcs.Lcs.step` makes `test_no_unpinned_dot_general[knapsack]` /
`[lcs]` fail with the offending primitive reported.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddo_tpu.core.types import CompilationType, root_subproblem
from ddo_tpu.engine.mdd import DDSpec, compile_kernel
from ddo_tpu import FRONTIER, ModelBundle
from ddo_tpu.utils.num import NEG_INF


def _bundle(family):
    """One tiny instance per family (shapes only matter for tracing)."""
    rng = np.random.default_rng(0)
    if family == "knapsack":
        from ddo_tpu.models.knapsack import KPDominance, KPRanking, KPRelax, Knapsack

        pb = Knapsack(30, rng.integers(1, 50, 6), rng.integers(1, 20, 6))
        return ModelBundle(pb, KPRelax(pb), KPRanking()), KPDominance()
    if family == "misp":
        from ddo_tpu.models.misp import Misp, MispRanking, MispRelax

        pb = Misp(5, [(0, 1), (1, 2), (2, 3), (3, 4)])
        return ModelBundle(pb, MispRelax(pb), MispRanking(pb)), None
    if family == "max2sat":
        from ddo_tpu.models.max2sat import Max2Sat, Max2SatRanking, Max2SatRelax

        pb = Max2Sat(4, {(1, 2): 3, (-1, 3): 2, (2, -4): 1})
        return ModelBundle(pb, Max2SatRelax(pb), Max2SatRanking()), None
    if family == "mcp":
        from ddo_tpu.models.mcp import Mcp, McpRanking, McpRelax

        pb = Mcp(4, [(0, 1, 3), (1, 2, -2), (2, 3, 5)])
        return ModelBundle(pb, McpRelax(pb), McpRanking()), None
    if family == "tsptw":
        from ddo_tpu.models.tsptw import Tsptw, TsptwDominance, TsptwRanking, TsptwRelax

        n = 5
        xy = rng.uniform(0, 50, (n, 2))
        dist = np.sqrt(((xy[:, None] - xy[None, :]) ** 2).sum(-1)).astype(np.int64)
        twe = rng.integers(0, 100, n)
        twl = twe + 200
        twe[0], twl[0] = 0, 10**6
        pb = Tsptw(dist, twe, twl)
        return ModelBundle(pb, TsptwRelax(pb), TsptwRanking()), TsptwDominance()
    if family == "sop":
        from ddo_tpu.models.sop import Sop, SopRanking, SopRelax

        n = 5
        dist = rng.integers(1, 50, (n, n)).astype(np.int64)
        np.fill_diagonal(dist, 0)
        dist[:, 0] = -1
        dist[0, 0] = 0
        dist[n - 1, : n - 1] = -1
        pb = Sop(dist)
        return ModelBundle(pb, SopRelax(pb), SopRanking()), None
    if family == "srflp":
        from ddo_tpu.models.srflp import Srflp, SrflpRanking, SrflpRelax

        n = 5
        flows = rng.integers(0, 8, (n, n))
        flows = (flows + flows.T)
        np.fill_diagonal(flows, 0)
        pb = Srflp(rng.integers(1, 10, n).tolist(), flows.tolist())
        return ModelBundle(pb, SrflpRelax(pb), SrflpRanking()), None
    if family == "alp":
        from ddo_tpu.models.alp import Alp, AlpDominance, AlpRanking, AlpRelax

        n, C, R = 5, 2, 2
        target = np.sort(rng.integers(0, 60, n))
        pb = Alp(C, R, target, target + 100, rng.integers(0, C, n),
                 rng.integers(1, 10, (C, C)))
        return ModelBundle(pb, AlpRelax(pb), AlpRanking()), AlpDominance()
    if family == "lcs":
        from ddo_tpu.models.lcs import Lcs, LcsDominance, LcsRanking, LcsRelax

        strings = [rng.integers(0, 3, 8).tolist(), rng.integers(0, 3, 7).tolist()]
        pb = Lcs(strings, 3)
        return ModelBundle(pb, LcsRelax(pb), LcsRanking()), LcsDominance()
    if family == "psp":
        from ddo_tpu.models.psp import Psp, PspRanking, PspRelax

        H, I = 6, 2
        stocking = rng.integers(1, 10, I)
        changeover = rng.integers(0, 20, (I, I))
        np.fill_diagonal(changeover, 0)
        demands = (rng.random((I, H)) < 0.4).astype(np.int64)
        pb = Psp(H, stocking, changeover, demands)
        return ModelBundle(pb, PspRelax(pb), PspRanking()), None
    if family == "talentsched":
        from ddo_tpu.models.talentsched import TalentSched, TalentSchedRanking, TalentSchedRelax

        n, m = 5, 3
        actors = (rng.random((m, n)) < 0.5).astype(np.int64)
        actors[:, 0] = 1
        pb = TalentSched(n, m, rng.integers(1, 10, m), rng.integers(1, 5, n),
                         actors)
        return ModelBundle(pb, TalentSchedRelax(pb), TalentSchedRanking()), None
    if family == "golomb":
        from ddo_tpu.models.golomb import Golomb, GolombRanking, GolombRelax

        pb = Golomb(4)
        return ModelBundle(pb, GolombRelax(pb), GolombRanking()), None
    raise ValueError(family)


FAMILIES = [
    "knapsack", "misp", "max2sat", "mcp", "tsptw", "sop", "srflp",
    "alp", "lcs", "psp", "talentsched", "golomb",
]


def _walk_eqns(jaxpr, visit):
    """Depth-first over every eqn incl. nested jaxprs in params (scan
    bodies, cond branches, pjit calls, pallas_call kernels, ...)."""
    for eqn in jaxpr.eqns:
        visit(eqn)
        for v in eqn.params.values():
            for sub in jax.tree_util.tree_leaves(
                v, is_leaf=lambda x: isinstance(x, (jax.extend.core.Jaxpr,
                                                   jax.extend.core.ClosedJaxpr))
            ):
                if isinstance(sub, jax.extend.core.ClosedJaxpr):
                    _walk_eqns(sub.jaxpr, visit)
                elif isinstance(sub, jax.extend.core.Jaxpr):
                    _walk_eqns(sub, visit)


def _unpinned_dots(jaxpr):
    bad = []

    def visit(eqn):
        if eqn.primitive.name != "dot_general":
            return
        prec = eqn.params.get("precision")
        if prec is None or prec == jax.lax.Precision.DEFAULT:
            bad.append(str(eqn))

    _walk_eqns(jaxpr, visit)
    return bad


@pytest.mark.parametrize("family", FAMILIES)
def test_no_unpinned_dot_general(family):
    bundle, dom = _bundle(family)
    spec = DDSpec(bundle, 8, CompilationType.RELAXED, FRONTIER, dom)
    root = root_subproblem(bundle.problem)
    state = jax.tree_util.tree_map(jnp.asarray, root.state)

    def run():
        return compile_kernel(
            spec, bundle.datas, state, root.value, root.depth,
            NEG_INF, 4, jnp.asarray(root.path_set),
        )

    jaxpr = jax.make_jaxpr(run)()
    bad = _unpinned_dots(jaxpr.jaxpr)
    assert not bad, (
        f"{len(bad)} dot_general(s) without pinned precision in the "
        f"{family} compile kernel — integer-valued f32 contractions at MXU "
        f"default (single bf16 pass) silently round; pin "
        f"precision='float32'/HIGHEST.  First offender:\n{bad[0][:500]}"
    )

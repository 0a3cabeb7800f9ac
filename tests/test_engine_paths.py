"""Equivalence guards for the round-3 engine paths.

Two structural forks were added for performance and must never drift
semantically:
  * `compile_fused` (one restricted+relaxed XLA program) vs the two-pass
    `compile_batch` route (used under cutoff chunking);
  * the small-C direct one-hot candidate-order maps vs the big-C
    broadcast-scan + payload-scatter route (static branch on
    `seg_ops._ONEHOT_ELEMS` in `_forward_setup`).
"""

import numpy as np
import pytest

import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle, SimpleCache, SimpleDominanceChecker
from ddo_tpu.core.types import CompilationType, root_subproblem
from ddo_tpu.engine.mdd import DDCompiler
from ddo_tpu.ops import segments as seg_ops
from ddo_tpu.utils.num import NEG_INF


def _bundle(n=10, seed=3):
    from ddo_tpu.models.knapsack import Knapsack, KPRanking, KPRelax

    rng = np.random.default_rng(seed)
    profit = rng.integers(1, 60, n)
    weight = rng.integers(1, 25, n)
    pb = Knapsack(int(weight.sum() // 2), profit, weight)
    return pb, ModelBundle(pb, KPRelax(pb), KPRanking())


def test_fused_matches_two_pass_solver():
    """Same proved optimum whether the superstep is fused or two-pass
    (the two-pass route refreshes filter tables mid-superstep, so only
    the RESULT is asserted, not the trajectory)."""
    from ddo_tpu.core.heuristics import TimeBudget

    pb, bundle = _bundle(n=12, seed=7)
    fused = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(3), batch=4, cache=SimpleCache(),
    )
    c1 = fused.maximize()
    # a generous TimeBudget + small compile_chunk forces the chunked
    # (two-pass) route without ever firing
    twop = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(3), batch=4, cache=SimpleCache(),
        cutoff=TimeBudget(3600), compile_chunk=4,
    )
    c2 = twop.maximize()
    assert c1.is_exact and c2.is_exact
    assert fused.best_value() == twop.best_value()


def test_fused_batches_expose_both_passes():
    pb, bundle = _bundle(n=8, seed=11)
    compiler = DDCompiler(bundle, 8, ddo_tpu.FRONTIER)
    root = root_subproblem(pb)
    restricted, relaxed = compiler.compile_fused(
        [root, root], NEG_INF, [2, 2]
    )
    assert len(restricted) == 2 and len(relaxed) == 2
    # the relaxed pass prunes against the restricted pass's in-graph
    # incumbent, so when the restricted DD already holds the optimum the
    # relaxed diagram may legitimately come out empty (the solver only
    # reads relaxed lanes whose restricted DD was inexact)
    rx = relaxed[0].best_value()
    assert rx is None or rx >= restricted[0].best_value()
    assert restricted.total_expanded > 0 and relaxed.total_expanded > 0


def test_small_and_big_c_paths_agree():
    """Force the big-C broadcast route on a small instance (by shrinking
    the one-hot cap) and compare every consumed plane against the
    small-C direct-map route."""
    import jax

    pb, bundle = _bundle(n=9, seed=5)
    root = root_subproblem(pb)

    def compile_planes():
        compiler = DDCompiler(bundle, 8, ddo_tpu.FRONTIER)
        dd = compiler.compile(CompilationType.RELAXED, root, NEG_INF, 3)
        return {
            k: np.asarray(dd.o[k])
            for k in ("value", "mask", "exact", "theta", "cutflag",
                      "expanded", "best_value", "bx_value")
        }

    base = compile_planes()
    old = seg_ops._ONEHOT_ELEMS
    try:
        seg_ops._ONEHOT_ELEMS = 1  # every adaptive op takes the big path
        jax.clear_caches()  # same DDSpec would otherwise reuse the trace
        alt = compile_planes()
    finally:
        seg_ops._ONEHOT_ELEMS = old
        jax.clear_caches()
    for k in base:
        np.testing.assert_array_equal(base[k], alt[k], err_msg=k)


def test_lane_padding_preserves_results():
    """pad_to must not change any real lane's outputs (padded lanes are
    masked out of the reductions)."""
    pb, bundle = _bundle(n=8, seed=2)
    compiler = DDCompiler(bundle, 8, ddo_tpu.FRONTIER)
    root = root_subproblem(pb)
    a = compiler.compile_batch(CompilationType.RELAXED, [root], NEG_INF, [2])
    b = compiler.compile_batch(
        CompilationType.RELAXED, [root, root, root], NEG_INF, [2, 2, 2],
        pad_to=8,
    )
    assert len(b) == 3
    assert a[0].best_value() == b[0].best_value() == b[2].best_value()
    assert b.total_expanded == 3 * a.total_expanded
    assert a.global_best == b.global_best


def test_start_layer_skip_equivalence():
    """The depth-bucketed forward-scan skip (`start_layer`) must produce
    bit-identical planes to the full scan for a deep-rooted subproblem:
    the skipped leading layers are empty by construction, and the in-jit
    neutral padding must reconstruct exactly what the full scan wrote."""
    import jax

    from ddo_tpu.core.types import SubProblem
    from ddo_tpu.engine.mdd import _compile_vjit, _depth_bucket

    pb, bundle = _bundle(n=12, seed=11)
    compiler = DDCompiler(bundle, 8, ddo_tpu.FRONTIER)
    spec = compiler._specs[CompilationType.RELAXED]
    root = root_subproblem(pb)
    # a subproblem rooted deep (depth 7 of 12): path fixes vars 0..6
    import numpy as np_
    vals = np_.zeros(pb.nb_variables, np_.int32)
    pset = np_.zeros(pb.nb_variables, bool)
    pset[:7] = True
    deep = SubProblem(state=root.state, value=5, path_vals=vals,
                      path_set=pset, ub=10**9, depth=7)

    def planes(i0):
        out, gb, te = _compile_vjit(
            spec, bundle.datas,
            jax.tree_util.tree_map(lambda a: np_.asarray(a)[None], deep.state),
            np_.asarray([deep.value], np_.int32),
            np_.asarray([deep.depth], np_.int32),
            NEG_INF,
            np_.asarray([4], np_.int32),
            np_.asarray(deep.path_set)[None],
            np_.ones(1, bool),
            start_layer=i0,
        )
        return {k: np_.asarray(v) for k, v in out.items()
                if not isinstance(v, dict)}, int(te)

    bucket = _depth_bucket(pb.nb_variables, deep.depth)
    assert bucket > 0  # the test must actually exercise the skip
    full, te_full = planes(0)
    skip, te_skip = planes(bucket)
    assert te_full == te_skip
    for k in full:
        np.testing.assert_array_equal(full[k], skip[k], err_msg=k)

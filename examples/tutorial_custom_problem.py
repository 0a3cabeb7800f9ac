"""Tutorial: defining your own problem for ddo_tpu.

This is the counterpart of the reference's teaching material
(/root/reference/seminar/, a knapsack notebook): a complete, commented
walk-through of modelling a new problem — **weighted interval scheduling**
(pick non-overlapping jobs maximizing total profit) — and solving it to
proved optimality.

Run:  python examples/tutorial_custom_problem.py

The contract (ddo_tpu/core/problem.py, mirroring the reference traits in
ddo/src/abstraction/dp.rs) asks for three things:

  1. a `Problem`:   the DP formulation — state pytree, transition `step`,
                    branching order;
  2. a `Relaxation`: how to *merge* several states into one that
                    over-approximates them all (this is what makes relaxed
                    DDs produce upper bounds), plus an optional fast upper
                    bound (RUB) used for pruning;
  3. a `StateRanking`: which states look promising (kept during
                    restriction, spared from merging during relaxation).

Everything the engine calls is a pure JAX function on fixed-shape arrays:
the engine `vmap`s your `step` over a whole [width, domain] layer at once,
so a state must be a pytree of scalars/arrays, never a Python object.
"""

import numpy as np
import jax.numpy as jnp

import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle, Problem, Relaxation, StateRanking


# ---------------------------------------------------------------------------
# 1. The DP model
# ---------------------------------------------------------------------------
class IntervalScheduling(Problem):
    """Jobs i have [start_i, end_i) and profit_i; keep a non-overlapping
    subset of maximum profit.

    DP: process jobs by increasing start time; the state is the earliest
    time the machine is free.  Decision 1 takes the job (valid iff it
    starts after the machine is free), 0 skips it.
    """

    name = "interval"
    domain_size = 2  # {skip, take}

    def __init__(self, start, end, profit):
        order = np.argsort(start, kind="stable")
        self.start = np.asarray(start)[order].astype(np.int32)
        self.end = np.asarray(end)[order].astype(np.int32)
        self.profit = np.asarray(profit)[order].astype(np.int32)
        self.nb_variables = len(self.start)
        # suffix sums of profit: RUB data (computed once, lives in `data`)
        self.suffix = np.concatenate(
            [np.cumsum(self.profit[::-1])[::-1], [0]]
        ).astype(np.int32)

    @property
    def data(self):
        # everything hooks need, as traced arrays (never bake instance data
        # into the jitted program as Python constants)
        return dict(
            start=jnp.asarray(self.start),
            end=jnp.asarray(self.end),
            profit=jnp.asarray(self.profit),
            suffix=jnp.asarray(self.suffix),
        )

    def initial_state(self, data):
        return dict(free=jnp.asarray(0, jnp.int32))

    def step(self, data, state, var, d, depth):
        """Expand domain slot d of variable `var` for one state.

        Returns (next_state, transition_cost, decision_value, valid).
        The engine vmaps this over the whole layer and domain at once.
        """
        take = d == 1
        can_take = state["free"] <= data["start"][var]
        next_free = jnp.where(take, data["end"][var], state["free"])
        cost = jnp.where(take, data["profit"][var], 0)
        valid = jnp.where(take, can_take, True)
        return dict(free=next_free.astype(jnp.int32)), cost, d, valid

    # static branching order: job 0, 1, 2, ... (by start time).
    # Return None from var_order and implement next_variable(...) instead
    # for data-dependent orders (see models/misp.py).

    def pack(self, state):
        # canonical int32 key for duplicate detection; the default would
        # work too — shown here for completeness
        return jnp.stack([state["free"]])


# ---------------------------------------------------------------------------
# 2. The relaxation
# ---------------------------------------------------------------------------
class IntervalRelax(Relaxation):
    """Merging states = taking the *earliest* free time.

    The merged state can do anything any merged-away state could (a machine
    free earlier accepts a superset of the remaining jobs), so the relaxed
    DD's best value upper-bounds the true optimum — the admissibility
    requirement of Relaxation::merge (dp.rs:84-92).
    """

    def __init__(self, pb):
        self.suffix = jnp.asarray(pb.suffix)

    @property
    def data(self):
        # each hook family gets its OWN data pytree: Problem.step sees
        # Problem.data, Relaxation.merge/rub see Relaxation.data
        return dict(suffix=self.suffix)

    def merge(self, data, states, mask):
        free = jnp.where(mask, states["free"], jnp.iinfo(jnp.int32).max)
        return dict(free=jnp.min(free).astype(jnp.int32))

    def rub(self, data, state, depth):
        # can never gain more than every remaining profit
        return data["suffix"][depth]


# ---------------------------------------------------------------------------
# 3. The ranking
# ---------------------------------------------------------------------------
class IntervalRanking(StateRanking):
    """Greater is better: a machine free earlier is more promising."""

    def score(self, data, state):
        return -state["free"]


# ---------------------------------------------------------------------------
# Solve + verify
# ---------------------------------------------------------------------------
def brute_force(start, end, profit):
    n = len(start)
    best = 0
    for m in range(1 << n):
        sel = [i for i in range(n) if m >> i & 1]
        ok = all(
            end[a] <= start[b] or end[b] <= start[a]
            for i, a in enumerate(sel)
            for b in sel[i + 1:]
        )
        if ok:
            best = max(best, sum(profit[i] for i in sel))
    return best


def main():
    rng = np.random.default_rng(7)
    n = 14
    start = rng.integers(0, 80, n)
    length = rng.integers(3, 25, n)
    end = start + length
    profit = rng.integers(1, 40, n)

    pb = IntervalScheduling(start, end, profit)
    bundle = ModelBundle(pb, IntervalRelax(pb), IntervalRanking())

    # assemble a solver exactly like a reference example main.rs: width
    # heuristic + threshold cache + cutset choice; batch>1 compiles several
    # open subproblems per superstep (one vmapped XLA call)
    solver = ddo_tpu.SequentialSolver(
        bundle,
        width_heu=FixedWidth(4),
        cache=ddo_tpu.SimpleCache(),
        cutset_type=ddo_tpu.FRONTIER,
        batch=4,
    )
    completion = solver.maximize()

    vals, pset = solver.best_solution()
    chosen = [i for i in range(n) if pset[i] and vals[i] == 1]
    print(f"proved optimal: {completion.is_exact}")
    print(f"best profit:    {solver.best_value()}")
    print(f"jobs taken:     {chosen}")
    print(f"explored:       {solver.explored()} subproblems, gap {solver.gap()}")

    expected = brute_force(start.tolist(), end.tolist(), profit.tolist())
    assert solver.best_value() == expected, (solver.best_value(), expected)
    print(f"brute force agrees: {expected}")

    # bonus: export one relaxed DD as graphviz (visualisation/main.rs analogue)
    from ddo_tpu.core.types import CompilationType, CutsetType, root_subproblem
    from ddo_tpu.engine.mdd import DDCompiler
    from ddo_tpu.engine.viz import VizConfig, as_graphviz

    dd = DDCompiler(bundle, width=8, cutset_type=CutsetType.FRONTIER).compile(
        CompilationType.RELAXED, root_subproblem(pb), best_lb=-(10**9), eff_width=3
    )
    dot = as_graphviz(dd, VizConfig(show_value=True, show_rub=True))
    print(f"\ngraphviz export: {len(dot.splitlines())} lines (pipe to `dot -Tsvg`)")


if __name__ == "__main__":
    main()

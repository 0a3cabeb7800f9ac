"""Pigment Sequencing (PSP, discrete lot sizing) — tensorized DP model.

Reference model: /root/reference/ddo/examples/psp/{model,ub_utils,
io_utils}.rs
  * solved BACKWARDS in time: variable at depth d is period
    t = horizon - d - 1 (model.rs next_variable);
  * state = per-item head of the unfilled-demand chain (prev_demands)
    + the item produced at t+1 (next == -1 when unknown) (model.rs
    PspState); the `time` field is the engine depth;
  * domain (model.rs for_each_in_domain): items whose head deadline is
    >= t; IDLE only when remaining demand < t+1; dead state when
    remaining demand cannot be met in the remaining periods;
  * cost = -(changeover[d][next] + stocking[d] * (deadline - t));
  * merge: elementwise min heads, next = -1 (model.rs PspRelax::merge);
  * rough bound: greedy-matching changeover lower bound over the member
    set, precomputed for all 2^n_items subsets (ub_utils.rs all_mst)
    plus a deadline-packing stocking bound.  NOTE: the reference's
    stocking term (model.rs fast_upper_bound) accumulates
    cost*(time - deadline) <= 0, which *loosens* the bound below the
    plain -mst; we instead add a sound EDF-packing lower bound
    (distinct production slots per pending demand, costed at the global
    minimum stocking rate), which is tighter and preserves optimality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ddo_tpu.core.problem import Problem, Relaxation, StateRanking
from ddo_tpu.utils.num import INF, VALUE_DTYPE

I32 = jnp.int32
IDLE = -1


def _greedy_mst_table(changeover):
    """ub_utils.rs all_mst: for every subset, the reference's greedy
    edge-cover lower bound on the changeover cost."""
    n = len(changeover)
    co = np.asarray(changeover, np.int64)
    sym = np.minimum(co, co.T)
    out = np.zeros(1 << n, np.int64)
    for mask in range(1 << n):
        members = [i for i in range(n) if mask >> i & 1]
        if len(members) <= 1:
            continue
        covered = set()
        total = 0
        for a in members:
            if a in covered:
                continue
            emin, bmin = 1 << 40, a
            for b in members:
                if b != a and sym[a][b] < emin:
                    emin, bmin = sym[a][b], b
            total += emin
            covered.add(a)
            covered.add(bmin)
        out[mask] = total
    return out


class Psp(Problem):
    #: bundled model: all hooks route instance data through `data`
    #: pytrees / root state; trace-relevant scalars are in _trace_statics
    shares_traces = True
    _trace_statics = ('n_items', 'horizon')
    name = "psp"

    def __init__(self, horizon, stocking, changeover, demands):
        self.horizon = int(horizon)
        self.n_items = len(stocking)
        self.nb_variables = self.horizon
        self.domain_size = self.n_items + 1  # + IDLE slot
        self.stocking = np.asarray(stocking, np.int64)
        self.changeover = np.asarray(changeover, np.int64)
        self.demands = np.asarray(demands, np.int64)  # [n_items, horizon]

        H, N = self.horizon, self.n_items
        prev_tbl = np.full((N, H + 1), -1, np.int64)
        self._prev_np = prev_tbl
        for t in range(1, H + 1):
            for i in range(N):
                prev_tbl[i, t] = t - 1 if self.demands[i][t - 1] > 0 else prev_tbl[i, t - 1]
        rem_tbl = np.cumsum(self.demands, axis=1)  # rem_demands[i][t]
        self._data = dict(
            stocking=jnp.asarray(self.stocking, I32),
            changeover=jnp.asarray(self.changeover, I32),
            prev_tbl=jnp.asarray(prev_tbl, I32),
            rem_tbl=jnp.asarray(rem_tbl, I32),
            demand_times=jnp.asarray(self.demands > 0),
            mst=jnp.asarray(_greedy_mst_table(self.changeover), I32),
            min_stock=jnp.asarray(int(self.stocking.min()), I32),
            var_order=jnp.asarray(np.arange(self.horizon)[::-1].copy(), I32),
        )

    @property
    def data(self):
        return self._data

    def initial_state(self, data):
        heads = self._prev_np[:, self.horizon]
        return {"heads": jnp.asarray(heads, I32), "next": jnp.asarray(IDLE, I32)}

    def var_order(self, data):
        return data["var_order"]  # period t = horizon - depth - 1

    def step(self, data, state, var, d, depth):
        N = self.n_items
        t = var
        heads = state["heads"]
        nxt = state["next"]
        is_idle = d == N
        i = jnp.clip(d, 0, N - 1)

        rem = jnp.sum(
            jnp.where(heads >= 0, data["rem_tbl"][jnp.arange(N), jnp.clip(heads, 0, None)], 0)
        )
        alive = rem <= t + 1
        valid = jnp.where(is_idle, alive & (rem < t + 1), alive & (heads[i] >= t))

        duration = heads[i] - t
        changeover = jnp.where(nxt >= 0, data["changeover"][i, jnp.clip(nxt, 0, N - 1)], 0)
        cost = jnp.where(is_idle, 0, -(changeover + data["stocking"][i] * duration))

        new_head = data["prev_tbl"][i, jnp.clip(heads[i], 0, self.horizon)]
        nheads = jnp.where((jnp.arange(N) == i) & ~is_idle, new_head, heads)
        nnext = jnp.where(is_idle, nxt, i)
        dval = jnp.where(is_idle, IDLE, d).astype(I32)
        nstate = {"heads": nheads.astype(I32), "next": nnext.astype(I32)}
        return nstate, cost.astype(VALUE_DTYPE), dval, valid

    def pack(self, state):
        return jnp.concatenate([state["heads"], state["next"].reshape(1)])


class PspRelax(Relaxation):
    def __init__(self, problem: Psp):
        self.problem = problem

    @property
    def data(self):
        return self.problem.data

    def merge(self, data, states, mask):
        big = jnp.asarray(INF, I32)
        heads = jnp.min(jnp.where(mask[:, None], states["heads"], big), axis=0)
        return {"heads": heads.astype(I32), "next": jnp.asarray(IDLE, I32)}

    def rub(self, data, state, depth):
        pb = self.problem
        N, H = pb.n_items, pb.horizon
        heads = state["heads"]
        nxt = state["next"]
        # changeover bound from the member-set greedy table (ub_utils.rs)
        members = jnp.where(heads >= 0, 1 << jnp.arange(N), 0).sum()
        members = members | jnp.where(nxt >= 0, 1 << jnp.clip(nxt, 0, N - 1), 0)
        co = data["mst"][members]

        # stocking bound: pending deadlines (all demand periods <= head,
        # one production slot per period) packed EDF-style; delays costed
        # at the global min stocking rate
        time = H - depth  # production slots left: 0..time-1
        tgrid = jnp.arange(H, dtype=I32)
        pending = data["demand_times"] & (tgrid[None, :] <= heads[:, None])  # [N, H]
        deadlines = jnp.where(pending.reshape(-1), jnp.tile(tgrid, N), -(1 << 20))
        dl = -jnp.sort(-deadlines)  # descending
        j = jnp.arange(dl.shape[0], dtype=I32)
        e = jnp.minimum(dl, time - 1)  # slots cannot exceed the current period
        slots = jax.lax.cummin(e + j) - j  # s_j = min_{k<=j}(e_k + k) - j
        act = dl >= 0
        delay = jnp.sum(jnp.where(act, dl - slots, 0))
        ww = data["min_stock"] * delay
        return (-(co + ww)).astype(VALUE_DTYPE)


class PspRanking(StateRanking):
    """model.rs PspRanking: larger total head time preferred."""

    def score(self, data, state):
        return jnp.sum(state["heads"]).reshape(1)

    def score_host(self, state):
        return int(np.asarray(state["heads"]).sum())


def read_instance(path: str):
    """io_utils.rs: horizon, n_items, n_orders, blank, changeover matrix,
    stocking costs, blank, demand rows; trailing line = known optimum."""
    with open(path) as f:
        lines = [l.strip() for l in f]
    idx = 0

    def next_nonblank():
        nonlocal idx
        while idx < len(lines) and not lines[idx]:
            idx += 1
        line = lines[idx]
        idx += 1
        return line

    horizon = int(next_nonblank())
    n_items = int(next_nonblank())
    next_nonblank()  # n_orders
    changeover = []
    for _ in range(n_items):
        changeover.append([int(x) for x in next_nonblank().split()])
    stocking = [int(x) for x in next_nonblank().split()]
    demands = []
    for _ in range(n_items):
        demands.append([int(x) for x in next_nonblank().split()])
    optimum = None
    try:
        optimum = int(next_nonblank())
    except (IndexError, ValueError):
        pass
    return Psp(horizon, stocking, changeover, demands), optimum

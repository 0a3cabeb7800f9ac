"""Sequential Ordering Problem (SOP) — tensorized DP model.

Reference model: /root/reference/ddo/examples/sop/{state,model,relax,
heuristics,io_utils}.rs
  * state = previous-job pool + must/maybe schedule sets (state.rs);
  * dist[i][j] == -1 encodes a precedence: j must precede i
    (io_utils.rs read_instance);
  * domain: schedulable jobs whose predecessors are all done
    (model.rs can_schedule); forced last job at the final rank;
  * cost = -min over the previous pool of dist[prev][j], -1 excluded
    (model.rs min_distance_to);
  * merge like TSPTW (relax.rs RelaxHelper);
  * rough bound: cheapest-incoming-edge matching with the four-case
    take-count formula (relax.rs fast_upper_bound);
  * SopWidth (heuristics.rs): nb_vars * (depth+1) * factor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ddo_tpu.core.heuristics import WidthHeuristic
from ddo_tpu.core.problem import Problem, Relaxation, StateRanking
from ddo_tpu.ops import bitset as bs
from ddo_tpu.utils.num import INF, NEG_INF, VALUE_DTYPE, sat_add

I32 = jnp.int32


class Sop(Problem):
    #: bundled model: all hooks route instance data through `data`
    #: pytrees / root state; trace-relevant scalars are in _trace_statics
    shares_traces = True
    _trace_statics = ('nb_jobs',)
    name = "sop"

    def __init__(self, distances):
        self.dist = np.asarray(distances, np.int64)
        self.nb_jobs = int(self.dist.shape[0])
        self.nb_variables = self.nb_jobs - 1
        self.domain_size = self.nb_jobs
        # predecessors[i] = {j : dist[i][j] == -1}
        self.pred = (self.dist == -1)
        dist_eff = np.where(self.dist == -1, 1 << 40, self.dist).astype(np.int64)
        np.fill_diagonal(dist_eff, 1 << 40)
        self._data = dict(
            dist=jnp.asarray(np.minimum(dist_eff, INF), I32),  # INF = forbidden
            pred=jnp.asarray(self.pred),
        )

    @property
    def data(self):
        return self._data

    def initial_state(self, data):
        n = self.nb_jobs
        return {
            "prev": bs.singleton(n, 0),
            "must": bs.remove(bs.full_set(n), 0),
            "maybe": bs.empty_set(n),
        }

    def step(self, data, state, var, d, depth):
        n = self.nb_jobs
        j = d
        prev_bits = bs.to_bits(state["prev"], n)
        must_bits = bs.to_bits(state["must"], n)
        maybe_bits = bs.to_bits(state["maybe"], n)

        # can_schedule (model.rs): predecessors of j all outside must|maybe
        rem = must_bits | maybe_bits
        sched_ok = ~jnp.any(data["pred"][j] & rem)
        last = depth == (self.nb_variables - 1)
        valid = jnp.where(
            last, j == (n - 1), (must_bits[j] | maybe_bits[j]) & sched_ok
        )

        dmin = jnp.min(jnp.where(prev_bits, data["dist"][:, j], INF))
        cost = -dmin  # INF distance -> NEG_INF value via saturation

        nstate = {
            "prev": bs.from_bits(jnp.zeros(n, bool).at[j].set(True), n),
            "must": bs.remove(state["must"], j),
            "maybe": bs.remove(state["maybe"], j),
        }
        return nstate, cost.astype(VALUE_DTYPE), j.astype(I32), valid

    def pack(self, state):
        return jnp.concatenate([
            jax.lax.bitcast_convert_type(state["prev"], I32).reshape(-1),
            jax.lax.bitcast_convert_type(state["must"], I32).reshape(-1),
            jax.lax.bitcast_convert_type(state["maybe"], I32).reshape(-1),
        ])

    def unpack(self, cols):
        L = bs.nb_lanes(self.nb_jobs)
        cols = np.asarray(cols, np.int32)
        return {
            "prev": cols[:L].view(np.uint32),
            "must": cols[L : 2 * L].view(np.uint32),
            "maybe": cols[2 * L : 3 * L].view(np.uint32),
        }


class SopRelax(Relaxation):
    def __init__(self, problem: Sop):
        self.problem = problem

    @property
    def data(self):
        return self.problem.data

    def merge(self, data, states, mask):
        m = mask[:, None]
        full = jnp.asarray(np.uint32(0xFFFFFFFF))
        prev = bs.or_reduce(jnp.where(m, states["prev"], 0), axis=0)
        agree = bs.and_reduce(jnp.where(m, states["must"], full), axis=0)
        all_must = bs.or_reduce(jnp.where(m, states["must"], 0), axis=0)
        all_maybe = bs.or_reduce(jnp.where(m, states["maybe"], 0), axis=0)
        return {
            "prev": prev,
            "must": agree,
            "maybe": (all_maybe | all_must) & ~agree,
        }

    def rub(self, data, state, depth):
        """relax.rs fast_upper_bound — the four-case cheapest-edge bound."""
        pb = self.problem
        n = pb.nb_jobs
        prev_bits = bs.to_bits(state["prev"], n)
        must_bits = bs.to_bits(state["must"], n)
        maybe_bits = bs.to_bits(state["maybe"], n)
        rem = must_bits | maybe_bits
        D = data["dist"]  # INF == forbidden

        ct = pb.nb_variables - depth  # complete_tour
        n_must = jnp.sum(must_bits.astype(I32))

        # cheapest edge into i from any remaining j (INF when none)
        into = jnp.min(jnp.where(rem[:, None], D, INF), axis=0)  # [n]
        to_must = jnp.where(must_bits & (into < INF), into, INF)
        # distance from the previous pool to each candidate i
        from_pos = jnp.min(jnp.where(prev_bits[:, None], D, INF), axis=0)

        use_maybe = n_must < ct
        to_maybe = jnp.where(
            use_maybe & maybe_bits & (into < INF), into, INF
        )
        dfp_mask = must_bits | (use_maybe & maybe_bits)
        dfp = jnp.min(jnp.where(dfp_mask, from_pos, INF))

        tm = jnp.sort(to_must)
        tb = jnp.sort(to_maybe)
        len_tm = jnp.sum((tm < INF).astype(I32))
        len_tb = jnp.sum((tb < INF).astype(I32))
        ctm = jnp.concatenate([jnp.zeros(1, I32), jnp.cumsum(jnp.where(tm < INF, tm, 0))])
        ctb = jnp.concatenate([jnp.zeros(1, I32), jnp.cumsum(jnp.where(tb < INF, tb, 0))])

        def pref(csum, k):
            return csum[jnp.clip(k, 0, n)]

        tm_max = tm[jnp.clip(len_tm - 1, 0, n - 1)]
        tb_min = tb[0]

        case1 = pref(ctm, ct - 1)  # n_must >= ct
        case2 = pref(ctb, ct - 1)  # to_must empty
        case3 = pref(ctm, n) + pref(ctb, ct - 1 - len_tm)
        case4 = pref(ctm, len_tm - 1) + pref(ctb, ct - len_tm)

        tail = jnp.where(
            n_must >= ct, case1,
            jnp.where(len_tm == 0, case2,
                      jnp.where(tm_max <= tb_min, case3, case4)),
        )
        total = sat_add(dfp, tail)
        return jnp.where(total >= INF, NEG_INF, -total).astype(VALUE_DTYPE)


class SopRanking(StateRanking):
    """heuristics.rs SopRanking compares depth — constant in a layer."""

    def score(self, data, state):
        return jnp.zeros((1,), I32)

    def score_host(self, state):
        return 0


class SopWidth(WidthHeuristic):
    """heuristics.rs: nb_vars * (depth + 1) * factor."""

    def __init__(self, nb_vars: int, factor: int = 1):
        self.nb_vars = nb_vars
        self.factor = factor

    def max_width(self, sub):
        return self.nb_vars * (int(sub.depth) + 1) * self.factor


def read_instance(path: str) -> Sop:
    """TSPLIB .sop parser (io_utils.rs): EDGE_WEIGHT_SECTION, n, matrix."""
    rows = []
    n = None
    in_section = False
    with open(path) as f:
        for line in f:
            line = line.strip()
            if "EDGE_WEIGHT_SECTION" in line:
                in_section = True
                continue
            if not in_section or not line:
                continue
            if n is None:
                n = int(line.split()[0])
                continue
            rows.extend(int(x) for x in line.split())
            if len(rows) >= n * n:
                break
    dist = np.asarray(rows[: n * n], np.int64).reshape(n, n)
    return Sop(dist)

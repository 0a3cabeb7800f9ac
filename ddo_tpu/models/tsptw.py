"""TSP with Time Windows — tensorized DP model.

Reference model: /root/reference/ddo/examples/tsptw/{state,model,relax,
dominance,heuristics,instance}.rs
  * state (state.rs:34-56): position as a SET (Node == singleton,
    Virtual == pool), elapsed time as an [e_lo, e_hi] interval
    (FixedAmount == collapsed interval), must/maybe visit sets
    (maybe None == empty set);
  * domain (model.rs for_each_in_domain): all must-nodes if every one is
    still reachable (else the state dies), plus reachable maybe-nodes;
    at depth n-1 only the depot;
  * transition (model.rs:62-80, arrival_time 107-154): interval arrival
    with window clamping;
  * cost (model.rs:81-105): -(travel + waiting), distances pre-scaled
    x10000 like the reference parser (instance.rs:53-56, f32 truncation
    replicated exactly);
  * merge (relax.rs RelaxHelper): position union, elapsed hull,
    must intersection, maybe = (union must | union maybe) - intersection;
  * rough bound (relax.rs fast_upper_bound): cheapest-incoming-edge sum
    with reachability checks;
  * dominance (dominance.rs): key = (position, must), value only;
  * TsptwWidth (heuristics.rs): nb_vars * (depth+1) * factor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ddo_tpu.core.heuristics import WidthHeuristic
from ddo_tpu.core.problem import Dominance, Problem, Relaxation, StateRanking
from ddo_tpu.ops import bitset as bs
from ddo_tpu.utils.num import INF, NEG_INF, VALUE_DTYPE

I32 = jnp.int32


class Tsptw(Problem):
    #: bundled model: all hooks route instance data through `data`
    #: pytrees / root state; trace-relevant scalars are in _trace_statics
    shares_traces = True
    name = "tsptw"

    def __init__(self, distances, tw_earliest, tw_latest):
        self.dist = np.asarray(distances, np.int64)
        n = self.nb_variables = int(self.dist.shape[0])
        self.domain_size = n
        self.twe = np.asarray(tw_earliest, np.int64)
        self.twl = np.asarray(tw_latest, np.int64)
        # cheapest incoming edge per node (relax.rs compute_cheapest_edges)
        dd = self.dist.copy().astype(np.int64)
        np.fill_diagonal(dd, 1 << 40)
        self.cheapest = dd.min(axis=0)
        self._data = dict(
            dist=jnp.asarray(self.dist, I32),
            twe=jnp.asarray(self.twe, I32),
            twl=jnp.asarray(self.twl, I32),
            cheapest=jnp.asarray(self.cheapest, I32),
        )

    @property
    def data(self):
        return self._data

    def initial_state(self, data):
        n = self.nb_variables
        return {
            "pos": bs.singleton(n, 0),
            "e_lo": jnp.asarray(0, I32),
            "e_hi": jnp.asarray(0, I32),
            "must": bs.remove(bs.full_set(n), 0),
            "maybe": bs.empty_set(n),
        }

    def _dists_from(self, data, pos_bits, j):
        """min/max distance from the position pool to node j (model.rs
        min_distance_to / max_distance_to)."""
        col = data["dist"][:, j]
        mn = jnp.min(jnp.where(pos_bits, col, INF))
        mx = jnp.max(jnp.where(pos_bits, col, NEG_INF))
        return mn, mx

    def step(self, data, state, var, d, depth):
        n = self.nb_variables
        j = d
        pos_bits = bs.to_bits(state["pos"], n)
        must_bits = bs.to_bits(state["must"], n)
        maybe_bits = bs.to_bits(state["maybe"], n)
        e_lo, e_hi = state["e_lo"], state["e_hi"]

        # reachability: e_lo + min-dist <= latest (model.rs can_move_to)
        dmin_all = jnp.min(jnp.where(pos_bits[:, None], data["dist"], INF), axis=0)
        reach = e_lo + dmin_all <= data["twl"]
        all_must_ok = jnp.all(jnp.where(must_bits, reach, True))
        last = depth == (n - 1)
        valid = jnp.where(
            last,
            (j == 0) & reach[0],
            all_must_ok & (must_bits[j] | (maybe_bits[j] & reach[j])),
        )

        dmin, dmax = self._dists_from(data, pos_bits, j)
        amin = e_lo + dmin
        amax = e_hi + dmax
        twe_j = data["twe"][j]
        twl_j = data["twl"][j]
        ne_lo = jnp.maximum(amin, twe_j)
        ne_hi = jnp.where(amin == amax, ne_lo, jnp.minimum(amax, twl_j))
        waiting = jnp.maximum(0, twe_j - amin)
        cost = -(dmin + waiting)

        nstate = {
            "pos": bs.from_bits(jnp.zeros(n, bool).at[j].set(True), n),
            "e_lo": ne_lo.astype(I32),
            "e_hi": ne_hi.astype(I32),
            "must": bs.remove(state["must"], j),
            "maybe": bs.remove(state["maybe"], j),
        }
        return nstate, cost.astype(VALUE_DTYPE), j.astype(I32), valid

    def pack(self, state):
        return jnp.concatenate([
            jax.lax.bitcast_convert_type(state["pos"], I32).reshape(-1),
            state["e_lo"].reshape(1),
            state["e_hi"].reshape(1),
            jax.lax.bitcast_convert_type(state["must"], I32).reshape(-1),
            jax.lax.bitcast_convert_type(state["maybe"], I32).reshape(-1),
        ])

    def unpack(self, cols):
        L = bs.nb_lanes(self.nb_variables)
        cols = np.asarray(cols, np.int32)
        return {
            "pos": cols[:L].view(np.uint32),
            "e_lo": cols[L],
            "e_hi": cols[L + 1],
            "must": cols[L + 2 : 2 * L + 2].view(np.uint32),
            "maybe": cols[2 * L + 2 : 3 * L + 2].view(np.uint32),
        }


class TsptwRelax(Relaxation):
    def __init__(self, problem: Tsptw):
        self.problem = problem

    @property
    def data(self):
        return self.problem.data

    def merge(self, data, states, mask):
        """relax.rs RelaxHelper: union position, elapsed hull, must
        intersection, maybe = (all_must | all_maybe) - agreed."""
        m = mask[:, None]
        full = jnp.asarray(np.uint32(0xFFFFFFFF))
        pos = bs.or_reduce(jnp.where(m, states["pos"], 0), axis=0)
        agree = bs.and_reduce(jnp.where(m, states["must"], full), axis=0)
        all_must = bs.or_reduce(jnp.where(m, states["must"], 0), axis=0)
        all_maybe = bs.or_reduce(jnp.where(m, states["maybe"], 0), axis=0)
        big = jnp.asarray(INF, I32)
        e_lo = jnp.min(jnp.where(mask, states["e_lo"], big))
        e_hi = jnp.max(jnp.where(mask, states["e_hi"], -big))
        return {
            "pos": pos,
            "e_lo": e_lo,
            "e_hi": e_hi,
            "must": agree,
            "maybe": (all_maybe | all_must) & ~agree,
        }

    def rub(self, data, state, depth):
        """relax.rs fast_upper_bound."""
        pb = self.problem
        n = pb.nb_variables
        pos_bits = bs.to_bits(state["pos"], n)
        must_bits = bs.to_bits(state["must"], n)
        maybe_bits = bs.to_bits(state["maybe"], n)
        e_lo = state["e_lo"]
        cheapest = data["cheapest"]
        to_depot = data["dist"][:, 0]

        nb_must = jnp.sum(must_bits.astype(I32))
        complete_tour = n - depth - nb_must
        mandatory = jnp.sum(jnp.where(must_bits, cheapest, 0))
        back = jnp.min(jnp.where(must_bits | maybe_bits, to_depot, INF))
        must_violation = jnp.any(
            must_bits & (e_lo + cheapest > data["twl"])
        )

        has_maybe = jnp.any(maybe_bits)
        violations = jnp.sum(
            (maybe_bits & (e_lo + cheapest > data["twl"])).astype(I32)
        )
        nb_maybe = jnp.sum(maybe_bits.astype(I32))
        maybe_short = has_maybe & (nb_maybe - violations < complete_tour)
        # sum of the `complete_tour` smallest maybe cheapest edges
        mc = jnp.sort(jnp.where(maybe_bits, cheapest, INF))
        csum = jnp.concatenate([jnp.zeros(1, I32), jnp.cumsum(
            jnp.where(mc >= INF, 0, mc)
        )])
        take = jnp.clip(jnp.minimum(complete_tour, nb_maybe), 0, n)
        mandatory = mandatory + jnp.where(has_maybe, csum[take], 0)

        pos_back = jnp.min(jnp.where(pos_bits, to_depot, INF))
        back = jnp.where(mandatory == 0, jnp.minimum(back, pos_back), back)
        total = mandatory + back
        feasible = (e_lo + total <= data["twl"][0]) & ~must_violation & ~maybe_short
        return jnp.where(feasible, -total, NEG_INF).astype(VALUE_DTYPE)


class TsptwRanking(StateRanking):
    """heuristics.rs TsptwRanking compares depth — constant in a layer."""

    def score(self, data, state):
        return jnp.zeros((1,), I32)

    def score_host(self, state):
        return 0


class TsptwDominance(Dominance):
    """dominance.rs: key = (position, must), value-only comparison."""

    use_value = True

    def key_cols(self, state):
        return jnp.concatenate([
            jnp.ravel(state["pos"]).astype(jnp.int32),
            jnp.ravel(state["must"]).astype(jnp.int32),
        ])

    def coord_cols(self, state):
        return jnp.zeros((0,), jnp.int32)  # value-only comparison


class TsptwWidth(WidthHeuristic):
    """heuristics.rs: nb_vars * (depth + 1) * factor."""

    def __init__(self, nb_vars: int, factor: int = 1):
        self.nb_vars = nb_vars
        self.factor = factor

    def max_width(self, sub):
        return self.nb_vars * (int(sub.depth) + 1) * self.factor


def read_instance(path: str) -> Tsptw:
    """instance.rs parser: n, n distance-matrix rows, n time windows;
    floats scaled x10000 with f32 truncation (instance.rs:53-66)."""
    rows = []
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip() and not l.startswith("#")]
    n = int(lines[0].split()[0])
    dist = np.zeros((n, n), np.int64)
    for i in range(n):
        vals = [np.float32(x) for x in lines[1 + i].split()]
        dist[i] = [int(np.float32(v) * np.float32(10000.0)) for v in vals]
    twe = np.zeros(n, np.int64)
    twl = np.zeros(n, np.int64)
    for i in range(n):
        parts = lines[1 + n + i].split()
        twe[i] = int(np.float32(parts[0]) * np.float32(10000.0))
        twl[i] = int(np.float32(parts[1]) * np.float32(10000.0))
    return Tsptw(dist, twe, twl)

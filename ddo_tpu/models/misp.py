"""Maximum (weighted) Independent Set — tensorized DP model.

Reference model: /root/reference/ddo/examples/misp/main.rs
  * state = bitset of still-selectable vertices (main.rs:62-71), stored
    here as uint32 lanes;
  * complement-adjacency trick (main.rs:40-45,77-85): taking vertex v
    intersects the state with ~N(v);
  * domain: {NO} always, {YES} only if v is still selectable
    (main.rs:95-102);
  * dynamic branching: the vertex occurring in the fewest states of the
    layer (min-occurrence, main.rs:109-143) — here one masked popcount
    reduction over the layer;
  * merge = set union (main.rs:172-178);
  * rough bound = total weight of remaining vertices (main.rs:191-193);
  * ranking = set cardinality then content (main.rs:202-209).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ddo_tpu.core.problem import Problem, Relaxation, StateRanking
from ddo_tpu.ops import bitset as bs
from ddo_tpu.utils.num import VALUE_DTYPE

I32 = jnp.int32


class Misp(Problem):
    #: bundled model: all hooks route instance data through `data`
    #: pytrees / root state; trace-relevant scalars are in _trace_statics
    shares_traces = True
    name = "misp"

    def __init__(self, nb_vars: int, edges, weight=None):
        self.nb_variables = int(nb_vars)
        self.domain_size = 2
        n = self.nb_variables
        self.weight = np.asarray(
            weight if weight is not None else np.ones(n), np.int64
        )
        # complement adjacency masks (main.rs:40-45)
        lanes = bs.nb_lanes(n)
        comp = np.zeros((n, lanes), np.uint32)
        full = np.asarray(bs.full_set(n))
        comp[:] = full
        for (a, b) in edges:
            comp[a][b // 32] &= ~(np.uint32(1) << np.uint32(b % 32))
            comp[b][a // 32] &= ~(np.uint32(1) << np.uint32(a % 32))
        self._data = dict(
            weight=jnp.asarray(self.weight, I32),
            comp_adj=jnp.asarray(comp),
        )

    @property
    def data(self):
        return self._data

    def initial_state(self, data):
        return {"free": bs.full_set(self.nb_variables)}

    def var_order(self, data):
        return None  # dynamic branching

    def next_variable(self, data, depth, states, mask, assigned):
        """Min-occurrence branching (main.rs:109-143): count, per vertex,
        how many live states still contain it; pick the rarest occurring
        one.  When no vertex occurs (all states empty), fall back to the
        first unassigned variable (forced NO decisions to the horizon)."""
        n = self.nb_variables
        bits = bs.to_bits(states["free"], n)  # [W, n]
        counts = jnp.sum(bits & mask[:, None], axis=0, dtype=I32)
        has = counts > 0
        counts_inf = jnp.where(has, counts, jnp.iinfo(jnp.int32).max)
        best = jnp.argmin(counts_inf).astype(I32)
        fallback = jnp.argmax(~assigned).astype(I32)
        return jnp.where(jnp.any(has), best, fallback)

    def step(self, data, state, var, d, depth):
        free = state["free"]
        in_set = bs.contains(free, var)
        take = d == 1
        valid = jnp.where(take, in_set, True)
        removed = bs.remove(free, var)
        taken = removed & data["comp_adj"][var]
        nfree = jnp.where(take, taken, removed)
        cost = jnp.where(take, data["weight"][var], 0).astype(VALUE_DTYPE)
        return {"free": nfree}, cost, d.astype(I32), valid

    def is_impacted_by(self, data, state, var):
        """Long arcs (main.rs:145-147): only states that still contain the
        branched vertex are impacted; the rest skip the layer (the engine's
        pooled/long-arc mode, no decision recorded on their paths)."""
        return bs.contains(state["free"], var)

    def pack(self, state):
        # uint32 lanes bit-cast to int32 key columns
        return jax.lax.bitcast_convert_type(state["free"], I32).reshape(-1)

    def unpack(self, cols):
        return {"free": np.asarray(cols, np.int32).view(np.uint32)}


class MispRelax(Relaxation):
    def __init__(self, problem: Misp):
        self.problem = problem

    @property
    def data(self):
        return self.problem.data

    def merge(self, data, states, mask):
        """Set union over the merge set (main.rs:172-178)."""
        lanes = jnp.where(mask[:, None], states["free"], 0)
        return {"free": bs.or_reduce(lanes, axis=0)}

    def rub(self, data, state, depth):
        return bs.weight_sum(state["free"], data["weight"], self.problem.nb_variables)


class MispRanking(StateRanking):
    """main.rs:202-209: larger set first, then set content."""

    def __init__(self, problem: Misp):
        self.problem = problem

    def score(self, data, state):
        lanes = jax.lax.bitcast_convert_type(state["free"], I32).reshape(-1)
        return jnp.concatenate([bs.count(state["free"]).reshape(1), lanes])

    def score_host(self, state):
        free = np.asarray(state["free"], np.uint32)
        return tuple([int(sum(bin(int(x)).count("1") for x in free))] + [int(x) for x in free])


def read_instance(path: str) -> Misp:
    """DIMACS .clq parser (main.rs:258-317): `p edge n m`, `n v w` weight
    lines, `e a b` edge lines (1-indexed)."""
    nb_vars = 0
    edges = []
    weight = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("c"):
                continue
            parts = line.split()
            if parts[0] == "p":
                nb_vars = int(parts[2])
                weight = np.ones(nb_vars, np.int64)
            elif parts[0] == "n":
                weight[int(parts[1]) - 1] = int(parts[2])
            elif parts[0] == "e":
                edges.append((int(parts[1]) - 1, int(parts[2]) - 1))
    return Misp(nb_vars, edges, weight)

"""Maximum Cut (MCP) — tensorized DP model.

Reference model: /root/reference/ddo/examples/mcp/{model,relax,graph}.rs
  * state = per-vertex signed marginal benefits (model.rs McpState);
  * natural (static) variable order, symmetry broken by forcing the first
    vertex to side S (model.rs for_each_in_domain);
  * transition zeroes entries below the branched vertex and shifts the
    rest by +/- the adjacency row (model.rs transition);
  * costs: sign-disagreement min terms (model.rs branch_on_s/t);
  * merge: per-vertex sign partition — all-positive -> min, all-negative
    -> -min|.|, mixed -> 0 (relax.rs merge_substates);
  * relax: cost + sum(|dst| - |merged|) (relax.rs relax);
  * rough bound: remaining |benefits| + positive-edge estimate
    (relax.rs precompute_estimate) adjusted by vr/nk terms.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ddo_tpu.core.problem import Problem, Relaxation, StateRanking
from ddo_tpu.utils.num import VALUE_DTYPE

I32 = jnp.int32
S, T = 1, -1


class Mcp(Problem):
    #: bundled model: all hooks route instance data through `data`
    #: pytrees / root state; trace-relevant scalars are in _trace_statics
    shares_traces = True
    name = "mcp"

    def __init__(self, nb_vars: int, edges):
        n = self.nb_variables = int(nb_vars)
        self.domain_size = 2
        w = np.zeros((n, n), np.int64)
        for (a, b, wt) in edges:
            w[a, b] = wt
            w[b, a] = wt
        self.w = w
        self.initial = int(w[np.triu_indices(n, 1)][w[np.triu_indices(n, 1)] < 0].sum())

        # estimates[d] = sum of positive weights among vertices >= d
        # (relax.rs precompute_estimate); nk[d] = sum of negative weights
        # within vertices < d (relax.rs precompute_nk)
        iu = np.triu_indices(n, 1)
        est = np.zeros(n + 1, np.int64)
        nk = np.zeros(n + 1, np.int64)
        for d in range(n + 1):
            sel = iu[0] >= d
            est[d] = np.maximum(w[iu][sel], 0).sum()
            seln = iu[1] < d
            nk[d] = np.minimum(w[iu][seln], 0).sum()
        self._data = dict(
            w=jnp.asarray(w, I32),
            estimates=jnp.asarray(est, I32),
            nk=jnp.asarray(nk, I32),
            vr=jnp.asarray(self.initial, I32),
        )

    @property
    def data(self):
        return self._data

    def initial_state(self, data):
        return {"benef": jnp.zeros(self.nb_variables, I32)}

    def initial_value(self, data):
        return jnp.asarray(self.initial, VALUE_DTYPE)

    def step(self, data, state, var, d, depth):
        n = self.nb_variables
        s = state["benef"]
        side_s = d == 0
        dval = jnp.where(side_s, S, T).astype(I32)
        valid = side_s | (depth > 0)  # root branches only S (symmetry)
        wrow = data["w"][var]
        v_ids = jnp.arange(n, dtype=I32)
        ns = jnp.where(v_ids >= var, s + dval * wrow, 0)

        # cost terms (model.rs branch_on_s / branch_on_t); the diagonal
        # contributes 0 since w[x,x] == 0
        rem = v_ids >= var
        prod = s * wrow
        mn = jnp.minimum(jnp.abs(s), jnp.abs(wrow))
        sum_s = jnp.sum(jnp.where(rem & (prod <= 0), mn, 0))
        sum_t = jnp.sum(jnp.where(rem & (prod >= 0), mn, 0))
        cost_s = jnp.maximum(0, -s[var]) + sum_s
        cost_t = jnp.maximum(0, s[var]) + sum_t
        cost = jnp.where(depth == 0, 0, jnp.where(side_s, cost_s, cost_t))
        return {"benef": ns}, cost.astype(VALUE_DTYPE), dval, valid

    def pack(self, state):
        return state["benef"]


class McpRelax(Relaxation):
    def __init__(self, problem: Mcp):
        self.problem = problem

    @property
    def data(self):
        return self.problem.data

    def merge(self, data, states, mask):
        """Sign-partitioned merge (relax.rs merge_substates)."""
        s = states["benef"]  # [C, n]
        m = mask[:, None]
        big = jnp.asarray(1 << 30, I32)
        has_pos = jnp.any(m & (s > 0), axis=0)
        has_neg = jnp.any(m & (s < 0), axis=0)
        min_sub = jnp.min(jnp.where(m, s, big), axis=0)
        min_abs = jnp.min(jnp.where(m, jnp.abs(s), big), axis=0)
        out = jnp.where(
            has_pos & ~has_neg, min_sub,
            jnp.where(has_neg & ~has_pos, -min_abs, 0),
        )
        out = jnp.where(jnp.any(mask), out, 0)
        return {"benef": out.astype(I32)}

    def relax_cost(self, data, src, dst, merged, dval, cost, var):
        lost = jnp.sum(jnp.abs(dst["benef"]) - jnp.abs(merged["benef"]))
        return (cost + lost).astype(VALUE_DTYPE)

    def rub(self, data, state, depth):
        n = self.problem.nb_variables
        v_ids = jnp.arange(n, dtype=I32)
        marginal = jnp.sum(jnp.where(v_ids >= depth, jnp.abs(state["benef"]), 0))
        return (
            marginal + data["estimates"][depth] - data["vr"] + data["nk"][depth]
        ).astype(VALUE_DTYPE)


class McpRanking(StateRanking):
    """Total absolute benefit (model.rs McpRanking)."""

    def score(self, data, state):
        return jnp.sum(jnp.abs(state["benef"])).reshape(1)

    def score_host(self, state):
        return int(np.abs(np.asarray(state["benef"])).sum())


def read_instance(path: str) -> Mcp:
    """graph.rs from_lines: `n m` header then `src dst weight` (1-based)."""
    nb = 0
    edges = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("c"):
                continue
            parts = line.split()
            if len(parts) == 2:
                nb = int(parts[0])
            elif len(parts) == 3:
                edges.append((int(parts[0]) - 1, int(parts[1]) - 1, int(parts[2])))
    return Mcp(nb, edges)

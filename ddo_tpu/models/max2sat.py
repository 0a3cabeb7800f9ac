"""Weighted MAX2SAT — tensorized DP model.

Reference model: /root/reference/ddo/examples/max2sat/{model,relax,data}.rs
  * state = per-variable signed marginal benefits (model.rs:59-62), here a
    dense int32[n] vector (depth is engine-level);
  * branching order: variables sorted by increasing sum of clause weights,
    branched from the largest down (model.rs:150-152, 330-340);
  * transition/cost (model.rs:275-328) vectorized over the remaining-var
    mask with precomputed [n, n] literal-pair weight matrices;
  * merge: per-variable same-sign min-abs benefit (relax.rs:47-77);
  * relax: cost offset by the benefit lost in the merge (relax.rs:78-84);
  * rough bound: marginal benefit + precomputed estimates (model.rs:240-250,
    precompute at model build with numpy, model.rs:183-238).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ddo_tpu.core.problem import Problem, Relaxation, StateRanking
from ddo_tpu.utils.num import VALUE_DTYPE

I32 = jnp.int32
T, F = 1, -1


class Max2Sat(Problem):
    #: bundled model: all hooks route instance data through `data`
    #: pytrees / root state; trace-relevant scalars are in _trace_statics
    shares_traces = True
    name = "max2sat"

    def __init__(self, nb_vars: int, clauses):
        """`clauses`: dict {(a, b): weight} with 1-based signed literals,
        a <= b (the parsed `Weighed2Sat`, data.rs:33-37)."""
        n = self.nb_variables = int(nb_vars)
        self.domain_size = 2
        wtt = np.zeros((n, n), np.int64)
        wtf = np.zeros((n, n), np.int64)
        wff = np.zeros((n, n), np.int64)
        unit_t = np.zeros(n, np.int64)
        unit_f = np.zeros(n, np.int64)
        taut = np.zeros(n, np.int64)
        sum_w = np.zeros(n, np.int64)
        initial = 0
        for (a, b), w in clauses.items():
            ia, ib = abs(a) - 1, abs(b) - 1
            sum_w[ia] += w
            if a != b:  # non-unit (model.rs:140-143)
                sum_w[ib] += w
            if a == -b:  # tautology
                initial += w
                taut[ia] = w
            elif a == b:  # unit clause
                if a > 0:
                    unit_t[ia] = w
                else:
                    unit_f[ia] = w
            else:
                pa, pb = a > 0, b > 0
                # wtf[k, l] == weight(t(k), f(l)); wft is its transpose
                if pa and pb:
                    wtt[ia, ib] = wtt[ib, ia] = w
                elif not pa and not pb:
                    wff[ia, ib] = wff[ib, ia] = w
                elif pa and not pb:  # clause (a v -b): t(a) with f(b)
                    wtf[ia, ib] = w
                else:  # clause (-a v b): f(a) with t(b) == t(b) with f(a)
                    wtf[ib, ia] = w

        self.initial = int(initial)
        # variable ordering by increasing sum of clause weights
        order_asc = np.argsort(sum_w, kind="stable")
        self.order_asc = order_asc
        rank_pos = np.zeros(n, np.int64)
        rank_pos[order_asc] = np.arange(n)
        var_order = order_asc[::-1].copy()  # branch largest-sum first

        # wft[k, l] = weight(f(k), t(l)) = wtf[l, k]
        wft = wtf.T.copy()

        # estimates (model.rs:204-238) and nk (model.rs:190-198), computed
        # over the ascending order with vectorized numpy
        ow = order_asc
        A = wtt[np.ix_(ow, ow)]
        Btf = wtf[np.ix_(ow, ow)]
        Bft = wft[np.ix_(ow, ow)]
        Cff = wff[np.ix_(ow, ow)]
        m_tt = A + Btf + Bft
        m_tf = A + Btf + Cff
        m_ft = A + Bft + Cff
        m_ff = Btf + Bft + Cff
        pairmax = np.maximum(np.maximum(m_tt, m_tf), np.maximum(m_ft, m_ff))
        iu = np.triu_indices(n, 1)
        pair_contrib = np.zeros(n, np.int64)
        np.add.at(pair_contrib, iu[0], pairmax[iu])
        own = taut[ow] + np.maximum(unit_t[ow], unit_f[ow])
        tail = pair_contrib + own
        suffix = np.concatenate([np.cumsum(tail[::-1])[::-1], [0]])
        estimates = suffix[:n]
        nk = np.concatenate([[0], np.cumsum(taut[ow])])[:n]

        self._data = dict(
            wtt=jnp.asarray(wtt, I32), wtf=jnp.asarray(wtf, I32),
            wft=jnp.asarray(wft, I32), wff=jnp.asarray(wff, I32),
            unit_t=jnp.asarray(unit_t, I32), unit_f=jnp.asarray(unit_f, I32),
            rank_pos=jnp.asarray(rank_pos, I32),
            var_order=jnp.asarray(var_order, I32),
            estimates=jnp.asarray(estimates, I32),
            nk=jnp.asarray(nk, I32),
            initial=jnp.asarray(self.initial, I32),
        )

    @property
    def data(self):
        return self._data

    def initial_state(self, data):
        return {"benef": jnp.zeros(self.nb_variables, I32)}

    def initial_value(self, data):
        return jnp.asarray(self.initial, VALUE_DTYPE)

    def var_order(self, data):
        return data["var_order"]

    def step(self, data, state, var, d, depth):
        n = self.nb_variables
        s = state["benef"]
        sk = s[var]
        # remaining (unbranched-after-k) vars: ascending-order rank below
        # n - depth - 1 (model.rs:173-181)
        rem = data["rank_pos"] < (n - depth - 1)
        wtt_k = data["wtt"][var]
        wtf_k = data["wtf"][var]
        wft_k = data["wft"][var]
        wff_k = data["wff"][var]
        pos = lambda x: jnp.maximum(0, x)
        take_true = d == 0

        # transition (model.rs:275-292)
        delta_t = wft_k - wff_k  # benefit shift when k=T
        delta_f = wtt_k - wtf_k  # when k=F
        ns = jnp.where(rem, s + jnp.where(take_true, delta_t, delta_f), s)
        ns = ns.at[var].set(0)

        # transition cost (model.rs:294-328)
        sat_t = wtt_k + wtf_k + jnp.minimum(pos(s) + wft_k, pos(-s) + wff_k)
        sat_f = wff_k + wft_k + jnp.minimum(pos(s) + wtt_k, pos(-s) + wtf_k)
        sum_t = jnp.sum(jnp.where(rem, sat_t, 0)) + data["unit_t"][var] + pos(sk)
        sum_f = jnp.sum(jnp.where(rem, sat_f, 0)) + data["unit_f"][var] + pos(-sk)
        cost = jnp.where(take_true, sum_t, sum_f).astype(VALUE_DTYPE)
        dval = jnp.where(take_true, T, F).astype(I32)
        return {"benef": ns}, cost, dval, jnp.asarray(True)

    def pack(self, state):
        return state["benef"]


class Max2SatRelax(Relaxation):
    def __init__(self, problem: Max2Sat):
        self.problem = problem

    @property
    def data(self):
        return self.problem.data

    def merge(self, data, states, mask):
        """Per-variable same-sign min-abs merge (relax.rs:47-77)."""
        s = states["benef"]  # [C, n]
        m = mask[:, None]
        big = jnp.asarray(1 << 30, I32)
        abs_min = jnp.min(jnp.where(m, jnp.abs(s), big), axis=0)
        has_pos = jnp.any(m & (s > 0), axis=0)
        has_neg = jnp.any(m & (s < 0), axis=0)
        same = ~(has_pos & has_neg)
        sign = jnp.where(has_pos, 1, jnp.where(has_neg, -1, 0))
        benef = jnp.where(same, sign * jnp.minimum(abs_min, big - 1), 0)
        benef = jnp.where(jnp.any(mask), benef, 0)
        return {"benef": benef.astype(I32)}

    def relax_cost(self, data, src, dst, merged, dval, cost, var):
        """relax.rs:78-84: recover the benefit lost to the merge."""
        lost = jnp.sum(jnp.abs(dst["benef"]) - jnp.abs(merged["benef"]))
        return (cost + lost).astype(VALUE_DTYPE)

    def rub(self, data, state, depth):
        """model.rs:240-250."""
        marginal = jnp.sum(jnp.abs(state["benef"]))
        return (
            marginal + data["estimates"][depth] - data["initial"] + data["nk"][depth]
        ).astype(VALUE_DTYPE)


class Max2SatRanking(StateRanking):
    """Order by total absolute benefit (model.rs:40-54)."""

    def score(self, data, state):
        return jnp.sum(jnp.abs(state["benef"])).reshape(1)

    def score_host(self, state):
        return int(np.abs(np.asarray(state["benef"])).sum())


def read_instance(path: str) -> Max2Sat:
    """wcnf parser (data.rs:40-111): `p wcnf n m` then `w x y 0` / `w x 0`."""
    clauses = {}
    nb_vars = 0
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("c"):
                continue
            parts = line.split()
            if parts[0] == "p":
                nb_vars = int(parts[2])
                continue
            # clauses may carry trailing inline comments: read ints up to
            # the 0 terminator only (the reference regexes anchor the prefix)
            nums = []
            for p in parts:
                try:
                    v = int(p)
                except ValueError:
                    break
                nums.append(v)
                if len(nums) > 1 and v == 0:
                    break
            if len(nums) < 2 or nums[-1] != 0:
                continue
            w = nums[0]
            lits = [x for x in nums[1:] if x != 0]
            if len(lits) == 1:
                a = b = lits[0]
            elif len(lits) == 2:
                a, b = min(lits), max(lits)
            else:
                continue
            clauses[(a, b)] = w
    return Max2Sat(nb_vars, clauses)

"""Single-Row Facility Layout (SRFLP) — tensorized DP model.

Reference model: /root/reference/ddo/examples/srflp/{state,model,relax,
heuristics,io_utils}.rs
  * state = must/maybe placement sets + per-department cut flows
    (state.rs SrflpState);
  * transition shifts cuts by the placed department's flow row
    (model.rs transition), cost = -(selected cut sum) * length[d]
    (model.rs transition_cost);
  * merge: must intersection, maybe union, per-entry min cut over the
    states that still carry the entry (relax.rs merge);
  * rough bound (relax.rs fast_upper_bound): sorted flows x cumulated
    shortest lengths matching + greedy cut/length ratio ordering (f32
    ratios exactly like the reference);
  * objective transform: reported = root_value - best_value
    (main.rs: 0.5 * sum (l_i + l_j) * f_ij).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ddo_tpu.core.heuristics import WidthHeuristic
from ddo_tpu.core.problem import Problem, Relaxation, StateRanking
from ddo_tpu.ops import bitset as bs
from ddo_tpu.utils.num import INF, VALUE_DTYPE

I32 = jnp.int32
F32 = jnp.float32


class Srflp(Problem):
    #: bundled model: all hooks route instance data through `data`
    #: pytrees / root state; trace-relevant scalars are in _trace_statics
    shares_traces = True
    name = "srflp"

    def __init__(self, lengths, flows):
        self.lengths = np.asarray(lengths, np.int64)
        self.flows = np.asarray(flows, np.int64)
        n = self.nb_variables = int(self.lengths.shape[0])
        self.domain_size = n
        iu = np.triu_indices(n, 1)
        self.root_value = float(
            0.5 * ((self.lengths[iu[0]] + self.lengths[iu[1]]) * self.flows[iu]).sum()
        )
        # sorted lengths (ascending, by (l, i)) — model.rs:13-15
        sl = sorted((int(l), i) for i, l in enumerate(self.lengths))
        # sorted flows (ascending, by (f, i, j)) — model.rs:16-22
        sf = sorted((int(self.flows[i][j]), i, j) for i, j in zip(*iu))
        self._data = dict(
            lengths=jnp.asarray(self.lengths, I32),
            flows=jnp.asarray(self.flows, I32),
            sl_l=jnp.asarray([x[0] for x in sl], I32),
            sl_i=jnp.asarray([x[1] for x in sl], I32),
            sf_f=jnp.asarray([x[0] for x in sf], I32),
            sf_i=jnp.asarray([x[1] for x in sf], I32),
            sf_j=jnp.asarray([x[2] for x in sf], I32),
        )

    @property
    def data(self):
        return self._data

    def initial_state(self, data):
        n = self.nb_variables
        return {
            "must": bs.full_set(n),
            "maybe": bs.empty_set(n),
            "cut": jnp.zeros(n, I32),
        }

    def step(self, data, state, var, d, depth):
        n = self.nb_variables
        must_bits = bs.to_bits(state["must"], n)
        maybe_bits = bs.to_bits(state["maybe"], n)
        cut = state["cut"]
        n_must = jnp.sum(must_bits.astype(I32))
        ca = n - depth - n_must  # complete_arrangement after must entries
        valid = must_bits[d] | (maybe_bits[d] & (ca > 0))

        # transition cost (model.rs transition_cost): cuts of the other
        # must entries + the smallest (n - depth - 1 - |must \ d|) maybe cuts
        other_must = must_bits & (jnp.arange(n) != d)
        cut_sum = jnp.sum(jnp.where(other_must, cut, 0))
        ca2 = n - (depth + 1) - jnp.sum(other_must.astype(I32))
        other_maybe = maybe_bits & (jnp.arange(n) != d)
        mc = jnp.sort(jnp.where(other_maybe, cut, INF))
        csum = jnp.concatenate([jnp.zeros(1, I32), jnp.cumsum(jnp.where(mc < INF, mc, 0))])
        n_om = jnp.sum(other_maybe.astype(I32))
        take = jnp.clip(jnp.minimum(ca2, n_om), 0, n)
        cut_sum = cut_sum + jnp.where(ca2 > 0, csum[take], 0)
        cost = -(cut_sum * data["lengths"][d])

        # transition (model.rs transition)
        frow = data["flows"][d]
        rem = (other_must | other_maybe)
        ncut = jnp.where(rem, cut + frow, cut)
        ncut = ncut.at[d].set(0)
        nstate = {
            "must": bs.remove(state["must"], d),
            "maybe": bs.remove(state["maybe"], d),
            "cut": ncut.astype(I32),
        }
        return nstate, cost.astype(VALUE_DTYPE), d.astype(I32), valid

    def pack(self, state):
        return jnp.concatenate([
            jax.lax.bitcast_convert_type(state["must"], I32).reshape(-1),
            jax.lax.bitcast_convert_type(state["maybe"], I32).reshape(-1),
            state["cut"],
        ])

    def unpack(self, cols):
        from ddo_tpu.ops import bitset as _bs
        L = _bs.nb_lanes(self.nb_variables)
        cols = np.asarray(cols, np.int32)
        return {
            "must": cols[:L].view(np.uint32),
            "maybe": cols[L : 2 * L].view(np.uint32),
            "cut": cols[2 * L :],
        }


class SrflpRelax(Relaxation):
    def __init__(self, problem: Srflp):
        self.problem = problem

    @property
    def data(self):
        return self.problem.data

    def merge(self, data, states, mask):
        """relax.rs merge: per-entry min cut over carriers, INF elsewhere."""
        n = self.problem.nb_variables
        m = mask[:, None]
        full = jnp.asarray(np.uint32(0xFFFFFFFF))
        agree = bs.and_reduce(jnp.where(m, states["must"], full), axis=0)
        all_must = bs.or_reduce(jnp.where(m, states["must"], 0), axis=0)
        all_maybe = bs.or_reduce(jnp.where(m, states["maybe"], 0), axis=0)
        must_b = jax.vmap(lambda s: bs.to_bits(s, n))(states["must"])
        maybe_b = jax.vmap(lambda s: bs.to_bits(s, n))(states["maybe"])
        carrier = m & (must_b | maybe_b)
        cut = jnp.min(jnp.where(carrier, states["cut"], INF), axis=0)
        return {
            "must": agree,
            "maybe": (all_maybe | all_must) & ~agree,
            "cut": cut.astype(I32),
        }

    def rub(self, data, state, depth):
        """relax.rs fast_upper_bound."""
        pb = self.problem
        n = pb.nb_variables
        m = n * (n - 1) // 2
        must_bits = bs.to_bits(state["must"], n)
        maybe_bits = bs.to_bits(state["maybe"], n)
        cut = state["cut"]

        ca = n - depth
        n_must = jnp.sum(must_bits.astype(I32))
        n_fm = ca - n_must  # departments taken from the maybe pool
        n_flows = ca * (ca - 1) // 2

        # --- length selection along the ascending (l, i) order ------------
        sl_i, sl_l = data["sl_i"], data["sl_l"]
        is_must = must_bits[sl_i]
        is_maybe = maybe_bits[sl_i]
        mb_rank = jnp.cumsum(is_maybe.astype(I32))  # 1-based within maybes
        sel_maybe = is_maybe & (mb_rank <= n_fm)
        sel = is_must | sel_maybe
        lengths_sel = jnp.sort(jnp.where(sel, sl_l, INF))  # ascending, real first
        maybe_lengths = jnp.sort(jnp.where(sel_maybe, sl_l, INF))

        # --- flow selection along the ascending (f, i, j) order ------------
        fi, fj, ff = data["sf_i"], data["sf_j"], data["sf_f"]
        mi, mj = must_bits[fi], must_bits[fj]
        bi, bj = maybe_bits[fi], maybe_bits[fj]
        cat_mm = mi & mj
        cat_mb = (mi & bj) | (bi & mj)
        cat_bb = bi & bj
        q_mb = n_must * n_fm
        q_bb = n_fm * jnp.maximum(n_fm - 1, 0) // 2
        sel_mb = cat_mb & (jnp.cumsum(cat_mb.astype(I32)) <= q_mb)
        sel_bb = cat_bb & (jnp.cumsum(cat_bb.astype(I32)) <= q_bb)
        fsel = cat_mm | sel_mb | sel_bb
        flows_desc = -jnp.sort(jnp.where(fsel, -ff, 1))  # descending, real first

        # --- edge bound: largest flows x cumulated shortest lengths -------
        # flow idx groups: group g holds (ca-1-g) flows, multiplier =
        # prefix length sum up to g
        g_ids = jnp.arange(n, dtype=I32)
        offs = g_ids * (ca - 1) - g_ids * (g_ids - 1) // 2  # group start offsets
        offs = jnp.where(g_ids < ca, offs, jnp.asarray(1 << 30, I32))
        idxs = jnp.arange(m, dtype=I32)
        grp = jnp.sum((offs[None, :] <= idxs[:, None]).astype(I32), axis=1) - 1
        lens_real = jnp.where(lengths_sel < INF, lengths_sel, 0)
        cumlen = jnp.concatenate([jnp.zeros(1, I32), jnp.cumsum(lens_real)])
        mult = cumlen[jnp.clip(grp, 0, n - 1)]
        edge_bound = jnp.sum(
            jnp.where(idxs < n_flows, mult * jnp.maximum(flows_desc, 0), 0)
        )

        # --- cut bound: greedy by descending cut/length ratio --------------
        # must entries use their own (cut, len); maybe pairs k-th smallest
        # length with k-th largest cut
        mlen_real = jnp.where(maybe_lengths < INF, maybe_lengths, 1)
        # k-th smallest maybe length pairs with (n_fm-1-k)-th smallest cut:
        # the n_fm smallest cuts, matched largest-cut-to-shortest-length
        mcut_asc = jnp.sort(jnp.where(maybe_bits, cut, INF))
        karr = jnp.arange(n, dtype=I32)
        pair_valid = karr < n_fm
        mcut_desc = mcut_asc[jnp.clip(n_fm - 1 - karr, 0, n - 1)]
        # combined candidate list: n must slots + n maybe-pair slots
        ratio_c = jnp.concatenate([
            jnp.where(must_bits, cut, 0),
            jnp.where(pair_valid, mcut_desc, 0),
        ])
        ratio_l = jnp.concatenate([
            jnp.where(must_bits, data["lengths"], 1),
            jnp.where(pair_valid, mlen_real, 1),
        ])
        ratio_on = jnp.concatenate([must_bits, pair_valid])
        ratio = ratio_c.astype(F32) / ratio_l.astype(F32)
        # sort by (ratio, l, c) descending, inactive last
        keys = ((~ratio_on).astype(I32), -ratio, -ratio_l, -ratio_c)
        _, _, _, _, s_on, s_l, s_c = jax.lax.sort(
            keys + (ratio_on, ratio_l, ratio_c), num_keys=4
        )
        lens2 = jnp.where(s_on, s_l, 0)
        cum2 = jnp.concatenate([jnp.zeros(1, I32), jnp.cumsum(lens2)])[:-1]
        cut_bound = jnp.sum(jnp.where(s_on, cum2 * s_c, 0))

        return (-(cut_bound + edge_bound)).astype(VALUE_DTYPE)


class SrflpRanking(StateRanking):
    """heuristics.rs SrflpRanking compares depth — constant in a layer."""

    def score(self, data, state):
        return jnp.zeros((1,), I32)

    def score_host(self, state):
        return 0


class SrflpWidth(WidthHeuristic):
    def __init__(self, nb_vars: int, factor: int = 1):
        self.nb_vars = nb_vars
        self.factor = factor

    def max_width(self, sub):
        return self.nb_vars * (int(sub.depth) + 1) * self.factor


def read_instance(path: str) -> Srflp:
    """io_utils.rs: n, lengths, flow matrix (commas allowed); files whose
    name contains "Cl" add a clearance of 10 to every length."""
    import os

    rows = []
    with open(path) as f:
        for line in f:
            line = line.replace(",", " ").strip()
            if line:
                rows.append([int(x) for x in line.split()])
    n = rows[0][0]
    lengths = rows[1][:n]
    flows = [r[:n] for r in rows[2 : 2 + n]]
    if "Cl" in os.path.basename(path):
        lengths = [l + 10 for l in lengths]
    return Srflp(lengths, flows)

"""Aircraft Landing Problem (ALP) — tensorized DP model.

Reference model: /root/reference/ddo/examples/alp/{model,dominance,
io_utils}.rs
  * state = remaining aircraft per class + per-runway (prev_time,
    prev_class) pairs kept SORTED for runway symmetry breaking
    (model.rs AlpState / transition);
  * decision value = class + nb_classes * runway, or DUMMY(-1) once all
    aircraft are scheduled (model.rs to_decision / for_each_in_domain);
  * a state dies if some class's next aircraft can land on no runway
    (model.rs:135-138); duplicate runway states are branched once;
  * arrival time = max(target, prev_time + separation) with DUMMY
    (unknown) previous class using the min separation into the class
    (model.rs get_arrival_time);
  * cost = -(arrival - target)  (minimize total delay);
  * merge: elementwise min rem / min prev_time with DUMMY class
    (model.rs AlpRelax::merge); rub = 0;
  * ranking = total prev_time (model.rs AlpRanking);
  * dominance: key = (rem, prev_classes), coords = -prev_times, value
    (dominance.rs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ddo_tpu.core.problem import Dominance, Problem, Relaxation, StateRanking
from ddo_tpu.utils.num import INF, VALUE_DTYPE

I32 = jnp.int32
DUMMY = -1


class Alp(Problem):
    #: bundled model: all hooks route instance data through `data`
    #: pytrees / root state; trace-relevant scalars are in _trace_statics
    shares_traces = True
    _trace_statics = ('nb_classes', 'nb_runways')
    name = "alp"

    def __init__(self, nb_classes, nb_runways, target, latest, classes, separation):
        self.nb_classes = int(nb_classes)
        self.nb_runways = int(nb_runways)
        self.target = np.asarray(target, np.int64)
        self.latest = np.asarray(latest, np.int64)
        self.classes = np.asarray(classes, np.int64)
        self.sep = np.asarray(separation, np.int64)
        n = self.nb_variables = int(self.target.shape[0])
        self.domain_size = self.nb_classes * self.nb_runways + 1  # + DUMMY
        # next[c][rem] = aircraft to schedule next for class c (model.rs:31-35)
        nxt = np.zeros((self.nb_classes, n + 1), np.int64)
        fill = [[0] for _ in range(self.nb_classes)]
        for i in range(n - 1, -1, -1):
            fill[self.classes[i]].append(i)
        for c in range(self.nb_classes):
            nxt[c, : len(fill[c])] = fill[c]
        self.min_sep_to = self.sep.min(axis=0)

        # --- RUB precomputes (see AlpRelax.rub) -------------------------
        # rub_tsort[c, m, k] = k-th smallest target among the m remaining
        # class-c planes (the remaining set is a fixed function of m:
        # planes next[c][1..m]); rub_off[c, k] = floor(k/R) * sep[c][c],
        # the wave offset of the (k+1)-th class-c landing.
        tsort = np.zeros((self.nb_classes, n + 1, n), np.int64)
        for c in range(self.nb_classes):
            seq = fill[c][1:]  # next[c][k] for k = 1..count_c
            for m in range(1, len(seq) + 1):
                ts = np.sort(self.target[seq[:m]])
                tsort[c, m, : m] = ts
        karr = np.arange(n, dtype=np.int64)
        off = (karr[None, :] // max(1, self.nb_runways)) * np.diag(self.sep)[:, None]
        self._data = dict(
            target=jnp.asarray(self.target, I32),
            latest=jnp.asarray(self.latest, I32),
            classes=jnp.asarray(self.classes, I32),
            sep=jnp.asarray(self.sep, I32),
            next=jnp.asarray(nxt, I32),
            min_sep_to=jnp.asarray(self.min_sep_to, I32),
            rub_tsort=jnp.asarray(tsort, I32),
            rub_off=jnp.asarray(off, I32),
        )

    @property
    def data(self):
        return self._data

    def initial_state(self, data):
        rem = np.zeros(self.nb_classes, np.int64)
        for c in self.classes:
            rem[c] += 1
        return {
            "rem": jnp.asarray(rem, I32),
            "rw_time": jnp.zeros(self.nb_runways, I32),
            "rw_class": jnp.full(self.nb_runways, DUMMY, I32),
        }

    def _arrival(self, data, rw_time, rw_class, aircraft):
        """model.rs get_arrival_time, vectorized over runways: [R]."""
        tgt = data["target"][aircraft]
        cls = data["classes"][aircraft]
        sep = jnp.where(
            rw_class == DUMMY,
            data["min_sep_to"][cls],
            data["sep"][jnp.clip(rw_class, 0, self.nb_classes - 1), cls],
        )
        fresh = (rw_time == 0) & (rw_class == DUMMY)
        return jnp.where(fresh, tgt, jnp.maximum(tgt, rw_time + sep))

    def step(self, data, state, var, d, depth):
        C, R = self.nb_classes, self.nb_runways
        rem = state["rem"]
        rw_time, rw_class = state["rw_time"], state["rw_class"]
        is_dummy = d == C * R
        c = jnp.clip(d % C, 0, C - 1)
        r = jnp.clip(d // C, 0, R - 1)

        tot_rem = jnp.sum(rem)
        # candidate aircraft per class: [C]
        craft = data["next"][jnp.arange(C), jnp.clip(rem, 0, self.nb_variables)]
        # arrivals [C, R]
        arr = jax.vmap(
            lambda a: self._arrival(data, rw_time, rw_class, a)
        )(craft)
        feas = arr <= data["latest"][craft][:, None]  # [C, R]
        class_ok = jnp.any(feas, axis=1) | (rem == 0)
        all_ok = jnp.all(class_ok)
        # runway symmetry: skip runway r if runway r-1 has an identical
        # (time, class) pair (infos are kept sorted)
        dup = jnp.concatenate([
            jnp.zeros(1, bool),
            (rw_time[1:] == rw_time[:-1]) & (rw_class[1:] == rw_class[:-1]),
        ])
        valid = jnp.where(
            is_dummy,
            tot_rem == 0,
            (rem[c] > 0) & feas[c, r] & ~dup[r] & all_ok & (tot_rem > 0),
        )

        aircraft = craft[c]
        arrival = arr[c, r]
        cost = jnp.where(is_dummy, 0, -(arrival - data["target"][aircraft]))

        nrem = rem.at[c].add(jnp.where(is_dummy, 0, -1))
        nt = jnp.where(jnp.arange(R) == r, arrival, rw_time)
        nc = jnp.where(jnp.arange(R) == r, c, rw_class)
        # keep runway infos sorted by (time, class) (model.rs transition)
        nt_s, nc_s = jax.lax.sort((nt, nc), num_keys=2)
        nstate = {
            "rem": jnp.where(is_dummy, rem, nrem).astype(I32),
            "rw_time": jnp.where(is_dummy, rw_time, nt_s).astype(I32),
            "rw_class": jnp.where(is_dummy, rw_class, nc_s).astype(I32),
        }
        dval = jnp.where(is_dummy, DUMMY, d).astype(I32)
        return nstate, cost.astype(VALUE_DTYPE), dval, valid

    def pack(self, state):
        # sorted-leaf order (rem, rw_class, rw_time) so the default unpack
        # inverts it
        return jnp.concatenate([state["rem"], state["rw_class"], state["rw_time"]])


class AlpRelax(Relaxation):
    def __init__(self, problem: Alp):
        self.problem = problem

    @property
    def data(self):
        return self.problem.data

    def merge(self, data, states, mask):
        """model.rs AlpRelax::merge: min rem / min time, DUMMY class."""
        m = mask[:, None]
        big = jnp.asarray(INF, I32)
        rem = jnp.min(jnp.where(m, states["rem"], big), axis=0)
        t = jnp.min(jnp.where(m, states["rw_time"], big), axis=0)
        R = self.problem.nb_runways
        return {
            "rem": rem.astype(I32),
            "rw_time": t.astype(I32),
            "rw_class": jnp.full(R, DUMMY, I32),
        }

    def rub(self, data, state, depth):
        """Admissible delay lower bound (the reference ships rub = 0,
        alp/model.rs:250-252, and closes ALP by raw node throughput —
        VERDICT r4 #5 asked for a real bound).

        Per class c with m remaining planes: in ANY completion, the k-th
        smallest class-c landing time is >= b_c + floor((k-1)/R)*sep[c,c]
        (pigeonhole over the R runways: among the first k class-c
        landings some runway hosts ceil(k/R), spaced >= sep[c,c] apart
        and starting >= b_c = min_r availability of runway r for class c;
        other classes' landings only push availabilities later) and also
        >= the k-th smallest remaining target (each landing >= its own
        target).  Total class delay = sum(landings) - sum(targets)
        >= sum_k max(0, b_c + off_k - tsort_k).  Classes are independent
        relaxations of the same schedule, so their bounds add."""
        C = self.problem.nb_classes
        n = self.problem.nb_variables
        rem = state["rem"]
        # b_c = min_r (rw_time[r] + sep(rw_class[r], c)); fresh runways
        # (time 0, DUMMY class) contribute 0 (the target max covers them)
        rw_time, rw_class = state["rw_time"], state["rw_class"]
        R = rw_time.shape[0]
        sep_in = jnp.where(
            rw_class[None, :] == DUMMY,
            jnp.broadcast_to(data["min_sep_to"][:, None], (C, R)),
            data["sep"][jnp.clip(rw_class, 0, C - 1)].T,  # [C, R]
        )
        fresh = (rw_time == 0) & (rw_class == DUMMY)
        avail = jnp.where(fresh[None, :], 0, rw_time[None, :] + sep_in)
        b = jnp.min(avail, axis=1)  # [C]
        tsort = data["rub_tsort"][jnp.arange(C), jnp.clip(rem, 0, n)]  # [C, n]
        karr = jnp.arange(n, dtype=I32)[None, :]
        inplay = karr < rem[:, None]
        delay = jnp.where(
            inplay,
            jnp.maximum(0, b[:, None] + data["rub_off"] - tsort),
            0,
        )
        return (-jnp.sum(delay)).astype(VALUE_DTYPE)


class AlpRanking(StateRanking):
    """model.rs AlpRanking: larger total prev_time preferred."""

    def score(self, data, state):
        return jnp.sum(state["rw_time"]).reshape(1)

    def score_host(self, state):
        return int(np.asarray(state["rw_time"]).sum())


class AlpDominance(Dominance):
    """dominance.rs: key = (rem, runway classes), coords = -prev_times."""

    use_value = True

    def key_cols(self, state):
        return jnp.concatenate([
            jnp.ravel(state["rem"]).astype(jnp.int32),
            jnp.ravel(state["rw_class"]).astype(jnp.int32),
        ])

    def coord_cols(self, state):
        return -jnp.ravel(state["rw_time"]).astype(jnp.int32)


def read_instance(path: str) -> Alp:
    """io_utils.rs: flat whitespace numbers: n, C, R, then per aircraft
    (target, latest, class), then the CxC separation matrix."""
    data = []
    with open(path) as f:
        for line in f:
            data.extend(int(x) for x in line.split())
    n, C, R = data[0], data[1], data[2]
    cnt = 3
    target, latest, classes = [], [], []
    for _ in range(n):
        target.append(data[cnt])
        latest.append(data[cnt + 1])
        classes.append(data[cnt + 2])
        cnt += 3
    sep = np.asarray(data[cnt : cnt + C * C], np.int64).reshape(C, C)
    return Alp(C, R, target, latest, classes, sep)

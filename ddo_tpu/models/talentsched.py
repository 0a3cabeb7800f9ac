"""Talent scheduling — tensorized DP model.

Reference model: /root/reference/ddo/examples/talentsched/model.rs
  * state = {scenes still to schedule, maybe-scenes} as scene bitsets
    (model.rs TalentSchedState);
  * domain = schedulable scenes; maybe-scenes allowed only while more
    positions than certain scenes remain (model.rs for_each_in_domain);
  * cost = pay for present-but-idle actors during the scheduled scene
    (model.rs transition_cost, get_present);
  * merge: scenes intersection, maybes union (model.rs merge);
  * rough bound: fractional actor-payment bound (model.rs
    fast_upper_bound) — computed in f32 with a +1/1e-5 slack so float
    rounding can only loosen (never falsely tighten) the bound;
  * ranking = |scenes| + |maybe| (model.rs TalentSchedRanking).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ddo_tpu.core.problem import Problem, Relaxation, StateRanking
from ddo_tpu.ops import bitset as bs
from ddo_tpu.utils.num import VALUE_DTYPE

I32 = jnp.int32
F32 = jnp.float32


class TalentSched(Problem):
    #: bundled model: all hooks route instance data through `data`
    #: pytrees / root state; trace-relevant scalars are in _trace_statics
    shares_traces = True
    name = "talentsched"

    def __init__(self, nb_scenes, nb_actors, cost, duration, actors):
        self.nb_variables = int(nb_scenes)
        self.domain_size = int(nb_scenes)
        self.nb_actors = int(nb_actors)
        self.cost = np.asarray(cost, np.int64)
        self.duration = np.asarray(duration, np.int64)
        self.actor_mat = np.asarray(actors, np.int64)  # [A, n] incidence
        init_cost = int(
            (self.actor_mat * self.cost[:, None] * self.duration[None, :]).sum()
        )
        self.initial = -init_cost
        self._data = dict(
            cost=jnp.asarray(self.cost, I32),
            duration=jnp.asarray(self.duration, I32),
            scene_actors=jnp.asarray(self.actor_mat.T.astype(bool)),  # [n, A]
        )

    @property
    def data(self):
        return self._data

    def initial_state(self, data):
        n = self.nb_variables
        return {
            "scenes": bs.full_set(n),
            "maybe": bs.empty_set(n),
        }

    def initial_value(self, data):
        return jnp.asarray(self.initial, VALUE_DTYPE)

    def _present(self, data, scenes_bits, maybe_bits):
        """model.rs get_present: actors needed both by an already-scheduled
        scene and by a still-to-schedule scene."""
        decided = ~scenes_bits & ~maybe_bits
        sa = data["scene_actors"]  # [n, A]
        after = jnp.any(sa & scenes_bits[:, None], axis=0)
        before = jnp.any(sa & decided[:, None], axis=0)
        return before & after  # [A]

    def step(self, data, state, var, d, depth):
        n = self.nb_variables
        scenes_bits = bs.to_bits(state["scenes"], n)
        maybe_bits = bs.to_bits(state["maybe"], n)
        in_scenes = scenes_bits[d]
        count = jnp.sum(scenes_bits.astype(I32))
        maybe_ok = (var + count) < n
        valid = in_scenes | (maybe_bits[d] & maybe_ok)

        present = self._present(data, scenes_bits, maybe_bits)
        pay = present & ~data["scene_actors"][d]
        cost = -(jnp.sum(jnp.where(pay, data["cost"], 0)) * data["duration"][d])

        nstate = {
            "scenes": bs.remove(state["scenes"], d),
            "maybe": bs.remove(state["maybe"], d),
        }
        return nstate, cost.astype(VALUE_DTYPE), d.astype(I32), valid

    def pack(self, state):
        return jnp.concatenate([
            jax.lax.bitcast_convert_type(state["scenes"], I32).reshape(-1),
            jax.lax.bitcast_convert_type(state["maybe"], I32).reshape(-1),
        ])

    def unpack(self, cols):
        L = bs.nb_lanes(self.nb_variables)
        cols = np.asarray(cols, np.int32)
        return {
            "scenes": cols[:L].view(np.uint32),
            "maybe": cols[L : 2 * L].view(np.uint32),
        }


class TalentSchedRelax(Relaxation):
    def __init__(self, problem: TalentSched):
        self.problem = problem

    @property
    def data(self):
        return self.problem.data

    def merge(self, data, states, mask):
        """model.rs merge: scenes = intersection, maybes = union minus."""
        m = mask[:, None]
        full = jnp.asarray(np.uint32(0xFFFFFFFF))
        scenes = bs.and_reduce(jnp.where(m, states["scenes"], full), axis=0)
        union = bs.or_reduce(
            jnp.where(m, states["scenes"] | states["maybe"], 0), axis=0
        )
        return {"scenes": scenes, "maybe": union & ~scenes}

    def rub(self, data, state, depth):
        """Fractional payment bound (model.rs fast_upper_bound)."""
        pb = self.problem
        n, A = pb.nb_variables, pb.nb_actors
        scenes_bits = bs.to_bits(state["scenes"], n)
        maybe_bits = bs.to_bits(state["maybe"], n)
        present = pb._present(data, scenes_bits, maybe_bits)  # [A]
        sa = data["scene_actors"]  # [n, A]
        pa = sa & present[None, :] & scenes_bits[:, None]  # [n, A]
        costs = data["cost"].astype(F32)
        tc = jnp.sum(jnp.where(pa, costs[None, :], 0.0), axis=1)  # [n]
        tc2 = jnp.sum(jnp.where(pa, costs[None, :] ** 2, 0.0), axis=1)
        nonempty = tc > 0
        dur = data["duration"].astype(F32)
        safe_tc = jnp.where(nonempty, tc, 1.0)
        lb = -jnp.sum(jnp.where(nonempty, dur * (tc + tc2 / safe_tc) / 2.0, 0.0))
        r = jnp.sum(jnp.where(pa, (dur / safe_tc)[:, None], 0.0), axis=0)  # [A]
        # actors ordered by increasing r (ties by index): prefix-weighted sum
        ridx = jnp.arange(A, dtype=I32)
        r_s, idx_s = jax.lax.sort((r, ridx), num_keys=2)
        cost_s = costs[idx_s]
        pres_s = present[idx_s]
        contrib = jnp.where(pres_s, r_s * cost_s, 0.0)
        sum_e = jnp.cumsum(contrib)
        lb = lb + jnp.sum(jnp.where(pres_s, cost_s * sum_e, 0.0))
        ub = -jnp.ceil(lb)
        # f32 slack: only ever loosen the bound
        slack = jnp.ceil(jnp.abs(ub) * 1e-5) + 1
        return (ub + slack).astype(VALUE_DTYPE)


class TalentSchedRanking(StateRanking):
    """|scenes| + |maybe| (model.rs TalentSchedRanking)."""

    def score(self, data, state):
        return (bs.count(state["scenes"]) + bs.count(state["maybe"])).reshape(1)

    def score_host(self, state):
        c = 0
        for lanes in (state["scenes"], state["maybe"]):
            c += sum(bin(int(x)).count("1") for x in np.asarray(lanes, np.uint32))
        return c


def read_instance(path: str) -> TalentSched:
    """io_utils.rs read_instance: name line, nb_scenes, nb_actors, then
    per-actor scene incidences + cost, finally the scene durations."""
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip()]
    lines = lines[1:]  # instance name
    first = lines[0].split()
    if len(first) >= 2:
        nb_scenes, nb_actors = int(first[0]), int(first[1])
        rest = lines[1:]
    else:
        nb_scenes = int(first[0])
        nb_actors = int(lines[1].split()[0])
        rest = lines[2:]
    actors, cost = [], []
    for i in range(nb_actors):
        nums = [int(x) for x in rest[i].split()]
        actors.append(nums[:nb_scenes])
        cost.append(nums[nb_scenes])
    duration = [int(x) for x in rest[nb_actors].split()[:nb_scenes]]
    return TalentSched(nb_scenes, nb_actors, cost, duration, actors)

"""The dense, batched MDD compilation engine — TPU-native re-design of the
reference "clean" vector MDD (/root/reference/ddo/src/implementation/mdd/clean.rs).

Design inversion
================
The reference compiles one DD with per-node hash maps, `Arc` pointers and
user closures (clean.rs:345-381,728-776).  Here one compilation is a single
jitted XLA program over fixed-shape tensors:

  * a layer is a structure-of-arrays `[W]` slab (validity-masked), all
    layers stored as `[n+1, W]` for the bottom-up passes;
  * expansion applies the model's `step` via `vmap` over `[W, D]` at once
    (replaces `for_each_in_domain` + `transition`, clean.rs:360-370);
  * duplicate-state detection = canonical key packing + `lexsort` +
    segment-reduce (replaces the `FxHashMap` in clean.rs:143,738);
  * restriction/relaxation = masked top-k by (value, ranking) with a
    *traced* effective width, so width heuristics never trigger recompiles
    (replaces clean.rs:802-876);
  * edges are stored outbound as `[n, W, D]` (child slot, cost, decision
    value, valid): the bottom-up local-bound (clean.rs:448-475) and
    threshold (clean.rs:478-532) passes become per-layer gathers + masked
    reductions;
  * exactness/cutset bookkeeping (NodeFlags, node_flags.rs:48-63) becomes
    parallel boolean planes.

Semantic parity notes (checked against the reference's inline tests):
  * squash gating: restriction whenever a layer exceeds the width;
    relaxation only from the third DD layer on (clean.rs:779-794 requires
    `layers.len() > 1` at promotion time);
  * the LEL is the layer *before* the first squashed one (clean.rs:796-800);
  * tie-breaking on best-edge selection follows the reference's `>=` rule
    (last appended edge wins, clean.rs:215-218): our append order is
    (parent slot, domain slot) ascending, so we take the max flat index
    among maximal-value candidate edges;
  * one deliberate divergence: when a relaxed merge "recycles" a kept node
    (clean.rs:830,868-875) the reference both keeps the saved node's
    original in-edges and *copies* them (relaxed) onto the recycled node.
    Our single-pointer edge store keeps only the original edge, which can
    only make the relaxed bound tighter — still admissible.

Everything is written for `jax.vmap` over a batch of subproblems (the
branch-and-bound superstep) and for `shard_map` over a device mesh.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ddo_tpu.core.problem import ModelBundle
from ddo_tpu.core.types import CompilationType, CutsetType, SubProblem, state_key_bytes
from ddo_tpu.utils.num import INF, NEG_INF, VALUE_DTYPE, sat_add, sat_sub

I32 = jnp.int32


@dataclasses.dataclass(frozen=True)
class DDSpec:
    """Static configuration of one compilation kernel (jit cache key)."""

    bundle: ModelBundle
    width: int  # W: layer buffer width (static)
    comp_type: CompilationType
    cutset_type: CutsetType

    def __hash__(self):
        return hash((self.bundle, self.width, self.comp_type, self.cutset_type))


def _tree_stack_template(state, dims):
    """Zeros-like stacked pytree with leading dims `dims`."""
    return jax.tree_util.tree_map(
        lambda x: jnp.zeros(dims + jnp.shape(x), jnp.asarray(x).dtype), state
    )


def _tree_get(tree, idx):
    return jax.tree_util.tree_map(lambda a: a[idx], tree)


def _tree_set(tree, idx, val):
    return jax.tree_util.tree_map(lambda a, v: a.at[idx].set(v), tree, val)


def _tree_where(cond, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(cond, x, y), a, b)


def _tree_where_mask(mask, a, b):
    """Elementwise select with a [W] mask over [W, ...] leaves."""

    def sel(x, y):
        m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim))
        return jnp.where(m, x, y)

    return jax.tree_util.tree_map(sel, a, b)


def compile_kernel(spec: DDSpec, datas, root_state, root_value, root_depth, best_lb,
                   eff_width, root_path_set=None):
    """Trace-time body of one DD compilation.  All args but `spec` traced.

    Returns a dict of device arrays describing the full compiled diagram
    (layers, edges, flags, bounds, thresholds, cutset, best nodes).
    """
    problem = spec.bundle.problem
    rlx = spec.bundle.relaxation
    ranking = spec.bundle.ranking
    pdata, rdata, kdata = datas

    n = problem.nb_variables
    W = spec.width
    D = problem.domain_size
    C = W * D
    L1 = n + 1
    comp = spec.comp_type
    LEL_NONE = jnp.asarray(n + 1, I32)

    eff_width = jnp.clip(jnp.asarray(eff_width, I32), 1, W)
    best_lb = jnp.asarray(best_lb, VALUE_DTYPE)
    root_value = jnp.asarray(root_value, VALUE_DTYPE)
    root_depth = jnp.asarray(root_depth, I32)

    # --- static variable order (dynamic ordering hook wired per-problem) ----
    order = problem.var_order(pdata)
    dynamic_order = order is None
    if root_path_set is None:
        root_path_set = jnp.zeros((n,), bool)

    # --- vmapped model hooks ------------------------------------------------
    v_rub = jax.vmap(lambda s, dep: rlx.rub(rdata, s, dep), in_axes=(0, None))
    v_step = jax.vmap(
        jax.vmap(
            lambda s, var, d, dep: problem.step(pdata, s, var, d, dep),
            in_axes=(None, None, 0, None),
        ),
        in_axes=(0, None, None, None),
    )
    v_pack = jax.vmap(problem.pack)
    v_rank = jax.vmap(lambda s: jnp.atleast_1d(jnp.asarray(ranking.score(kdata, s), I32)))

    # --- storage ------------------------------------------------------------
    S_state = _tree_stack_template(root_state, (L1, W))
    S_val = jnp.full((L1, W), NEG_INF, VALUE_DTYPE)
    S_mask = jnp.zeros((L1, W), bool)
    S_exact = jnp.zeros((L1, W), bool)
    S_relaxed = jnp.zeros((L1, W), bool)
    S_rub = jnp.full((L1, W), INF, VALUE_DTYPE)
    S_bp = jnp.full((L1, W), -1, I32)  # best in-edge: parent slot
    S_bd = jnp.zeros((L1, W), I32)  # best in-edge: decision value
    E_child = jnp.full((n, W, D), -1, I32)
    E_cost = jnp.zeros((n, W, D), VALUE_DTYPE)
    E_dval = jnp.zeros((n, W, D), I32)
    E_valid = jnp.zeros((n, W, D), bool)
    var_of = jnp.zeros((n,), I32)

    # root layer occupies slot 0 of layer `root_depth` (clean.rs:383-405)
    S_state = _tree_set(S_state, (root_depth, 0), root_state)
    S_val = S_val.at[root_depth, 0].set(root_value)
    S_mask = S_mask.at[root_depth, 0].set(True)
    S_exact = S_exact.at[root_depth, 0].set(True)

    zero_layer_state = _tree_get(S_state, 0)

    def forward_step(i, carry):
        (S_state, S_val, S_mask, S_exact, S_relaxed, S_rub, S_bp, S_bd,
         E_child, E_cost, E_dval, E_valid, var_of, assigned, lel, expanded, overflow) = carry

        active = i >= root_depth
        c_state = _tree_get(S_state, i)
        c_val = S_val[i]
        c_mask = S_mask[i] & active
        c_exact = S_exact[i]

        if dynamic_order:
            var = problem.next_variable(pdata, i, c_state, c_mask, assigned)
        else:
            var = order[i]
        var = jnp.asarray(var, I32)
        var_of = var_of.at[i].set(var)
        assigned = assigned.at[var].set(assigned[var] | active)

        # --- RUB pruning (clean.rs:360-365) --------------------------------
        rub = v_rub(c_state, i)
        rub = jnp.where(c_mask, rub, INF)
        S_rub = S_rub.at[i].set(jnp.where(c_mask, rub, S_rub[i]))
        expand_ok = c_mask & (sat_add(c_val, rub) > best_lb)
        expanded = expanded + jnp.sum(expand_ok.astype(I32))

        # --- expansion: vmap over [W, D] -----------------------------------
        dom = jnp.arange(D, dtype=I32)
        nstate, cost, dval, valid = v_step(c_state, var, dom, i)
        valid = valid & expand_ok[:, None]
        cand_val = sat_add(c_val[:, None], cost)  # [W, D]

        # flatten candidates: append order = (parent slot, domain slot)
        f_valid = valid.reshape(C)
        f_val = cand_val.reshape(C)
        f_cost = cost.reshape(C)
        f_dval = dval.reshape(C).astype(I32)
        f_state = jax.tree_util.tree_map(lambda a: a.reshape((C,) + a.shape[2:]), nstate)
        f_parent = jnp.arange(C, dtype=I32) // D
        f_pexact = c_exact[f_parent]

        # --- dedup: lexsort packed keys + segment reduce -------------------
        f_keys = v_pack(f_state)  # [C, K]
        K = f_keys.shape[1]
        inval = (~f_valid).astype(I32)
        sort_keys = tuple(f_keys[:, k] for k in range(K - 1, -1, -1)) + (inval,)
        perm = jnp.lexsort(sort_keys)
        kv = f_keys[perm]
        valid_s = f_valid[perm]
        val_s = f_val[perm]
        first = jnp.concatenate([jnp.ones((1,), bool), jnp.any(kv[1:] != kv[:-1], axis=1)])
        head = valid_s & first
        seg = jnp.cumsum(head.astype(I32)) - 1
        seg = jnp.clip(seg, 0, C - 1)
        U = jnp.sum(head.astype(I32))

        slot_val = jax.ops.segment_max(
            jnp.where(valid_s, val_s, NEG_INF), seg, num_segments=C, indices_are_sorted=True
        )
        slot_exact = (
            jax.ops.segment_min(
                jnp.where(valid_s, f_pexact[perm].astype(I32), 1), seg,
                num_segments=C, indices_are_sorted=True,
            ) == 1
        )
        head_pos = jax.ops.segment_max(
            jnp.where(head, jnp.arange(C, dtype=I32), -1), seg,
            num_segments=C, indices_are_sorted=True,
        )
        rep_flat = perm[jnp.clip(head_pos, 0, C - 1)]
        slot_state = _tree_get(f_state, rep_flat)
        slot_keys = f_keys[rep_flat]
        # best in-edge per slot: max value, ties -> largest flat index
        # (replicates the `>=` update in clean.rs:215-218)
        is_best = valid_s & (val_s == slot_val[seg])
        best_flat = jax.ops.segment_max(
            jnp.where(is_best, perm, -1), seg, num_segments=C, indices_are_sorted=True
        )
        bf = jnp.clip(best_flat, 0, C - 1)
        slot_bp = jnp.where(best_flat >= 0, f_parent[bf], -1)
        slot_bd = jnp.where(best_flat >= 0, f_dval[bf], 0)
        slot_valid = jnp.arange(C, dtype=I32) < U
        cand_slot = jnp.zeros((C,), I32).at[perm].set(seg)  # orig candidate -> slot

        # --- squash: restrict (clean.rs:802-815) / relax (clean.rs:817-876)
        j = i + 1 - root_depth  # DD-local index of the layer being produced
        if comp == CompilationType.RESTRICTED:
            need_restrict = U > eff_width
            need_relax = jnp.asarray(False)
        elif comp == CompilationType.RELAXED:
            need_restrict = jnp.asarray(False)
            need_relax = (U > eff_width) & (j >= 2)
        else:
            need_restrict = jnp.asarray(False)
            need_relax = jnp.asarray(False)

        slot_rank = v_rank(slot_state)  # [C, R]
        R = slot_rank.shape[1]
        inval2 = (~slot_valid).astype(I32)
        order_keys = tuple(-slot_rank[:, r] for r in range(R - 1, -1, -1)) + (-slot_val, inval2)
        order2 = jnp.lexsort(order_keys)  # promising first, invalid last
        rank_of = jnp.zeros((C,), I32).at[order2].set(jnp.arange(C, dtype=I32))

        limit = jnp.where(need_relax, eff_width - 1, jnp.where(need_restrict, eff_width, C))
        kept = slot_valid & (rank_of < limit)
        merge_mask = slot_valid & ~kept & need_relax

        # merged node (only meaningful when need_relax)
        merged_state = rlx.merge(rdata, slot_state, merge_mask)
        merged_key = problem.pack(merged_state)
        eq_kept = kept & jnp.all(slot_keys == merged_key[None, :], axis=1)
        recycled = jnp.any(eq_kept) & need_relax
        recycled_slot = jnp.argmax(eq_kept)
        saved_slot = order2[jnp.clip(limit, 0, C - 1)]  # best of the merge set
        # recycled: the reference keeps eff_width nodes incl. the saved one
        kept2 = kept | (recycled & (jnp.arange(C, dtype=I32) == saved_slot) & slot_valid)
        merge_final = merge_mask & ~(recycled & (jnp.arange(C, dtype=I32) == saved_slot))
        merged_pos = jnp.where(recycled, rank_of[recycled_slot], limit)

        # --- edge remap + relaxed costs ------------------------------------
        e_slot = cand_slot
        e_kept = f_valid & kept2[e_slot]
        e_merge = f_valid & merge_final[e_slot] & need_relax
        if comp == CompilationType.RELAXED:
            # src is the parent's state, dst the original child state
            # (Relaxation::relax, abstraction/dp.rs:93-100)
            src_state = _tree_get(c_state, f_parent)
            rcost = jax.vmap(
                lambda src, dst, dv, c: rlx.relax_cost(rdata, src, dst, merged_state, dv, c, var)
            )(src_state, f_state, f_dval, f_cost)
        else:
            rcost = f_cost
        e_cost = jnp.where(e_merge, rcost, f_cost)
        e_child = jnp.where(
            e_kept, rank_of[e_slot], jnp.where(e_merge, merged_pos, -1)
        ).astype(I32)
        e_valid = f_valid & (e_child >= 0)

        # merged node aggregates (append_edge_to! semantics, clean.rs:199-219)
        m_edge_val = jnp.where(e_merge, sat_add(c_val[f_parent], e_cost), NEG_INF)
        m_val = jnp.max(m_edge_val)
        m_is_best = e_merge & (m_edge_val == m_val)
        m_best_flat = jnp.max(jnp.where(m_is_best, jnp.arange(C, dtype=I32), -1))
        m_bp = jnp.where(m_best_flat >= 0, f_parent[jnp.clip(m_best_flat, 0, C - 1)], -1)
        m_bd = jnp.where(m_best_flat >= 0, f_dval[jnp.clip(m_best_flat, 0, C - 1)], 0)
        m_par_exact_all = jnp.all(jnp.where(e_merge, f_pexact, True))

        # --- materialize next layer [W] by gathering sorted slots ----------
        width_used = jnp.where(
            need_relax | need_restrict, jnp.where(need_relax, limit + 1, eff_width),
            jnp.minimum(U, W),
        )
        overflow = overflow | ((U > W) & ~(need_relax | need_restrict) & active)
        q = jnp.arange(W, dtype=I32)
        sq = order2[jnp.clip(q, 0, C - 1)]
        q_valid = (q < width_used) & slot_valid[sq] & active
        nl_state = _tree_get(slot_state, sq)
        nl_val = slot_val[sq]
        nl_exact = slot_exact[sq]
        nl_relaxed = jnp.zeros((W,), bool)
        nl_bp = slot_bp[sq]
        nl_bd = slot_bd[sq]

        # overrides for the merged node
        is_mpos = need_relax & (q == merged_pos)
        has_medge = m_best_flat >= 0
        # recycled node keeps its own value unless an appended edge is >=
        mv_new = jnp.where(recycled, jnp.maximum(nl_val, m_val), m_val)
        take_medge = has_medge & (jnp.where(recycled, m_val >= slot_val[recycled_slot], True))
        nl_val = jnp.where(is_mpos, mv_new, nl_val)
        nl_bp = jnp.where(is_mpos & take_medge, m_bp, nl_bp)
        nl_bd = jnp.where(is_mpos & take_medge, m_bd, nl_bd)
        nl_exact = jnp.where(
            is_mpos, jnp.where(recycled, nl_exact & m_par_exact_all, False), nl_exact
        )
        nl_relaxed = jnp.where(is_mpos, True, nl_relaxed)
        q_valid = q_valid | (is_mpos & active)
        nl_state = _tree_where_mask(
            is_mpos & ~recycled,
            jax.tree_util.tree_map(
                lambda m, t: jnp.broadcast_to(m, t.shape), merged_state, nl_state
            ),
            nl_state,
        )

        nl_val = jnp.where(q_valid, nl_val, NEG_INF)
        nl_exact = nl_exact & q_valid
        nl_relaxed = nl_relaxed & q_valid

        # LEL bookkeeping (clean.rs:796-800): first squashed layer is j,
        # so the last exact layer is the previous one (absolute index i).
        squashed = (need_relax | need_restrict) & active
        lel = jnp.where(squashed & (lel == LEL_NONE), i, lel)

        # --- store ----------------------------------------------------------
        write = active
        S_state = _tree_where(
            write,
            _tree_set(S_state, i + 1, nl_state),
            S_state,
        )
        S_val = S_val.at[i + 1].set(jnp.where(write, nl_val, S_val[i + 1]))
        S_mask = S_mask.at[i + 1].set(jnp.where(write, q_valid, S_mask[i + 1]))
        S_exact = S_exact.at[i + 1].set(jnp.where(write, nl_exact, S_exact[i + 1]))
        S_relaxed = S_relaxed.at[i + 1].set(jnp.where(write, nl_relaxed, S_relaxed[i + 1]))
        S_bp = S_bp.at[i + 1].set(jnp.where(write, nl_bp, S_bp[i + 1]))
        S_bd = S_bd.at[i + 1].set(jnp.where(write, nl_bd, S_bd[i + 1]))
        E_child = E_child.at[i].set(jnp.where(write, e_child.reshape(W, D), E_child[i]))
        E_cost = E_cost.at[i].set(jnp.where(write, e_cost.reshape(W, D), E_cost[i]))
        E_dval = E_dval.at[i].set(jnp.where(write, f_dval.reshape(W, D), E_dval[i]))
        E_valid = E_valid.at[i].set(jnp.where(write, e_valid.reshape(W, D), E_valid[i]))

        return (S_state, S_val, S_mask, S_exact, S_relaxed, S_rub, S_bp, S_bd,
                E_child, E_cost, E_dval, E_valid, var_of, assigned, lel, expanded, overflow)

    carry = (S_state, S_val, S_mask, S_exact, S_relaxed, S_rub, S_bp, S_bd,
             E_child, E_cost, E_dval, E_valid, var_of, root_path_set,
             LEL_NONE, jnp.asarray(0, I32), jnp.asarray(False))
    carry = jax.lax.fori_loop(0, n, forward_step, carry)
    (S_state, S_val, S_mask, S_exact, S_relaxed, S_rub, S_bp, S_bd,
     E_child, E_cost, E_dval, E_valid, var_of, assigned, lel, expanded, overflow) = carry

    # ======================= finalization ==================================
    term_mask = S_mask[n]
    term_val = jnp.where(term_mask, S_val[n], NEG_INF)
    feasible = jnp.any(term_mask)
    best_slot = jnp.argmax(term_val)
    best_value = term_val[best_slot]
    texact = term_mask & S_exact[n]
    tev = jnp.where(texact, S_val[n], NEG_INF)
    bx_feasible = jnp.any(texact)
    bx_slot = jnp.argmax(tev)
    bx_value = tev[bx_slot]

    is_exact_dd = lel == (n + 1)  # no layer was ever squashed (clean.rs:635)

    # EBPO: exact best path (clean.rs:634-655)
    def ebpo_step(k, st):
        layer = n - k
        slot, res, done = st
        nd_relaxed = S_relaxed[layer, slot]
        nd_exact = S_exact[layer, slot]
        new_done = done | nd_exact | nd_relaxed
        new_res = jnp.where(done, res, jnp.where(nd_exact, True, jnp.where(nd_relaxed, False, res)))
        nslot = jnp.where(new_done, slot, jnp.clip(S_bp[layer, slot], 0, W - 1))
        return (nslot, new_res, new_done)

    if comp == CompilationType.RELAXED:
        _, ebp, _ = jax.lax.fori_loop(
            0, n + 1, ebpo_step, (best_slot, jnp.asarray(True), ~feasible)
        )
        has_ebp = feasible & ebp
    else:
        has_ebp = jnp.asarray(False)

    bx_feasible = bx_feasible | has_ebp
    bx_slot = jnp.where(has_ebp, best_slot, bx_slot)
    bx_value = jnp.where(has_ebp, best_value, bx_value)

    # --- cutset + above-cutset planes (clean.rs:547-606) -------------------
    do_cutset = jnp.asarray(comp == CompilationType.RELAXED) | is_exact_dd
    layer_idx = jnp.arange(L1, dtype=I32)[:, None]
    if spec.cutset_type == CutsetType.LAST_EXACT_LAYER:
        lel_eff = lel  # == n+1 when never squashed
        above = S_mask & (layer_idx <= lel_eff) & do_cutset
        cutflag = S_mask & (layer_idx == lel_eff) & do_cutset
    else:  # FRONTIER (clean.rs:586-606)
        above = S_mask & S_exact & do_cutset
        child_ok = E_valid & (E_child >= 0)
        cc = jnp.clip(E_child, 0, W - 1)
        # child_inexact[l, w, d] = not exact(layer l+1, child slot)
        child_inexact = jax.vmap(lambda ex, idx: ~ex[idx])(S_exact[1:], cc)
        has_inexact_child = jnp.any(child_ok & child_inexact, axis=2)  # [n, W]
        cutflag = jnp.concatenate(
            [S_exact[:n] & S_mask[:n] & has_inexact_child, jnp.zeros((1, W), bool)], axis=0
        ) & do_cutset

    # --- local bounds, bottom-up (clean.rs:448-475) ------------------------
    do_locb = jnp.asarray(comp == CompilationType.RELAXED) & ~is_exact_dd
    value_bot = jnp.full((L1, W), NEG_INF, VALUE_DTYPE)
    marked = jnp.zeros((L1, W), bool)
    value_bot = value_bot.at[n].set(jnp.where(term_mask & do_locb, 0, NEG_INF))
    marked = marked.at[n].set(term_mask & do_locb)

    def locb_step(k, st):
        value_bot, marked = st
        l = n - 1 - k
        cc = jnp.clip(E_child[l], 0, W - 1)
        ev = E_valid[l] & (E_child[l] >= 0)
        cm = ev & marked[l + 1][cc]
        contrib = jnp.where(cm, sat_add(value_bot[l + 1][cc], E_cost[l]), NEG_INF)
        vb = jnp.max(contrib, axis=1)
        mk = jnp.any(cm, axis=1)
        value_bot = value_bot.at[l].set(jnp.where(mk, vb, value_bot[l]))
        marked = marked.at[l].set(mk)
        return (value_bot, marked)

    value_bot, marked = jax.lax.fori_loop(0, n, locb_step, (value_bot, marked))

    # --- thresholds, bottom-up (clean.rs:478-532) --------------------------
    do_thresh = do_cutset
    best_known = jnp.maximum(best_lb, jnp.where(bx_feasible, bx_value, NEG_INF))
    theta = jnp.full((L1, W), INF, VALUE_DTYPE)
    has_theta = jnp.zeros((L1, W), bool)
    if spec.cutset_type == CutsetType.LAST_EXACT_LAYER:
        t_init = term_mask & bx_feasible & is_exact_dd
    else:
        t_init = term_mask & bx_feasible & S_exact[n]
    theta = theta.at[n].set(jnp.where(t_init, best_known, INF))
    has_theta = has_theta.at[n].set(t_init)

    def thresh_step(k, st):
        theta, has_theta = st
        l = n - k
        alive = S_mask[l]
        th = theta[l]
        hs = has_theta[l]
        tot_rub = sat_add(S_val[l], S_rub[l])
        b1 = tot_rub <= best_known
        th1 = sat_sub(best_known, S_rub[l])
        tot_locb = sat_add(S_val[l], value_bot[l])
        in_cut = cutflag[l]
        th2a = jnp.minimum(jnp.where(hs, th, INF), sat_sub(best_known, value_bot[l]))
        th2 = jnp.where(tot_locb <= best_known, th2a, S_val[l])
        b3 = S_exact[l] & ~hs
        new_th = jnp.where(b1, th1, jnp.where(in_cut, th2, jnp.where(b3, INF, th)))
        new_hs = hs | b1 | in_cut | b3
        new_th = jnp.where(alive, new_th, th)
        new_hs = jnp.where(alive, new_hs, hs)
        theta = theta.at[l].set(new_th)
        has_theta = has_theta.at[l].set(new_hs)

        # propagate to the parent layer via in-edges (clean.rs:522-528)
        def prop(theta, has_theta):
            lp = l - 1
            cc = jnp.clip(E_child[lp], 0, W - 1)
            ev = E_valid[lp] & (E_child[lp] >= 0)
            ch_has = ev & new_hs[cc] & alive[cc]
            cand = jnp.where(ch_has, sat_sub(new_th[cc], E_cost[lp]), INF)
            pmin = jnp.min(cand, axis=1)
            p_has = jnp.any(ch_has, axis=1)
            cur = jnp.where(has_theta[lp], theta[lp], INF)
            theta = theta.at[lp].set(jnp.where(p_has, jnp.minimum(cur, pmin), theta[lp]))
            has_theta = has_theta.at[lp].set(has_theta[lp] | p_has)
            return theta, has_theta

        theta, has_theta = jax.lax.cond(
            l > 0, prop, lambda a, b: (a, b), theta, has_theta
        )
        return (theta, has_theta)

    theta, has_theta = jax.lax.cond(
        do_thresh,
        lambda st: jax.lax.fori_loop(0, n + 1, thresh_step, st),
        lambda st: st,
        (theta, has_theta),
    )

    return dict(
        state=S_state, value=S_val, mask=S_mask, exact=S_exact, relaxed=S_relaxed,
        rub=S_rub, bp=S_bp, bd=S_bd, var_of=var_of,
        value_bot=value_bot, marked=marked, theta=theta, has_theta=has_theta,
        above=above, cutflag=cutflag,
        lel=lel, is_exact_dd=is_exact_dd, has_ebp=has_ebp,
        feasible=feasible, best_slot=best_slot, best_value=best_value,
        bx_feasible=bx_feasible, bx_slot=bx_slot, bx_value=bx_value,
        expanded=expanded, overflow=overflow, root_depth=root_depth,
    )


@functools.partial(jax.jit, static_argnums=(0,))
def _compile_jit(spec, datas, root_state, root_value, root_depth, best_lb, eff_width, rps):
    return compile_kernel(
        spec, datas, root_state, root_value, root_depth, best_lb, eff_width, rps
    )


@functools.partial(jax.jit, static_argnums=(0,))
def _compile_vjit(spec, datas, root_states, root_values, root_depths, best_lb,
                  eff_widths, rpss):
    """K-lane batched compilation (the B&B superstep workhorse)."""
    return jax.vmap(
        lambda rs, rv, rd, ew, ps: compile_kernel(spec, datas, rs, rv, rd, best_lb, ew, ps)
    )(root_states, root_values, root_depths, eff_widths, rpss)


class CompiledDD:
    """Host-side view over one compiled diagram (numpy), exposing the
    reference `DecisionDiagram` queries (abstraction/mdd.rs:75-113)."""

    def __init__(self, spec: DDSpec, out, root: SubProblem):
        self.spec = spec
        self.o = jax.tree_util.tree_map(np.asarray, out)
        self.root = root
        self.n = spec.bundle.problem.nb_variables

    # -- queries -------------------------------------------------------------
    def is_exact(self) -> bool:
        return bool(self.o["is_exact_dd"]) or bool(self.o["has_ebp"])

    def best_value(self) -> Optional[int]:
        return int(self.o["best_value"]) if self.o["feasible"] else None

    def best_exact_value(self) -> Optional[int]:
        return int(self.o["bx_value"]) if self.o["bx_feasible"] else None

    def best_solution(self):
        if not self.o["feasible"]:
            return None
        return self._path(self.n, int(self.o["best_slot"]))

    def best_exact_solution(self):
        if not self.o["bx_feasible"]:
            return None
        return self._path(self.n, int(self.o["bx_slot"]))

    def _path(self, layer, slot):
        """Walk best in-edges to the DD root, then prepend the root path
        (clean.rs:325-343)."""
        vals = self.root.path_vals.copy()
        pset = self.root.path_set.copy()
        d0 = int(self.o["root_depth"])
        l, s = layer, slot
        while l > d0:
            var = int(self.o["var_of"][l - 1])
            vals[var] = int(self.o["bd"][l, s])
            pset[var] = True
            s = int(self.o["bp"][l, s])
            l -= 1
            if s < 0:
                break
        return vals, pset

    def node_state(self, layer, slot):
        return jax.tree_util.tree_map(lambda a: a[layer, slot], self.o["state"])

    def drain_cutset(self):
        """Yield `SubProblem`s for every marked cutset node (clean.rs:417-445)."""
        if not self.o["feasible"]:
            return
        best_value = int(self.o["best_value"])
        idx = np.argwhere(self.o["cutflag"] & self.o["marked"])
        for layer, slot in idx:
            layer, slot = int(layer), int(slot)
            value = int(self.o["value"][layer, slot])
            rub = min(value + int(self.o["rub"][layer, slot]), INF)
            locb = min(value + int(self.o["value_bot"][layer, slot]), INF)
            ub = min(rub, locb, best_value)
            vals, pset = self._path(layer, slot)
            state = self.node_state(layer, slot)
            yield SubProblem(
                state=state, value=value, path_vals=vals, path_set=pset,
                ub=ub, depth=layer, key=state_key_bytes(state),
            )

    def cache_updates(self):
        """(depth, state_key, theta, explored) records for the barrier cache
        (clean.rs:534-545)."""
        sel = self.o["has_theta"] & self.o["above"]
        idx = np.argwhere(sel)
        for layer, slot in idx:
            layer, slot = int(layer), int(slot)
            state = self.node_state(layer, slot)
            yield (
                layer,
                state_key_bytes(state),
                int(self.o["theta"][layer, slot]),
                not bool(self.o["cutflag"][layer, slot]),
            )


class DDCompiler:
    """Entry point: compiles restricted/relaxed/exact DDs for a model."""

    def __init__(self, bundle: ModelBundle, width: int,
                 cutset_type: CutsetType = CutsetType.LAST_EXACT_LAYER):
        self.bundle = bundle
        self.width = width
        self.cutset_type = cutset_type
        self._specs = {
            ct: DDSpec(bundle, width, ct, cutset_type) for ct in CompilationType
        }

    def _root_args(self, sub: SubProblem):
        state = jax.tree_util.tree_map(jnp.asarray, sub.state)
        return state, sub.value, sub.depth

    def compile(self, comp_type: CompilationType, sub: SubProblem,
                best_lb: int, eff_width: int) -> CompiledDD:
        spec = self._specs[comp_type]
        rs, rv, rd = self._root_args(sub)
        out = _compile_jit(
            spec, self.bundle.datas, rs, rv, rd, best_lb, eff_width,
            jnp.asarray(sub.path_set),
        )
        return CompiledDD(spec, out, sub)

    def compile_batch(self, comp_type: CompilationType, subs, best_lb: int,
                      eff_widths) -> list:
        """Compile K DDs in one vmapped XLA call; returns per-lane views."""
        spec = self._specs[comp_type]
        states = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
            *[s.state for s in subs],
        )
        values = jnp.asarray([s.value for s in subs], VALUE_DTYPE)
        depths = jnp.asarray([s.depth for s in subs], I32)
        widths = jnp.asarray(eff_widths, I32)
        psets = jnp.asarray(np.stack([s.path_set for s in subs]))
        out = _compile_vjit(
            spec, self.bundle.datas, states, values, depths, best_lb, widths, psets
        )
        outs = jax.tree_util.tree_map(np.asarray, out)
        views = []
        for k, sub in enumerate(subs):
            lane = jax.tree_util.tree_map(lambda a: a[k], outs)
            views.append(CompiledDD(spec, lane, sub))
        return views

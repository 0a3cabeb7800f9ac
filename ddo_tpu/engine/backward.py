"""Fused bottom-up backward pass: local bounds + thresholds in one sweep.

The reference computes local bounds (clean.rs:448-475) and thresholds
(clean.rs:478-532) as two separate bottom-up traversals.  Both walk the
same outbound edge planes, so this module fuses them into a single
reverse pass with two implementations:

  * `backward_scans` — two-in-one `lax.scan` (any backend);
  * `backward_pallas` — a Pallas TPU kernel: one grid step per layer
    (TPU grids iterate sequentially, so VMEM scratch carries the child
    layer's effective bounds/thresholds), the child-value propagation is
    ONE shared one-hot [C, W] @ [W, 4] MXU contraction per layer, and
    edge planes stream HBM -> VMEM through the BlockSpec pipeline.

`fused_backward` dispatches: Pallas on TPU, scans elsewhere
(DDO_TPU_PALLAS=0/1 overrides).  Both return, for layers 0..n-1:
  (vb_stack [n, W] i32, mk_stack [n, W] bool,
   th_stack [n, W] i32, hs_stack [n, W] bool)

Carry encodings match the engine's conventions:
  * locb carry: NEG_INF encodes "unmarked";
  * threshold carry: INF encodes "nothing to propagate".
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ddo_tpu.ops import segments as seg_ops
from ddo_tpu.utils.num import INF, NEG_INF, sat_add, sat_sub

I32 = jnp.int32


def thresh_rules(best_known, alive, val, rub, vb, cutf, exact, th, hs):
    """Per-node threshold rules (clean.rs:503-517)."""
    tot_rub = sat_add(val, rub)
    b1 = tot_rub <= best_known
    th1 = sat_sub(best_known, rub)
    tot_locb = sat_add(val, vb)
    th2a = jnp.minimum(jnp.where(hs, th, INF), sat_sub(best_known, vb))
    th2 = jnp.where(tot_locb <= best_known, th2a, val)
    b3 = exact & ~hs
    new_th = jnp.where(b1, th1, jnp.where(cutf, th2, jnp.where(b3, INF, th)))
    new_hs = hs | b1 | cutf | b3
    return jnp.where(alive, new_th, th), jnp.where(alive, new_hs, hs)


def _layer_body(W, D, best_known, vb_eff, th_eff, ec, eco, ev,
                val_l, rub_l, cutf_l, exact_l, mask_l,
                ep_l=None, wlp_l=None, wlth_l=None):
    """One fused backward layer. Shared between the scan and Pallas paths.

    `ep_l` [W]: per-parent theta contributions from filter-pruned children
    that never materialized (engine in-compilation filtering); `wlp_l` /
    `wlth_l` [W]: within-layer dominance-pruned rows and their thresholds
    (their theta is exactly the pruning threshold, clean.rs:699, and it
    must propagate to parents like any other, clean.rs:522-528)."""
    C = ec.shape[0]
    cc = jnp.clip(ec, 0, W - 1)
    ok = ev & (ec >= 0)
    if C * W <= (1 << 22):
        # one shared one-hot; both carries (12-bit split each) in one matmul
        iota_w = jax.lax.broadcasted_iota(I32, (C, W), 1)
        oh = (cc[:, None] == iota_w).astype(jnp.float32)
        tables = jnp.stack(
            [(vb_eff >> 12).astype(jnp.float32), (vb_eff & 0xFFF).astype(jnp.float32),
             (th_eff >> 12).astype(jnp.float32), (th_eff & 0xFFF).astype(jnp.float32)],
            axis=1,
        )  # [W, 4]
        g4 = jnp.dot(oh, tables, preferred_element_type=jnp.float32)  # [C, 4]
        g_vb = g4[:, 0].astype(I32) * 4096 + g4[:, 1].astype(I32)
        g_th = g4[:, 2].astype(I32) * 4096 + g4[:, 3].astype(I32)
    else:
        # LCS-scale widths: the [C, W] one-hot would not fit; plain gathers
        g_vb = jnp.take(vb_eff, cc)
        g_th = jnp.take(th_eff, cc)

    # local bounds (clean.rs:448-475)
    cm = ok & (g_vb > NEG_INF)
    contrib = jnp.where(cm, sat_add(g_vb, eco), NEG_INF)
    vb_l = jnp.max(contrib.reshape(W, D), axis=1)
    mk_l = jnp.any(cm.reshape(W, D), axis=1)
    new_vb_eff = jnp.where(mk_l, vb_l, NEG_INF)

    # thresholds (clean.rs:478-532)
    g_th = jnp.where(ok, g_th, INF)
    ch_has = g_th < INF
    cand = jnp.where(ch_has, sat_sub(g_th, eco), INF)
    th_l = jnp.min(cand.reshape(W, D), axis=1)
    hs_l = jnp.any(ch_has.reshape(W, D), axis=1)
    if ep_l is not None:
        th_l = jnp.minimum(th_l, ep_l)
        hs_l = hs_l | (ep_l < INF)
    th_l = jnp.where(hs_l, th_l, INF)
    th_l, hs_l = thresh_rules(
        best_known, mask_l, val_l, rub_l, vb_l, cutf_l, exact_l, th_l, hs_l
    )
    if wlp_l is not None:
        use_wl = wlp_l & (wlth_l < INF)
        th_l = jnp.where(use_wl, wlth_l, th_l)
        hs_l = hs_l | use_wl
        new_th_eff = jnp.where(hs_l & (mask_l | use_wl), th_l, INF)
    else:
        new_th_eff = jnp.where(hs_l & mask_l, th_l, INF)
    return new_vb_eff, new_th_eff, vb_l, mk_l, th_l, hs_l


def backward_scans(E_child, E_cost, E_valid, S_val, S_rub, cutflag, S_exact,
                   S_mask, vb_init, th_init, best_known,
                   ep_theta=None, wl_pruned=None, wl_ptheta=None):
    """Reverse lax.scan implementation (any backend)."""
    n, C = E_child.shape
    W = vb_init.shape[0]
    D = C // W
    if ep_theta is None:
        ep_theta = jnp.full((n, W), INF, E_cost.dtype)
    if wl_pruned is None:
        wl_pruned = jnp.zeros((n, W), bool)
        wl_ptheta = jnp.full((n, W), INF, E_cost.dtype)

    def step(carry, xs):
        vb_eff, th_eff = carry
        ec, eco, ev, val_l, rub_l, cutf_l, exact_l, mask_l, ep_l, wlp_l, wlth_l = xs
        nvb, nth, vb_l, mk_l, th_l, hs_l = _layer_body(
            W, D, best_known, vb_eff, th_eff, ec, eco, ev,
            val_l, rub_l, cutf_l, exact_l, mask_l, ep_l, wlp_l, wlth_l,
        )
        return (nvb, nth), (vb_l, mk_l, th_l, hs_l)

    _, (vb, mk, th, hs) = jax.lax.scan(
        step, (vb_init, th_init),
        (E_child, E_cost, E_valid, S_val, S_rub, cutflag, S_exact, S_mask,
         ep_theta, wl_pruned, wl_ptheta),
        reverse=True,
    )
    return vb, mk, th, hs


def _pallas_kernel(W, D, ec_ref, eco_ref, ev_ref, val_ref, rub_ref,
                   cutf_ref, exact_ref, mask_ref, ep_ref, wlp_ref, wlth_ref,
                   vbi_ref, thi_ref, bk_ref,
                   vb_out, mk_out, th_out, hs_out, vb_eff, th_eff):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        vb_eff[:] = vbi_ref[:].reshape(vb_eff.shape)
        th_eff[:] = thi_ref[:].reshape(th_eff.shape)

    nvb, nth, vb_l, mk_l, th_l, hs_l = _layer_body(
        W, D, bk_ref[0],
        vb_eff[:].reshape(W), th_eff[:].reshape(W),
        ec_ref[:].reshape(-1), eco_ref[:].reshape(-1), ev_ref[:].reshape(-1),
        val_ref[:].reshape(W), rub_ref[:].reshape(W), cutf_ref[:].reshape(W),
        exact_ref[:].reshape(W), mask_ref[:].reshape(W),
        ep_ref[:].reshape(W), wlp_ref[:].reshape(W), wlth_ref[:].reshape(W),
    )
    vb_eff[:] = nvb.reshape(vb_eff.shape)
    th_eff[:] = nth.reshape(th_eff.shape)
    vb_out[:] = vb_l.reshape(vb_out.shape)
    mk_out[:] = mk_l.reshape(mk_out.shape)
    th_out[:] = th_l.reshape(th_out.shape)
    hs_out[:] = hs_l.reshape(hs_out.shape)


def backward_pallas(E_child, E_cost, E_valid, S_val, S_rub, cutflag, S_exact,
                    S_mask, vb_init, th_init, best_known,
                    ep_theta=None, wl_pruned=None, wl_ptheta=None,
                    interpret=False):
    """Pallas TPU implementation: grid = layers (bottom-up), VMEM scratch
    carries the child layer's effective values across grid steps."""
    n, C = E_child.shape
    W = vb_init.shape[0]
    D = C // W
    if ep_theta is None:
        ep_theta = jnp.full((n, W), INF, E_cost.dtype)
    if wl_pruned is None:
        wl_pruned = jnp.zeros((n, W), bool)
        wl_ptheta = jnp.full((n, W), INF, E_cost.dtype)

    rev = lambda i: (n - 1 - i, 0)
    edge_spec = pl.BlockSpec((1, C), rev)
    node_spec = pl.BlockSpec((1, W), rev)
    init_spec = pl.BlockSpec((W,), lambda i: (0,))

    out = pl.pallas_call(
        functools.partial(_pallas_kernel, W, D),
        grid=(n,),
        in_specs=[edge_spec, edge_spec, edge_spec, node_spec,
                  node_spec, node_spec, node_spec, node_spec,
                  node_spec, node_spec, node_spec,
                  init_spec, init_spec, init_spec],
        out_specs=[node_spec, node_spec, node_spec, node_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, W), jnp.int32),
            jax.ShapeDtypeStruct((n, W), bool),
            jax.ShapeDtypeStruct((n, W), jnp.int32),
            jax.ShapeDtypeStruct((n, W), bool),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, W), jnp.int32),
            pltpu.VMEM((1, W), jnp.int32),
        ],
        interpret=interpret,
    )(
        E_child, E_cost, E_valid, S_val, S_rub, cutflag, S_exact, S_mask,
        ep_theta, wl_pruned, wl_ptheta,
        vb_init, th_init,
        jnp.full((W,), jnp.asarray(best_known, I32)),  # scalar as a VMEM row
    )
    return tuple(out)


def fused_backward(E_child, E_cost, E_valid, S_val, S_rub, cutflag, S_exact,
                   S_mask, vb_init, th_init, best_known,
                   ep_theta=None, wl_pruned=None, wl_ptheta=None):
    """Dispatch between the two implementations.

    Default is the fused scan: the Pallas kernel is correct (see
    tests/test_backward_pallas.py) but the engine compiles under a K-lane
    `vmap`, and Pallas' vmap batching rule inserts the batch as the
    second-to-last block dimension, which violates the TPU lowering's
    (8, 128) minimum tile on per-layer (1, C) blocks.  Set
    DDO_TPU_PALLAS=1 to force the Pallas path (single-lane compiles)."""
    if os.environ.get("DDO_TPU_PALLAS") == "1":
        return backward_pallas(E_child, E_cost, E_valid, S_val, S_rub,
                               cutflag, S_exact, S_mask, vb_init, th_init,
                               best_known, ep_theta, wl_pruned, wl_ptheta)
    return backward_scans(E_child, E_cost, E_valid, S_val, S_rub, cutflag,
                          S_exact, S_mask, vb_init, th_init, best_known,
                          ep_theta, wl_pruned, wl_ptheta)

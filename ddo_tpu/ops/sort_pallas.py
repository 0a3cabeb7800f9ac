"""Pallas TPU prototype: lane-batched multi-key bitonic sort.

Why: XLA:TPU's variadic `lax.sort` measures ~1.5-2ms per [64, 2560]
network regardless of operand count — ~100x off speed-of-light — and the
MDD engine's per-layer cost is now dominated by exactly such networks
(see ROUND3_NOTES / ops/segments.py).  The hypothesis: XLA sorts each
lane along the minormost axis, so every compare-exchange at distance
j < 128 fights the 128-wide vector lanes.  This kernel flips the layout:
the LANE dimension rides the 128-lane vector axis and the sort axis is
the sublane/row axis, so every compare-exchange stage is a fully
vectorized row operation at any distance.

Layout: operands arrive as [L, C] (L lanes, C keys each, C a power of
two; callers pad with +inf sentinels).  The kernel transposes to [C, L]
blocks in VMEM, runs the full bitonic network with rows as units, and
transposes back.  Multi-key lexicographic compare over `num_keys`
operands; the remaining operands ride as payload.

Two kernels live here:

  * `sort_lanes` — the round-3 prototype: one [C, L] block per operand.
    Kept for A/B benchmarking; at the engine's lane counts (K=8 vmap
    lanes) each [C, 8] block still occupies full [8, 128]-tiled VMEM
    rows, so ~20 operands would blow the ~16MB VMEM budget.
  * `sort_packed` + `multi_sort` — the ENGINE path (round 4): all
    operands ride ONE [C2, n_ops*L] block, so the 128-wide lane axis is
    filled with (operand, lane) pairs and VMEM holds one matrix.  The
    compare-exchange swap mask is computed from the key slices and tiled
    across the operand slices; payloads follow the same swaps.

`multi_sort` is a drop-in for the engine's
`lax.sort(ops, num_keys=k, is_stable=False)` idiom on 1-D int32 operands:
under the solver superstep's `jax.vmap` a `custom_vmap` rule collects the
whole [K, C] lane batch and dispatches one packed kernel (XLA's variadic
sort costs ~1.5-2ms per [64, 2560] network on v5e — ~100x off
speed-of-light — which made 4 such networks the per-layer floor,
VERDICT r3 #2/#4).  Sorting is UNSTABLE on both paths; engine call sites
guarantee a total order (a `-idxs` / unique-index final key), so results
are bit-equal across backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is optional at import time (CPU-only hosts use interpret)
    from jax.experimental import pallas as pl
except Exception:  # pragma: no cover
    pl = None


def _bitonic_stages(C):
    """(k, j) compare-exchange stages of a bitonic sort of C=2^m rows."""
    stages = []
    k = 2
    while k <= C:
        j = k // 2
        while j >= 1:
            stages.append((k, j))
            j //= 2
        k *= 2
    return stages


def _sort_kernel(num_keys, C, *refs):
    """One grid cell: sorts the whole [C, L] block set in VMEM.

    refs = in_refs (n operands) + out_refs (n operands), each [C, L].
    Ascending lexicographic order on the first `num_keys` operands.
    """
    n = len(refs) // 2
    ins, outs = refs[:n], refs[n:]
    ops = [r[...] for r in ins]  # [C, L] arrays resident in VMEM

    for k, j in _bitonic_stages(C):
        # partner(i) = i ^ j: reshape rows [C] -> [C//(2j), 2j] and slice
        # halves across the second dim; direction: ascending iff i&k==0.
        # All masks stay int32 (0/1) with arithmetic selects — i1 vectors
        # hit Mosaic's "unsupported target bitwidth for truncation".
        def ex(a):
            return a.reshape(C // (2 * j), 2 * j, a.shape[-1])

        lo = [ex(a)[:, :j] for a in ops]   # rows with i&j == 0
        hi = [ex(a)[:, j:] for a in ops]   # rows with i&j == 1
        gt = (lo[0] > hi[0]).astype(jnp.int32)
        eq = (lo[0] == hi[0]).astype(jnp.int32)
        for t in range(1, num_keys):
            gt = gt | (eq & (lo[t] > hi[t]).astype(jnp.int32))
            eq = eq & (lo[t] == hi[t]).astype(jnp.int32)
        # ascending block iff (i & k) == 0; i = b*2j + s*j + t with
        # b = row block index: i&k depends only on (b*2j) & k for k > j
        blk = jax.lax.broadcasted_iota(jnp.int32, gt.shape, 0)
        asc = (((blk * 2 * j) & k) == 0).astype(jnp.int32)
        # swap = asc ? gt : (!gt && !eq)
        swap = asc * gt + (1 - asc) * (1 - gt) * (1 - eq)
        ops = [
            jnp.concatenate(
                [l + swap * (h - l), h - swap * (h - l)], axis=1
            ).reshape(C, a.shape[-1])
            for l, h, a in zip(lo, hi, ops)
        ]
    for r, a in zip(outs, ops):
        r[...] = a


def sort_lanes(operands, num_keys, interpret=False):
    """Ascending multi-key sort of each lane: operands are [L, C] int32
    arrays sorted independently per lane by the first `num_keys`
    operands (lexicographic), the rest riding as payload.  C must be a
    power of two; callers pre-pad with sentinels."""
    L, C = operands[0].shape
    assert C & (C - 1) == 0, "C must be a power of two"
    tops = [jnp.swapaxes(a, 0, 1) for a in operands]  # [C, L]
    n = len(tops)
    kernel = functools.partial(_sort_kernel, num_keys, C)
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((C, L), a.dtype) for a in tops],
        interpret=interpret,
    )(*tops)
    return [jnp.swapaxes(a, 0, 1) for a in outs]


def sort_lanes_xla(operands, num_keys):
    """Reference implementation via lax.sort (per-lane, last axis)."""
    return list(
        jax.lax.sort(tuple(operands), num_keys=num_keys, is_stable=False,
                     dimension=-1)
    )


def bench_sort(L=64, C=2048, n_keys=14, n_payload=0, reps=20, interpret=False):
    """Standalone A/B of the pallas kernel vs lax.sort at engine shapes."""
    import time

    import numpy as np

    rng = np.random.default_rng(0)
    ops = [
        jnp.asarray(rng.integers(0, 1 << 30, (L, C)), jnp.int32)
        for _ in range(n_keys + n_payload)
    ]

    def run(f):
        g = jax.jit(lambda *a: f(list(a), n_keys))
        out = g(*ops)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = g(*ops)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps, out

    tx, ox = run(sort_lanes_xla)
    tp, op_ = run(
        lambda a, k: sort_lanes(a, k, interpret=interpret)
    )
    agree = all(
        bool(jnp.array_equal(a[:, :], b[:, :])) for a, b in
        zip(ox[:n_keys], op_[:n_keys])
    )
    print(
        f"[{L}x{C}, {n_keys} keys+{n_payload} payload] "
        f"lax.sort {tx*1e3:.3f} ms   pallas {tp*1e3:.3f} ms   "
        f"keys-agree={agree}"
    )
    return tx, tp, agree

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
whole [K, C] lane batch and picks the backend.  Sorting is UNSTABLE on
both paths; engine call sites guarantee a total order (a `-idxs` /
unique-index final key), so results are bit-equal across backends.

MEASURED OUTCOME (round 4, v5e): round 3's working theory — that XLA's
variadic sort has a ~1.5-2ms floor per network (~100x off
speed-of-light) — does NOT hold at the engine's parity lane counts:
lax.sort on [8, C] is 0.04-0.13ms for every C up to 4096 and up to 26
operands (the r3 numbers were measured at 64 lanes, where lax.sort IS
~10-20x slower per lane).  The packed kernel compiles and validates
bit-equal, but its traced-shift rolls (the only Mosaic-lowerable
data-dependent sublane movement; dynamic slices must be 8-aligned)
expand to a barrel shifter per stage and it loses in-engine (tsptw
kernel rate 1.60M -> 0.17M exp/s).  Engine default is therefore
lax.sort; `_pallas_wanted` documents the switch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is optional at import time (CPU-only hosts use interpret)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None


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


# ==========================================================================
# Packed engine kernel: ONE [C2, n_ops*L] VMEM block for all operands.
# ==========================================================================

#: pad sentinel for the FIRST key operand of padded rows: strictly above
#: every engine key (inval flags are 0/1, permutation keys are < C)
_PAD_SENTINEL = jnp.int32(2**31 - 1)


def _packed_sort_kernel(num_keys, C, L, n_ops, *refs):
    """Bitonic sort of C rows of a [C, n_ops*L] matrix per (operand, lane)
    column group: column block t*L:(t+1)*L holds operand t for all L
    lanes.  Rows are ordered ascending-lexicographic on the first
    `num_keys` column blocks, independently per lane; payload blocks
    follow the same swaps.

    Shape-invariant formulation: every stage operates on the full
    [C, n_ops*L] matrix — the compare-exchange partner (row i^j) comes
    from two sublane ROLLS of a doubled matrix (row i+j and row i-j,
    selected by bit j of the row index), never from the
    [C/(2j), 2j, ...] reshape dance.  The stage loop is a
    `lax.fori_loop` reading (k, j) from an SMEM stage table, so the
    compiled IR holds ONE stage body regardless of C — the fully
    unrolled network sent Mosaic's compile time superlinear (measured on
    v5e: C=256 10s, C=512 68s, C=1024 stalled >200s).  All masks stay
    int32 (i1 vectors hit Mosaic's "unsupported target bitwidth for
    truncation")."""
    kj_ref, in_ref, out_ref = refs
    row = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    n_stages = len(_bitonic_stages(C))
    # state lives in out_ref: the store at each stage end cuts temp
    # liveness, keeping Mosaic's scoped-vmem stack to ~7 matrix-sized
    # buffers (a value-carried fori_loop accumulated ~36 live copies and
    # OOMed the 16MB scoped vmem at [2048, 208] on v5e)
    out_ref[...] = in_ref[...]

    def stage(i, _):
        k = kj_ref[0, i]
        j = kj_ref[1, i]
        M = out_ref[...]
        # partner row i^j from two sublane ROTATES with traced shifts
        # (pltpu.roll semantics: out[i] = x[(i - shift) % C]); the
        # wrapped rows land only in the UNSELECTED branch (for bit-j
        # clear rows i+j < C; for bit-j set rows i-j >= 0).  roll is the
        # one Mosaic-supported data-dependent sublane movement — dynamic
        # slices on dim 0 must be 8-aligned and value-level dynamic_slice
        # has no lowering at all (both tried, both failed on v5e).
        up = pltpu.roll(M, C - j, axis=0)  # row i+j
        dn = pltpu.roll(M, j, axis=0)      # row i-j
        hib = ((row & j) != 0).astype(jnp.int32)        # row plays the hi role
        P = dn + (1 - hib) * (up - dn)                  # partner row i^j
        # lexicographic self-vs-partner compare over the key blocks
        gt = (M[:, :L] > P[:, :L]).astype(jnp.int32)
        eq = (M[:, :L] == P[:, :L]).astype(jnp.int32)
        for t in range(1, num_keys):
            s = slice(t * L, (t + 1) * L)
            gt = gt | (eq & (M[:, s] > P[:, s]).astype(jnp.int32))
            eq = eq & (M[:, s] == P[:, s]).astype(jnp.int32)
        asc = ((row & k) == 0).astype(jnp.int32)        # ascending block?
        # row keeps the MIN of (self, partner) iff it is the lo-role row
        # of an ascending block or the hi-role row of a descending one
        keep_min = asc * (1 - hib) + (1 - asc) * hib    # [C, 1]
        # take partner when (keep_min and self > partner) or
        # (keep_max and self < partner); ties keep self
        swap = keep_min * gt + (1 - keep_min) * (1 - gt) * (1 - eq)  # [C, L]
        swap_full = (
            pltpu.repeat(swap, n_ops, axis=1) if n_ops > 1 else swap
        )  # [C, NL] in ONE op (a concat of n_ops copies blows the stack)
        # int32 wraparound in (P - M) is harmless: swap is 0/1, so the
        # result is exactly M or exactly P (mod-2^32 arithmetic cancels)
        out_ref[...] = M + swap_full * (P - M)
        return 0

    jax.lax.fori_loop(0, n_stages, stage, 0)


#: VMEM budget for the packed matrix (bytes); the stage body keeps ~6-8
#: matrix-sized values live (M, two rolls, partner, update), so stay well
#: under the ~16MB scoped-vmem limit
_VMEM_MATRIX_BYTES = 1536 * 1024


def sort_packed(operands, num_keys, interpret=False):
    """Per-lane ascending multi-key sort, packed layout.

    `operands` are [L, C] int32 arrays; each lane (row) is sorted
    independently by the first `num_keys` operands lexicographically, the
    rest riding as payload.  C is padded up to a power of two in-wrapper
    (first key = _PAD_SENTINEL so pads sort last) and sliced back.
    When the packed [C2, n_ops*L] matrix would exceed the VMEM budget the
    lane batch is split into groups dispatched as sequential pallas calls
    (same kernel shape -> one Mosaic compile).
    """
    L, C = operands[0].shape
    n_ops = len(operands)
    C2 = 1 << max(1, (int(C) - 1).bit_length())
    if C2 != C:
        pads = [
            jnp.full((L, C2 - C), _PAD_SENTINEL if t == 0 else 0, jnp.int32)
            for t in range(n_ops)
        ]
        operands = [jnp.concatenate([a, p], axis=1) for a, p in zip(operands, pads)]

    per_lane_bytes = C2 * n_ops * 4
    Lg = max(1, min(L, _VMEM_MATRIX_BYTES // max(1, per_lane_bytes)))
    # pad L up to a multiple of the group size (duplicate lane 0 — sorted
    # output of a padded lane is discarded)
    n_groups = -(-L // Lg)
    Lp = n_groups * Lg
    if Lp != L:
        operands = [
            jnp.concatenate([a, jnp.broadcast_to(a[:1], (Lp - L, C2))], axis=0)
            for a in operands
        ]

    kernel = functools.partial(_packed_sort_kernel, num_keys, C2, Lg, n_ops)
    stages = _bitonic_stages(C2)
    kj = jnp.asarray([[k for k, _ in stages], [j for _, j in stages]], jnp.int32)
    kwargs = {}
    if not interpret:
        kwargs["in_specs"] = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # stage table
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        # the traced-shift rolls lower to a barrel shifter (~log2 C
        # conditional full-matrix layers) on Mosaic's scoped-vmem stack;
        # the 16MB default limit is far below the chip's physical VMEM —
        # raise it and keep the matrix budget as the real control
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    outs = []
    for g in range(n_groups):
        group = [a[g * Lg : (g + 1) * Lg] for a in operands]
        # [n_ops, Lg, C2] -> [C2, n_ops*Lg]: one XLA transpose each way;
        # the whole network then runs on a single VMEM-resident matrix
        # whose lane axis is filled with (operand, lane) pairs — separate
        # [C2, L] blocks at L=8 would waste 15/16 of every VMEM tile
        M = jnp.stack(group, axis=0).transpose(2, 0, 1).reshape(C2, n_ops * Lg)
        (out,) = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((C2, n_ops * Lg), jnp.int32)],
            interpret=interpret,
            **kwargs,
        )(kj, M)
        outs.append(out.reshape(C2, n_ops, Lg).transpose(1, 2, 0))
    full = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    return [full[t, :L, :C] for t in range(n_ops)]


# --------------------------------------------------------------------------
# Engine dispatch: drop-in for lax.sort on 1-D int32 operands under vmap.
# --------------------------------------------------------------------------

def _pallas_wanted():
    """Trace-time gate for the packed kernel.  OPT-IN (default off).

    Measured on v5e (round 4): XLA's variadic sort at the engine's lane
    counts is far faster than round 3's [64-lane, C=2560] measurements
    suggested (~0.05-0.13ms per [8, C<=4096] network for ANY C and up to
    26 operands), and the packed bitonic kernel — whose traced-shift
    rolls lower to a ~log2(C)-layer barrel shifter per stage — LOSES
    in-engine (tsptw kernel rate 1.60M -> 0.17M exp/s).  The engine
    therefore defaults to lax.sort; the kernel stays available for
    explicit A/Bs.

    DDO_PALLAS_SORT: "1" forces the compiled packed kernel (TPU),
    "interpret" forces the packed path in interpret mode (CPU test
    coverage of the exact engine integration), "lax-chunked" splits
    big-lane batches into small-lane lax.sorts; anything else =
    one lax.sort.
    """
    import os

    flag = os.environ.get("DDO_PALLAS_SORT", "")
    if flag == "interpret":
        return "interpret"
    if flag == "lax-chunked":
        return "lax-chunked"
    if flag == "1" and pl is not None:
        return "compiled"
    return None


#: lane-group size for the big-lane lax.sort split (see multi_sort);
#: measured v5e: lax.sort per-lane cost is flat up to ~8 lanes and grows
#: super-linearly beyond, so 64-lane bench shapes sort faster as 8x[8, C]
_LAX_LANE_CHUNK = int(__import__("os").environ.get("DDO_SORT_LANE_CHUNK", "8"))


@functools.lru_cache(maxsize=None)
def _get_sorter(num_keys, n_ops, mode):
    interpret = mode == "interpret"

    @jax.custom_batching.custom_vmap
    def f(*ops):
        # unbatched (K=1 compile bucket reaches here only when the engine
        # is traced WITHOUT vmap): plain variadic sort
        return jax.lax.sort(ops, num_keys=num_keys, is_stable=False)

    @f.def_vmap
    def f_vmap(axis_size, in_batched, *ops):
        ops = [
            o if b else jnp.broadcast_to(o[None], (axis_size,) + o.shape)
            for o, b in zip(ops, in_batched)
        ]
        if mode == "lax-chunked":
            G = _LAX_LANE_CHUNK
            outs = [
                jax.lax.sort(
                    tuple(o[i : i + G] for o in ops),
                    num_keys=num_keys, is_stable=False,
                )
                for i in range(0, axis_size, G)
            ]
            res = tuple(
                jnp.concatenate([c[t] for c in outs]) for t in range(n_ops)
            )
            return res, (True,) * n_ops
        outs = sort_packed(ops, num_keys, interpret=interpret)
        return tuple(outs), (True,) * n_ops

    return f


def multi_sort(operands, num_keys):
    """Engine sort dispatch: `lax.sort(ops, num_keys, is_stable=False)`
    semantics on 1-D int32 operands.  Backends (all bit-equal because
    call sites guarantee a total order via a unique final key):

      * default          — one variadic lax.sort over the full lane batch;
      * DDO_PALLAS_SORT=1/interpret — the packed Pallas kernel;
      * DDO_PALLAS_SORT=lax-chunked — lax.sort split into
        DDO_SORT_LANE_CHUNK-lane groups (big-lane shapes only).
    """
    operands = tuple(operands)
    mode = _pallas_wanted()
    if mode is None:
        return jax.lax.sort(operands, num_keys=num_keys, is_stable=False)
    f = _get_sorter(num_keys, len(operands), mode)
    return tuple(f(*operands))


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

"""Pallas lane-batched bitonic sort prototype: bit-equal keys vs lax.sort
(interpret mode on CPU; the TPU-compiled path is benchmarked standalone
via ddo_tpu.ops.sort_pallas.bench_sort)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddo_tpu.ops.sort_pallas import sort_lanes, sort_lanes_xla


@pytest.mark.parametrize("L,C,nk,npay,seed", [
    (4, 64, 3, 2, 0),
    (2, 128, 1, 0, 1),
    (8, 32, 5, 3, 2),
    (1, 256, 2, 1, 3),
])
def test_sorted_keys_match_lax_sort(L, C, nk, npay, seed):
    rng = np.random.default_rng(seed)
    # small value range -> many ties, stressing the comparator
    ops = [jnp.asarray(rng.integers(0, 7, (L, C)), jnp.int32)
           for _ in range(nk + npay)]
    ref = sort_lanes_xla(ops, nk)
    got = sort_lanes(ops, nk, interpret=True)
    for a, b in zip(ref[:nk], got[:nk]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_payload_rides_permutation():
    """Payload must travel with its key row: sort (key, key) pairs and
    the payload copy of the key must come out sorted too."""
    rng = np.random.default_rng(7)
    k = jnp.asarray(rng.permutation(64)[None, :], jnp.int32)
    got = sort_lanes([k, k + 100], 1, interpret=True)
    np.testing.assert_array_equal(np.asarray(got[0]), np.sort(np.asarray(k)))
    np.testing.assert_array_equal(np.asarray(got[1]) - 100, np.asarray(got[0]))


# ==========================================================================
# Packed engine kernel (round 4): sort_packed + the multi_sort dispatch.
# ==========================================================================
from ddo_tpu.ops.sort_pallas import multi_sort, sort_packed


@pytest.mark.parametrize("L,C,nk,npay,seed", [
    (8, 300, 4, 3, 0),   # non-pow2 C exercises the sentinel padding
    (1, 64, 2, 0, 1),    # single-lane bucket
    (5, 257, 1, 6, 2),   # scatter-style: 1 key, many payloads
    (8, 128, 6, 2, 3),
])
def test_packed_matches_lax_sort(L, C, nk, npay, seed):
    rng = np.random.default_rng(seed)
    ops = [jnp.asarray(rng.integers(-40, 40, (L, C)), jnp.int32)
           for _ in range(nk + npay)]
    # unique final key => total order => bit-equal vs the unstable lax.sort
    ops[nk - 1] = jnp.asarray(
        np.tile(rng.permutation(C).astype(np.int32), (L, 1))
    )
    ref = sort_lanes_xla(ops, nk)
    got = sort_packed(ops, nk, interpret=True)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multi_sort_vmap_scan_composition(monkeypatch):
    """multi_sort under vmap+scan — the exact engine composition — must be
    bit-equal to lax.sort, including unbatched (closed-over iota)
    operands that the custom_vmap rule broadcasts."""
    monkeypatch.setenv("DDO_PALLAS_SORT", "interpret")
    rng = np.random.default_rng(11)
    L, C, nk = 4, 96, 2
    vals = jnp.asarray(rng.integers(0, 5, (L, C)), jnp.int32)
    idxs = jnp.arange(C, dtype=jnp.int32)  # unbatched under vmap

    def per_lane(v):
        def body(c, _):
            return c, multi_sort((v, -idxs), num_keys=2)
        _, (a, b) = jax.lax.scan(body, 0, jnp.arange(1))
        return a[0], b[0]

    got_a, got_b = jax.jit(jax.vmap(per_lane))(vals)
    ref = jax.vmap(
        lambda v: jax.lax.sort((v, -idxs), num_keys=2, is_stable=False)
    )(vals)
    np.testing.assert_array_equal(np.asarray(got_a), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(ref[1]))


def test_engine_solves_with_packed_sort(monkeypatch):
    """End-to-end: a knapsack instance solved with the packed interpret
    kernel must prove the same optimum as the default backend."""
    monkeypatch.setenv("DDO_PALLAS_SORT", "interpret")
    import ddo_tpu
    from ddo_tpu import FixedWidth, ModelBundle, SimpleCache
    from ddo_tpu.models.knapsack import KPRanking, KPRelax, Knapsack

    rng = np.random.default_rng(3)
    pb = Knapsack(40, rng.integers(1, 50, 10), rng.integers(1, 20, 10))
    bundle = ModelBundle(pb, KPRelax(pb), KPRanking())
    s = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(3), batch=2, buffer_width=8,
        cache=SimpleCache(),
    )
    c = s.maximize()
    assert c.is_exact
    monkeypatch.setenv("DDO_PALLAS_SORT", "0")
    jax.clear_caches()
    s2 = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(3), batch=2, buffer_width=8,
        cache=SimpleCache(),
    )
    c2 = s2.maximize()
    assert c2.is_exact
    assert s.best_value() == s2.best_value()

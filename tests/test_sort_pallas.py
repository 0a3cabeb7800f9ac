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

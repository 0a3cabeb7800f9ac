"""Property tests for the variable-shift bitset primitives backing the
golomb lane-space step (reverse_bits / shift_right_var)."""
import jax.numpy as jnp
import numpy as np

from ddo_tpu.ops import bitset as bs


def test_reverse_and_shift_all_lane_counts():
    rng = np.random.RandomState(0)
    for L in (1, 2, 3, 4):
        n = 32 * L
        for trial in range(60):
            members = rng.rand(n) < 0.3
            s = np.zeros(L, np.uint32)
            for v in np.flatnonzero(members):
                s[v // 32] |= np.uint32(1) << np.uint32(v % 32)
            sj = jnp.asarray(s)
            rev_bits = np.asarray(bs.to_bits(bs.reverse_bits(sj), n))
            assert (rev_bits == members[::-1]).all(), (L, trial)
            t = rng.randint(0, n + 1)
            sh_bits = np.asarray(
                bs.to_bits(bs.shift_right_var(sj, jnp.asarray(t, jnp.int32)), n)
            )
            expect = np.zeros(n, bool)
            expect[: n - t] = members[t:]
            assert (sh_bits == expect).all(), (L, trial, t)

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from ddo_tpu.ops import bitset as bs

rng = np.random.RandomState(0)
for L in (1, 2, 3, 4):
    n = 32 * L
    for trial in range(200):
        members = rng.rand(n) < 0.3
        s = np.zeros(L, np.uint32)
        for v in np.flatnonzero(members):
            s[v // 32] |= np.uint32(1) << np.uint32(v % 32)
        sj = jnp.asarray(s)
        # reverse
        rev = np.asarray(bs.reverse_bits(sj))
        rev_bits = np.asarray(bs.to_bits(jnp.asarray(rev), n))
        expect_rev = members[::-1]
        assert (rev_bits == expect_rev).all(), (L, trial, "reverse")
        # shift
        t = rng.randint(0, n + 1)
        sh = np.asarray(bs.shift_right_var(sj, jnp.asarray(t, jnp.int32)))
        sh_bits = np.asarray(bs.to_bits(jnp.asarray(sh), n))
        expect = np.zeros(n, bool)
        expect[: n - t] = members[t:]
        assert (sh_bits == expect).all(), (L, trial, t, "shift")
print("bit ops OK")

import time
import jax, jax.numpy as jnp

@jax.jit
def trivial(x):
    return x + 1

@jax.jit
def wloop(n, x):
    def body(c):
        i, y = c
        return (i + 1, y * 1.000001 + 1.0)
    i, y = jax.lax.while_loop(lambda c: c[0] < n, body, (0, x))
    return y

@jax.jit
def wloop_heavyish(n, x):
    # body with a small matmul to mimic real work
    def body(c):
        i, y = c
        return (i + 1, y @ y * 0.0001 + y)
    i, y = jax.lax.while_loop(lambda c: c[0] < n, body, (0, x))
    return y

x = jnp.asarray(1.0)
m = jnp.ones((64, 64))
trivial(x).block_until_ready()
t0 = time.perf_counter()
for _ in range(20):
    trivial(x).block_until_ready()
print(f"trivial dispatch+sync: {(time.perf_counter()-t0)/20*1e3:.1f} ms")

for n in (1, 10, 100, 1000):
    wloop(n, x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        wloop(jnp.asarray(n), x).block_until_ready()
    print(f"while n={n}: {(time.perf_counter()-t0)/5*1e3:.1f} ms")
for n in (10, 100):
    wloop_heavyish(n, m).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        wloop_heavyish(jnp.asarray(n), m).block_until_ready()
    print(f"while-matmul n={n}: {(time.perf_counter()-t0)/5*1e3:.1f} ms")

import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
import ddo_tpu
from ddo_tpu import ModelBundle
from ddo_tpu.core.types import root_subproblem
from ddo_tpu.models.golomb import Golomb, GolombRanking, GolombRelax

pb = Golomb(7)
rlx = GolombRelax(pb)
rank = GolombRanking()
K, W, D = 8, 32, pb.domain_size
root = root_subproblem(pb)
st1 = jax.tree_util.tree_map(jnp.asarray, root.state)
states = jax.tree_util.tree_map(
    lambda x: jnp.broadcast_to(x, (K, W) + jnp.shape(x)), st1)

def t(name, fn, *args):
    o = fn(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(20): o = fn(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/20*1e3:.2f} ms")

# v_step over [K, W, D]
@jax.jit
def step_all(ss):
    f = lambda s, d: pb.step(pb.data, s, jnp.asarray(3, jnp.int32), d, jnp.asarray(1, jnp.int32))
    v = jax.vmap(jax.vmap(lambda s: jax.vmap(lambda d: f(s, d))(jnp.arange(D, dtype=jnp.int32))))
    return v(ss)
t("step [K,W,D]", step_all, states)

# 6 sequential layers of step (scan) - scan overhead probe
@jax.jit
def step_scan(ss):
    def body(c, i):
        out = step_all.__wrapped__(c) if hasattr(step_all, "__wrapped__") else None
        f = lambda s, d: pb.step(pb.data, s, i, d, i)
        v = jax.vmap(jax.vmap(lambda s: jax.vmap(lambda d: f(s, d))(jnp.arange(D, dtype=jnp.int32))))
        ns, cost, dv, val = v(c)
        nxt = jax.tree_util.tree_map(lambda a: a[:, :, 0], ns)
        return nxt, jnp.sum(cost)
    c, ys = jax.lax.scan(body, ss, jnp.arange(6, dtype=jnp.int32))
    return ys
t("step scan x6", step_scan, states)

# merge hook over [C]
statesC = jax.tree_util.tree_map(
    lambda x: jnp.broadcast_to(x, (K, W * D) + jnp.shape(x)), st1)
@jax.jit
def merge_all(ss):
    return jax.vmap(lambda s: rlx.merge(pb.data, s, jnp.ones((W * D,), bool)))(ss)
t("merge [K,C]", merge_all, statesC)

# pack over [K, C]
@jax.jit
def pack_all(ss):
    return jax.vmap(jax.vmap(pb.pack))(ss)
t("pack [K,C]", pack_all, statesC)

@jax.jit
def rank_all(ss):
    return jax.vmap(jax.vmap(lambda s: rank.score((), s)))(ss)
t("rank [K,C]", rank_all, statesC)

@jax.jit
def rub_all(ss):
    return jax.vmap(jax.vmap(lambda s: rlx.rub(pb.data, s, 0)))(ss)
t("rub [K,C]", rub_all, statesC)

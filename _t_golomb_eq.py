import jax
jax.config.update("jax_platforms", "cpu")
import ddo_tpu
from ddo_tpu import ModelBundle, NbUnassignedWidth, SimpleCache
from ddo_tpu.models.golomb import Golomb, GolombRanking, GolombRelax
for n, opt in [(2,-1),(3,-3),(4,-6),(5,-11),(6,-17),(7,-25)]:
    pb = Golomb(n)
    b = ModelBundle(pb, GolombRelax(pb), GolombRanking())
    s = ddo_tpu.SequentialSolver(b, width_heu=NbUnassignedWidth(pb.nb_variables),
                                 batch=4, cache=SimpleCache(), cutset_type=ddo_tpu.FRONTIER)
    c = s.maximize()
    assert c.is_exact and s.best_value() == opt, (n, s.best_value(), opt)
    print(f"golomb{n}: {s.best_value()} ok")
print("EQ OK")

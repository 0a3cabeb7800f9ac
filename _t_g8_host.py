import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import ddo_tpu
from ddo_tpu import ModelBundle, NbUnassignedWidth, SimpleCache, TimeBudget
from ddo_tpu.models.golomb import Golomb, GolombRanking, GolombRelax
pb = Golomb(8)
b = ModelBundle(pb, GolombRelax(pb), GolombRanking())
s = ddo_tpu.SequentialSolver(b, width_heu=NbUnassignedWidth(pb.nb_variables),
                             batch=8, cache=SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
                             cutoff=TimeBudget(180))
c = s.maximize()
print("host golomb8:", s.best_value(), "exact", c.is_exact, "lb", s.best_lower_bound(), "ub", s.best_upper_bound(),
      "explored", s.explored_count, "supersteps", s.stats.supersteps)

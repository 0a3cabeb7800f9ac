"""Slow-tier conftest: periodically drop compiled XLA executables.

The top-level tests/conftest.py clears JAX caches per *module* because
XLA:CPU's JIT segfaults after accumulating ~90 live executables.  This
tier packs every problem family into one module, so clear every few tests
instead.  Same-program neighbours (e.g. the 20 Langevin instances, all
n=20) only recompile a handful of times; the persistent compilation cache
is unreliable on XLA:CPU (see tests/conftest.py), so live-executable
hygiene is the only lever.
"""
import gc

import jax
import pytest

_CLEAR_EVERY = 6
_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_jax_cache_clear():
    yield
    _counter["n"] += 1
    if _counter["n"] % _CLEAR_EVERY == 0:
        jax.clear_caches()
        gc.collect()

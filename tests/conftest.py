"""Test configuration: force the suite onto a virtual 8-device CPU mesh.

The session environment pins JAX_PLATFORMS=axon (one tunneled TPU chip)
and a sitecustomize pre-imports jax, so plain env vars are too late.
Backend initialization is lazy, so `jax.config.update` still applies:
tests run on 8 virtual CPU devices (sharding/collective paths exercised
without hardware) and never grab the TPU tunnel that bench.py uses.

The persistent compilation cache is deliberately NOT enabled here: XLA:CPU
AOT serialization is unreliable in this environment (executable.serialize()
segfaults on some programs, and cached entries carry machine-feature lists
that mismatch the host, risking SIGILL on load — both observed).  TPU runs
(bench.py) keep their own persistent cache.
"""
import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

if os.environ.get("DDO_TEST_TPU") == "1":
    # escape hatch for parity burn-ins of the HEAVY families: keep the
    # session's real TPU backend (one tunneled chip) and its persistent
    # compile cache.  Only ONE such run may own the tunnel at a time.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
else:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    jax.config.update("jax_platforms", "cpu")

import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The suite jit-compiles hundreds of distinct programs; keeping them all
    loaded eventually crashes XLA:CPU's JIT inside backend_compile (observed
    as a segfault after ~90 compilations regardless of which test runs
    then).  Each module's models share compilations, so per-module clearing
    keeps the speed benefit without accumulating executables."""
    yield
    jax.clear_caches()
    gc.collect()

"""Test configuration: force the suite onto a virtual 8-device CPU mesh.

The session environment pins JAX_PLATFORMS=axon (one tunneled TPU chip)
and a sitecustomize pre-imports jax, so plain env vars are too late.
Backend initialization is lazy, so `jax.config.update` still applies:
tests run on 8 virtual CPU devices (sharding/collective paths exercised
without hardware) and never grab the TPU tunnel that bench.py uses.
A persistent compilation cache makes suite re-runs skip XLA compiles.
"""
import os

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

"""Test harness configuration.

All tests run on the CPU backend with 8 virtual devices, so the multi-chip
sharding paths (mesh MSM, all-to-all NTT) are exercised hermetically — the
same simulated-mesh strategy the driver's `dryrun_multichip` uses.  Real-TPU
numbers come from `bench.py`, not from the test suite.

NOTE: this environment pre-imports jax at interpreter startup with
JAX_PLATFORMS=axon (the TPU tunnel), so env vars are ineffective —
the platform must be forced via jax.config.update before any backend
initialization.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (may already be pre-imported by the environment)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent XLA compilation cache: the limb-arithmetic graphs are large;
# caching makes re-runs cheap.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

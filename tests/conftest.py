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

# NO persistent compilation cache here: XLA:CPU AOT entries are machine-
# feature pinned (every load fails with a cpu_aot_loader mismatch, even on
# the machine that wrote them) and serializing some CPU executables
# segfaults (jax 0.9 compilation_cache.put_executable_and_time) — on the
# CPU backend the cache is pure overhead + crash risk.  TPU runs (bench.py,
# the CLI) keep their persistent cache; tests pay compile instead, which is
# why the suite is tiered with the `slow` marker (pyproject.toml).

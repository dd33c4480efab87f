"""Test harness configuration.

All tests run on the CPU backend with 8 virtual devices, so the multi-chip
sharding paths (mesh MSM, all-to-all NTT) are exercised hermetically — the
same simulated-mesh strategy the driver's `dryrun_multichip` uses.  Real-TPU
numbers come from `bench.py`, not from the test suite.
"""

import os
import sys

# Must run before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

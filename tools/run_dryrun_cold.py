"""Run the driver's exact dryrun_multichip(8) path cold (fresh cache dir)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/dryrun_cold_cache")
t0 = time.perf_counter()
import __graft_entry__
__graft_entry__.dryrun_multichip(8)
print(f"TOTAL {time.perf_counter()-t0:.1f}s", flush=True)

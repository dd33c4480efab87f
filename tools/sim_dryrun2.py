import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/dryrun_cache2")  # reuse
import __graft_entry__
t0 = time.perf_counter()
__graft_entry__.dryrun_multichip(8)
print(f"dryrun took {time.perf_counter() - t0:.1f}s", flush=True)

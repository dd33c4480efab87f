"""Run the driver's exact dryrun_multichip(8) path cold (no persistent cache),
as the driver machine sees it."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
t0 = time.perf_counter()
import __graft_entry__
__graft_entry__.dryrun_multichip(8)
print(f"TOTAL {time.perf_counter()-t0:.1f}s", flush=True)

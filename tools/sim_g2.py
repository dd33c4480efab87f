import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/dryrun_cache2")
import numpy as np, jax.numpy as jnp
from groth16_tpu.ops import curve as C
from groth16_tpu.ops.limbs import N_LIMBS
from groth16_tpu.parallel.mesh import make_mesh
from groth16_tpu.parallel.msm_shard import _msm_sharded_jit
mesh = make_mesh(8)
rng = np.random.default_rng(0)
sc = jnp.asarray(rng.integers(0, 1 << 16, (64, N_LIMBS)).astype(np.uint32))
pts = C.gen_point(C.G2, (64,))
t0 = time.perf_counter()
r = _msm_sharded_jit(C.G2, mesh, sc, pts, 0); jax.block_until_ready(r)
print(f"G2 msm first: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
sc2 = sc.at[0,0].set(7)
r = _msm_sharded_jit(C.G2, mesh, sc2, pts, 0); jax.block_until_ready(r)
print(f"G2 msm second (pure exec): {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
r2 = C.scalar_mul(C.G2, sc, pts); jax.block_until_ready(r2)
print(f"G2 scalar_mul[64] single-dev first: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
r2 = C.scalar_mul(C.G2, sc2, pts); jax.block_until_ready(r2)
print(f"G2 scalar_mul[64] single-dev exec: {time.perf_counter()-t0:.1f}s", flush=True)

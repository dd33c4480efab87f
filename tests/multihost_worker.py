"""Worker for the 2-process jax.distributed smoke test (VERDICT r4 #6 /
SURVEY §2.4): each process owns one CPU device; `make_multihost_mesh` calls
`jax.distributed.initialize`, builds the GLOBAL mesh, and a sharded MSM runs
over it with gloo cross-process collectives — the same `shard_map` program
that serves the single-process mesh.

Launched by tests/test_multihost.py as:
    python tests/multihost_worker.py <coordinator> <nprocs> <pid>
Prints `MULTIHOST_OK <x> <y>` (the affine MSM result) on success.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

coordinator, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["JAX_COORDINATOR_ADDRESS"] = coordinator
os.environ.setdefault("GROTH16_TPU_NO_COMPILE_CACHE", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=nprocs, process_id=pid)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from groth16_tpu.ops import curve as C
from groth16_tpu.parallel.mesh import make_multihost_mesh
from groth16_tpu.parallel.msm_shard import AXIS, _msm_sharded_jit, _point_spec
from groth16_tpu.utils import hostmath as H

assert jax.process_count() == nprocs, jax.process_count()
mesh = make_multihost_mesh()
d = mesh.devices.size
assert d == nprocs * jax.local_device_count(), mesh

# deterministic tiny MSM: every process derives the same global inputs, then
# contributes its own shard via make_array_from_process_local_data
n = 8 * d
ks = [(7 * i + 3) % (1 << 16) for i in range(n)]
pts = [H.ec_scalar_mul(H.G1_FIELD, 11 * i + 5, H.G1_GEN) for i in range(n)]
want = H.ec_msm(H.G1_FIELD, ks, pts)

sc = np.zeros((n, 16), np.uint32)
sc[:, 0] = ks
Pts = tuple(np.asarray(t) for t in C.points_from_host(C.G1, pts))

rows = n // nprocs
lo, hi = pid * rows, (pid + 1) * rows
sc_sh = NamedSharding(mesh, P(AXIS, None))
pt_sh = NamedSharding(mesh, _point_spec(C.G1, True))
g_sc = jax.make_array_from_process_local_data(sc_sh, sc[lo:hi])
g_pts = tuple(jax.make_array_from_process_local_data(pt_sh, t[lo:hi])
              for t in Pts)

res = _msm_sharded_jit(C.G1, mesh, g_sc, g_pts, 0, True)
got = C.points_to_host(C.G1, tuple(x[None] for x in res))[0]
assert got == want, (got, want)
print(f"MULTIHOST_OK {got[0]} {got[1]}", flush=True)

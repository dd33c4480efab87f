"""Per-unit XLA:CPU compile-cost profiling for the dryrun path."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

from groth16_tpu.ops import curve as C
from groth16_tpu.ops.limbs import N_LIMBS

t0 = time.perf_counter()


def lap(msg):
    global t0
    t = time.perf_counter()
    print(f"[{t - t0:7.1f}s] {msg}", flush=True)
    t0 = t


P8_1 = tuple(np.random.randint(0, 1 << 16, (8, N_LIMBS)).astype(np.uint32) for _ in range(3))
P8_2 = tuple(np.random.randint(0, 1 << 16, (8, 2, N_LIMBS)).astype(np.uint32) for _ in range(3))
sc8 = np.random.randint(0, 1 << 16, (8, N_LIMBS)).astype(np.uint32)

lap("setup")

# 1. one G1 point_add instantiation
f = jax.jit(lambda P, Q: C.rcb_add(C.G1.fops, P, Q, jnp.asarray(C.G1.b3_limbs)))
jax.block_until_ready(f(P8_1, P8_1))
lap("G1 point_add [8] compile+run")

# 2. one G2 point_add instantiation
f = jax.jit(lambda P, Q: C.rcb_add(C.G2.fops, P, Q, jnp.asarray(C.G2.b3_limbs)))
jax.block_until_ready(f(P8_2, P8_2))
lap("G2 point_add [8] compile+run")

# 3. G2 point_add with opt level 0
f = jax.jit(lambda P, Q: C.rcb_add(C.G2.fops, P, Q, jnp.asarray(C.G2.b3_limbs)),
            compiler_options={"xla_backend_optimization_level": "0"})
try:
    jax.block_until_ready(f(P8_2, P8_2))
    lap("G2 point_add [8] O0 compile+run")
except Exception as e:
    lap(f"O0 failed: {e}")

# 4. G2 scalar_mul ladder (scan) [8]
jax.block_until_ready(C.scalar_mul(C.G2, jnp.asarray(sc8), P8_2))
lap("G2 scalar_mul [8] compile+run")

# 5. G2 naive msm = scalar_mul + tree_sum
from groth16_tpu.ops import msm as M
jax.block_until_ready(M.msm_naive(C.G2, jnp.asarray(sc8), P8_2))
lap("G2 msm_naive [8] compile+run (reuses scalar_mul? no - inlined)")

# 6. G1 scalar_mul [8]
jax.block_until_ready(C.scalar_mul(C.G1, jnp.asarray(sc8), P8_1))
lap("G1 scalar_mul [8] compile+run")

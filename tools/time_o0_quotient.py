"""Time XLA:CPU compile of the staged-prover programs at O0 vs default."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import functools

import jax.numpy as jnp

from groth16_tpu.parallel.mesh import make_mesh
from groth16_tpu.parallel import prover_shard as PS
from groth16_tpu.protocol.device_inputs import prove_core_inputs
from groth16_tpu.protocol.prover import Mask

sys.path.insert(0, "/root/repo")
import __graft_entry__ as GE

t0 = time.perf_counter()


def lap(msg):
    global t0
    t = time.perf_counter()
    print(f"[{t - t0:7.1f}s] {msg}", flush=True)
    t0 = t


zkey, wtns = GE._tiny_zkey(6)
flavour, log2n, args = prove_core_inputs(zkey, wtns, Mask(r=5, s=9))
mesh = make_mesh(8)
lap("setup (fake zkey 2^6)")

(witness_std, coeff_mont, rows, cols, matrix_sel, *_rest) = args

opt = sys.argv[1] if len(sys.argv) > 1 else "0"
fn = jax.jit(
    functools.partial(PS.quotient_scalars_sharded.__wrapped__, mesh, flavour, log2n),
    compiler_options={"xla_backend_optimization_level": opt},
)
out = jax.block_until_ready(fn(witness_std, coeff_mont, rows, cols, matrix_sel))
lap(f"quotient_scalars_sharded compile+run at O{opt}")

"""Time each compiled program of the multichip dryrun path, cold (no
persistent cache), on an 8-virtual-device CPU mesh — mirrors what the
driver's dryrun harness sees on a machine where the AOT cache is useless."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# NO persistent cache: simulate the driver machine

t_start = time.perf_counter()


def lap(msg):
    print(f"[{time.perf_counter() - t_start:8.1f}s] {msg}", flush=True)


import jax.numpy as jnp

from groth16_tpu.models.circuits import synthetic_circuit
from groth16_tpu.protocol.fake_setup import fake_circuit_setup, ToxicWaste
from groth16_tpu.protocol.types import Flavour
from groth16_tpu.protocol.device_inputs import prove_core_inputs
from groth16_tpu.protocol.prover import Mask
from groth16_tpu.parallel.mesh import make_mesh

lap("imports done")

r1cs, wtns = synthetic_circuit(6)
toxic = ToxicWaste(alpha=1235, beta=781, gamma=4243, delta=9999, tau=106)
zkey = fake_circuit_setup(r1cs, toxic, Flavour.Snarkjs)
lap("fake setup done")

flavour, log2n, args = prove_core_inputs(zkey, wtns, Mask(r=5, s=9))
(witness_std, coeff_mont, rows, cols, matrix_sel,
 a1, b1, b2, c1, h1, spec, mask) = args
mesh = make_mesh(8)
lap("inputs + mesh done")

from groth16_tpu.parallel.prover_shard import quotient_scalars_sharded
qs = quotient_scalars_sharded(mesh, flavour, log2n, witness_std, coeff_mont,
                              rows, cols, matrix_sel)
qs.block_until_ready()
lap("quotient_scalars_sharded compiled+ran")

from groth16_tpu.parallel.msm_shard import _msm_sharded_jit
from groth16_tpu.parallel.prover_shard import pad_points_scalars
from groth16_tpu.ops import curve as C

sc, pts = pad_points_scalars(C.G1, 8, witness_std, a1)
res = _msm_sharded_jit(C.G1, mesh, sc, pts, 0)
jax.block_until_ready(res)
lap("G1 sharded MSM compiled+ran (shape %s)" % (sc.shape,))

sc2, pts2 = pad_points_scalars(C.G2, 8, witness_std, b2)
res2 = _msm_sharded_jit(C.G2, mesh, sc2, pts2, 0)
jax.block_until_ready(res2)
lap("G2 sharded MSM compiled+ran")

sc3, pts3 = pad_points_scalars(C.G1, 8, qs, h1)
res3 = _msm_sharded_jit(C.G1, mesh, sc3, pts3, 0)
jax.block_until_ready(res3)
lap("H1 sharded MSM (reuse?) ran (shape %s)" % (sc3.shape,))

# the small device scalar_muls the staged prover currently does
from groth16_tpu.ops import curve as CC
r_std = mask[0]
s1 = CC.scalar_mul(CC.G1, r_std[None], tuple(x[None] for x in (pts[0][:1], pts[1][:1], pts[2][:1])))
jax.block_until_ready(s1)
lap("G1 scalar_mul [1] compiled+ran")
s2 = CC.scalar_mul(CC.G2, r_std[None], tuple(x[None] for x in (pts2[0][:1], pts2[1][:1], pts2[2][:1])))
jax.block_until_ready(s2)
lap("G2 scalar_mul [1] compiled+ran")

res_h = C.points_to_host(C.G1, tuple(x[None] for x in res))
lap("points_to_host G1 done")
res_h2 = C.points_to_host(C.G2, tuple(x[None] for x in res2))
lap("points_to_host G2 done")

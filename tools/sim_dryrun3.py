import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/dryrun_cache2")
t0 = time.perf_counter()
def lap(m):
    global t0
    t = time.perf_counter(); print(f"[{t-t0:6.1f}s] {m}", flush=True); t0 = t

import __graft_entry__
from groth16_tpu.parallel.mesh import make_mesh
from groth16_tpu.parallel import prover_shard as PS
from groth16_tpu.protocol.device_inputs import prove_core_inputs
from groth16_tpu.protocol.prover import Mask
from groth16_tpu.ops import curve as C
import jax.numpy as jnp
lap("imports")
zkey, wtns = __graft_entry__._tiny_zkey(6)
lap("fake setup (host)")
flavour, log2n, args = prove_core_inputs(zkey, wtns, Mask(r=5, s=9))
mesh = make_mesh(8)
(witness_std, coeff_mont, rows, cols, matrix_sel, a1, b1, b2, c1, h1, spec, mask) = args
lap("inputs")
qs = PS.quotient_scalars_sharded(mesh, flavour, log2n, witness_std, coeff_mont, rows, cols, matrix_sel)
qs.block_until_ready()
lap("quotient")
nmax = 64
def padded(cv, sc, pts):
    npts = pts[0].shape[0]
    sc = jnp.pad(sc, [(0, nmax - sc.shape[0]), (0, 0)])
    pad = nmax - npts
    if pad:
        infs = C.inf_like(cv)
        pts = tuple(jnp.concatenate([p, jnp.broadcast_to(i, (pad,) + i.shape)], 0) for p, i in zip(pts, infs))
    return sc, pts
from groth16_tpu.parallel.msm_shard import _msm_sharded_jit
sc, pts = padded(C.G1, witness_std, a1)
r1 = _msm_sharded_jit(C.G1, mesh, sc, pts, 0); jax.block_until_ready(r1)
lap("G1 msm #1")
sc, pts2 = padded(C.G1, witness_std, b1)
r2 = _msm_sharded_jit(C.G1, mesh, sc, pts2, 0); jax.block_until_ready(r2)
lap("G1 msm #2 (cached exe)")
sc, pts3 = padded(C.G2, witness_std, b2)
r3 = _msm_sharded_jit(C.G2, mesh, sc, pts3, 0); jax.block_until_ready(r3)
lap("G2 msm")
ph = C.points_to_host(C.G1, tuple(x[None] for x in r1))
lap("points_to_host G1")
ph2 = C.points_to_host(C.G2, tuple(x[None] for x in r3))
lap("points_to_host G2")
from groth16_tpu.protocol.types import extract_vkey
from groth16_tpu.utils import pairing as PR
pr = PR.pairing(zkey.spec.alpha1, zkey.spec.beta2)
lap("one host pairing")

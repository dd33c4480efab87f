"""Microbench: in-kernel Montgomery-mul variants on the real TPU.

Times K back-to-back dependent muls inside ONE pallas kernel (VMEM-resident,
fenced once by a device->host copy), so the number isolates mul throughput
from dispatch/tunnel overhead.  Variants:
  ks     — column product + lazy-carry relax2 + final Kogge-Stone (current)
  cios   — interleaved accumulate-reduce (_KFp.mul_cios)

Usage: PYTHONPATH=.:$PYTHONPATH python tools/bench_mul_kernels.py [K] [iters]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from groth16_tpu.ops import kernels as KN
from groth16_tpu.ops.field import FP
from groth16_tpu.ops.limbs import N_LIMBS, int_to_limbs, limbs_to_int

BLK = 512
K = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def make_call(variant: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, p_ref, pp_ref, pc_ref, o_ref):
        fp = KN._KFp(p_ref[:], pp_ref[:], pc_ref[:])
        mul = fp.mul_cios if variant == "cios" else fp.mul
        x = a_ref[:]
        b = b_ref[:]

        def body(_, x):
            return mul(x, b)

        o_ref[:] = jax.lax.fori_loop(0, K, body, x)

    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((N_LIMBS, BLK), jnp.uint32),
    )


def main():
    tile = lambda v: jnp.asarray(
        np.repeat(np.asarray(v, np.uint32)[:, None], BLK, axis=1))
    consts = (tile(FP.p_limbs), tile(FP.pprime_limbs), tile(FP.pc_limbs))
    rng = np.random.default_rng(3)
    va = [int(rng.integers(0, 1 << 62)) ** 4 % FP.modulus for _ in range(BLK)]
    vb = [int(rng.integers(0, 1 << 62)) ** 4 % FP.modulus for _ in range(BLK)]
    a = jnp.asarray(np.stack([int_to_limbs(v) for v in va], 1).astype(np.uint32))
    b = jnp.asarray(np.stack([int_to_limbs(v) for v in vb], 1).astype(np.uint32))

    # oracle: x <- x*b*R^-1 mod p, K times
    P, R = FP.modulus, 1 << 256
    RI = pow(R, -1, P)
    exp0 = va[0]
    for _ in range(K):
        exp0 = exp0 * vb[0] * RI % P

    for variant in ("ks", "cios"):
        call = make_call(variant)
        out = np.asarray(call(a, b, *consts))  # compile + warm
        assert limbs_to_int(out[:, 0]) == exp0, f"{variant} WRONG RESULT"
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = np.asarray(call(a, b, *consts))
        dt = (time.perf_counter() - t0) / ITERS
        per_mul_ns = dt / (K * BLK) * 1e9
        print(f"{variant:5s}: {dt*1e3:8.2f} ms for {K} x [{N_LIMBS},{BLK}] muls "
              f"-> {per_mul_ns:7.2f} ns/mul-element "
              f"({K*BLK/dt/1e6:.1f}M muls/s)", flush=True)


if __name__ == "__main__":
    main()

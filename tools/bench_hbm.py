#!/usr/bin/env python
"""Raw HBM bandwidth probe for the attached TPU chip.

Every MSM phase (gather, tree glue, mid kernels) measures ~the same GB/s on
this chip, which smells memory-bound — this tool pins down the actual
achievable bandwidth so docs/PERF.md speed-of-light numbers use a measured
roofline, not the spec sheet.

Measures, with in-jit repetition (K reps inside one jitted program, fenced
once) to dodge the tunnel's per-dispatch overhead:
  * stream copy   y = x + 1          (1 read + 1 write per element)
  * reduce        sum(x)             (1 read)
  * random row gather at 128/512-byte rows (the MSM's access pattern)

Each rep is separated by `jax.lax.optimization_barrier`, so XLA cannot
loop-fuse the K passes into one (it otherwise folds the dependent `+1`
chain into a single kernel and sibling-fuses repeated reductions — both
were measured inflating the reported GB/s up to REPS-fold).  A sanity
check at the end flags any number above the chip's plausible ceiling.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

# No v5e-lite spec sheet is available here; full v5e HBM is ~820 GB/s, so
# anything above this bound means a fusion/caching artifact, not bandwidth.
PLAUSIBLE_GBS_CEILING = 1000.0


def fence(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[-1])


def timeit(name, fn, x, *args, iters=3, bytes_moved=None):
    fence(fn(x, *args))
    t0 = time.perf_counter()
    for i in range(iters):
        # vary an input element each iter: the experimental TPU tunnel's
        # caching layer can replay a previous result for byte-identical
        # inputs (same reason bench.py perturbs its MSM scalars)
        xv = x.at[0, 0].set(jnp.uint32(i + 1))
        fence(fn(xv, *args))
    dt = (time.perf_counter() - t0) / iters
    gbs = (bytes_moved / dt / 1e9) if bytes_moved else 0.0
    flag = "  (!> ceiling — fusion artifact?)" if gbs > PLAUSIBLE_GBS_CEILING else ""
    print(f"{name:44s} {dt*1e3:9.1f} ms   {gbs:7.1f} GB/s{flag}", flush=True)
    return dt


REPS = 8


def _barrier(x):
    return jax.lax.optimization_barrier(x)


def main():
    n_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n = n_mb * (1 << 20) // 4           # uint32 words
    x = jnp.arange(n, dtype=jnp.uint32).reshape(-1, 128)
    rows = x.shape[0]

    @jax.jit
    def copy_loop(x):
        # K materialized elementwise passes (barrier stops loop fusion)
        y = x
        for _ in range(REPS):
            y = _barrier(y + jnp.uint32(1))
        return y

    @jax.jit
    def reduce_loop(x):
        # each rep's input depends on the previous rep's scalar result, so
        # every reduction genuinely re-reads the array from HBM
        s = jnp.uint32(0)
        for _ in range(REPS):
            s = _barrier(s + jnp.sum(x + s))
        return s

    nb = n * 4
    timeit(f"stream y=x+1 x{REPS} ({n_mb} MB)", copy_loop, x,
           bytes_moved=REPS * 2 * nb)
    timeit(f"reduce sum(x) x{REPS}", reduce_loop, x, bytes_moved=REPS * nb)

    # random row gather: 512-byte rows ([*, 128] u32) vs 128-byte rows
    m = rows
    idx = jnp.asarray(np.random.default_rng(0).permutation(m).astype(np.int32))

    @jax.jit
    def gather128(x, idx):
        out = x
        for _ in range(REPS):
            out = _barrier(out[idx])
        return out

    x32 = jnp.arange(m * 32, dtype=jnp.uint32).reshape(m, 32)

    @jax.jit
    def gather32(x, idx):
        out = x
        for _ in range(REPS):
            out = _barrier(out[idx])
        return out

    timeit(f"row gather [m,128]u32 x{REPS} (512B rows)", gather128, x, idx,
           bytes_moved=REPS * 2 * m * 512)
    timeit(f"row gather [m,32]u32 x{REPS} (128B rows)", gather32, x32, idx,
           bytes_moved=REPS * 2 * m * 128)

    # near-contiguous gather upper bound: a rolled iota is NOT the identity
    # (XLA rewrites an identity gather to a copy) but stays DMA-friendly
    roll = jnp.roll(jnp.arange(m, dtype=jnp.int32), 1)
    timeit(f"row gather [m,128] rolled-iota x{REPS}", gather128, x, roll,
           bytes_moved=REPS * 2 * m * 512)


if __name__ == "__main__":
    main()

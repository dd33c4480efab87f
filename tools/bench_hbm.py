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


def fence(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[-1])


def timeit(name, fn, *args, iters=3, bytes_moved=None):
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        fence(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    gbs = (bytes_moved / dt / 1e9) if bytes_moved else 0.0
    print(f"{name:44s} {dt*1e3:9.1f} ms   {gbs:7.1f} GB/s", flush=True)
    return dt


REPS = 8


def main():
    n_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n = n_mb * (1 << 20) // 4           # uint32 words
    x = jnp.arange(n, dtype=jnp.uint32).reshape(-1, 128)
    rows = x.shape[0]

    @jax.jit
    def copy_loop(x):
        def body(i, acc):
            return acc + jnp.uint32(1)
        # K dependent elementwise passes over the array
        y = x
        for _ in range(REPS):
            y = y + jnp.uint32(1)
        return y

    @jax.jit
    def reduce_loop(x):
        s = jnp.uint32(0)
        y = x
        for i in range(REPS):
            s = s + jnp.sum(y + jnp.uint32(i))
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
            out = out[idx]
        return out

    x32 = jnp.arange(m * 32, dtype=jnp.uint32).reshape(m, 32)

    @jax.jit
    def gather32(x, idx):
        out = x
        for _ in range(REPS):
            out = out[idx]
        return out

    timeit(f"row gather [m,128]u32 x{REPS} (512B rows)", gather128, x, idx,
           bytes_moved=REPS * 2 * m * 512)
    timeit(f"row gather [m,32]u32 x{REPS} (128B rows)", gather32, x32, idx,
           bytes_moved=REPS * 2 * m * 128)

    # contiguous (iota) gather — DMA-friendly ordering upper bound
    iota = jnp.arange(m, dtype=jnp.int32)
    timeit(f"row gather [m,128] iota idx x{REPS}", gather128, x, iota,
           bytes_moved=REPS * 2 * m * 512)


if __name__ == "__main__":
    main()

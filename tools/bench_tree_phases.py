#!/usr/bin/env python
"""Phase isolation for the merge-tree MSM: times (a) sort+gather+sign,
(b) tree glue with a no-op mid, (c) one mid_pallas at the level-1 shape,
(d) full window_sums_tree, (e) the fused-fold path for comparison.

Run on the TPU:  python tools/bench_tree_phases.py [log2n] [group]
"""

import functools
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

from groth16_tpu.ops import curve as C
from groth16_tpu.ops import msm as M
from groth16_tpu.ops import msm_tree as MT
from groth16_tpu.ops import kernels_tree as KT
from groth16_tpu.ops.limbs import N_LIMBS

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # reuse the cached point set


def fence(out):
    """Force execution with a TINY host readback: a data-dependent scalar
    per leaf (np.asarray of the full output would drag hundreds of MB
    through the tunnel at ~20 MB/s and swamp the measurement)."""
    return jax.tree.map(lambda x: np.asarray(x.ravel()[-1]), out)


def timeit(name, fn, *args, iters=3):
    fence(fn(*args))   # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fence(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:10.1f} ms", flush=True)
    return dt


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    group = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n = 1 << log2n
    c = 16
    cv = C.G1
    rng = np.random.default_rng(3)
    scalars = rng.integers(0, 1 << 16, size=(n, N_LIMBS), dtype=np.uint32)
    scalars[:, -1] &= 0x3FFF
    sc = jnp.asarray(scalars)
    P = bench.make_points(n)

    K = cv.fops

    @jax.jit
    def stage_sort_gather(sc, P):
        # mirrors the production pipeline: ±y row table, packed-key 2-op
        # sort, one bit-reversed gather index (see msm_tree.window_sums_tree)
        digits = M.signed_window_digits(sc, c)[:group]
        y = K.select(K.is_zero(P[2]), jnp.zeros_like(P[1]), P[1])
        rows = MT._fuse2(cv, P[0], y)
        R2 = rows.shape[1]
        rows_g = jnp.pad(rows, ((0, 0), (0, 128 - R2)))
        y_cols = rows_g[:, R2 // 2:R2].reshape(n, -1, 16)
        from groth16_tpu.ops import field as F
        from groth16_tpu.ops.field import FP
        neg_y = F.neg_mod(FP, y_cols).reshape(n, R2 // 2)
        neg_rows = jnp.concatenate(
            [rows_g[:, :R2 // 2], neg_y, rows_g[:, R2:]], axis=1)
        rows2 = jnp.concatenate([rows_g, neg_rows], axis=0)
        iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :],
                                digits.shape)
        key = (jnp.abs(digits) << 1) | (digits < 0).astype(jnp.int32)
        sk2, order = jax.lax.sort((key, iota), dimension=1, num_keys=1,
                                  is_stable=False)
        idx = order + ((sk2 & 1) << (n.bit_length() - 1))
        idx_st = MT._bitrev_permute(idx.reshape(-1))
        return sk2 >> 1, rows2[idx_st].T[:R2]

    sk, g_rows = stage_sort_gather(sc, P)
    sk = jax.block_until_ready(sk)
    timeit(f"sort+gather+sign ({group} windows)", stage_sort_gather, sc, P)

    # isolate the two gather formulations: row gather + XLA transpose vs a
    # lax.gather whose offset dim lands FIRST (transposed output, one op)
    rows128 = jnp.pad(MT._fuse2(cv, P[0], P[1]), ((0, 0), (0, 128 - 32)))
    idx = jnp.arange(group * n, dtype=jnp.int32) % n

    @jax.jit
    def gather_then_t(tbl, ix):
        return tbl[ix].T

    @jax.jit
    def gather_tfirst(tbl, ix):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(0,), collapsed_slice_dims=(0,), start_index_map=(0,))
        return jax.lax.gather(tbl, ix[:, None], dn, slice_sizes=(1, 128))

    dig4 = jnp.asarray(np.random.default_rng(5).integers(
        0, 1 << 15, size=(group, n), dtype=np.int32))

    @jax.jit
    def argsort_only(d):
        return jnp.argsort(d, axis=1, stable=False)

    @jax.jit
    def digits_only(s):
        return M.signed_window_digits(s, c)

    timeit("argsort only (group windows)", argsort_only, dig4)
    timeit("signed digits (ALL 16 windows)", digits_only, sc)
    timeit("row gather + XLA transpose", gather_then_t, rows128, idx)
    timeit("lax.gather offset-first (no transpose)", gather_tfirst, rows128, idx)

    def level_noop(cv_, A_pl, A_pr, B_pl, B_pr, match, aP, bP, want_em):
        mid = jnp.bitwise_xor(A_pr, B_pl)  # forces reads, no field math
        PL = jnp.where((match & aP)[None, :], mid, A_pl)
        PR = jnp.where((match & bP)[None, :], mid, B_pr)
        em0 = jnp.where(match[None, :], mid, A_pr) if want_em else None
        return PL, PR, em0

    @jax.jit
    def glue_core(sk, cols):
        """Level loop only: halves + flag takes + node wheres (xor mid);
        no emission collection, no routing."""
        G, m = sk.shape
        PL = PR = cols
        sk_st = MT._bitrev_permute(sk.reshape(-1))
        Kl = G * m // 2
        s = 1
        while s < m:
            A_pl, A_pr = PL[:, :Kl], PR[:, :Kl]
            B_pl, B_pr = PL[:, Kl:], PR[:, Kl:]
            kAL, kAR, kBL, kBR = MT._edge_keys_st(sk_st, Kl)
            match = kAR == kBL
            aP = kAL == kAR
            bP = kBL == kBR
            mid = jnp.bitwise_xor(A_pr, B_pl)
            PL = jnp.where((match & aP)[None, :], mid, A_pl)
            PR = jnp.where((match & bP)[None, :], mid, B_pr)
            Kl //= 2
            s *= 2
        return PL, PR

    nb = (1 << (c - 1)) + 1

    @functools.partial(jax.jit, static_argnums=2)
    def tree_only(sk, g_rows, which):
        lvl = {"noop": level_noop, "pallas": KT.level_pallas}[which]
        return MT.group_buckets_tree(cv, sk, g_rows, nb, lvl)

    timeit("glue core (no emissions/routing)", glue_core, sk, g_rows)
    timeit("tree glue only (no-op mid)", tree_only, sk, g_rows, "noop")

    # one level-1-sized mid_pallas
    Klvl = sk.shape[0] * sk.shape[1] // 2
    a_rows = g_rows[:, :Klvl]
    b_rows = g_rows[:, Klvl:]
    jit_mid = jax.jit(lambda a, b: KT.mid_pallas(cv, a, b))
    timeit(f"mid_pallas level-1 (K={Klvl})", jit_mid, a_rows, b_rows)
    del a_rows, b_rows

    timeit("tree full (pallas mid)", tree_only, sk, g_rows, "pallas")

    @jax.jit
    def full_tree(sc, P):
        return MT.window_sums_tree(cv, sc, P, c, group=group,
                                   level_fn=KT.level_pallas)

    sums = timeit_ret("window_sums_tree (all windows)", full_tree, sc, P,
                      iters=1)

    @jax.jit
    def horner_only(s):
        return M.horner_combine(cv, s, c)

    timeit("horner combine (W windows)", horner_only, sums)

    os.environ["GROTH16_TPU_MSM"] = "tree"
    os.environ["GROTH16_TPU_MSM_GROUP"] = str(group)

    @jax.jit
    def msm_full(sc, P):
        return M.msm(cv, sc, P, 0, True)

    timeit("msm full (tree dispatch)", msm_full, sc, P, iters=1)


def timeit_ret(name, fn, *args, iters=1):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        fence(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:10.1f} ms", flush=True)
    return out


if __name__ == "__main__":
    main()

"""Batched-affine merge-tree MSM bucket accumulation (TPU-first).

The Pippenger bucket phase in `ops/msm.py` folds each window's sorted
(digit, point) stream with sequential RCB15 complete additions — ~13 Fp
muls per consumed point.  This module replaces that fold with a binary
segmented MERGE TREE whose partials all stay **affine**, so each add is a
chord/tangent affine addition at ~7 Fp muls: slope denominators are
inverted with Montgomery's batch-inversion trick (1 product-tree mul +
2 down-walk muls per element, amortizing ONE field inversion per tree
level across a whole group of windows).  That is the classic
"batch-affine" MSM accumulation (the same points/s lever the fastest GPU
Groth16 provers use), re-shaped for the TPU VPU: every level is a wide
independent batch of adds, no data-dependent branches (doubling /
cancellation / infinity ride through selects).

Tree invariants (per window, over the digit-sorted stream of length m):

  * a NODE at level l covers 2^l consecutive stream elements and carries
    two affine partials: pL = running sum of its leftmost segment, and
    pR = rightmost (pL == pR when the node is single-segment "pure");
  * merging nodes A|B computes mid = A.pR + B.pL once (masked when the
    boundary keys differ) and emits every segment that closes strictly
    inside the merged node;
  * each bucket's segment closes EXACTLY ONCE across the whole tree
    (or survives to the root), so bucket assembly is one index-scatter
    plus one gather over the collected emissions — zero per-level
    bucket-array point additions.

Infinity is the affine (0, 0) encoding (the wire-format convention,
reference `groth16/bn128/curves.nim:49-50`); x == 0 never occurs on a
real BN254/twist point, and y == 0 would be 2-torsion, which the
prime-order groups exclude — so the (0,0) test and the nonzero-slope
denominators below are exhaustive.

Behavior parity: results equal the reference's `msmG1/msmG2`
(`groth16/bn128/msm.nim:35-83`) and this repo's naive oracle; only the
accumulation schedule differs.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import curve as C
from . import field as F
from .curve import CurveSpec
from .field import FP


def ncomp(cv: CurveSpec) -> int:
    """uint32 words per field element: 16 (Fp) / 32 (Fp2)."""
    return 16 if cv.name == "G1" else 32


def _unfuse2(cv: CurveSpec, rows: jnp.ndarray):
    """Fused affine rows [n, 2*ncomp] -> (x, y) with curve comp shapes."""
    nc = ncomp(cv)
    n = rows.shape[0]
    cs = cv.fops.comp_shape
    return rows[:, :nc].reshape((n,) + cs), rows[:, nc:2 * nc].reshape((n,) + cs)


def _fuse2(cv: CurveSpec, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    n = x.shape[0]
    return jnp.concatenate([x.reshape(n, -1), y.reshape(n, -1)], axis=-1)


def _inv_batch_jnp(cv: CurveSpec, den: jnp.ndarray) -> jnp.ndarray:
    """Batched field inversion of nonzero elements (Fp Fermat; Fp2 via the
    conjugate/norm trick, same shape as `curve.to_affine`)."""
    if cv.name == "G1":
        return F.inv_mod(FP, den)
    d0, d1 = den[..., 0, :], den[..., 1, :]
    norm = F.add_mod(FP, F.mont_mul(FP, d0, d0), F.mont_mul(FP, d1, d1))
    ninv = F.inv_mod(FP, norm)
    return jnp.stack(
        [F.mont_mul(FP, d0, ninv), F.neg_mod(FP, F.mont_mul(FP, d1, ninv))],
        axis=-2)


def mid_jnp(cv: CurveSpec, a_rows: jnp.ndarray, b_rows: jnp.ndarray) -> jnp.ndarray:
    """Batched affine addition of fused x|y rows: mid = A + B.

    Branchless over every group-law exception:
      * either operand (0,0)-infinity  -> the other operand
      * equal points                   -> tangent slope 3x^2 / 2y
      * opposite points (x1==x2,y1!=y2)-> (0,0)
    The masked slope denominator is never zero: 2y != 0 (no 2-torsion in
    the prime-order groups) and x2-x1 != 0 when x's differ; the
    cancel/infinity lanes divide by a dummy 1.
    """
    K = cv.fops
    x1, y1 = _unfuse2(cv, a_rows)
    x2, y2 = _unfuse2(cv, b_rows)
    i1 = jnp.all(a_rows == 0, axis=-1)
    i2 = jnp.all(b_rows == 0, axis=-1)
    eqx = K.eq(x1, x2)
    eqy = K.eq(y1, y2)
    dbl = eqx & eqy & ~i1
    cancel = eqx & ~eqy
    x1sq = K.sqr(x1)
    num = K.select(dbl, K.add(K.add(x1sq, x1sq), x1sq), K.sub(y2, y1))
    den = K.select(dbl, K.add(y1, y1), K.sub(x2, x1))
    one = jnp.broadcast_to(jnp.asarray(cv.one_limbs), den.shape)
    den = K.select(cancel | i1 | i2, one, den)
    lam = K.mul(num, _inv_batch_jnp(cv, den))
    x3 = K.sub(K.sub(K.sqr(lam), x1), x2)
    y3 = K.sub(K.mul(lam, K.sub(x1, x3)), y1)
    zero = jnp.zeros_like(x3)
    x3 = K.select(cancel, zero, x3)
    y3 = K.select(cancel, zero, y3)
    x3 = K.select(i2, x1, K.select(i1, x2, x3))
    y3 = K.select(i2, y1, K.select(i1, y2, y3))
    return _fuse2(cv, x3, y3)


def _edge_keys(sk: jnp.ndarray, s: int):
    """Node boundary keys for merging span-s nodes pairwise.

    sk int32[G, m] (sorted |digits| per window).  Returns flat [K] arrays
    (K = G*m/(2s)): A.kL, A.kR, B.kL, B.kR.  Window blocks are power-of-two
    aligned, so pair merges never straddle a window boundary.
    """
    kAL = sk[:, 0::2 * s].reshape(-1)
    kAR = sk[:, s - 1::2 * s].reshape(-1)
    kBL = sk[:, s::2 * s].reshape(-1)
    kBR = sk[:, 2 * s - 1::2 * s].reshape(-1)
    return kAL, kAR, kBL, kBR


def group_buckets_tree(cv: CurveSpec, sk: jnp.ndarray, rows_sorted: jnp.ndarray,
                       n_buckets: int, mid_fn=mid_jnp) -> jnp.ndarray:
    """Merge-tree bucket accumulation for one group of windows.

    sk: int32[G, m] per-window |digits| in sorted order (m a power of two);
    rows_sorted: uint32[G*m, 2*ncomp] affine x|y rows in the same order,
    wNAF signs already applied, (0,0) = infinity.
    Returns affine bucket rows uint32[G, n_buckets, 2*ncomp]
    (bucket b of window g = sum of its digit-|b| points; bucket 0 carries
    the digit-0 junk and is weighted 0 by the caller's reduction).
    """
    G, m = sk.shape
    R2 = rows_sorted.shape[1]
    PL = PR = rows_sorted
    ems, acts, keys, wins = [], [], [], []

    s = 1
    while s < m:
        A_pl, A_pr = PL[0::2], PR[0::2]
        B_pl, B_pr = PL[1::2], PR[1::2]
        kAL, kAR, kBL, kBR = _edge_keys(sk, s)
        match = kAR == kBL
        aP = kAL == kAR
        bP = kBL == kBR
        mid = mid_fn(cv, A_pr, B_pl)
        PL = jnp.where((match & aP)[:, None], mid, A_pl)
        PR = jnp.where((match & bP)[:, None], mid, B_pr)
        # emission slot 0: the mid (if it closed) or A.pR (segment ended at
        # A's right edge); slot 1: B.pL (segment ended at B's left edge)
        ems.append(jnp.where(match[:, None], mid, A_pr))
        acts.append(~aP & jnp.where(match, ~bP, True))
        keys.append(kAR)
        ems.append(B_pl)
        acts.append(~match & ~bP)
        keys.append(kBL)
        K_ = match.shape[0]
        w = jnp.repeat(jnp.arange(G, dtype=jnp.int32), K_ // G)
        wins += [w, w]
        s *= 2

    # roots: one node per window; pL always routes, pR only when impure
    kL, kR = sk[:, 0], sk[:, m - 1]
    ems += [PL, PR]
    acts += [jnp.ones((G,), bool), kL != kR]
    keys += [kL, kR]
    wg = jnp.arange(G, dtype=jnp.int32)
    wins += [wg, wg]

    EM = jnp.concatenate(ems, axis=0)
    ACT = jnp.concatenate(acts)
    KEY = jnp.concatenate(keys)
    WIN = jnp.concatenate(wins)
    S = EM.shape[0]
    sent = G * n_buckets
    dst = jnp.where(ACT, WIN * n_buckets + KEY, sent)
    slot = jnp.full((sent + 1,), S, jnp.int32).at[dst].set(
        jnp.arange(S, dtype=jnp.int32))
    EM_ext = jnp.concatenate([EM, jnp.zeros((1, R2), jnp.uint32)], axis=0)
    return EM_ext[slot][:sent].reshape(G, n_buckets, R2)


def window_sums_tree(cv: CurveSpec, scalars_std: jnp.ndarray, P,
                     window_bits: int, group: int = 5, mid_fn=mid_jnp):
    """All-window Pippenger sums [W, ...] via the batched-affine merge tree.

    Same contract as `msm.window_sums` (P projective with Z in {0, mont-1},
    i.e. wire-format affine points).  Windows are processed in groups so
    the per-level inversion work amortizes across the group.
    """
    from .msm import signed_window_digits, _weighted_bucket_reduce
    K = cv.fops
    c = window_bits
    half = 1 << (c - 1)
    nb = half + 1
    n = scalars_std.shape[0]
    npad = 1 << max(1, (n - 1).bit_length())
    digits = signed_window_digits(scalars_std, c)  # int32[W, n]
    W = digits.shape[0]
    if npad > n:
        digits = jnp.pad(digits, ((0, 0), (0, npad - n)))

    # affine x|y rows; zero the y plane where Z == 0 so infinity is (0,0)
    y = K.select(K.is_zero(P[2]), jnp.zeros_like(P[1]), P[1])
    rows = _fuse2(cv, P[0], y)
    R2 = rows.shape[1]
    if npad > n:
        rows = jnp.pad(rows, ((0, npad - n), (0, 0)))
    # tile-align rows for the gather (XLA's TPU row gather is ~4x faster on
    # (8,128)-aligned rows, and [n, 2*ncomp] pads to the same HBM anyway)
    rows_g = jnp.pad(rows, ((0, 0), (0, 128 - R2))) if R2 < 128 else rows

    groups = []
    for g0 in range(0, W, group):
        dg = digits[g0:g0 + group]                     # [G, npad] signed
        order = jnp.argsort(jnp.abs(dg), axis=1)
        ds = jnp.take_along_axis(dg, order, axis=1)    # sorted, signed
        sk = jnp.abs(ds)
        g_rows = rows_g[order.reshape(-1)][:, :R2]
        x, yy = _unfuse2(cv, g_rows)
        yy = K.select(ds.reshape(-1) < 0, K.neg(yy), yy)  # wNAF sign
        g_rows = _fuse2(cv, x, yy)
        groups.append(group_buckets_tree(cv, sk, g_rows, nb, mid_fn))

    brows = jnp.concatenate(groups, axis=0).reshape(W * nb, -1)
    bx, by = _unfuse2(cv, brows)
    cs = K.comp_shape
    B = C.from_affine(cv, bx.reshape((W, nb) + cs), by.reshape((W, nb) + cs))
    buckets = tuple(jnp.moveaxis(t, 0, 1) for t in B)  # [nb, W, ...comp]
    return _weighted_bucket_reduce(cv, buckets, nb)


def msm_tree(cv: CurveSpec, scalars_std: jnp.ndarray, P, window_bits: int = 0,
             group: int = 5, mid_fn=mid_jnp):
    """Full MSM through the merge-tree bucket phase (testing entry point;
    the production dispatch lives in `msm.msm`)."""
    from .msm import pick_window_bits, horner_combine
    c = window_bits or pick_window_bits(scalars_std.shape[0])
    sums = window_sums_tree(cv, scalars_std, P, c, group=group, mid_fn=mid_fn)
    return horner_combine(cv, sums, c)

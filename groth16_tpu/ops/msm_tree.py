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

TPU layout rules (learned the hard way — each violation measured 10-50x
off memory speed on the chip):

  * every large point array is LIMB-MAJOR uint32[R2, N]: the huge element
    axis rides the minor (lane) dimension, so nothing pads to the (8, 128)
    HBM tile.  Row-major [N, 32] pays 4x tile padding, and XLA once chose
    a [G, m, 32] layout with the G=5 axis minor — a 25.6x padding blowup
    that OOMed the chip;
  * nodes live in GLOBAL BIT-REVERSED storage order over the whole
    window-group stream (G a power of two): the radix-2 DIT trick makes
    every level's merge partners the two contiguous HALVES of the array
    (A = [:, :K], B = [:, K:], merged node k stored at column k) — no
    strided point slicing ever materializes.  Only the tiny int32/bool
    flag planes (computed in natural order from the sorted keys) are
    gather-permuted per level.

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
    """Fused ROW-major affine rows [n, 2*ncomp] -> (x, y) comp views."""
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


def mid_jnp(cv: CurveSpec, a_cols: jnp.ndarray, b_cols: jnp.ndarray) -> jnp.ndarray:
    """Batched affine addition mid = A + B on LIMB-MAJOR fused x|y columns
    uint32[2*ncomp, K] (the portable reference body; ops/kernels_tree.py is
    the TPU Pallas equivalent).

    Branchless over every group-law exception:
      * either operand (0,0)-infinity  -> the other operand
      * equal points                   -> tangent slope 3x^2 / 2y
      * opposite points (x1==x2,y1!=y2)-> (0,0)
    The masked slope denominator is never zero: 2y != 0 (no 2-torsion in
    the prime-order groups) and x2-x1 != 0 when x's differ; the
    cancel/infinity lanes divide by a dummy 1.
    """
    K = cv.fops
    x1, y1 = _unfuse2(cv, a_cols.T)
    x2, y2 = _unfuse2(cv, b_cols.T)
    i1 = jnp.all(a_cols == 0, axis=0)
    i2 = jnp.all(b_cols == 0, axis=0)
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
    return _fuse2(cv, x3, y3).T


def level_jnp(cv: CurveSpec, A_pl, A_pr, B_pl, B_pr, match, aP, bP,
              want_em: bool):
    """One whole tree level on limb-major fused columns: mids via `mid_jnp`
    plus the node-update selects (the portable reference body;
    ops/kernels_tree.level_pallas is the TPU equivalent with the selects
    fused into the phase-B kernel).  Returns (PL', PR', EM0); EM0 is None
    when want_em is False (level 1, where single-element nodes are always
    pure and no segment can close)."""
    mid = mid_jnp(cv, A_pr, B_pl)
    PL = jnp.where((match & aP)[None, :], mid, A_pl)
    PR = jnp.where((match & bP)[None, :], mid, B_pr)
    em0 = jnp.where(match[None, :], mid, A_pr) if want_em else None
    return PL, PR, em0


def _bitrev(n: int) -> jnp.ndarray:
    """Bit-reversal permutation of [0, n) (n a power of two), computed from
    an iota on device — as a baked constant the leaf permutation alone would
    add tens of MB to the program image."""
    bits = max(0, n.bit_length() - 1)
    idx = jnp.arange(n, dtype=jnp.int32)
    out = jnp.zeros_like(idx)
    for b in range(bits):
        out = out | (((idx >> b) & 1) << (bits - 1 - b))
    return out


def _bitrev_permute(x: jnp.ndarray) -> jnp.ndarray:
    """out[k] = x[bitrev(k)] for a 1D power-of-two array, as a transpose of
    the bit axes — NOT a gather: XLA TPU gathers of 4-byte rows (1D int32
    takes) measured ~60 ms per 4M elements, swamping the actual tree math.
    """
    n = x.shape[0]
    bits = max(0, n.bit_length() - 1)
    if bits <= 1:
        return x
    return (x.reshape((2,) * bits)
             .transpose(tuple(reversed(range(bits))))
             .reshape(n))


def _edge_keys_st(sk_st: jnp.ndarray, K: int):
    """Node boundary keys for the K merges of one level, in STORAGE order,
    as four contiguous SLICES of the bit-reversal-permuted sorted keys.

    With global bit-reversed storage, the natural stream position of merge
    k's A.kL is j*2^l (j = rev(k)), whose bit-reversal is k itself — and the
    other three boundary positions differ from it only in the low l bits,
    which reverse into CONSTANT top-bit offsets.  So for N = len(sk_st):

        A.kL = sk_st[0 : K]          A.kR = sk_st[N-2K : N-K]
        B.kL = sk_st[K : 2K]         B.kR = sk_st[N-K : N]

    No gathers, no strided slices — this replaced per-level bitrev gathers
    of the flag planes that measured ~half the tree glue time on-chip.
    """
    N = sk_st.shape[0]
    return (sk_st[:K], sk_st[N - 2 * K:N - K],
            sk_st[K:2 * K], sk_st[N - K:])


def group_buckets_tree(cv: CurveSpec, sk: jnp.ndarray, cols_storage: jnp.ndarray,
                       n_buckets: int, level_fn=level_jnp) -> jnp.ndarray:
    """Merge-tree bucket accumulation for one group of windows.

    sk: int32[G, m] per-window |digits| in SORTED (natural) order (G and m
    powers of two); cols_storage: uint32[2*ncomp, G*m] limb-major affine
    x|y columns of the concatenated sorted streams permuted into GLOBAL
    bit-reversed storage order (compose `_bitrev(G*m)` with the digit
    sort), wNAF signs already applied, (0,0) = infinity.

    Returns affine bucket rows uint32[G, n_buckets, 2*ncomp] (bucket b of
    window g = sum of its digit-|b| points; bucket 0 carries the digit-0
    junk and is weighted 0 by the caller's reduction).
    """
    G, m = sk.shape
    R2 = cols_storage.shape[0]
    N = G * m
    PL = PR = cols_storage
    ems, acts, keys, wins = [], [], [], []
    # ONE key permutation per group; all per-level flag planes below are
    # contiguous slices / iota formulas on top of it
    sk_st = _bitrev_permute(sk.reshape(-1))
    gb = max(0, G.bit_length() - 1)

    K = N // 2
    s = 1
    while s < m:
        A_pl, A_pr = PL[:, :K], PR[:, :K]
        B_pl, B_pr = PL[:, K:], PR[:, K:]
        kAL, kAR, kBL, kBR = _edge_keys_st(sk_st, K)
        match = kAR == kBL
        aP = kAL == kAR
        bP = kBL == kBR
        # level 1 merges single-element (always-pure) nodes: no segment can
        # close, so its emission planes — the two WIDEST of the whole tree —
        # are statically dead and never materialized
        want_em = s > 1
        PL, PR, em0 = level_fn(cv, A_pl, A_pr, B_pl, B_pr,
                               match, aP, bP, want_em)
        if want_em:
            # emission slot 0: the mid (if it closed) or A.pR (segment ended
            # at A's right edge); slot 1: B.pL (segment ended at B's left
            # edge)
            ems.append(em0)
            acts.append(~aP & jnp.where(match, ~bP, True))
            keys.append(kAR)
            ems.append(B_pl)
            acts.append(~match & ~bP)
            keys.append(kBL)
            # window of storage merge k = rev_gb(k mod G) (merges never
            # straddle windows; the window bits of the natural index are k's
            # low bits, reversed) — an iota formula, no gather
            k_idx = jnp.arange(K, dtype=jnp.int32)
            w = jnp.zeros((K,), jnp.int32)
            for b in range(gb):
                w = w | (((k_idx >> b) & 1) << (gb - 1 - b))
            wins += [w, w]
        K //= 2
        s *= 2

    # roots: one node per window (storage column k = window bitrev_G(k));
    # pL always routes, pR only when impure
    brg = _bitrev(G)
    kL = jnp.take(sk[:, 0], brg)
    kR = jnp.take(sk[:, m - 1], brg)
    ems += [PL, PR]
    acts += [jnp.ones((G,), bool), kL != kR]
    keys += [kL, kR]
    wins += [brg, brg]

    EM = jnp.concatenate(ems, axis=1)          # [R2, S] limb-major
    ACT = jnp.concatenate(acts)
    KEY = jnp.concatenate(keys)
    WIN = jnp.concatenate(wins)
    S = EM.shape[1]
    sent = G * n_buckets
    dst = jnp.where(ACT, WIN * n_buckets + KEY, sent)
    slot = jnp.full((sent + 1,), S, jnp.int32).at[dst].set(
        jnp.arange(S, dtype=jnp.int32))
    EMx = jnp.concatenate([EM, jnp.zeros((R2, 1), jnp.uint32)], axis=1)
    bcols = jnp.take(EMx, slot[:sent], axis=1)     # [R2, G*nb] (tiny out)
    return bcols.T.reshape(G, n_buckets, R2)


def _pow2_groups(W: int, cap: int):
    """Split W windows into power-of-two group sizes <= cap (cap a power
    of two), largest first."""
    out = []
    rem = W
    while rem:
        g = min(cap, 1 << (rem.bit_length() - 1))
        out.append(g)
        rem -= g
    return out


def window_sums_tree(cv: CurveSpec, scalars_std: jnp.ndarray, P,
                     window_bits: int, group: int = 8, level_fn=level_jnp):
    """All-window Pippenger sums [W, ...] via the batched-affine merge tree.

    Same contract as `msm.window_sums` (P projective with Z in {0, mont-1},
    i.e. wire-format affine points).  Windows are processed in power-of-two
    groups (<= `group`) so the per-level inversion work amortizes across
    the group.
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
    # DOUBLED ±y table: row i+npad is row i with y negated (0 - 0 keeps the
    # (0,0) infinity encoding), so the wNAF sign rides the gather INDEX —
    # built once per MSM and reused by every window group, replacing a
    # [R2, G*npad] conditional-negate pass per group
    y_cols = rows_g[:, R2 // 2:R2].reshape(npad, -1, 16)
    neg_y = F.neg_mod(FP, y_cols).reshape(npad, R2 // 2)  # p-y; 0 stays 0
    neg_rows = jnp.concatenate(
        [rows_g[:, :R2 // 2], neg_y, rows_g[:, R2:]], axis=1)
    rows2 = jnp.concatenate([rows_g, neg_rows], axis=0)   # [2*npad, 128]

    cap = 1 << max(0, group.bit_length() - 1)
    groups = []
    g0 = 0
    for G in _pow2_groups(W, cap):
        dg = digits[g0:g0 + G]                         # [G, npad] signed
        g0 += G
        # ONE 2-operand sort with the sign PACKED into the key's low bit:
        # key = |d|<<1 | (d<0) groups equal |d| contiguously (tree segments
        # are by |d|; intra-bucket order is irrelevant to the sum) and the
        # co-sorted iota is the permutation — no third operand, no separate
        # sign plane, no follow-up take_along
        iota = jnp.broadcast_to(
            jnp.arange(npad, dtype=jnp.int32)[None, :], dg.shape)
        key = (jnp.abs(dg) << 1) | (dg < 0).astype(jnp.int32)
        sk2, order = jax.lax.sort(
            (key, iota), dimension=1, num_keys=1, is_stable=False)
        sk = sk2 >> 1                                  # sorted |d| (natural)
        # compose sort + wNAF sign + global bit-reversal into ONE gather
        # index, permuted once, so the one big point gather lands directly
        # in tree storage order with signs applied
        idx = order + ((sk2 & 1) << (npad.bit_length() - 1))  # +npad if neg
        idx_st = _bitrev_permute(idx.reshape(-1))
        # gather 128-wide rows (fast path), ONE transpose to limb-major —
        # row-major [*, 32] temps pay 4x HBM tile padding
        cols = rows2[idx_st].T[:R2]                    # [R2, G*npad]
        groups.append(group_buckets_tree(cv, sk, cols, nb, level_fn))

    brows = jnp.concatenate(groups, axis=0).reshape(W * nb, -1)
    bx, by = _unfuse2(cv, brows)
    cs = K.comp_shape
    B = C.from_affine(cv, bx.reshape((W, nb) + cs), by.reshape((W, nb) + cs))
    buckets = tuple(jnp.moveaxis(t, 0, 1) for t in B)  # [nb, W, ...comp]
    return _weighted_bucket_reduce(cv, buckets, nb)


def msm_tree(cv: CurveSpec, scalars_std: jnp.ndarray, P, window_bits: int = 0,
             group: int = 8, level_fn=level_jnp):
    """Full MSM through the merge-tree bucket phase (testing entry point;
    the production dispatch lives in `msm.msm`).  Defaults to the SAME
    window heuristic as the production tree dispatch (pick_window_bits_tree)
    so oracle comparisons and benches through this entry measure the
    production configuration."""
    from .msm import pick_window_bits_tree, horner_combine
    c = window_bits or pick_window_bits_tree(scalars_std.shape[0])
    sums = window_sums_tree(cv, scalars_std, P, c, group=group,
                            level_fn=level_fn)
    return horner_combine(cv, sums, c)

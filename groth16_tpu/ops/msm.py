"""Multi-scalar multiplication (Pippenger) for TPU.

TPU-native design: the reference splits the input into contiguous chunks and
runs constantine's serial Pippenger per chunk on a taskpool
(`groth16/bn128/msm.nim:89-158`).  A TPU has no fast scatter-accumulate, so
the bucket phase is re-designed around sort + recursive lane-fold:

  per window (windows vmapped in memory-bounded groups):
    1. argsort by this window's digit (XLA sort is cheap; the expensive part
       is moving points, so the stripe transpose is folded into the ONE
       permutation gather)
    2. recursive lane-fold: the sorted stream reshaped into `lanes`
       contiguous stripes; one short lax.scan accumulates running segments
       per stripe and emits every segment that closes inside its stripe;
       per-lane trailing partials become the next (lanes-sized) level
    3. emissions route into [B] buckets via an int32-index scatter + one
       point gather (scattering 4-byte indices, not 192-byte points)
    4. weighted reduction sum_b b*bucket_b via the [Q, L] factorization
       b = q*L + l with tree/associative reductions on TPU (point ops are
       single Pallas calls there) or sequential scans on CPU (small graphs)
  Horner combine over windows: c doublings + 1 add per window.

All point arithmetic dispatches through `curve.point_add/point_double`
(Pallas kernels on TPU, complete-formula jnp elsewhere), so mixed
infinity/duplicate cases need no branches.  Behavior parity: result equals
the reference's `msmG1/msmG2/msmMultiThreaded*` (`bn128/msm.nim:35-158`) and
the naive oracle (`msm.nim:162-198`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import curve as C
from .curve import CurveSpec
from .limbs import LIMB_BITS, N_LIMBS

NBITS = 254  # BN254 scalars fit 254 bits


def pick_window_bits(n: int) -> int:
    """Pippenger window heuristic c ~ log2(n) - 3, clamped to [4, 16]."""
    return max(4, min(16, max(1, n).bit_length() - 3))


def _window_digits(scalars_std: jnp.ndarray, w: int, c: int) -> jnp.ndarray:
    """Extract digit w (bits [w*c, (w+1)*c)) from uint32[N, 16] limbs -> int32[N].

    c <= 16 so a digit straddles at most two 16-bit limbs.
    """
    pos = w * c
    limb, off = divmod(pos, LIMB_BITS)
    lo = scalars_std[..., limb] >> off
    if off + c > LIMB_BITS and limb + 1 < N_LIMBS:
        lo = lo | (scalars_std[..., limb + 1] << (LIMB_BITS - off))
    return (lo & ((1 << c) - 1)).astype(jnp.int32)


def all_window_digits(scalars_std: jnp.ndarray, c: int) -> jnp.ndarray:
    """int32[n_windows, N] digit planes for all windows."""
    n_windows = -(-NBITS // c)
    return jnp.stack([_window_digits(scalars_std, w, c) for w in range(n_windows)])


def _scatter_points(cv: CurveSpec, n_slots: int, dst: jnp.ndarray, pts):
    """Route a point batch into `n_slots`+1 slots (last = dummy); each real
    slot is written at most once.

    Implemented as an int32 index scatter followed by one point gather —
    scattering 4-byte indices instead of 192-byte points is ~50x less
    scatter traffic (XLA TPU scatter is the bottleneck), and the gather runs
    at memory speed."""
    flat_dst = dst.reshape(-1)
    m = flat_dst.shape[0]
    pos = jnp.arange(m, dtype=jnp.int32)
    # slot -> emission index; sentinel m = the appended infinity row
    slot = jnp.full((n_slots + 1,), m, jnp.int32).at[flat_dst].set(pos)
    infs = C.inf_like(cv, (1,))
    out = []
    for s, i in zip(pts, infs):
        flat = s.reshape((m,) + s.shape[dst.ndim:])
        flat = jnp.concatenate([flat, i], 0)
        out.append(flat[slot])
    return tuple(out)


_FOLD_T = 32  # sequential steps per lane-fold level


def _lane_fold_level(cv: CurveSpec, keys: jnp.ndarray, P, n_buckets: int,
                     order: jnp.ndarray | None = None):
    """One recursive level of segmented bucket accumulation over a SORTED
    (key, point) stream of length m = lanes * T:

      * reshape into `lanes` contiguous stripes of T elements
      * one lax.scan over T: every lane sums its running segment, emitting
        each segment that closes strictly inside its stripe
      * scatter emissions into a [B+1] bucket array (unique per bucket)
      * return the per-lane trailing partials — a sorted stream of length
        `lanes` for the next level

    The traced graph cost is ONE point_add instantiation per level,
    regardless of m."""
    m = keys.shape[0]
    T = min(_FOLD_T, m)
    lanes = m // T
    if order is not None:
        # fold the stripe transpose INTO the sort gather: one gather directly
        # into [T, lanes] layout instead of gather + materialized transpose
        oT = order.reshape(lanes, T).T                   # [T, lanes]
        kT = keys[oT]
        PT = tuple(p[oT] for p in P)
    else:
        kT = keys.reshape(lanes, T).T                    # [T, lanes]
        PT = tuple(p.reshape((lanes, T) + p.shape[1:]).swapaxes(0, 1) for p in P)

    def acc_body(state, xs):
        prev_key, run = state
        k, pt = xs
        new_seg = k != prev_key
        emit = (new_seg, prev_key, run)
        run = C.point_select(cv, new_seg, pt, C.point_add(cv, run, pt))
        return (k, run), emit

    from . import kernels
    U = 8 if kernels.use_tree_reductions() else 1
    init = (kT[0], tuple(p[0] for p in PT))
    (trail_key, trail_pt), (masks, ekeys, epts) = jax.lax.scan(
        acc_body, init, (kT[1:], tuple(p[1:] for p in PT)), unroll=U)
    dst = jnp.where(masks, ekeys, n_buckets)
    buckets = _scatter_points(cv, n_buckets, dst, epts)
    return buckets, trail_key, trail_pt


def _window_sum(cv: CurveSpec, keys: jnp.ndarray, P, n_buckets: int):
    """One Pippenger window: bucket-accumulate by digit and reduce to
    sum_b b * bucket_b (a single projective point).

    Structured so the traced graph holds only O(1) instantiations of the
    point formulas per recursion level (a log-depth associative scan would
    inline point_add once per level — minutes of XLA compile for G2), and so
    the sequential critical path is ~_FOLD_T * log_T(n) steps of full-width
    vector adds:

      1. pad to a power of two, sort by digit
      2. recursive lane-fold (see _lane_fold_level); each level shrinks the
         stream by _FOLD_T and scatters its closed segments into buckets
      3. sum the per-level bucket arrays (batched adds)
      4. weighted reduction  sum_b b*bucket_b  via the factorization
         b = q*L + l:  L*sum_q q*R_q + sum_l l*Col_l, with row/column sums
         and the two triangular sums each a single-instantiation scan.

    Digit-0 entries need no masking anywhere: they land in bucket 0, whose
    weight in the reduction is zero.
    """
    n = keys.shape[0]
    npad = 1 << max(0, (n - 1).bit_length())
    if npad > n:
        keys = jnp.concatenate([keys, jnp.zeros((npad - n,), keys.dtype)])
        infs = C.inf_like(cv, (npad - n,))
        P = tuple(jnp.concatenate([p, i], 0) for p, i in zip(P, infs))

    order = jnp.argsort(keys)
    cur_k, cur_P = keys, P

    bucket_tot = None
    first = True
    while True:
        buckets, cur_k, cur_P = _lane_fold_level(
            cv, cur_k, cur_P, n_buckets, order=order if first else None)
        first = False
        bucket_tot = buckets if bucket_tot is None else C.point_add(cv, bucket_tot, buckets)
        if cur_k.shape[0] == 1:
            break
    # the last single trailing element is one final bucket contribution
    last = _scatter_points(cv, n_buckets, cur_k, tuple(p for p in cur_P))
    bucket_tot = C.point_add(cv, bucket_tot, last)
    buckets = tuple(b[:n_buckets] for b in bucket_tot)

    # weighted reduction: b = q*L + l over the [Q, L] bucket grid
    lq = max(1, (n_buckets.bit_length() - 1) // 2)
    Q = 1 << lq
    L = n_buckets // Q
    G = tuple(b.reshape((Q, L) + b.shape[1:]) for b in buckets)

    from . import kernels
    tree = kernels.use_tree_reductions()

    R = axis0_sum(cv, tuple(g.swapaxes(0, 1) for g in G))  # [Q] row sums
    Col = axis0_sum(cv, G)                                 # [L] column sums

    def tri_sum(pts_seq, m):
        """sum_{i>=1} i * pts[i] for a [m] point sequence, via suffix sums."""
        if tree:
            # suffix[j] = sum_{k>=j} pts[k] via log-depth associative scan,
            # then one tree reduction: sum_j suffix[j] = sum_i i*pts[i] + S0;
            # drop index 0 by starting the suffix at 1
            seq = tuple(p[1:] for p in pts_seq)
            suffix = jax.lax.associative_scan(
                lambda a, b: C.point_add(cv, a, b), seq, reverse=True)
            return C.tree_sum(cv, suffix)

        def body(state, x):
            suffix, total = state
            suffix = C.point_add(cv, suffix, x)
            total = C.point_add(cv, total, suffix)
            return (suffix, total), None
        zero = C.inf_like(cv)
        rev = tuple(p[1:][::-1] for p in pts_seq)  # indices m-1 .. 1
        (_, total), _ = jax.lax.scan(body, (zero, zero), rev)
        return total

    Sq = tri_sum(R, Q)
    Sl = tri_sum(Col, L)
    for _ in range(L.bit_length() - 1):                   # L * Sq
        Sq = C.point_double(cv, Sq)
    return C.point_add(cv, Sq, Sl)


def axis0_sum(cv: CurveSpec, xs):
    """EC sum over the leading axis of an [m, ...] point stack.

    Tree reduction (log2 m rounds, full vector width) when point ops are
    Pallas-backed; otherwise ONE lax.scan — a single point_add instantiation,
    which is what keeps XLA:CPU compile times of naive-MSM graphs sane
    (each point-formula instantiation costs ~10 s (G1) / ~40 s (G2) of
    XLA:CPU compile, superlinear in module size)."""
    from . import kernels
    if kernels.use_tree_reductions():
        return C.tree_sum(cv, xs)

    def body(acc, x):
        return C.point_add(cv, acc, x), None

    first = tuple(x[0] for x in xs)
    acc, _ = jax.lax.scan(body, first, tuple(x[1:] for x in xs))
    return acc


WINDOW_GROUP = 8  # windows processed concurrently (vector width x, memory x; bounded by HBM)


def window_sums(cv: CurveSpec, scalars_std: jnp.ndarray, P, window_bits: int):
    """Stacked per-window Pippenger sums [W, ...] (before the Horner
    combine).  Windows are vmapped in groups of WINDOW_GROUP so the
    bucket-phase scans run at (group x lanes) vector width; lax.map chunks
    the groups sequentially to bound the sorted-copy memory."""
    c = window_bits
    n_buckets = 1 << c
    digits = all_window_digits(scalars_std, c)  # [W, N]

    def one_window(keys):
        return _window_sum(cv, keys, P, n_buckets)

    # adapt the group to the HBM footprint: the fold's [T, lanes] gathered
    # streams cost ~group * n * 8x-padded point bytes
    n = scalars_std.shape[0]
    group = max(1, min(WINDOW_GROUP, (1 << 21) // max(1, n)))
    return jax.lax.map(one_window, digits, batch_size=min(group, digits.shape[0]))


def horner_combine(cv: CurveSpec, sums, window_bits: int):
    """acc = sum_w 2^(c*w) * S_w, windows processed high -> low."""
    def horner_body(acc, S_w):
        for _ in range(window_bits):
            acc = C.point_double(cv, acc)
        return C.point_add(cv, acc, S_w), None

    acc, _ = jax.lax.scan(horner_body, C.inf_like(cv), sums, reverse=True)
    return acc


@functools.partial(jax.jit, static_argnums=(0, 3))
def msm(cv: CurveSpec, scalars_std: jnp.ndarray, P, window_bits: int = 0):
    """Pippenger MSM:  sum_i  scalar_i * P_i  ->  one projective point.

    `scalars_std`: uint32[N, 16] in STANDARD (non-Montgomery) form —
    the same pre-conversion the reference performs at `bn128/msm.nim:42-44`.
    `P`: projective point batch (X, Y, Z).
    """
    n = scalars_std.shape[0]
    if n < 128 and not window_bits:
        # Pippenger's bucket machinery only pays off past ~2^7 points (the
        # reference's thread heuristic draws the same line at N/128,
        # msm.nim:99); below it the batched ladder is faster AND far
        # cheaper to compile.
        return msm_naive(cv, scalars_std, P)
    c = window_bits or pick_window_bits(n)
    sums = window_sums(cv, scalars_std, P, c)
    return horner_combine(cv, sums, c)


@functools.partial(jax.jit, static_argnums=0)
def msm_naive(cv: CurveSpec, scalars_std: jnp.ndarray, P):
    """Oracle MSM: batched double-and-add then a reduction (the role of
    the reference's `msmNaiveG1/G2`, bn128/msm.nim:162-198)."""
    return axis0_sum(cv, C.scalar_mul(cv, scalars_std, P))

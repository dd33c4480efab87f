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


def pick_window_bits_tree(n: int) -> int:
    """Window heuristic for the merge-tree path: one bit narrower than the
    fold's — the tree's weighted bucket reduce doubles per extra bit while
    its per-window bucket phase shrinks only ~6%.  Measured at G1 2^20:
    c=16 364.9k, c=17 332.9k, c=15 351.6k points/s (BASELINE.md round 4)."""
    return max(4, min(16, max(1, n).bit_length() - 4))


def _window_digits(scalars_std: jnp.ndarray, w: int, c: int) -> jnp.ndarray:
    """Extract digit w (bits [w*c, (w+1)*c)) from uint32[N, 16] limbs -> int32[N].

    c <= 30 (digit must fit an int32 with sign headroom); a digit straddles
    up to ceil(c/16)+1 16-bit limbs.
    """
    assert c <= 30
    pos = w * c
    limb, off = divmod(pos, LIMB_BITS)
    lo = scalars_std[..., limb] >> off
    got = LIMB_BITS - off
    while got < c and limb + 1 < N_LIMBS:
        limb += 1
        lo = lo | (scalars_std[..., limb] << got)
        got += LIMB_BITS
    return (lo & ((1 << c) - 1)).astype(jnp.int32)


def all_window_digits(scalars_std: jnp.ndarray, c: int) -> jnp.ndarray:
    """int32[n_windows, N] digit planes for all windows."""
    n_windows = -(-NBITS // c)
    return jnp.stack([_window_digits(scalars_std, w, c) for w in range(n_windows)])


def signed_window_digits(scalars_std: jnp.ndarray, c: int) -> jnp.ndarray:
    """Signed (wNAF-style) windowed digits: int32[W, N] with values in
    [-(2^(c-1))+1, 2^(c-1)] and sum_w d_w 2^(cw) == scalar.

    Digits > 2^(c-1) borrow from the next window (d -= 2^c, carry 1), so
    |d| <= 2^(c-1): bucket count per window halves vs unsigned digits
    (BASELINE.md bottleneck #4) at the cost of negating the sign<0 points —
    a single conditional Fp negation on gather.  W = ceil(255/c) absorbs
    the final carry (scalars < r < 2^254, so the top digit never carries).
    """
    W = -(-(NBITS + 1) // c)
    half = 1 << (c - 1)
    digits = []
    carry = jnp.zeros(scalars_std.shape[:-1], jnp.int32)
    for w in range(W):
        d = _window_digits(scalars_std, w, c) + carry
        carry = (d > half).astype(jnp.int32)
        d = d - (carry << c)
        digits.append(d)
    return jnp.stack(digits)


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


def _fuse_points(cv: CurveSpec, P):
    """(X, Y, Z) tuple of [n, ...comp] -> fused rows uint32[n, R]
    (R = 48 G1 / 96 G2): one gatherable row per point."""
    n = P[0].shape[0]
    return jnp.concatenate([p.reshape(n, -1) for p in P], axis=-1)


def _split_rows(cv: CurveSpec, rows: jnp.ndarray):
    """Fused rows [n, R] -> (X, Y, Z) tuple of [n, ...comp]."""
    comp = cv.fops.comp_shape
    ncomp = int(np.prod(comp))
    n = rows.shape[0]
    return tuple(rows[:, j * ncomp:(j + 1) * ncomp].reshape((n,) + comp)
                 for j in range(3))


def _weighted_bucket_reduce(cv: CurveSpec, buckets, n_buckets: int):
    """sum_b b * bucket_b via the factorization b = q*L + l over the [Q, L]
    bucket grid: L*sum_q q*R_q + sum_l l*Col_l, with row/column sums and the
    two triangular sums each a single-instantiation scan (or log-depth
    associative structures when point ops are Pallas-backed).

    n_buckets is a power of two, or 2^k + 1 for the signed-digit window
    (|d| <= 2^k): the lone top bucket's weight is 2^k = k doublings."""
    if n_buckets & (n_buckets - 1):
        k = (n_buckets - 1).bit_length() - 1
        assert n_buckets == (1 << k) + 1, n_buckets
        top = tuple(b[n_buckets - 1] for b in buckets)
        for _ in range(k):
            top = C.point_double(cv, top)
        base = _weighted_bucket_reduce(
            cv, tuple(b[: n_buckets - 1] for b in buckets), 1 << k)
        return C.point_add(cv, base, top)
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
        nc = len(cv.fops.comp_shape)
        batch = pts_seq[0].shape[1:pts_seq[0].ndim - nc]  # e.g. window axis
        zero = C.inf_like(cv, batch)
        rev = tuple(p[1:][::-1] for p in pts_seq)  # indices m-1 .. 1
        (_, total), _ = jax.lax.scan(body, (zero, zero), rev)
        return total

    Sq = tri_sum(R, Q)
    Sl = tri_sum(Col, L)
    for _ in range(L.bit_length() - 1):                   # L * Sq
        Sq = C.point_double(cv, Sq)
    return C.point_add(cv, Sq, Sl)


def _window_buckets_fused(cv: CurveSpec, keys_signed: jnp.ndarray,
                          P_fused: jnp.ndarray, n_buckets: int,
                          affine: bool = False):
    """One Pippenger window's bucket accumulation on the fused-fold TPU path
    (everything up to, but not including, the weighted bucket reduction —
    window_sums batches THAT across all windows at once).

    `keys_signed` int32[m]: wNAF digits (signed!); bucket identity is |d|,
    the sign rides into the level-0 kernel which negates y in-VMEM.
    `P_fused` uint32[m, 128]: fused point rows, tile-padded to 128 columns —
    affine x|y rows with (0,0) = infinity when `affine` (the zkey /
    wire-format case: level 0 then runs RCB15 mixed addition, 13 Fp muls
    vs 15), else projective x|y|z rows; m is already padded to a power
    of two that is a multiple of one fold tile.

    Every level runs the fused Pallas fold (kernels.fold_level): the first
    at [FOLD_T, LB] tiles in the mixed-addition affine variant, the
    sub-tile tail reshaped to [m/128, 128] stripes, and the final <=128
    stream as one lane-padded [m, 128] call — no lax.scan anywhere (the
    per-while-iteration overhead on this platform is ~1 ms).  Emission
    routing (which slots are real closed segments) is computed here from
    the keys alone — the kernel only produces points.
    """
    from . import kernels
    m = keys_signed.shape[0]
    ncomp = 16 if cv.name == "G1" else 32
    R = kernels.fold_rows(cv)
    T = kernels.FOLD_T
    LB = kernels.fold_lb(cv)

    order = jnp.argsort(jnp.abs(keys_signed))
    cur_k = keys_signed[order]          # signed, sorted by |d|
    bucket_tot = None
    trail_lm = None
    first = True
    inf_row = _fuse_points(cv, C.inf_like(cv, (1,)))

    while True:
        if first or (m % (T * LB) == 0 and m >= T * LB):
            Tl, lanes = T, m // T
        elif m > 128:
            Tl, lanes = m // 128, 128
        else:
            Tl, lanes = m, 1            # final stream: one lane, padded below
        last_level = lanes == 1

        kT = cur_k.reshape(lanes, Tl).T                      # [Tl, lanes]
        if first:
            # fold the stripe transpose into the sort gather; gather at the
            # tile-aligned padded width, slice to the real rows in the
            # fused transpose
            Rin = 2 * ncomp if affine else R
            rows = P_fused[order][:, :Rin]
            pT = rows.reshape(lanes, Tl, Rin).transpose(1, 2, 0)
        else:
            pT = trail_lm.reshape(R, lanes, Tl).transpose(2, 0, 1)
        if last_level:                   # pad the lane axis to one block
            lanes_pad = kernels.fold_final_lanes(cv)
            pad = lanes_pad - lanes
            kT = jnp.pad(kT, ((0, 0), (0, pad)), constant_values=n_buckets)
            pT = jnp.concatenate(
                [pT, jnp.broadcast_to(inf_row.T[None, :, :],
                                      (Tl, R, pad))], axis=2)
            lanes = lanes_pad
        emit, trail_lm = kernels.fold_level(cv, kT, pT, affine=affine and first)
        kT = jnp.abs(kT)                 # bucket identity from here on

        # route closed segments into buckets: dst[t, s] = key closed at
        # step t of lane s (sentinel n_buckets otherwise; slot t=0 never
        # holds an emission — the kernel leaves it unwritten)
        m_lvl = Tl * lanes
        dst = jnp.concatenate([
            jnp.full((1, lanes), n_buckets, jnp.int32),
            jnp.where(kT[1:] != kT[:-1], kT[:-1], n_buckets),
        ], axis=0)
        pos = jnp.arange(m_lvl, dtype=jnp.int32)
        slot = jnp.full((n_buckets + 1,), m_lvl, jnp.int32).at[dst.reshape(-1)].set(pos)
        emit_rows = emit.transpose(0, 2, 1).reshape(m_lvl, R)
        emit_rows = jnp.concatenate([emit_rows, inf_row], 0)
        buckets = _split_rows(cv, emit_rows[slot])
        bucket_tot = buckets if bucket_tot is None else C.point_add(cv, bucket_tot, buckets)

        if last_level:
            # all trailing lanes (1 real + sentinel pads) scatter directly
            last = _scatter_points(cv, n_buckets, kT[-1],
                                   _split_rows(cv, trail_lm.T))
            bucket_tot = C.point_add(cv, bucket_tot, last)
            break
        cur_k = kT[-1]                   # sorted trailing keys
        m = lanes
        first = False

    return tuple(b[:n_buckets] for b in bucket_tot)


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
    return _weighted_bucket_reduce(cv, buckets, n_buckets)


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

# Static tree/fold crossover (points): the merge tree's one-off sort +
# bit-reversal permute costs amortize over n; measured faster than the fold
# from ~2^16 up on the attached chip (see BASELINE.md).
TREE_MIN_N = 1 << 16


def tree_path(cv: CurveSpec, n: int, affine: bool, path: str = "auto") -> bool:
    """Path selection: measured, not env-shaped.  The batched-affine merge
    tree (~7 Fp muls/add vs the fold's ~13) wins at large n where its
    sort/permute overhead amortizes — measured on-chip: tree 1.60x the fold
    at G1 2^20 same-day (BASELINE.md round 4).  Below TREE_MIN_N the fused
    fold stays the default.  `path` ∈ {auto, tree, fold} is the caller
    override (e.g. the prover's compile-failure fallback); when "auto", the
    GROTH16_TPU_MSM env var is consulted the same way."""
    import os
    from . import kernels
    npad = 1 << max(0, (n - 1).bit_length())
    tile = kernels.FOLD_T * kernels.fold_lb(cv)
    mode = path if path != "auto" else os.environ.get("GROTH16_TPU_MSM", "auto")
    ok = affine and kernels.fold_available(cv, max(npad, tile))
    return ok and (mode == "tree" or (mode == "auto" and n >= TREE_MIN_N))


def window_sums(cv: CurveSpec, scalars_std: jnp.ndarray, P, window_bits: int,
                affine: bool = False, path: str = "auto"):
    """Stacked per-window Pippenger sums [W, ...] (before the Horner
    combine).

    On TPU with tile-filling sizes the fused fold path runs: signed (wNAF)
    digits, points packed once into fused limb rows, every window through
    the Pallas segmented-fold kernel sequentially (each window already
    saturates the vector lanes).  Otherwise windows are vmapped in groups
    so the jnp bucket-phase scans run at (group x lanes) vector width."""
    import os
    from . import kernels
    c = window_bits
    n_buckets = 1 << c
    n = scalars_std.shape[0]

    npad = 1 << max(0, (n - 1).bit_length())
    tile = kernels.FOLD_T * kernels.fold_lb(cv)
    if tree_path(cv, n, affine, path):
        from . import kernels_tree, msm_tree
        # 4 windows/group measured best at 2^20 (8 doubles the gathered-
        # stream HBM footprint and thrashes: 213k vs 433k, docs/PERF.md);
        # window_sums_tree rounds the knob down to a power of two
        group = int(os.environ.get("GROTH16_TPU_MSM_GROUP", "4"))
        return msm_tree.window_sums_tree(
            cv, scalars_std, P, c, group=group,
            level_fn=kernels_tree.level_pallas)
    if kernels.fold_available(cv, max(npad, tile)):
        # signed digits: half the buckets per window (wNAF), one extra window
        keys = signed_window_digits(scalars_std, c)
        npad = max(npad, tile)
        if affine:
            # affine x|y rows, (0, 0) = infinity (from_affine encodes
            # infinity as (0:1:0) — zero the y plane where z == 0)
            K = cv.fops
            y = K.select(K.is_zero(P[2]), jnp.zeros_like(P[1]), P[1])
            P_fused = jnp.concatenate(
                [P[0].reshape(n, -1), y.reshape(n, -1)], axis=-1)
        else:
            P_fused = _fuse_points(cv, P)
        if npad > n:
            keys = jnp.pad(keys, ((0, 0), (0, npad - n)))
            pad_rows = (jnp.zeros((npad - n, P_fused.shape[1]), jnp.uint32)
                        if affine else
                        jnp.broadcast_to(_fuse_points(cv, C.inf_like(cv, (1,))),
                                         (npad - n, P_fused.shape[1])))
            P_fused = jnp.concatenate([P_fused, pad_rows], 0)
        if P_fused.shape[1] < 128:
            # pad rows to one full (8, 128) lane tile: XLA's TPU row gather
            # is ~4x faster on tile-aligned rows, and [N, 48] occupies the
            # same padded HBM as [N, 128] anyway
            P_fused = jnp.pad(P_fused, ((0, 0), (0, 128 - P_fused.shape[1])))
        half = 1 << (c - 1)

        def one_window_buckets(k):
            return _window_buckets_fused(cv, k, P_fused, half + 1, affine)

        # bucket-accumulate each window sequentially (each already saturates
        # the vector lanes), then run ONE weighted reduction with the window
        # axis as a trailing point batch dim: every reduce-phase point op
        # (row/col tree sums, the two triangular suffix scans, doublings)
        # runs W-fold wider instead of W separate narrow dispatch chains —
        # the reduce was ~24% of MSM wall time as 15 sequential copies
        # (docs/PERF.md).  [W, B, comp] -> [B, W, comp]: bucket axis leads
        # (the reduction axis), W rides as a batch dim.
        buckets = jax.lax.map(one_window_buckets, keys)
        buckets = tuple(jnp.moveaxis(b, 0, 1) for b in buckets)
        return _weighted_bucket_reduce(cv, buckets, half + 1)

    digits = all_window_digits(scalars_std, c)  # [W, N]

    def one_window(keys):
        return _window_sum(cv, keys, P, n_buckets)

    # adapt the group to the HBM footprint: the fold's [T, lanes] gathered
    # streams cost ~group * n * 8x-padded point bytes
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


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def msm(cv: CurveSpec, scalars_std: jnp.ndarray, P, window_bits: int = 0,
        affine: bool = False, path: str = "auto"):
    """Pippenger MSM:  sum_i  scalar_i * P_i  ->  one projective point.

    `scalars_std`: uint32[N, 16] in STANDARD (non-Montgomery) form —
    the same pre-conversion the reference performs at `bn128/msm.nim:42-44`.
    `P`: projective point batch (X, Y, Z).  Pass `affine=True` when every
    Z is 0 or Montgomery-1 (wire-format / zkey point arrays): the TPU fold
    then runs mixed addition on x|y rows — the production prover case.
    `path` forces the bucket-phase algorithm (see `tree_path`).
    """
    n = scalars_std.shape[0]
    if n < 128 and not window_bits:
        # Pippenger's bucket machinery only pays off past ~2^7 points (the
        # reference's thread heuristic draws the same line at N/128,
        # msm.nim:99); below it the batched ladder is faster AND far
        # cheaper to compile.
        return msm_naive(cv, scalars_std, P)
    c = window_bits or (pick_window_bits_tree(n)
                        if tree_path(cv, n, affine, path)
                        else pick_window_bits(n))
    sums = window_sums(cv, scalars_std, P, c, affine, path)
    return horner_combine(cv, sums, c)


def msm_chunked(cv: CurveSpec, scalars_std, P, chunk_log2: int = 20,
                window_bits: int = 0, affine: bool = True, path: str = "auto"):
    """HBM-streaming MSM for point sets too large to hold on-device at once
    (the +-y gather table alone is 2^(log2n+1) * 512 B): segments of
    2^chunk_log2 points each run the full bucket phase through ONE compiled
    executable (same shapes -> one compile), per-window sums add across
    segments, one Horner finishes.  The reference's chunked map-reduce
    (`groth16/bn128/msm.nim:89-158`) on a single chip, segment-serial.

    `scalars_std` / `P` may be host numpy (transferred per segment).
    """
    n = scalars_std.shape[0]
    chunk = 1 << chunk_log2
    if n <= chunk:
        return msm(cv, jnp.asarray(scalars_std),
                   tuple(jnp.asarray(t) for t in P), window_bits, affine, path)
    assert n % chunk == 0, "pad the MSM to a multiple of the chunk size"
    c = window_bits or (pick_window_bits_tree(chunk)
                        if tree_path(cv, chunk, affine, path)
                        else pick_window_bits(chunk))
    total = None
    for s in range(0, n, chunk):
        sc = jnp.asarray(np.asarray(scalars_std[s:s + chunk]))
        pts = tuple(jnp.asarray(np.asarray(t[s:s + chunk])) for t in P)
        sums = _seg_window_sums(cv, sc, pts, c, affine, path)
        total = sums if total is None else _seg_combine(cv, total, sums)
    return horner_combine(cv, total, c)


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _seg_window_sums(cv: CurveSpec, sc, pts, c: int, affine: bool, path: str):
    return window_sums(cv, sc, pts, c, affine, path)


@functools.partial(jax.jit, static_argnums=0)
def _seg_combine(cv: CurveSpec, a, b):
    return C.point_add(cv, a, b)   # batched over the window axis


@functools.partial(jax.jit, static_argnums=0)
def msm_naive(cv: CurveSpec, scalars_std: jnp.ndarray, P):
    """Oracle MSM: batched double-and-add then a reduction (the role of
    the reference's `msmNaiveG1/G2`, bn128/msm.nim:162-198)."""
    return axis0_sum(cv, C.scalar_mul(cv, scalars_std, P))

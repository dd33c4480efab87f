"""Multi-scalar multiplication (Pippenger) for TPU.

TPU-native design: the reference splits the input into contiguous chunks and
runs constantine's serial Pippenger per chunk on a taskpool
(`groth16/bn128/msm.nim:89-158`).  A TPU has no fast scatter-accumulate, so
the bucket phase is re-designed around sort + segmented scan, which XLA maps
onto wide vector ops.  The whole transform is three nested `lax.scan`s so the
traced graph stays small no matter how many windows/bits:

  scan over windows (body traced once):
    1. argsort points by this window's digit        (XLA sort)
    2. segmented inclusive scan of EC point adds    (lax.associative_scan,
       ~2N complete adds at full vector width)
    3. scatter the per-segment totals into buckets  (one [B]-sized scatter)
    4. bucket reduction sum_b b*bucket_b via a reverse associative scan
       (suffix sums) + tree reduction
  scan over window sums (Horner): c doublings (fori_loop) + 1 add per window.

All point arithmetic uses the complete projective formulas from `curve.py`,
so mixed infinity/duplicate cases need no branches.  Behavior parity: result
equals the reference's `msmG1/msmG2/msmMultiThreaded*` (`bn128/msm.nim:35-158`)
and the naive oracle (`msm.nim:162-198`).
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


def _segmented_scan_add(cv: CurveSpec, flags: jnp.ndarray, P):
    """Segmented inclusive scan of EC adds over the leading axis.

    `flags[i]` is True where a new segment starts.  Returns the running
    within-segment sums (the classic segmented-scan combine, which stays
    associative, so lax.associative_scan applies)."""
    def combine(a, b):
        fa, pa = a
        fb, pb = b
        added = C.point_add(cv, pa, pb)
        out = C.point_select(cv, fb, pb, added)
        return (jnp.logical_or(fa, fb), out)

    _, scanned = jax.lax.associative_scan(combine, (flags, P))
    return scanned


def _window_sum(cv: CurveSpec, keys: jnp.ndarray, P, n_buckets: int):
    """One Pippenger window: bucket-accumulate by digit and reduce to
    sum_b b * bucket_b (a single projective point)."""
    n = keys.shape[0]
    order = jnp.argsort(keys)
    keys_s = keys[order]
    Ps = tuple(coord[order] for coord in P)

    # zero-digit points contribute nothing: neutralize to infinity so the
    # digit-0 segment sums to the identity
    infs = C.inf_like(cv, (n,))
    Ps = C.point_select(cv, keys_s == 0, infs, Ps)

    starts = jnp.concatenate([jnp.ones((1,), bool), keys_s[1:] != keys_s[:-1]])
    scanned = _segmented_scan_add(cv, starts, Ps)

    # segment ends hold the full per-bucket sums
    is_end = jnp.concatenate([keys_s[1:] != keys_s[:-1], jnp.ones((1,), bool)])
    dst = jnp.where(is_end, keys_s, n_buckets)  # dummy slot for non-ends
    buckets = C.inf_like(cv, (n_buckets + 1,))
    buckets = tuple(b.at[dst].set(s) for b, s in zip(buckets, scanned))
    # drop the dummy slot and bucket 0 (digit 0 multiplies by zero)
    buckets = tuple(b[1:n_buckets] for b in buckets)

    # sum_b (b+1) * buckets[b]  via suffix sums:
    # suffix[j] = sum_{k>=j} buckets[k];  total = sum_j suffix[j]
    suffix = jax.lax.associative_scan(
        lambda a, b: C.point_add(cv, a, b), buckets, reverse=True)
    return C.tree_sum(cv, suffix)


def window_sums(cv: CurveSpec, scalars_std: jnp.ndarray, P, window_bits: int):
    """Stacked per-window Pippenger sums [W, ...] (before the Horner
    combine).  Exposed separately so the mesh-sharded MSM can all-gather and
    reduce window partials across devices before one final Horner
    (`groth16_tpu.parallel.msm_shard`)."""
    c = window_bits
    n_buckets = 1 << c
    digits = all_window_digits(scalars_std, c)  # [W, N]

    def window_body(_, keys):
        return None, _window_sum(cv, keys, P, n_buckets)

    _, sums = jax.lax.scan(window_body, None, digits)
    return sums


def horner_combine(cv: CurveSpec, sums, window_bits: int):
    """acc = sum_w 2^(c*w) * S_w, windows processed high -> low."""
    def horner_body(acc, S_w):
        acc = jax.lax.fori_loop(0, window_bits, lambda _, a: C.point_double(cv, a), acc)
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
    """Oracle MSM: batched double-and-add then tree reduction (the role of
    the reference's `msmNaiveG1/G2`, bn128/msm.nim:162-198)."""
    return C.tree_sum(cv, C.scalar_mul(cv, scalars_std, P))

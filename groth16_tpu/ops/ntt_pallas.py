"""Pallas TPU kernels for the radix-2 NTT (VMEM-resident butterfly stages).

The jnp NTT (`ops/ntt.py:_dif_stages`) runs log2(N) XLA passes over
[N, 16] row-major arrays: every stage round-trips the whole array through
HBM with the 8x sub-tile row-padding tax, measuring permute-bound at
~210k elem/s for the 2^20 coset pipeline (docs/PERF.md round-4).  This
module replaces it with a four-step NTT whose inner transforms run as
single Pallas kernels over LIMB-MAJOR uint32[16, N] data:

  * N = N1 * N2; transforms of length T ride the minor (lane) axis,
    lb transforms per grid block, the whole [16, lb, T] tile VMEM-resident
    for all log2(T) butterfly stages;
  * stages with butterfly span h >= 128 slice the lane axis directly;
    the remaining span-<128 stages run after ONE in-VMEM lane<->sublane
    transpose, as full-width sublane rolls — no sub-tile vector ops;
  * the four-step outer twiddle W_N^(n2*k1) is fused into the inner
    kernel as a post- (DIF) or pre- (DIT) multiply, with the 1/N of the
    inverse folded in;
  * DIF (natural -> bit-reversed) for the forward direction, DIT
    (bit-reversed -> natural) for the inverse, so the only index
    permutation is one full bit-reversal expressed as a (2,)*t axis
    transpose — never a gather.

Semantics are bit-identical to `ops/ntt.py` (tests pin both directions
on-chip), which itself pins the reference recursion
(`groth16/math/ntt.nim:17-50`, domain derivation `domain.nim:26-46`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import field as F
from .field import FR
from .limbs import LIMB_BITS, LIMB_MASK, N_LIMBS, int_to_limbs
from .kernels import _on_tpu, _DISABLE

# ---------------------------------------------------------------------------
# rank-agnostic limb math (limb axis FIRST, arbitrary trailing dims) — the
# kernel arrays are [16, lb, T] / [16, C, L] slabs
# ---------------------------------------------------------------------------


def _shift_down(x, d):
    pads = [(d, 0)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pads)[: x.shape[0]]


def _ks_norm(z, out_limbs):
    L = out_limbs
    C = z.shape[0]
    if C < L:
        z = jnp.pad(z, [(0, L - C)] + [(0, 0)] * (z.ndim - 1))
    elif C > L:
        z = z[:L]
    s = z & LIMB_MASK
    c = z >> LIMB_BITS
    t = s + _shift_down(c, 1)
    G = t >> LIMB_BITS
    P = ((t & LIMB_MASK) == LIMB_MASK).astype(jnp.uint32)
    d = 1
    while d < L:
        G = G | (P & _shift_down(G, d))
        P = P & _shift_down(P, d)
        d *= 2
    out = (t + _shift_down(G, 1)) & LIMB_MASK
    return out, c[L - 1] + G[L - 1]


def _mul_cols(a, b, out_cols):
    """Schoolbook column sums, limb axis first; b may be a [16, ...1] const."""
    shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    if b.shape[1:] != shape:
        b = jnp.broadcast_to(b, (N_LIMBS,) + shape)
    if a.shape[1:] != shape:
        a = jnp.broadcast_to(a, (N_LIMBS,) + shape)
    z = jnp.zeros((out_cols,) + shape, jnp.uint32)
    zero_pads = [(0, 0)] * len(shape)

    def at_row(x, i):
        """x ([16, ...]) placed at row offset i of an out_cols-row array."""
        lo_pad = max(0, out_cols - N_LIMBS - i)
        return jnp.pad(x, [(i, lo_pad)] + zero_pads)[:out_cols]

    for i in range(N_LIMBS):
        prod = jnp.broadcast_to(a[i:i + 1], (N_LIMBS,) + shape) * b
        z = z + at_row(prod & LIMB_MASK, i)
        if i + 1 < out_cols:
            z = z + at_row(prod >> LIMB_BITS, i + 1)
    return z


def _relax2(z, out_limbs):
    """Two carry-save passes (see kernels._relax2): limbs < 2^17, value
    exact — safe when the consumer is `_mul_cols` against a canonical
    operand."""
    for _ in range(2):
        z = (z & LIMB_MASK) + _shift_down(z >> LIMB_BITS, 1)
    if z.shape[0] < out_limbs:
        z = jnp.pad(z, [(0, out_limbs - z.shape[0])] + [(0, 0)] * (z.ndim - 1))
    return z[:out_limbs]


class _NFr:
    """In-kernel Fr Montgomery ops on uint32[16, <=8, <=128] tiles.

    Callers keep operands tile-sized: the op bodies unroll into ~50 live
    temporaries on the Mosaic kernel stack, so a [16, 8, 128] tile bounds
    the peak at ~7 MB (the 16 MB scoped-vmem limit blows for slab-sized
    operands)."""

    def __init__(self, p, pprime, pc):
        self.p, self.pprime, self.pc = p, pprime, pc

    def _cond_sub(self, r):
        d, carry = _ks_norm(r + self.pc, N_LIMBS)
        return jnp.where((carry > 0)[None], d, r)

    def mul(self, a, b):
        z = _mul_cols(a, b, 33)
        zt = _relax2(z, 33)
        m = _relax2(_mul_cols(zt[:N_LIMBS], self.pprime, N_LIMBS), N_LIMBS)
        mp = _mul_cols(m, self.p, 33)
        t, _ = _ks_norm(mp + zt, 33)
        return self._cond_sub(t[N_LIMBS:2 * N_LIMBS])

    def add(self, a, b):
        s, _ = _ks_norm(a + b, N_LIMBS)
        return self._cond_sub(s)

    def sub(self, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        one = (jax.lax.broadcasted_iota(jnp.uint32, a.shape, 0) == 0
               ).astype(jnp.uint32)
        t = a + self.p + (b ^ LIMB_MASK) + one
        s, _ = _ks_norm(t, N_LIMBS)
        return self._cond_sub(s)


# ---------------------------------------------------------------------------
# host-side tables
# ---------------------------------------------------------------------------

_CHUNK = 128  # lanes per in-kernel tile; butterfly spans < _CHUNK use rolls
_LB = 8       # transforms (sublanes) per grid block


def _bitrev_indices(n: int) -> np.ndarray:
    lg = max(0, n.bit_length() - 1)
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, np.int64)
    for b in range(lg):
        rev |= ((idx >> b) & 1) << (lg - 1 - b)
    return rev


def _pow_table(g: int, exps: np.ndarray) -> np.ndarray:
    """uint32[16, len(exps)] Montgomery limb table of g**exps (host)."""
    r = FR.modulus
    out = np.zeros((N_LIMBS, len(exps)), np.uint32)
    cache = {}
    for j, e in enumerate(exps):
        e = int(e)
        v = cache.get(e)
        if v is None:
            v = cache[e] = int_to_limbs(pow(g, e, r) * F.R_MONT % r)
        out[:, j] = v
    return out


@functools.lru_cache(maxsize=None)
def _stage_tables(T: int, root: int):
    """(phase-1 packed table [16, sum_h], phase-1 (offset, h) list, phase-2
    packed per-lane table [16, n_stages2 * 128], phase-2 h list) for a
    T-point transform with the given root (root = domain gen or gen^-1).

    Phase 1 = butterfly spans h >= _CHUNK, addressed by dynamic 128-lane
    tile slices; its table holds w^(j*2^s) for j in [h], per stage.
    Phase 2 = spans h < _CHUNK, computed with in-tile lane rolls; its table
    holds one [128] per-lane twiddle vector per stage — exponent
    ((l mod 2h) - h) * T/(2h) on the upper half (the pattern tiles evenly
    across the 128 lanes for any T)."""
    t = T.bit_length() - 1
    offs, exps1 = [], []
    off = 0
    for s in range(t):
        h = T >> (s + 1)
        if h < _CHUNK:
            break
        offs.append((off, h))
        exps1.extend(j * (1 << s) for j in range(h))
        off += h
    tbl1 = (_pow_table(root, np.asarray(exps1, np.int64))
            if exps1 else np.zeros((N_LIMBS, 1), np.uint32))  # never 0-width

    stages2, hs2 = [], []
    h = min(T, _CHUNK) // 2
    while h >= 1:
        l = np.arange(_CHUNK, dtype=np.int64)
        # PAIR twiddle at every lane: (l mod h) * T/(2h).  DIF reads it on
        # the upper lanes (where l mod h == (o - h) mod ... the usual
        # (o-h)*2^s); DIT multiplies the upper element on BOTH lanes of the
        # pair, so the lower lane must carry the same pair twiddle, not a
        # dummy.
        stages2.append((l % h) * (T // (2 * h)))
        hs2.append(h)
        h //= 2
    tbl2 = (_pow_table(root, np.concatenate(stages2))
            if stages2 else np.zeros((N_LIMBS, 1), np.uint32))
    return tbl1, tuple(offs), tbl2, tuple(hs2)


@functools.lru_cache(maxsize=None)
def _consts():
    # rank-3 [16, 1, 1] so they broadcast against the kernel's [16, *, *]
    # slabs (numpy-style right-aligned broadcasting)
    return (np.asarray(FR.p_limbs, np.uint32).reshape(N_LIMBS, 1, 1),
            np.asarray(FR.pprime_limbs, np.uint32).reshape(N_LIMBS, 1, 1),
            np.asarray(FR.pc_limbs, np.uint32).reshape(N_LIMBS, 1, 1))


# ---------------------------------------------------------------------------
# the inner-transform kernel
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _ntt_call(T: int, NB: int, root_key: int, dit: bool, outer: bool):
    """pallas_call for NB batched T-point transforms ([16, NB, T] in/out),
    optionally fused with an outer twiddle multiply (post for DIF, pre for
    DIT).  `root_key` is the transform root as an int (lru key).

    The kernel works IN-PLACE on the output block through 128-lane tiles:
    phase-1 stages (span h >= 128) as `fori_loop`s over dynamic tile
    slices, phase-2 stages (h < 128) unrolled inside one tile loop with
    lane rolls — every live value is a [16, lb, 128] tile, keeping the
    Mosaic kernel stack bounded and the op count O(stages), not O(N)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lb = _LB
    while NB % lb:
        lb //= 2
    tbl1, offs, tbl2, hs2 = _stage_tables(T, root_key)
    tile = min(T, _CHUNK)

    def kernel(*refs):
        if outer:
            x_ref, tw_ref, t1_ref, t2_ref, p_ref, pp_ref, pc_ref, o_ref = refs
        else:
            x_ref, t1_ref, t2_ref, p_ref, pp_ref, pc_ref, o_ref = refs
            tw_ref = None
        K = _NFr(p_ref[:], pp_ref[:], pc_ref[:])
        o_ref[...] = x_ref[...]

        def outer_mul():
            def obody(c, _):
                sl = pl.ds(c * tile, tile)
                o_ref[:, :, sl] = K.mul(o_ref[:, :, sl], tw_ref[:, :, sl])
                return _
            jax.lax.fori_loop(0, T // tile, obody, 0)

        def phase1_stage(off_s, h):
            blocks_per_h = h // _CHUNK

            def body(i, _):
                blk = i // blocks_per_h
                off = (i % blocks_per_h) * _CHUNK
                base = blk * 2 * h + off
                asl = pl.ds(base, _CHUNK)
                bsl = pl.ds(base + h, _CHUNK)
                a = o_ref[:, :, asl]
                b = o_ref[:, :, bsl]
                w = t1_ref[:, pl.ds(off_s + off, _CHUNK)].reshape(
                    N_LIMBS, 1, _CHUNK)
                if dit:
                    wb = K.mul(w, b)
                    o_ref[:, :, asl] = K.add(a, wb)
                    o_ref[:, :, bsl] = K.sub(a, wb)
                else:
                    o_ref[:, :, asl] = K.add(a, b)
                    o_ref[:, :, bsl] = K.mul(K.sub(a, b), w)
                return _
            jax.lax.fori_loop(0, (T // 2) // _CHUNK, body, 0)

        def phase2():
            order = (list(enumerate(hs2)) if not dit
                     else list(enumerate(hs2))[::-1])

            def body(c, _):
                sl = pl.ds(c * tile, tile)
                x = o_ref[:, :, sl]
                iota = jax.lax.broadcasted_iota(jnp.uint32, x.shape, 2)
                for si, h in order:
                    w = t2_ref[:, si * _CHUNK:si * _CHUNK + tile].reshape(
                        N_LIMBS, 1, tile)
                    down = jnp.concatenate([x[:, :, h:], x[:, :, :h]], 2)
                    up = jnp.concatenate(
                        [x[:, :, tile - h:], x[:, :, :tile - h]], 2)
                    is_up = (iota & np.uint32(h)) != 0
                    partner = jnp.where(is_up, up, down)
                    if dit:
                        wb = K.mul(jnp.where(is_up, x, partner), w)
                        x = jnp.where(is_up, K.sub(partner, wb), K.add(x, wb))
                    else:
                        x = jnp.where(is_up, K.mul(K.sub(partner, x), w),
                                      K.add(x, partner))
                o_ref[:, :, sl] = x
                return _
            jax.lax.fori_loop(0, T // tile, body, 0)

        if dit:
            if outer:
                outer_mul()
            phase2()
            for off_s, h in reversed(offs):
                phase1_stage(off_s, h)
        else:
            for off_s, h in offs:
                phase1_stage(off_s, h)
            phase2()
            if outer:
                outer_mul()

    blk = pl.BlockSpec((N_LIMBS, lb, T), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_in = (2 if outer else 1)
    import os
    call = pl.pallas_call(
        kernel,
        grid=(NB // lb,),
        in_specs=[blk] * n_in + [c_spec] * 5,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((N_LIMBS, NB, T), jnp.uint32),
        # CPU-hermetic correctness mode (tests): run the kernel bodies in
        # the Pallas interpreter instead of Mosaic
        interpret=bool(os.environ.get("GROTH16_TPU_NTT_INTERPRET")),
    )
    p, pp, pc = _consts()

    def run(x, tw=None):
        args = (x,) if tw is None else (x, tw)
        return call(*args, jnp.asarray(tbl1), jnp.asarray(tbl2),
                    jnp.asarray(p), jnp.asarray(pp), jnp.asarray(pc))

    return run


# ---------------------------------------------------------------------------
# four-step orchestration (XLA level, limb-major)
# ---------------------------------------------------------------------------


def _bitrev_axes(x, t):
    """Full bit-reversal of the minor axis (size 2^t) of [16, ..., 2^t] as a
    (2,)*t axis transpose — no gather."""
    if t <= 1:
        return x
    lead = x.shape[:-1]
    nd = len(lead)
    y = x.reshape(lead + (2,) * t)
    perm = tuple(range(nd)) + tuple(range(nd + t - 1, nd - 1, -1))
    return y.transpose(perm).reshape(lead + (1 << t,))


@functools.lru_cache(maxsize=None)
def _split(t: int):
    """N = N1 * N2 with the larger factor first (minor-axis transform)."""
    t1 = (t + 1) // 2
    return 1 << t1, 1 << (t - t1)


_MAX_T = 4096  # per-factor transform cap (=> N <= 2^24 four-step)


def _outer_exps(N1: int, N2: int) -> np.ndarray:
    """int64[N2, N1] exponent matrix n2 * rev(k1) (mod N)."""
    rev = _bitrev_indices(N1)
    return (np.arange(N2, dtype=np.int64)[:, None] * rev[None, :]) % (N1 * N2)


@functools.lru_cache(maxsize=None)
def _outer_table(log2n: int, inverse: bool):
    """Device [16, N2, N1] outer twiddle table W[n2, k1br] =
    root^(n2*rev(k1br)), with 1/N folded in for the inverse.  Built as one
    lane gather from the [16, N] domain power table (gathers, unlike [.., 16]
    row-major temporaries, keep the limb-major layout tile-aligned)."""
    from . import ntt as NT

    dom = NT.Domain(log2n)
    N1, N2 = _split(log2n)
    root = dom.gen_inv if inverse else dom.gen
    r = FR.modulus
    root_m = jnp.asarray(int_to_limbs(root * F.R_MONT % r))
    pw = F.powers(FR, root_m, dom.size)              # [N, 16] Montgomery
    if inverse:
        ninv = jnp.asarray(int_to_limbs(dom.size_inv * F.R_MONT % r))
        pw = F.mont_mul(FR, pw, ninv[None, :])
    idx = jnp.asarray(_outer_exps(N1, N2).reshape(-1), jnp.int32)
    tbl = pw.T[:, idx].reshape(N_LIMBS, N2, N1)
    return jax.device_put(tbl)


def _transform(x2: jnp.ndarray, log2n: int, inverse: bool) -> jnp.ndarray:
    """Four-step NTT on limb-major [16, N]: DIF natural->natural for the
    forward direction, DIT natural->natural (with 1/N) for the inverse."""
    t = log2n
    n = 1 << t
    from . import ntt as NT
    dom = NT.Domain(t)
    g = dom.gen_inv if inverse else dom.gen
    N1, N2 = _split(t)
    t1, t2 = N1.bit_length() - 1, N2.bit_length() - 1
    g1 = pow(g, N2, FR.modulus)   # root of the N1-subgroup
    g2 = pow(g, N1, FR.modulus)
    W = _outer_table(t, inverse)
    if not inverse:
        x3 = jnp.swapaxes(x2.reshape(N_LIMBS, N1, N2), 1, 2)  # [16, N2, N1]
        y = _ntt_call(N1, N2, g1, False, True)(x3, W)         # k1 bit-rev
        y = jnp.swapaxes(y, 1, 2)                             # [16, N1br, N2]
        z = _ntt_call(N2, N1, g2, False, False)(y)            # k2 bit-rev
        return _bitrev_axes(z.reshape(N_LIMBS, n), t)
    # inverse: exact mirror of the forward graph, DIT kernels
    z = _bitrev_axes(x2, t).reshape(N_LIMBS, N1, N2)
    y = _ntt_call(N2, N1, g2, True, False)(z)
    y = jnp.swapaxes(y, 1, 2)                                 # [16, N2, N1br]
    x3 = _ntt_call(N1, N2, g1, True, True)(y, W)              # [16, N2, N1]
    return jnp.swapaxes(x3, 1, 2).reshape(N_LIMBS, n)


# ---------------------------------------------------------------------------
# public entry points (drop-in for ops/ntt.py semantics)
# ---------------------------------------------------------------------------

_MIN_LOG2 = 10  # below this the jnp stages win (and tiny sizes hit the CPU path)


# Validated on-chip 2026-08-21 (tests/test_ntt_tpu.py: bit-exact vs the
# jnp-stage oracle at 2^10/12/13/16/20, both directions + shift-eval
# roundtrip); coset shift-eval @ 2^20 measures 329.9k elem/s vs 205.4k
# same-day jnp stages (1.61x, BASELINE.md r5).  GROTH16_TPU_NTT_PALLAS=0
# opts out.
_VALIDATED = True


def available(log2n: int) -> bool:
    import os
    env = os.environ.get("GROTH16_TPU_NTT_PALLAS", "")
    if env in ("0", "false"):
        return False
    if not _VALIDATED and not env:
        return False
    return (not _DISABLE) and _on_tpu() and _MIN_LOG2 <= log2n <= 24


def forward_ntt(dom, coeffs: jnp.ndarray) -> jnp.ndarray:
    """[N, 16] Montgomery coefficients -> evaluations (natural order),
    bit-identical to ops/ntt.forward_ntt."""
    x2 = coeffs.T
    return _transform(x2, dom.log2_size, False).T


def inverse_ntt(dom, values: jnp.ndarray) -> jnp.ndarray:
    x2 = values.T
    return _transform(x2, dom.log2_size, True).T

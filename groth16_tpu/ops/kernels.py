"""Pallas TPU kernels for the hot point operations.

The jnp field path expresses the 16x16-limb schoolbook product as a dot
against a constant 0/1 convolution matrix — compact graphs, but ~20x more
arithmetic than the schoolbook (the [*,512]x[512,33] dot does 17k MACs per
element).  These kernels run the explicit schoolbook with Kogge-Stone
carries on the VPU, fused per curve operation (one HBM round-trip per
point add/double instead of one per field op).

Layout: wire/HBM layout keeps limbs minor ([N, 16]); inside the kernel each
block is transposed to limb-major [16, BLOCK] so the batch rides the 128-lane
axis and every limb op is a full-width vector op (limbs on the minor axis
would use 16 of 128 lanes).  The group law comes from the shared RCB15
formula functions in `curve.py`, instantiated with in-kernel field ops.
Field constants (p, -p^-1 mod R, 2^256-p, 3b) ride along as tiny inputs —
Pallas kernels cannot capture array constants.

Dispatch: `eligible()` gates on (a) a TPU backend, (b) [N, ...comp] batch
shapes with a BLOCK-divisible leading dim, (c) no disable flag.  Everything
else falls back to the jnp path (CPU tests keep using pure jnp).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from .field import FP
from .limbs import LIMB_BITS, LIMB_MASK, N_LIMBS

BLOCK = 512


def point_block(cv_name: str) -> int:
    """Batch block per point-kernel grid step.  G2 coordinates tile as
    [blk, 2, 16] -> (2, 128)-padded, 8x the useful bytes: at blk=512 the
    multi-buffered in+out blocks blow the 16 MB VMEM once the grid has >= 2
    steps (latent in round 1 - G2 was never kernel-run at scale)."""
    return BLOCK if cv_name == "G1" else 128

_DISABLE = os.environ.get("GROTH16_TPU_NO_PALLAS", "") not in ("", "0")


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def eligible(cv, P, Q) -> bool:
    """Kernel-eligible: TPU backend and per-element trailing shape matching
    the curve (any batch shape, including none — the wrappers flatten and
    pad to BLOCK)."""
    if _DISABLE or not _on_tpu():
        return False
    nc = len(cv.fops.comp_shape)
    for pt in (P, Q):
        for coord in pt:
            if coord.ndim < nc or coord.shape[coord.ndim - nc:] != cv.fops.comp_shape:
                return False
    return True


def use_tree_reductions(cv=None) -> bool:
    """True when point ops are pallas-backed (1-op bodies): log-depth
    associative structures compile cheaply and beat sequential scans on the
    per-iteration while-loop overhead."""
    return (not _DISABLE) and _on_tpu()


# ---------------------------------------------------------------------------
# in-kernel Montgomery field ops, limb-major layout: uint32[16, blk]
# ---------------------------------------------------------------------------

def _offset_rows(x: jnp.ndarray, offset: int, out_rows: int) -> jnp.ndarray:
    """Shift rows down by `offset` into an [out_rows, blk] frame (pad/crop).
    Uses pad+slice, NOT .at[] updates — scatter lowering captures empty
    index constants, which pallas kernels reject."""
    padded = jnp.pad(x, ((offset, max(0, out_rows - offset - x.shape[0])), (0, 0)))
    return padded[:out_rows]


def _mul_cols(a: jnp.ndarray, b: jnp.ndarray, out_cols: int) -> jnp.ndarray:
    """Schoolbook column sums, limb-major: a, b uint32[16, blk] (either may
    be [16, 1] for a constant), output uint32[out_cols, blk], cols < 2^21."""
    blk = max(a.shape[-1], b.shape[-1])
    # single-axis broadcasts only: Mosaic cannot broadcast sublanes and
    # lanes in one op
    if a.shape[-1] != blk:
        a = jnp.broadcast_to(a, (N_LIMBS, blk))
    if b.shape[-1] != blk:
        b = jnp.broadcast_to(b, (N_LIMBS, blk))
    z = jnp.zeros((out_cols, blk), jnp.uint32)
    for i in range(N_LIMBS):
        prod = jnp.broadcast_to(a[i:i + 1, :], (N_LIMBS, blk)) * b  # exact
        lo = prod & LIMB_MASK
        hi = prod >> LIMB_BITS
        z = z + _offset_rows(lo, i, out_cols)
        if i + 1 < out_cols:
            z = z + _offset_rows(hi, i + 1, out_cols)
    return z


def _shift_down(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """out[i] = x[i-d] along axis 0 (zero fill)."""
    return jnp.pad(x, ((d, 0), (0, 0)))[: x.shape[0], :]


def _ks_norm0(z: jnp.ndarray, out_limbs: int):
    """Kogge-Stone carry propagation, limb axis FIRST: z uint32[C, blk] with
    columns < 2^26 -> (uint32[out_limbs, blk] canonical, carry_out[blk])."""
    L = out_limbs
    C = z.shape[0]
    if C < L:
        z = jnp.pad(z, ((0, L - C), (0, 0)))
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


def _relax2(z: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
    """Two carry-save passes: columns < 2^26 -> limbs <= 2^16, value preserved
    mod 2^(16*out_limbs).  O(1) depth vs the full Kogge-Stone's log(L) levels
    (~40% of Montgomery-mul time was carry propagation, BASELINE.md
    bottleneck #3).  The result is REDUNDANT (a limb may be exactly 2^16):
    only safe where the consumer is `_mul_cols` against a CANONICAL (< 2^16)
    operand, so every partial product stays <= 2^16*(2^16-1) < 2^32."""
    L = out_limbs
    C = z.shape[0]
    if C < L:
        z = jnp.pad(z, ((0, L - C), (0, 0)))
    elif C > L:
        z = z[:L]  # mod 2^(16L) — callers rely on this only where m is mod R
    t = (z & LIMB_MASK) + _shift_down(z >> LIMB_BITS, 1)  # t < 2^16 + 2^10
    return (t & LIMB_MASK) + _shift_down(t >> LIMB_BITS, 1)  # <= 2^16


class _KFp:
    """In-kernel Fp ops on uint32[16, blk]; holds the [16,1] prime constants."""

    def __init__(self, p, pprime, pc):
        self.p, self.pprime, self.pc = p, pprime, pc

    def mul_cios(self, a, b):
        """Interleaved (CIOS) Montgomery product: one fused accumulate-reduce
        pass instead of three full column products + normalizations.  The
        accumulator holds 17 redundant columns; per limb i it absorbs a_i*b
        and m_i*p (m_i = -acc_0/p mod 2^16 zeroes the bottom limb), then
        shifts down one limb.  Column bound: <= 16 iterations x 4*(2^16-1)
        + carries < 2^21 — safe for u32 and for the single final Kogge-Stone.
        Requires CANONICAL (< 2^16-limb) inputs; output < 2p pre-cond_sub
        (standard CIOS bound: (ab + mp)/R < p(p/R + 1) < 1.25p for R = 4.5p).
        """
        blk = max(a.shape[-1], b.shape[-1])
        if a.shape[-1] != blk:
            a = jnp.broadcast_to(a, (N_LIMBS, blk))
        if b.shape[-1] != blk:
            b = jnp.broadcast_to(b, (N_LIMBS, blk))
        p = self.p
        if p.shape[-1] != blk:
            p = jnp.broadcast_to(p, (N_LIMBS, blk))
        pp0 = self.pprime[0:1]  # [1, blk?]: -p^-1 mod 2^16 (limb 0 suffices)
        if pp0.shape[-1] != blk:
            pp0 = jnp.broadcast_to(pp0, (1, blk))
        zrow = jnp.zeros((1, blk), jnp.uint32)
        acc = jnp.zeros((N_LIMBS + 1, blk), jnp.uint32)

        def absorb(acc, prod):
            return (acc + jnp.pad(prod & LIMB_MASK, ((0, 1), (0, 0)))
                        + jnp.pad(prod >> LIMB_BITS, ((1, 0), (0, 0))))

        for i in range(N_LIMBS):
            acc = absorb(acc, jnp.broadcast_to(a[i:i + 1], (N_LIMBS, blk)) * b)
            m_i = ((acc[0:1] & LIMB_MASK) * pp0) & LIMB_MASK
            acc = absorb(acc, jnp.broadcast_to(m_i, (N_LIMBS, blk)) * p)
            acc = jnp.concatenate(
                [acc[1:2] + (acc[0:1] >> LIMB_BITS), acc[2:], zrow], axis=0)
        t, _ = _ks_norm0(acc, N_LIMBS + 1)  # value < 1.25p -> limb 16 == 0
        return self._cond_sub(t[:N_LIMBS])

    def _cond_sub(self, r):
        d, carry = _ks_norm0(r + self.pc, N_LIMBS)
        return jnp.where((carry > 0)[None, :], d, r)

    def mul(self, a, b):
        # Montgomery REDC with lazy carries: the z and m intermediates only
        # feed _mul_cols against canonical constants (p', p), so two
        # carry-save passes replace the full Kogge-Stone there; only the
        # final t (and the conditional subtract) need exact propagation.
        # Bound check for the 16-limb crop of t: a, b < p, m < R(1+2^-16)
        # => t = (ab + m*p)/R < p^2/R + p(1+2^-16) < 1.3p < 2p.
        z = _mul_cols(a, b, 33)
        zt = _relax2(z, 33)
        m = _relax2(_mul_cols(zt[:N_LIMBS], self.pprime, N_LIMBS), N_LIMBS)
        mp = _mul_cols(m, self.p, 33)
        t, _ = _ks_norm0(mp + zt, 33)
        return self._cond_sub(t[N_LIMBS:2 * N_LIMBS])

    def sqr(self, a):
        return self.mul(a, a)

    def add(self, a, b):
        s, _ = _ks_norm0(a + b, N_LIMBS)
        return self._cond_sub(s)

    def sub(self, a, b):
        # +1 at limb 0 built from full-width iota (pallas kernels can neither
        # capture array consts nor lane-broadcast [16,1] vectors)
        blk = max(a.shape[-1], b.shape[-1])
        one = (jax.lax.broadcasted_iota(jnp.uint32, (N_LIMBS, blk), 0) == 0
               ).astype(jnp.uint32)
        t = a + self.p + (b ^ LIMB_MASK) + one
        s, _ = _ks_norm0(t, N_LIMBS)
        return self._cond_sub(s)


class _KFp2:
    """In-kernel Fp2 ops on uint32[2, 16, blk] (Karatsuba, 3 Fp muls)."""

    def __init__(self, fp: _KFp):
        self.fp = fp

    def mul(self, a, b):
        f = self.fp
        v0 = f.mul(a[0], b[0])
        v1 = f.mul(a[1], b[1])
        c0 = f.sub(v0, v1)
        t = f.mul(f.add(a[0], a[1]), f.add(b[0], b[1]))
        c1 = f.sub(f.sub(t, v0), v1)
        return jnp.stack([c0, c1], axis=0)

    def sqr(self, a):
        f = self.fp
        c0 = f.mul(f.add(a[0], a[1]), f.sub(a[0], a[1]))
        t = f.mul(a[0], a[1])
        c1 = f.add(t, t)
        return jnp.stack([c0, c1], axis=0)

    def add(self, a, b):
        return jnp.stack([self.fp.add(a[0], b[0]), self.fp.add(a[1], b[1])], 0)

    def sub(self, a, b):
        return jnp.stack([self.fp.sub(a[0], b[0]), self.fp.sub(a[1], b[1])], 0)


def _to_kernel_layout(cv_name: str, x: jnp.ndarray) -> jnp.ndarray:
    """[blk, 16] -> [16, blk]  /  [blk, 2, 16] -> [2, 16, blk]."""
    if cv_name == "G1":
        return x.T
    return jnp.transpose(x, (1, 2, 0))


def _from_kernel_layout(cv_name: str, x: jnp.ndarray) -> jnp.ndarray:
    if cv_name == "G1":
        return x.T
    return jnp.transpose(x, (2, 0, 1))


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _fp_consts_np(blk: int = BLOCK):
    """The three FP constants pre-broadcast to [16, blk] (kernel inputs;
    Mosaic cannot widen [16,1] vectors inside the kernel)."""
    def tile(x):
        return np.repeat(np.asarray(x, np.uint32)[:, None], blk, axis=1)
    return tile(FP.p_limbs), tile(FP.pprime_limbs), tile(FP.pc_limbs)


@functools.lru_cache(maxsize=None)
def _point_call(cv_name: str, op: str, n: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from . import curve as CU

    cv = CU.G1 if cv_name == "G1" else CU.G2
    blk = point_block(cv_name)
    comp_shape = cv.fops.comp_shape
    blk_shape = (blk,) + comp_shape
    nd = len(blk_shape)
    n_pts = 6 if op == "add" else 3
    # b3 constant pre-broadcast: [16,BLOCK] (G1) / [2,16,BLOCK] (G2)
    b3_np = np.repeat(np.asarray(cv.b3_limbs, np.uint32)[..., None], blk, axis=-1)

    def kernel(*refs):
        ins = refs[:n_pts]
        p_ref, pp_ref, pc_ref, b3_ref = refs[n_pts:n_pts + 4]
        outs = refs[n_pts + 4:]
        fp = _KFp(p_ref[:], pp_ref[:], pc_ref[:])
        K = fp if cv_name == "G1" else _KFp2(fp)
        pts = [tuple(_to_kernel_layout(cv_name, r[:]) for r in ins[j:j + 3])
               for j in range(0, n_pts, 3)]
        b3 = b3_ref[:]
        if op == "add":
            R = CU.rcb_add(K, pts[0], pts[1], b3)
        else:
            R = CU.rcb_double(K, pts[0], b3)
        for o, r in zip(outs, R):
            o[:] = _from_kernel_layout(cv_name, r)

    pt_spec = pl.BlockSpec(blk_shape, lambda i: (i,) + (0,) * (nd - 1),
                           memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # full tiny array
    shape = jax.ShapeDtypeStruct((n,) + comp_shape, jnp.uint32)
    call = pl.pallas_call(
        kernel,
        grid=(n // blk,),
        in_specs=[pt_spec] * n_pts + [c_spec] * 4,
        out_specs=(pt_spec, pt_spec, pt_spec),
        out_shape=(shape, shape, shape),
    )
    p_np, pp_np, pc_np = _fp_consts_np(blk)

    def run(*pts):
        return call(*pts, jnp.asarray(p_np), jnp.asarray(pp_np),
                    jnp.asarray(pc_np), jnp.asarray(b3_np))

    return run


def _flatten_pad(cv, coords):
    """[..., comp] -> ([n_pad, comp], batch_shape, n): flatten batch dims and
    zero-pad the flat dim to a point_block multiple."""
    nc = len(cv.fops.comp_shape)
    batch_shape = coords[0].shape[: coords[0].ndim - nc]
    out = []
    n = 1
    for b in batch_shape:
        n *= b
    blk = point_block(cv.name)
    npad = -(-max(n, 1) // blk) * blk
    for x in coords:
        flat = x.reshape((n,) + cv.fops.comp_shape)
        if npad > n:
            flat = jnp.pad(flat, [(0, npad - n)] + [(0, 0)] * nc)
        out.append(flat)
    return out, batch_shape, n


def _unflatten(cv, coords, batch_shape, n):
    return tuple(x[:n].reshape(batch_shape + cv.fops.comp_shape) for x in coords)


def point_add(cv, P, Q):
    (x1, y1, z1), bs, n = _flatten_pad(cv, P)
    (x2, y2, z2), _, _ = _flatten_pad(cv, Q)
    call = _point_call(cv.name, "add", x1.shape[0])
    return _unflatten(cv, call(x1, y1, z1, x2, y2, z2), bs, n)


def point_double(cv, P):
    (x1, y1, z1), bs, n = _flatten_pad(cv, P)
    call = _point_call(cv.name, "double", x1.shape[0])
    return _unflatten(cv, call(x1, y1, z1), bs, n)


# ---------------------------------------------------------------------------
# Fused segmented lane-fold: the MSM bucket-accumulation hot loop as ONE
# kernel per level (ops/msm.py runs it per Pippenger window).
#
# The pre-kernel stream layout is limb-major [T, R, lanes] (R = 48 fused
# x|y|z limb rows for G1, 96 for G2): the minor axis is the big `lanes`
# axis, so nothing pads to the (8, 128) HBM tile — this removes the 8x
# padding tax the [N, 16] row layout pays (BASELINE.md bottleneck #1) —
# and each grid step keeps its whole stripe block resident in VMEM for all
# T sequential steps, replacing T separate point_add dispatches with their
# 2x-stream HBM round-trips per step.
# ---------------------------------------------------------------------------

FOLD_T = 32  # sequential elements folded per lane and level


def fold_lb(cv) -> int:
    """Lane-block width per fold-kernel grid step (VMEM-bounded)."""
    return 512 if cv.name == "G1" else 256


def fold_rows(cv) -> int:
    """Fused limb rows per point: 3 coords x component limbs."""
    return 48 if cv.name == "G1" else 96


def fold_final_lanes(cv) -> int:
    """Lane padding of the single-stripe final fold level (T = stream
    length): sized so [T<=128, 2R, lanes] double-buffered blocks fit VMEM."""
    return 128 if cv.name == "G1" else 64


def fold_available(cv, m: int) -> bool:
    """The fused fold kernel handles streams that are a multiple of one
    full [T, LB] tile; smaller tails use the jnp scan path."""
    if _DISABLE or not _on_tpu():
        return False
    tile = FOLD_T * fold_lb(cv)
    return m >= tile and m % tile == 0


@functools.lru_cache(maxsize=None)
def _fold_call(cv_name: str, T: int, lanes: int, affine: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from . import curve as CU

    cv = CU.G1 if cv_name == "G1" else CU.G2
    ncomp = 16 if cv_name == "G1" else 32
    R = 3 * ncomp
    Rin = 2 * ncomp if affine else R  # affine streams carry x|y only
    # lane-block width bounded so the DOUBLE-BUFFERED (grid >= 2) in + emit
    # blocks fit the 16 MB VMEM: 2 * 4 * T * (Rin + R) * LB bytes.  Mosaic
    # also requires the minor block dim be a multiple of 128 or equal to
    # the full array dim — the deep final levels (large T) use lanes == LB.
    lb_max = 12_500_000 // (8 * T * (Rin + R))
    LB = 1 << max(0, lb_max.bit_length() - 1)
    LB = min(LB, fold_lb(cv), lanes)
    if LB < 128:
        LB = min(128, lanes)

    def tile_const(x):
        return np.repeat(np.asarray(x, np.uint32).reshape(-1, 1), LB, axis=1)

    p_np = tile_const(FP.p_limbs)
    pp_np = tile_const(FP.pprime_limbs)
    pc_np = tile_const(FP.pc_limbs)
    b3_np = tile_const(cv.b3_limbs)    # [ncomp, LB]
    one_np = tile_const(cv.one_limbs)  # [ncomp, LB] Montgomery 1

    def comp(c):
        return c.reshape(2, N_LIMBS, LB) if cv_name == "G2" else c

    def split(slab, n=3):
        return tuple(comp(slab[j * ncomp:(j + 1) * ncomp]) for j in range(n))

    def fuse(P):
        return jnp.concatenate([c.reshape(ncomp, LB) for c in P], axis=0)

    def kernel(kT_ref, pT_ref, p_ref, pp_ref, pc_ref, b3_ref, one_ref,
               emit_ref, trail_ref):
        fp = _KFp(p_ref[:], pp_ref[:], pc_ref[:])
        K = fp if cv_name == "G1" else _KFp2(fp)
        b3 = comp(b3_ref[:])
        one = comp(one_ref[:])
        zero = jnp.zeros_like(one_ref[:])

        def sel(cond, a, b):
            c = cond if cv_name == "G1" else cond[:, None, :]
            return jnp.where(c, a, b)

        def load_pt(t):
            """Element t: apply the wNAF sign (kt < 0 -> negate y).  Affine
            variant also detects the (0, 0) infinity encoding (mixed
            addition cannot represent an affine infinity)."""
            kt = kT_ref[pl.ds(t, 1), :]
            slab = pT_ref[pl.ds(t, 1)].reshape(Rin, LB)
            if not affine:
                x, y, z = split(slab)
                y = sel(kt < 0, K.sub(comp(zero), y), y)
                return (x, y, z), None
            x, y = split(slab, 2)
            y = sel(kt < 0, K.sub(comp(zero), y), y)
            inf = jnp.all(slab == 0, axis=0, keepdims=True)   # [1, LB]
            return (x, y), inf

        def to_proj(pt, inf):
            x, y = pt
            return (sel(inf, comp(zero), x), sel(inf, one, y),
                    sel(inf, comp(zero), one))

        pt0, inf0 = load_pt(0)
        run0 = to_proj(pt0, inf0) if affine else pt0
        prev0 = kT_ref[0:1, :]

        def body(t, carry):
            prev, run = carry
            # emission slot t holds the running segment BEFORE element t is
            # consumed; whether it is a real (closed-segment) emission is
            # decided outside the kernel from the keys alone
            emit_ref[pl.ds(t, 1)] = fuse(run)[None]
            kt = kT_ref[pl.ds(t, 1), :]                      # [1, LB]
            pt, inf = load_pt(t)
            if affine:
                added = CU.rcb_add_mixed(K, run, pt, b3)
                added = tuple(sel(inf, r, a) for r, a in zip(run, added))
                fresh = to_proj(pt, inf)
            else:
                added = CU.rcb_add(K, run, pt, b3)
                fresh = pt
            new = jnp.abs(kt) != jnp.abs(prev)   # bucket identity is |digit|
            run = tuple(sel(new, f, a) for f, a in zip(fresh, added))
            return (kt, run)

        _, run = jax.lax.fori_loop(1, T, body, (prev0, run0))
        trail_ref[:] = fuse(run)

    grid = (lanes // LB,)
    k_spec = pl.BlockSpec((T, LB), lambda i: (0, i), memory_space=pltpu.VMEM)
    pin_spec = pl.BlockSpec((T, Rin, LB), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    pout_spec = pl.BlockSpec((T, R, LB), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((R, LB), lambda i: (0, i), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[k_spec, pin_spec] + [c_spec] * 5,
        out_specs=(pout_spec, t_spec),
        out_shape=(jax.ShapeDtypeStruct((T, R, lanes), jnp.uint32),
                   jax.ShapeDtypeStruct((R, lanes), jnp.uint32)),
    )

    def run_call(kT, pT):
        return call(kT, pT, jnp.asarray(p_np), jnp.asarray(pp_np),
                    jnp.asarray(pc_np), jnp.asarray(b3_np), jnp.asarray(one_np))

    return run_call


def fold_level(cv, kT: jnp.ndarray, pT: jnp.ndarray, affine: bool = False):
    """One fused fold level over a sorted, stripe-transposed stream.

    kT: int32[T, lanes] keys; pT: uint32[T, Rin, lanes] fused limb-major
    points (Rin = 2 components for the affine level-0 variant — x|y rows
    with implied z=1, signed keys, in-kernel wNAF negation and mixed
    addition — else 3).  Returns (emit uint32[T, R, lanes],
    trail uint32[R, lanes]); emit[t] is the running (projective) segment of
    each lane just before element t.
    """
    T, lanes = kT.shape
    return _fold_call(cv.name, T, lanes, affine)(kT, pT)

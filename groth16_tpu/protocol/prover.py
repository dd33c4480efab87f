"""Groth16 prover (the analog of reference `groth16/prover.nim`).

Pipeline per proof (reference generateProofWithMask, prover.nim:215-304):

  1. build_abc  — sparse-matrix-vector products Az, Bz and Cz = Az .* Bz
     (prover.nim:56-73).  TPU shape: gather witness columns, one fused
     Montgomery multiply, then a segment-sum into rows — not a scalar loop.
  2. quotient scalars — flavour dispatch (prover.nim:249-260):
     JensGroth: coset-shift pipeline with the 2N-domain generator eta and the
     constant 1/(eta^N - 1) (prover.nim:118-148);
     Snarkjs: the same three coset shifts but NO division — the H points are
     shifted Lagrange bases so the raw coset values of A.*B - C are the
     correct MSM scalars (prover.nim:152-181, files/zkey.nim:79-86).
     The three shift_eval_domain transforms are expressed in one jitted
     program: XLA schedules them, replacing the reference's 3-task taskpool.
  3. five MSMs (prover.nim:278-302):
        pi_a = alpha1 + r*delta1 + MSM(w, A1)
        rho  = beta1  + s*delta1 + MSM(w, B1)
        pi_b = beta2  + s*delta2 + MSM(w, B2)        (G2)
        pi_c = s*pi_a + r*rho - rs*delta1 + MSM(qs, H1) + MSM(zs, C1)
     The O(1) spec-point algebra stays on host (ints); the O(n) MSMs run on
     device.
"""

from __future__ import annotations

import functools
import os
import secrets
import time
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import field as F
from ..ops import curve as C
from ..ops import msm as M
from ..ops import ntt as NT
from ..ops.field import FR, FP
from ..ops.limbs import N_LIMBS, int_to_limbs
from ..utils import hostmath as H
from .types import Flavour, PointArray, Witness, ZKey


@dataclass
class Proof:
    """Reference prover.nim:37-43."""

    public_io: list      # plain ints, [1, pubout..., pubin...]
    pi_a: tuple          # host affine G1 (None = infinity)
    pi_b: tuple          # host affine G2
    pi_c: tuple          # host affine G1
    curve: str = "bn128"


@dataclass
class Mask:
    """Zero-knowledge masking coefficients (reference prover.nim:210-213)."""

    r: int
    s: int


def random_mask() -> Mask:
    """CSPRNG masks (the reference uses non-crypto std/random, bn128/rnd.nim;
    we use the OS CSPRNG — a deliberate upgrade)."""
    return Mask(r=secrets.randbelow(FR.modulus), s=secrets.randbelow(FR.modulus))


# ---------------------------------------------------------------------------
# ABC: sparse SpMV + pointwise product
# ---------------------------------------------------------------------------

def _segment_sum_mod(vals_mont: jnp.ndarray, rows: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """Modular segment sum of Montgomery limb vectors by row index.

    Plain uint32 limb-wise segment_sum (valid while every row has < 2^16
    terms), then a Montgomery-wide reduction folds the oversized limbs back
    below p:  V -> V*R^-1 (wide reduce) -> *R^2*R^-1 = V mod p.
    """
    acc = jax.ops.segment_sum(vals_mont, rows, num_segments=n_rows)  # limbs < 2^32
    wide = jnp.concatenate(
        [acc, jnp.zeros(acc.shape[:-1] + (N_LIMBS,), jnp.uint32)], axis=-1)
    return F.mont_mul(FR, F.mont_reduce_wide(FR, wide), jnp.asarray(FR.r2_limbs))


def abc_core(n_rows: int, witness_mont, coeff_mont, rows, cols, matrix_sel):
    """The shared SpMV prologue (reference buildABC, prover.nim:56-73):
    gather witness columns, one fused Montgomery multiply, segment-sum the
    A and B matrices into domain rows, Cz = Az .* Bz pointwise.  Traced
    inside every prover variant (staged, fused, sharded)."""
    w = witness_mont[cols]
    prod = F.mont_mul(FR, coeff_mont, w)
    is_a = (matrix_sel == 0)[:, None]
    az = _segment_sum_mod(jnp.where(is_a, prod, 0), rows, n_rows)
    bz = _segment_sum_mod(jnp.where(is_a, 0, prod), rows, n_rows)
    cz = F.mont_mul(FR, az, bz)
    return az, bz, cz


@jax.jit
def _build_abc_dev(coeff_mont, rows_a_sel, cols, matrix_sel, witness_mont, n_rows_arr):
    return abc_core(n_rows_arr.shape[0], witness_mont, coeff_mont,
                    rows_a_sel, cols, matrix_sel)


def check_row_density(co) -> None:
    """Host-side guard for `_segment_sum_mod`'s precondition: every
    (matrix, row) segment must have < 2^16 terms, or the uint32 limb-wise
    segment sum overflows silently and corrupts the proof.  A circuit dense
    enough to trip this needs a chunked accumulation path, not a wrong
    answer."""
    rows = np.asarray(co.row)
    msel = np.asarray(co.matrix)
    for m in (0, 1):
        sel = rows[msel == m]
        if sel.size:
            dense = int(np.bincount(sel).max())
            if dense >= (1 << 16):
                raise ValueError(
                    f"constraint row with {dense} terms in matrix {'AB'[m]} "
                    f"exceeds the 2^16-terms-per-row segment-sum bound")


def build_abc(zkey: ZKey, witness_mont: jnp.ndarray):
    """Az, Bz, Cz on the evaluation domain (reference buildABC,
    prover.nim:56-73).  `witness_mont` is uint32[nvars,16] Montgomery."""
    co = zkey.coeffs
    check_row_density(co)
    n = zkey.header.domain_size
    return _build_abc_dev(
        jnp.asarray(co.coeff), jnp.asarray(co.row.astype(np.int32)),
        jnp.asarray(co.col.astype(np.int32)), jnp.asarray(co.matrix),
        witness_mont, jnp.zeros((n,), jnp.uint8))


# ---------------------------------------------------------------------------
# quotient scalars
# ---------------------------------------------------------------------------

def _eta_consts(log2n: int):
    dom2 = NT.Domain(log2n + 1)
    eta = dom2.gen
    return eta


@jax.jit
def _pointwise_abc(a1, b1, c1):
    return F.sub_mod(FR, F.mont_mul(FR, a1, b1), c1)


def quotient_scalars(flavour: Flavour, az, bz, cz, log2n: int) -> jnp.ndarray:
    """The H-points MSM scalars, per flavour (reference prover.nim:118-181).

    Returns uint32[N,16] Montgomery values.
    """
    dom = NT.Domain(log2n)
    eta = _eta_consts(log2n)
    eta_mont = jnp.asarray(FR.to_mont_limbs(eta))

    a1 = NT.shift_eval_domain(dom, az, eta_mont)
    b1 = NT.shift_eval_domain(dom, bz, eta_mont)
    c1 = NT.shift_eval_domain(dom, cz, eta_mont)
    ys = _pointwise_abc(a1, b1, c1)

    if flavour == Flavour.Snarkjs:
        # H points are shifted Lagrange bases: the coset values ARE the
        # scalars, no division (prover.nim:158-181)
        return ys

    # JensGroth: divide by Z on the coset — (eta w^j)^N - 1 = eta^N - 1 is
    # constant (prover.nim:125-128) — then interpolate and un-shift.
    r = FR.modulus
    inv_z1 = pow(pow(eta, dom.size, r) - 1, -1, r)
    ys = F.mont_mul(FR, ys, jnp.asarray(FR.to_mont_limbs(inv_z1))[None, :])
    q1 = NT.inverse_ntt(dom, ys)
    return NT.mul_by_powers(dom, q1, jnp.asarray(FR.to_mont_limbs(pow(eta, -1, r))))


# ---------------------------------------------------------------------------
# fully-jitted device proof core
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 1))
def prove_forward_step(flavour: Flavour, log2n: int,
                       witness_std, coeff_mont, rows, cols, matrix_sel,
                       a1_x, a1_y, a1_z):
    """The prover's scalar pipeline + one G1 MSM as a single jitted step:
    SpMV -> Az/Bz/Cz -> coset-shift quotient NTTs -> MSM(witness, A1).

    This is the compile-check "forward step": it covers the full compute
    path (field kernels, NTTs, curve adds, MSM) in one module of moderate
    size.  `prove_core_device` fuses the WHOLE proof (all five MSMs, G2
    included) — the production TPU path, but too large for a single
    XLA:CPU module."""
    n = 1 << log2n
    az, bz, cz = abc_core(n, F.to_mont(FR, witness_std),
                          coeff_mont, rows, cols, matrix_sel)
    qs_mont = quotient_scalars(flavour, az, bz, cz, log2n)
    msm_a = M.msm(C.G1, witness_std, (a1_x, a1_y, a1_z), 0, True)
    return qs_mont, msm_a

@functools.partial(jax.jit, static_argnums=(0, 1))
def prove_core_device(flavour: Flavour, log2n: int,
                      witness_std, coeff_mont, rows, cols, matrix_sel,
                      a1_pts, b1_pts, b2_pts, c1_pts, h1_pts,
                      spec_pts, mask_rs):
    """One whole proof's device work as a single jitted program: SpMV ->
    quotient NTT pipeline -> five MSMs -> spec-point algebra, no host
    round-trips.  This is the "forward step" of the framework.

    * witness_std: uint32[nvars,16] standard form
    * coeff/rows/cols/matrix_sel: sparse A/B entries (coeff in Montgomery)
    * *_pts: projective device point batches (G1 / G2)
    * spec_pts: (alpha1, delta1, beta1, beta2_g2, delta2_g2) projective
    * mask_rs: uint32[2,16] standard-form limbs of (r, s)
    Returns projective (pi_a, pi_b_g2, pi_c).
    """
    n = 1 << log2n
    az, bz, cz = abc_core(n, F.to_mont(FR, witness_std),
                          coeff_mont, rows, cols, matrix_sel)

    qs_mont = quotient_scalars(flavour, az, bz, cz, log2n)
    qs_std = F.from_mont(FR, qs_mont)

    npubs_plus1 = witness_std.shape[0] - c1_pts[0].shape[0]
    zs_std = witness_std[npubs_plus1:]

    alpha1, delta1, beta1, beta2, delta2 = spec_pts
    r_std = mask_rs[0]
    s_std = mask_rs[1]
    # rs mod r on device: montgomery product of montgomery forms of r, s
    rs_std = F.from_mont(FR, F.mont_mul(FR, F.to_mont(FR, r_std), F.to_mont(FR, s_std)))

    # The four G1 MSMs run as ONE batched naive/Pippenger call where lengths
    # allow, and all small scalar-muls are batched — every extra point-formula
    # instantiation in this (fully fused) program costs real compile time.
    nmax = max(witness_std.shape[0], qs_std.shape[0], zs_std.shape[0])

    def pad_sc(sc):
        return jnp.pad(sc, [(0, nmax - sc.shape[0]), (0, 0)])

    def pad_pts(pts):
        k = nmax - pts[0].shape[0]
        infs = C.inf_like(C.G1)
        return tuple(jnp.concatenate([p, jnp.broadcast_to(i, (k,) + i.shape)], 0)
                     for p, i in zip(pts, infs))

    g1_sc = jnp.stack([pad_sc(witness_std), pad_sc(witness_std),
                       pad_sc(qs_std), pad_sc(zs_std)])           # [4, nmax, 16]
    g1_pts = tuple(jnp.stack(ps) for ps in zip(
        pad_pts(a1_pts), pad_pts(b1_pts), pad_pts(h1_pts), pad_pts(c1_pts)))
    # lax.map, not vmap: ONE msm body instantiation, and the TPU fused-fold
    # Pallas path stays un-batched (zkey points are affine -> mixed adds)
    sums = jax.lax.map(
        lambda a: M.msm(C.G1, a[0], (a[1], a[2], a[3]), 0, True),
        (g1_sc, *g1_pts))                                         # [4, ...]
    msm_a = tuple(x[0] for x in sums)
    msm_b1 = tuple(x[1] for x in sums)
    msm_h = tuple(x[2] for x in sums)
    msm_c = tuple(x[3] for x in sums)

    # batched pre-MSM small muls: [r*delta1, s*delta1, rs*delta1]
    d3 = tuple(jnp.broadcast_to(x, (3,) + x.shape) for x in delta1)
    pre = C.scalar_mul(C.G1, jnp.stack([r_std, s_std, rs_std]), d3)
    pi_a = C.point_add(C.G1, C.point_add(C.G1, alpha1, tuple(x[0] for x in pre)), msm_a)
    rho = C.point_add(C.G1, C.point_add(C.G1, beta1, tuple(x[1] for x in pre)), msm_b1)

    msm_b2 = M.msm(C.G2, witness_std, b2_pts, 0, True)
    s1 = C.scalar_mul(C.G2, s_std[None], tuple(x[None] for x in delta2))
    pi_b = C.point_add(C.G2, C.point_add(C.G2, beta2, tuple(x[0] for x in s1)), msm_b2)

    # batched post-MSM muls: [s*pi_a, r*rho]
    post_pts = tuple(jnp.stack([a, b]) for a, b in zip(pi_a, rho))
    post = C.scalar_mul(C.G1, jnp.stack([s_std, r_std]), post_pts)
    pi_c = C.point_add(C.G1, tuple(x[0] for x in post), tuple(x[1] for x in post))
    pi_c = C.point_add(C.G1, pi_c, C.point_neg(C.G1, tuple(x[2] for x in pre)))
    pi_c = C.point_add(C.G1, pi_c, msm_h)
    pi_c = C.point_add(C.G1, pi_c, msm_c)
    return pi_a, pi_b, pi_c


@functools.partial(jax.jit, static_argnums=(0, 1))
def prove_quotient_step(flavour: Flavour, log2n: int,
                        witness_std, coeff_mont, rows, cols, matrix_sel):
    """Dispatch 1 of the few-dispatch prover: SpMV -> quotient pipeline ->
    standard-form H-MSM scalars, one device program."""
    az, bz, cz = abc_core(1 << log2n, F.to_mont(FR, witness_std),
                          coeff_mont, rows, cols, matrix_sel)
    return F.from_mont(FR, quotient_scalars(flavour, az, bz, cz, log2n))


@jax.jit
def prove_g1_msms(witness_std, qs_std, zs_std, a1_pts, b1_pts, h1_pts, c1_pts):
    """Dispatch 2: the four G1 MSMs of one proof as ONE device program —
    common-padded shapes, one `lax.map` msm body (one point-formula
    instantiation), the affine fast path on the wire-format zkey points.
    Returns stacked projective sums [4, ...] in order (A1, B1, H1, C1)."""
    nmax = max(witness_std.shape[0], qs_std.shape[0], zs_std.shape[0])

    def pad_sc(sc):
        return jnp.pad(sc, [(0, nmax - sc.shape[0]), (0, 0)])

    def pad_pts(pts):
        k = nmax - pts[0].shape[0]
        infs = C.inf_like(C.G1)
        return tuple(jnp.concatenate([p, jnp.broadcast_to(i, (k,) + i.shape)], 0)
                     for p, i in zip(pts, infs))

    g1_sc = jnp.stack([pad_sc(witness_std), pad_sc(witness_std),
                       pad_sc(qs_std), pad_sc(zs_std)])
    g1_pts = tuple(jnp.stack(ps) for ps in zip(
        pad_pts(a1_pts), pad_pts(b1_pts), pad_pts(h1_pts), pad_pts(c1_pts)))
    return jax.lax.map(
        lambda a: M.msm(C.G1, a[0], (a[1], a[2], a[3]), 0, True),
        (g1_sc, *g1_pts))


def _generate_proof_fewdispatch(zkey: ZKey, wtns: Witness, mask: Mask,
                                timings: dict | None = None) -> Proof:
    """Few-dispatch proof for sizes above the fused-module cap: three device
    programs (quotient, 4xG1 MSM, G2 MSM) with device-resident intermediates,
    then the reference's O(1) spec-point algebra on host ints
    (prover.nim:278-302).  Bit-identical to the other paths."""
    hdr = zkey.header
    assert hdr.curve == wtns.curve and hdr.nvars == wtns.nvars

    t0 = time.perf_counter()
    (coeff, rows, cols, msel, a1, b1, b2, c1, h1, _spec) = zkey_device_args(zkey)
    witness_std = jnp.asarray(wtns.values)
    qs_std = prove_quotient_step(hdr.flavour, hdr.log_domain_size,
                                 witness_std, coeff, rows, cols, msel)
    t1 = time.perf_counter()
    zs_std = witness_std[hdr.npubs + 1:]
    sums = prove_g1_msms(witness_std, qs_std, zs_std, a1, b1, h1, c1)
    g1_host = C.points_to_host(C.G1, sums)
    msm_a, msm_b1, msm_h, msm_c = g1_host
    t2 = time.perf_counter()
    res_b2 = M.msm(C.G2, witness_std, b2, 0, True)
    msm_b2 = C.points_to_host(C.G2, tuple(x[None] for x in res_b2))[0]
    t3 = time.perf_counter()

    spec = zkey.spec
    r, s = mask.r % FR.modulus, mask.s % FR.modulus
    pi_a = H.g1_add(H.g1_add(spec.alpha1, H.g1_mul(r, spec.delta1)), msm_a)
    rho = H.g1_add(H.g1_add(spec.beta1, H.g1_mul(s, spec.delta1)), msm_b1)
    pi_b = H.g2_add(H.g2_add(spec.beta2, H.g2_mul(s, spec.delta2)), msm_b2)
    pi_c = H.g1_mul(s, pi_a)
    pi_c = H.g1_add(pi_c, H.g1_mul(r, rho))
    pi_c = H.g1_add(pi_c, H.g1_mul((-r * s) % FR.modulus, spec.delta1))
    pi_c = H.g1_add(pi_c, msm_h)
    pi_c = H.g1_add(pi_c, msm_c)

    from ..ops.limbs import limbs_to_ints
    public_io = limbs_to_ints(wtns.values[: hdr.npubs + 1])
    if timings is not None:
        timings.update({"quotient_s": t1 - t0, "g1_msms_s": t2 - t1,
                        "g2_msm_s": t3 - t2,
                        "total_s": time.perf_counter() - t0})
    return Proof(public_io=public_io, pi_a=pi_a, pi_b=pi_b, pi_c=pi_c)


# ---------------------------------------------------------------------------
# proof assembly
# ---------------------------------------------------------------------------

def _device_points(pa: PointArray, cv: C.CurveSpec):
    """PointArray (wire-layout affine Montgomery limbs) -> projective device batch."""
    return C.from_affine(cv, jnp.asarray(pa.x), jnp.asarray(pa.y))


def zkey_device_args(zkey: ZKey):
    """The circuit-static device inputs of `prove_core_device`, cached on the
    zkey so batch proving (`generate_proofs`) re-uses the device-resident
    points instead of re-uploading them per proof."""
    cached = getattr(zkey, "_device_static_args", None)
    if cached is not None:
        return cached
    co = zkey.coeffs
    check_row_density(co)
    spec = zkey.spec
    pts = zkey.ppoints

    def single(cv, host_pt):
        P = C.points_from_host(cv, [host_pt])
        return tuple(x[0] for x in P)

    args = (
        jnp.asarray(co.coeff),
        jnp.asarray(co.row.astype(np.int32)),
        jnp.asarray(co.col.astype(np.int32)),
        jnp.asarray(co.matrix),
        _device_points(pts.points_a1, C.G1),
        _device_points(pts.points_b1, C.G1),
        _device_points(pts.points_b2, C.G2),
        _device_points(pts.points_c1, C.G1),
        _device_points(pts.points_h1, C.G1),
        (
            single(C.G1, spec.alpha1),
            single(C.G1, spec.delta1),
            single(C.G1, spec.beta1),
            single(C.G2, spec.beta2),
            single(C.G2, spec.delta2),
        ),
    )
    try:
        object.__setattr__(zkey, "_device_static_args", args)
    except Exception:
        pass
    return args


def _fused_core_default() -> bool:
    """The fused one-dispatch device prover is the production path on a TPU
    backend (VERDICT r1 #3); the staged host-orchestrated path remains the
    default on CPU, where one fused XLA module compiles far slower than its
    parts.  Env override: GROTH16_TPU_FUSED_PROVER=1/0."""
    env = os.environ.get("GROTH16_TPU_FUSED_PROVER", "")
    if env:
        return env not in ("0", "false")
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _generate_proof_fused(zkey: ZKey, wtns: Witness, mask: Mask,
                          timings: dict | None = None) -> Proof:
    """One-dispatch proof: the whole pipeline (SpMV -> quotient NTTs -> five
    MSMs -> masked assembly, reference prover.nim:215-304) runs as a single
    jitted device program with the zkey resident on device; the only
    device->host traffic is the three final proof points."""
    hdr = zkey.header
    assert hdr.curve == wtns.curve
    assert hdr.nvars == wtns.nvars, "wrong witness length"

    t0 = time.perf_counter()
    static = zkey_device_args(zkey)
    witness_std = jnp.asarray(wtns.values)
    mask_rs = jnp.asarray(np.stack([int_to_limbs(mask.r % FR.modulus),
                                    int_to_limbs(mask.s % FR.modulus)]))
    t1 = time.perf_counter()
    pi_a, pi_b, pi_c = prove_core_device(
        hdr.flavour, hdr.log_domain_size, witness_std, *static, mask_rs)
    # one G1 conversion for (pi_a, pi_c), one G2 for pi_b
    g1 = tuple(jnp.stack([a, c]) for a, c in zip(pi_a, pi_c))
    pi_a_h, pi_c_h = C.points_to_host(C.G1, g1)
    pi_b_h = C.points_to_host(C.G2, tuple(x[None] for x in pi_b))[0]
    t2 = time.perf_counter()

    from ..ops.limbs import limbs_to_ints
    public_io = limbs_to_ints(wtns.values[: hdr.npubs + 1])

    if timings is not None:
        timings.update({"upload_s": t1 - t0, "device_core_s": t2 - t1,
                        "total_s": t2 - t0})
    return Proof(public_io=public_io, pi_a=pi_a_h, pi_b=pi_b_h, pi_c=pi_c_h)


def _msm_to_host(cv: C.CurveSpec, scalars_std: jnp.ndarray, pa: PointArray):
    P = _device_points(pa, cv)
    try:
        res = M.msm(cv, scalars_std, P, 0, True)   # wire points are affine
    except jax.errors.JaxRuntimeError as e:  # pragma: no cover - env-dependent
        # compile-infrastructure failure on the auto-selected bucket phase
        # (seen: tpu_compile_helper dying on one G2 merge-tree shape):
        # retry with the fused-fold path, which is bit-identical
        print(f"{cv.name} MSM compile failed ({type(e).__name__}); "
              "retrying with the fold path", flush=True)
        res = M.msm(cv, scalars_std, P, 0, True, "fold")
    return C.points_to_host(cv, tuple(x[None] for x in res))[0]


def generate_proof_with_mask(zkey: ZKey, wtns: Witness, mask: Mask,
                             timings: dict | None = None,
                             fused: bool | None = None) -> Proof:
    """Reference generateProofWithMask (prover.nim:215-304).

    `fused=None` auto-selects: the fully-fused device core on TPU backends,
    the staged per-phase path elsewhere.  Both produce bit-identical proofs
    for the same mask (pinned by tests/test_protocol.py)."""
    if fused is None:
        fused = _fused_core_default()
        # One monolithic XLA module stops being compilable somewhere between
        # 2^14 (fine) and 2^18 (the remote TPU compile helper is OOM-killed,
        # SIGKILL) — above the cap the FEW-DISPATCH path (three cached device
        # programs: quotient, 4xG1 MSM, G2 MSM) keeps dispatch count O(1)
        # while each module stays compilable (VERDICT r4 #7).
        max_log2n = int(os.environ.get("GROTH16_TPU_FUSED_MAX_LOG2N", "16"))
        if fused and zkey.header.log_domain_size > max_log2n:
            fused = False
            if os.environ.get("GROTH16_TPU_FEWDISPATCH", "1") not in ("0", "false"):
                try:
                    return _generate_proof_fewdispatch(zkey, wtns, mask, timings)
                except jax.errors.JaxRuntimeError as e:  # pragma: no cover
                    print(f"few-dispatch prover compile failed "
                          f"({type(e).__name__}); falling back to staged",
                          flush=True)
    if fused:
        try:
            return _generate_proof_fused(zkey, wtns, mask, timings)
        except jax.errors.JaxRuntimeError as e:  # pragma: no cover - env-dependent
            # compile-infrastructure failure (e.g. tpu_compile_helper OOM on
            # a huge module): fall back to the staged per-phase path, which
            # is bit-identical (tests/test_protocol.py)
            print(f"fused prover compile failed ({type(e).__name__}); "
                  "falling back to the staged path", flush=True)
    hdr = zkey.header
    spec = zkey.spec
    pts = zkey.ppoints
    assert hdr.curve == wtns.curve
    nvars, npubs = hdr.nvars, hdr.npubs
    assert nvars == wtns.nvars, "wrong witness length"

    t0 = time.perf_counter()
    witness_std = jnp.asarray(wtns.values)               # standard form
    witness_mont = F.to_mont(FR, witness_std)

    from ..ops.limbs import limbs_to_ints
    public_io = limbs_to_ints(wtns.values[: npubs + 1])

    az, bz, cz = build_abc(zkey, witness_mont)
    az.block_until_ready()
    t1 = time.perf_counter()

    qs_mont = quotient_scalars(hdr.flavour, az, bz, cz, hdr.log_domain_size)
    qs_std = F.from_mont(FR, qs_mont)
    qs_std.block_until_ready()
    t2 = time.perf_counter()

    zs_std = witness_std[npubs + 1:]

    assert nvars == len(pts.points_a1) == len(pts.points_b1) == len(pts.points_b2)
    assert hdr.domain_size == qs_std.shape[0] == len(pts.points_h1)
    assert nvars - npubs - 1 == zs_std.shape[0] == len(pts.points_c1)

    r, s = mask.r % FR.modulus, mask.s % FR.modulus

    # pi_a = alpha1 + r*delta1 + MSM(w, A1)            (prover.nim:278-282)
    msm_a = _msm_to_host(C.G1, witness_std, pts.points_a1)
    pi_a = H.g1_add(H.g1_add(spec.alpha1, H.g1_mul(r, spec.delta1)), msm_a)
    t3 = time.perf_counter()

    # rho = beta1 + s*delta1 + MSM(w, B1)              (prover.nim:285-288)
    msm_b1 = _msm_to_host(C.G1, witness_std, pts.points_b1)
    rho = H.g1_add(H.g1_add(spec.beta1, H.g1_mul(s, spec.delta1)), msm_b1)
    t4 = time.perf_counter()

    # pi_b = beta2 + s*delta2 + MSM(w, B2)             (prover.nim:290-294)
    msm_b2 = _msm_to_host(C.G2, witness_std, pts.points_b2)
    pi_b = H.g2_add(H.g2_add(spec.beta2, H.g2_mul(s, spec.delta2)), msm_b2)
    t5 = time.perf_counter()

    # pi_c = s*pi_a + r*rho - rs*delta1 + MSM(qs, H1) + MSM(zs, C1)
    #                                                  (prover.nim:296-302)
    msm_h = _msm_to_host(C.G1, qs_std, pts.points_h1)
    msm_c = _msm_to_host(C.G1, zs_std, pts.points_c1)
    pi_c = H.g1_mul(s, pi_a)
    pi_c = H.g1_add(pi_c, H.g1_mul(r, rho))
    pi_c = H.g1_add(pi_c, H.g1_mul((-r * s) % FR.modulus, spec.delta1))
    pi_c = H.g1_add(pi_c, msm_h)
    pi_c = H.g1_add(pi_c, msm_c)
    t6 = time.perf_counter()

    if timings is not None:
        timings.update({
            "abc_s": t1 - t0, "quotient_ffts_s": t2 - t1, "pi_a_msm_s": t3 - t2,
            "rho_msm_s": t4 - t3, "pi_b_msm_s": t5 - t4, "pi_c_msms_s": t6 - t5,
            "total_s": t6 - t0,
        })

    return Proof(public_io=public_io, pi_a=pi_a, pi_b=pi_b, pi_c=pi_c)


def generate_proof_with_trivial_mask(zkey: ZKey, wtns: Witness, timings=None) -> Proof:
    """Reference prover.nim:308-310."""
    return generate_proof_with_mask(zkey, wtns, Mask(0, 0), timings)


def generate_proof(zkey: ZKey, wtns: Witness, timings=None) -> Proof:
    """Reference prover.nim:312-319 (random masks)."""
    return generate_proof_with_mask(zkey, wtns, random_mask(), timings)


def generate_proofs(zkey: ZKey, witnesses, masks=None, timings=None) -> list:
    """Batch proving mode: a stream of proofs against ONE circuit key.

    The per-proof device programs (SpMV, quotient NTTs, MSMs) are jitted
    per shape, so every proof after the first reuses the compiled
    executables and the device-resident zkey points — the amortized regime
    behind the proofs/s throughput metric (BASELINE.md eval config 5).
    The reference has no batch mode (one proof per CLI invocation).
    """
    out = []
    for i, w in enumerate(witnesses):
        mask = masks[i] if masks is not None else random_mask()
        sink = {} if timings is not None else None
        out.append(generate_proof_with_mask(zkey, w, mask, sink))
        if timings is not None:
            timings.append(sink)
    return out

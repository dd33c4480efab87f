"""Fake circuit-specific trusted setup (reference `groth16/fake_setup.nim`).

Generates random toxic waste and derives a complete in-memory ZKey for an
R1CS — the framework's fixture engine (no ceremony files / snarkjs needed),
exactly the role the reference's fake setup plays for its tests
(`tests/groth16/testProver.nim:65-73`).

TPU-first structure: every point set is a *fixed-base* multi-exponentiation
of the generator — all exponents are computed first (host ints / device Fr),
then one batched device scalar-mul per point set replaces the reference's
per-wire `y ** gen1` loops (`fake_setup.nim:268-304`).

Behavior parity pinned to the reference:
  * domain size 2^ceil(log2(nconstr + npub + 1))      (fake_setup.nim:203-206)
  * the snarkjs dummy A-rows for public IO            (fake_setup.nim:59-63)
  * both H-point flavours                             (fake_setup.nim:285-304)
"""

from __future__ import annotations

import functools
import os
import secrets
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import curve as C
from ..ops import field as F
from ..ops import ntt as NT
from ..ops.field import FR, FP
from ..ops.limbs import N_LIMBS, ints_to_limbs, ints_to_limbs_bulk
from ..utils import hostmath as H
from ..utils import pairing as PR
from .types import (
    Coeffs, Flavour, GrothHeader, PointArray, ProverPoints, R1CS, SpecPoints,
    VerifierPoints, ZKey,
)

R = FR.modulus

# Domain size at/above which the setup runs its vectorized device pipeline
# (Lagrange taus via one iNTT, column taus via segment-sum, windowed
# fixed-base point ladders).  Below it the host path wins: tiny circuits
# cost less to compute in Python than the device programs cost to compile
# (the tests / driver-dryrun case).
_DEVICE_SETUP_MIN = 1 << 12


@dataclass
class ToxicWaste:
    """Reference fake_setup.nim:23-29."""

    alpha: int
    beta: int
    gamma: int
    delta: int
    tau: int


def random_toxic_waste() -> ToxicWaste:
    """CSPRNG (the reference's randFr is std/random, bn128/rnd.nim — upgraded)."""
    return ToxicWaste(*(secrets.randbelow(R - 1) + 1 for _ in range(5)))


def _flatten_terms(r1cs: R1CS):
    """ONE Python pass over the constraint list -> numpy term arrays
    (everything downstream is vectorized).  Returns

      ((mats, rows, cols, vals_std), (c_rows, c_cols, c_vals_std))

    where the first tuple is the A/B coefficient stream in the reference's
    exact order — per-constraint A terms then B terms, then the snarkjs
    dummy A-rows (fake_setup.nim:46-65) — and the second is the C matrix
    (needed only for the tau-evaluation of the setup).  `*_std` are
    uint32[n, 16] standard-form limbs.  Memoized on the R1CS instance."""
    cached = getattr(r1cs, "_flat_terms", None)
    if cached is not None:
        return cached
    n = r1cs.n_constr
    p = r1cs.cfg.n_pub_in + r1cs.cfg.n_pub_out
    mats, rows, cols, vals = [], [], [], []
    crows, ccols, cvals = [], [], []
    for i, (a, b, c) in enumerate(r1cs.constraints):
        for idx, v in a:
            mats.append(0); rows.append(i); cols.append(idx); vals.append(v % R)
        for idx, v in b:
            mats.append(1); rows.append(i); cols.append(idx); vals.append(v % R)
        for idx, v in c:
            crows.append(i); ccols.append(idx); cvals.append(v % R)
    for i in range(n, n + p + 1):
        mats.append(0); rows.append(i); cols.append(i - n); vals.append(1)
    out = ((np.asarray(mats, np.uint8), np.asarray(rows, np.uint32),
            np.asarray(cols, np.uint32), ints_to_limbs_bulk(vals)),
           (np.asarray(crows, np.uint32), np.asarray(ccols, np.uint32),
            ints_to_limbs_bulk(cvals)))
    r1cs._flat_terms = out
    return out


def r1cs_to_coeffs(r1cs: R1CS) -> Coeffs:
    """Sparse A/B coefficient list incl. the snarkjs dummy A-rows quirk
    (reference r1csToCoeffs, fake_setup.nim:46-65); values converted to
    Montgomery in one vectorized batch."""
    (mats, rows, cols, vals_std), _ = _flatten_terms(r1cs)
    coeff_mont = np.asarray(F.to_mont(FR, jnp.asarray(vals_std)))
    return Coeffs(matrix=mats, row=rows, col=cols, coeff=coeff_mont)


def _lagrange_taus(dom: NT.Domain, tau: int) -> list:
    """[L_k(tau)] with ONE modular inversion (Montgomery batch-inverse
    pattern; the closed form is reference evalLagrangePolyAt,
    math/poly.nim:242-250)."""
    n = dom.size
    zn = (pow(tau, n, R) - 1) % R
    dens, wk = [], 1
    for _ in range(n):
        dens.append(n * (tau - wk) % R)
        wk = wk * dom.gen % R
    # batch inversion
    prefix = [1] * (n + 1)
    for i, d in enumerate(dens):
        prefix[i + 1] = prefix[i] * d % R
    inv_all = pow(prefix[n], -1, R)
    invs = [0] * n
    for i in range(n - 1, -1, -1):
        invs[i] = inv_all * prefix[i] % R
        inv_all = inv_all * dens[i] % R
    wk = 1
    out = []
    for k in range(n):
        out.append(wk * zn % R * invs[k] % R)
        wk = wk * dom.gen % R
    return out


def _sparse_column_taus(r1cs: R1CS, lag: list, dom_size: int):
    """Per-wire tau-evaluations of the A/B/C column polynomials: sparse dot
    products with the Lagrange values (reference fake_setup.nim:253-266),
    including the dummy A-rows (fake_setup.nim:159-187)."""
    m = r1cs.cfg.n_wires
    n = r1cs.n_constr
    p = r1cs.cfg.n_pub_in + r1cs.cfg.n_pub_out
    ta, tb, tc = [0] * m, [0] * m, [0] * m
    for i, (a, b, c) in enumerate(r1cs.constraints):
        li = lag[i]
        for idx, v in a:
            ta[idx] = (ta[idx] + v * li) % R
        for idx, v in b:
            tb[idx] = (tb[idx] + v * li) % R
        for idx, v in c:
            tc[idx] = (tc[idx] + v * li) % R
    for i in range(n, n + p + 1):
        ta[i - n] = (ta[i - n] + lag[i]) % R
    return ta, tb, tc


# ---------------------------------------------------------------------------
# vectorized (device) setup pipeline — the large-circuit path
# ---------------------------------------------------------------------------

def lagrange_taus_device(dom: NT.Domain, tau: int) -> jnp.ndarray:
    """[L_k(tau)]_k as uint32[N, 16] Montgomery limbs via ONE inverse NTT.

    Identity: iNTT([tau^i]_i)_k = (1/N) * ((tau*w^-k)^N - 1)/(tau*w^-k - 1)
            = w^k (tau^N - 1) / (N (tau - w^k)) = L_k(tau)
    — the closed form the host `_lagrange_taus` computes term by term
    (reference evalLagrangePolyAt, math/poly.nim:242-250), for the whole
    domain in O(N log N) vectorized work."""
    tau_m = jnp.asarray(FR.to_mont_limbs(tau))
    return NT.inverse_ntt(dom, F.powers(FR, tau_m, dom.size))


def _column_taus_device(r1cs: R1CS, lag: jnp.ndarray):
    """Device equivalent of `_sparse_column_taus`: per-wire tau-evaluations
    of the A/B/C column polynomials as ONE gather + Montgomery multiply +
    segment-sum over all term streams, with a lazy-carry uint32 accumulator
    normalized and mod-reduced once at the end.  Returns (ta, tb, tc) as
    [nvars, 16] Montgomery device arrays."""
    m = r1cs.cfg.n_wires
    (mats, rows, cols, vals_std), (crows, ccols, cvals_std) = _flatten_terms(r1cs)
    all_rows = np.concatenate([rows, crows])
    seg = np.concatenate([cols + mats.astype(np.uint32) * m, ccols + 2 * m])
    # lazy-carry bound: limbs < 2^16, uint32 accumulators -> at most 2^16
    # terms per (matrix, wire) segment before overflow
    assert np.bincount(seg, minlength=3 * m).max() < (1 << 16), \
        "wire term count exceeds the lazy-carry segment-sum bound"
    vals = jnp.asarray(np.concatenate([vals_std, cvals_std]))
    prods = F.mont_mul(FR, F.to_mont(FR, vals), lag[jnp.asarray(all_rows)])
    acc = jax.ops.segment_sum(prods, jnp.asarray(seg), num_segments=3 * m)
    wide, _ = F._ks_norm(acc, 2 * N_LIMBS)
    t_all = F.to_mont(FR, F.mont_reduce_wide(FR, wide))  # value mod r, Montgomery
    return t_all[:m], t_all[m:2 * m], t_all[2 * m:]


_FB_WINDOW_BITS = 8  # fixed-base window width: 32 windows x 256-entry tables


@functools.lru_cache(maxsize=None)
def _fb_table(cv_name: str):
    """Host-precomputed fixed-base window tables T[w][d] = d * 2^(8w) * G as
    affine limb arrays ((0,0) = infinity): the device ladder is then 32
    table gathers + 31 complete adds per point instead of a 254-step
    double-and-add — the reference's per-wire `y ** gen` loops
    (fake_setup.nim:268-304) re-drawn as a windowed multi-exponentiation."""
    cv = C.G1 if cv_name == "G1" else C.G2
    gen = H.G1_GEN if cv_name == "G1" else H.G2_GEN
    fops = H.G1_FIELD if cv_name == "G1" else H.G2_FIELD
    c = _FB_WINDOW_BITS
    W = (256 + c - 1) // c
    xs = np.zeros((W, 1 << c) + cv.fops.comp_shape, np.uint32)
    ys = np.zeros_like(xs)
    base = gen
    for w in range(W):
        acc = None
        for d in range(1, 1 << c):
            acc = H.ec_add(fops, acc, base)
            xs[w, d] = cv.fops.const(acc[0])
            ys[w, d] = cv.fops.const(acc[1])
        for _ in range(c):
            base = H.ec_add(fops, base, base)
    return jnp.asarray(xs), jnp.asarray(ys)


@functools.partial(jax.jit, static_argnums=0)
def _fb_ladder(cv: C.CurveSpec, tx: jnp.ndarray, ty: jnp.ndarray,
               exps_std: jnp.ndarray):
    """Windowed fixed-base multi-exponentiation: [k_i]G for a standard-form
    scalar batch uint32[n, 16] -> projective points.  Digit d of window w is
    byte w of the scalar; (0,0) table rows ride through the complete
    formulas as infinity."""
    acc = C.inf_like(cv, (exps_std.shape[0],))
    for w in range(2 * N_LIMBS):
        limb = exps_std[:, w // 2]
        d = ((limb >> (8 * (w % 2))) & 0xFF).astype(jnp.int32)
        P = C.from_affine(cv, tx[w][d], ty[w][d])
        acc = C.point_add(cv, acc, P)
    return acc


def _fixed_base_points_device(cv: C.CurveSpec, exps_std, pad_to: int = 0) -> PointArray:
    """Batched [k_i]G on device via the windowed ladder; `exps_std` is a
    uint32[n, 16] standard-form scalar array (host or device).  Zero-padded
    to `pad_to` so one compiled executable serves every family of a setup;
    zero scalars produce affine (0, 0) rows."""
    n = exps_std.shape[0]
    npad = max(n, pad_to)
    e = jnp.asarray(exps_std)
    if npad > n:
        e = jnp.pad(e, ((0, npad - n), (0, 0)))
    tx, ty = _fb_table(cv.name)
    x, y = C.to_affine(cv, _fb_ladder(cv, tx, ty, e))
    return PointArray(x=np.asarray(x[:n]), y=np.asarray(y[:n]))


_HOST_FIXED_BASE_MAX = 1024


def _fixed_base_points(cv: C.CurveSpec, scalars: list, pad_to: int = 0) -> PointArray:
    """Batched [k_i]G -> wire-layout PointArray.

    Large batches: one device scalar-mul ladder, zero-padded to `pad_to` so
    the SAME compiled ladder serves every point family of one setup.  Small
    batches: host double-and-add (a 256-step ladder costs far more to
    XLA-compile than tiny circuits cost to compute on host — this keeps fake
    setup off the compiler's critical path for tests and the driver dryrun).
    """
    n = len(scalars)
    if n <= _HOST_FIXED_BASE_MAX:
        gen = H.G1_GEN if cv.name == "G1" else H.G2_GEN
        fops = H.G1_FIELD if cv.name == "G1" else H.G2_FIELD
        x = np.zeros((n,) + cv.fops.comp_shape, np.uint32)
        y = np.zeros_like(x)
        for i, k in enumerate(scalars):
            pt = H.ec_scalar_mul(fops, k % R, gen)
            if pt is None:
                continue
            x[i] = cv.fops.const(pt[0])
            y[i] = cv.fops.const(pt[1])
        return PointArray(x=x, y=y)
    npad = max(n, pad_to)
    ks = [k % R for k in scalars] + [0] * (npad - n)
    kdev = jnp.asarray(ints_to_limbs(ks))
    P = C.scalar_mul(cv, kdev, C.gen_point(cv, (npad,)))
    x, y = C.to_affine(cv, P)
    # zero scalar -> infinity -> affine (0,0): padding rows are dropped here
    return PointArray(x=np.asarray(x[:n]), y=np.asarray(y[:n]))


def fake_circuit_setup(r1cs: R1CS, toxic: ToxicWaste,
                       flavour: Flavour = Flavour.Snarkjs) -> ZKey:
    """Reference fakeCircuitSetup (fake_setup.nim:201-326)."""
    neqs = r1cs.n_constr
    npub = r1cs.cfg.n_pub_in + r1cs.cfg.n_pub_out
    log2 = max(0, (neqs + npub + 1 - 1).bit_length())
    dom_size = 1 << log2
    nvars = r1cs.cfg.n_wires

    header = GrothHeader(curve="bn128", flavour=flavour, p=FP.modulus, r=R,
                         nvars=nvars, npubs=npub, domain_size=dom_size,
                         log_domain_size=log2)

    alpha1 = H.g1_mul(toxic.alpha)
    beta2 = H.g2_mul(toxic.beta)
    spec = SpecPoints(
        alpha1=alpha1,
        beta1=H.g1_mul(toxic.beta),
        beta2=beta2,
        gamma2=H.g2_mul(toxic.gamma),
        delta1=H.g1_mul(toxic.delta),
        delta2=H.g2_mul(toxic.delta),
        alpha_beta=PR.pairing(alpha1, beta2),
    )

    dom = NT.Domain(log2)
    gamma_inv = pow(toxic.gamma, -1, R)
    delta_inv = pow(toxic.delta, -1, R)
    pad_to = max(nvars, dom_size)

    if (dom_size >= _DEVICE_SETUP_MIN
            and not os.environ.get("GROTH16_TPU_HOST_SETUP")):
        # vectorized pipeline: ONE iNTT for the Lagrange taus, one
        # segment-sum for the column taus, windowed fixed-base ladders
        lag = lagrange_taus_device(dom, toxic.tau)
        ta_m, tb_m, tc_m = _column_taus_device(r1cs, lag)
        beta_m = jnp.asarray(FR.to_mont_limbs(toxic.beta))
        alpha_m = jnp.asarray(FR.to_mont_limbs(toxic.alpha))
        combo = F.add_mod(FR, F.add_mod(
            FR, F.mont_mul(FR, ta_m, beta_m), F.mont_mul(FR, tb_m, alpha_m)),
            tc_m)
        gi_m = jnp.asarray(FR.to_mont_limbs(gamma_inv))
        di_m = jnp.asarray(FR.to_mont_limbs(delta_inv))
        ic_exp = np.asarray(F.from_mont(FR, F.mont_mul(FR, combo[:npub + 1], gi_m)))
        c1_exp = np.asarray(F.from_mont(FR, F.mont_mul(FR, combo[npub + 1:], di_m)))
        ta = np.asarray(F.from_mont(FR, ta_m))
        tb = np.asarray(F.from_mont(FR, tb_m))
        if flavour == Flavour.JensGroth:
            # [delta^-1 tau^i Z(tau)]_1 (fake_setup.nim:292-294)
            z_tau = (pow(toxic.tau, dom_size, R) - 1) % R
            pw = F.powers(FR, jnp.asarray(FR.to_mont_limbs(toxic.tau)), dom_size)
            dz_m = jnp.asarray(FR.to_mont_limbs(delta_inv * z_tau % R))
            h_exp = np.asarray(F.from_mont(FR, F.mont_mul(FR, pw, dz_m)))
        else:
            # [delta^-1 L_{2i+1}(tau)]_1 on the 2N domain (fake_setup.nim:301-304)
            lag2 = lagrange_taus_device(NT.Domain(log2 + 1), toxic.tau)
            h_exp = np.asarray(F.from_mont(
                FR, F.mont_mul(FR, lag2[1::2], di_m)))

        points_a1 = _fixed_base_points_device(C.G1, ta, pad_to)
        points_b1 = _fixed_base_points_device(C.G1, tb, pad_to)
        points_b2 = _fixed_base_points_device(C.G2, tb, pad_to)
        points_ic = _fixed_base_points_device(C.G1, ic_exp, pad_to)
        points_c1 = _fixed_base_points_device(C.G1, c1_exp, pad_to)
        points_h1 = _fixed_base_points_device(C.G1, h_exp, pad_to)
        return ZKey(header=header, spec=spec,
                    vpoints=VerifierPoints(points_ic=points_ic),
                    ppoints=ProverPoints(points_a1, points_b1, points_b2,
                                         points_c1, points_h1),
                    coeffs=r1cs_to_coeffs(r1cs))

    lag = _lagrange_taus(dom, toxic.tau)
    ta, tb, tc = _sparse_column_taus(r1cs, lag, dom_size)

    # exponent-space assembly of every point family (all fixed-base)
    ic_exp = [gamma_inv * (toxic.beta * ta[j] + toxic.alpha * tb[j] + tc[j]) % R
              for j in range(npub + 1)]
    c1_exp = [delta_inv * (toxic.beta * ta[j] + toxic.alpha * tb[j] + tc[j]) % R
              for j in range(npub + 1, nvars)]

    if flavour == Flavour.JensGroth:
        # [delta^-1 tau^i Z(tau)]_1 (fake_setup.nim:292-294)
        z_tau = (pow(toxic.tau, dom_size, R) - 1) % R
        h_exp, tp = [], 1
        for _ in range(dom_size):
            h_exp.append(delta_inv * tp % R * z_tau % R)
            tp = tp * toxic.tau % R
    else:
        # [delta^-1 L_{2i+1}(tau)]_1 on the 2N domain (fake_setup.nim:301-304)
        lag2 = _lagrange_taus(NT.Domain(log2 + 1), toxic.tau)
        h_exp = [delta_inv * lag2[2 * i + 1] % R for i in range(dom_size)]

    # pad every device ladder to one common shape -> a single compiled
    # G1 (and G2) scalar-mul executable per setup
    points_a1 = _fixed_base_points(C.G1, ta, pad_to)
    points_b1 = _fixed_base_points(C.G1, tb, pad_to)
    points_b2 = _fixed_base_points(C.G2, tb, pad_to)
    points_ic = _fixed_base_points(C.G1, ic_exp, pad_to)
    points_c1 = _fixed_base_points(C.G1, c1_exp, pad_to)
    points_h1 = _fixed_base_points(C.G1, h_exp, pad_to)

    return ZKey(header=header, spec=spec,
                vpoints=VerifierPoints(points_ic=points_ic),
                ppoints=ProverPoints(points_a1, points_b1, points_b2,
                                     points_c1, points_h1),
                coeffs=r1cs_to_coeffs(r1cs))


def create_fake_circuit_setup(r1cs: R1CS, flavour: Flavour = Flavour.Snarkjs) -> ZKey:
    """Reference createFakeCircuitSetup (fake_setup.nim:330-332)."""
    return fake_circuit_setup(r1cs, random_toxic_waste(), flavour)

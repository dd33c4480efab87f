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

import secrets
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..ops import curve as C
from ..ops import ntt as NT
from ..ops.field import FR, FP
from ..ops.limbs import N_LIMBS, ints_to_limbs
from ..utils import hostmath as H
from ..utils import pairing as PR
from .types import (
    Coeffs, Flavour, GrothHeader, PointArray, ProverPoints, R1CS, SpecPoints,
    VerifierPoints, ZKey,
)

R = FR.modulus


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


def r1cs_to_coeffs(r1cs: R1CS) -> Coeffs:
    """Sparse A/B coefficient list incl. the snarkjs dummy A-rows quirk
    (reference r1csToCoeffs, fake_setup.nim:46-65)."""
    n = r1cs.n_constr
    p = r1cs.cfg.n_pub_in + r1cs.cfg.n_pub_out
    mats, rows, cols, vals = [], [], [], []
    for i, (a, b, _c) in enumerate(r1cs.constraints):
        for idx, v in a:
            mats.append(0); rows.append(i); cols.append(idx); vals.append(v % R)
        for idx, v in b:
            mats.append(1); rows.append(i); cols.append(idx); vals.append(v % R)
    for i in range(n, n + p + 1):
        mats.append(0); rows.append(i); cols.append(i - n); vals.append(1)
    coeff_mont = np.zeros((len(vals), N_LIMBS), np.uint32)
    for j, v in enumerate(vals):
        coeff_mont[j] = FR.to_mont_limbs(v)
    return Coeffs(matrix=np.asarray(mats, np.uint8), row=np.asarray(rows, np.uint32),
                  col=np.asarray(cols, np.uint32), coeff=coeff_mont)


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
    lag = _lagrange_taus(dom, toxic.tau)
    ta, tb, tc = _sparse_column_taus(r1cs, lag, dom_size)

    # exponent-space assembly of every point family (all fixed-base)
    gamma_inv = pow(toxic.gamma, -1, R)
    delta_inv = pow(toxic.delta, -1, R)
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
    pad_to = max(nvars, dom_size)
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

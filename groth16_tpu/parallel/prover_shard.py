"""Mesh-sharded proof step: the prover pipeline over a device mesh — sparse
SpMV + the coset-shift quotient computed with four-step (all_to_all) NTTs as
one mesh program, then all five MSMs point-sharded with all_gather
window-partial reduction.

This is the multi-chip "training step" of the framework: points and NTT rows
are data/sequence-sharded (the analog of dp/sp).  The O(1) spec-point algebra
(alpha1 + r*delta1 + ..., reference prover.nim:278-302) runs on HOST ints —
five single-point ops per proof do not justify device programs, and every
point-formula instantiation costs tens of seconds of XLA:CPU compile on the
virtual-device mesh the driver uses to validate sharding.

Proof-output parity: bit-identical to `protocol.prover.generate_proof_with_mask`
(asserted in tests/test_parallel.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import curve as C
from ..ops import field as F
from ..ops import msm as M
from ..ops import ntt as NT
from ..ops.field import FR
from ..ops.limbs import N_LIMBS, int_to_limbs, limbs_to_int
from ..protocol.prover import abc_core
from ..protocol.types import Flavour
from ..utils import hostmath as H
from .msm_shard import _msm_sharded_jit
from .ntt_shard import four_step_ntt, four_step_intt


@functools.partial(jax.jit, static_argnums=(0,))
def _abc_sharded(log2n: int, witness_std, coeff_mont, rows, cols, matrix_sel):
    """SpMV stage: witness -> (az, bz, cz) domain vectors (prover.nim:56-73)."""
    return abc_core(1 << log2n, F.to_mont(FR, witness_std),
                    coeff_mont, rows, cols, matrix_sel)


@jax.jit
def _pointwise_ys(a1, b1, c1):
    """Coset values of A*B - C (prover.nim:140-141 / :175-176)."""
    return F.sub_mod(FR, F.mont_mul(FR, a1, b1), c1)


@jax.jit
def _mul_const_from_mont(xs, k_mont):
    return F.from_mont(FR, F.mont_mul(FR, xs, k_mont[None, :]))


@jax.jit
def _from_mont_jit(xs):
    return F.from_mont(FR, xs)


@jax.jit
def _mul_const_mont(xs, k_mont):
    return F.mont_mul(FR, xs, k_mont[None, :])


def quotient_scalars_sharded(mesh, flavour: Flavour, log2n: int,
                             witness_std, coeff_mont, rows, cols, matrix_sel):
    """Stage 1 of the staged sharded prover: SpMV + the coset-shift quotient
    with four-step (all_to_all) NTTs (reference prover.nim:118-181).
    Returns the H-MSM scalars in STANDARD form.

    Deliberately NOT one fused jit: each step below is a small jitted program
    (the four-step NTT executable is compiled ONCE and reused for all three
    shift-evals) and intermediates stay device-resident between dispatches.
    A single fused mesh program takes >10 min of XLA:CPU compile on the
    virtual-device mesh the driver uses — compile-unit granularity IS the
    architecture here."""
    dom = NT.Domain(log2n)
    n = dom.size
    az, bz, cz = _abc_sharded(log2n, witness_std, coeff_mont, rows, cols, matrix_sel)

    r = FR.modulus
    eta = NT.Domain(log2n + 1).gen
    eta_mont = jnp.asarray(int_to_limbs(eta * F.R_MONT % r))

    def shift_eval(values):
        cs = four_step_intt(dom, mesh, values)
        ds = NT.mul_by_powers(dom, cs, eta_mont)
        return four_step_ntt(dom, mesh, ds)

    ys = _pointwise_ys(shift_eval(az), shift_eval(bz), shift_eval(cz))
    if flavour == Flavour.Snarkjs:
        return _from_mont_jit(ys)
    inv_z1 = pow(pow(eta, n, r) - 1, -1, r)
    ys = _mul_const_mont(ys, jnp.asarray(int_to_limbs(inv_z1 * F.R_MONT % r)))
    q1 = four_step_intt(dom, mesh, ys)
    return _mul_const_from_mont(q1, jnp.asarray(
        int_to_limbs(pow(eta, -1, r) * F.R_MONT % r)))


def _msm_host(cv, mesh, sc, pts, window_bits, affine=False):
    """One sharded MSM -> host affine point (None = infinity)."""
    res = _msm_sharded_jit(cv, mesh, sc, pts, window_bits, affine)
    return C.points_to_host(cv, tuple(x[None] for x in res))[0]


def _spec_to_host(spec_pts):
    """Device spec-point tuples -> host affine ints (five tiny readbacks)."""
    alpha1, delta1, beta1, beta2, delta2 = spec_pts
    g1 = [C.points_to_host(C.G1, tuple(x[None] for x in p))[0]
          for p in (alpha1, delta1, beta1)]
    g2 = [C.points_to_host(C.G2, tuple(x[None] for x in p))[0]
          for p in (beta2, delta2)]
    return g1[0], g1[1], g1[2], g2[0], g2[1]


def prove_staged_sharded(mesh, flavour: Flavour, log2n: int, window_bits: int,
                         witness_std, coeff_mont, rows, cols, matrix_sel,
                         a1_pts, b1_pts, b2_pts, c1_pts, h1_pts,
                         spec_pts, mask_rs):
    """The multi-chip proof step.  Device work compiles as exactly THREE mesh
    programs — the quotient stage, ONE G1 sharded-MSM executable reused for
    all four G1 MSMs (everything padded to a common shape), and one G2
    sharded-MSM — plus the small shared to_affine readbacks.  Spec-point
    algebra runs on host ints (hostmath), mirroring the unsharded prover.

    Inputs as produced by `protocol.device_inputs.prove_core_inputs`.
    Returns host affine (pi_a, pi_b, pi_c) — bit-identical to the unsharded
    `generate_proof_with_mask` for the same mask (reference prover.nim:215-304).
    """
    d = mesh.devices.size
    npubs_plus1 = witness_std.shape[0] - c1_pts[0].shape[0]
    zs_std = witness_std[npubs_plus1:]

    # ONE padded shape for every G1 MSM (and the G2 one): scalars zero-padded,
    # points padded with infinity — zero scalar x identity contributes nothing.
    # The quotient-scalar length is static (the domain size), so the shape is
    # known before the quotient stage runs.
    nmax = max(witness_std.shape[0], 1 << log2n, zs_std.shape[0])
    nmax += (-nmax) % d

    from jax.sharding import NamedSharding, PartitionSpec as PS
    from .msm_shard import AXIS, _point_spec

    def padded(cv, sc, pts):
        npts = pts[0].shape[0]
        sc = jnp.pad(sc, [(0, nmax - sc.shape[0]), (0, 0)])
        pad = nmax - npts
        if pad:
            infs = C.inf_like(cv)
            pts = tuple(jnp.concatenate(
                [p, jnp.broadcast_to(i, (pad,) + i.shape)], 0)
                for p, i in zip(pts, infs))
        # pin every input to ONE canonical sharding: without this, the
        # quotient-stage output (committed to its own mesh sharding) makes
        # jit compile a SECOND MSM executable for the different input
        # layout — a silent full recompile of the hottest program
        shard = NamedSharding(mesh, _point_spec(cv, True))
        sc = jax.device_put(sc, NamedSharding(mesh, PS(AXIS, None)))
        pts = tuple(jax.device_put(p, shard) for p in pts)
        return sc, pts

    def shmsm(cv, sc, pts):
        sc, pts = padded(cv, sc, pts)
        # zkey points are wire-format affine (Z in {0, mont-1}) and the
        # infinity padding keeps Z == 0, so every device's local bucket
        # phase may run the mixed-addition fold/tree fast path — the same
        # production design as the single-chip prover (VERDICT r4 #5)
        return _msm_host(cv, mesh, sc, pts, window_bits, affine=True)

    import os as _os
    import time as _time
    _t0 = _time.perf_counter()
    _trace = _os.environ.get("GROTH16_TPU_TRACE_SHARD")

    def _lap(msg):
        if _trace:
            print(f"prove_staged_sharded[{_time.perf_counter() - _t0:7.1f}s]"
                  f" {msg}", flush=True)

    # The G2 MSM executable is the compile hog (every G2 point-formula
    # instantiation costs ~40 s of XLA:CPU compile on the virtual-device
    # mesh; minutes of Mosaic+XLA on TPU).  XLA compilation releases the
    # GIL, so kick the G2 program off on a worker thread FIRST and overlap
    # it with the quotient stage, all four G1 MSMs, and the readback
    # programs — it needs only the witness, not the quotient scalars.
    import concurrent.futures as _cf
    with _cf.ThreadPoolExecutor(max_workers=1) as ex:
        def _msm_b2():
            out = shmsm(C.G2, witness_std, b2_pts)
            _lap("G2 MSM (worker thread) done")
            return out

        fut_b2 = ex.submit(_msm_b2)

        qs_std = quotient_scalars_sharded(
            mesh, flavour, log2n, witness_std, coeff_mont, rows, cols,
            matrix_sel)
        assert qs_std.shape[0] == 1 << log2n
        _lap("quotient stage done")

        msm_a = shmsm(C.G1, witness_std, a1_pts)
        _lap("G1 MSM pi_a done")
        msm_b1 = shmsm(C.G1, witness_std, b1_pts)
        _lap("G1 MSM rho done")
        msm_h = shmsm(C.G1, qs_std, h1_pts)
        _lap("G1 MSM H done")
        msm_c = shmsm(C.G1, zs_std, c1_pts)
        _lap("G1 MSM C done")
        msm_b2 = fut_b2.result()

    alpha1, delta1, beta1, beta2, delta2 = _spec_to_host(spec_pts)
    _lap("spec-point readbacks done")
    r = limbs_to_int(np.asarray(mask_rs[0]))
    s = limbs_to_int(np.asarray(mask_rs[1]))

    # pi_a = alpha1 + r*delta1 + MSM(w, A1)            (prover.nim:278-282)
    pi_a = H.g1_add(H.g1_add(alpha1, H.g1_mul(r, delta1)), msm_a)
    # rho = beta1 + s*delta1 + MSM(w, B1)              (prover.nim:285-288)
    rho = H.g1_add(H.g1_add(beta1, H.g1_mul(s, delta1)), msm_b1)
    # pi_b = beta2 + s*delta2 + MSM(w, B2)             (prover.nim:290-294)
    pi_b = H.g2_add(H.g2_add(beta2, H.g2_mul(s, delta2)), msm_b2)
    # pi_c = s*pi_a + r*rho - rs*delta1 + MSM(qs, H1) + MSM(zs, C1)
    pi_c = H.g1_mul(s, pi_a)
    pi_c = H.g1_add(pi_c, H.g1_mul(r, rho))
    pi_c = H.g1_add(pi_c, H.g1_mul((-r * s) % FR.modulus, delta1))
    pi_c = H.g1_add(pi_c, msm_h)
    pi_c = H.g1_add(pi_c, msm_c)
    return pi_a, pi_b, pi_c


def pad_points_scalars(cv, d: int, scalars_std: np.ndarray, pts):
    """Host-side padding of (scalars, projective points) to a multiple of d
    (zero scalars times the padded identity contribute nothing)."""
    n = scalars_std.shape[0]
    pad = (-n) % d
    if pad == 0:
        return jnp.asarray(scalars_std), pts
    sc = np.pad(np.asarray(scalars_std), [(0, pad), (0, 0)])
    infs = C.inf_like(cv)
    pts = tuple(jnp.concatenate([p, jnp.broadcast_to(i, (pad,) + i.shape)], 0)
                for p, i in zip(pts, infs))
    return jnp.asarray(sc), pts

"""Mesh-sharded proof step: the full prover pipeline jitted over a device
mesh — sparse SpMV, the coset-shift quotient computed with four-step
(all_to_all) NTTs, and all five MSMs point-sharded with window-partial
all_gather reduction.

This is the multi-chip "training step" of the framework: points and NTT rows
are data/sequence-sharded (the analog of dp/sp), spec-point algebra is
replicated.  Single-chip semantics are identical to
`protocol.prover.prove_core_device`.
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
from ..ops.limbs import N_LIMBS, int_to_limbs
from ..protocol.prover import _segment_sum_mod
from ..protocol.types import Flavour
from .msm_shard import _msm_sharded_jit
from .ntt_shard import four_step_ntt, four_step_intt


def _shift_eval_sharded(mesh, dom: NT.Domain, values, eta_mont):
    cs = four_step_intt(dom, mesh, values)
    ds = NT.mul_by_powers(dom, cs, eta_mont)
    return four_step_ntt(dom, mesh, ds)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def prove_step_sharded(mesh, flavour: Flavour, log2n: int, window_bits: int,
                       witness_std, coeff_mont, rows, cols, matrix_sel,
                       a1_pts, b1_pts, b2_pts, c1_pts, h1_pts,
                       spec_pts, mask_rs):
    """Sharded counterpart of prove_core_device.  All point batches must have
    leading dims divisible by the mesh size (pad with infinity + zero scalars
    on the host).  Returns projective (pi_a, pi_b, pi_c), replicated."""
    n = 1 << log2n
    dom = NT.Domain(log2n)
    witness_mont = F.to_mont(FR, witness_std)
    w = witness_mont[cols]
    prod = F.mont_mul(FR, coeff_mont, w)
    is_a = (matrix_sel == 0)[:, None]
    az = _segment_sum_mod(jnp.where(is_a, prod, 0), rows, n)
    bz = _segment_sum_mod(jnp.where(is_a, 0, prod), rows, n)
    cz = F.mont_mul(FR, az, bz)

    # quotient scalars with sharded four-step NTTs (prover.nim:118-181)
    r = FR.modulus
    eta = NT.Domain(log2n + 1).gen
    eta_mont = jnp.asarray(int_to_limbs(eta * F.R_MONT % r))
    a1 = _shift_eval_sharded(mesh, dom, az, eta_mont)
    b1 = _shift_eval_sharded(mesh, dom, bz, eta_mont)
    c1 = _shift_eval_sharded(mesh, dom, cz, eta_mont)
    ys = F.sub_mod(FR, F.mont_mul(FR, a1, b1), c1)
    if flavour == Flavour.Snarkjs:
        qs_mont = ys
    else:
        inv_z1 = pow(pow(eta, n, r) - 1, -1, r)
        ys = F.mont_mul(FR, ys, jnp.asarray(int_to_limbs(inv_z1 * F.R_MONT % r))[None, :])
        q1 = four_step_intt(dom, mesh, ys)
        qs_mont = NT.mul_by_powers(dom, q1, jnp.asarray(
            int_to_limbs(pow(eta, -1, r) * F.R_MONT % r)))
    qs_std = F.from_mont(FR, qs_mont)

    npubs_plus1 = witness_std.shape[0] - c1_pts[0].shape[0]
    zs_std = witness_std[npubs_plus1:]

    alpha1, delta1, beta1, beta2, delta2 = spec_pts
    r_std, s_std = mask_rs[0], mask_rs[1]

    def smul1(cv, k_std, P):
        return tuple(x[0] for x in C.scalar_mul(cv, k_std[None], tuple(x[None] for x in P)))

    d = mesh.devices.size

    def shmsm(cv, sc, pts):
        # static in-graph padding: scalars up to the point count, then both
        # to a multiple of the mesh size (zero scalar x identity = identity)
        npts = pts[0].shape[0]
        sc = jnp.pad(sc, [(0, npts - sc.shape[0]), (0, 0)])
        pad = (-npts) % d
        if pad:
            sc = jnp.pad(sc, [(0, pad), (0, 0)])
            infs = C.inf_like(cv)
            pts = tuple(jnp.concatenate(
                [p, jnp.broadcast_to(i, (pad,) + i.shape)], 0)
                for p, i in zip(pts, infs))
        return _msm_sharded_jit(cv, mesh, sc, pts, window_bits)

    msm_a = shmsm(C.G1, witness_std, a1_pts)
    pi_a = C.point_add(C.G1, C.point_add(C.G1, alpha1, smul1(C.G1, r_std, delta1)), msm_a)

    msm_b1 = shmsm(C.G1, witness_std, b1_pts)
    rho = C.point_add(C.G1, C.point_add(C.G1, beta1, smul1(C.G1, s_std, delta1)), msm_b1)

    msm_b2 = shmsm(C.G2, witness_std, b2_pts)
    pi_b = C.point_add(C.G2, C.point_add(C.G2, beta2, smul1(C.G2, s_std, delta2)), msm_b2)

    msm_h = shmsm(C.G1, qs_std, h1_pts)
    msm_c = shmsm(C.G1, zs_std, c1_pts)
    rs_std = F.from_mont(FR, F.mont_mul(FR, F.to_mont(FR, r_std), F.to_mont(FR, s_std)))
    pi_c = smul1(C.G1, s_std, pi_a)
    pi_c = C.point_add(C.G1, pi_c, smul1(C.G1, r_std, rho))
    pi_c = C.point_add(C.G1, pi_c, C.point_neg(C.G1, smul1(C.G1, rs_std, delta1)))
    pi_c = C.point_add(C.G1, pi_c, msm_h)
    pi_c = C.point_add(C.G1, pi_c, msm_c)
    return pi_a, pi_b, pi_c


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def quotient_scalars_sharded(mesh, flavour: Flavour, log2n: int,
                             witness_std, coeff_mont, rows, cols, matrix_sel):
    """Stage 1 of the staged sharded prover: SpMV + the coset-shift quotient
    with four-step (all_to_all) NTTs.  Returns (public-ready) qs in STANDARD
    form plus the Montgomery witness."""
    n = 1 << log2n
    dom = NT.Domain(log2n)
    witness_mont = F.to_mont(FR, witness_std)
    w = witness_mont[cols]
    prod = F.mont_mul(FR, coeff_mont, w)
    is_a = (matrix_sel == 0)[:, None]
    az = _segment_sum_mod(jnp.where(is_a, prod, 0), rows, n)
    bz = _segment_sum_mod(jnp.where(is_a, 0, prod), rows, n)
    cz = F.mont_mul(FR, az, bz)

    r = FR.modulus
    eta = NT.Domain(log2n + 1).gen
    eta_mont = jnp.asarray(int_to_limbs(eta * F.R_MONT % r))
    a1 = _shift_eval_sharded(mesh, dom, az, eta_mont)
    b1 = _shift_eval_sharded(mesh, dom, bz, eta_mont)
    c1 = _shift_eval_sharded(mesh, dom, cz, eta_mont)
    ys = F.sub_mod(FR, F.mont_mul(FR, a1, b1), c1)
    if flavour == Flavour.Snarkjs:
        qs_mont = ys
    else:
        inv_z1 = pow(pow(eta, n, r) - 1, -1, r)
        ys = F.mont_mul(FR, ys, jnp.asarray(int_to_limbs(inv_z1 * F.R_MONT % r))[None, :])
        q1 = four_step_intt(dom, mesh, ys)
        qs_mont = NT.mul_by_powers(dom, q1, jnp.asarray(
            int_to_limbs(pow(eta, -1, r) * F.R_MONT % r)))
    return F.from_mont(FR, qs_mont)


def prove_staged_sharded(mesh, flavour: Flavour, log2n: int, window_bits: int,
                         witness_std, coeff_mont, rows, cols, matrix_sel,
                         a1_pts, b1_pts, b2_pts, c1_pts, h1_pts,
                         spec_pts, mask_rs):
    """The staged multi-chip proof step: the quotient stage and each of the
    five sharded MSMs compile as separate mesh programs (the single fused
    module of `prove_step_sharded` exceeds XLA:CPU code-size limits on the
    virtual-device mesh; on-TPU fusion is an optimization to revisit).

    Same inputs/outputs as prove_step_sharded."""
    from .msm_shard import _msm_sharded_jit

    qs_std = quotient_scalars_sharded(
        mesh, flavour, log2n, witness_std, coeff_mont, rows, cols, matrix_sel)

    d = mesh.devices.size
    npubs_plus1 = witness_std.shape[0] - c1_pts[0].shape[0]
    zs_std = witness_std[npubs_plus1:]

    def shmsm(cv, sc, pts):
        npts = pts[0].shape[0]
        sc = jnp.pad(sc, [(0, npts - sc.shape[0]), (0, 0)])
        pad = (-npts) % d
        if pad:
            sc = jnp.pad(sc, [(0, pad), (0, 0)])
            infs = C.inf_like(cv)
            pts = tuple(jnp.concatenate(
                [p, jnp.broadcast_to(i, (pad,) + i.shape)], 0)
                for p, i in zip(pts, infs))
        return _msm_sharded_jit(cv, mesh, sc, pts, window_bits)

    alpha1, delta1, beta1, beta2, delta2 = spec_pts
    r_std, s_std = mask_rs[0], mask_rs[1]
    rs_std = F.from_mont(FR, F.mont_mul(FR, F.to_mont(FR, r_std), F.to_mont(FR, s_std)))

    def smul1(cv, k_std, P):
        return tuple(x[0] for x in C.scalar_mul(cv, k_std[None], tuple(x[None] for x in P)))

    msm_a = shmsm(C.G1, witness_std, a1_pts)
    pi_a = C.point_add(C.G1, C.point_add(C.G1, alpha1, smul1(C.G1, r_std, delta1)), msm_a)
    msm_b1 = shmsm(C.G1, witness_std, b1_pts)
    rho = C.point_add(C.G1, C.point_add(C.G1, beta1, smul1(C.G1, s_std, delta1)), msm_b1)
    msm_b2 = shmsm(C.G2, witness_std, b2_pts)
    pi_b = C.point_add(C.G2, C.point_add(C.G2, beta2, smul1(C.G2, s_std, delta2)), msm_b2)
    msm_h = shmsm(C.G1, qs_std, h1_pts)
    msm_c = shmsm(C.G1, zs_std, c1_pts)
    pi_c = smul1(C.G1, s_std, pi_a)
    pi_c = C.point_add(C.G1, pi_c, smul1(C.G1, r_std, rho))
    pi_c = C.point_add(C.G1, pi_c, C.point_neg(C.G1, smul1(C.G1, rs_std, delta1)))
    pi_c = C.point_add(C.G1, pi_c, msm_h)
    pi_c = C.point_add(C.G1, pi_c, msm_c)
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

"""Golden tests for the Pippenger MSM vs the naive oracle and host math
(reference behavior: groth16/bn128/msm.nim)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy on XLA:CPU (see pyproject.toml)

from groth16_tpu.ops import curve as C
from groth16_tpu.ops import msm as M
from groth16_tpu.ops.field import FR
from groth16_tpu.ops.limbs import ints_to_limbs
from groth16_tpu.utils import hostmath as H

rng = random.Random(1)


def setup_case(cv, n, scalar_bits=None):
    fo = H.G1_FIELD if cv.name == "G1" else H.G2_FIELD
    gen = H.G1_GEN if cv.name == "G1" else H.G2_GEN
    pts = [H.ec_scalar_mul(fo, rng.randrange(1, 1 << 62), gen) for _ in range(n)]
    hi = 1 << (scalar_bits or 254)
    ks = [rng.randrange(min(hi, FR.modulus)) for _ in range(n)]
    # edge scalars
    if n >= 4:
        ks[0] = 0
        ks[1] = 1
        pts[2] = None  # infinity input point
    want = H.ec_msm(fo, ks, pts)
    return ks, pts, want, fo


@pytest.mark.parametrize("cv", [C.G1, C.G2], ids=["G1", "G2"])
def test_msm_small_vs_host(cv):
    ks, pts, want, _ = setup_case(cv, 13)
    kdev = jnp.asarray(ints_to_limbs(ks))
    P = C.points_from_host(cv, pts)
    got = C.points_to_host(cv, tuple(c[None] for c in M.msm(cv, kdev, P)))[0]
    assert got == want
    naive = C.points_to_host(cv, tuple(c[None] for c in M.msm_naive(cv, kdev, P)))[0]
    assert naive == want


def test_msm_pippenger_g1():
    """The bucketed Pippenger path proper (n >= 128).  G1-only on the CPU
    test mesh: the G2 variant is the same curve-generic code (CurveSpec
    parameterized) but its XLA CPU compile takes tens of minutes; it is
    exercised on TPU by bench.py and the CLI."""
    n = 160
    fo = H.G1_FIELD
    pts = [H.ec_scalar_mul(fo, rng.randrange(1, 1 << 62), H.G1_GEN) for _ in range(n)]
    ks = [rng.randrange(FR.modulus) for _ in range(n)]
    ks[0] = 0
    pts[1] = None
    want = H.ec_msm(fo, ks, pts)
    kdev = jnp.asarray(ints_to_limbs(ks))
    P = C.points_from_host(C.G1, pts)
    got = C.points_to_host(C.G1, tuple(x[None] for x in M.msm(C.G1, kdev, P, 8)))[0]
    assert got == want


def test_msm_window_sizes():
    cv = C.G1
    ks, pts, want, _ = setup_case(cv, 9, scalar_bits=40)
    kdev = jnp.asarray(ints_to_limbs(ks))
    P = C.points_from_host(cv, pts)
    for c in (4, 8):
        got = C.points_to_host(cv, tuple(x[None] for x in M.msm(cv, kdev, P, c)))[0]
        assert got == want, f"window_bits={c}"


def test_msm_all_zero_and_single():
    cv = C.G1
    pts = [H.ec_scalar_mul(H.G1_FIELD, 5, H.G1_GEN)] * 3
    P = C.points_from_host(cv, pts)
    kdev = jnp.asarray(ints_to_limbs([0, 0, 0]))
    got = C.points_to_host(cv, tuple(x[None] for x in M.msm(cv, kdev, P)))[0]
    assert got is None
    kdev = jnp.asarray(ints_to_limbs([2, 3, 4]))
    got = C.points_to_host(cv, tuple(x[None] for x in M.msm(cv, kdev, P)))[0]
    assert got == H.ec_scalar_mul(H.G1_FIELD, 45, H.G1_GEN)


def test_window_digit_extraction():
    ks = [rng.randrange(FR.modulus) for _ in range(5)]
    kdev = jnp.asarray(ints_to_limbs(ks))
    for c in (4, 11, 16, 7):
        n_windows = -(-M.NBITS // c)
        recon = [0] * 5
        for w in range(n_windows):
            d = np.asarray(M._window_digits(kdev, w, c))
            for i in range(5):
                recon[i] |= int(d[i]) << (w * c)
        assert recon == ks


def test_signed_window_digits():
    """wNAF digits: |d| <= 2^(c-1) and the signed base-2^c reconstruction
    equals the scalar exactly (no trailing carry)."""
    ks = [rng.randrange(FR.modulus) for _ in range(7)]
    ks[0] = 0
    ks[1] = FR.modulus - 1  # max scalar
    kdev = jnp.asarray(ints_to_limbs(ks))
    for c in (4, 13, 16, 17):
        half = 1 << (c - 1)
        d = np.asarray(M.signed_window_digits(kdev, c)).astype(np.int64)
        assert d.shape[0] == -(-(M.NBITS + 1) // c)
        assert np.abs(d).max() <= half
        recon = [sum(int(d[w, i]) << (w * c) for w in range(d.shape[0]))
                 for i in range(len(ks))]
        assert recon == ks, f"c={c}"

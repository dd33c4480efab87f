"""Native host backend (csrc/bn254_host.cpp via utils/native.py) vs the pure
Python oracle (utils/hostmath.py, utils/pairing.py).  Skips when no compiler
is available."""

import random

import pytest

from groth16_tpu.utils import hostmath as H
from groth16_tpu.utils import native as NV
from groth16_tpu.utils import pairing as PR

pytestmark = pytest.mark.skipif(not NV.available(),
                                reason="g++ unavailable / native disabled")

rng = random.Random(9)


def test_native_g1_ops_vs_host():
    a = H.ec_scalar_mul(H.G1_FIELD, 12345, H.G1_GEN)
    b = H.ec_scalar_mul(H.G1_FIELD, 99, H.G1_GEN)
    assert NV.g1_add(a, b) == H.ec_add(H.G1_FIELD, a, b)
    assert NV.g1_add(a, None) == a
    assert NV.g1_add(a, H.ec_neg(H.G1_FIELD, a)) is None
    assert NV.g1_add(a, a) == H.ec_add(H.G1_FIELD, a, a)
    k = rng.randrange(1 << 254)
    assert NV.g1_mul(k, H.G1_GEN) == H.ec_scalar_mul(H.G1_FIELD, k, H.G1_GEN)
    assert NV.g1_mul(0, a) is None


def test_native_g2_ops_vs_host():
    a = H.ec_scalar_mul(H.G2_FIELD, 777, H.G2_GEN)
    b = H.ec_scalar_mul(H.G2_FIELD, 31, H.G2_GEN)
    assert NV.g2_add(a, b) == H.ec_add(H.G2_FIELD, a, b)
    assert NV.g2_add(a, a) == H.ec_add(H.G2_FIELD, a, a)
    k = rng.randrange(1 << 200)
    assert NV.g2_mul(k, H.G2_GEN) == H.ec_scalar_mul(H.G2_FIELD, k, H.G2_GEN)


def test_native_miller_matches_python():
    p = H.ec_scalar_mul(H.G1_FIELD, 5, H.G1_GEN)
    q = H.ec_scalar_mul(H.G2_FIELD, 7, H.G2_GEN)
    assert NV.miller_loop(p, q) == PR.miller_loop(p, q)


def test_native_pairing_bilinear():
    """e(aP, bQ) == e(P, Q)^(ab) via the native path end to end."""
    a, b = 6, 11
    e1 = NV.fp12_pow(NV.miller_loop(
        H.ec_scalar_mul(H.G1_FIELD, a, H.G1_GEN),
        H.ec_scalar_mul(H.G2_FIELD, b, H.G2_GEN)), PR.FINAL_EXP)
    base = NV.fp12_pow(NV.miller_loop(H.G1_GEN, H.G2_GEN), PR.FINAL_EXP)
    assert e1 == PR.fp12_pow(base, a * b)
    assert not PR.fp12_is_one(base)


def test_native_fp12_pow_matches_python():
    m = PR.miller_loop(H.G1_GEN, H.G2_GEN)
    e = rng.randrange(1 << 300)
    assert NV.fp12_pow(m, e) == PR.fp12_pow(m, e)

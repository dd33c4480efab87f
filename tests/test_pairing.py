"""Pairing sanity: field tower, bilinearity, non-degeneracy.

Oracle checks mirror the role of the reference's constantine pairing
(`groth16/bn128/curves.nim:218-221`) in the verifier equation."""

import random

from groth16_tpu.utils import hostmath as H
from groth16_tpu.utils import pairing as PR

rng = random.Random(3)


def test_fp12_field_ops():
    def rand_fp12():
        return tuple((rng.randrange(H.P), rng.randrange(H.P)) for _ in range(6))

    a, b, c = rand_fp12(), rand_fp12(), rand_fp12()
    # ring axioms spot-checks
    assert PR.fp12_mul(a, b) == PR.fp12_mul(b, a)
    assert PR.fp12_mul(a, PR.fp12_mul(b, c)) == PR.fp12_mul(PR.fp12_mul(a, b), c)
    assert PR.fp12_mul(a, PR.FP12_ONE) == a
    # inversion
    ai = PR.fp12_inv(a)
    assert PR.fp12_mul(a, ai) == PR.FP12_ONE
    # pow
    assert PR.fp12_pow(a, 5) == PR.fp12_mul(a, PR.fp12_mul(a, PR.fp12_mul(a, PR.fp12_mul(a, a))))


def test_untwisted_g2_on_fp12_curve():
    # untwist(G2 gen) must satisfy y^2 = x^3 + 3 over Fp12
    x, y = PR.untwist(H.G2_GEN)
    lhs = PR.fp12_mul(y, y)
    rhs = PR.fp12_add(PR.fp12_mul(PR.fp12_mul(x, x), x), PR.fp12_embed_fp(3))
    assert lhs == rhs


def test_pairing_bilinear():
    a, b = 13, 29
    e = PR.pairing(H.G1_GEN, H.G2_GEN)
    assert not PR.fp12_is_one(e)  # non-degenerate
    # e(aP, bQ) == e(P, Q)^(ab)
    lhs = PR.pairing(H.g1_mul(a), H.g2_mul(b))
    assert lhs == PR.fp12_pow(e, a * b)
    # e(P+P', Q) == e(P,Q) e(P',Q)
    p2 = H.g1_mul(7)
    lhs = PR.pairing(H.g1_add(H.G1_GEN, p2), H.G2_GEN)
    assert lhs == PR.fp12_mul(e, PR.pairing(p2, H.G2_GEN))


def test_pairing_order():
    # e(P,Q)^r == 1 (image lies in the r-torsion of Fp12*)
    e = PR.pairing(H.g1_mul(3), H.g2_mul(5))
    assert PR.fp12_is_one(PR.fp12_pow(e, H.R))


def test_pairing_infinity():
    assert PR.fp12_is_one(PR.pairing(None, H.G2_GEN))
    assert PR.fp12_is_one(PR.pairing(H.G1_GEN, None))

"""Golden tests for the vectorized G1/G2 projective kernels vs the host oracle.

Covers the complete-addition edge cases (P+P, P+(-P), inf+P) that the
reference handles via branches (`groth16/bn128/curves.nim:136-175`) and that
our branchless RCB15 formulas must absorb."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy on XLA:CPU (see pyproject.toml)

from groth16_tpu.ops import curve as C
from groth16_tpu.ops import field as F
from groth16_tpu.ops.limbs import ints_to_limbs
from groth16_tpu.utils import hostmath as H

rng = random.Random(99)


def host_rand_points(cv, n):
    """Random small-multiple points of the generator (host)."""
    gen = H.G1_GEN if cv.name == "G1" else H.G2_GEN
    fo = H.G1_FIELD if cv.name == "G1" else H.G2_FIELD
    return [H.ec_scalar_mul(fo, rng.randrange(1, 1 << 64), gen) for _ in range(n)]


def fops(cv):
    return H.G1_FIELD if cv.name == "G1" else H.G2_FIELD


@pytest.mark.parametrize("cv", [C.G1, C.G2], ids=["G1", "G2"])
class TestCurve:
    def test_affine_roundtrip_and_on_curve(self, cv):
        pts = host_rand_points(cv, 5) + [None]
        P = C.points_from_host(cv, pts)
        assert bool(np.all(np.asarray(C.is_on_curve(cv, P))))
        assert C.points_to_host(cv, P) == pts
        # infinity flag
        assert list(np.asarray(C.point_is_inf(cv, P))) == [False] * 5 + [True]

    def test_add_edge_cases(self, cv):
        fo = fops(cv)
        pts = host_rand_points(cv, 4)
        p = pts[0]
        # pairs: generic, P+P, P+(-P), inf+P, P+inf, inf+inf
        lhs = [pts[0], p, p, None, pts[1], None]
        rhs = [pts[2], p, H.ec_neg(fo, p), pts[3], None, None]
        want = [H.ec_add(fo, a, b) for a, b in zip(lhs, rhs)]
        got = C.points_to_host(
            cv, C.point_add(cv, C.points_from_host(cv, lhs), C.points_from_host(cv, rhs))
        )
        assert got == want

    def test_double_and_neg(self, cv):
        fo = fops(cv)
        pts = host_rand_points(cv, 3) + [None]
        P = C.points_from_host(cv, pts)
        assert C.points_to_host(cv, C.point_double(cv, P)) == [H.ec_double(fo, p) for p in pts]
        assert C.points_to_host(cv, C.point_neg(cv, P)) == [H.ec_neg(fo, p) for p in pts]

    def test_scalar_mul(self, cv):
        fo = fops(cv)
        pts = host_rand_points(cv, 3) + [host_rand_points(cv, 1)[0]]
        ks = [rng.randrange(F.P_FR) for _ in range(3)] + [0]
        P = C.points_from_host(cv, pts)
        kdev = jnp.asarray(ints_to_limbs(ks))
        got = C.points_to_host(cv, C.scalar_mul(cv, kdev, P))
        assert got == [H.ec_scalar_mul(fo, k, p) for k, p in zip(ks, pts)]

    def test_tree_sum(self, cv):
        fo = fops(cv)
        pts = host_rand_points(cv, 7) + [None]
        P = C.points_from_host(cv, pts)
        got = C.points_to_host(cv, tuple(c[None] for c in C.tree_sum(cv, P)))[0]
        want = None
        for p in pts:
            want = H.ec_add(fo, want, p)
        assert got == want

    def test_generator_matches_reference(self, cv):
        # generators hardcoded at reference curves.nim:112-124
        gen = C.points_to_host(cv, C.gen_point(cv, (1,)))[0]
        assert gen == (H.G1_GEN if cv.name == "G1" else H.G2_GEN)
        fo = fops(cv)
        assert H.ec_is_on_curve(fo, gen)


@pytest.mark.parametrize("cv", [C.G1, C.G2], ids=["G1", "G2"])
def test_mixed_add_matches_full(cv):
    """RCB15 algorithm 8 (mixed, Z2=1) vs algorithm 7 on the same inputs,
    covering P at infinity, P == Q and P == -Q."""
    import jax

    fo = fops(cv)
    q = host_rand_points(cv, 1)[0]
    cases = [host_rand_points(cv, 1)[0], None, q, H.ec_neg(fo, q)]
    P = C.points_from_host(cv, cases)
    Q = C.points_from_host(cv, [q] * len(cases))
    qx, qy = C.to_affine(cv, Q)
    K = cv.fops
    got = jax.jit(lambda p, a, b: C.rcb_add_mixed(K, p, (a, b), jnp.asarray(cv.b3_limbs)))(P, qx, qy)
    want = C.point_add(cv, P, Q)
    assert C.points_to_host(cv, got) == C.points_to_host(cv, want)

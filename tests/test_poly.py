"""Golden tests for dense polynomial ops vs Python-int oracles (reference
behavior: groth16/math/poly.nim)."""

import random

import numpy as np
import jax.numpy as jnp

from groth16_tpu.ops import field as F
from groth16_tpu.ops import ntt as NT
from groth16_tpu.ops import poly as P
from groth16_tpu.ops.field import FR

rng = random.Random(5)
R = FR.modulus


def rand_poly(n):
    return [rng.randrange(R) for _ in range(n)]


def host_mul(a, b):
    out = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            out[i + j] = (out[i + j] + x * y) % R
    return out


def test_add_sub_scale_eval():
    a, b = rand_poly(7), rand_poly(4)
    da, db = P.poly_from_ints(a), P.poly_from_ints(b)
    bp = b + [0] * 3
    assert P.poly_to_ints(P.poly_add(da, db)) == [(x + y) % R for x, y in zip(a, bp)]
    assert P.poly_to_ints(P.poly_sub(da, db)) == [(x - y) % R for x, y in zip(a, bp)]
    s = rng.randrange(R)
    assert P.poly_to_ints(P.poly_scale(jnp.asarray(FR.to_mont_limbs(s)), da)) == [x * s % R for x in a]
    x0 = rng.randrange(R)
    got = FR.from_mont_limbs(np.asarray(P.poly_eval_at(da, jnp.asarray(FR.to_mont_limbs(x0)))))
    assert got == sum(c * pow(x0, i, R) for i, c in enumerate(a)) % R


def test_mul_naive_and_fft():
    a, b = rand_poly(9), rand_poly(6)
    da, db = P.poly_from_ints(a), P.poly_from_ints(b)
    want = host_mul(a, b)
    assert P.poly_to_ints(P.poly_mul_naive(da, db)) == want
    assert P.poly_to_ints(P.poly_mul_fft(da, db)) == want
    assert P.poly_to_ints(P.poly_mul(da, db)) == want


def test_divmod_vanishing():
    # p = q * (x^N - 1) + r  roundtrip, several shapes
    for n, N in [(17, 8), (16, 8), (8, 8), (5, 8), (24, 8), (33, 16)]:
        p = rand_poly(n)
        q, r = P.poly_divmod_vanishing(P.poly_from_ints(p), N)
        qi, ri = P.poly_to_ints(q), P.poly_to_ints(r)
        # reconstruct q*(x^N-1)+r
        z = [0] * N + [0]
        z[0], z[N] = R - 1, 1
        recon = host_mul(qi, z) if len(qi) else []
        recon = recon + [0] * (max(n, N) - len(recon))
        for i, c in enumerate(ri):
            recon[i] = (recon[i] + c) % R
        assert recon[:n] == p and all(c == 0 for c in recon[n:])


def test_lagrange_eval():
    dom = NT.Domain(3)
    zeta = rng.randrange(R)
    evals = P.lagrange_evals_at(dom, zeta)
    # oracle: L_k via explicit basis polynomial interpolation
    pts = dom.enumerate()
    for k in [0, 3, 7]:
        num, den = 1, 1
        for j, xj in enumerate(pts):
            if j != k:
                num = num * (zeta - xj) % R
                den = den * (pts[k] - xj) % R
        want = num * pow(den, -1, R) % R
        assert evals[k] == want
        assert P.lagrange_eval_off_domain(dom, k, zeta) == want


def test_vanishing_poly():
    vp = P.poly_to_ints(P.vanishing_poly(8))
    assert vp[0] == R - 1 and vp[8] == 1 and all(c == 0 for c in vp[1:8])

"""Golden tests for domain construction and the iterative NTT vs a Python-int
DFT oracle; pins the 2^28-subgroup generator against the reference constant
(`groth16/math/domain.nim:26`)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from groth16_tpu.ops import field as F
from groth16_tpu.ops import ntt as N
from groth16_tpu.ops.field import FR

rng = random.Random(7)
R = FR.modulus


def naive_dft(xs, g):
    n = len(xs)
    return [sum(xs[j] * pow(g, i * j, R) for j in range(n)) % R for i in range(n)]


def to_dev(xs):
    return jnp.asarray(FR.to_mont_array(xs))


def from_dev(a):
    return FR.from_mont_array(np.asarray(a))


def test_gen28_matches_reference():
    # constant hardcoded at reference groth16/math/domain.nim:26
    assert N.GEN28 == 0x2A3C09F0A58A7E8500E0A7EB8EF62ABC402D111E41112ED49BD61B6E725B19F0
    assert pow(N.GEN28, 1 << 28, R) == 1
    assert pow(N.GEN28, 1 << 27, R) != 1


@pytest.mark.parametrize("log2n", [0, 1, 3, 6])
def test_forward_matches_naive_dft(log2n):
    dom = N.Domain(log2n)
    assert pow(dom.gen, dom.size, R) == 1
    xs = [rng.randrange(R) for _ in range(dom.size)]
    got = from_dev(N.forward_ntt(dom, to_dev(xs)))
    assert got == naive_dft(xs, dom.gen)


@pytest.mark.parametrize("log2n", [1, 4, 8])
def test_roundtrip(log2n):
    dom = N.Domain(log2n)
    xs = [rng.randrange(R) for _ in range(dom.size)]
    dev = to_dev(xs)
    assert from_dev(N.inverse_ntt(dom, N.forward_ntt(dom, dev))) == xs
    assert from_dev(N.forward_ntt(dom, N.inverse_ntt(dom, dev))) == xs


def test_forward_is_domain_evaluation():
    # forward NTT == evaluate the polynomial at [g^0..g^(N-1)] (ntt.nim:55-77)
    dom = N.Domain(4)
    xs = [rng.randrange(R) for _ in range(dom.size)]
    got = from_dev(N.forward_ntt(dom, to_dev(xs)))
    pts = dom.enumerate()
    want = [sum(c * pow(x, j, R) for j, c in enumerate(xs)) % R for x in pts]
    assert got == want


def test_extend_forward_ntt():
    dom = N.Domain(3)
    big = N.Domain(5)
    xs = [rng.randrange(R) for _ in range(dom.size)]
    got = from_dev(N.extend_forward_ntt(dom, to_dev(xs), 5))
    assert got == naive_dft(xs + [0] * (big.size - dom.size), big.gen)


def test_shift_eval_domain():
    # values on domain -> values on eta-shifted coset (prover.nim:109-113)
    dom = N.Domain(3)
    eta = N.Domain(4).gen  # generator of the double domain, as the prover uses
    coeffs = [rng.randrange(R) for _ in range(dom.size)]
    values = naive_dft(coeffs, dom.gen)
    eta_mont = jnp.asarray(FR.to_mont_limbs(eta))
    got = from_dev(N.shift_eval_domain(dom, to_dev(values), eta_mont))
    want = [
        sum(c * pow(eta * pow(dom.gen, i, R) % R, j, R) for j, c in enumerate(coeffs)) % R
        for i in range(dom.size)
    ]
    assert got == want


def test_mul_by_powers():
    dom = N.Domain(3)
    eta = rng.randrange(R)
    xs = [rng.randrange(R) for _ in range(dom.size)]
    got = from_dev(N.mul_by_powers(dom, to_dev(xs), jnp.asarray(FR.to_mont_limbs(eta))))
    assert got == [x * pow(eta, i, R) % R for i, x in enumerate(xs)]

"""Golden tests for the vectorized Montgomery field kernels vs Python ints.

Also pins the Montgomery constants against the values hardcoded in the
reference (`groth16/bn128/fields.nim:36-50`, `groth16/bn128/io.nim:87-92`).
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from groth16_tpu.ops import field as F
from groth16_tpu.ops.limbs import (
    N_LIMBS, int_to_limbs, limbs_to_int, ints_to_limbs, limbs_to_ints,
    bytes_le_to_limbs, limbs_to_bytes_le,
)

rng = random.Random(1234)


def rand_ints(fp, n):
    return [rng.randrange(fp.modulus) for _ in range(n)]


def to_dev_mont(fp, xs):
    return jnp.asarray(fp.to_mont_array(xs))


@pytest.mark.parametrize("fp", [F.FP, F.FR], ids=["Fp", "Fr"])
class TestField:
    def test_mont_constants_match_reference(self, fp):
        # reference io.nim:87-92 (R = 2^256 mod p and its inverse)
        ref = {
            F.P_FP: (0x0E0A77C19A07DF2F666EA36F7879462C0A78EB28F5C70B3DD35D438DC58F0D9D,
                     0x2E67157159E5C639CF63E9CFB74492D9EB2022850278EDF8ED84884A014AFA37),
            F.P_FR: (0x0E0A77C19A07DF2F666EA36F7879462E36FC76959F60CD29AC96341C4FFFFFFB,
                     0x15EBF95182C5551CC8260DE4AEB85D5D090EF5A9E111EC87DC5BA0056DB1194E),
        }[fp.modulus]
        assert fp.mont_r == ref[0]
        assert fp.mont_r_inv == ref[1]
        # -1 constants from fields.nim:49-50
        assert fp.modulus - 1 in (
            0x30644E72E131A029B85045B68181585D97816A916871CA8D3C208C16D87CFD46,
            0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593F0000000,
        )

    def test_limb_roundtrip(self, fp):
        xs = rand_ints(fp, 17)
        assert limbs_to_ints(ints_to_limbs(xs)) == xs
        raw = limbs_to_bytes_le(ints_to_limbs(xs))
        assert limbs_to_ints(bytes_le_to_limbs(raw)) == xs

    def test_mont_roundtrip(self, fp):
        xs = rand_ints(fp, 33) + [0, 1, fp.modulus - 1]
        dev = to_dev_mont(fp, xs)
        back = [fp.from_mont_limbs(np.asarray(dev[i])) for i in range(len(xs))]
        assert back == xs
        # device-side to_mont/from_mont agree
        std = jnp.asarray(ints_to_limbs(xs))
        assert np.array_equal(np.asarray(F.to_mont(fp, std)), np.asarray(dev))
        assert np.array_equal(np.asarray(F.from_mont(fp, dev)), np.asarray(std))

    def test_mul(self, fp):
        n = 64
        xs, ys = rand_ints(fp, n), rand_ints(fp, n)
        xs += [0, 1, fp.modulus - 1, fp.modulus - 1]
        ys += [fp.modulus - 1, 1, fp.modulus - 1, 0]
        got = F.mont_mul(fp, to_dev_mont(fp, xs), to_dev_mont(fp, ys))
        want = [(x * y) % fp.modulus for x, y in zip(xs, ys)]
        assert fp.from_mont_array(np.asarray(got)) == want

    def test_add_sub_neg(self, fp):
        n = 64
        xs, ys = rand_ints(fp, n), rand_ints(fp, n)
        xs += [0, fp.modulus - 1]
        ys += [0, fp.modulus - 1]
        a, b = to_dev_mont(fp, xs), to_dev_mont(fp, ys)
        assert fp.from_mont_array(np.asarray(F.add_mod(fp, a, b))) == [(x + y) % fp.modulus for x, y in zip(xs, ys)]
        assert fp.from_mont_array(np.asarray(F.sub_mod(fp, a, b))) == [(x - y) % fp.modulus for x, y in zip(xs, ys)]
        assert fp.from_mont_array(np.asarray(F.neg_mod(fp, a))) == [(-x) % fp.modulus for x in xs]

    def test_pow_inv(self, fp):
        xs = rand_ints(fp, 8) + [1, fp.modulus - 1]
        a = to_dev_mont(fp, xs)
        e = 0xDEADBEEFCAFE1234567
        got = fp.from_mont_array(np.asarray(F.pow_mod(fp, a, e)))
        assert got == [pow(x, e, fp.modulus) for x in xs]
        inv = fp.from_mont_array(np.asarray(F.inv_mod(fp, a)))
        assert inv == [pow(x, -1, fp.modulus) for x in xs]

    def test_batch_inverse(self, fp):
        xs = [x for x in rand_ints(fp, 37) if x != 0]
        got = fp.from_mont_array(np.asarray(F.batch_inverse(fp, to_dev_mont(fp, xs))))
        assert got == [pow(x, -1, fp.modulus) for x in xs]

    def test_mont_reduce_wide(self, fp):
        # random double-width values < p * R
        vals = [rng.randrange(fp.modulus * F.R_MONT) for _ in range(16)]
        t = jnp.asarray(np.stack([int_to_limbs(v, 32) for v in vals]))
        got = limbs_to_ints(np.asarray(F.mont_reduce_wide(fp, t)))
        want = [(v * fp.mont_r_inv) % fp.modulus for v in vals]
        assert got == want

    def test_mul_small_and_powers(self, fp):
        xs = rand_ints(fp, 9)
        a = to_dev_mont(fp, xs)
        for k in (1, 2, 3, 8, 9):
            got = fp.from_mont_array(np.asarray(F.mul_small(fp, a, k)))
            assert got == [(x * k) % fp.modulus for x in xs]
        base = rng.randrange(fp.modulus)
        for n in (1, 2, 3, 7, 16, 33):
            got = fp.from_mont_array(np.asarray(F.powers(fp, jnp.asarray(fp.to_mont_limbs(base)), n)))
            assert got == [pow(base, i, fp.modulus) for i in range(n)]

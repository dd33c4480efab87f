"""In-kernel field-op bodies (`kernels._KFp` / `_KFp2`) vs integer host math.

The _KFp class is written for Pallas but is plain jnp underneath, so its
Montgomery arithmetic — including the lazy-carry REDC (`_relax2`, two
carry-save passes instead of full Kogge-Stone where the consumer is a
mul against a canonical constant) — is verified here on CPU against an
independent big-int oracle, without compiling any kernel.  Reference role:
constantine's field-arithmetic self-tests (SURVEY.md §2.2).
"""

import numpy as np
import jax.numpy as jnp

from groth16_tpu.ops import kernels as KN
from groth16_tpu.ops.field import FP
from groth16_tpu.ops.limbs import N_LIMBS, int_to_limbs, limbs_to_int

P = FP.modulus
R = 1 << 256
R_INV = pow(R, -1, P)


def _kfp(blk):
    tile = lambda v: jnp.asarray(
        np.repeat(np.asarray(v, np.uint32)[:, None], blk, axis=1))
    return KN._KFp(tile(FP.p_limbs), tile(FP.pprime_limbs), tile(FP.pc_limbs))


def _cols(vals):
    """ints -> limb-major uint32[16, blk]."""
    return jnp.asarray(
        np.stack([int_to_limbs(v) for v in vals], axis=1).astype(np.uint32))


def _ints(cols):
    a = np.asarray(cols)
    return [limbs_to_int(a[:, j]) for j in range(a.shape[1])]


def test_kfp_mul_add_sub_match_host_oracle():
    rng = np.random.default_rng(5)
    blk = 128
    # adversarial values: near-p, near-0, all-ones limbs, random
    vals_a = [P - 1, P - 2, 0, 1, (1 << 254) % P, int("f" * 63, 16) % P]
    vals_b = [P - 1, 1, P - 1, 0, (1 << 253) % P, 12345]
    while len(vals_a) < blk:
        vals_a.append(int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % P)
        vals_b.append(int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % P)
    a, b = _cols(vals_a), _cols(vals_b)
    f = _kfp(blk)

    got_mul = _ints(f.mul(a, b))
    got_cios = _ints(f.mul_cios(a, b))
    got_add = _ints(f.add(a, b))
    got_sub = _ints(f.sub(a, b))
    for x, y, gm, gc, ga, gs in zip(vals_a, vals_b, got_mul, got_cios,
                                    got_add, got_sub):
        assert gm == (x * y * R_INV) % P  # Montgomery product
        assert gc == (x * y * R_INV) % P  # interleaved variant
        assert ga == (x + y) % P
        assert gs == (x - y) % P


def test_kfp_mul_worst_case_carries():
    """Products whose REDC intermediates maximize carry chains: a = b near
    sqrt-of-R multiples and limb patterns 0xFFFF."""
    blk = 128
    base = [(1 << 128) - 1, ((1 << 16) - 1) * sum(1 << (16 * i) for i in range(16)) % P]
    vals = (base * blk)[:blk]
    a = _cols(vals)
    f = _kfp(blk)
    got = _ints(f.mul(a, a))
    for x, g in zip(vals, got):
        assert g == (x * x * R_INV) % P

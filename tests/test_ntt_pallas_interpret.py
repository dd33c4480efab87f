"""Hermetic (CPU, Pallas-interpret) validation of the four-step NTT kernel
against the jnp-stage oracle — the correctness pin that does not need a
chip; tests/test_ntt_tpu.py re-pins the same equalities on real TPU.

Inputs are canonical (< r): bit-exactness between implementations is only
defined for canonical residues, and all in-protocol NTT inputs are
canonical.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

pytestmark = pytest.mark.slow

os.environ["GROTH16_TPU_NTT_INTERPRET"] = "1"
os.environ.setdefault("GROTH16_TPU_NTT_PALLAS", "1")


def _rand_fr(n, seed):
    rng = np.random.default_rng(seed)
    v = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    v[:, -1] &= 0x1FFF  # < 2^253 < r
    return jnp.asarray(v)


@pytest.mark.parametrize("lg", [10, 15])
def test_forward_and_inverse_match_oracle_interpret(lg):
    """lg=10: all-phase-2 inner transforms (T=32).  lg=15: T=256 inner
    transforms with a span-128 phase-1 stage — the tile-sliced fori_loop
    path (incl. the DIT small-operand twiddle mul) that lg<=13 never
    exercises."""
    from groth16_tpu.ops import field as F
    from groth16_tpu.ops import ntt as NT
    from groth16_tpu.ops import ntt_pallas as NP
    from groth16_tpu.ops.field import FR
    from groth16_tpu.ops.limbs import int_to_limbs

    dom = NT.Domain(lg)
    xs = _rand_fr(dom.size, lg)
    fwd = NP.forward_ntt(dom, xs)
    ref = NT._dif_stages(xs, jnp.asarray(dom.twiddles),
                         jnp.asarray(dom.bitrev), lg)
    assert np.array_equal(np.asarray(fwd), np.asarray(ref))

    inv = NP.inverse_ntt(dom, xs)
    iref = NT._dif_stages(xs, jnp.asarray(dom.inv_twiddles),
                          jnp.asarray(dom.bitrev), lg)
    ninv = jnp.asarray(int_to_limbs(dom.size_inv * F.R_MONT % FR.modulus))
    iref = F.mont_mul(FR, iref, ninv[None, :])
    assert np.array_equal(np.asarray(inv), np.asarray(iref))

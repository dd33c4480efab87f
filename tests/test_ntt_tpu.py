"""Pallas four-step NTT vs the jnp-stage oracle — runs only on a TPU backend
(the CPU suite skips; run directly on the chip:
`PYTHONPATH=.:$PYTHONPATH python tests/test_ntt_tpu.py`).

Pins ops/ntt_pallas.py bit-identical to ops/ntt.py's `_dif_stages` path
(which in turn pins the reference recursion, groth16/math/ntt.nim:17-50)
in both directions, plus the full coset shift-eval pipeline."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

os.environ.setdefault("GROTH16_TPU_NTT_PALLAS", "1")  # opt in pre-validation


def _on_tpu():
    from groth16_tpu.ops import kernels as KN
    return KN._on_tpu()


def _rand_fr(n, seed=3):
    rng = np.random.default_rng(seed)
    v = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    # CANONICAL (< r) elements: bit-exactness between implementations is
    # only defined for canonical residues — non-canonical inputs propagate
    # through the two normalization pipelines as different (congruent)
    # representatives.  All in-protocol NTT inputs are canonical.
    v[:, -1] &= 0x1FFF
    return jnp.asarray(v)


def _oracle_fwd(dom, xs):
    from groth16_tpu.ops import ntt as NT
    return NT._dif_stages(xs, jnp.asarray(dom.twiddles),
                          jnp.asarray(dom.bitrev), dom.log2_size)


def _oracle_inv(dom, xs):
    from groth16_tpu.ops import field as F
    from groth16_tpu.ops import ntt as NT
    from groth16_tpu.ops.field import FR
    from groth16_tpu.ops.limbs import int_to_limbs
    out = NT._dif_stages(xs, jnp.asarray(dom.inv_twiddles),
                         jnp.asarray(dom.bitrev), dom.log2_size)
    ninv = jnp.asarray(int_to_limbs(dom.size_inv * F.R_MONT % FR.modulus))
    return F.mont_mul(FR, out, ninv[None, :])


@pytest.mark.skipif(not _on_tpu(), reason="needs a TPU backend")
@pytest.mark.parametrize("log2n", [10, 12, 13])
def test_ntt_pallas_matches_oracle(log2n):
    from groth16_tpu.ops import ntt as NT
    from groth16_tpu.ops import ntt_pallas as NP

    assert NP.available(log2n)
    dom = NT.Domain(log2n)
    xs = _rand_fr(dom.size)
    fwd = NP.forward_ntt(dom, xs)
    assert np.array_equal(np.asarray(fwd), np.asarray(_oracle_fwd(dom, xs)))
    inv = NP.inverse_ntt(dom, xs)
    assert np.array_equal(np.asarray(inv), np.asarray(_oracle_inv(dom, xs)))


@pytest.mark.skipif(not _on_tpu(), reason="needs a TPU backend")
def test_shift_eval_roundtrip():
    """shift_eval (dispatching to the Pallas path) and its inverse compose
    to identity, and forward(inverse(x)) == x."""
    from groth16_tpu.ops import ntt as NT

    log2n = 12
    dom = NT.Domain(log2n)
    xs = _rand_fr(dom.size, seed=9)
    back = NT.forward_ntt(dom, NT.inverse_ntt(dom, xs))
    assert np.array_equal(np.asarray(back), np.asarray(xs))


if __name__ == "__main__":
    import os
    import sys
    os.environ.setdefault("GROTH16_TPU_NTT_PALLAS", "1")
    sizes = [int(a) for a in sys.argv[1:]] or [10, 12, 13]
    for lg in sizes:
        test_ntt_pallas_matches_oracle(lg)
        print(f"NTT pallas == oracle @ 2^{lg} OK", flush=True)
    test_shift_eval_roundtrip()
    print("shift-eval roundtrip OK", flush=True)

"""Pallas kernel vs jnp-path equivalence — runs only on a TPU backend
(the CPU suite skips; conftest forces jax_platforms=cpu, so these execute
when the file is run outside pytest or pytest is invoked with a TPU config,
e.g. `python tests/test_kernels_tpu.py` on the real chip)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _on_tpu():
    from groth16_tpu.ops import kernels as KN
    return KN._on_tpu()


@pytest.mark.skipif(not _on_tpu(), reason="needs a TPU backend")
@pytest.mark.parametrize("cv_name", ["G1", "G2"])
@pytest.mark.parametrize("n", [7, 512, 1000])
def test_kernel_matches_jnp(cv_name, n):
    from groth16_tpu.ops import curve as C, kernels as KN

    cv = C.G1 if cv_name == "G1" else C.G2
    rng = np.random.default_rng(0)
    ks = rng.integers(1, 1 << 31, size=n, dtype=np.uint32)
    scal = np.zeros((n, 16), np.uint32)
    scal[:, 0] = ks & 0xFFFF
    scal[:, 1] = ks >> 16

    KN._DISABLE = True
    try:
        P = C.scalar_mul(cv, jnp.asarray(scal), C.gen_point(cv, (n,)), 32)
        Q = C.point_double(cv, P)
        ref_add = tuple(np.asarray(x) for x in C.point_add(cv, P, Q))
        ref_dbl = tuple(np.asarray(x) for x in C.point_double(cv, Q))
    finally:
        KN._DISABLE = False

    got_add = tuple(np.asarray(x) for x in KN.point_add(cv, P, Q))
    got_dbl = tuple(np.asarray(x) for x in KN.point_double(cv, Q))
    for a, b in zip(got_add, ref_add):
        assert np.array_equal(a, b)
    for a, b in zip(got_dbl, ref_dbl):
        assert np.array_equal(a, b)


if __name__ == "__main__":
    test_kernel_matches_jnp("G1", 512)
    test_kernel_matches_jnp("G2", 512)
    print("kernel equivalence OK")

"""Device (vectorized) fake-setup pipeline vs the host oracle.

The large-circuit setup path computes Lagrange taus with one iNTT, column
taus with a segment-sum, and points with windowed fixed-base ladders
(`protocol/fake_setup.py`); this pins it bit-identical to the per-element
host path (the reference semantics, `groth16/fake_setup.nim:201-326`).

NOTE (pyproject `addopts = -m 'not slow'`): running this file directly
deselects everything; use `pytest tests/test_fake_setup_device.py -m ''`.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _toxic():
    from groth16_tpu.protocol.fake_setup import ToxicWaste
    return ToxicWaste(alpha=1235, beta=781, gamma=4243, delta=9999, tau=106)


def test_lagrange_taus_device_matches_host():
    from groth16_tpu.ops import ntt as NT
    from groth16_tpu.ops.field import FR
    import groth16_tpu.protocol.fake_setup as FS

    dom = NT.Domain(4)
    tau = 987654321987654321
    host = FS._lagrange_taus(dom, tau)
    dev = [FR.from_mont_limbs(r)
           for r in np.asarray(FS.lagrange_taus_device(dom, tau))]
    assert host == dev


@pytest.mark.parametrize("flavour_name", ["Snarkjs", "JensGroth"])
def test_device_setup_bit_identical_to_host(flavour_name, monkeypatch):
    import groth16_tpu.protocol.fake_setup as FS
    from groth16_tpu.models.circuits import synthetic_circuit
    from groth16_tpu.protocol.types import Flavour

    flavour = getattr(Flavour, flavour_name)
    toxic = _toxic()

    monkeypatch.setattr(FS, "_DEVICE_SETUP_MIN", 1)
    monkeypatch.delenv("GROTH16_TPU_HOST_SETUP", raising=False)
    zk_dev = FS.fake_circuit_setup(synthetic_circuit(5)[0], toxic, flavour)

    monkeypatch.setenv("GROTH16_TPU_HOST_SETUP", "1")
    zk_host = FS.fake_circuit_setup(synthetic_circuit(5)[0], toxic, flavour)

    for nm in ("points_a1", "points_b1", "points_b2", "points_c1", "points_h1"):
        a, b = getattr(zk_dev.ppoints, nm), getattr(zk_host.ppoints, nm)
        assert np.array_equal(a.x, b.x) and np.array_equal(a.y, b.y), nm
    a, b = zk_dev.vpoints.points_ic, zk_host.vpoints.points_ic
    assert np.array_equal(a.x, b.x) and np.array_equal(a.y, b.y)
    assert np.array_equal(zk_dev.coeffs.coeff, zk_host.coeffs.coeff)
    assert np.array_equal(zk_dev.coeffs.row, zk_host.coeffs.row)


def test_device_setup_proves_and_verifies():
    import groth16_tpu.protocol.fake_setup as FS
    from groth16_tpu.models.circuits import synthetic_circuit
    from groth16_tpu.protocol.prover import Mask, generate_proof_with_mask
    from groth16_tpu.protocol.types import Flavour, extract_vkey
    from groth16_tpu.protocol.verifier import verify_proof

    old = FS._DEVICE_SETUP_MIN
    FS._DEVICE_SETUP_MIN = 1
    try:
        r1cs, wtns = synthetic_circuit(5)
        zkey = FS.fake_circuit_setup(r1cs, _toxic(), Flavour.Snarkjs)
    finally:
        FS._DEVICE_SETUP_MIN = old
    prf = generate_proof_with_mask(zkey, wtns, Mask(3, 4))
    assert verify_proof(extract_vkey(zkey), prf)

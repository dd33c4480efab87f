"""The committed example artifacts (examples/product/) stay parseable,
provable, verifiable, and deterministic — the hermetic analog of the
reference's snarkjs e2e check (`groth16/example/prove.sh:58-59`)."""

import json
import os

import pytest

EX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                  "examples", "product")


@pytest.fixture(scope="module")
def artifacts():
    from groth16_tpu.files.witness import parse_witness
    from groth16_tpu.files.zkey import parse_zkey
    return parse_zkey(os.path.join(EX, "product.zkey")), \
        parse_witness(os.path.join(EX, "product.wtns"))


def test_r1cs_matches_circuit():
    from groth16_tpu.files.r1cs import parse_r1cs
    from groth16_tpu.models.circuits import product_circuit
    got = parse_r1cs(os.path.join(EX, "product.r1cs"))
    want, _ = product_circuit()
    assert got.cfg == want.cfg
    assert got.n_constr == want.n_constr
    assert got.constraints == want.constraints


def test_prove_verify_and_determinism(artifacts):
    from groth16_tpu.files.export_json import proof_json, public_io_json
    from groth16_tpu.protocol.prover import generate_proof_with_trivial_mask
    from groth16_tpu.protocol.types import extract_vkey
    from groth16_tpu.protocol.verifier import verify_proof

    zkey, wtns = artifacts
    proof = generate_proof_with_trivial_mask(zkey, wtns)
    assert verify_proof(extract_vkey(zkey), proof)

    with open(os.path.join(EX, "expected_proof.json")) as f:
        assert proof_json(proof) == json.load(f)
    with open(os.path.join(EX, "expected_public.json")) as f:
        assert public_io_json(proof) == json.load(f)


def test_testing_helpers_roundtrip():
    """The test-driver helpers (groth16_tpu/testing.py — the live-signature
    analog of the reference's `test_proof.nim:18-66`) drive parse -> prove
    -> verify end-to-end on the committed artifacts."""
    from groth16_tpu import testing as T
    from groth16_tpu.protocol.types import Flavour

    prf = T.test_prove_and_verify(
        os.path.join(EX, "product.zkey"), os.path.join(EX, "product.wtns"),
        verbose=False)
    assert prf.public_io[1] == 2023
    prf2 = T.test_fake_setup_and_verify(
        os.path.join(EX, "product.r1cs"), os.path.join(EX, "product.wtns"),
        Flavour.Snarkjs, verbose=False)
    assert prf2.public_io == prf.public_io

"""Test-driver helpers: parse → prove → verify roundtrips in one call.

The analog of the reference's `groth16/test_proof.nim` (`testProveAndVerify`
:18-35, `testFakeSetupAndVerify` :39-66) — except these track the live
prover signature (the reference's checked-in version calls a stale 2-arg
`generateProof` and no longer compiles, `test_proof.nim:26,58`).  Used by
`examples/product_example.py`-style drivers and handy from a REPL.
"""

from __future__ import annotations

import time

from .files.witness import parse_witness
from .files.zkey import parse_zkey
from .files.r1cs import parse_r1cs
from .protocol.prover import Proof, generate_proof
from .protocol.types import Flavour, extract_vkey
from .protocol.verifier import verify_proof
from .protocol.fake_setup import create_fake_circuit_setup


def test_prove_and_verify(zkey_file: str, wtns_file: str,
                          verbose: bool = True) -> Proof:
    """Parse a .zkey + .wtns, prove, verify; returns the proof.
    (Reference `testProveAndVerify`, test_proof.nim:18-35.)"""
    t0 = time.perf_counter()
    zkey = parse_zkey(zkey_file)
    wtns = parse_witness(wtns_file)
    t1 = time.perf_counter()
    proof = generate_proof(zkey, wtns)
    t2 = time.perf_counter()
    ok = verify_proof(extract_vkey(zkey), proof)
    t3 = time.perf_counter()
    if verbose:
        print(f"parse {t1 - t0:.3f}s  prove {t2 - t1:.3f}s  "
              f"verify {t3 - t2:.3f}s  ok={ok}")
    assert ok, "proof failed to verify"
    return proof


def test_fake_setup_and_verify(r1cs_file: str, wtns_file: str,
                               flavour: Flavour = Flavour.Snarkjs,
                               verbose: bool = True) -> Proof:
    """Parse a .r1cs + .wtns, run the fake trusted setup, prove, verify.
    (Reference `testFakeSetupAndVerify`, test_proof.nim:39-66.)"""
    t0 = time.perf_counter()
    r1cs = parse_r1cs(r1cs_file)
    wtns = parse_witness(wtns_file)
    zkey = create_fake_circuit_setup(r1cs, flavour)
    t1 = time.perf_counter()
    proof = generate_proof(zkey, wtns)
    t2 = time.perf_counter()
    ok = verify_proof(extract_vkey(zkey), proof)
    t3 = time.perf_counter()
    if verbose:
        print(f"setup {t1 - t0:.3f}s  prove {t2 - t1:.3f}s  "
              f"verify {t3 - t2:.3f}s  flavour={flavour.name}  ok={ok}")
    assert ok, "proof failed to verify"
    return proof

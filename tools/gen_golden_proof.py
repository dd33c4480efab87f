"""Generate the deterministic golden proof JSON literal for
tests/test_snarkjs_golden.py (fixed toxic waste, trivial mask)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

from groth16_tpu.files.export_json import proof_json
from groth16_tpu.models.circuits import product_circuit
from groth16_tpu.protocol.fake_setup import ToxicWaste, fake_circuit_setup
from groth16_tpu.protocol.prover import Mask, generate_proof_with_mask
from groth16_tpu.protocol.types import Flavour, extract_vkey
from groth16_tpu.protocol.verifier import verify_proof

r1cs, wtns = product_circuit()
zkey = fake_circuit_setup(
    r1cs, ToxicWaste(alpha=1235, beta=781, gamma=4243, delta=9999, tau=106),
    Flavour.Snarkjs)
prf = generate_proof_with_mask(zkey, wtns, Mask(r=0, s=0))
assert verify_proof(extract_vkey(zkey), prf)
print(json.dumps(proof_json(prf), indent=1))

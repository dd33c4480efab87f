"""Regenerate the committed example artifacts in examples/product/.

The reference ships an e2e example (`groth16/example/{product.circom,
prove.sh, example.nim}`) whose build artifacts are gitignored; this repo
instead COMMITS the tiny binary artifacts so users (and tests) always have
real .r1cs/.wtns/.zkey files and a known-good proof without circom/snarkjs
installed.  Deterministic: fixed toxic waste, trivial mask.

Run from the repo root:  python tools/gen_example_artifacts.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "examples", "product")


def main():
    from groth16_tpu.files.export_json import export_proof, export_public_io
    from groth16_tpu.files.r1cs import write_r1cs
    from groth16_tpu.files.witness import write_witness
    from groth16_tpu.files.zkey import write_zkey
    from groth16_tpu.models.circuits import product_circuit
    from groth16_tpu.protocol.fake_setup import ToxicWaste, fake_circuit_setup
    from groth16_tpu.protocol.prover import generate_proof_with_trivial_mask
    from groth16_tpu.protocol.types import Flavour, extract_vkey
    from groth16_tpu.protocol.verifier import verify_proof
    from groth16_tpu.ops.limbs import limbs_to_ints

    os.makedirs(OUT, exist_ok=True)
    r1cs, wtns = product_circuit()
    toxic = ToxicWaste(alpha=123457, beta=7891011, gamma=4243444,
                       delta=999983, tau=106)
    zkey = fake_circuit_setup(r1cs, toxic, Flavour.Snarkjs)

    write_r1cs(os.path.join(OUT, "product.r1cs"), r1cs)
    write_witness(os.path.join(OUT, "product.wtns"), limbs_to_ints(wtns.values))
    write_zkey(os.path.join(OUT, "product.zkey"), zkey)

    proof = generate_proof_with_trivial_mask(zkey, wtns)
    assert verify_proof(extract_vkey(zkey), proof)
    export_proof(os.path.join(OUT, "expected_proof.json"), proof)
    export_public_io(os.path.join(OUT, "expected_public.json"), proof)
    print(f"wrote artifacts to {OUT}")


if __name__ == "__main__":
    main()

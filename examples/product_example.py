"""Library-API walkthrough (the analog of the reference's
groth16/example/example.nim -> test_proof.nim:18-35): parse artifact files,
prove, extract the vkey, verify, export snarkjs-shaped JSON.

Run from the repo root:  python examples/product_example.py
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from groth16_tpu import (  # noqa: E402  (the L6 API facade, groth16.nim analog)
    extract_vkey,
    generate_proof,
    parse_witness,
    parse_zkey,
    verify_proof,
)
from groth16_tpu.files.export_json import proof_json, public_io_json  # noqa: E402

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "product")


def main():
    zkey = parse_zkey(os.path.join(HERE, "product.zkey"))
    wtns = parse_witness(os.path.join(HERE, "product.wtns"))

    proof = generate_proof(zkey, wtns)          # random ZK mask
    print("public io:", proof.public_io)        # [1, 2023, 1022]

    vkey = extract_vkey(zkey)
    ok = verify_proof(vkey, proof)
    print("verification succeeded =", ok)
    assert ok

    out = os.path.join(tempfile.mkdtemp(), "proof.json")
    with open(out, "w") as f:
        json.dump(proof_json(proof), f, indent=1)
    print("snarkjs-shaped proof written to", out)
    print("public:", json.dumps(public_io_json(proof)))


if __name__ == "__main__":
    main()

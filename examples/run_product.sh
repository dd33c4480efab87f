#!/usr/bin/env bash
# End-to-end example: the CLI analog of the reference's
# groth16/example/prove.sh (which compiles product.circom with circom and
# cross-verifies with snarkjs).  circom/snarkjs are not required here: the
# committed artifacts in examples/product/ were produced by
# tools/gen_example_artifacts.py and their byte formats are pinned against
# hand-assembled snarkjs-format fixtures in tests/test_snarkjs_golden.py.
#
#   ./examples/run_product.sh [workdir]
set -euo pipefail

cd "$(dirname "$0")/.."
WORK="${1:-$(mktemp -d)}"
SRC=examples/product

# 1. fake trusted setup from the R1CS (reference: snarkjs groth16 setup),
#    writing a zkey; prove from the committed witness; verify; export JSON
python -m groth16_tpu --setup --prove --verify --time \
    -r "$SRC/product.r1cs" -w "$SRC/product.wtns" \
    --write-zkey "$WORK/product.zkey" \
    -o "$WORK/proof.json" -i "$WORK/public.json"

# 2. prove again from the freshly written zkey file (parse roundtrip)
python -m groth16_tpu --prove --verify --time \
    -z "$WORK/product.zkey" -w "$SRC/product.wtns" \
    -o "$WORK/proof2.json" -i "$WORK/public2.json"

# 3. the committed zkey + nomask prove must reproduce the committed proof
python -m groth16_tpu --prove --verify --nomask \
    -z "$SRC/product.zkey" -w "$SRC/product.wtns" \
    -o "$WORK/proof3.json"
python - "$WORK/proof3.json" "$SRC/expected_proof.json" <<'EOF'
import json, sys
a, b = (json.load(open(p)) for p in sys.argv[1:3])
assert a == b, "deterministic proof does not match the committed expected_proof.json"
print("proof matches expected_proof.json")
EOF

echo "example OK (artifacts in $WORK)"

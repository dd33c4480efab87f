"""groth16_tpu — a TPU-native Groth16 zk-SNARK proving framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of
`codex-storage/nim-groth16` (circom/snarkjs-compatible prover, verifier, fake
trusted setup and file I/O for the BN254 curve), re-designed for TPU:
limb-vector Montgomery field kernels, branchless complete-formula curve
arithmetic, iterative NTTs, sort/segmented-scan Pippenger MSM, and mesh
sharding for multi-chip scale.

Public API (the analog of the reference facade `groth16.nim:1-12`):

    from groth16_tpu import (
        parse_zkey, parse_witness, parse_r1cs,
        generate_proof, generate_proof_with_trivial_mask, Mask,
        extract_vkey, verify_proof,
        create_fake_circuit_setup, Flavour,
        export_proof, export_public_io, export_sage,
    )
"""

import os

# Persistent XLA compile cache: the bigint-limb graphs are heavy; caching
# makes every process after the first start fast.  NOTE: this environment
# pre-imports jax at interpreter startup, so env vars are ineffective —
# jax.config.update is the only reliable switch.  GROTH16_TPU_NO_COMPILE_CACHE
# opts out.  The cache is TPU-only: XLA:CPU AOT entries are machine-feature
# pinned (they fail to load on any other host — and on this one) and
# serializing some CPU executables segfaults outright, so on the CPU backend
# (tests, the multichip dryrun) the cache is pure overhead + crash risk.
def _tpu_plausible() -> bool:
    """True when a TPU backend is explicitly configured or detectable WITHOUT
    initializing the backend: an unset jax_platforms is treated as CPU (the
    plain pip-install case) unless libtpu is importable (a real TPU VM)."""
    try:
        import importlib.util
        import jax as _j

        plat = _j.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
        if plat:
            return plat.split(",")[0] != "cpu"
        return importlib.util.find_spec("libtpu") is not None
    except Exception:
        return False


try:
    import jax as _jax

    if (not _jax.config.jax_compilation_cache_dir
            and _tpu_plausible()
            and not os.environ.get("GROTH16_TPU_NO_COMPILE_CACHE")):
        _jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # pragma: no cover - cache is an optimization only
    pass

from .protocol.types import Flavour, VKey, ZKey, Witness, R1CS, extract_vkey  # noqa: E402
from .protocol.prover import (  # noqa: E402
    Mask, Proof, generate_proof, generate_proof_with_mask,
    generate_proof_with_trivial_mask, generate_proofs,
)
from .protocol.verifier import verify_proof  # noqa: E402
from .protocol.fake_setup import (  # noqa: E402
    ToxicWaste, create_fake_circuit_setup, fake_circuit_setup,
)
from .files.witness import parse_witness, write_witness  # noqa: E402
from .files.zkey import parse_zkey, write_zkey  # noqa: E402
from .files.r1cs import parse_r1cs, write_r1cs  # noqa: E402
from .files.export_json import export_proof, export_public_io  # noqa: E402
from .files.export_sage import export_sage  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "Flavour", "VKey", "ZKey", "Witness", "R1CS", "extract_vkey",
    "Mask", "Proof", "generate_proof", "generate_proof_with_mask",
    "generate_proof_with_trivial_mask", "generate_proofs", "verify_proof",
    "ToxicWaste", "create_fake_circuit_setup", "fake_circuit_setup",
    "parse_witness", "write_witness", "parse_zkey", "write_zkey",
    "parse_r1cs", "write_r1cs", "export_proof", "export_public_io",
    "export_sage",
]

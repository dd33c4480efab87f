"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8) — the simulated-mesh strategy standing
in for a real pod slice, validating that the sharded MSM and four-step NTT are
bit-exact with their single-chip counterparts."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy on XLA:CPU (see pyproject.toml)

from groth16_tpu.ops import curve as C
from groth16_tpu.ops import field as F
from groth16_tpu.ops import msm as M
from groth16_tpu.ops import ntt as NT
from groth16_tpu.ops.field import FR
from groth16_tpu.ops.limbs import ints_to_limbs
from groth16_tpu.parallel.mesh import make_mesh
from groth16_tpu.parallel.msm_shard import msm_sharded
from groth16_tpu.parallel.ntt_shard import four_step_ntt, four_step_intt
from groth16_tpu.utils import hostmath as H

rng = random.Random(11)
R = FR.modulus


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 4, "conftest must provide virtual devices"
    return make_mesh(4)


def test_four_step_ntt_matches_single_chip(mesh):
    dom = NT.Domain(6)  # 64 = 8 x 8, divisible by 4 devices
    xs = [rng.randrange(R) for _ in range(dom.size)]
    dev = jnp.asarray(FR.to_mont_array(xs))
    want = np.asarray(NT.forward_ntt(dom, dev))
    got = np.asarray(four_step_ntt(dom, mesh, dev))
    assert np.array_equal(got, want)
    # inverse roundtrip
    back = np.asarray(four_step_intt(dom, mesh, jnp.asarray(got)))
    assert FR.from_mont_array(back) == xs


def test_prove_staged_sharded_matches_unsharded(mesh):
    """The driver's dryrun path: a full staged sharded proof on the 4-device
    mesh must be bit-identical to the unsharded prover for the same mask
    (reference prover.nim:215-304 partial-sum semantics, msm.nim:117-119)."""
    from groth16_tpu.models.circuits import synthetic_circuit
    from groth16_tpu.parallel.prover_shard import prove_staged_sharded
    from groth16_tpu.protocol.device_inputs import prove_core_inputs
    from groth16_tpu.protocol.fake_setup import fake_circuit_setup, ToxicWaste
    from groth16_tpu.protocol.prover import Mask, generate_proof_with_mask
    from groth16_tpu.protocol.types import Flavour, extract_vkey
    from groth16_tpu.protocol.verifier import verify_proof

    r1cs, wtns = synthetic_circuit(4)
    toxic = ToxicWaste(alpha=1235, beta=781, gamma=4243, delta=9999, tau=106)
    zkey = fake_circuit_setup(r1cs, toxic, Flavour.Snarkjs)
    mask = Mask(r=5, s=9)

    want = generate_proof_with_mask(zkey, wtns, mask)
    flavour, log2n, args = prove_core_inputs(zkey, wtns, mask)
    pi_a, pi_b, pi_c = prove_staged_sharded(mesh, flavour, log2n, 0, *args)
    assert (pi_a, pi_b, pi_c) == (want.pi_a, want.pi_b, want.pi_c)

    prf = type(want)(public_io=want.public_io, pi_a=pi_a, pi_b=pi_b, pi_c=pi_c)
    assert verify_proof(extract_vkey(zkey), prf)


def test_sharded_msm_matches_host(mesh):
    n = 21  # deliberately not divisible by the mesh size (exercises padding)
    pts = [H.ec_scalar_mul(H.G1_FIELD, rng.randrange(1, 1 << 62), H.G1_GEN)
           for _ in range(n)]
    ks = [rng.randrange(R) for _ in range(n)]
    ks[0] = 0
    pts[1] = None
    want = H.ec_msm(H.G1_FIELD, ks, pts)
    P = C.points_from_host(C.G1, pts)
    res = msm_sharded(C.G1, mesh, ints_to_limbs(ks), P)
    got = C.points_to_host(C.G1, tuple(x[None] for x in res))[0]
    assert got == want


def test_sharded_msm_affine_pippenger_matches_unsharded(mesh):
    """The affine fast path through the sharded MSM (VERDICT r4 #5): per-shard
    length >= 128 so every device runs the real Pippenger bucket phase with
    `affine=True` on wire-format points (Z in {0, mont-1}), padded with
    Z == 0 infinity — bit-equal to the unsharded dispatch."""
    n = 1 << 10  # 256/shard on the 4-device mesh: the bucket branch engages
    np_rng = np.random.default_rng(23)
    ks32 = np_rng.integers(1, 1 << 31, size=n, dtype=np.uint32)
    base = np.zeros((n, 16), np.uint32)
    base[:, 0] = ks32 & 0xFFFF
    base[:, 1] = ks32 >> 16
    P = C.scalar_mul(C.G1, jnp.asarray(base), C.gen_point(C.G1, (n,)), 32)
    P = C.from_affine(C.G1, *C.to_affine(C.G1, P))  # wire form: Z in {0, 1}

    sc = np.zeros((n, 16), np.uint32)
    sc[:, 0] = np_rng.integers(0, 1 << 16, size=n)
    sc[0] = 0

    want = C.to_affine(C.G1, M.msm(C.G1, jnp.asarray(sc), P, 0, True))
    res = msm_sharded(C.G1, mesh, sc, P, affine=True)
    got = C.to_affine(C.G1, tuple(x[None] for x in res))
    for a, b in zip(got, want):
        assert np.array_equal(np.asarray(a).reshape(-1), np.asarray(b).reshape(-1))

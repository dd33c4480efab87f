"""Golden tests for the batched-affine merge-tree MSM bucket phase
(ops/msm_tree.py) vs host math — including the group-law exceptions the
affine formulas must mask (duplicate points, P + (-P), infinities, zero
scalars).

Kept deliberately small: every distinct (window-group, level-count) shape
is a separate XLA:CPU compile of the montmul graphs, so each test uses ONE
window group.  The Pallas variant of the same tree (ops/kernels_tree.py)
and G2 at Pippenger scale run on the TPU via tests/test_msm_tpu.py
(`python tests/test_msm_tpu.py T1 T2`), mirroring the suite's existing
G2-compile-cost policy (tests/test_msm.py)."""

import random

import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy on XLA:CPU (see pyproject.toml)

from groth16_tpu.ops import curve as C
from groth16_tpu.ops import msm_tree as MT
from groth16_tpu.ops.field import FR
from groth16_tpu.ops.limbs import ints_to_limbs
from groth16_tpu.utils import hostmath as H

rng = random.Random(3)


def adversarial_case(cv, n, bits=254):
    """Random points/scalars seeded with every exceptional group-law case."""
    fo = H.G1_FIELD if cv.name == "G1" else H.G2_FIELD
    gen = H.G1_GEN if cv.name == "G1" else H.G2_GEN
    pts = [H.ec_scalar_mul(fo, rng.randrange(1, 1 << 62), gen) for _ in range(n)]
    ks = [rng.randrange(min(1 << bits, FR.modulus)) for _ in range(n)]
    assert n >= 6
    ks[0] = 0                      # zero scalar
    pts[1] = None                  # infinity input
    pts[3] = pts[2]                # duplicate point ...
    ks[3] = ks[2]                  # ... with equal digits -> doubling lanes
    pts[5] = H.ec_neg(fo, pts[4])  # P and -P ...
    ks[5] = ks[4]                  # ... with equal digits -> cancellation
    want = H.ec_msm(fo, ks, pts)
    return ks, pts, want


def run_tree(cv, ks, pts, c, group):
    kdev = jnp.asarray(ints_to_limbs(ks))
    P = C.points_from_host(cv, pts)
    return C.points_to_host(
        cv, tuple(x[None] for x in MT.msm_tree(cv, kdev, P, c, group=group)))[0]


def test_msm_tree_g1_vs_host():
    ks, pts, want = adversarial_case(C.G1, 13)
    assert run_tree(C.G1, ks, pts, 16, group=16) == want


def test_msm_tree_g2_vs_host():
    # tiny: the G2 jnp graphs are the expensive XLA:CPU compiles; scale runs
    # on the TPU (tests/test_msm_tpu.py T2)
    ks, pts, want = adversarial_case(C.G2, 6, bits=62)
    assert run_tree(C.G2, ks, pts, 8, group=40) == want


def test_msm_tree_multi_group():
    """Window groups that split unevenly (W=20 into 7+7+6) agree with host."""
    ks, pts, want = adversarial_case(C.G1, 16, bits=250)
    assert run_tree(C.G1, ks, pts, 13, group=7) == want


def test_msm_tree_all_same_bucket():
    """Every element in one bucket: the tree is a single segment end to end
    (exercises the pure-node merge chain and root routing)."""
    pts = [H.ec_scalar_mul(H.G1_FIELD, 3 + i, H.G1_GEN) for i in range(8)]
    ks = [5] * 8
    want = H.ec_msm(H.G1_FIELD, ks, pts)
    assert run_tree(C.G1, ks, pts, 8, group=40) == want


def test_msm_tree_nonpow2_and_tiny():
    for n in (1, 3):
        pts = [H.ec_scalar_mul(H.G1_FIELD, rng.randrange(1, 1 << 40), H.G1_GEN)
               for _ in range(n)]
        ks = [rng.randrange(1 << 40) for _ in range(n)]
        want = H.ec_msm(H.G1_FIELD, ks, pts)
        assert run_tree(C.G1, ks, pts, 14, group=20) == want, f"n={n}"

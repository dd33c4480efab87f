"""Fast-lane curve smoke test: one G1 batch through add / double / affine
roundtrip against the independent host oracle (`utils/hostmath.py`).

The exhaustive formula coverage (G2, mixed addition, scalar mul, tree sums,
edge-case matrices) lives in `tests/test_curve.py` behind the `slow` marker —
on XLA:CPU each G2 formula instantiation costs ~10-40 s of compile, which is
why the default lane carries only this G1 smoke (reference behavior anchor:
`groth16/bn128/curves.nim:136-164`).
"""

import random

import pytest

from groth16_tpu.ops import curve as C
from groth16_tpu.utils import hostmath as H

rng = random.Random(7)


def test_g1_add_double_affine_roundtrip():
    pts = [H.ec_scalar_mul(H.G1_FIELD, rng.randrange(1, 1 << 62), H.G1_GEN)
           for _ in range(6)]
    pts[2] = None                      # infinity rides the same formulas
    qts = pts[::-1]
    P = C.points_from_host(C.G1, pts)
    Q = C.points_from_host(C.G1, qts)

    got_add = C.points_to_host(C.G1, C.point_add(C.G1, P, Q))
    assert got_add == [H.ec_add(H.G1_FIELD, a, b) for a, b in zip(pts, qts)]

    got_dbl = C.points_to_host(C.G1, C.point_double(C.G1, P))
    assert got_dbl == [H.ec_add(H.G1_FIELD, a, a) for a in pts]

    # affine (0,0)-infinity convention roundtrip (curves.nim:49-50)
    assert C.points_to_host(C.G1, P) == pts

"""Golden snarkjs wire-format vectors, hand-assembled from the format docs.

The bit-compatibility oracle this repo cannot get from a live snarkjs (not in
the image): every encoder in this file is written directly from the reference
format documentation — iden3 container (container.nim:6-20), `.zkey` sections
+ Montgomery conventions (zkey.nim:1-91, io.nim:100-153), `.wtns`
(witness.nim:5-12), `.r1cs` (r1cs.nim:4-50) — using ONLY `int`, `struct` and
byte strings, with zero imports from `groth16_tpu.files`.  The repo's parsers
and writers are then validated against these independent bytes in BOTH
directions, so a mirrored encoding bug (wrong section order, wrong Montgomery
convention, wrong coeff encoding) in parser or writer shows up here even
though they round-trip against each other.

Spec points are additionally re-derived with an independent textbook affine
EC scalar-mul over Fp/Fp2 written in this file.
"""

import json
import struct

import numpy as np
import pytest

# --- protocol constants (fields.nim:36-37, curves.nim:108-124) --------------

P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
Rr = 21888242871839275222246405745257275088548364400416034343698204186575808495617
R256 = 1 << 256

G1_GEN = (1, 2)
G2_GEN = (
    (0x1ADCD0ED10DF9CB87040F46655E3808F98AA68A570ACF5B0BDE23FAB1F149701,
     0x09E847E9F05A6082C3CD2A1D0A3A82E6FBFBE620F7F31269FA15D21C1C13B23B),
    (0x056C01168A5319461F7CA7AA19D4FCFD1C7CDF52DBFC4CBEE6F915250B7F6FC8,
     0x0EFE500A2D02DD77F5F401329F30895DF553B878FC3C0DADAAA86456A623235C),
)

FIXED_TOXIC = dict(alpha=1235, beta=781, gamma=4243, delta=9999, tau=106)


# --- independent byte encoders (format docs only) ---------------------------

def enc_fp_mont(x: int) -> bytes:
    """zkey Fp/Fr wire form: little-endian x*R mod p, R = 2^256 (io.nim:87-92,
    100-130)."""
    return (x * R256 % P).to_bytes(32, "little")


def enc_fr_mont(v: int) -> bytes:
    return (v * R256 % Rr).to_bytes(32, "little")


def enc_fr_wtf(v: int) -> bytes:
    """zkey coeff values are DOUBLE Montgomery encoded (zkey.nim:56-58,
    io.nim:133-139): wire = v * R^2 mod r."""
    return ((v * R256 % Rr) * R256 % Rr).to_bytes(32, "little")


def enc_fr_std(v: int) -> bytes:
    """.wtns / .r1cs values: standard little-endian (witness.nim:13,
    r1cs.nim:6)."""
    return (v % Rr).to_bytes(32, "little")


def enc_g1(pt) -> bytes:
    """G1 = x || y, each Fp Montgomery; infinity = (0,0) (curves.nim:49-50)."""
    if pt is None:
        return b"\x00" * 64
    return enc_fp_mont(pt[0]) + enc_fp_mont(pt[1])


def enc_g2(pt) -> bytes:
    """G2 = x0 || x1 || y0 || y1 (Fp2 loads as two Fp, io.nim:196-204)."""
    if pt is None:
        return b"\x00" * 128
    (x0, x1), (y0, y1) = pt
    return (enc_fp_mont(x0) + enc_fp_mont(x1)
            + enc_fp_mont(y0) + enc_fp_mont(y1))


def container_enc(magic: bytes, version: int, sections) -> bytes:
    """iden3 container: magic w32, version w32, nsections w32, then
    (id w32, len w64, data) per section (container.nim:6-20)."""
    out = magic + struct.pack("<II", version, len(sections))
    for sid, data in sections:
        out += struct.pack("<IQ", sid, len(data)) + data
    return out


def zkey_enc(nvars, npubs, dom_size, spec_g1, spec_g2, coeff_entries,
             ic, a1, b1, b2, c1, h1) -> bytes:
    """Full .zkey encoder per zkey.nim:1-91.  spec_g1 = (alpha1, beta1,
    delta1) affine int pairs; spec_g2 = (beta2, gamma2, delta2);
    coeff_entries = [(m, row, col, value_int)]; point lists are affine int
    tuples (None = infinity)."""
    alpha1, beta1, delta1 = spec_g1
    beta2, gamma2, delta2 = spec_g2
    hdr = struct.pack("<I", 32) + P.to_bytes(32, "little")
    hdr += struct.pack("<I", 32) + Rr.to_bytes(32, "little")
    hdr += struct.pack("<III", nvars, npubs, dom_size)
    hdr += enc_g1(alpha1) + enc_g1(beta1) + enc_g2(beta2)
    hdr += enc_g2(gamma2) + enc_g1(delta1) + enc_g2(delta2)

    sect4 = struct.pack("<I", len(coeff_entries))
    for m, row, col, v in coeff_entries:
        sect4 += struct.pack("<III", m, row, col) + enc_fr_wtf(v)

    return container_enc(b"zkey", 1, [
        (1, struct.pack("<I", 1)),          # prover type: Groth16
        (2, hdr),
        (3, b"".join(enc_g1(pt) for pt in ic)),
        (4, sect4),
        (5, b"".join(enc_g1(pt) for pt in a1)),
        (6, b"".join(enc_g1(pt) for pt in b1)),
        (7, b"".join(enc_g2(pt) for pt in b2)),
        (8, b"".join(enc_g1(pt) for pt in c1)),
        (9, b"".join(enc_g1(pt) for pt in h1)),
    ])


def wtns_enc(values) -> bytes:
    """.wtns encoder per witness.nim:5-12,36-60."""
    hdr = struct.pack("<I", 32) + Rr.to_bytes(32, "little")
    hdr += struct.pack("<I", len(values))
    return container_enc(b"wtns", 2, [
        (1, hdr),
        (2, b"".join(enc_fr_std(v) for v in values)),
    ])


def r1cs_enc(n_wires, n_pub_out, n_pub_in, n_priv_in, n_labels,
             constraints, labels) -> bytes:
    """.r1cs encoder per r1cs.nim:4-50."""
    hdr = struct.pack("<I", 32) + Rr.to_bytes(32, "little")
    hdr += struct.pack("<IIII", n_wires, n_pub_out, n_pub_in, n_priv_in)
    hdr += struct.pack("<Q", n_labels) + struct.pack("<I", len(constraints))

    def lincomb(terms):
        out = struct.pack("<I", len(terms))
        for idx, coeff in terms:
            out += struct.pack("<I", idx) + enc_fr_std(coeff)
        return out

    sect2 = b"".join(lincomb(a) + lincomb(b) + lincomb(c)
                     for a, b, c in constraints)
    sect3 = b"".join(struct.pack("<Q", l) for l in labels)
    return container_enc(b"r1cs", 1, [(1, hdr), (2, sect2), (3, sect3)])


# --- independent affine EC (textbook chord-tangent, curves.nim:136-214) -----

class _Fp:
    add = staticmethod(lambda a, b: (a + b) % P)
    sub = staticmethod(lambda a, b: (a - b) % P)
    mul = staticmethod(lambda a, b: a * b % P)
    inv = staticmethod(lambda a: pow(a, -1, P))
    zero = 0


class _Fp2:
    """Fp[u]/(u^2+1) as int pairs."""
    add = staticmethod(lambda a, b: ((a[0] + b[0]) % P, (a[1] + b[1]) % P))
    sub = staticmethod(lambda a, b: ((a[0] - b[0]) % P, (a[1] - b[1]) % P))
    mul = staticmethod(lambda a, b: ((a[0] * b[0] - a[1] * b[1]) % P,
                                     (a[0] * b[1] + a[1] * b[0]) % P))
    zero = (0, 0)

    @staticmethod
    def inv(a):
        n = pow((a[0] * a[0] + a[1] * a[1]) % P, -1, P)
        return (a[0] * n % P, (-a[1]) * n % P)


def ec_add(F, p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if F.add(y1, y2) == F.zero:
            return None
        three_x2 = F.mul(F.add(F.add(x1, x1), x1), x1)
        lam = F.mul(three_x2, F.inv(F.add(y1, y1)))
    else:
        lam = F.mul(F.sub(y2, y1), F.inv(F.sub(x2, x1)))
    x3 = F.sub(F.sub(F.mul(lam, lam), x1), x2)
    y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)
    return (x3, y3)


def ec_mul(F, k, pt):
    acc = None
    while k:
        if k & 1:
            acc = ec_add(F, acc, pt)
        pt = ec_add(F, pt, pt)
        k >>= 1
    return acc


# --- decoding helpers for comparisons (independent: pure int) ----------------

R_INV_P = pow(R256, -1, P)


def limbs_to_int(row) -> int:
    return sum(int(l) << (16 * i) for i, l in enumerate(np.asarray(row)))


def mont_limbs_to_int(row) -> int:
    return limbs_to_int(row) * R_INV_P % P


def pa_g1_ints(pa):
    out = []
    for i in range(len(pa)):
        x, y = mont_limbs_to_int(pa.x[i]), mont_limbs_to_int(pa.y[i])
        out.append(None if x == 0 and y == 0 else (x, y))
    return out


def pa_g2_ints(pa):
    out = []
    for i in range(len(pa)):
        x = (mont_limbs_to_int(pa.x[i][0]), mont_limbs_to_int(pa.x[i][1]))
        y = (mont_limbs_to_int(pa.y[i][0]), mont_limbs_to_int(pa.y[i][1]))
        out.append(None if x == (0, 0) and y == (0, 0) else (x, y))
    return out


# --- fixtures ----------------------------------------------------------------

@pytest.fixture(scope="module")
def product_setup():
    from groth16_tpu.models.circuits import product_circuit
    from groth16_tpu.protocol.fake_setup import ToxicWaste, fake_circuit_setup
    from groth16_tpu.protocol.types import Flavour

    r1cs, wtns = product_circuit()
    zkey = fake_circuit_setup(r1cs, ToxicWaste(**FIXED_TOXIC), Flavour.Snarkjs)
    return r1cs, wtns, zkey


# --- the golden checks -------------------------------------------------------

def test_montgomery_wire_pins():
    """Absolute byte-level pins nothing in the repo can influence."""
    # Montgomery encoding of 1 in Fp is R mod p:
    assert enc_fp_mont(1) == (R256 % P).to_bytes(32, "little")
    assert enc_fp_mont(1).hex() == (
        "9d0d8fc58d435dd33d0bc7f528eb780a2c4679786fa36e662fdf079ac1770a0e")
    # the double-Montgomery coeff encoding of 1 is R^2 mod r:
    assert enc_fr_wtf(1) == (R256 * R256 % Rr).to_bytes(32, "little")
    # container magics:
    assert container_enc(b"zkey", 1, [])[:12] == b"zkey" + struct.pack("<II", 1, 0)
    assert struct.unpack("<I", b"zkey")[0] == 0x79656B7A


def test_spec_points_match_independent_ec(product_setup):
    """fake setup spec points == [toxic]*gen computed with the textbook
    affine EC in this file (fake_setup.nim:227-235)."""
    _, _, zkey = product_setup
    t = FIXED_TOXIC
    assert zkey.spec.alpha1 == ec_mul(_Fp, t["alpha"], G1_GEN)
    assert zkey.spec.beta1 == ec_mul(_Fp, t["beta"], G1_GEN)
    assert zkey.spec.delta1 == ec_mul(_Fp, t["delta"], G1_GEN)
    assert zkey.spec.beta2 == ec_mul(_Fp2, t["beta"], G2_GEN)
    assert zkey.spec.gamma2 == ec_mul(_Fp2, t["gamma"], G2_GEN)
    assert zkey.spec.delta2 == ec_mul(_Fp2, t["delta"], G2_GEN)


def test_zkey_golden_bytes(product_setup, tmp_path):
    """Independent .zkey encoding == repo writer bytes, and the repo parser
    recovers every value from the independent bytes."""
    from groth16_tpu.files.zkey import parse_zkey, zkey_bytes
    from groth16_tpu.ops.field import FR

    _, _, zkey = product_setup
    hdr = zkey.header
    co = zkey.coeffs

    # coeff values: device form is v*R; recover v independently
    r_inv_r = pow(R256, -1, Rr)
    coeff_ints = [
        (int(co.matrix[i]), int(co.row[i]), int(co.col[i]),
         sum(int(l) << (16 * j) for j, l in enumerate(co.coeff[i])) * r_inv_r % Rr)
        for i in range(len(co))
    ]

    golden = zkey_enc(
        hdr.nvars, hdr.npubs, hdr.domain_size,
        (zkey.spec.alpha1, zkey.spec.beta1, zkey.spec.delta1),
        (zkey.spec.beta2, zkey.spec.gamma2, zkey.spec.delta2),
        coeff_ints,
        pa_g1_ints(zkey.vpoints.points_ic),
        pa_g1_ints(zkey.ppoints.points_a1),
        pa_g1_ints(zkey.ppoints.points_b1),
        pa_g2_ints(zkey.ppoints.points_b2),
        pa_g1_ints(zkey.ppoints.points_c1),
        pa_g1_ints(zkey.ppoints.points_h1),
    )

    # writer direction: repo bytes == independent bytes
    assert zkey_bytes(zkey) == golden

    # parser direction: independent bytes -> identical parsed values
    path = tmp_path / "golden.zkey"
    path.write_bytes(golden)
    back = parse_zkey(str(path))
    assert back.header.nvars == hdr.nvars
    assert back.header.npubs == hdr.npubs
    assert back.header.domain_size == hdr.domain_size
    assert back.spec.alpha1 == zkey.spec.alpha1
    assert back.spec.beta1 == zkey.spec.beta1
    assert back.spec.beta2 == zkey.spec.beta2
    assert back.spec.gamma2 == zkey.spec.gamma2
    assert back.spec.delta1 == zkey.spec.delta1
    assert back.spec.delta2 == zkey.spec.delta2
    assert np.array_equal(back.coeffs.matrix, co.matrix)
    assert np.array_equal(back.coeffs.row, co.row)
    assert np.array_equal(back.coeffs.col, co.col)
    assert np.array_equal(back.coeffs.coeff, co.coeff)
    for got, want in (
        (back.vpoints.points_ic, zkey.vpoints.points_ic),
        (back.ppoints.points_a1, zkey.ppoints.points_a1),
        (back.ppoints.points_b1, zkey.ppoints.points_b1),
        (back.ppoints.points_b2, zkey.ppoints.points_b2),
        (back.ppoints.points_c1, zkey.ppoints.points_c1),
        (back.ppoints.points_h1, zkey.ppoints.points_h1),
    ):
        assert np.array_equal(got.x, want.x) and np.array_equal(got.y, want.y)


def test_wtns_golden_bytes(product_setup, tmp_path):
    from groth16_tpu.files.witness import parse_witness, witness_bytes

    _, wtns, _ = product_setup
    values = [1, 2023, 1022, 7, 11, 13, 77, 1001]  # testProver.nim:17-55
    golden = wtns_enc(values)
    assert witness_bytes(values) == golden
    assert witness_bytes(wtns.values) == golden  # the fixture witness itself

    path = tmp_path / "golden.wtns"
    path.write_bytes(golden)
    back = parse_witness(str(path))
    assert back.nvars == 8
    assert [limbs_to_int(v) for v in back.values] == values


def test_r1cs_golden_bytes(product_setup, tmp_path):
    from groth16_tpu.files.r1cs import parse_r1cs, r1cs_bytes

    r1cs, _, _ = product_setup
    golden = r1cs_enc(
        r1cs.cfg.n_wires, r1cs.cfg.n_pub_out, r1cs.cfg.n_pub_in,
        r1cs.cfg.n_priv_in, r1cs.cfg.n_labels,
        r1cs.constraints, list(range(r1cs.cfg.n_wires)))
    assert r1cs_bytes(r1cs) == golden

    path = tmp_path / "golden.r1cs"
    path.write_bytes(golden)
    back = parse_r1cs(str(path))
    assert back.cfg == r1cs.cfg
    assert back.n_constr == r1cs.n_constr
    assert [
        tuple(sorted(lc) for lc in c) for c in back.constraints
    ] == [tuple(sorted(lc) for lc in c) for c in r1cs.constraints]


def test_proof_json_golden(product_setup):
    """Deterministic proof (fixed toxic waste + trivial mask) -> the exported
    snarkjs JSON must match this golden literal exactly, and a proof
    re-imported from the JSON must verify (export_json.nim:48-80 shapes)."""
    from groth16_tpu.files.export_json import proof_json, public_io_json
    from groth16_tpu.protocol.prover import Mask, Proof, generate_proof_with_mask
    from groth16_tpu.protocol.types import extract_vkey
    from groth16_tpu.protocol.verifier import verify_proof

    _, wtns, zkey = product_setup
    prf = generate_proof_with_mask(zkey, wtns, Mask(r=0, s=0))

    got = proof_json(prf)
    assert got == PROOF_JSON_GOLDEN
    assert public_io_json(prf) == ["2023", "1022"]

    # re-import from JSON (snarkjs projective padding stripped) and verify
    def g1(j):
        assert j[2] == "1"
        return (int(j[0]), int(j[1]))

    def g2(j):
        assert j[2] == ["1", "0"]
        return ((int(j[0][0]), int(j[0][1])), (int(j[1][0]), int(j[1][1])))

    back = Proof(public_io=[1] + [int(v) for v in public_io_json(prf)],
                 pi_a=g1(got["pi_a"]), pi_b=g2(got["pi_b"]), pi_c=g1(got["pi_c"]))
    assert verify_proof(extract_vkey(zkey), back)


# Deterministic proof of the product circuit under FIXED_TOXIC with the
# trivial mask r=s=0, regenerable with tools/gen_golden_proof.py.  Pins the
# whole prover pipeline end-to-end: any change to field/curve/NTT/MSM/protocol
# arithmetic that alters proof bytes fails here.
PROOF_JSON_GOLDEN = {
    "protocol": "groth16",
    "curve": "bn128",
    "pi_a": [
        "12417437727988808694972561204119825864385894402637350429106534992942304475037",
        "21242320342993203590684464569109209676706225774002384045527833395100323643308",
        "1",
    ],
    "pi_b": [
        [
            "21750206796371945199522924371502704360211150765670670188627625231748835033598",
            "6605228834725649255301423753988853807019198158118632039351310019889993230203",
        ],
        [
            "622735441821927416703483539518981577700696780477447369546805199279110160574",
            "2085606480547836536460518846933391341197635079674653388545824608367774581791",
        ],
        ["1", "0"],
    ],
    "pi_c": [
        "18840946567502928439343832562132962645859714980129676368208104089205792449960",
        "17974560094644028249525128433896651542992884206203695477949611960430884036735",
        "1",
    ],
}

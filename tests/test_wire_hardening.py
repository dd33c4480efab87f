"""Adversarial wire-format property tests (VERDICT r4 #9).

The reference's bit-compatibility oracle is a live snarkjs run
(`groth16/example/prove.sh:58-59`); without snarkjs in this environment the
next-best hardening is rejecting every malformed encoding the constantine
unmarshal layer would reject (`groth16/bn128/io.nim:126-153,228-250`):
non-canonical Montgomery values (>= p), off-curve spec points, truncated /
duplicate / out-of-order container sections, bad domain headers.  Fixtures
are the committed snarkjs-format artifacts in examples/product/.
"""

import os
import struct

import numpy as np
import pytest

EX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                  "examples", "product")


def _zkey_raw() -> bytes:
    with open(os.path.join(EX, "product.zkey"), "rb") as f:
        return f.read()


def _wtns_raw() -> bytes:
    with open(os.path.join(EX, "product.wtns"), "rb") as f:
        return f.read()


def _sections(raw, magic, version):
    from groth16_tpu.files.container import parse_container_bytes
    return parse_container_bytes(raw, magic, version)


def _reserialize(raw, magic, version, order=None, extra=None, patch=None):
    """Re-emit the container with reordered/duplicated/patched sections."""
    from groth16_tpu.files.container import container_bytes
    secs = _sections(raw, magic, version)
    items = [(sid, data) for sid in sorted(secs) for data in secs[sid]]
    if patch:
        items = [(sid, patch(sid, data)) for sid, data in items]
    if order is not None:
        items = [items[i] for i in order]
    if extra is not None:
        items = items + extra
    return container_bytes(magic, version, items)


def _parse_zkey_bytes(raw, tmp_path):
    from groth16_tpu.files.zkey import parse_zkey
    p = tmp_path / "t.zkey"
    p.write_bytes(raw)
    return parse_zkey(str(p))


def _parse_wtns_bytes(raw, tmp_path):
    from groth16_tpu.files.witness import parse_witness
    p = tmp_path / "t.wtns"
    p.write_bytes(raw)
    return parse_witness(str(p))


def test_out_of_order_sections_parse_identically(tmp_path):
    raw = _zkey_raw()
    zk1 = _parse_zkey_bytes(raw, tmp_path)
    # reverse the section order entirely — parsing is declaration-order-free
    n = len(_sections(raw, "zkey", 1))
    zk2 = _parse_zkey_bytes(
        _reserialize(raw, "zkey", 1, order=list(reversed(range(9)))), tmp_path)
    assert zk1.header == zk2.header
    assert np.array_equal(zk1.coeffs.coeff, zk2.coeffs.coeff)
    for nm in ("points_a1", "points_b1", "points_b2", "points_c1", "points_h1"):
        a, b = getattr(zk1.ppoints, nm), getattr(zk2.ppoints, nm)
        assert np.array_equal(a.x, b.x) and np.array_equal(a.y, b.y)


def test_duplicate_section_rejected(tmp_path):
    raw = _zkey_raw()
    h1 = _sections(raw, "zkey", 1)[5][0]
    bad = _reserialize(raw, "zkey", 1, extra=[(5, h1)])
    with pytest.raises(AssertionError, match="duplicate section"):
        _parse_zkey_bytes(bad, tmp_path)


def test_truncated_container_rejected(tmp_path):
    raw = _zkey_raw()
    with pytest.raises(AssertionError, match="truncated"):
        _parse_zkey_bytes(raw[:-10], tmp_path)
    with pytest.raises(AssertionError, match="truncated"):
        _parse_zkey_bytes(raw[:8], tmp_path)


def test_noncanonical_point_coordinate_rejected(tmp_path):
    from groth16_tpu.ops.field import FP

    def patch(sid, data):
        if sid != 5:
            return data
        # x coordinate of the first A1 point += p (same residue class, but a
        # non-canonical wire encoding: constantine's unmarshal rejects it)
        x = int.from_bytes(data[:32], "little") + FP.modulus
        assert x < (1 << 256)
        return x.to_bytes(32, "little") + data[32:]

    bad = _reserialize(_zkey_raw(), "zkey", 1, patch=patch)
    with pytest.raises(AssertionError, match="non-canonical"):
        _parse_zkey_bytes(bad, tmp_path)


def test_noncanonical_coeff_value_rejected(tmp_path):
    from groth16_tpu.ops.field import FR

    def patch(sid, data):
        if sid != 4:
            return data
        v = int.from_bytes(data[16:48], "little")
        v = v + FR.modulus
        if v >= (1 << 256):
            v -= FR.modulus  # already huge; force >= r differently
            v = FR.modulus
        return data[:16] + v.to_bytes(32, "little") + data[48:]

    bad = _reserialize(_zkey_raw(), "zkey", 1, patch=patch)
    with pytest.raises(AssertionError, match="non-canonical"):
        _parse_zkey_bytes(bad, tmp_path)


def test_off_curve_spec_point_rejected(tmp_path):
    def patch(sid, data):
        if sid != 2:
            return data
        # alpha1 sits right after the two prime fields + 3 word32s; nudge its
        # y coordinate by +1 (mod p keeps it canonical but off the curve)
        off = 4 + 32 + 4 + 32 + 12 + 32
        y = (int.from_bytes(data[off:off + 32], "little") + 1)
        return data[:off] + y.to_bytes(32, "little") + data[off + 32:]

    bad = _reserialize(_zkey_raw(), "zkey", 1, patch=patch)
    with pytest.raises(AssertionError, match="on the curve|non-canonical"):
        _parse_zkey_bytes(bad, tmp_path)


def test_bad_domain_header_rejected(tmp_path):
    def patch(sid, data):
        if sid != 2:
            return data
        off = 4 + 32 + 4 + 32 + 8  # domainSize word
        return data[:off] + struct.pack("<I", 12345) + data[off + 4:]

    bad = _reserialize(_zkey_raw(), "zkey", 1, patch=patch)
    with pytest.raises(AssertionError, match="power of two"):
        _parse_zkey_bytes(bad, tmp_path)


def test_witness_value_above_r_rejected(tmp_path):
    from groth16_tpu.ops.field import FR

    def patch(sid, data):
        if sid != 2:
            return data
        return (FR.modulus).to_bytes(32, "little") + data[32:]

    bad = _reserialize(_wtns_raw(), "wtns", 2, patch=patch)
    with pytest.raises(AssertionError, match="non-canonical"):
        _parse_wtns_bytes(bad, tmp_path)


def test_example_artifacts_still_parse():
    """The hardening must not reject the genuine snarkjs-format artifacts."""
    from groth16_tpu.files.witness import parse_witness
    from groth16_tpu.files.zkey import parse_zkey

    zk = parse_zkey(os.path.join(EX, "product.zkey"))
    w = parse_witness(os.path.join(EX, "product.wtns"))
    assert zk.header.nvars == w.nvars

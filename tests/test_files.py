"""File-format roundtrip tests (.wtns / .r1cs / .zkey writers + parsers) and
a CLI end-to-end smoke test (setup -> prove -> verify -> JSON export) — the
in-repo stand-in for the reference's snarkjs e2e harness
(groth16/example/prove.sh) until cross-validation vectors are generated."""

import json
import subprocess
import sys

import numpy as np
import pytest

from groth16_tpu.files.container import magic_word
from groth16_tpu.files.r1cs import parse_r1cs, write_r1cs
from groth16_tpu.files.witness import parse_witness, write_witness
from groth16_tpu.files.zkey import parse_zkey, write_zkey
from groth16_tpu.files.export_json import proof_json, public_io_json
from groth16_tpu.models.circuits import product_circuit
from groth16_tpu.ops.limbs import limbs_to_ints
from groth16_tpu.protocol.fake_setup import fake_circuit_setup, ToxicWaste
from groth16_tpu.protocol.types import Flavour

TOXIC = ToxicWaste(alpha=123457, beta=7891011, gamma=4243444, delta=999983, tau=106)


def test_magic_words():
    # reference container.nim:38-44 byte packing
    assert magic_word("wtns") == int.from_bytes(b"wtns", "little")
    assert magic_word("zkey") != magic_word("r1cs")


def test_witness_roundtrip(tmp_path):
    _, wtns = product_circuit()
    path = str(tmp_path / "t.wtns")
    write_witness(path, wtns.values)
    back = parse_witness(path)
    assert back.nvars == wtns.nvars
    assert back.curve == "bn128"
    assert np.array_equal(back.values, wtns.values)
    assert limbs_to_ints(back.values)[:3] == [1, 2023, 1022]


def test_r1cs_roundtrip(tmp_path):
    r1cs, _ = product_circuit()
    path = str(tmp_path / "t.r1cs")
    write_r1cs(path, r1cs)
    back = parse_r1cs(path)
    assert back.cfg == r1cs.cfg
    assert back.n_constr == r1cs.n_constr
    assert back.constraints == [
        tuple([(i, v % r1cs.r) for i, v in lc] for lc in c) for c in r1cs.constraints
    ] or back.constraints == r1cs.constraints


def test_zkey_roundtrip(tmp_path):
    r1cs, _ = product_circuit()
    zkey = fake_circuit_setup(r1cs, TOXIC, Flavour.Snarkjs)
    path = str(tmp_path / "t.zkey")
    write_zkey(path, zkey)
    back = parse_zkey(path)
    h1, h2 = zkey.header, back.header
    assert (h1.nvars, h1.npubs, h1.domain_size) == (h2.nvars, h2.npubs, h2.domain_size)
    assert back.spec.alpha1 == zkey.spec.alpha1
    assert back.spec.beta2 == zkey.spec.beta2
    assert back.spec.alpha_beta == zkey.spec.alpha_beta
    assert np.array_equal(back.vpoints.points_ic.x, zkey.vpoints.points_ic.x)
    for name in ("points_a1", "points_b1", "points_b2", "points_c1", "points_h1"):
        assert np.array_equal(getattr(back.ppoints, name).x,
                              getattr(zkey.ppoints, name).x), name
        assert np.array_equal(getattr(back.ppoints, name).y,
                              getattr(zkey.ppoints, name).y), name
    co1, co2 = zkey.coeffs, back.coeffs
    assert np.array_equal(co1.matrix, co2.matrix)
    assert np.array_equal(co1.row, co2.row)
    assert np.array_equal(co1.col, co2.col)
    assert np.array_equal(co1.coeff, co2.coeff)


def test_cli_e2e(tmp_path):
    """Full pipeline through the public CLI surface (reference
    cli_main.nim:162-231): fake setup from .r1cs + .wtns -> prove -> verify ->
    JSON outputs with snarkjs shapes."""
    from groth16_tpu.cli import main

    r1cs, wtns = product_circuit()
    r1cs_path = str(tmp_path / "c.r1cs")
    wtns_path = str(tmp_path / "c.wtns")
    proof_path = str(tmp_path / "proof.json")
    io_path = str(tmp_path / "public.json")
    write_r1cs(r1cs_path, r1cs)
    write_witness(wtns_path, wtns.values)

    rc = main(["--setup", "--prove", "--verify", "--nomask", "-t",
               "-r", r1cs_path, "-w", wtns_path,
               "-o", proof_path, "-i", io_path])
    assert rc == 0

    prf = json.load(open(proof_path))
    assert prf["protocol"] == "groth16" and prf["curve"] == "bn128"
    assert len(prf["pi_a"]) == 3 and prf["pi_a"][2] == "1"
    assert prf["pi_b"][2] == ["1", "0"]
    pub = json.load(open(io_path))
    assert pub == ["2023", "1022"]

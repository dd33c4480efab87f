#!/usr/bin/env python
"""Benchmark harness: G1 Pippenger MSM throughput (the primary metric,
BASELINE.md / BASELINE.json:2).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no numbers (SURVEY.md §6), so `vs_baseline` is the
ratio against the recorded target in BASELINE.md's running log (1.0 until a
first measurement is recorded there).

Env knobs: BENCH_LOG2N (default 20), BENCH_ITERS (default 3),
BENCH_WINDOW_BITS (default auto), BENCH_PLATFORM (default: leave as-is).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from groth16_tpu.ops import curve as C
from groth16_tpu.ops import field as F
from groth16_tpu.ops import msm as M
from groth16_tpu.ops.field import FR
from groth16_tpu.ops.limbs import N_LIMBS

# Target recorded from a previous round's measurement (points/s/chip at the
# same log2n); ratchets to the BEST prior record so vs_baseline is an honest
# round-over-round comparison.  None -> vs_baseline = 1.0.
# 267070.4 = round 1; 436961 = round 2 record (fused-fold + wNAF + lazy-carry
# REDC, BENCH_r02.json); round 3's 389.9k was the fold path on a slower
# tunnel day and did NOT beat this.
RECORDED_BASELINE = 436961.0


def make_points(n: int, seed: int = 7, cv=None):
    """n distinct curve points: batched scalar-mul of the generator by random
    32-bit scalars (32-step ladder; cheap one-time setup, cached on disk)."""
    cv = cv or C.G1
    tag = "" if cv.name == "G1" else "_g2"
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache", f"bench_points{tag}_{n}_s{seed}.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        return tuple(jnp.asarray(d[k]) for k in ("x", "y", "z"))
    rng = np.random.default_rng(seed)
    ks = rng.integers(1, 1 << 31, size=n, dtype=np.uint32)
    scal = np.zeros((n, N_LIMBS), np.uint32)
    scal[:, 0] = ks & 0xFFFF
    scal[:, 1] = ks >> 16
    P = C.scalar_mul(cv, jnp.asarray(scal), C.gen_point(cv, (n,)), 32)
    # canonical wire form (Z in {0, 1}) — the zkey-point case the prover
    # benches; enables the mixed-addition affine fold path
    P = C.from_affine(cv, *C.to_affine(cv, P))
    P = jax.tree.map(lambda x: x.block_until_ready(), P)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    np.savez(cache, x=np.asarray(P[0]), y=np.asarray(P[1]), z=np.asarray(P[2]))
    return P


def make_points_host(n: int, seed: int = 7, cv=None, chunk: int = 1 << 20):
    """Host-resident wire-form point arrays for sizes whose device working
    set would not fit HBM (2^22+): per-chunk device ladders, results
    concatenated on host."""
    cv = cv or C.G1
    xs, ys, zs = [], [], []
    for s in range(0, n, chunk):
        x, y, z = make_points(min(chunk, n - s), seed=seed + s // chunk, cv=cv)
        xs.append(np.asarray(x)); ys.append(np.asarray(y)); zs.append(np.asarray(z))
    return (np.concatenate(xs), np.concatenate(ys), np.concatenate(zs))


def bench_msm_big(cv, log2n: int, iters: int):
    """Chunk-streamed single-chip MSM at 2^22/2^24 (BASELINE.md eval configs
    3/4 scale): segments of 2^20 points through one compiled bucket-phase
    executable, per-window sums combined across segments."""
    n = 1 << log2n
    rng = np.random.default_rng(3)
    scalars = rng.integers(0, 1 << 16, size=(n, N_LIMBS), dtype=np.uint32)
    scalars[:, -1] &= 0x3FFF
    P = make_points_host(n, cv=cv)

    np.asarray(M.msm_chunked(cv, scalars, P)[0])  # compile + warm
    t0 = time.perf_counter()
    for i in range(iters):
        scalars[0, 0] = i + 1
        res = M.msm_chunked(cv, scalars, P)
        tuple(np.asarray(x) for x in res)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": f"{cv.name.lower()}_msm_points_per_sec_2e{log2n}",
        "value": round(n / dt, 1),
        "unit": "points/s/chip (chunk-streamed)",
        "vs_baseline": 1.0,
        "detail": {"chunk_log2": 20, "iters": iters,
                   "ms_per_msm": round(dt * 1e3, 1)},
    }))


def bench_prove():
    """End-to-end proofs/s on a synthetic 2^k-constraint circuit
    (BASELINE.md eval config 2)."""
    import time as _t
    from groth16_tpu.models.circuits import synthetic_circuit
    from groth16_tpu.protocol.fake_setup import fake_circuit_setup, ToxicWaste
    from groth16_tpu.protocol.prover import Mask, generate_proof_with_mask
    from groth16_tpu.protocol.types import Flavour

    log2n = int(os.environ.get("BENCH_LOG2N", "14"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    t0 = _t.perf_counter()
    r1cs, wtns = synthetic_circuit(log2n)
    circuit_s = _t.perf_counter() - t0
    toxic = ToxicWaste(alpha=1235, beta=781, gamma=4243, delta=9999, tau=106)
    t0 = _t.perf_counter()
    zkey = fake_circuit_setup(r1cs, toxic, Flavour.Snarkjs)
    setup_s = _t.perf_counter() - t0

    max_fused = int(os.environ.get("GROTH16_TPU_FUSED_MAX_LOG2N", "16"))
    path = "fused" if log2n <= max_fused else "few-dispatch"

    # warmup (compiles)
    generate_proof_with_mask(zkey, wtns, Mask(1, 2))
    t0 = _t.perf_counter()
    timings = {}
    for i in range(iters):
        generate_proof_with_mask(zkey, wtns, Mask(3 + i, 4), timings)
    dt = (_t.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": f"groth16_proofs_per_sec_2e{log2n}",
        "value": round(1.0 / dt, 4),
        "unit": "proofs/s/chip",
        "vs_baseline": 1.0,
        "detail": {"path": path, "setup_s": round(setup_s, 2),
                   "circuit_gen_s": round(circuit_s, 2),
                   **{k: round(v, 3) for k, v in timings.items()}},
    }))


def bench_batch():
    """Batch proving throughput: a stream of witnesses proved against ONE
    circuit key via `generate_proofs` (BASELINE.md eval config 5) — the
    amortized regime where the compiled executables and the device-resident
    zkey points are reused across the stream."""
    import time as _t
    from groth16_tpu.models.circuits import synthetic_circuit
    from groth16_tpu.protocol.fake_setup import fake_circuit_setup, ToxicWaste
    from groth16_tpu.protocol.prover import Mask, generate_proofs
    from groth16_tpu.protocol.types import Flavour

    log2n = int(os.environ.get("BENCH_LOG2N", "14"))
    nproofs = int(os.environ.get("BENCH_BATCH", "8"))
    r1cs, wtns = synthetic_circuit(log2n)
    toxic = ToxicWaste(alpha=1235, beta=781, gamma=4243, delta=9999, tau=106)
    zkey = fake_circuit_setup(r1cs, toxic, Flavour.Snarkjs)

    # warmup (compiles all per-shape executables)
    generate_proofs(zkey, [wtns], masks=[Mask(1, 2)])
    masks = [Mask(3 + i, 4) for i in range(nproofs)]
    t0 = _t.perf_counter()
    generate_proofs(zkey, [wtns] * nproofs, masks=masks)
    dt = (_t.perf_counter() - t0) / nproofs
    print(json.dumps({
        "metric": f"groth16_batch_proofs_per_sec_2e{log2n}",
        "value": round(1.0 / dt, 4),
        "unit": "proofs/s/chip",
        "vs_baseline": 1.0,
        "detail": {"batch": nproofs},
    }))


def bench_ntt():
    """Coset-shift NTT pipeline throughput at 2^k (the prover's quotient
    transform: iNTT -> coset scale -> NTT; BASELINE.md eval config 3)."""
    from groth16_tpu.ops import ntt as NT
    from groth16_tpu.ops.field import FR

    log2n = int(os.environ.get("BENCH_LOG2N", "20"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    n = 1 << log2n
    dom = NT.create_domain(n)
    rng = np.random.default_rng(11)
    vals = jnp.asarray(rng.integers(0, 1 << 16, size=(n, N_LIMBS), dtype=np.uint32))
    eta = jnp.asarray(FR.to_mont_limbs(NT.Domain(log2n + 1).gen))  # coset shift
    out = NT.shift_eval_domain(dom, vals, eta)
    np.asarray(out)  # compile + host fence
    t0 = time.perf_counter()
    for i in range(iters):
        v2 = vals.at[0, 0].set(i + 1)
        np.asarray(NT.shift_eval_domain(dom, v2, eta))
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": f"coset_ntt_points_per_sec_2e{log2n}",
        "value": round(n / dt, 1),
        "unit": "elements/s/chip (iNTT+scale+NTT)",
        "vs_baseline": 1.0,
    }))


def main():
    mode = os.environ.get("BENCH_MODE", "msm")
    if mode == "prove":
        return bench_prove()
    if mode == "batch":
        return bench_batch()
    if mode == "ntt":
        return bench_ntt()
    cv = C.G2 if mode == "msm_g2" else C.G1
    log2n = int(os.environ.get("BENCH_LOG2N", "18" if mode == "msm_g2" else "20"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    wbits = int(os.environ.get("BENCH_WINDOW_BITS", "0"))
    if log2n >= 22:
        return bench_msm_big(cv, log2n, max(1, iters - 1))
    n = 1 << log2n

    rng = np.random.default_rng(3)
    scalars = rng.integers(0, 1 << 16, size=(n, N_LIMBS), dtype=np.uint32)
    scalars[:, -1] &= 0x3FFF  # < 2^254 < r
    sc = jnp.asarray(scalars)
    P = make_points(n, cv=cv)

    # record the dispatch decision so a path-selection failure is visible
    # in the driver tail (VERDICT r4: the scoreboard could not distinguish
    # "tree didn't engage" from "slow tunnel day")
    is_tree = M.tree_path(cv, n, True)
    c_used = wbits or (M.pick_window_bits_tree(n) if is_tree
                       else M.pick_window_bits(n))
    detail = {
        "path": "tree" if is_tree else "fold",
        "window_bits": c_used,
        "group": int(os.environ.get("GROTH16_TPU_MSM_GROUP", "4")),
        "iters": iters,
    }

    def timed(path: str, nit: int):
        # compile + warmup; materialize on host — the experimental TPU
        # tunnel's block_until_ready can return before execution finishes,
        # so the only trustworthy fence is a device->host copy of the result
        np.asarray(M.msm(cv, sc, P, wbits, True, path)[0])
        t0 = time.perf_counter()
        for i in range(nit):
            # vary an input so no caching layer can replay a previous result
            sc2 = sc.at[0, 0].set(i + 1)
            res = M.msm(cv, sc2, P, wbits, True, path)
            tuple(np.asarray(x) for x in res)
        return (time.perf_counter() - t0) / nit

    dt = timed("auto", iters)
    pps = n / dt
    detail["ms_per_msm"] = round(dt * 1e3, 1)
    if is_tree and cv.name == "G1" and not os.environ.get("BENCH_NO_FOLD_REF"):
        # same-run fold reference: proves the tree actually engaged (ratio
        # >> 1) and calibrates the tunnel's day factor independently of the
        # absolute number
        dt_fold = timed("fold", max(1, iters - 1))
        detail["fold_ms_per_msm"] = round(dt_fold * 1e3, 1)
        detail["tree_vs_fold"] = round(dt_fold / dt, 2)

    vs = (pps / RECORDED_BASELINE
          if (RECORDED_BASELINE and cv.name == "G1" and log2n == 20) else 1.0)
    print(json.dumps({
        "metric": f"{cv.name.lower()}_msm_points_per_sec_2e{log2n}",
        "value": round(pps, 1),
        "unit": "points/s/chip",
        "vs_baseline": round(vs, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()

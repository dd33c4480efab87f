"""Device-mesh plumbing for multi-chip sharding.

The reference's only parallelism is shared-memory taskpools
(`groth16/bn128/msm.nim:89-158`, `groth16/prover.nim:130-147`).  The
TPU-native equivalent is a named `jax.sharding.Mesh` over which MSM points
and NTT rows are partitioned, with XLA collectives over ICI/DCN replacing
the taskpool's FlowVar sync.  This module owns mesh construction and the
shard/unshard helpers the kernels share.
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    """1-D mesh over the first n_devices local devices (all by default)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n <= len(devs), f"requested {n} devices, have {len(devs)}"
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis,))


def make_multihost_mesh(axis: str = "shard") -> Mesh:
    """1-D mesh over ALL devices of a multi-host pod slice.

    Calls `jax.distributed.initialize()` when a coordinator is configured
    (JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS env vars, or a TPU pod
    environment where initialize() auto-discovers peers) and builds the mesh
    over `jax.devices()` — which is then the GLOBAL device list, so the same
    `shard_map` programs (`msm_shard`, `ntt_shard`, `prover_shard`) scale
    from one chip to N hosts with XLA routing collectives over ICI/DCN.

    Launch shape (one process per host, same binary):

        JAX_COORDINATOR_ADDRESS=host0:8476 JAX_NUM_PROCESSES=N \\
        JAX_PROCESS_ID=i python your_prover.py

    Single-process fallback: if no coordinator is configured (or init
    already happened) this is exactly `make_mesh()` over local devices —
    the hermetic CPU-mesh tests and the driver's dryrun are unaffected.

    Multi-process INPUT construction: build global arrays with
    `jax.make_array_from_process_local_data(NamedSharding(mesh, spec),
    local_rows)` — each process contributes the rows it owns (the pattern
    tests/multihost_worker.py pins end-to-end with gloo CPU collectives).
    `prove_staged_sharded`'s `padded()` uses plain `jax.device_put`, which
    is single-process only; in multi-process mode feed `_msm_sharded_jit` /
    the NTT programs global arrays built as above.
    """
    if (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS")):
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError):
            # RuntimeError: already initialized — reuse the global state.
            # ValueError: malformed coordinator env — fall back to the
            # local-device mesh rather than crashing setup.
            pass
    return make_mesh(axis=axis)


def shard_leading(mesh: Mesh, x, axis: str = "shard"):
    """Place an array with its leading dim sharded over the mesh axis."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def pad_to_multiple(x: np.ndarray, m: int, axis: int = 0):
    """Pad with zeros so shape[axis] % m == 0; returns (padded, original_len)."""
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths), n

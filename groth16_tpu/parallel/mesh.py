"""Device-mesh plumbing for multi-chip sharding.

The reference's only parallelism is shared-memory taskpools
(`groth16/bn128/msm.nim:89-158`, `groth16/prover.nim:130-147`).  The
TPU-native equivalent is a named `jax.sharding.Mesh` over which MSM points
and NTT rows are partitioned, with XLA collectives over ICI/DCN replacing
the taskpool's FlowVar sync.  This module owns mesh construction and the
shard/unshard helpers the kernels share.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    """1-D mesh over the first n_devices local devices (all by default)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n <= len(devs), f"requested {n} devices, have {len(devs)}"
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis,))


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

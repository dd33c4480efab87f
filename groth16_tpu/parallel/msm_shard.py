"""Mesh-sharded Pippenger MSM.

The reference's chunked MSM (`groth16/bn128/msm.nim:89-158`) splits (scalar,
point) pairs into contiguous chunks, one taskpool task per chunk, and sums
partial results on the spawning thread.  The mesh version is the same
map-reduce re-drawn for a TPU pod slice:

  * (scalars, points) leading dim sharded over a 1-D mesh axis (`shard_map`)
  * each device runs the full bucket phase of every Pippenger window on its
    local shard (sort + segmented scan, see `ops/msm.py`)
  * the [W]-window partial sums — a few KB — are `all_gather`ed over ICI and
    tree-reduced with complete point adds on every device
  * one Horner combine finishes the MSM (replicated, O(254) point ops)

EC addition is not a `psum`-able reduction, so the collective is
all_gather + local tree reduction; the payload is W points per device,
independent of N.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import curve as C
from ..ops import msm as M
from ..ops.curve import CurveSpec
from .mesh import pad_to_multiple

AXIS = "shard"


def _point_spec(cv: CurveSpec, sharded: bool):
    nd = 1 + len(cv.fops.comp_shape)  # leading batch + limb dims
    return P(AXIS, *([None] * (nd - 1))) if sharded else P(*([None] * nd))


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5))
def _msm_sharded_jit(cv: CurveSpec, mesh: Mesh, scalars_std, Pts, window_bits: int,
                     affine: bool = False):
    pspec = _point_spec(cv, True)
    # the reduced output is a SINGLE point (no leading batch dim)
    out_spec = P(*([None] * len(cv.fops.comp_shape)))

    def body(sc, pts):
        n_local = sc.shape[0]
        if n_local < 128 and not window_bits:
            # tiny shards (the dryrun / small-circuit case): all_gather the
            # per-point ladder products and run ONE reduction over d*n_local
            # points — one fewer point-formula instantiation in the mesh
            # program, which is what XLA:CPU compile time scales with.  The
            # extra ICI payload is < 128*d points, negligible at this size.
            prods = C.scalar_mul(cv, sc, pts)
            gathered = jax.lax.all_gather(prods, AXIS, tiled=True)
            return M.axis0_sum(cv, gathered)
        # full local Pippenger (incl. Horner) on this device's shard; the
        # cross-device combine is then an all_gather of d single points + one
        # reduction — the mesh analog of the reference's per-chunk
        # partial-sum reduction (bn128/msm.nim:117-119)
        local = M.msm(cv, sc, pts, window_bits, affine)
        gathered = jax.lax.all_gather(local, AXIS)             # [d, ...]
        return M.axis0_sum(cv, gathered)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS, None), (pspec, pspec, pspec)),
        out_specs=(out_spec, out_spec, out_spec),
        check_vma=False,
    )
    return fn(scalars_std, Pts)


def msm_sharded(cv: CurveSpec, mesh: Mesh, scalars_std: np.ndarray, Pts,
                window_bits: int = 0, affine: bool = False):
    """Sharded MSM entry point; pads N to a multiple of the mesh size with
    zero scalars (zero scalars contribute the identity).  Returns one
    projective point (replicated)."""
    d = mesh.devices.size
    n = scalars_std.shape[0]
    sc, _ = pad_to_multiple(np.asarray(scalars_std), d)
    pad = sc.shape[0] - n
    if pad:
        Pts = tuple(
            jnp.concatenate([p, jnp.broadcast_to(i, (pad,) + i.shape)], 0)
            for p, i in zip(Pts, C.inf_like(cv))
        )
    return _msm_sharded_jit(cv, mesh, jnp.asarray(sc), Pts, window_bits, affine)

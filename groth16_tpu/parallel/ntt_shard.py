"""Mesh-sharded four-step (Bailey) NTT.

Scaling the transform dimension is this framework's "sequence parallelism"
workload (SURVEY.md §5.7): the reference scales N only by recursion on one
host (`groth16/math/ntt.nim:17-50`); here N = N1 x N2 is laid out as a
matrix whose rows are sharded over the mesh, and the transform becomes

  1. all_to_all transpose: rows -> columns           (ICI/DCN)
  2. local length-N1 NTTs, batched over columns      (VPU)
  3. twiddle multiply  w_N^(n2*k1), built on-device
     from one `powers` call per local column
  4. all_to_all transpose back                       (ICI/DCN)
  5. local length-N2 NTTs, batched over rows
  6. index remap (k1,k2) -> k1 + N1*k2: a final transpose keeps the public
     API in natural order

Identity: X[k1 + N1 k2] = sum_{n2} w_N2^{n2 k2} [ w_N^{n2 k1}
                            sum_{n1} x[n1 N2 + n2] w_N1^{n1 k1} ].
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import field as F
from ..ops import ntt as NT
from ..ops.field import FR
from ..ops.limbs import N_LIMBS, int_to_limbs

AXIS = "shard"


def _batched_ntt(dom: NT.Domain, x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """x: [B, N, 16] -> row-wise (i)NTT."""
    fn = NT.inverse_ntt if inverse else NT.forward_ntt
    return jax.vmap(functools.partial(fn, dom))(x)


def _split(log2n: int, d: int) -> tuple:
    """N = N1 * N2 with N1 the column-transform length; both N1 and N2 must
    be divisible by the (power-of-two) mesh size d."""
    ld = max(0, (d - 1).bit_length())
    assert (1 << ld) == d, "mesh size must be a power of two"
    l1 = max(ld, log2n // 2)
    assert log2n - l1 >= ld, f"domain 2^{log2n} too small for {d} devices"
    return l1, log2n - l1


@functools.partial(jax.jit, static_argnums=(0, 1, 3))
def _four_step_jit(dom: NT.Domain, mesh: Mesh, x: jnp.ndarray, inverse: bool):
    l1, l2 = _split(dom.log2_size, mesh.devices.size)
    n1, n2 = 1 << l1, 1 << l2
    d1, d2 = NT.Domain(l1), NT.Domain(l2)
    r = FR.modulus
    w = dom.gen_inv if inverse else dom.gen  # root of the FULL domain

    def body(rows):  # rows: [n1/d, n2, 16] — this device's rows of the matrix
        # 1. transpose to columns: [n1, n2/d, 16]
        cols = jax.lax.all_to_all(rows, AXIS, split_axis=1, concat_axis=0, tiled=True)
        colsT = jnp.swapaxes(cols, 0, 1)              # [n2/d, n1, 16]
        # 2. length-n1 NTTs over each held column
        colsT = _batched_ntt(d1, colsT, inverse)
        # 3. twiddle w_N^(n2*k1): per local column n2, powers of w^n2
        dev = jax.lax.axis_index(AXIS)
        n2_local = colsT.shape[0]
        n2_glob = dev * n2_local + jnp.arange(n2_local)        # [n2/d]
        w_mont = jnp.asarray(int_to_limbs(w * F.R_MONT % r))
        w_n2 = F.pow_mod_u32(FR, w_mont, n2_glob)              # [n2/d, 16]
        tw = jax.vmap(lambda b: F.powers(FR, b, n1))(w_n2)     # [n2/d, n1, 16]
        colsT = F.mont_mul(FR, colsT, tw)
        # 4. transpose back: [n1/d, n2, 16]
        cols = jnp.swapaxes(colsT, 0, 1)                       # [n1, n2/d, 16]
        rows2 = jax.lax.all_to_all(cols, AXIS, split_axis=0, concat_axis=1, tiled=True)
        # 5. length-n2 NTTs along rows
        rows2 = _batched_ntt(d2, rows2, inverse)
        # 6. output element (k1, k2) currently at [k1, k2]; X index = k1 + n1*k2
        #    -> transpose to [k2, k1] so flattening gives natural order
        out = jax.lax.all_to_all(rows2, AXIS, split_axis=1, concat_axis=0, tiled=True)
        # [n1, n2/d, 16] — holds columns k2 of B; transpose locally
        return jnp.swapaxes(out, 0, 1)                         # [n2/d, n1, 16]

    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=P(AXIS, None, None),
                       out_specs=P(AXIS, None, None),
                       check_vma=False)
    # NOTE scaling: for the inverse, the local inverse_ntt calls already fold
    # in 1/N1 and 1/N2, whose product is the full 1/N — no extra scaling here.
    mat = x.reshape(n1, n2, N_LIMBS)
    out = fn(mat)                                              # [n2, n1, 16]
    return out.reshape(dom.size, N_LIMBS)


def four_step_ntt(dom: NT.Domain, mesh: Mesh, x: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT of uint32[N,16] (Montgomery), N = dom.size, sharded over
    `mesh`.  Bit-exact with `ops.ntt.forward_ntt`."""
    return _four_step_jit(dom, mesh, x, False)


def four_step_intt(dom: NT.Domain, mesh: Mesh, x: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT, bit-exact with `ops.ntt.inverse_ntt`."""
    return _four_step_jit(dom, mesh, x, True)

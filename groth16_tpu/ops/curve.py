"""Vectorized BN254 elliptic-curve kernels (G1 over Fp, G2 over Fp2).

TPU-native design: a batch of curve points is a tuple ``(X, Y, Z)`` of
homogeneous projective coordinates, each a ``uint32[..., 16]`` Montgomery limb
array (G1) or ``uint32[..., 2, 16]`` (G2, Fp2 components on axis -2).  All
group operations use the *complete* projective addition formulas for
``y^2 = x^3 + b`` curves (Renes–Costello–Batina 2015, algorithms 7/9): no
data-dependent branches, the point at infinity ``(0:1:0)`` flows through the
same arithmetic as every other point, so the whole batch stays on the VPU.

This replaces the reference's scalar affine chord-tangent addition with a
projective round-trip per op (`groth16/bn128/curves.nim:136-154`) — a shape
that cannot vectorize.  Behavior parity targets: curve equations and twist
constant (`curves.nim:54-91`), generators (`curves.nim:112-124`), the affine
``(0,0)`` infinity convention at API boundaries (`curves.nim:49-50`), scalar
multiplication semantics (`curves.nim:182-214`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from . import field as F
from .limbs import N_LIMBS, int_to_limbs
from .field import FP, FR, FieldParams


# ---------------------------------------------------------------------------
# Field backends: Fp (limb vectors) and Fp2 (component axis at -2)
# ---------------------------------------------------------------------------

class FpVec:
    """Vectorized Fp arithmetic on uint32[..., 16] Montgomery limb arrays."""

    name = "Fp"
    comp_shape = (N_LIMBS,)   # trailing shape of one element

    @staticmethod
    def mul(a, b):
        return F.mont_mul(FP, a, b)

    @staticmethod
    def sqr(a):
        return F.mont_mul(FP, a, a)

    @staticmethod
    def add(a, b):
        return F.add_mod(FP, a, b)

    @staticmethod
    def sub(a, b):
        return F.sub_mod(FP, a, b)

    @staticmethod
    def neg(a):
        return F.neg_mod(FP, a)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=-1)

    @staticmethod
    def eq(a, b):
        return jnp.all(a == b, axis=(-1,))

    @staticmethod
    def select(cond, a, b):
        return jnp.where(cond[..., None], a, b)

    @staticmethod
    def const(x: int) -> np.ndarray:
        """Plain integer -> Montgomery limb constant (host)."""
        return FP.to_mont_limbs(x)


class Fp2Vec:
    """Vectorized Fp2 = Fp[u]/(u^2+1) on uint32[..., 2, 16] arrays.

    Multiplication is Karatsuba (3 Fp muls); the tower matches the reference's
    constantine `Fp2` (`groth16/bn128/fields.nim:27-32`).
    """

    name = "Fp2"
    comp_shape = (2, N_LIMBS)

    @staticmethod
    def mul(a, b):
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        v0 = F.mont_mul(FP, a0, b0)
        v1 = F.mont_mul(FP, a1, b1)
        c0 = F.sub_mod(FP, v0, v1)
        t = F.mont_mul(FP, F.add_mod(FP, a0, a1), F.add_mod(FP, b0, b1))
        c1 = F.sub_mod(FP, F.sub_mod(FP, t, v0), v1)
        return jnp.stack([c0, c1], axis=-2)

    @staticmethod
    def sqr(a):
        # (a0 + a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u
        a0, a1 = a[..., 0, :], a[..., 1, :]
        c0 = F.mont_mul(FP, F.add_mod(FP, a0, a1), F.sub_mod(FP, a0, a1))
        t = F.mont_mul(FP, a0, a1)
        c1 = F.add_mod(FP, t, t)
        return jnp.stack([c0, c1], axis=-2)

    @staticmethod
    def add(a, b):
        return F.add_mod(FP, a, b)

    @staticmethod
    def sub(a, b):
        return F.sub_mod(FP, a, b)

    @staticmethod
    def neg(a):
        return F.neg_mod(FP, a)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=(-1, -2))

    @staticmethod
    def eq(a, b):
        return jnp.all(a == b, axis=(-1, -2))

    @staticmethod
    def select(cond, a, b):
        return jnp.where(cond[..., None, None], a, b)

    @staticmethod
    def const(x) -> np.ndarray:
        """(c0, c1) int pair -> Montgomery limb constant [2, 16] (host)."""
        c0, c1 = x
        return np.stack([FP.to_mont_limbs(c0), FP.to_mont_limbs(c1)])


# Twist curve coefficient b' = 3/(9+u); same value as the constants hardcoded
# at reference groth16/bn128/curves.nim:75-77 (pinned in tests).
from ..utils.hostmath import TWIST_B, G1_GEN, G2_GEN  # noqa: E402


@dataclass(frozen=True)
class CurveSpec:
    """Static description of one curve group (hashable: usable as a jit-static arg)."""

    name: str

    @property
    def fops(self):
        return FpVec if self.name == "G1" else Fp2Vec

    @property
    def b(self):
        return 3 if self.name == "G1" else TWIST_B

    @functools.cached_property
    def b_limbs(self) -> np.ndarray:
        return self.fops.const(self.b)

    @functools.cached_property
    def b3_limbs(self) -> np.ndarray:
        b = self.b
        b3 = (3 * b) % FP.modulus if self.name == "G1" else (3 * b[0] % FP.modulus, 3 * b[1] % FP.modulus)
        return self.fops.const(b3)

    @functools.cached_property
    def zero_limbs(self) -> np.ndarray:
        return np.zeros(self.fops.comp_shape, np.uint32)

    @functools.cached_property
    def one_limbs(self) -> np.ndarray:
        return self.fops.const(1 if self.name == "G1" else (1, 0))

    @functools.cached_property
    def gen_affine(self):
        g = G1_GEN if self.name == "G1" else G2_GEN
        return (self.fops.const(g[0]), self.fops.const(g[1]))


G1 = CurveSpec("G1")
G2 = CurveSpec("G2")

_jit_cv = functools.partial(jax.jit, static_argnums=0)


# ---------------------------------------------------------------------------
# Complete projective group law (RCB15, a = 0)
#
# The raw formulas are factored out over an abstract field-ops object `K` so
# the same code serves the jnp path (FpVec/Fp2Vec) and the Pallas kernel
# bodies (ops/kernels.py).
# ---------------------------------------------------------------------------

def rcb_add(K, P, Q, b3):
    """Complete projective addition (RCB15 algorithm 7, a=0): 12M + 2·(b3 mul).

    Handles P=Q, P=-Q, and either operand at infinity branchlessly."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    t0 = K.mul(X1, X2)
    t1 = K.mul(Y1, Y2)
    t2 = K.mul(Z1, Z2)
    t3 = K.mul(K.add(X1, Y1), K.add(X2, Y2))
    t3 = K.sub(t3, K.add(t0, t1))
    t4 = K.mul(K.add(Y1, Z1), K.add(Y2, Z2))
    t4 = K.sub(t4, K.add(t1, t2))
    X3 = K.mul(K.add(X1, Z1), K.add(X2, Z2))
    Y3 = K.sub(X3, K.add(t0, t2))
    X3 = K.add(t0, t0)
    t0 = K.add(X3, t0)
    t2 = K.mul(b3, t2)
    Z3 = K.add(t1, t2)
    t1 = K.sub(t1, t2)
    Y3 = K.mul(b3, Y3)
    X3 = K.mul(t4, Y3)
    t2 = K.mul(t3, t1)
    X3 = K.sub(t2, X3)
    Y3 = K.mul(Y3, t0)
    t1 = K.mul(t1, Z3)
    Y3 = K.add(t1, Y3)
    t0 = K.mul(t0, t3)
    Z3 = K.mul(Z3, t4)
    Z3 = K.add(Z3, t0)
    return (X3, Y3, Z3)


def rcb_add_mixed(K, P, Q_affine, b3):
    """Complete projective+affine mixed addition (RCB15 algorithm 8, a=0):
    11M + 2·(b3 mul) vs algorithm 7's 12M + 2.

    Exception-free for any P (including infinity) and any affine Q with
    Z2=1 implied — Q at infinity cannot be represented here, so callers
    must select around all-zero (0,0) rows themselves."""
    X1, Y1, Z1 = P
    X2, Y2 = Q_affine
    t0 = K.mul(X1, X2)
    t1 = K.mul(Y1, Y2)
    t3 = K.mul(K.add(X2, Y2), K.add(X1, Y1))
    t3 = K.sub(t3, K.add(t0, t1))
    t4 = K.add(K.mul(Y2, Z1), Y1)
    Y3 = K.add(K.mul(X2, Z1), X1)
    X3 = K.add(t0, t0)
    t0 = K.add(X3, t0)
    t2 = K.mul(b3, Z1)
    Z3 = K.add(t1, t2)
    t1 = K.sub(t1, t2)
    Y3 = K.mul(b3, Y3)
    X3 = K.mul(t4, Y3)
    t2 = K.mul(t3, t1)
    X3 = K.sub(t2, X3)
    Y3 = K.mul(Y3, t0)
    t1 = K.mul(t1, Z3)
    Y3 = K.add(t1, Y3)
    t0 = K.mul(t0, t3)
    Z3 = K.mul(Z3, t4)
    Z3 = K.add(Z3, t0)
    return (X3, Y3, Z3)


def _bcast_points(K, *pts):
    """Broadcast the components of several point tuples to one common shape."""
    shape = jnp.broadcast_shapes(*(c.shape for P in pts for c in P))
    return tuple(tuple(jnp.broadcast_to(c, shape) for c in P) for P in pts)


def rcb_add_stagemul(K, P, Q, b3):
    """RCB15 algorithm 7 with the independent field muls of each dependency
    stage STACKED into one batched K.mul call (6 + 2 + 6 products).

    Identical arithmetic (bit-exact results) to `rcb_add`; the payoff is
    GRAPH SHAPE: 3 batched muls instead of 14 scalar-form muls means ~5x
    fewer HLO subgraphs per point-formula instantiation, which is what
    XLA:CPU compile time scales with (~40 s per inlined G2 add in the
    scalar form), and the batched muls also vectorize better at runtime.
    The Pallas kernels keep the scalar-form `rcb_add` (their K works on
    limb-axis-first references where this stacking is wrong)."""
    (X1, Y1, Z1), (X2, Y2, Z2) = _bcast_points(K, P, Q)
    lhs = jnp.stack([X1, Y1, Z1, K.add(X1, Y1), K.add(Y1, Z1), K.add(X1, Z1)])
    rhs = jnp.stack([X2, Y2, Z2, K.add(X2, Y2), K.add(Y2, Z2), K.add(X2, Z2)])
    t0, t1, t2, t3, t4, X3 = K.mul(lhs, rhs)
    t3 = K.sub(t3, K.add(t0, t1))
    t4 = K.sub(t4, K.add(t1, t2))
    Y3 = K.sub(X3, K.add(t0, t2))
    X3 = K.add(t0, t0)
    t0 = K.add(X3, t0)
    b3b = jnp.broadcast_to(b3, t2.shape)
    t2, Y3 = K.mul(jnp.stack([t2, Y3]), jnp.stack([b3b, b3b]))
    Z3 = K.add(t1, t2)
    t1 = K.sub(t1, t2)
    m = K.mul(jnp.stack([t4, t3, Y3, t1, t0, Z3]),
              jnp.stack([Y3, t1, t0, Z3, t3, t4]))
    X3 = K.sub(m[1], m[0])
    Y3 = K.add(m[3], m[2])
    Z3 = K.add(m[5], m[4])
    return (X3, Y3, Z3)


def rcb_double_stagemul(K, P, b3):
    """RCB15 algorithm 9 with stage-stacked muls (4 + 1 + 4 products);
    bit-exact with `rcb_double` — see `rcb_add_stagemul` for why."""
    X, Y, Z = P
    t0, t1, xy, t2 = K.mul(jnp.stack([Y, Y, X, Z]), jnp.stack([Y, Z, Y, Z]))
    Z3 = K.add(t0, t0)
    Z3 = K.add(Z3, Z3)
    Z3 = K.add(Z3, Z3)
    t2 = K.mul(jnp.broadcast_to(b3, t2.shape), t2)
    Y3 = K.add(t0, t2)
    t1x3 = K.add(K.add(t2, t2), t2)
    t0 = K.sub(t0, t1x3)
    m = K.mul(jnp.stack([t2, t1, t0, t0]), jnp.stack([Z3, Z3, Y3, xy]))
    X3 = K.add(m[3], m[3])
    Y3 = K.add(m[0], m[2])
    Z3 = m[1]
    return (X3, Y3, Z3)


def rcb_double(K, P, b3):
    """Complete projective doubling (RCB15 algorithm 9, a=0)."""
    X, Y, Z = P
    t0 = K.sqr(Y)
    Z3 = K.add(t0, t0)
    Z3 = K.add(Z3, Z3)
    Z3 = K.add(Z3, Z3)
    t1 = K.mul(Y, Z)
    t2 = K.sqr(Z)
    t2 = K.mul(b3, t2)
    X3 = K.mul(t2, Z3)
    Y3 = K.add(t0, t2)
    Z3 = K.mul(t1, Z3)
    t1 = K.add(t2, t2)
    t2 = K.add(t1, t2)
    t0 = K.sub(t0, t2)
    Y3 = K.mul(t0, Y3)
    Y3 = K.add(X3, Y3)
    t1 = K.mul(X, Y)
    X3 = K.mul(t0, t1)
    X3 = K.add(X3, X3)
    return (X3, Y3, Z3)


@_jit_cv
def point_add(cv: CurveSpec, P, Q):
    """Batched complete addition; dispatches to the Pallas kernel on TPU for
    kernel-eligible shapes, else the jnp formulas."""
    from . import kernels
    if kernels.eligible(cv, P, Q):
        return kernels.point_add(cv, P, Q)
    return rcb_add_stagemul(cv.fops, P, Q, jnp.asarray(cv.b3_limbs))


@_jit_cv
def point_double(cv: CurveSpec, P):
    """Batched complete doubling; Pallas on TPU when eligible."""
    from . import kernels
    if kernels.eligible(cv, P, P):
        return kernels.point_double(cv, P)
    return rcb_double_stagemul(cv.fops, P, jnp.asarray(cv.b3_limbs))


@_jit_cv
def point_neg(cv: CurveSpec, P):
    X, Y, Z = P
    return (X, cv.fops.neg(Y), Z)


def point_is_inf(cv: CurveSpec, P):
    return cv.fops.is_zero(P[2])


def point_select(cv: CurveSpec, cond, P, Q):
    """Elementwise select between two point batches; cond is bool[...]."""
    K = cv.fops
    return tuple(K.select(cond, p, q) for p, q in zip(P, Q))


def inf_like(cv: CurveSpec, shape=()) -> tuple:
    """Batch of points at infinity (0 : 1 : 0), Montgomery form."""
    zero = jnp.broadcast_to(jnp.asarray(cv.zero_limbs), shape + cv.fops.comp_shape)
    one = jnp.broadcast_to(jnp.asarray(cv.one_limbs), shape + cv.fops.comp_shape)
    return (zero, one, zero)


def gen_point(cv: CurveSpec, shape=()) -> tuple:
    """Batch of group generators in projective Montgomery form."""
    gx, gy = cv.gen_affine
    x = jnp.broadcast_to(jnp.asarray(gx), shape + cv.fops.comp_shape)
    y = jnp.broadcast_to(jnp.asarray(gy), shape + cv.fops.comp_shape)
    one = jnp.broadcast_to(jnp.asarray(cv.one_limbs), shape + cv.fops.comp_shape)
    return (x, y, one)


# ---------------------------------------------------------------------------
# Affine conversions (the affine (0,0)-as-infinity convention of the wire
# format / reference lives only at these boundaries)
# ---------------------------------------------------------------------------

def from_affine(cv: CurveSpec, x, y):
    """Affine batch -> projective; (0,0) maps to (0:1:0) (curves.nim:49-50)."""
    K = cv.fops
    is_inf = jnp.logical_and(K.is_zero(x), K.is_zero(y))
    one = jnp.broadcast_to(jnp.asarray(cv.one_limbs), x.shape)
    zero = jnp.zeros_like(x)
    X = K.select(is_inf, zero, x)
    Y = K.select(is_inf, one, y)
    Z = K.select(is_inf, zero, one)
    return (X, Y, Z)


@_jit_cv
def to_affine(cv: CurveSpec, P):
    """Projective batch -> affine (x, y); infinity maps back to (0,0).

    Uses one batched Fermat inversion over all Z (for Fp2 via norm trick),
    the vector analog of the reference's `batchInverseFr` pattern.
    """
    K = cv.fops
    X, Y, Z = P
    inf = K.is_zero(Z)
    if cv.name == "G1":
        zinv = F.inv_mod(FP, Z)
    else:
        z0, z1 = Z[..., 0, :], Z[..., 1, :]
        norm = F.add_mod(FP, F.mont_mul(FP, z0, z0), F.mont_mul(FP, z1, z1))
        ninv = F.inv_mod(FP, norm)
        zinv = jnp.stack(
            [F.mont_mul(FP, z0, ninv), F.neg_mod(FP, F.mont_mul(FP, z1, ninv))],
            axis=-2,
        )
    x = K.mul(X, zinv)
    y = K.mul(Y, zinv)
    zero = jnp.zeros_like(x)
    return (K.select(inf, zero, x), K.select(inf, zero, y))


@_jit_cv
def is_on_curve(cv: CurveSpec, P):
    """Projective curve membership  Y^2 Z == X^3 + b Z^3; infinity passes.

    (Reference `checkCurveEqG1/G2`, curves.nim:54-91, in affine form.)
    """
    K = cv.fops
    X, Y, Z = P
    lhs = K.mul(K.sqr(Y), Z)
    rhs = K.add(K.mul(K.sqr(X), X), K.mul(jnp.asarray(cv.b_limbs), K.mul(K.sqr(Z), Z)))
    return K.eq(lhs, rhs)


# ---------------------------------------------------------------------------
# Scalar multiplication
# ---------------------------------------------------------------------------

def scalar_bits(scalars: jnp.ndarray, nbits: int = 256) -> jnp.ndarray:
    """uint32[..., 16] standard-form limbs -> uint32[nbits, ...] bit planes (LSB first)."""
    from .limbs import LIMB_BITS
    planes = []
    for i in range(nbits):
        limb, off = divmod(i, LIMB_BITS)
        planes.append((scalars[..., limb] >> off) & 1)
    return jnp.stack(planes, axis=0)


@functools.partial(jax.jit, static_argnums=(0, 3))
def scalar_mul(cv: CurveSpec, scalars_std: jnp.ndarray, P, nbits: int = 256):
    """Batched variable-base scalar multiplication  [k_i] P_i.

    `scalars_std` is uint32[..., 16] in STANDARD (non-Montgomery) form.
    Left-to-right is pointless here; we scan right-to-left with a doubling
    accumulator — 256 iterations of (complete add + double), fully batched.
    Replaces the reference's per-scalar double-and-add (curves.nim:182-214).
    """
    bits = scalar_bits(scalars_std, nbits)
    batch_shape = scalars_std.shape[:-1]
    acc0 = inf_like(cv, batch_shape)

    if jax.default_backend() == "cpu":
        # XLA:CPU compile time scales with point-formula instantiation count
        # (~10 s per G1 add, ~40 s per G2 add inlined into the module), and
        # the CPU path exists only for tests and the driver's virtual-mesh
        # dryrun, where compile wall-time dominates end-to-end.  Fuse the
        # ladder's add and double into ONE complete-add instantiation on a
        # stacked [2, ...] batch (double = add(P, P) is exception-free under
        # RCB15) — ~27% more field muls at runtime, half the compile.
        def body(carry, bit):
            acc, base = carry
            lhs = tuple(jnp.stack([a, b], 0) for a, b in zip(acc, base))
            rhs = tuple(jnp.stack([b, b], 0) for b in base)
            out = point_add(cv, lhs, rhs)   # [0]=acc+base, [1]=2*base
            added = tuple(o[0] for o in out)
            acc = point_select(cv, bit > 0, added, acc)
            return (acc, tuple(o[1] for o in out)), None
    else:
        def body(carry, bit):
            acc, base = carry
            added = point_add(cv, acc, base)
            acc = point_select(cv, bit > 0, added, acc)
            base = point_double(cv, base)
            return (acc, base), None

    (acc, _), _ = jax.lax.scan(body, (acc0, P), bits)
    return acc


@_jit_cv
def tree_sum(cv: CurveSpec, P):
    """EC sum over the leading axis by pairwise halving (log2 n rounds of
    complete adds at full vector width) — the TPU shape of the reference's
    sequential partial-result reduction (`bn128/msm.nim:117-119`)."""
    X, Y, Z = P
    n = X.shape[0]
    nc = len(cv.fops.comp_shape)
    batch = X.shape[1:X.ndim - nc]  # extra batch dims ride along (e.g. the
    while n > 1:                    # window axis of the batched bucket reduce)
        half = (n + 1) // 2
        pad = half * 2 - n
        if pad:
            infs = inf_like(cv, (pad,) + batch)
            X = jnp.concatenate([X, infs[0]], 0)
            Y = jnp.concatenate([Y, infs[1]], 0)
            Z = jnp.concatenate([Z, infs[2]], 0)
        P1 = (X[:half], Y[:half], Z[:half])
        P2 = (X[half:], Y[half:], Z[half:])
        X, Y, Z = point_add(cv, P1, P2)
        n = half
    return (X[0], Y[0], Z[0])


# ---------------------------------------------------------------------------
# Host <-> device point I/O
# ---------------------------------------------------------------------------

def points_from_host(cv: CurveSpec, pts) -> tuple:
    """List of host affine points (ints / int-pairs, None=infinity) ->
    projective device batch."""
    K = cv.fops
    n = len(pts)
    xs = np.zeros((n,) + K.comp_shape, np.uint32)
    ys = np.zeros((n,) + K.comp_shape, np.uint32)
    for i, pt in enumerate(pts):
        if pt is None:
            continue
        xs[i] = K.const(pt[0])
        ys[i] = K.const(pt[1])
    return from_affine(cv, jnp.asarray(xs), jnp.asarray(ys))


def points_to_host(cv: CurveSpec, P) -> list:
    """Projective device batch -> list of host affine points (None=infinity)."""
    x, y = to_affine(cv, P)
    x, y = np.asarray(x), np.asarray(y)
    out = []
    flat_x = x.reshape((-1,) + cv.fops.comp_shape)
    flat_y = y.reshape((-1,) + cv.fops.comp_shape)
    for i in range(flat_x.shape[0]):
        if not flat_x[i].any() and not flat_y[i].any():
            out.append(None)
        elif cv.name == "G1":
            out.append((FP.from_mont_limbs(flat_x[i]), FP.from_mont_limbs(flat_y[i])))
        else:
            out.append((
                (FP.from_mont_limbs(flat_x[i][0]), FP.from_mont_limbs(flat_x[i][1])),
                (FP.from_mont_limbs(flat_y[i][0]), FP.from_mont_limbs(flat_y[i][1])),
            ))
    return out

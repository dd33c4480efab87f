"""Vectorized Montgomery arithmetic over the BN254 prime fields, in JAX.

All device-side field elements are ``uint32[..., 16]`` little-endian base-2^16
limb vectors in Montgomery form with R = 2**256 (see `limbs.py`).  Every op
here is a pure, jittable function broadcasting over arbitrary leading batch
dimensions — the TPU analog of the reference's one-scalar-at-a-time operator
overloads (`groth16/bn128/fields.nim:110-133`), redesigned SoA/batched so XLA
can keep the VPU lanes full.

Montgomery multiplication uses the SOS (separated operand scanning) method
with every 32-bit partial product split into 16-bit lo/hi halves before column
accumulation, so all intermediate column sums stay < 2**23 and fit uint32
lanes exactly — the TPU has no widening integer multiply.

Field parameters (both primes, their Montgomery constants) are checked in
tests against the constants hardcoded in the reference
(`groth16/bn128/fields.nim:36-50`, `groth16/bn128/io.nim:87-92`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field as dc_field

import numpy as np
import jax
import jax.numpy as jnp

from .limbs import LIMB_BITS, LIMB_MASK, N_LIMBS, int_to_limbs, limbs_to_int

# BN254 ("alt-bn128") base and scalar field moduli — reference
# groth16/bn128/fields.nim:36-37.
P_FP = 21888242871839275222246405745257275088696311157297823662689037894645226208583
P_FR = 21888242871839275222246405745257275088548364400416034343698204186575808495617

R_MONT = 1 << 256  # Montgomery radix, matches the circom wire format


@dataclass(frozen=True)
class FieldParams:
    """Precomputed constants for one prime field (host ints + numpy limbs)."""

    modulus: int
    name: str = "F"

    def __post_init__(self):
        object.__setattr__(self, "n0", (-pow(self.modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS))
        object.__setattr__(self, "mont_r", R_MONT % self.modulus)          # R mod p  == to_mont(1)
        object.__setattr__(self, "mont_r2", (R_MONT * R_MONT) % self.modulus)  # R^2 mod p
        object.__setattr__(self, "mont_r_inv", pow(R_MONT, -1, self.modulus))
        object.__setattr__(self, "p_limbs", int_to_limbs(self.modulus))
        # 2^256 - p, used for the branchless conditional subtraction
        object.__setattr__(self, "pc_limbs", int_to_limbs((R_MONT - self.modulus) % R_MONT))
        # -p^-1 mod 2^256, for the separated Montgomery reduction
        object.__setattr__(self, "pprime_limbs",
                           int_to_limbs((-pow(self.modulus, -1, R_MONT)) % R_MONT))
        object.__setattr__(self, "r2_limbs", int_to_limbs(self.mont_r2))
        object.__setattr__(self, "one_mont_limbs", int_to_limbs(self.mont_r))

    # ---- host-side (Python int) helpers ------------------------------------
    def to_mont_int(self, x: int) -> int:
        return (x * R_MONT) % self.modulus

    def from_mont_int(self, x: int) -> int:
        return (x * self.mont_r_inv) % self.modulus

    def to_mont_limbs(self, x: int) -> np.ndarray:
        """Plain integer -> Montgomery limb vector (host)."""
        return int_to_limbs(self.to_mont_int(x % self.modulus))

    def from_mont_limbs(self, limbs) -> int:
        """Montgomery limb vector -> plain integer (host)."""
        return self.from_mont_int(limbs_to_int(np.asarray(limbs)))

    def to_mont_array(self, xs) -> np.ndarray:
        """Iterable of plain ints -> uint32[N,16] Montgomery limbs (host)."""
        out = np.zeros((len(xs), N_LIMBS), dtype=np.uint32)
        for j, x in enumerate(xs):
            out[j] = self.to_mont_limbs(x)
        return out

    def from_mont_array(self, arr) -> list:
        arr = np.asarray(arr)
        flat = arr.reshape(-1, arr.shape[-1])
        return [self.from_mont_limbs(flat[j]) for j in range(flat.shape[0])]


FP = FieldParams(P_FP, "Fp")
FR = FieldParams(P_FR, "Fr")


# ---------------------------------------------------------------------------
# low-level limb helpers (jnp, jittable)
#
# The multiply core is structured as wide tensor ops, not unrolled limb
# loops: a batched outer product, one integer matmul against a constant 0/1
# convolution matrix (column collection), and log-depth Kogge-Stone carry
# propagation.  This keeps the XLA graph per field-multiply small (~100 flat
# ops) with a short critical path — essential because curve/scan code
# instantiates it hundreds of times per traced program.
# ---------------------------------------------------------------------------

def _build_conv_matrix(out_cols: int) -> np.ndarray:
    """[512, out_cols] 0/1 matrix: row i*16+j of the `lo` half feeds column
    i+j, of the `hi` half column i+j+1."""
    m = np.zeros((512, out_cols), np.uint32)
    for i in range(N_LIMBS):
        for j in range(N_LIMBS):
            if i + j < out_cols:
                m[i * N_LIMBS + j, i + j] = 1
            if i + j + 1 < out_cols:
                m[256 + i * N_LIMBS + j, i + j + 1] = 1
    return m


_CONV33 = _build_conv_matrix(33)
_CONV16 = _build_conv_matrix(16)


def _mul_columns(a: jnp.ndarray, b: jnp.ndarray, out_cols: int) -> jnp.ndarray:
    """Column sums of the 16x16-limb schoolbook product (un-normalized).

    a, b: uint32[..., 16] canonical limbs.  Output uint32[..., out_cols],
    every column < 32 * 2^16 < 2^21 (safe in uint32 lanes).

    Lowered as batched outer product + one integer matmul against a constant
    0/1 convolution matrix — ~6 flat XLA ops per multiply.  An explicit
    16-step shift-and-add schoolbook would do ~17x less arithmetic, but it
    also emits ~19x more HLO ops, and XLA:CPU compile time (superlinear in
    module size) dominates every cold path in this framework — a single
    point-add formula built on the schoolbook form costs minutes instead of
    seconds to compile.  One lowering, every backend.
    """
    prod = a[..., :, None] * b[..., None, :]              # exact: both < 2^16
    lo = (prod & LIMB_MASK).reshape(*prod.shape[:-2], 256)
    hi = (prod >> LIMB_BITS).reshape(*prod.shape[:-2], 256)
    conv = jnp.asarray(_CONV33 if out_cols == 33 else _CONV16)
    cat = jnp.concatenate([lo, hi], axis=-1)              # [..., 512]
    return jax.lax.dot_general(
        cat, conv, (((cat.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.uint32)


def _shift_up(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Shift limbs toward higher indices by d (zero fill): out[i] = x[i-d]."""
    pads = [(0, 0)] * (x.ndim - 1) + [(d, 0)]
    return jnp.pad(x, pads)[..., : x.shape[-1]]


def _ks_norm(z: jnp.ndarray, out_limbs: int):
    """Exact carry propagation of base-2^16 columns (< 2^26 each) into
    canonical limbs, via Kogge-Stone carry-lookahead (log2(L) rounds).

    Returns (uint32[..., out_limbs] with limbs < 2^16, carry_out 0/1).
    Any carry beyond out_limbs is truncated into carry_out (callers either
    know it is zero or deliberately work mod 2^(16*out_limbs)).
    """
    L = out_limbs
    C = z.shape[-1]
    if C < L:
        z = jnp.pad(z, [(0, 0)] * (z.ndim - 1) + [(0, L - C)])
    elif C > L:
        z = z[..., :L]
    s = z & LIMB_MASK
    c = z >> LIMB_BITS                       # < 2^10 for our column bounds
    t = s + _shift_up(c, 1)                  # < 2^17: generate is 0/1
    G = t >> LIMB_BITS
    P = ((t & LIMB_MASK) == LIMB_MASK).astype(jnp.uint32)
    d = 1
    while d < L:
        G = G | (P & _shift_up(G, d))
        P = P & _shift_up(P, d)
        d *= 2
    out = (t + _shift_up(G, 1)) & LIMB_MASK
    # total carry out of limb L-1: the raw top-column carry c[L-1] (shifted
    # out of the t pre-add) plus the lookahead carry G[L-1]
    return out, c[..., L - 1] + G[..., L - 1]


def _cond_sub_p(fp: FieldParams, r: jnp.ndarray) -> jnp.ndarray:
    """Branchless `if r >= p: r -= p` for canonical r < 2p."""
    pc = jnp.asarray(fp.pc_limbs)  # 2^256 - p
    d, carry = _ks_norm(r + pc, N_LIMBS)
    ge = carry > 0  # r + (2^256 - p) >= 2^256  <=>  r >= p
    return jnp.where(ge[..., None], d, r)


def _mont_reduce_cols(fp: FieldParams, z_cols: jnp.ndarray) -> jnp.ndarray:
    """Separated Montgomery reduction of a 33-column accumulator
    (value < p*R) to the canonical residue value*R^-1 mod p.

      m = (z mod R) * (-p^-1 mod R) mod R;   t = (z + m*p) / R  < 2p
    """
    zt, _ = _ks_norm(z_cols, 33)                          # exact 33 limbs
    pprime = jnp.asarray(fp.pprime_limbs)                 # -p^-1 mod 2^256
    m_cols = _mul_columns(zt[..., :N_LIMBS], pprime, 16)
    m, _ = _ks_norm(m_cols, N_LIMBS)                      # mod 2^256
    mp = _mul_columns(m, jnp.asarray(fp.p_limbs), 33)
    t, _ = _ks_norm(mp + zt, 33)                          # low 16 limbs == 0
    return _cond_sub_p(fp, t[..., N_LIMBS:2 * N_LIMBS])   # t/R < 2p fits 16 limbs


# ---------------------------------------------------------------------------
# public field ops (all jittable; `fp` is static)
# ---------------------------------------------------------------------------

_jit_fp = functools.partial(jax.jit, static_argnums=0)


@_jit_fp
def mont_mul(fp: FieldParams, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product  a*b*R^-1 mod p  on uint32[..., 16] batches."""
    a, b = jnp.broadcast_arrays(a, b)
    return _mont_reduce_cols(fp, _mul_columns(a, b, 33))


@_jit_fp
def mont_sqr(fp: FieldParams, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(fp, a, a)


@_jit_fp
def mont_reduce_wide(fp: FieldParams, t: jnp.ndarray) -> jnp.ndarray:
    """Reduce a canonical double-width value t (uint32[..., 32], limbs < 2^16,
    value < p*R) to  t*R^-1 mod p."""
    return _mont_reduce_cols(fp, jnp.pad(t, [(0, 0)] * (t.ndim - 1) + [(0, 1)]))


@_jit_fp
def mont_reduce(fp: FieldParams, a: jnp.ndarray) -> jnp.ndarray:
    """a * R^-1 mod p for single-width a (strips one Montgomery factor)."""
    return _mont_reduce_cols(
        fp, jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, N_LIMBS + 1)]))


@_jit_fp
def to_mont(fp: FieldParams, a: jnp.ndarray) -> jnp.ndarray:
    """Standard residue -> Montgomery form (multiply by R^2, reduce)."""
    return mont_mul(fp, a, jnp.asarray(fp.r2_limbs))


@_jit_fp
def from_mont(fp: FieldParams, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> standard residue."""
    return mont_reduce(fp, a)


@_jit_fp
def add_mod(fp: FieldParams, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s, _carry = _ks_norm(a + b, N_LIMBS)
    # a, b < p < 2^255 so a+b < 2^256: carry always 0
    return _cond_sub_p(fp, s)


@_jit_fp
def sub_mod(fp: FieldParams, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    # a - b + p  ==  a + p + (~b mod 2^256) + 1   (drop the 2^256 wrap)
    a, b = jnp.broadcast_arrays(a, b)
    t = a + jnp.asarray(fp.p_limbs) + (b ^ LIMB_MASK)
    one = jnp.zeros((N_LIMBS,), jnp.uint32).at[0].set(1)
    s, _carry = _ks_norm(t + one, N_LIMBS)  # wrap bit discarded: a+p-b < 2p
    return _cond_sub_p(fp, s)


@_jit_fp
def neg_mod(fp: FieldParams, a: jnp.ndarray) -> jnp.ndarray:
    return sub_mod(fp, jnp.zeros_like(a), a)


@_jit_fp
def double_mod(fp: FieldParams, a: jnp.ndarray) -> jnp.ndarray:
    return add_mod(fp, a, a)


def is_zero(fp: FieldParams, a: jnp.ndarray) -> jnp.ndarray:
    """Elementwise zero test -> bool[...] (canonical representation assumed)."""
    return jnp.all(a == 0, axis=-1)


def eq(fp: FieldParams, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def select(cond: jnp.ndarray, a, b):
    """Elementwise select on limb vectors; cond is bool[...]."""
    return jnp.where(cond[..., None], a, b)


@functools.partial(jax.jit, static_argnums=(0, 2))
def pow_mod(fp: FieldParams, a: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """a ** exponent (Montgomery in, Montgomery out) for a static int exponent.

    Right-to-left binary ladder driven by `lax.scan`, so the montmul body is
    traced once regardless of exponent width.
    """
    nbits = max(1, exponent.bit_length())
    bits = jnp.asarray([(exponent >> i) & 1 for i in range(nbits)], dtype=jnp.uint32)
    one = jnp.broadcast_to(jnp.asarray(fp.one_mont_limbs), a.shape)

    def body(carry, bit):
        acc, base = carry
        acc2 = mont_mul(fp, acc, base)
        acc = select(jnp.broadcast_to(bit > 0, acc.shape[:-1]), acc2, acc)
        base = mont_sqr(fp, base)
        return (acc, base), None

    (acc, _), _ = jax.lax.scan(body, (one, a), bits)
    return acc


@_jit_fp
def pow_mod_u32(fp: FieldParams, base: jnp.ndarray, exps: jnp.ndarray) -> jnp.ndarray:
    """base ** exps for a single Montgomery base and a *traced* uint32
    exponent array; returns [..., 16].  32-step binary ladder (used by the
    sharded NTT's on-device twiddle construction)."""
    exps = exps.astype(jnp.uint32)
    one = jnp.broadcast_to(jnp.asarray(fp.one_mont_limbs), exps.shape + (N_LIMBS,))

    def body(carry, i):
        acc, b = carry
        bit = (exps >> i) & 1
        acc2 = mont_mul(fp, acc, b)
        acc = select(bit > 0, acc2, acc)
        return (acc, mont_mul(fp, b, b)), None

    (acc, _), _ = jax.lax.scan(body, (one, base), jnp.arange(32, dtype=jnp.uint32))
    return acc


@_jit_fp
def inv_mod(fp: FieldParams, a: jnp.ndarray) -> jnp.ndarray:
    """Batched modular inverse via Fermat (a^(p-2)); inverse of 0 is 0."""
    return pow_mod(fp, a, fp.modulus - 2)


@_jit_fp
def batch_inverse(fp: FieldParams, xs: jnp.ndarray) -> jnp.ndarray:
    """Montgomery batch inversion over the leading axis (pattern of the
    reference's `batchInverseFr`, groth16/bn128/fields.nim:163-174):
    one Fermat inversion + O(n) multiplications, as two scans."""
    n = xs.shape[0]
    one = jnp.asarray(fp.one_mont_limbs)

    def fwd(acc, x):
        nxt = mont_mul(fp, acc, x)
        return nxt, acc  # prefix product *excluding* x

    total, prefix = jax.lax.scan(fwd, one, xs)  # prefix[i] = x0*...*x_{i-1}
    inv_total = inv_mod(fp, total)

    def bwd(acc, xp):
        x, pref = xp
        out = mont_mul(fp, acc, pref)       # = 1/x_i
        acc = mont_mul(fp, acc, x)          # suffix inverse product
        return acc, out

    _, invs = jax.lax.scan(bwd, inv_total, (xs, prefix), reverse=True)
    return invs


@functools.partial(jax.jit, static_argnums=(0, 2))
def mul_small(fp: FieldParams, a: jnp.ndarray, k: int) -> jnp.ndarray:
    """a * k for a tiny static non-negative integer k (addition chain)."""
    if k == 0:
        return jnp.zeros_like(a)
    acc = None
    addend = a
    while k:
        if k & 1:
            acc = addend if acc is None else add_mod(fp, acc, addend)
        k >>= 1
        if k:
            addend = double_mod(fp, addend)
    return acc


@functools.partial(jax.jit, static_argnums=(0, 2))
def powers(fp: FieldParams, base: jnp.ndarray, n: int) -> jnp.ndarray:
    """[1, base, base^2, ..., base^(n-1)] (Montgomery), built by log-doubling.

    TPU-friendly replacement for the reference's sequential
    `multiplyByPowers` prefix loop (groth16/prover.nim:96-106): log2(n)
    rounds of full-width vector multiplies.
    """
    assert n >= 1
    out = jnp.asarray(fp.one_mont_limbs)[None, :]
    cur = 1
    while cur < n:
        bp = mont_mul(fp, out[cur - 1], base)  # = base^cur
        take = min(cur, n - cur)
        nxt = mont_mul(fp, out[:take], bp[None, :])
        out = jnp.concatenate([out, nxt], axis=0)
        cur += take
    return out

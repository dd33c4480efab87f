"""Dense polynomials over Fr, batched on device.

Mirrors the behavior of the reference's `groth16/math/poly.nim` (Poly type,
add/sub/scale, naive & FFT multiplication, vanishing-polynomial division,
Lagrange evaluation) but stores coefficients as uint32[N, 16] Montgomery limb
arrays and keeps every op a fixed-shape vector program.  Unlike the reference,
`poly_mul` defaults to the FFT path (the reference defaults to the O(n^2)
naive product, `poly.nim:144-147` — a CPU-small-input choice).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import field as F
from . import ntt as NT
from .field import FR
from .limbs import N_LIMBS, int_to_limbs


def _one_mont():
    return jnp.asarray(FR.one_mont_limbs)


def poly_from_ints(coeffs) -> jnp.ndarray:
    return jnp.asarray(FR.to_mont_array(list(coeffs)))


def poly_to_ints(coeffs: jnp.ndarray) -> list:
    return FR.from_mont_array(np.asarray(coeffs))


@jax.jit
def poly_add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Coefficient-wise sum; operands padded to the longer length
    (reference polyAdd, poly.nim:69-80)."""
    n = max(a.shape[0], b.shape[0])
    a = jnp.pad(a, ((0, n - a.shape[0]), (0, 0)))
    b = jnp.pad(b, ((0, n - b.shape[0]), (0, 0)))
    return F.add_mod(FR, a, b)


@jax.jit
def poly_sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    n = max(a.shape[0], b.shape[0])
    a = jnp.pad(a, ((0, n - a.shape[0]), (0, 0)))
    b = jnp.pad(b, ((0, n - b.shape[0]), (0, 0)))
    return F.sub_mod(FR, a, b)


@jax.jit
def poly_neg(a: jnp.ndarray) -> jnp.ndarray:
    return F.neg_mod(FR, a)


@jax.jit
def poly_scale(s: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """s * a for a single Montgomery scalar s (reference polyScale)."""
    return F.mont_mul(FR, a, s[None, :])


@jax.jit
def poly_eval_at(a: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Horner evaluation at one Montgomery point (reference polyEvalAt,
    poly.nim:57-65) — a lax.scan over coefficients, highest first."""
    def body(acc, c):
        return F.add_mod(FR, F.mont_mul(FR, acc, x), c), None

    acc0 = jnp.zeros((N_LIMBS,), jnp.uint32)
    acc, _ = jax.lax.scan(body, acc0, a[::-1])
    return acc


@jax.jit
def poly_mul_naive(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """O(n*m) schoolbook product as a batched outer product + anti-diagonal
    segment sums (reference polyMulNaive, poly.nim:105-122)."""
    n, m = a.shape[0], b.shape[0]
    prod = F.mont_mul(FR, a[:, None, :], b[None, :, :])      # [n, m, 16]
    out = jnp.zeros((n + m - 1, N_LIMBS), jnp.uint32)
    # accumulate shifted rows with modular adds: static loop over m (small
    # operands only; huge inputs take poly_mul_fft)
    for j in range(m):
        out = jax.lax.dynamic_update_slice(
            out,
            F.add_mod(FR, jax.lax.dynamic_slice(out, (j, 0), (n, N_LIMBS)), prod[:, j, :]),
            (j, 0),
        )
    return out


def poly_mul_fft(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """FFT product (reference polyMulFFT, poly.nim:127-140): zero-extend both
    to the next power of two above deg(a)+deg(b), pointwise multiply in the
    evaluation domain, transform back."""
    n, m = a.shape[0], b.shape[0]
    out_len = n + m - 1
    log2 = max(1, (out_len - 1).bit_length())
    dom = NT.Domain(log2)
    fa = NT.extend_forward_ntt(dom, a, log2)
    fb = NT.extend_forward_ntt(dom, b, log2)
    fc = F.mont_mul(FR, fa, fb)
    return NT.inverse_ntt(dom, fc)[:out_len]


def poly_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Defaults to FFT (TPU-first choice; cf. reference default to naive at
    poly.nim:144-147)."""
    if a.shape[0] * b.shape[0] <= 1 << 12:
        return poly_mul_naive(a, b)
    return poly_mul_fft(a, b)


# ---------------------------------------------------------------------------
# Vanishing polynomial  Z(x) = x^N - 1  helpers (reference poly.nim:163-218)
# ---------------------------------------------------------------------------

def vanishing_poly(dom_size: int, a: int = 1, b: int = 1) -> jnp.ndarray:
    """a*x^N - b as Montgomery coefficients (reference mkVanishingPoly)."""
    r = FR.modulus
    out = np.zeros((dom_size + 1, N_LIMBS), np.uint32)
    out[0] = int_to_limbs((-b) % r * F.R_MONT % r)
    out[dom_size] = int_to_limbs(a % r * F.R_MONT % r)
    return jnp.asarray(out)


@functools.partial(jax.jit, static_argnums=1)
def poly_divmod_vanishing(p: jnp.ndarray, dom_size: int):
    """(quotient, remainder) of p by x^N - 1 in O(n) vector work
    (reference polyQuotRem, poly.nim:186-218).

    Expanding the synthetic-division recurrence q_j = p_{j+N} + q_{j+N} gives
    the closed forms  q_j = sum_{t>=1} p_{j+tN}  and  r_i = sum_{t>=0} p_{i+tN}
    — i.e. reshape the coefficients into blocks of N and take block suffix
    sums: ceil(n/N) full-width modular adds, no per-coefficient loop.
    """
    n = p.shape[0]
    N = dom_size
    if n <= N:
        return jnp.zeros((1, N_LIMBS), jnp.uint32), jnp.pad(p, ((0, N - n), (0, 0)))
    nb = -(-n // N)
    ppad = jnp.pad(p, ((0, nb * N - n), (0, 0))).reshape(nb, N, N_LIMBS)
    acc = ppad[nb - 1]
    q_blocks = [None] * (nb - 1)
    for blk in range(nb - 2, -1, -1):
        q_blocks[blk] = acc                      # = sum_{t > blk} ppad[t]
        acc = F.add_mod(FR, acc, ppad[blk])
    q = jnp.concatenate(q_blocks, 0)[: n - N]
    return q, acc


# ---------------------------------------------------------------------------
# Lagrange basis (reference poly.nim:223-250)
# ---------------------------------------------------------------------------

def lagrange_eval_off_domain(dom: NT.Domain, k: int, zeta: int) -> int:
    """L_k(zeta) for zeta off the domain, closed form
    omega^k (zeta^N - 1) / (N (zeta - omega^k))  — host ints
    (reference evalLagrangePolyAt, poly.nim:242-250)."""
    r = FR.modulus
    wk = pow(dom.gen, k, r)
    num = wk * (pow(zeta, dom.size, r) - 1) % r
    den = dom.size * (zeta - wk) % r
    return num * pow(den, -1, r) % r


def lagrange_evals_at(dom: NT.Domain, zeta: int) -> list:
    """[L_k(zeta)] for all k — host ints, batch-inverted denominator."""
    r = FR.modulus
    zn = (pow(zeta, dom.size, r) - 1) % r
    out = []
    wk = 1
    for _ in range(dom.size):
        den = dom.size * (zeta - wk) % r
        out.append(wk * zn % r * pow(den, -1, r) % r)
        wk = wk * dom.gen % r
    return out

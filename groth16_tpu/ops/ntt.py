"""Radix-2 NTT over the BN254 scalar field, vectorized for TPU.

TPU-native design: instead of the reference's recursive scalar DIT FFT with a
2N scratch buffer (`groth16/math/ntt.nim:17-50`), we run an **iterative DIF**
transform: log2(N) stages, each a full-width reshape + batched Montgomery
butterfly, plus one precomputed bit-reversal gather — log2(N) rounds of VPU
work over the whole array, no recursion, no data-dependent control flow.

Domain semantics are behavior-identical to the reference
(`groth16/math/domain.nim:26-46`): the 2^k root of unity is derived from the
generator of the 2^28 subgroup, gen28 = 5^((r-1)/2^28) where 5 is the circom
ecosystem's standard Fr multiplicative generator — the same constant hardcoded
at `domain.nim:26`.  forwardNTT maps coefficients -> evaluations on
[g^0..g^(N-1)] and inverseNTT is its exact inverse with the 1/N fold
(`ntt.nim:55-77,139-161`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from . import field as F
from .field import FR
from .limbs import N_LIMBS, int_to_limbs

# Generator of the 2^28 multiplicative subgroup of Fr^*; equals the constant
# at reference groth16/math/domain.nim:26 (pinned in tests).
GEN28 = pow(5, (FR.modulus - 1) >> 28, FR.modulus)
MAX_LOG2 = 28


@dataclass(frozen=True)
class Domain:
    """Power-of-two evaluation domain (host constants; hashable for jit)."""

    log2_size: int

    def __post_init__(self):
        assert 0 <= self.log2_size <= MAX_LOG2
        r = FR.modulus
        g = pow(GEN28, 1 << (MAX_LOG2 - self.log2_size), r)
        object.__setattr__(self, "size", 1 << self.log2_size)
        object.__setattr__(self, "gen", g)
        object.__setattr__(self, "gen_inv", pow(g, -1, r))
        object.__setattr__(self, "size_inv", pow(self.size, -1, r))

    def __hash__(self):
        return hash(("Domain", self.log2_size))

    @functools.cached_property
    def twiddles(self) -> np.ndarray:
        """[size/2, 16] Montgomery powers g^0..g^(N/2-1) (host-precomputed)."""
        return _twiddle_table(self.gen, max(1, self.size // 2))

    @functools.cached_property
    def inv_twiddles(self) -> np.ndarray:
        return _twiddle_table(self.gen_inv, max(1, self.size // 2))

    @functools.cached_property
    def bitrev(self) -> np.ndarray:
        """Bit-reversal permutation of [0, N): one gather applied after the
        DIF stages to restore natural order."""
        n, lg = self.size, self.log2_size
        idx = np.arange(n, dtype=np.int32)
        rev = np.zeros(n, np.int32)
        for b in range(lg):
            rev |= ((idx >> b) & 1) << (lg - 1 - b)
        return rev

    def enumerate(self) -> list:
        """[g^0, ..., g^(N-1)] as plain ints (reference domain.nim:50-56)."""
        out, acc, r = [], 1, FR.modulus
        for _ in range(self.size):
            out.append(acc)
            acc = acc * self.gen % r
        return out


def _twiddle_table(g: int, n: int) -> np.ndarray:
    r = FR.modulus
    out = np.zeros((n, N_LIMBS), np.uint32)
    acc = 1
    for i in range(n):
        out[i] = int_to_limbs(acc * F.R_MONT % r)
        acc = acc * g % r
    return out


def create_domain(size: int) -> Domain:
    log2 = max(0, (size - 1).bit_length())
    assert (1 << log2) == size, "domain must have a power-of-two size"
    return Domain(log2)


# ---------------------------------------------------------------------------
# Stockham NTT core
# ---------------------------------------------------------------------------

def _dif_stages(xs: jnp.ndarray, tw: jnp.ndarray, bitrev: jnp.ndarray, log2n: int) -> jnp.ndarray:
    """Iterative radix-2 DIF transform: natural-order in, natural-order out.

    `xs`: uint32[N, 16] Montgomery coefficients.  `tw`: [N/2, 16] powers of
    the root (forward or inverse).  Stage s views the data as [L, M, 16] with
    L = 2^s independent sub-transforms of length M = N/2^s; the butterfly
    combines the two halves of each block with twiddle stride L.  The DIF
    cascade leaves frequencies in bit-reversed row order, restored by one
    precomputed gather at the end.
    """
    n = 1 << log2n
    if log2n == 0:
        return xs
    x = xs.reshape(1, n, N_LIMBS)
    for s in range(log2n):
        L = 1 << s
        half = x.shape[1] // 2
        a = x[:, :half]                      # [L, M/2, 16]
        b = x[:, half:]
        w = tw[::L][None, :, :]              # [1, M/2, 16] twiddle stride L
        top = F.add_mod(FR, a, b)            # -> even frequencies of the block
        bot = F.mont_mul(FR, F.sub_mod(FR, a, b), w)  # -> odd frequencies
        x = jnp.stack([top, bot], axis=1).reshape(2 * L, half, N_LIMBS)
    return x.reshape(n, N_LIMBS)[bitrev]


@functools.partial(jax.jit, static_argnums=0)
def forward_ntt(dom: Domain, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Coefficients -> evaluations on the domain (reference ntt.nim:55-77).

    Input/output uint32[N, 16] Montgomery Fr.  On TPU at kernel-worthy
    sizes the four-step Pallas path (ops/ntt_pallas.py) runs instead of the
    jnp stages — bit-identical (pinned by tests/test_ntt_tpu.py).
    """
    assert coeffs.shape == (dom.size, N_LIMBS)
    from . import ntt_pallas as NP
    if NP.available(dom.log2_size):
        return NP.forward_ntt(dom, coeffs)
    return _dif_stages(coeffs, jnp.asarray(dom.twiddles), jnp.asarray(dom.bitrev), dom.log2_size)


@functools.partial(jax.jit, static_argnums=0)
def inverse_ntt(dom: Domain, values: jnp.ndarray) -> jnp.ndarray:
    """Evaluations on the domain -> coefficients (reference ntt.nim:139-161)."""
    assert values.shape == (dom.size, N_LIMBS)
    from . import ntt_pallas as NP
    if NP.available(dom.log2_size):
        return NP.inverse_ntt(dom, values)
    out = _dif_stages(values, jnp.asarray(dom.inv_twiddles), jnp.asarray(dom.bitrev), dom.log2_size)
    ninv = jnp.asarray(int_to_limbs(dom.size_inv * F.R_MONT % FR.modulus))
    return F.mont_mul(FR, out, ninv[None, :])


@functools.partial(jax.jit, static_argnums=(0, 2))
def extend_forward_ntt(dom: Domain, coeffs: jnp.ndarray, log2_ext: int) -> jnp.ndarray:
    """Zero-pad to 2^log2_ext and forward-NTT (reference ntt.nim:81-91)."""
    big = Domain(log2_ext)
    pad = big.size - coeffs.shape[0]
    assert pad >= 0
    xs = jnp.concatenate([coeffs, jnp.zeros((pad, N_LIMBS), jnp.uint32)], 0)
    return forward_ntt(big, xs)


@functools.partial(jax.jit, static_argnums=(0,))
def mul_by_powers(dom: Domain, xs: jnp.ndarray, eta_mont: jnp.ndarray) -> jnp.ndarray:
    """[eta^i * xs[i]]: coset scaling (reference prover.nim:96-106), using the
    log-doubling powers builder instead of a sequential prefix loop."""
    pw = F.powers(FR, eta_mont, xs.shape[0])
    return F.mont_mul(FR, xs, pw)


@functools.partial(jax.jit, static_argnums=(0,))
def shift_eval_domain(dom: Domain, values: jnp.ndarray, eta_mont: jnp.ndarray) -> jnp.ndarray:
    """Values on domain -> values on the eta-shifted coset
    (iNTT -> scale by eta^i -> NTT); reference prover.nim:109-113."""
    cs = inverse_ntt(dom, values)
    return forward_ntt(dom, mul_by_powers(dom, cs, eta_mont))

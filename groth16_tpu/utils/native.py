"""ctypes loader for the native host backend (csrc/bn254_host.cpp).

The shared library is built lazily with g++ on first use and cached under
`.native_cache/` keyed by a hash of the source, so the repo needs no build
step and works without a compiler (every caller falls back to the pure
Python implementations in utils/hostmath.py / utils/pairing.py).

Disable with GROTH16_TPU_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "csrc", "bn254_host.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.join(_REPO, ".native_cache")
    so = os.path.join(cache_dir, f"libbn254host-{tag}.so")
    if os.path.exists(so):
        return so
    os.makedirs(cache_dir, exist_ok=True)
    tmp = so + f".tmp{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    os.replace(tmp, so)
    return so


def lib():
    """The loaded library, or None (no compiler / disabled / build failed)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if _TRIED:
            return _LIB
        if os.environ.get("GROTH16_TPU_NATIVE", "1") in ("0", "false"):
            _TRIED = True
            return None
        so = _build() if os.path.exists(_SRC) else None
        if so:
            L = ctypes.CDLL(so)
            for name, argn in (("bn254_miller_loop", 3), ("bn254_fp12_mul", 3),
                               ("bn254_fp12_inv", 2), ("bn254_fp12_is_one", 1),
                               ("bn254_g1_add", 3), ("bn254_g1_mul", 3),
                               ("bn254_g2_add", 3), ("bn254_g2_mul", 3)):
                fn = getattr(L, name)
                fn.restype = ctypes.c_int
                fn.argtypes = [ctypes.c_char_p] * argn
            L.bn254_fp12_pow.restype = ctypes.c_int
            L.bn254_fp12_pow.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                         ctypes.c_int, ctypes.c_char_p]
            _LIB = L
        _TRIED = True
        return _LIB


def available() -> bool:
    return lib() is not None


# --- byte conversions (32B little-endian standard form per Fp) ---------------

def fp_bytes(x: int) -> bytes:
    return int(x).to_bytes(32, "little")


def fp2_bytes(c) -> bytes:
    return fp_bytes(c[0]) + fp_bytes(c[1])


def g1_bytes(pt) -> bytes:
    return b"\0" * 64 if pt is None else fp_bytes(pt[0]) + fp_bytes(pt[1])


def g2_bytes(pt) -> bytes:
    return b"\0" * 128 if pt is None else fp2_bytes(pt[0]) + fp2_bytes(pt[1])


def g1_from_bytes(b: bytes):
    x = int.from_bytes(b[:32], "little")
    y = int.from_bytes(b[32:64], "little")
    return None if x == 0 and y == 0 else (x, y)


def g2_from_bytes(b: bytes):
    c = [int.from_bytes(b[i * 32:(i + 1) * 32], "little") for i in range(4)]
    if not any(c):
        return None
    return ((c[0], c[1]), (c[2], c[3]))


def fp12_bytes(a) -> bytes:
    return b"".join(fp2_bytes(c) for c in a)


def fp12_from_bytes(b: bytes) -> tuple:
    out = []
    for k in range(6):
        c0 = int.from_bytes(b[64 * k:64 * k + 32], "little")
        c1 = int.from_bytes(b[64 * k + 32:64 * k + 64], "little")
        out.append((c0, c1))
    return tuple(out)


# --- high-level wrappers ------------------------------------------------------

def miller_loop(p, q) -> tuple | None:
    """Tate Miller value for affine host points, or None if native is
    unavailable (callers fall back to the Python loop)."""
    L = lib()
    if L is None:
        return None
    out = ctypes.create_string_buffer(384)
    rc = L.bn254_miller_loop(g1_bytes(p), g2_bytes(q), out)
    if rc != 0:
        raise ValueError("miller loop: G1 point not of order r")
    return fp12_from_bytes(out.raw)


def fp12_pow(a, e: int) -> tuple:
    L = lib()
    eb = int(e).to_bytes((max(e.bit_length(), 1) + 7) // 8, "little")
    out = ctypes.create_string_buffer(384)
    L.bn254_fp12_pow(fp12_bytes(a), eb, len(eb), out)
    return fp12_from_bytes(out.raw)


def g1_mul(k: int, pt):
    L = lib()
    out = ctypes.create_string_buffer(64)
    L.bn254_g1_mul(g1_bytes(pt), fp_bytes(k), out)
    return g1_from_bytes(out.raw)


def g1_add(a, b):
    L = lib()
    out = ctypes.create_string_buffer(64)
    L.bn254_g1_add(g1_bytes(a), g1_bytes(b), out)
    return g1_from_bytes(out.raw)


def g2_mul(k: int, pt):
    L = lib()
    out = ctypes.create_string_buffer(128)
    L.bn254_g2_mul(g2_bytes(pt), fp_bytes(k), out)
    return g2_from_bytes(out.raw)


def g2_add(a, b):
    L = lib()
    out = ctypes.create_string_buffer(128)
    L.bn254_g2_add(g2_bytes(a), g2_bytes(b), out)
    return g2_from_bytes(out.raw)

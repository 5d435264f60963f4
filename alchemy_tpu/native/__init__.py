"""ctypes bindings for the native C++ Zq/NTT kernel library.

Compiled on demand with g++ (no pip deps); the .so is cached next to the
source keyed by a content hash. Used by the checked mode (tests comparing
the JAX paths against an independent native implementation) and as a fast
CPU reference.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from functools import lru_cache

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "zq_kernels.cpp")


@lru_cache(maxsize=1)
def _lib():
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so = os.path.join(_DIR, f"_zq_kernels_{digest}.so")
    if not os.path.exists(so):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", so, _SRC],
            check=True,
        )
    lib = ctypes.CDLL(so)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.zq_add.argtypes = [u32p, u32p, u32p, ctypes.c_uint64, ctypes.c_uint32]
    lib.zq_sub.argtypes = [u32p, u32p, u32p, ctypes.c_uint64, ctypes.c_uint32]
    lib.zq_mul.argtypes = [u32p, u32p, u32p, ctypes.c_uint64, ctypes.c_uint32]
    lib.ntt_negacyclic.argtypes = [u32p, ctypes.c_uint64, ctypes.c_uint32, ctypes.c_uint32]
    lib.intt_negacyclic.argtypes = [u32p, ctypes.c_uint64, ctypes.c_uint32, ctypes.c_uint32]
    lib.bgv_mul_relin.argtypes = [u32p, u32p, u32p, u32p, u32p,
                                  ctypes.c_uint64, ctypes.c_uint64, u32p, u32p]
    return lib


def _p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _c(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.uint32))


def zq_elemwise(op: str, a, b, q: int) -> np.ndarray:
    a, b = _c(a), _c(b)
    out = np.empty_like(a)
    getattr(_lib(), f"zq_{op}")(_p(a), _p(b), _p(out), a.size, q)
    return out


def ntt(x, q: int, psi: int) -> np.ndarray:
    """Forward negacyclic NTT (bit-identical to backend/ntt.py)."""
    x = _c(x).copy()
    _lib().ntt_negacyclic(_p(x), x.size, q, psi)
    return x


def intt(x, q: int, psi: int) -> np.ndarray:
    x = _c(x).copy()
    _lib().intt_negacyclic(_p(x), x.size, q, psi)
    return x


def mul_relin(ct_a, ct_b, hb, ha, qs, psis) -> np.ndarray:
    """Native fused mul+relin: ct [2, L, n], hints [L, L, n] (NTT domain;
    bit-identical to she/fast.py with impl='vpu')."""
    ct_a, ct_b, hb, ha = map(_c, (ct_a, ct_b, hb, ha))
    two, L, n = ct_a.shape
    out = np.zeros_like(ct_a)
    qs_a = _c(np.asarray(qs))
    psis_a = _c(np.asarray(psis))
    _lib().bgv_mul_relin(_p(ct_a), _p(ct_b), _p(hb), _p(ha), _p(out),
                         L, n, _p(qs_a), _p(psis_a))
    return out

"""Native (C) CPU kernels: baseline measurement + fast host oracle.

Compiled on demand with gcc -O3; loaded via ctypes (no pybind11 in the
image). All kernels produce the same canonical residues as the device
path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libckks_core.so")
_SRC = os.path.join(_DIR, "ckks_core.c")
_lib = None


def _build():
    subprocess.run(
        ["gcc", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, _SRC],
        check=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        _lib = ctypes.CDLL(_SO)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        _lib.ckks_ntt_fwd.argtypes = [u64p, u64p, u64p, ctypes.c_uint64,
                                      ctypes.c_uint32]
        _lib.ckks_ntt_inv.argtypes = [u64p, u64p, u64p, ctypes.c_uint64,
                                      ctypes.c_uint64, ctypes.c_uint64,
                                      ctypes.c_uint32]
        _lib.ckks_modadd.argtypes = [u64p, u64p, u64p, ctypes.c_uint64,
                                     ctypes.c_size_t]
        _lib.ckks_modmul_barrett.argtypes = [u64p, u64p, u64p,
                                             ctypes.c_uint64,
                                             ctypes.c_uint64,
                                             ctypes.c_uint64,
                                             ctypes.c_size_t]
        _lib.ckks_mac.argtypes = [u64p, u64p, u64p, ctypes.c_uint64,
                                  ctypes.c_uint64, ctypes.c_uint64,
                                  ctypes.c_size_t]
        _lib.ckks_pow_table.argtypes = [ctypes.c_uint64, ctypes.c_uint64,
                                        u64p, ctypes.c_size_t]
        _lib.ckks_shoup_prec.argtypes = [u64p, ctypes.c_uint64, u64p,
                                         ctypes.c_size_t]
        _lib.ckks_twiddle_matrix.argtypes = [
            ctypes.c_uint64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_size_t,
            ctypes.c_size_t, u64p]
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def ntt_fwd_inplace(data: np.ndarray, rou: np.ndarray, rou_prec: np.ndarray,
                    q: int) -> None:
    lib = get_lib()
    lib.ckks_ntt_fwd(_ptr(data), _ptr(rou), _ptr(rou_prec), q, len(data))


def ntt_inv_inplace(data: np.ndarray, rou_inv: np.ndarray,
                    rou_inv_prec: np.ndarray, n_inv: int, n_inv_prec: int,
                    q: int) -> None:
    lib = get_lib()
    lib.ckks_ntt_inv(_ptr(data), _ptr(rou_inv), _ptr(rou_inv_prec),
                     n_inv, n_inv_prec, q, len(data))


def pow_table(base: int, q: int, n: int) -> np.ndarray:
    """[base^i mod q for i in range(n)] via the C kernel."""
    out = np.empty(n, dtype=np.uint64)
    get_lib().ckks_pow_table(base % q, q, _ptr(out), n)
    return out


def shoup_prec(w: np.ndarray, q: int) -> np.ndarray:
    """floor(w * 2^64 / q) elementwise via the C kernel."""
    w = np.ascontiguousarray(w, dtype=np.uint64)
    out = np.empty_like(w)
    get_lib().ckks_shoup_prec(_ptr(w), q, _ptr(out), w.size)
    return out.reshape(w.shape)


def twiddle_matrix(base: int, q: int, row_order: np.ndarray,
                   c: int) -> np.ndarray:
    """T[row_order[u], b] = base^(u*b) mod q, shape [len(row_order), c]."""
    import ctypes
    ro = np.ascontiguousarray(row_order, dtype=np.uint32)
    r = len(ro)
    out = np.empty((r, c), dtype=np.uint64)
    get_lib().ckks_twiddle_matrix(
        base % q, q, ro.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        r, c, _ptr(out))
    return out

"""ctypes bindings for the native host kernels (csrc/g1_msm.c).

Builds the shared library on first use (gcc -O3); falls back to the
pure-Python paths when the toolchain is unavailable (same
dispatch-with-fallback shape as the reference's CUDA hooks,
fft/domain.rs:374).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")


def _lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so_path = os.path.join(_CSRC, "libg1msm.so")
    src = os.path.join(_CSRC, "g1_msm.c")
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(src)):
            subprocess.run(
                ["gcc", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", so_path],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so_path)
        lib.g1_msm.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_size_t, ctypes.c_size_t, ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.g1_batch_scalar_mul.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_size_t, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _lib() is not None


_FRLIB = None
_FR_TRIED = False


def _frlib():
    """csrc/fr_ntt.c — the host Fr polynomial engine (NTT, pointwise ops,
    batch inversion), the snarkvm-algorithms fft CPU-path analog."""
    global _FRLIB, _FR_TRIED
    if _FRLIB is not None or _FR_TRIED:
        return _FRLIB
    _FR_TRIED = True
    so_path = os.path.join(_CSRC, "libfrntt.so")
    src = os.path.join(_CSRC, "fr_ntt.c")
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(src)):
            subprocess.run(
                ["gcc", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", so_path],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so_path)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.fr_ntt.argtypes = [u64p, ctypes.c_size_t, u64p, ctypes.c_int, u64p]
        lib.fr_batch_mul.argtypes = [u64p, u64p, ctypes.c_size_t]
        lib.fr_batch_inv.argtypes = [u64p, ctypes.c_size_t]
        lib.fr_powers.argtypes = [u64p, u64p, ctypes.c_size_t]
        lib.fr_powers_mont16.argtypes = [u32p, u64p, u64p, ctypes.c_size_t]
        lib.fr_matrix_evals.argtypes = [
            u64p, u32p, u32p, ctypes.c_size_t, u64p, u64p,
            ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t,
            u64p, u64p, u64p, u64p]
        _FRLIB = lib
    except Exception:
        _FRLIB = None
    return _FRLIB


def fr_available() -> bool:
    return _frlib() is not None


def _words4(values):
    data = b"".join(v.to_bytes(32, "little") for v in values)
    return np.frombuffer(data, dtype=np.uint64).reshape(-1, 4).copy()


def _unwords4(arr):
    data = arr.tobytes()
    return [int.from_bytes(data[i : i + 32], "little")
            for i in range(0, len(data), 32)]


def fr_ntt(vals, omega: int, inverse: bool = False, n_inv: int = 0):
    """In-place radix-2 NTT over Fr via the C engine; returns a new list."""
    lib = _frlib()
    u64p = ctypes.POINTER(ctypes.c_uint64)
    a = _words4(vals)
    om = _words4([omega])
    ni = _words4([n_inv])
    lib.fr_ntt(a.ctypes.data_as(u64p), len(vals), om.ctypes.data_as(u64p),
               1 if inverse else 0, ni.ctypes.data_as(u64p))
    return _unwords4(a)


def fr_batch_inv(vals):
    lib = _frlib()
    u64p = ctypes.POINTER(ctypes.c_uint64)
    a = _words4(vals)
    lib.fr_batch_inv(a.ctypes.data_as(u64p), len(vals))
    return _unwords4(a)


def fr_powers_np(g: int, n: int):
    """[n, 4] u64 canonical powers g^0..g^(n-1) (C indexer kernel)."""
    lib = _frlib()
    u64p = ctypes.POINTER(ctypes.c_uint64)
    gw = _words4([g])
    out = np.empty((n, 4), np.uint64)
    lib.fr_powers(out.ctypes.data_as(u64p), gw.ctypes.data_as(u64p), n)
    return out


def fr_powers_mont16_np(g: int, c: int, n: int):
    """[n, 16] u32 Montgomery 16-bit limb planes of c * g^i (the Domain
    twiddle/power-plane layout, ops/ntt.py) — C fast path."""
    lib = _frlib()
    u64p = ctypes.POINTER(ctypes.c_uint64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    gw = _words4([g])
    cw = _words4([c])
    out = np.empty((n, 16), np.uint32)
    lib.fr_powers_mont16(out.ctypes.data_as(u32p), gw.ctypes.data_as(u64p),
                         cw.ctypes.data_as(u64p), n)
    return out   # uint32, the int_to_limbs_py plane dtype


def fr_matrix_evals_np(vals_np, rows_np, cols_np, c_elems_np, v_elems_np,
                       variable_size: int, input_size: int, pad_to: int):
    """AHP arithmetization tables (matrices.rs:115) as [pad_to, 4] u64
    canonical arrays: (row, col, row_col, row_col_val)."""
    lib = _frlib()
    u64p = ctypes.POINTER(ctypes.c_uint64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    nnz = len(rows_np)
    outs = [np.empty((pad_to, 4), np.uint64) for _ in range(4)]
    lib.fr_matrix_evals(
        vals_np.ctypes.data_as(u64p),
        rows_np.ctypes.data_as(u32p), cols_np.ctypes.data_as(u32p), nnz,
        c_elems_np.ctypes.data_as(u64p), v_elems_np.ctypes.data_as(u64p),
        variable_size, input_size, pad_to,
        *(o.ctypes.data_as(u64p) for o in outs))
    return tuple(outs)


def _to_limbs64(values, n_limbs):
    arr = np.zeros((len(values), n_limbs), dtype=np.uint64)
    nbytes = n_limbs * 8
    data = b"".join(v.to_bytes(nbytes, "little") for v in values)
    arr[:] = np.frombuffer(data, dtype=np.uint64).reshape(-1, n_limbs)
    return arr


def _from_limbs64(arr):
    v = 0
    for j in range(len(arr)):
        v |= int(arr[j]) << (64 * j)
    return v


def msm_g1(points, scalars):
    """points: list of (x, y) canonical int tuples or None; scalars ints.
    Returns canonical Jacobian (X, Y, Z) int tuple, or None if the native
    library is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    n = len(points)
    xs = _to_limbs64([p[0] if p else 0 for p in points], 6)
    ys = _to_limbs64([p[1] if p else 0 for p in points], 6)
    inf = np.array([1 if p is None else 0 for p in points], dtype=np.uint8)
    sw = 4
    sc = _to_limbs64([s % (1 << 256) for s in scalars], sw)
    out = np.zeros(18, dtype=np.uint64)
    lib.g1_msm(
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        inf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n, sw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    X = _from_limbs64(out[0:6])
    Y = _from_limbs64(out[6:12])
    Z = _from_limbs64(out[12:18])
    return (X, Y, Z)


def batch_scalar_mul(base, scalars):
    """base: (x, y) canonical ints; scalars: list of ints (< 2^256).
    Returns list of canonical Jacobian tuples, or None if unavailable."""
    lib = _lib()
    if lib is None:
        return None
    n = len(scalars)
    px = _to_limbs64([base[0]], 6)
    py = _to_limbs64([base[1]], 6)
    sw = 4
    sc = _to_limbs64([s % (1 << 256) for s in scalars], sw)
    out = np.zeros((n, 18), dtype=np.uint64)
    lib.g1_batch_scalar_mul(
        px.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        py.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n, sw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    return [(_from_limbs64(row[0:6]), _from_limbs64(row[6:12]), _from_limbs64(row[12:18]))
            for row in out]

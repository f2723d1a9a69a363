"""ctypes bindings for the native host library (native/qct_native.cpp).

Provides:
  - kkt_solve_native: independent f64 block-tridiagonal KKT oracle / CPU
    fallback (validates the device scan in solver/kkt.py)
  - unitary_rollout_fidelity_native: batched f64 ground-truth rollout
    validation used by bench.py

The library is built lazily with native/build.sh on first use; all functions
raise NativeUnavailable if no toolchain is present (pure-JAX paths remain
fully functional without it).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = [
    "NativeUnavailable",
    "native_available",
    "kkt_solve_native",
    "unitary_rollout_fidelity_native",
]

_LIB = None
_TRIED = False


class NativeUnavailable(RuntimeError):
    pass


def _native_dir():
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
    )


def _load():
    global _LIB, _TRIED
    if _LIB is not None:
        return _LIB
    if _TRIED:
        raise NativeUnavailable("native library build failed previously")
    _TRIED = True
    d = _native_dir()
    so = os.path.join(d, "libqct_native.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["sh", os.path.join(d, "build.sh")],
                check=True,
                capture_output=True,
            )
        except Exception as e:  # no toolchain / build failure
            raise NativeUnavailable(f"could not build native library: {e}")
    lib = ctypes.CDLL(so)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.qct_kkt_solve.restype = ctypes.c_int
    lib.qct_kkt_solve.argtypes = [dp] * 6 + [
        ctypes.c_double,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        dp,
        dp,
    ]
    lib.qct_unitary_rollout_fidelity.restype = None
    lib.qct_unitary_rollout_fidelity.argtypes = [dp] * 5 + [
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        dp,
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def _cptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def kkt_solve_native(H, C, A, B, rz, rnu, delta_c: float):
    """Host f64 block-tridiagonal KKT solve. Shapes as solver.kkt.solve_kkt.

    Returns (dz (T,d), nu (T-1,s), ok).
    """
    lib = _load()
    H = np.ascontiguousarray(H, dtype=np.float64)
    C = np.ascontiguousarray(C, dtype=np.float64)
    A = np.ascontiguousarray(A, dtype=np.float64)
    B = np.ascontiguousarray(B, dtype=np.float64)
    rz = np.ascontiguousarray(rz, dtype=np.float64)
    rnu = np.ascontiguousarray(rnu, dtype=np.float64)
    T, d, _ = H.shape
    s = A.shape[1]
    dz = np.zeros((T, d))
    nu = np.zeros((T - 1, s))
    rc = lib.qct_kkt_solve(
        _cptr(H), _cptr(C), _cptr(A), _cptr(B), _cptr(rz), _cptr(rnu),
        ctypes.c_double(delta_c), T, d, s, _cptr(dz), _cptr(nu),
    )
    return dz, nu, rc == 0


def unitary_rollout_fidelity_native(G_drift, G_drives, a, dts, U_goal_iso):
    """Batched f64 rollout fidelities.

    G_drift (2N,2N); G_drives (m,2N,2N); a (B,T,m); dts (B,T);
    U_goal_iso (2N,N).  Returns (B,) fidelities.
    """
    lib = _load()
    Gd = np.ascontiguousarray(G_drift, dtype=np.float64)
    Gs = np.ascontiguousarray(G_drives, dtype=np.float64)
    a = np.ascontiguousarray(a, dtype=np.float64)
    dts = np.ascontiguousarray(dts, dtype=np.float64)
    Ug = np.ascontiguousarray(U_goal_iso, dtype=np.float64)
    B, T, m = a.shape
    N = Ug.shape[1]
    out = np.zeros(B)
    lib.qct_unitary_rollout_fidelity(
        _cptr(Gd), _cptr(Gs), _cptr(a), _cptr(dts), _cptr(Ug),
        B, T, m, N, _cptr(out),
    )
    return out

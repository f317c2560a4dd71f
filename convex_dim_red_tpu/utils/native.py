"""ctypes bindings to the native host-kernel library (csrc/).

Provides the C++ implementations of the host-side hot kernels (simplex
projection, batched simplex-QP, FurthestSum greedy) — the native tier
that the reference implements with Numba (SURVEY.md §2; numba is
unavailable in this image).  The library is built on demand with the
system g++ and cached; all entry points gracefully raise
``NativeUnavailable`` when no toolchain is present, and callers fall
back to the NumPy/JAX paths.
"""

import ctypes
import os
import subprocess

import numpy as np

__all__ = [
    "NativeUnavailable",
    "available",
    "simplex_project_rows_native",
    "quad_simplex_spg_batch_native",
    "furthest_sum_native",
]

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libcdrhost.so")
_lib = None


class NativeUnavailable(RuntimeError):
    pass


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True)
        except Exception as exc:
            raise NativeUnavailable(
                f"could not build {_LIB_PATH}: {exc}") from exc
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as exc:
        raise NativeUnavailable(str(exc)) from exc

    i64 = ctypes.c_int64
    f64 = ctypes.c_double
    pd = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    pi = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

    lib.simplex_project_rows.argtypes = [pd, i64, i64]
    lib.quad_simplex_spg_batch.argtypes = [pd, pd, pd, i64, i64, i64,
                                           f64, f64, f64, f64]
    lib.furthest_sum.argtypes = [pd, i64, i64, i64, i64, pi, i64, pi]
    _lib = lib
    return lib


def available():
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def simplex_project_rows_native(x):
    """Row-wise simplex projection (C++ sort-threshold)."""
    lib = _load()
    out = np.ascontiguousarray(np.asarray(x, dtype=np.float64)).copy()
    n, k = out.shape
    lib.simplex_project_rows(out, n, k)
    return out


def quad_simplex_spg_batch_native(A, B, X0, max_iterations=1000,
                                  alpha_min=1e-5, alpha_max=1e3,
                                  epsilon_one=1e-10, epsilon_two=1e-6):
    """Batched simplex-QP solve (C++; same algorithm as quad_spg)."""
    lib = _load()
    A = np.ascontiguousarray(np.asarray(A, dtype=np.float64))
    B = np.ascontiguousarray(np.asarray(B, dtype=np.float64))
    X = np.ascontiguousarray(np.asarray(X0, dtype=np.float64)).copy()
    n, k = X.shape
    lib.quad_simplex_spg_batch(A, B, X, n, k, int(max_iterations),
                               alpha_min, alpha_max,
                               epsilon_one, epsilon_two)
    return X


def furthest_sum_native(dissimilarities, n_components, start_index,
                        exclude=None, extra_steps=1):
    """FurthestSum greedy (C++; dense distance-sum formulation)."""
    lib = _load()
    d = np.ascontiguousarray(np.asarray(dissimilarities, dtype=np.float64))
    n = d.shape[0]
    exclude = np.ascontiguousarray(
        np.asarray([] if exclude is None else exclude, dtype=np.int64))
    out = np.zeros(int(n_components), dtype=np.int64)
    lib.furthest_sum(d, n, int(n_components), int(start_index),
                     int(extra_steps), exclude, exclude.size, out)
    return out

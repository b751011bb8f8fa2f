"""Native runtime components (C++ via ctypes).

Currently: a single-pass numeric-CSV parser for measurement /
initial-condition / IRF data files. (Honest note: numpy >= 2.0 ships a C
tokenizer in np.loadtxt, so on this image the native parser is at parity,
not faster — it remains as the portable native-extension scaffold and as a
hedge for older numpy deployments where loadtxt is Python-loop bound.)
The shared library is compiled on demand with g++ and cached; every entry
point falls back to the numpy implementation if the toolchain or binary is
unavailable, so the package never hard-depends on the native build.
"""

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "fastcsv.cpp")
_RHS_SRC = os.path.join(os.path.dirname(__file__), "refrhs.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False
_RHS_LIB = None
_RHS_TRIED = False


def _compile(src, stem):
    """Compile a C++ source to a content-addressed cached .so; returns the
    path or None."""
    try:
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
    except OSError:
        return None
    cache_dir = os.environ.get(
        "METROTRPL_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "metrotrpl_tpu"))
    so_path = os.path.join(cache_dir, f"{stem}-{digest}.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(cache_dir, exist_ok=True)
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
        return so_path
    except (OSError, subprocess.SubprocessError):
        return None


def _build_lib():
    return _compile(_SRC, "fastcsv")


def _get_lib():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so_path = _build_lib()
        if so_path is None:
            return None
        try:
            lib = ctypes.CDLL(so_path)
            lib.parse_csv.restype = ctypes.c_int
            lib.parse_csv.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
                ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_long),
            ]
            lib.free_buffer.argtypes = [ctypes.POINTER(ctypes.c_double)]
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def native_available():
    return _get_lib() is not None


_RHS_ARGT = ([ctypes.c_int] + [ctypes.c_double] * 14
             + [np.ctypeslib.ndpointer(np.float64)] * 2)


def _get_rhs_lib():
    global _RHS_LIB, _RHS_TRIED
    with _LOCK:
        if _RHS_TRIED:
            return _RHS_LIB
        _RHS_TRIED = True
        so_path = _compile(_RHS_SRC, "refrhs")
        if so_path is None:
            return None
        try:
            lib = ctypes.CDLL(so_path)
            lib.dydt_std.restype = None
            lib.dydt_std.argtypes = _RHS_ARGT
            lib.bench_rhs.restype = ctypes.c_double
            lib.bench_rhs.argtypes = (
                [ctypes.c_int, ctypes.c_int] + [ctypes.c_double] * 14
                + [np.ctypeslib.ndpointer(np.float64)] * 2)
            _RHS_LIB = lib
        except OSError:
            _RHS_LIB = None
        return _RHS_LIB


def _rhs_param_list(L, params, dx):
    """(reference argument order, forward_solver.py:332) from a model-unit
    param dict."""
    from metrotrpl_tpu.constants import eps0, q_C
    lam = q_C / (params["eps"] * eps0)
    return [float(dx), params["n0"], params["p0"], params["mu_n"],
            params["mu_p"], params["ks"], params["Cn"], params["Cp"],
            params["Sf"], params["Sb"], params["tauN"], params["tauP"],
            lam, params["Tm"]]


def dydt_std_native(y, L, dx, params):
    """Compiled reference RHS on a flat [N, P, E] state (model units).
    Returns dy or None if the native build is unavailable."""
    lib = _get_rhs_lib()
    if lib is None:
        return None
    y = np.ascontiguousarray(y, dtype=np.float64)
    dy = np.zeros_like(y)
    lib.dydt_std(int(L), *_rhs_param_list(L, params, dx), y, dy)
    return dy


def make_native_rhs_std(nx, dx, params):
    """Build a minimal-overhead ``fun(t, y) -> dy`` closure over the
    compiled reference RHS for scipy's LSODA, or None if the native build
    is unavailable.

    The ctypes argument list is constructed once; per call the only
    Python work is one contiguity check and one small copy (LSODA may
    hold the returned array across calls, so the scratch buffer cannot
    be returned directly).
    """
    lib = _get_rhs_lib()
    if lib is None:
        return None
    args = _rhs_param_list(nx, params, dx)
    dy = np.empty(3 * nx + 1, dtype=np.float64)
    fn = lib.dydt_std
    L = int(nx)

    def fun(t, y):
        fn(L, *args, np.ascontiguousarray(y, dtype=np.float64), dy)
        return dy.copy()

    return fun


def bench_rhs_native(y, L, dx, params, reps=1000):
    """Time the compiled RHS in-process (no per-call ctypes overhead).
    Returns seconds per RHS call, or None if unavailable."""
    import time

    lib = _get_rhs_lib()
    if lib is None:
        return None
    y = np.ascontiguousarray(y, dtype=np.float64).copy()
    dy = np.zeros_like(y)
    args = _rhs_param_list(L, params, dx)
    lib.bench_rhs(int(L), 10, *args, y, dy)  # warm-up
    t0 = time.perf_counter()
    lib.bench_rhs(int(L), int(reps), *args, y, dy)
    return (time.perf_counter() - t0) / reps


def load_csv(path, delimiter=","):
    """Load a numeric CSV into a float64 array (rows, cols).

    Uses the native parser when available; falls back to np.loadtxt.
    """
    lib = _get_lib()
    if lib is not None and delimiter in (",", None):
        data_ptr = ctypes.POINTER(ctypes.c_double)()
        rows = ctypes.c_long()
        cols = ctypes.c_long()
        rc = lib.parse_csv(path.encode(), ctypes.byref(data_ptr),
                           ctypes.byref(rows), ctypes.byref(cols))
        if rc == 0:
            n = rows.value * cols.value
            arr = np.ctypeslib.as_array(data_ptr, shape=(n,)).copy()
            lib.free_buffer(data_ptr)
            out = arr.reshape(rows.value, cols.value)
            return out[0] if rows.value == 1 else out if cols.value > 1 \
                else out[:, 0]
        # fall through to numpy on parse errors (mixed content etc.)
    return np.loadtxt(path, delimiter=delimiter)

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
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_lib():
    """Compile fastcsv.cpp to a cached .so; returns the path or None."""
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
    except OSError:
        return None
    cache_dir = os.environ.get(
        "METROTRPL_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "metrotrpl_tpu"))
    so_path = os.path.join(cache_dir, f"fastcsv-{digest}.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(cache_dir, exist_ok=True)
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
        return so_path
    except (OSError, subprocess.SubprocessError):
        return None


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

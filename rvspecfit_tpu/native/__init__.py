"""Native (C++) CPU kernels with graceful fallback.

The compute path of the framework is JAX/XLA on TPU; these native
kernels serve host-side/offline use (template preparation on machines
without accelerators) and provide the CPU-native counterpart of the
reference's C spline extension.  The shared library is built on
demand with the system compiler; if that fails, callers fall back to
scipy implementations.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
_TRIED = False


def _build_library():
    src = os.path.join(os.path.dirname(__file__), 'spline.cpp')
    out = os.path.join(os.path.dirname(__file__), '_rvst_native.so')
    if os.path.exists(out) and os.path.getmtime(out) >= \
            os.path.getmtime(src):
        return out
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC', src,
           '-o', out + '.tmp']
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(out + '.tmp', out)
    return out


def get_library():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        path = _build_library()
        lib = ctypes.CDLL(path)
        lib.rvst_spline_construct.restype = ctypes.c_int
        lib.rvst_spline_construct.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_double)]
        lib.rvst_spline_eval.restype = ctypes.c_int
        lib.rvst_spline_eval.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_ubyte)]
        _LIB = lib
    except Exception as exc:
        logging.warning('native library unavailable (%s); using scipy '
                        'fallbacks', exc)
        _LIB = None
    return _LIB


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class CPUSpline:
    """Natural cubic spline on a uniform (linear/log) grid, C++ core.

    Same call semantics as the reference's spliner.Spline
    (py/rvspecfit/spliner.py:10-53); falls back to scipy when the
    native library cannot be built.
    """

    def __init__(self, xs, ys, log_step=False):
        self.xs = np.ascontiguousarray(xs, dtype=np.float64)
        self.ys = np.ascontiguousarray(ys, dtype=np.float64)
        self.log_step = bool(log_step)
        self._lib = get_library()
        if self._lib is not None:
            n = len(self.xs)
            self.y2 = np.zeros(n, dtype=np.float64)
            ret = self._lib.rvst_spline_construct(
                _ptr(self.xs), _ptr(self.ys), n, _ptr(self.y2))
            if ret != 0:
                raise ValueError('spline construction failed '
                                 f'(code {ret})')
            self._scipy = None
        else:
            import scipy.interpolate
            self._scipy = scipy.interpolate.CubicSpline(
                self.xs, self.ys, bc_type='natural')

    def __call__(self, q):
        q = np.ascontiguousarray(q, dtype=np.float64)
        if self._scipy is not None:
            return self._scipy(q)
        out = np.empty(len(q), dtype=np.float64)
        ok = np.empty(len(q), dtype=np.uint8)
        ret = self._lib.rvst_spline_eval(
            _ptr(self.xs), _ptr(self.ys), _ptr(self.y2), len(self.xs),
            int(self.log_step), _ptr(q), len(q), _ptr(out),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        if ret != 0:
            raise ValueError(f'spline evaluation failed (code {ret})')
        out[ok == 0] = np.nan
        return out

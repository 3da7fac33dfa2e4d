"""Build + ctypes loader for the native parity kernel library."""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pictorial.cpp")
_LIB = os.path.join(_DIR, "libmacaque_native.so")


def _build() -> str:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-o", _LIB, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


@lru_cache(maxsize=1)
def load_native():
    """Load (building if needed) the native library; returns a wrapper
    object with ``pictorial_infer`` and ``transform_closure``."""
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.pictorial_infer.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.transform_closure.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]

    class Native:
        @staticmethod
        def pictorial_infer(unary, candidates, bone_mean, bone_std):
            unary = np.ascontiguousarray(unary, dtype=np.float64)
            candidates = np.ascontiguousarray(candidates, dtype=np.float64)
            bone_mean = np.ascontiguousarray(bone_mean, dtype=np.float64)
            bone_std = np.ascontiguousarray(bone_std, dtype=np.float64)
            n_cand = unary.shape[1]
            out = np.zeros(13, dtype=np.int64)
            lib.pictorial_infer(
                unary.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                candidates.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                bone_mean.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                bone_std.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                n_cand,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
            return out

        @staticmethod
        def transform_closure(x):
            x = np.ascontiguousarray(x, dtype=np.uint8)
            n = x.shape[0]
            out = np.zeros_like(x)
            lib.transform_closure(
                x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                n,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            return out

    return Native()


def native_available() -> bool:
    try:
        load_native()
        return True
    except Exception:
        return False

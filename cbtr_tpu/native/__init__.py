"""ctypes bindings for the native (C++) mesh-preprocessing runtime.

Builds the shared library on first use (g++ is in the image; no pybind11
needed).  `available()` gates callers; the NumPy implementation in
cbtr_tpu/mesh/core.py remains the behavioural oracle and fallback.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libcbtr_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        src = os.path.join(_DIR, "cbtr_native.cpp")
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
            try:
                subprocess.run(
                    ["g++", "-O2", "-std=c++17", "-fPIC", "-Wall", "-shared",
                     "-o", _LIB_PATH, src],
                    check=True, capture_output=True, text=True,
                )
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                _build_error = getattr(e, "stderr", str(e)) or str(e)
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.cbtr_preprocess.restype = ctypes.c_int
        lib.cbtr_preprocess.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_char_p, ctypes.c_int32,
        ]
        lib.cbtr_weld.restype = ctypes.c_int
        lib.cbtr_weld.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int32]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def preprocess(tris: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Full native pipeline: weld + orient + topology + vertex-average normals.

    tris [F,3,3] float32 -> (tris, fellow [F,3] i32, fellow_starts [F,3] i32,
    corner_avg_normals [F,3,3] f32) — exactly the device-array set
    TriMesh.device_arrays() produces.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native runtime unavailable: {_build_error}")
    tris = np.ascontiguousarray(tris, np.float32).copy()
    F = tris.shape[0]
    fellow = np.empty((F, 3), np.int32)
    starts = np.empty((F, 3), np.int32)
    avg = np.empty((F, 3, 3), np.float32)
    err = ctypes.create_string_buffer(256)
    rc = lib.cbtr_preprocess(
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), F,
        fellow.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        avg.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        err, 256,
    )
    if rc != 0:
        raise ValueError(err.value.decode())
    return tris, fellow, starts, avg


def weld(tris: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native runtime unavailable: {_build_error}")
    tris = np.ascontiguousarray(tris, np.float32).copy()
    rc = lib.cbtr_weld(
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), tris.shape[0]
    )
    if rc != 0:
        raise RuntimeError("cbtr_weld failed")
    return tris

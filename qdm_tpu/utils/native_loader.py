"""ctypes bindings for the native mmap safetensors reader
(native/safetensors_reader.cpp).  Builds the shared library on first use
(cached next to the source); falls back to the Python safetensors
package if a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "safetensors_reader.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libsafetensors_reader.so")

_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "U16": np.uint16, "U32": np.uint32, "BOOL": np.bool_,
}


def _bf16_dtype():
    import ml_dtypes

    return ml_dtypes.bfloat16


_lib = None


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                        _SRC, "-o", _SO], check=True, capture_output=True)
        return _SO
    except Exception:
        return None


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.st_open.restype = ctypes.c_void_p
    lib.st_open.argtypes = [ctypes.c_char_p]
    lib.st_num_tensors.restype = ctypes.c_int64
    lib.st_num_tensors.argtypes = [ctypes.c_void_p]
    lib.st_tensor_name.restype = ctypes.c_char_p
    lib.st_tensor_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.st_tensor_dtype.restype = ctypes.c_char_p
    lib.st_tensor_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.st_tensor_rank.restype = ctypes.c_int64
    lib.st_tensor_rank.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.st_tensor_shape.restype = None
    lib.st_tensor_shape.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_int64)]
    lib.st_tensor_data.restype = ctypes.c_void_p
    lib.st_tensor_data.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.st_tensor_nbytes.restype = ctypes.c_int64
    lib.st_tensor_nbytes.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.st_close.restype = None
    lib.st_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeSafetensors:
    """Zero-copy view of a safetensors file.  Arrays returned by
    tensors() alias the mmap — copy before mutating or closing."""

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native reader unavailable (no g++?)")
        self._lib = lib
        self._h = lib.st_open(path.encode())
        if not self._h:
            raise OSError(f"failed to open {path}")

    def keys(self):
        n = self._lib.st_num_tensors(self._h)
        return [self._lib.st_tensor_name(self._h, i).decode() for i in range(n)]

    def tensors(self, copy: bool = False) -> Dict[str, np.ndarray]:
        out = {}
        n = self._lib.st_num_tensors(self._h)
        for i in range(n):
            name = self._lib.st_tensor_name(self._h, i).decode()
            dt = self._lib.st_tensor_dtype(self._h, i).decode()
            rank = self._lib.st_tensor_rank(self._h, i)
            shape = (ctypes.c_int64 * max(rank, 1))()
            self._lib.st_tensor_shape(self._h, i, shape)
            shape = tuple(shape[j] for j in range(rank))
            nbytes = self._lib.st_tensor_nbytes(self._h, i)
            ptr = self._lib.st_tensor_data(self._h, i)
            buf = (ctypes.c_char * nbytes).from_address(ptr)
            np_dtype = _DTYPES.get(dt) or (_bf16_dtype() if dt == "BF16" else None)
            if np_dtype is None:
                continue
            arr = np.frombuffer(buf, dtype=np_dtype).reshape(shape)
            out[name] = arr.copy() if copy else arr
        return out

    def close(self):
        if self._h:
            self._lib.st_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def load_file(path: str, copy: bool = True) -> Dict[str, np.ndarray]:
    """Drop-in for safetensors.numpy.load_file via the native reader."""
    with NativeSafetensors(path) as f:
        return f.tensors(copy=copy)

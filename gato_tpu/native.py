"""ctypes binding for the native C++ CSR packer (csrc/gato_pack.cpp).

The reference binds C++ to Python with a pybind11 module built by CMake/nvcc
(gpu_library.cu:236-239, CMakeLists.txt); here the native library is a plain
C-ABI shared object loaded with ctypes (pybind11 is not in this image) and is
an optional fast path: ``formats`` transparently falls back to the vectorized
NumPy packer when the .so hasn't been built.

Build:  make -C csrc        (or gato_tpu.native.build())
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional, Tuple

import numpy as np

_PKG_DIR = pathlib.Path(__file__).resolve().parent
_LIB_PATH = _PKG_DIR / "_native" / "libgatopack.so"
_CSRC_DIR = _PKG_DIR.parent / "csrc"

_lib: Optional[ctypes.CDLL] = None


def build(verbose: bool = False) -> bool:
    """Compile the native packer in-tree.  Returns True on success."""
    if not (_CSRC_DIR / "Makefile").exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(_CSRC_DIR)],
            check=True,
            capture_output=not verbose,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _lib
    _lib = None  # force reload
    return _LIB_PATH.exists()


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    i64 = ctypes.c_int64
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    for name in ("gato_pack_G", "gato_pack_C"):
        fn = getattr(lib, name)
        fn.restype = i64
        fn.argtypes = [p_i64, i64, p_i64, p_f32, i64, i64, i64,
                       p_f32, p_f32, ctypes.c_char_p, i64]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _prep(indptr, indices, data):
    return (
        np.ascontiguousarray(indptr, dtype=np.int64),
        np.ascontiguousarray(indices, dtype=np.int64),
        np.ascontiguousarray(data, dtype=np.float32),
    )


def pack_G_native(spec, indptr, indices, data) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native pack of G -> (Q, R); None if the library isn't built."""
    lib = _load()
    if lib is None:
        return None
    s, c, K = spec.state_size, spec.control_size, spec.knot_points
    indptr, indices, data = _prep(indptr, indices, data)
    Q = np.zeros((K, s, s), dtype=np.float32)
    R = np.zeros((K - 1, c, c), dtype=np.float32)
    err = ctypes.create_string_buffer(256)
    rc = lib.gato_pack_G(indptr, len(indptr) - 1, indices, data,
                         s, c, K, Q, R, err, len(err))
    if rc != 0:
        raise ValueError(f"native pack_G: {err.value.decode()}")
    return Q, R


def pack_C_native(spec, indptr, indices, data) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native pack of C -> (A, B); None if the library isn't built."""
    lib = _load()
    if lib is None:
        return None
    s, c, K = spec.state_size, spec.control_size, spec.knot_points
    indptr, indices, data = _prep(indptr, indices, data)
    A = np.zeros((K - 1, s, s), dtype=np.float32)
    B = np.zeros((K - 1, s, c), dtype=np.float32)
    err = ctypes.create_string_buffer(256)
    rc = lib.gato_pack_C(indptr, len(indptr) - 1, indices, data,
                         s, c, K, A, B, err, len(err))
    if rc != 0:
        raise ValueError(f"native pack_C: {err.value.decode()}")
    return A, B


if __name__ == "__main__":
    import sys

    ok = build(verbose=True)
    print(f"native packer: {'built at ' + str(_LIB_PATH) if ok else 'BUILD FAILED'}")
    sys.exit(0 if ok else 1)

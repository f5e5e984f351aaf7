"""Native (C++) host-side components.

The TPU compute path is JAX/XLA/Pallas (SURVEY.md §2.2); this package
holds the framework's host-side native tier: serial codecs that numpy
cannot vectorize. Currently one translation unit, ``huffcodec.cpp``
(canonical-Huffman bitstream codec for the packed deployment artifact).

The shared library is built on demand with g++ (no pybind11 in this
environment — plain ``extern "C"`` + ctypes per the toolchain notes) and
cached next to the source. Loading is best-effort: callers must fall
back to the pure-Python reference implementation when ``load_huffcodec``
returns None (no compiler, read-only install, …).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "huffcodec.cpp")
_CACHE: dict = {}


def _build(so_path: str) -> bool:
    # build to a unique temp name, then atomically rename: concurrent
    # processes (pytest + a CLI) must never observe a half-written .so
    tmp = f"{so_path}.{os.getpid()}.tmp"
    try:
        r = subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", tmp, _SRC],
            capture_output=True, timeout=120)
        if r.returncode != 0 or not os.path.exists(tmp):
            return False
        os.replace(tmp, so_path)
        return True
    except (OSError, subprocess.TimeoutExpired):
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.huff_decode.restype = ctypes.c_int32
    lib.huff_decode.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int32,
                                u16p, ctypes.c_int64]
    lib.huff_encode.restype = ctypes.c_int64
    lib.huff_encode.argtypes = [u16p, ctypes.c_int64, u64p, u8p,
                                ctypes.c_int32, u8p, ctypes.c_int64]
    return lib


def load_huffcodec(rebuild: bool = False) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the huffcodec shared library, or None
    when neither loading nor building is possible."""
    if "lib" in _CACHE and not rebuild:
        return _CACHE["lib"]
    candidates = [os.path.join(_DIR, "libhuffcodec.so"),
                  os.path.join(tempfile.gettempdir(),
                               "mctpu_libhuffcodec.so")]
    lib = None
    for so in candidates:
        stale = (not os.path.exists(so)
                 or (os.path.exists(_SRC)
                     and os.path.getmtime(so) < os.path.getmtime(_SRC)))
        if (stale or rebuild) and not _build(so):
            continue
        try:
            lib = _bind(ctypes.CDLL(so))
            break
        except OSError:
            continue
    _CACHE["lib"] = lib
    return lib

"""Build + load the native host runtime (native/*.cpp) via ctypes.

Compiles ``native/{bleu,dataloader}.cpp`` into one shared library on first
use (g++ -O3 -shared); cached next to the sources.  Every consumer has a
pure-Python fallback, so a missing toolchain degrades gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC_DIR = os.path.join(_REPO, "native")
_LIB_PATH = os.path.join(_SRC_DIR, "libtpucaptioner.so")
_SOURCES = ("bleu.cpp", "dataloader.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    srcs = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
    if not all(os.path.exists(s) for s in srcs):
        return False
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= newest_src:
        return True
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared",
        "-pthread", "-o", _LIB_PATH, *srcs,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not _build():
            _failed = True
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        c = ctypes
        lib.corpus_bleu_stats.argtypes = [
            c.POINTER(c.c_int32), c.POINTER(c.c_int64), c.c_int64,
            c.POINTER(c.c_int32), c.POINTER(c.c_int64), c.POINTER(c.c_int64),
            c.c_int, c.POINTER(c.c_int64), c.POINTER(c.c_int64),
            c.POINTER(c.c_int64), c.POINTER(c.c_int64),
        ]
        lib.corpus_bleu_stats.restype = None
        lib.gather_batch.argtypes = [
            c.POINTER(c.c_uint8), c.c_int64,
            c.POINTER(c.c_int32), c.POINTER(c.c_int32), c.c_int64,
            c.POINTER(c.c_int64), c.POINTER(c.c_int64), c.c_int64,
            c.POINTER(c.c_uint8), c.POINTER(c.c_int32), c.POINTER(c.c_int32),
            c.c_int,
        ]
        lib.gather_batch.restype = None
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None

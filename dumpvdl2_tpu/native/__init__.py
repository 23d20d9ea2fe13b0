"""Native host-side helpers: build + ctypes-load l2host.c on demand.

The shared library is compiled once per source hash into a per-user
cache directory with the system C compiler and loaded with ctypes (no
pybind11 dependency).  Absence of a toolchain — or
DUMPVDL2_TPU_NATIVE=0 — silently falls back to the pure-Python
implementations, which remain the executable spec.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
from typing import Optional

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "l2host.c")
_lib = None
_tried = False


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    d = os.path.join(base, "dumpvdl2_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def _build(src: str, out: str) -> bool:
    for cc in (os.environ.get("CC"), "cc", "gcc", "clang"):
        if not cc:
            continue
        try:
            r = subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", out + ".tmp", src],
                capture_output=True, timeout=120)
        except (OSError, subprocess.TimeoutExpired):
            continue
        if r.returncode == 0:
            os.replace(out + ".tmp", out)
            return True
    return False


def load_l2host() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native L2 helper library."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("DUMPVDL2_TPU_NATIVE", "1") == "0":
        return None
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        out = os.path.join(_cache_dir(), f"l2host-{digest}.so")
        if not os.path.exists(out) and not _build(_SRC, out):
            return None
        lib = ctypes.CDLL(out)
        lib.l2h_unstuff_frames.restype = ctypes.c_int32
        lib.l2h_crc16_ccitt.restype = ctypes.c_uint16
        # c_char_p lets ctypes pass Python bytes straight through with
        # no per-call cast/copy (the function only reads)
        lib.l2h_crc16_ccitt.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_uint16]
        lib.l2h_parse_raw_frame.restype = ctypes.c_int32
        lib.l2h_parse_raw_frame.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib

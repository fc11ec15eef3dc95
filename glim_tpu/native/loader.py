"""Build + ctypes binding for the native runtime, with numpy fallbacks."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from glim_tpu.utils.logging import create_module_logger

logger = create_module_logger("native")

_SRC = os.path.join(os.path.dirname(__file__), "pack.cpp")
# Built OUTSIDE the package dir: a bare .so inside it would look like a
# CPython extension module to import machinery.
_LIB = os.path.join(os.path.expanduser("~/.cache/glim_tpu_native"),
                    "libglim_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        if (os.path.exists(_LIB)
                and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
            return True
        os.makedirs(os.path.dirname(_LIB), exist_ok=True)
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # toolchain absent / sandboxed — fall back
        logger.warning("native build unavailable (%s); using numpy fallbacks", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        lib = ctypes.CDLL(_LIB)
        lib.pack_scan_i16.restype = ctypes.c_int
        lib.pack_scan_i16.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_long, ctypes.c_long, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int16)]
        lib.ply_count.restype = ctypes.c_long
        lib.ply_count.argtypes = [ctypes.c_char_p]
        lib.ply_read_xyz.restype = ctypes.c_long
        lib.ply_read_xyz.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                     ctypes.POINTER(ctypes.c_float)]
        lib.ply_write_xyz.restype = ctypes.c_int
        lib.ply_write_xyz.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_float), ctypes.c_long]
        _lib = lib
        logger.info("native runtime loaded (%s)", _LIB)
        return _lib


def available() -> bool:
    return _load() is not None


def pack_scan_i16(points: np.ndarray, times: Optional[np.ndarray], cap: int,
                  pt_scale: float, t_scale: float) -> Tuple[np.ndarray, int]:
    """Quantize a raw scan into the (cap, 4) int16 upload buffer."""
    lib = _load()
    n = len(points)
    out = np.zeros((cap, 4), np.int16)
    if lib is not None:
        pts64 = np.ascontiguousarray(points[:, :3], np.float64)
        t64 = (np.ascontiguousarray(times, np.float64)
               if times is not None and len(times) == n else None)
        n_used = lib.pack_scan_i16(
            pts64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            t64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) if t64 is not None else None,
            n, cap, pt_scale, t_scale,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
        return out, int(n_used)
    # numpy fallback
    n_used = min(n, cap)
    p = np.asarray(points[:n_used, :3], np.float64) / pt_scale
    np.clip(p, -32767, 32767, out=p)
    out[:n_used, :3] = p.round()
    if times is not None and len(times) == n and t_scale > 0:
        out[:n_used, 3] = np.clip(np.asarray(times[:n_used]) / t_scale, 0, 32767).round()
    return out, n_used


def ply_read(path: str, max_points: int = 50_000_000) -> np.ndarray:
    lib = _load()
    if lib is not None:
        n = lib.ply_count(path.encode())
        if n >= 0:
            n = min(n, max_points)
            out = np.zeros((n, 3), np.float32)
            got = lib.ply_read_xyz(path.encode(), n,
                                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if got >= 0:
                return out[:got]
    # numpy fallback (binary_little_endian float xyz only)
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        n = int([l for l in header.split(b"\n") if l.startswith(b"element vertex")][0].split()[-1])
        return np.frombuffer(f.read(n * 12), dtype="<f4").reshape(-1, 3).copy()


def ply_write(path: str, points: np.ndarray) -> None:
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    if lib is not None:
        if lib.ply_write_xyz(path.encode(),
                             pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                             len(pts)) == 0:
            return
    from glim_tpu.io.dump import export_ply
    export_ply(path, pts)

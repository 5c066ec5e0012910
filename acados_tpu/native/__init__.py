"""Native (C++) runtime support: timers, flat-iterate pack, binary
checkpoint I/O.

Counterpart of the reference's C runtime layer (utils/timing.h:43-86,
ocp_nlp_get_all/set_all ocp_nlp_interface.c:1914-2018, iterate save/load
acados_ocp_iterate.py) — compiled on first use with g++ into a shared
library and bound via ctypes (pybind11 is not in this environment). Every
entry point has a pure-Python fallback with the identical on-disk format,
so the package works without a toolchain; `native_available()` reports
which path is active.
"""
from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import tempfile
from typing import Dict, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src",
                    "acados_tpu_native.cpp")
_LIB_CACHE = os.path.join(tempfile.gettempdir(),
                          f"acados_tpu_native_{os.getuid()}.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False

_MAGIC = 0x494E5441
_VERSION = 1


def _build_lib() -> Optional[str]:
    try:
        if (os.path.exists(_LIB_CACHE)
                and os.path.getmtime(_LIB_CACHE) >= os.path.getmtime(_SRC)):
            return _LIB_CACHE
        out = _LIB_CACHE + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-fPIC", "-shared", _SRC, "-o",
             out],
            check=True, capture_output=True, timeout=120)
        os.replace(out, _LIB_CACHE)
        return _LIB_CACHE
    except (OSError, subprocess.SubprocessError):
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    path = _build_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.atn_time.restype = ctypes.c_double
        lib.atn_pack.restype = ctypes.c_int64
        lib.atn_unpack.restype = ctypes.c_int64
        lib.atn_save_iterate.restype = ctypes.c_int32
        lib.atn_iterate_open.restype = ctypes.c_int64
        lib.atn_iterate_open.argtypes = [ctypes.c_char_p]
        lib.atn_iterate_count.restype = ctypes.c_int32
        lib.atn_iterate_count.argtypes = [ctypes.c_int64]
        lib.atn_iterate_name.restype = ctypes.c_int32
        lib.atn_iterate_size.restype = ctypes.c_int64
        lib.atn_iterate_data.restype = ctypes.c_int32
        lib.atn_iterate_close.restype = ctypes.c_int32
        lib.atn_iterate_close.argtypes = [ctypes.c_int64]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def monotonic_time() -> float:
    """Native monotonic timer (reference acados_tic/toc analog)."""
    lib = _load()
    if lib is not None:
        return float(lib.atn_time())
    import time
    return time.monotonic()


def pack_flat(arrays) -> np.ndarray:
    """Concatenate f64 arrays into one flat vector
    (ocp_nlp_get_all analog: one contiguous iterate buffer)."""
    arrays = [np.ascontiguousarray(a, np.float64) for a in arrays]
    lib = _load()
    if lib is None:
        return (np.concatenate([a.ravel() for a in arrays])
                if arrays else np.zeros(0))
    total = sum(a.size for a in arrays)
    out = np.empty(total, np.float64)
    n = len(arrays)
    srcs = (ctypes.POINTER(ctypes.c_double) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
          for a in arrays])
    sizes = (ctypes.c_int64 * n)(*[a.size for a in arrays])
    lib.atn_pack(srcs, sizes, ctypes.c_int32(n),
                 out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def unpack_flat(flat: np.ndarray, shapes) -> list:
    """Split a flat vector back into arrays of the given shapes
    (ocp_nlp_set_all analog)."""
    flat = np.ascontiguousarray(flat, np.float64)
    outs = [np.empty(s, np.float64) for s in shapes]
    lib = _load()
    if lib is None:
        off = 0
        for o in outs:
            o[...] = flat[off:off + o.size].reshape(o.shape)
            off += o.size
        return outs
    n = len(outs)
    dsts = (ctypes.POINTER(ctypes.c_double) * n)(
        *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
          for o in outs])
    sizes = (ctypes.c_int64 * n)(*[o.size for o in outs])
    lib.atn_unpack(flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                   sizes, ctypes.c_int32(n), dsts)
    return outs


def save_iterate_bin(path: str, fields: Dict[str, np.ndarray]) -> None:
    """Write an 'ATNI' binary iterate checkpoint. Shapes are stored
    alongside in a sidecar-free way: names carry 'name:shape' metadata."""
    items = [(f"{k}|{','.join(map(str, np.asarray(v).shape))}",
              np.ascontiguousarray(v, np.float64))
             for k, v in fields.items()]
    lib = _load()
    if lib is not None:
        n = len(items)
        names = (ctypes.c_char_p * n)(*[k.encode() for k, _ in items])
        arrs = (ctypes.POINTER(ctypes.c_double) * n)(
            *[v.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
              for _, v in items])
        sizes = (ctypes.c_int64 * n)(*[v.size for _, v in items])
        rc = lib.atn_save_iterate(path.encode(), names, arrs, sizes,
                                  ctypes.c_int32(n))
        if rc != 0:
            raise IOError(f"atn_save_iterate failed with {rc}")
        return
    with open(path, "wb") as f:
        f.write(struct.pack("<III", _MAGIC, _VERSION, len(items)))
        for k, v in items:
            kb = k.encode()
            f.write(struct.pack("<I", len(kb)))
            f.write(kb)
            f.write(struct.pack("<Q", v.size))
            f.write(v.tobytes())


def load_iterate_bin(path: str) -> Dict[str, np.ndarray]:
    """Read an 'ATNI' binary iterate checkpoint back into named arrays."""
    lib = _load()
    if lib is not None:
        h = lib.atn_iterate_open(path.encode())
        if h <= 0:
            raise IOError(f"atn_iterate_open failed with {h}")
        try:
            out = {}
            for i in range(lib.atn_iterate_count(h)):
                buf = ctypes.create_string_buffer(4200)
                lib.atn_iterate_name(ctypes.c_int64(h), ctypes.c_int32(i),
                                     buf, ctypes.c_int32(len(buf)))
                key = buf.value.decode()
                sz = lib.atn_iterate_size(ctypes.c_int64(h),
                                          ctypes.c_int32(i))
                a = np.empty(sz, np.float64)
                lib.atn_iterate_data(
                    ctypes.c_int64(h), ctypes.c_int32(i),
                    a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
                out[key] = a
            return {_restore_shape(k, v)[0]: _restore_shape(k, v)[1]
                    for k, v in out.items()}
        finally:
            lib.atn_iterate_close(ctypes.c_int64(h))
    out = {}
    with open(path, "rb") as f:
        magic, ver, count = struct.unpack("<III", f.read(12))
        if magic != _MAGIC or ver != _VERSION:
            raise IOError("bad ATNI file")
        for _ in range(count):
            (klen,) = struct.unpack("<I", f.read(4))
            key = f.read(klen).decode()
            (numel,) = struct.unpack("<Q", f.read(8))
            a = np.frombuffer(f.read(numel * 8), np.float64).copy()
            out[key] = a
    return {_restore_shape(k, v)[0]: _restore_shape(k, v)[1]
            for k, v in out.items()}


def _restore_shape(key: str, flat: np.ndarray):
    if "|" not in key:
        return key, flat
    name, shp = key.rsplit("|", 1)
    shape = tuple(int(s) for s in shp.split(",") if s)
    return name, flat.reshape(shape)

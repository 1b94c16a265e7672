"""Parallel gzip codec (pigz-style) for the NIfTI hot I/O path.

``compress`` deflates 4MB chunks on all cores as independent gzip members
(their concatenation is a valid RFC-1952 multi-member stream — readable by
any gzip tool). ``decompress`` is a multi-member-safe inflate loop. Falls
back with ImportError when the native library isn't built (callers catch).
"""

from __future__ import annotations

import ctypes
import zlib

import numpy as np

from .. import native as _native


def _lib():
    lib = _native._load()
    if not hasattr(lib.gzip_compress_parallel, "argtypes") or not lib.gzip_compress_parallel.argtypes:
        lib.gzip_compress_parallel.restype = ctypes.c_int64
        lib.gzip_compress_parallel.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int64),
        ]
    return lib


def compress(data: bytes, level: int = 4) -> bytes:
    lib = _lib()
    buf = np.frombuffer(data, np.uint8)
    out_p = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_int64(0)
    rc = lib.gzip_compress_parallel(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(data),
        level,
        ctypes.byref(out_p),
        ctypes.byref(out_len),
    )
    if rc != 0:
        raise RuntimeError("parallel gzip compression failed")
    try:
        return bytes(np.ctypeslib.as_array(out_p, shape=(out_len.value,)))
    finally:
        lib.surface_free(out_p)


def decompress(raw: bytes) -> bytes:
    """Multi-member-safe gzip/zlib inflate."""
    chunks = []
    data = raw
    while data:
        d = zlib.decompressobj(wbits=47)
        chunks.append(d.decompress(data))
        chunks.append(d.flush())
        data = d.unused_data
        if not chunks[-2] and not chunks[-1] and data == raw:
            raise ValueError("undecodable gzip stream")
        raw = data
    return b"".join(chunks)

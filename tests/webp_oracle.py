"""ctypes bindings to the container's system libwebp (libwebp.so.7).

Test-only oracle, mirroring the JPEG suite's use of the JVM ImageIO
reader: the OFFICIAL codec encodes fixture streams and decodes them,
and `tantivy_spark.functions.webpcodec.decode_webp` must match its
RGBA output bit-exactly.  Import-gated: tests skip when the shared
library is absent.
"""

from __future__ import annotations

import ctypes

import numpy as np


def load():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.WebPFree.restype = None
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    return lib


def encode_lossless(lib, rgba: np.ndarray) -> bytes:
    """rgba: (H, W, 4) uint8 -> lossless .webp bytes."""
    h, w, c = rgba.shape
    assert c == 4 and rgba.dtype == np.uint8
    buf = np.ascontiguousarray(rgba).tobytes()
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeLosslessRGBA(buf, w, h, w * 4, ctypes.byref(out))
    if n == 0:
        raise RuntimeError("WebPEncodeLosslessRGBA failed")
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def encode_lossy(lib, rgba: np.ndarray, quality: float = 75.0) -> bytes:
    h, w, c = rgba.shape
    buf = np.ascontiguousarray(rgba).tobytes()
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGBA(buf, w, h, w * 4, quality, ctypes.byref(out))
    if n == 0:
        raise RuntimeError("WebPEncodeRGBA failed")
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def decode_yuv(lib, blob: bytes):
    """Official pre-upsampling planes: (Y, U, V) uint8 arrays, 4:2:0."""
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    ptr = lib.WebPDecodeYUV(blob, len(blob), ctypes.byref(w), ctypes.byref(h),
                            ctypes.byref(u), ctypes.byref(v),
                            ctypes.byref(stride), ctypes.byref(uv_stride))
    if not ptr:
        raise RuntimeError("WebPDecodeYUV failed")
    W, H, s, us = w.value, h.value, stride.value, uv_stride.value
    uw, uh = (W + 1) // 2, (H + 1) // 2
    Y = np.frombuffer(ctypes.string_at(ptr, s * H),
                      dtype=np.uint8).reshape(H, s)[:, :W].copy()
    U = np.frombuffer(ctypes.string_at(u, us * uh),
                      dtype=np.uint8).reshape(uh, us)[:, :uw].copy()
    V = np.frombuffer(ctypes.string_at(v, us * uh),
                      dtype=np.uint8).reshape(uh, us)[:, :uw].copy()
    lib.WebPFree(ptr)
    return Y, U, V


def decode_rgba(lib, blob: bytes) -> np.ndarray:
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = lib.WebPDecodeRGBA(blob, len(blob), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise RuntimeError("WebPDecodeRGBA failed")
    n = w.value * h.value * 4
    arr = np.frombuffer(ctypes.string_at(ptr, n), dtype=np.uint8).copy()
    lib.WebPFree(ptr)
    return arr.reshape(h.value, w.value, 4)

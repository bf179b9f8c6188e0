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


# ---------------------------------------------------------------------------
# advanced encoder (WebPConfig/WebPPicture ABI) — needed to produce
# ALPH preprocessed-levels streams (alpha_quality < 100) and explicit
# alpha filter methods, which the simple WebPEncodeRGBA API cannot
# ---------------------------------------------------------------------------

_ENCODER_ABI = 0x0210          # probed: accepted by this libwebp 1.2.4


class _WebPConfig(ctypes.Structure):
    _fields_ = [
        ("lossless", ctypes.c_int), ("quality", ctypes.c_float),
        ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int), ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int), ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int), ("preprocessing", ctypes.c_int),
        ("partitions", ctypes.c_int), ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int), ("thread_level", ctypes.c_int),
        ("low_memory", ctypes.c_int), ("near_lossless", ctypes.c_int),
        ("exact", ctypes.c_int), ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int), ("qmin", ctypes.c_int),
        ("qmax", ctypes.c_int)]


class _WebPMemoryWriter(ctypes.Structure):
    _fields_ = [("mem", ctypes.POINTER(ctypes.c_uint8)),
                ("size", ctypes.c_size_t), ("max_size", ctypes.c_size_t),
                ("pad", ctypes.c_uint32 * 1)]


class _WebPPicture(ctypes.Structure):
    _fields_ = [
        ("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int), ("height", ctypes.c_int),
        ("y", ctypes.c_void_p), ("u", ctypes.c_void_p), ("v", ctypes.c_void_p),
        ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
        ("a", ctypes.c_void_p), ("a_stride", ctypes.c_int),
        ("pad1", ctypes.c_uint32 * 2),
        ("argb", ctypes.c_void_p), ("argb_stride", ctypes.c_int),
        ("pad2", ctypes.c_uint32 * 3),
        ("writer", ctypes.c_void_p), ("custom_ptr", ctypes.c_void_p),
        ("extra_info_type", ctypes.c_int), ("extra_info", ctypes.c_void_p),
        ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
        ("progress_hook", ctypes.c_void_p), ("user_data", ctypes.c_void_p),
        ("pad3", ctypes.c_uint32 * 3),
        ("pad4", ctypes.c_void_p), ("pad5", ctypes.c_void_p),
        ("pad6", ctypes.c_uint32 * 8),
        ("memory_", ctypes.c_void_p), ("memory_argb_", ctypes.c_void_p),
        ("pad7", ctypes.c_void_p * 2)]


def encode_advanced(lib, rgba: np.ndarray, quality: float = 75.0,
                    alpha_quality: int = 100,
                    alpha_filtering: int = 1,
                    alpha_compression: int = 1,
                    method: int = 4) -> bytes:
    """Lossy encode through the advanced API so alpha options reach
    the ALPH chunk (alpha_quality < 100 => preprocessing=1 streams)."""
    h, w, c = rgba.shape
    assert c == 4 and rgba.dtype == np.uint8
    cfg = _WebPConfig()
    if not lib.WebPConfigInitInternal(ctypes.byref(cfg), 0,
                                      ctypes.c_float(quality),
                                      _ENCODER_ABI):
        raise RuntimeError("WebPConfigInitInternal failed (ABI?)")
    cfg.alpha_quality = int(alpha_quality)
    cfg.alpha_filtering = int(alpha_filtering)
    cfg.alpha_compression = int(alpha_compression)
    cfg.method = int(method)
    pic = _WebPPicture()
    if not lib.WebPPictureInitInternal(ctypes.byref(pic), _ENCODER_ABI):
        raise RuntimeError("WebPPictureInitInternal failed")
    pic.width, pic.height = w, h
    pic.use_argb = 1
    buf = np.ascontiguousarray(rgba).tobytes()
    if not lib.WebPPictureImportRGBA(ctypes.byref(pic),
                                     ctypes.c_char_p(buf), w * 4):
        raise RuntimeError("WebPPictureImportRGBA failed")
    wr = _WebPMemoryWriter()
    lib.WebPMemoryWriterInit(ctypes.byref(wr))
    pic.writer = ctypes.cast(lib.WebPMemoryWrite, ctypes.c_void_p)
    pic.custom_ptr = ctypes.cast(ctypes.byref(wr), ctypes.c_void_p)
    ok = lib.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    err = pic.error_code
    data = ctypes.string_at(wr.mem, wr.size) if ok else b""
    lib.WebPMemoryWriterClear(ctypes.byref(wr))
    lib.WebPPictureFree(ctypes.byref(pic))
    if not ok:
        raise RuntimeError(f"WebPEncode failed (error_code={err})")
    return data

"""Dependency-free image decoding (numpy + stdlib zlib).

The multimodal pipeline (`operators/multimodal.py`) treats media as
opaque binary columns and injects a `decoder=` callable into the
Arrow-batched decode UDF.  This module provides REAL decoders for the
formats that need nothing beyond the standard library:

* PNG  — full zlib inflate + scanline unfiltering (spec: RFC 2083 /
  https://www.w3.org/TR/png/): bit depths 8 and 16, color types gray /
  RGB / palette / gray+alpha / RGBA, both non-interlaced and Adam7
  interlaced (pass geometry pinned to the spec's 8x8 table).
* BMP  — uncompressed BI_RGB 24/32-bit (bottom-up or top-down rows).
* PPM/PGM — binary P6/P5.

plus a minimal PNG *encoder* (filter 0 scanlines) so tests can build
real files and round-trip them.  JPEG and the container formats stay
explicitly unsupported (`ValueError`) — those genuinely need codec
libraries, and the pipeline's deterministic-fake path covers their
plumbing.

Every decoder returns `(H, W, C)` with C in {1, 2, 3, 4} — uint8, or
uint16 for 16-bit PNGs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def _png_chunks(blob: bytes):
    pos = len(_PNG_MAGIC)
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos: pos + 4])
        ctype = blob[pos + 4: pos + 8]
        data = blob[pos + 8: pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters (PNG spec §9: None/Sub/Up/
    Average/Paeth).  Rows are sequential (each depends on the previous
    reconstructed row); within a row the numpy ops are vectorized except
    Sub/Paeth's inherent left-to-right carry."""
    rows = raw.reshape(height, stride + 1)
    ftypes = rows[:, 0]
    cur = rows[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        line = cur[y]
        ft = ftypes[y]
        if ft == 0:
            rec = line.copy()
        elif ft == 1:  # Sub: per-byte-phase modular prefix sum (vectorized)
            rec = line.copy()
            for r in range(bpp):
                rec[r::bpp] = np.cumsum(rec[r::bpp], dtype=np.int64) % 256
        elif ft == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ft == 3:  # Average
            rec = line.copy()
            rec[:bpp] = (rec[:bpp] + (prev[:bpp] >> 1)) & 0xFF
            for x in range(bpp, stride):
                rec[x] = (rec[x] + ((rec[x - bpp] + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            rec = line.copy()
            rec[:bpp] = (rec[:bpp] + prev[:bpp]) & 0xFF
            for x in range(bpp, stride):
                a, b, c = rec[x - bpp], prev[x], prev[x - bpp]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {ft}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


#: Adam7 pass geometry (PNG spec §8.2): (ystart, xstart, ystep, xstep)
#: per pass, pinned against the spec's 8x8 pass-number table in
#: tests/test_imagecodec.py.
ADAM7_PASSES = (
    (0, 0, 8, 8), (0, 4, 8, 8), (4, 0, 8, 4), (0, 2, 4, 4),
    (2, 0, 4, 2), (0, 1, 2, 2), (1, 0, 2, 1),
)


def _pass_dims(width: int, height: int) -> list[tuple[int, int]]:
    """(pass_width, pass_height) per Adam7 pass (0 x 0 when empty)."""
    return [
        (max(0, -(-(width - xs) // xst)) if width > xs else 0,
         max(0, -(-(height - ys) // yst)) if height > ys else 0)
        for ys, xs, yst, xst in ADAM7_PASSES
    ]


def decode_png(blob: bytes) -> np.ndarray:
    if not blob.startswith(_PNG_MAGIC):
        raise ValueError("png: bad signature")
    width = height = None
    color_type = bit_depth = interlace = None
    palette = None
    idat = bytearray()
    for ctype, data in _png_chunks(blob):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
    if width is None:
        raise ValueError("png: missing IHDR")
    if bit_depth not in (8, 16):
        raise ValueError(f"png: unsupported bit depth {bit_depth}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"png: unsupported color type {color_type}")
    if color_type == 3 and bit_depth == 16:
        raise ValueError("png: 16-bit palette images are invalid")
    bps = bit_depth // 8           # bytes per sample
    bpp = channels * bps           # filter byte distance (spec §9.2)
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)

    def bytes_to_img(rec: np.ndarray, h: int, w: int) -> np.ndarray:
        if bps == 2:
            return (
                rec.reshape(h, w * channels, 2)
                .reshape(h * w * channels * 2)
                .view(">u2").astype(np.uint16)
                .reshape(h, w, channels)
            )
        return rec.reshape(h, w, channels)

    if interlace == 0:
        stride = width * bpp
        if len(raw) != height * (stride + 1):
            raise ValueError("png: decompressed size mismatch")
        img = bytes_to_img(_unfilter(raw, height, stride, bpp), height, width)
    elif interlace == 1:
        # Adam7 (spec §8.2): seven independently-filtered reduced images,
        # scattered back onto the (ystart::ystep, xstart::xstep) grids
        dt = np.uint16 if bps == 2 else np.uint8
        img = np.zeros((height, width, channels), dtype=dt)
        pos = 0
        for (ys, xs, yst, xst), (pw, ph) in zip(ADAM7_PASSES,
                                                _pass_dims(width, height)):
            if pw == 0 or ph == 0:
                continue
            stride = pw * bpp
            need = ph * (stride + 1)
            sub = raw[pos: pos + need]
            if len(sub) != need:
                raise ValueError("png: decompressed size mismatch (adam7)")
            pos += need
            img[ys::yst, xs::xst] = bytes_to_img(
                _unfilter(sub, ph, stride, bpp), ph, pw)
        if pos != len(raw):
            raise ValueError("png: trailing data after adam7 passes")
    else:
        raise ValueError(f"png: unknown interlace method {interlace}")

    if color_type == 3:
        if palette is None:
            raise ValueError("png: palette image without PLTE")
        img = palette[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """Minimal encoder (filter 0 scanlines, one IDAT) for tests and
    fixture generation: bit depth 8 (uint8 input) or 16 (uint16 input),
    optionally Adam7-interlaced."""
    img = np.ascontiguousarray(img)
    if img.dtype not in (np.uint8, np.uint16):
        img = img.astype(np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    height, width, channels = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    depth = 16 if img.dtype == np.uint16 else 8

    def row_bytes(a: np.ndarray) -> np.ndarray:
        # (h, w, c) -> (h, w*c*bps) big-endian sample bytes
        h = a.shape[0]
        if depth == 16:
            return a.astype(">u2").view(np.uint8).reshape(h, -1)
        return a.reshape(h, -1)

    def scanlines(a: np.ndarray) -> bytes:
        rb = row_bytes(a)
        return np.concatenate(
            [np.zeros((rb.shape[0], 1), np.uint8), rb], axis=1).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    if interlace:
        payload = b"".join(
            scanlines(img[ys::yst, xs::xst])
            for (ys, xs, yst, xst), (pw, ph) in zip(
                ADAM7_PASSES, _pass_dims(width, height))
            if pw and ph
        )
    else:
        payload = scanlines(img)

    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0,
                       1 if interlace else 0)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(payload))
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, BI_RGB 24/32-bit)
# ---------------------------------------------------------------------------

def decode_bmp(blob: bytes) -> np.ndarray:
    if blob[:2] != b"BM":
        raise ValueError("bmp: bad signature")
    (data_off,) = struct.unpack("<I", blob[10:14])
    (hdr_size,) = struct.unpack("<I", blob[14:18])
    if hdr_size < 40:
        raise ValueError("bmp: pre-BITMAPINFOHEADER formats unsupported")
    width, height = struct.unpack("<ii", blob[18:26])
    bpp, compression = struct.unpack("<HI", blob[28:34])
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"bmp: unsupported bpp={bpp} compression={compression}")
    flip = height > 0  # positive height = bottom-up storage
    height = abs(height)
    nch = bpp // 8
    row_bytes = (width * nch + 3) & ~3  # 4-byte row padding
    raw = np.frombuffer(
        blob, dtype=np.uint8, count=row_bytes * height, offset=data_off)
    rows = raw.reshape(height, row_bytes)[:, : width * nch]
    img = rows.reshape(height, width, nch)
    if flip:
        img = img[::-1]
    # BGR(A) -> RGB(A)
    if nch == 3:
        img = img[:, :, [2, 1, 0]]
    else:
        img = img[:, :, [2, 1, 0, 3]]
    return np.ascontiguousarray(img)


# ---------------------------------------------------------------------------
# PPM / PGM (binary)
# ---------------------------------------------------------------------------

def decode_ppm(blob: bytes) -> np.ndarray:
    if blob[:2] not in (b"P6", b"P5"):
        raise ValueError("ppm: only binary P6/P5 supported")
    channels = 3 if blob[:2] == b"P6" else 1
    # header tokens: magic, width, height, maxval (comments start with #)
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos: pos + 1].isspace():
            pos += 1
        if blob[pos: pos + 1] == b"#":
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos: pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError("ppm: only maxval 255 supported")
    raw = np.frombuffer(blob, np.uint8, count=width * height * channels,
                        offset=pos)
    return raw.reshape(height, width, channels).copy()


_DECODERS = (
    (_PNG_MAGIC[:4], decode_png),
    (b"BM", decode_bmp),
    (b"P6", decode_ppm),
    (b"P5", decode_ppm),
)


def decode_image(blob: bytes) -> np.ndarray:
    """Magic-sniffing dispatch.  Raises ValueError for formats that need
    real codec libraries (JPEG, WEBP, ...)."""
    for magic, fn in _DECODERS:
        if blob.startswith(magic):
            return fn(blob)
    raise ValueError(
        f"unsupported image format (magic {blob[:4]!r}); "
        "JPEG/WEBP need codec libraries not present in this environment")

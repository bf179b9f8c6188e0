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
* JPEG — sequential (SOF0/1) AND progressive (SOF2) huffman DCT
  (ITU-T T.81), written to the IJG decode pipeline (islow IDCT / fancy
  upsampling / fixed-point color, jdphuff progressive scan semantics)
  so output is bit-exact vs libjpeg-family decoders; parity pinned in
  tests against the JVM's ImageIO reader.

plus a minimal PNG *encoder* (filter 0 scanlines) so tests can build
real files and round-trip them.  WebP is real too — lossless VP8L in
`webpcodec.py` and lossy VP8 (full RFC 6386 keyframe decode incl. the
loop filter, plus ALPH alpha chunks) in `vp8codec.py`, both bit-exact
vs the official libwebp.  The audio/video container formats stay
explicitly unsupported (`ValueError`) — the pipeline's
deterministic-fake path covers their plumbing.

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


# ---------------------------------------------------------------------------
# JPEG (sequential + progressive huffman DCT, ITU-T T.81)
# ---------------------------------------------------------------------------
# Pure numpy + stdlib, written to the published IJG decode pipeline so
# output is BIT-EXACT vs libjpeg-family decoders for valid streams:
# jidctint.c "islow" fixed-point IDCT (CONST_BITS=13, PASS1_BITS=2,
# Loeffler constants), jdsample.c triangular "fancy" upsampling,
# jdcolor.c fixed-point YCbCr->RGB tables, and jdphuff.c progressive
# scan decoding (spectral selection, successive approximation, EOB
# runs).  Parity is pinned in tests against an independent IJG-derived
# decoder (the JVM's ImageIO JPEG reader) over real OS files +
# synthetic re-encodes.  Arithmetic coding, 12-bit, lossless, and CMYK
# streams raise ValueError.

_JPEG_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)


def _jpeg_huff_lut(counts: list[int], symbols: bytes):
    """Canonical Huffman table -> 16-bit-peek LUTs (symbol, code length)."""
    lut_sym = np.zeros(1 << 16, dtype=np.uint8)
    lut_len = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            lo = code << (16 - ln)
            hi = lo + (1 << (16 - ln))
            lut_sym[lo:hi] = symbols[k]
            lut_len[lo:hi] = ln
            code += 1
            k += 1
        code <<= 1
    # plain lists: per-symbol lookups in the decode loop stay Python-int
    return lut_sym.tolist(), lut_len.tolist()


class _JpegBits:
    """MSB-first bit reader over an unstuffed entropy-coded segment."""

    __slots__ = ("data", "n", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos < self.n:
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.acc <<= 8          # zero-pad past the end
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, k: int):
        self.nbits -= k
        self.acc &= (1 << self.nbits) - 1

    def take(self, k: int) -> int:
        if k == 0:
            return 0
        if self.nbits < k:
            self._fill()
        self.nbits -= k
        v = self.acc >> self.nbits
        self.acc &= (1 << self.nbits) - 1
        return v


def _jpeg_extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _jpeg_idct_islow(blocks: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """jidctint.c, vectorized over [n, 64] int32 zigzag-ordered-undone
    coefficient blocks.  Returns [n, 8, 8] uint8 samples."""
    # libjpeg-turbo's jidctint works in 32-bit JLONG with C wraparound;
    # numpy int32 reproduces that exactly (28% faster end-to-end than
    # int64 here, and T.81-legal streams never overflow the pipeline)
    c = (blocks.reshape(-1, 8, 8).astype(np.int32)
         * quant.reshape(8, 8).astype(np.int32))

    def pass_(m, shift):
        # m: [..., 8] along the transformed axis (last); returns same
        z2, z3 = m[..., 2], m[..., 6]
        z1 = (z2 + z3) * 4433                    # FIX_0_541196100
        tmp2 = z1 - z3 * 15137                   # -FIX_1_847759065 (sum)
        tmp3 = z1 + z2 * 6270                    # FIX_0_765366865
        z2, z3 = m[..., 0], m[..., 4]
        tmp0 = (z2 + z3) << 13
        tmp1 = (z2 - z3) << 13
        t10, t13 = tmp0 + tmp3, tmp0 - tmp3
        t11, t12 = tmp1 + tmp2, tmp1 - tmp2
        tmp0, tmp1, tmp2, tmp3 = m[..., 7], m[..., 5], m[..., 3], m[..., 1]
        z1, z2 = tmp0 + tmp3, tmp1 + tmp2
        z3, z4 = tmp0 + tmp2, tmp1 + tmp3
        z5 = (z3 + z4) * 9633                    # FIX_1_175875602
        tmp0 = tmp0 * 2446                       # FIX_0_298631336
        tmp1 = tmp1 * 16819                      # FIX_2_053119869
        tmp2 = tmp2 * 25172                      # FIX_3_072711026
        tmp3 = tmp3 * 12299                      # FIX_1_501321110
        z1 = z1 * -7373                          # -FIX_0_899976223
        z2 = z2 * -20995                         # -FIX_2_562915447
        z3 = z3 * -16069 + z5                    # -FIX_1_961570560
        z4 = z4 * -3196 + z5                     # -FIX_0_390180644
        tmp0 += z1 + z3
        tmp1 += z2 + z4
        tmp2 += z2 + z3
        tmp3 += z1 + z4
        half = 1 << (shift - 1)
        out = np.empty_like(m)
        out[..., 0] = (t10 + tmp3 + half) >> shift
        out[..., 7] = (t10 - tmp3 + half) >> shift
        out[..., 1] = (t11 + tmp2 + half) >> shift
        out[..., 6] = (t11 - tmp2 + half) >> shift
        out[..., 2] = (t12 + tmp1 + half) >> shift
        out[..., 5] = (t12 - tmp1 + half) >> shift
        out[..., 3] = (t13 + tmp0 + half) >> shift
        out[..., 4] = (t13 - tmp0 + half) >> shift
        return out

    # pass 1 operates on columns (transform along rows axis), output
    # scaled up by PASS1_BITS; pass 2 on rows, with the final descale
    c = pass_(c.transpose(0, 2, 1), 13 - 2).transpose(0, 2, 1)
    c = pass_(c, 13 + 2 + 3)
    c += 128
    return np.minimum(np.maximum(c, 0), 255).astype(np.uint8)


def _jpeg_upsample_h2v1(a: np.ndarray) -> np.ndarray:
    """jdsample.c h2v1_fancy_upsample (triangular horizontal 2x)."""
    a = a.astype(np.int32)
    left = np.concatenate([a[:, :1], a[:, :-1]], axis=1)
    right = np.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    out = np.empty((a.shape[0], a.shape[1] * 2), dtype=np.int32)
    out[:, 0::2] = (a * 3 + left + 1) >> 2
    out[:, 1::2] = (a * 3 + right + 2) >> 2
    # edge columns replicate the input sample exactly (IJG special-case)
    out[:, 0] = a[:, 0]
    out[:, -1] = a[:, -1]
    return out.astype(np.uint8)


def _jpeg_upsample_h2v2(a: np.ndarray) -> np.ndarray:
    """jdsample.c h2v2_fancy_upsample (triangular 2x2); vertical
    neighbors replicate at the edges (jdmainct context rows)."""
    a = a.astype(np.int32)
    up = np.concatenate([a[:1], a[:-1]], axis=0)
    down = np.concatenate([a[1:], a[-1:]], axis=0)
    rows = np.empty((a.shape[0] * 2, a.shape[1]), dtype=np.int32)
    rows[0::2] = a * 3 + up        # nearer row weighted 3:1
    rows[1::2] = a * 3 + down
    left = np.concatenate([rows[:, :1], rows[:, :-1]], axis=1)
    right = np.concatenate([rows[:, 1:], rows[:, -1:]], axis=1)
    out = np.empty((rows.shape[0], rows.shape[1] * 2), dtype=np.int32)
    out[:, 0::2] = (rows * 3 + left + 8) >> 4
    out[:, 1::2] = (rows * 3 + right + 7) >> 4
    out[:, 0] = (rows[:, 0] * 4 + 8) >> 4      # edge: replicate sample
    out[:, -1] = (rows[:, -1] * 4 + 7) >> 4
    return out.astype(np.uint8)


def _jpeg_upsample_h1v2(a: np.ndarray) -> np.ndarray:
    """libjpeg-turbo h1v2_fancy_upsample (triangular vertical 2x):
    even output rows blend 3:1 with the row above, odd with the row
    below; edge rows clamp (context-row replication)."""
    a = a.astype(np.int32)
    up = np.concatenate([a[:1], a[:-1]], axis=0)
    down = np.concatenate([a[1:], a[-1:]], axis=0)
    out = np.empty((a.shape[0] * 2, a.shape[1]), dtype=np.int32)
    out[0::2] = (a * 3 + up + 1) >> 2
    out[1::2] = (a * 3 + down + 2) >> 2
    return out.astype(np.uint8)


def _jpeg_ycc_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
    """jdcolor.c fixed-point tables (FIX = x * 65536 + .5 rounding)."""
    yi = y.astype(np.int32)
    cbi = cb.astype(np.int32) - 128
    cri = cr.astype(np.int32) - 128
    chans = []
    for ch in (yi + ((91881 * cri + 32768) >> 16),      # FIX(1.40200)
               yi + ((-22554 * cbi - 46802 * cri + 32768) >> 16),
               yi + ((116130 * cbi + 32768) >> 16)):    # FIX(1.77200)
        # clamp in place, narrow to uint8 while still contiguous — the
        # interleaved store then copies 1 byte/px/channel (6x faster
        # than clamping through a strided int32 view)
        np.minimum(ch, 255, out=ch)
        np.maximum(ch, 0, out=ch)
        chans.append(ch.astype(np.uint8))
    return np.stack(chans, axis=-1)


def _jpeg_scan_ecs(blob: bytes, start: int):
    """Entropy-coded bytes from `start` up to the next real marker
    (skipping stuffed FF00 and restart markers); returns (ecs, next)."""
    i = start
    n = len(blob)
    while True:
        j = blob.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            return blob[start:n], n
        m = blob[j + 1]
        if m == 0x00 or 0xD0 <= m <= 0xD7:
            i = j + 2
        elif m == 0xFF:                 # fill byte
            i = j + 1
        else:
            return blob[start:j], j


def _jpeg_decode_block(bits, row, dc_lut, ac_lut, pred, zz):
    """Sequential full-block decode (DC diff + AC run-length)."""
    dc_sym, dc_len = dc_lut
    ac_sym, ac_len = ac_lut
    p16 = bits.peek16()
    s = dc_sym[p16]
    bits.skip(dc_len[p16])
    if s:
        pred += _jpeg_extend(bits.take(s), s)
    row[0] = pred
    k = 1
    while k < 64:
        p16 = bits.peek16()
        rs = ac_sym[p16]
        bits.skip(ac_len[p16])
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                break
            k += 16
            continue
        k += r
        row[zz[k]] = _jpeg_extend(bits.take(s), s)
        k += 1
    return pred


def _jpeg_ac_first(bits, row, ac_lut, ss, se, al, eobrun, zz):
    """jdphuff.c decode_mcu_AC_first: one block of a first AC scan."""
    if eobrun > 0:
        return eobrun - 1
    ac_sym, ac_len = ac_lut
    k = ss
    while k <= se:
        p16 = bits.peek16()
        rs = ac_sym[p16]
        bits.skip(ac_len[p16])
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += bits.take(r)
                break
            k += 16
            continue
        k += r
        row[zz[k]] = _jpeg_extend(bits.take(s), s) << al
        k += 1
    return eobrun


def _jpeg_ac_refine(bits, row, ac_lut, ss, se, al, eobrun, zz):
    """jdphuff.c decode_mcu_AC_refine: one block of a refinement AC
    scan — correction bits for known coefficients, new +-1s at `al`."""
    p1 = 1 << al
    m1 = -1 << al
    ac_sym, ac_len = ac_lut
    k = ss
    if eobrun == 0:
        while k <= se:
            p16 = bits.peek16()
            rs = ac_sym[p16]
            bits.skip(ac_len[p16])
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += bits.take(r)
                    break
            else:
                s = p1 if bits.take(1) else m1
            while k <= se:
                idx = zz[k]
                c = int(row[idx])
                if c != 0:
                    if bits.take(1) and (c & p1) == 0:
                        row[idx] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                row[zz[k]] = s
            k += 1
    if eobrun > 0:
        while k <= se:
            idx = zz[k]
            c = int(row[idx])
            if c != 0 and bits.take(1) and (c & p1) == 0:
                row[idx] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_decode_scan(scan_comps, mcus_x, mcus_y, restart_interval,
                      intervals, progressive, ss, se, ah, al):
    """Decode one scan's entropy data into the components' coefficient
    arrays.  `scan_comps` carry their dc/ac LUTs; multi-component scans
    interleave by MCU, single-component scans walk the component's own
    block raster (T.81 non-interleaved geometry)."""
    zz = _JPEG_ZIGZAG.tolist()
    interleaved = len(scan_comps) > 1
    if interleaved:
        order = []
        for c in scan_comps:
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    order.append((c, by, bx))
        n_units = mcus_x * mcus_y
    else:
        c0 = scan_comps[0]
        n_units = c0["nbx"] * c0["nby"]
    unit = 0
    for seg_i, data in enumerate(intervals):
        bits = _JpegBits(data)
        pred = {c["id"]: 0 for c in scan_comps}
        eobrun = 0
        stop = (min((seg_i + 1) * restart_interval, n_units)
                if restart_interval else n_units)
        while unit < stop:
            if interleaved:
                my, mx = divmod(unit, mcus_x)
                for c, by, bx in order:
                    row = c["coef"][(my * c["v"] + by) * c["bw"]
                                    + mx * c["h"] + bx]
                    if not progressive:
                        pred[c["id"]] = _jpeg_decode_block(
                            bits, row, c["dc"], c["ac"], pred[c["id"]], zz)
                    elif ah == 0:       # DC first scan
                        dc_sym, dc_len = c["dc"]
                        p16 = bits.peek16()
                        s = dc_sym[p16]
                        bits.skip(dc_len[p16])
                        if s:
                            pred[c["id"]] += _jpeg_extend(bits.take(s), s)
                        row[0] = pred[c["id"]] << al
                    else:               # DC refinement
                        if bits.take(1):
                            row[0] = int(row[0]) | (1 << al)
            else:
                by, bx = divmod(unit, c0["nbx"])
                row = c0["coef"][by * c0["bw"] + bx]
                if not progressive:
                    pred[c0["id"]] = _jpeg_decode_block(
                        bits, row, c0["dc"], c0["ac"], pred[c0["id"]], zz)
                elif ss == 0:
                    if ah == 0:
                        dc_sym, dc_len = c0["dc"]
                        p16 = bits.peek16()
                        s = dc_sym[p16]
                        bits.skip(dc_len[p16])
                        if s:
                            pred[c0["id"]] += _jpeg_extend(bits.take(s), s)
                        row[0] = pred[c0["id"]] << al
                    else:
                        if bits.take(1):
                            row[0] = int(row[0]) | (1 << al)
                elif ah == 0:
                    eobrun = _jpeg_ac_first(
                        bits, row, c0["ac"], ss, se, al, eobrun, zz)
                else:
                    eobrun = _jpeg_ac_refine(
                        bits, row, c0["ac"], ss, se, al, eobrun, zz)
            unit += 1
        if unit >= n_units:
            break


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline + progressive JPEG -> (H, W, 1|3) uint8
    (IJG-pipeline-exact; see section comment)."""
    import re as _re

    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    sof = None
    progressive = False
    adobe_transform = None
    restart_interval = 0
    comps = None
    hmax = vmax = mcus_x = mcus_y = 0
    h = w = 0
    i = 2
    n = len(blob)
    while i + 2 <= n:
        if blob[i] != 0xFF:
            raise ValueError("JPEG: bad marker sync")
        m = blob[i + 1]
        if m == 0xD9:                          # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            break
        ln = struct.unpack(">H", blob[i + 2:i + 4])[0]
        seg = blob[i + 4:i + 2 + ln]
        if m == 0xDB:                          # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    q = np.frombuffer(seg[p:p + 128], dtype=">u2")
                    p += 128
                else:
                    q = np.frombuffer(seg[p:p + 64], dtype=np.uint8)
                    p += 64
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_JPEG_ZIGZAG] = q.astype(np.int32)
                quant[tq] = tbl
        elif m == 0xC4:                        # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1:p + 17])
                nsym = sum(counts)
                syms = seg[p + 17:p + 17 + nsym]
                huff[(tc, th)] = _jpeg_huff_lut(counts, syms)
                p += 17 + nsym
        elif m in (0xC0, 0xC1, 0xC2):          # SOF0/1 (sequential), SOF2
            progressive = m == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("JPEG: only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(
                    "JPEG: only 1- or 3-component images supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + ci * 3:9 + ci * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                c["bw"] = mcus_x * c["h"]       # MCU-padded block grid
                c["bh"] = mcus_y * c["v"]
                cw = (w * c["h"] + hmax - 1) // hmax
                ch = (h * c["v"] + vmax - 1) // vmax
                c["nbx"] = (cw + 7) // 8        # non-interleaved grid
                c["nby"] = (ch + 7) // 8
                c["coef"] = np.zeros((c["bh"] * c["bw"], 64),
                                     dtype=np.int32)
            sof = True
        elif 0xC3 <= m <= 0xCF and m != 0xC8:
            raise ValueError(
                f"JPEG: unsupported coding process SOF{m - 0xC0} "
                "(baseline/extended sequential and progressive only)")
        elif m == 0xDD:                        # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif m == 0xEE and seg[:5] == b"Adobe":    # APP14
            adobe_transform = seg[11]
        elif m == 0xDA:                        # SOS
            if comps is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            by_id = {c["id"]: c for c in comps}
            scan_comps = []
            for si in range(ns):
                cid = seg[1 + si * 2]
                td, ta = seg[2 + si * 2] >> 4, seg[2 + si * 2] & 15
                c = by_id[cid]
                c["dc"] = huff.get((0, td))
                c["ac"] = huff.get((1, ta))
                scan_comps.append(c)
            ss, se = seg[1 + ns * 2], seg[2 + ns * 2]
            a = seg[3 + ns * 2]
            ah, al = a >> 4, a & 15
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            ecs, nxt = _jpeg_scan_ecs(blob, i + 2 + ln)
            intervals = [x.replace(b"\xff\x00", b"\xff")
                         for x in _re.split(b"\xff[\xd0-\xd7]", ecs)]
            _jpeg_decode_scan(scan_comps, mcus_x, mcus_y,
                              restart_interval, intervals, progressive,
                              ss, se, ah, al)
            i = nxt
            continue
        i += 2 + ln
    if sof is None:
        raise ValueError("JPEG: missing SOF")

    # IDCT per component, assemble sample planes, upsample to full res
    planes = []
    for c in comps:
        px = _jpeg_idct_islow(c["coef"], quant[c["tq"]])
        px = (px.reshape(c["bh"], c["bw"], 8, 8)
              .transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8))
        cw = (w * c["h"] + hmax - 1) // hmax      # ceil(w * h/hmax)
        ch = (h * c["v"] + vmax - 1) // vmax
        px = px[:ch, :cw]
        rh, rv = hmax // c["h"], vmax // c["v"]
        # jinit_upsampler: the triangular "fancy" filters exist only for
        # h2v1 / h2v2 AND downsampled_width > 2 — narrower planes (and
        # every other ratio) take the plain replication upsampler
        if (rh, rv) == (2, 1) and cw > 2:
            px = _jpeg_upsample_h2v1(px)
        elif (rh, rv) == (2, 2) and cw > 2:
            px = _jpeg_upsample_h2v2(px)
        elif (rh, rv) == (1, 2):
            px = _jpeg_upsample_h1v2(px)
        elif (rh, rv) != (1, 1):
            px = np.repeat(np.repeat(px, rv, axis=0), rh, axis=1)
        planes.append(px[:h, :w])
    if len(planes) == 1:
        return planes[0][:, :, None].copy()
    if adobe_transform == 0:
        return np.stack(planes, axis=-1)          # already RGB
    return _jpeg_ycc_to_rgb(*planes)


_DECODERS = (
    (_PNG_MAGIC[:4], decode_png),
    (b"BM", decode_bmp),
    (b"P6", decode_ppm),
    (b"P5", decode_ppm),
    (b"\xff\xd8\xff", decode_jpeg),
)


def decode_image(blob: bytes) -> np.ndarray:
    """Magic-sniffing dispatch.  Raises ValueError for formats that need
    real codec libraries (AVIF, ...)."""
    if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        from .webpcodec import decode_webp
        return decode_webp(blob)
    for magic, fn in _DECODERS:
        if blob.startswith(magic):
            return fn(blob)
    raise ValueError(
        f"unsupported image format (magic {blob[:4]!r}); "
        "AVIF/... need codec libraries not present in this "
        "environment")

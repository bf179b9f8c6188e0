"""Dependency-free WebP lossless (VP8L) decoding.

Companion to `imagecodec.py` (PNG/BMP/PPM/JPEG): a pure numpy + stdlib
implementation of the public "WebP Lossless Bitstream Specification"
(https://developers.google.com/speed/webp/docs/webp_lossless_bitstream_specification),
covering the full format:

* RIFF / VP8X container walk to the VP8L chunk;
* LSB-first bitstream, canonical prefix codes (simple 1-2-symbol codes
  and the code-length-coded normal form, DEFLATE-style repeats with
  VP8L's `prev_code_len = 8` seed and max_symbol counting);
* color cache, meta prefix-code image, LZ77 with the 120-entry 2D
  distance map;
* all four transforms inverted in reverse read order: PREDICTOR (14
  modes), COLOR (signed fixed-point cross-color), SUBTRACT_GREEN,
  COLOR_INDEXING (palette delta-accumulation + 1/2/4-bit pixel packing).

Parity: bit-exact against the container's official libwebp
(`libwebp.so.7`, see tests/webp_oracle.py + tests/test_webpcodec.py) on
encoder-generated fixtures; the 2D distance map and the predictor-mode
corner semantics are additionally pinned by PROBE streams — crafted
minimal VP8L bitstreams decoded by libwebp itself — so none of the
easy-to-misread spec tables is trusted from transcription alone.

Lossy (VP8) WebP is NOT implemented here: it needs a full intra-frame
video decoder; `decode_webp` raises ValueError for it (the multimodal
pipeline keeps lossy behind the `decoder=` injection hook, like
audio/video).

Returns (H, W, 4) uint8 RGBA, matching WebPDecodeRGBA.
"""

from __future__ import annotations

import struct

import numpy as np

# Code-length-code symbol order (spec §5.2.2, identical role to
# DEFLATE's but a different permutation).
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_NUM_LITERALS = 256
_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40
_MAX_CODE_LENGTH = 15

# The 2D distance map (spec §4.2.2): distance codes 1..120 address a
# pixel neighborhood (dx, dy) relative to the current pixel; codes >120
# are linear distances minus 120.  This table was NOT transcribed from
# the spec: it was extracted by probing the official libwebp decoder
# with 120 crafted one-copy bitstreams (tools/webp_probe.py;
# tests/test_webpcodec.py re-derives and asserts it when libwebp.so.7
# is present).
_DIST_MAP: tuple[tuple[int, int], ...] = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
    (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
    (0, 3), (3, 0), (1, 3), (-1, 3), (3, 1), (-3, 1),
    (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3),
    (2, 4), (-2, 4), (4, 2), (-4, 2), (0, 5), (3, 4),
    (-3, 4), (4, 3), (-4, 3), (5, 0), (1, 5), (-1, 5),
    (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3),
    (0, 6), (6, 0), (1, 6), (-1, 6), (6, 1), (-6, 1),
    (2, 6), (-2, 6), (6, 2), (-6, 2), (4, 5), (-4, 5),
    (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5),
    (7, 1), (-7, 1), (4, 6), (-4, 6), (6, 4), (-6, 4),
    (2, 7), (-2, 7), (7, 2), (-7, 2), (3, 7), (-3, 7),
    (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1),
    (8, 2), (6, 6), (-6, 6), (8, 3), (5, 7), (-5, 7),
    (7, 5), (-7, 5), (8, 4), (6, 7), (-6, 7), (7, 6),
    (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


def _prefix_value(code: int, bits) -> int:
    """LZ77 length/distance prefix coding (spec §4.2.2).

    code < 4 -> code + 1; else (2 + (code & 1)) << extra  plus
    extra_bits read from the stream, plus 1.
    """
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + bits.read(extra) + 1


class _Bits:
    """LSB-first bit reader over bytes."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data + b"\x00" * 8
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        b = p >> 3
        v = int.from_bytes(self.data[b: b + 8], "little") >> (p & 7)
        self.pos = p + n
        return v & ((1 << n) - 1)

    def peek15(self) -> int:
        p = self.pos
        b = p >> 3
        return (int.from_bytes(self.data[b: b + 8], "little") >> (p & 7)) & 0x7FFF


class _Code:
    """Canonical prefix code with a flat peek-LUT (LSB-first stream).

    Canonical assignment is DEFLATE's (codes in (length, symbol) order,
    read MSB-first bit by bit); the LUT is indexed by the raw peeked
    bits, so each code's entries live at indices whose low `len` bits
    are the bit-reversed code.
    """

    __slots__ = ("lut_sym", "lut_len", "bits", "single")

    def __init__(self, lengths: np.ndarray):
        nz = np.flatnonzero(lengths)
        if len(nz) == 0:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            # degenerate single-symbol code: zero bits per symbol
            self.single = int(nz[0])
            self.bits = 0
            self.lut_sym = self.lut_len = None
            return
        self.single = -1
        maxlen = int(lengths[nz].max())
        if maxlen > _MAX_CODE_LENGTH:
            raise ValueError("code length > 15")
        # canonical codes, MSB-first
        counts = np.bincount(lengths[nz], minlength=maxlen + 1)
        next_code = np.zeros(maxlen + 1, dtype=np.int64)
        code = 0
        for L in range(1, maxlen + 1):
            code = (code + counts[L - 1]) << 1 if L > 1 else 0
            next_code[L] = code
        # completeness check (over-subscribed codes are corrupt input)
        total = int((counts[1:] * (1 << (maxlen - np.arange(1, maxlen + 1)))).sum())
        if total > (1 << maxlen):
            raise ValueError("over-subscribed prefix code")
        self.bits = maxlen
        size = 1 << maxlen
        self.lut_sym = np.full(size, -1, dtype=np.int32)
        self.lut_len = np.zeros(size, dtype=np.int8)
        for sym in nz:
            L = int(lengths[sym])
            c = int(next_code[L])
            next_code[L] += 1
            # bit-reverse c over L bits
            r = int(f"{c:0{L}b}"[::-1], 2)
            step = 1 << L
            idx = np.arange(r, size, step)
            self.lut_sym[idx] = sym
            self.lut_len[idx] = L

    def decode(self, bits: _Bits) -> int:
        if self.single >= 0:
            return self.single
        v = bits.peek15() & ((1 << self.bits) - 1)
        sym = self.lut_sym[v]
        if sym < 0:
            raise ValueError("invalid prefix code word")
        bits.pos += int(self.lut_len[v])
        return int(sym)


def _read_code(bits: _Bits, alphabet_size: int) -> _Code:
    """One prefix code (spec §5.2.1-5.2.2)."""
    lengths = np.zeros(alphabet_size, dtype=np.int32)
    if bits.read(1):  # simple code
        num_symbols = bits.read(1) + 1
        first_8bits = bits.read(1)
        sym0 = bits.read(8 if first_8bits else 1)
        lengths[sym0] = 1
        if num_symbols == 2:
            sym1 = bits.read(8)
            lengths[sym1] = 1
        if num_symbols == 1:
            code = _Code.__new__(_Code)
            code.single = sym0
            code.bits = 0
            code.lut_sym = code.lut_len = None
            return code
        return _Code(lengths)
    # normal: code lengths are themselves prefix-coded
    clc_lengths = np.zeros(19, dtype=np.int32)
    num_clc = 4 + bits.read(4)
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = bits.read(3)
    clc = _Code(clc_lengths)
    if bits.read(1):  # explicit max_symbol
        length_nbits = 2 + 2 * bits.read(3)
        max_symbol = 2 + bits.read(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_code_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = clc.decode(bits)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_code_len = code_len
        else:
            if code_len == 16:
                repeat, fill = 3 + bits.read(2), prev_code_len
            elif code_len == 17:
                repeat, fill = 3 + bits.read(3), 0
            else:
                repeat, fill = 11 + bits.read(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("code length repeat overflows alphabet")
            if fill:
                lengths[symbol: symbol + repeat] = fill
            symbol += repeat
    return _Code(lengths)


class _Group:
    __slots__ = ("green", "red", "blue", "alpha", "dist")

    def __init__(self, bits: _Bits, cache_size: int):
        self.green = _read_code(bits, _NUM_LITERALS + _NUM_LENGTH_CODES + cache_size)
        self.red = _read_code(bits, 256)
        self.blue = _read_code(bits, 256)
        self.alpha = _read_code(bits, 256)
        self.dist = _read_code(bits, _NUM_DISTANCE_CODES)


def _div_round_up(a: int, b: int) -> int:
    return (a + b - 1) // b


def _decode_image_stream(bits: _Bits, xsize: int, ysize: int,
                         is_level0: bool):
    """DecodeImageStream (spec §5.3): returns (argb_uint32_flat, transforms)
    where transforms is the read-order list (level 0 only)."""
    transforms = []
    if is_level0:
        seen = set()
        while bits.read(1):
            ttype = bits.read(2)
            if ttype in seen:
                raise ValueError("duplicate transform")
            seen.add(ttype)
            t, xsize = _read_transform(bits, ttype, xsize, ysize)
            transforms.append(t)

    cache_bits = 0
    if bits.read(1):
        cache_bits = bits.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color cache bits")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta_codes = None
    huffman_bits = 0
    meta_xsize = 0
    num_groups = 1
    if is_level0 and bits.read(1):
        huffman_bits = bits.read(3) + 2
        meta_xsize = _div_round_up(xsize, 1 << huffman_bits)
        meta_ysize = _div_round_up(ysize, 1 << huffman_bits)
        meta_img, _ = _decode_image_stream(bits, meta_xsize, meta_ysize, False)
        # meta code index = (red << 8) | green
        meta_codes = (((meta_img >> 16) & 0xFF) << 8) | ((meta_img >> 8) & 0xFF)
        num_groups = int(meta_codes.max()) + 1

    groups = [_Group(bits, cache_size) for _ in range(num_groups)]

    argb = _decode_image_data(bits, xsize, ysize, groups, meta_codes,
                              meta_xsize, huffman_bits, cache_bits)
    return argb, transforms


def _decode_image_data(bits: _Bits, xsize: int, ysize: int, groups,
                       meta_codes, meta_xsize: int, huffman_bits: int,
                       cache_bits: int) -> np.ndarray:
    npix = xsize * ysize
    out = np.zeros(npix, dtype=np.uint32)
    cache = None
    if cache_bits:
        cache = np.zeros(1 << cache_bits, dtype=np.uint32)
        cache_shift = 32 - cache_bits
    pos = 0
    x = 0
    group = groups[0]
    single = len(groups) == 1
    mask = (1 << huffman_bits) - 1 if huffman_bits else 0
    while pos < npix:
        if not single and (x & mask) == 0:
            y = pos // xsize
            group = groups[int(meta_codes[(y >> huffman_bits) * meta_xsize
                                          + (x >> huffman_bits)])]
        S = group.green.decode(bits)
        if S < _NUM_LITERALS:
            red = group.red.decode(bits)
            blue = group.blue.decode(bits)
            alpha = group.alpha.decode(bits)
            px = (alpha << 24) | (red << 16) | (S << 8) | blue
            out[pos] = px
            if cache_bits:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> cache_shift] = px
            pos += 1
            x += 1
            if x == xsize:
                x = 0
        elif S < _NUM_LITERALS + _NUM_LENGTH_CODES:
            length = _prefix_value(S - _NUM_LITERALS, bits)
            dist_code = _prefix_value(group.dist.decode(bits), bits)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dx + dy * xsize
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > npix:
                raise ValueError("LZ77 copy out of bounds")
            if dist >= length:
                out[pos: pos + length] = out[pos - dist: pos - dist + length]
            else:
                for i in range(length):
                    out[pos + i] = out[pos + i - dist]
            if cache_bits:
                seg = out[pos: pos + length]
                cache[(0x1E35A7BD * seg & 0xFFFFFFFF) >> cache_shift] = seg
            pos += length
            x = pos % xsize
        else:
            if cache is None:
                raise ValueError("cache reference without color cache")
            px = int(cache[S - _NUM_LITERALS - _NUM_LENGTH_CODES])
            out[pos] = px
            pos += 1
            x += 1
            if x == xsize:
                x = 0
    return out


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------

class _Transform:
    __slots__ = ("ttype", "xsize", "bits", "data")

    def __init__(self, ttype, xsize, bits, data):
        self.ttype = ttype      # 0 predictor, 1 color, 2 sub-green, 3 palette
        self.xsize = xsize      # image width WHEN THE TRANSFORM WAS READ
        self.bits = bits        # block size bits (0/1) or packing bits (3)
        self.data = data        # sub-image argb (0/1), palette argb (3)


def _read_transform(bits: _Bits, ttype: int, xsize: int, ysize: int):
    if ttype in (0, 1):  # predictor / color: block sub-image
        size_bits = bits.read(3) + 2
        sub_w = _div_round_up(xsize, 1 << size_bits)
        sub_h = _div_round_up(ysize, 1 << size_bits)
        img, _ = _decode_image_stream(bits, sub_w, sub_h, False)
        return _Transform(ttype, xsize, size_bits, img), xsize
    if ttype == 2:  # subtract green
        return _Transform(2, xsize, 0, None), xsize
    # color indexing
    n_colors = bits.read(8) + 1
    if n_colors <= 2:
        pack_bits = 3
    elif n_colors <= 4:
        pack_bits = 2
    elif n_colors <= 16:
        pack_bits = 1
    else:
        pack_bits = 0
    pal, _ = _decode_image_stream(bits, n_colors, 1, False)
    # palette entries are component-wise deltas from the previous entry
    a = np.cumsum((pal >> 24) & 0xFF, dtype=np.uint64).astype(np.uint32) & 0xFF
    r = np.cumsum((pal >> 16) & 0xFF, dtype=np.uint64).astype(np.uint32) & 0xFF
    g = np.cumsum((pal >> 8) & 0xFF, dtype=np.uint64).astype(np.uint32) & 0xFF
    b = np.cumsum(pal & 0xFF, dtype=np.uint64).astype(np.uint32) & 0xFF
    pal = (a << 24) | (r << 16) | (g << 8) | b
    new_xsize = _div_round_up(xsize, 1 << pack_bits) if pack_bits else xsize
    return _Transform(3, xsize, pack_bits, pal), new_xsize


def _avg2(a, b):
    return (a + b) >> 1


def _clamp(v):
    return np.clip(v, 0, 255)


def _inv_subtract_green(argb: np.ndarray) -> np.ndarray:
    g = (argb >> 8) & 0xFF
    r = (((argb >> 16) & 0xFF) + g) & 0xFF
    b = ((argb & 0xFF) + g) & 0xFF
    return (argb & np.uint32(0xFF00FF00)) | (r << 16) | b


def _inv_color_transform(argb: np.ndarray, t: _Transform) -> np.ndarray:
    """Inverse cross-color (spec §4.2.1): signed 3.5 fixed-point
    multipliers stored per block as g2r=BLUE, g2b=GREEN, r2b=RED."""
    xsize = t.xsize
    ysize = len(argb) // xsize
    bs = t.bits
    sub_w = _div_round_up(xsize, 1 << bs)
    xi = np.arange(xsize) >> bs
    yi = np.arange(ysize) >> bs
    cte = t.data[(yi[:, None] * sub_w + xi[None, :])].ravel()
    g2r = (cte & 0xFF).astype(np.uint8).view(np.int8).astype(np.int32)
    g2b = ((cte >> 8) & 0xFF).astype(np.uint8).view(np.int8).astype(np.int32)
    r2b = ((cte >> 16) & 0xFF).astype(np.uint8).view(np.int8).astype(np.int32)
    g = ((argb >> 8) & 0xFF).astype(np.uint8).view(np.int8).astype(np.int32)
    red = ((argb >> 16) & 0xFF).astype(np.int32)
    blue = (argb & 0xFF).astype(np.int32)
    red = (red + ((g2r * g) >> 5)) & 0xFF
    red_s = red.astype(np.uint8).view(np.int8).astype(np.int32)
    blue = (blue + ((g2b * g) >> 5) + ((r2b * red_s) >> 5)) & 0xFF
    return ((argb & np.uint32(0xFF00FF00))
            | red.astype(np.uint32) << 16 | blue.astype(np.uint32))


def _inv_color_indexing(argb: np.ndarray, t: _Transform) -> np.ndarray:
    pal = t.data
    xsize = t.xsize  # ORIGINAL width
    if t.bits == 0:
        idx = (argb >> 8) & 0xFF
        safe = np.where(idx < len(pal), idx, 0)
        out = np.where(idx < len(pal), pal[safe], np.uint32(0))
        return out
    per = 1 << t.bits              # pixels per packed byte: 2/4/8
    ib = 8 >> t.bits               # index bit width: 4/2/1
    packed_w = _div_round_up(xsize, per)
    ysize = len(argb) // packed_w
    packed = ((argb >> 8) & 0xFF).reshape(ysize, packed_w).astype(np.uint32)
    shifts = (np.arange(per) * ib).astype(np.uint32)
    idx = (packed[:, :, None] >> shifts[None, None, :]) & ((1 << ib) - 1)
    idx = idx.reshape(ysize, packed_w * per)[:, :xsize].ravel()
    safe = np.where(idx < len(pal), idx, 0)
    return np.where(idx < len(pal), pal[safe], np.uint32(0))


def _inv_predictor(argb: np.ndarray, t: _Transform) -> np.ndarray:
    """Inverse spatial prediction (spec §4.2.1, 14 modes).

    Works on (ysize, xsize, 4) int32 channel planes; residuals add to
    predictions mod 256 per channel.  Corner rules: (0,0) predicts
    opaque black; row 0 predicts L; column 0 predicts T; TR at the last
    column is the previous row's FIRST pixel of the NEXT row index —
    i.e. top[x+1] reads past the row into the leftmost pixel of the
    same top row buffer (probe-pinned in tests against libwebp).
    """
    xsize = t.xsize
    ysize = len(argb) // xsize
    bs = t.bits
    sub_w = _div_round_up(xsize, 1 << bs)
    modes = ((t.data >> 8) & 0xFF).astype(np.int32)
    px = argb.reshape(ysize, xsize)
    ch = np.empty((ysize, xsize, 4), dtype=np.int32)
    ch[..., 0] = (px >> 24) & 0xFF
    ch[..., 1] = (px >> 16) & 0xFF
    ch[..., 2] = (px >> 8) & 0xFF
    ch[..., 3] = px & 0xFF

    black = np.array([255, 0, 0, 0], dtype=np.int32)
    for y in range(ysize):
        row = ch[y]
        top = ch[y - 1] if y > 0 else None
        mrow = modes[(y >> bs) * sub_w:]
        for x in range(xsize):
            if y == 0:
                pred = black if x == 0 else row[x - 1]
            elif x == 0:
                pred = top[0]
            else:
                m = mrow[x >> bs]
                L = row[x - 1]
                T = top[x]
                if m == 0:
                    pred = black
                elif m == 1:
                    pred = L
                elif m == 2:
                    pred = T
                elif m == 3:
                    pred = top[x + 1] if x + 1 < xsize else ch[y, 0]
                elif m == 4:
                    pred = top[x - 1]
                else:
                    TL = top[x - 1]
                    TR = top[x + 1] if x + 1 < xsize else ch[y, 0]
                    if m == 5:
                        pred = _avg2(_avg2(L, TR), T)
                    elif m == 6:
                        pred = _avg2(L, TL)
                    elif m == 7:
                        pred = _avg2(L, T)
                    elif m == 8:
                        pred = _avg2(TL, T)
                    elif m == 9:
                        pred = _avg2(T, TR)
                    elif m == 10:
                        pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                    elif m == 11:
                        p = L + T - TL
                        pL = np.abs(p - L).sum()
                        pT = np.abs(p - T).sum()
                        pred = L if pL < pT else T
                    elif m == 12:
                        pred = _clamp(L + T - TL)
                    elif m == 13:
                        # a + (a - TL) / 2 with C truncation toward zero
                        # (probe-pinned: floor division diverges)
                        a = _avg2(L, T)
                        d = a - TL
                        pred = _clamp(a + np.sign(d) * (np.abs(d) >> 1))
                    else:
                        raise ValueError(f"bad predictor mode {m}")
                row[x] = (row[x] + pred) & 0xFF
                continue
            row[x] = (row[x] + pred) & 0xFF

    out = ((ch[..., 0].astype(np.uint32) << 24)
           | (ch[..., 1].astype(np.uint32) << 16)
           | (ch[..., 2].astype(np.uint32) << 8)
           | ch[..., 3].astype(np.uint32))
    return out.ravel()


def _apply_inverse_transforms(argb: np.ndarray, transforms) -> np.ndarray:
    for t in reversed(transforms):
        if t.ttype == 0:
            argb = _inv_predictor(argb, t)
        elif t.ttype == 1:
            argb = _inv_color_transform(argb, t)
        elif t.ttype == 2:
            argb = _inv_subtract_green(argb)
        else:
            argb = _inv_color_indexing(argb, t)
    return argb


# ---------------------------------------------------------------------------
# Container + entry point
# ---------------------------------------------------------------------------

def _find_bitstream(blob: bytes):
    """Walk the RIFF container.  Returns (fourcc, payload, alpha_payload)
    for the first VP8L (lossless) or VP8 (lossy) chunk; alpha_payload is
    the ALPH chunk body when present (lossy + alpha, container spec §
    "Alpha")."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) file")
    pos = 12
    alpha = None
    while pos + 8 <= len(blob):
        fourcc = blob[pos: pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4: pos + 8])
        payload = blob[pos + 8: pos + 8 + size]
        if fourcc in (b"VP8L", b"VP8 "):
            return fourcc, payload, alpha
        if fourcc == b"ALPH":
            alpha = payload
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    raise ValueError("no VP8L/VP8 chunk found")


def _find_vp8l(blob: bytes) -> bytes:
    fourcc, payload, _ = _find_bitstream(blob)
    if fourcc != b"VP8L":
        raise ValueError("not a lossless (VP8L) WebP")
    return payload


def _unfilter_alpha(plane: np.ndarray, method: int) -> np.ndarray:
    """ALPH filtering inverse (libwebp filters.c, mod-256 arithmetic;
    row 0 of every method falls back to horizontal with no prev row)."""
    if method == 0:
        return plane
    h, w = plane.shape
    out = np.empty_like(plane)
    out[0] = np.cumsum(plane[0], dtype=np.uint32).astype(np.uint8)
    if method == 1:      # horizontal: pred = left; first col pred = above
        for i in range(1, h):
            row = np.cumsum(plane[i], dtype=np.uint32) + out[i - 1, 0]
            out[i] = row.astype(np.uint8)
    elif method == 2:    # vertical: pred = above (row 0 = horizontal)
        corr = np.cumsum(plane[0], dtype=np.uint32) - plane[0]
        out = (np.cumsum(plane.astype(np.uint32), axis=0)
               + corr[None, :]).astype(np.uint8)
    else:                # gradient: pred = clip(left + above - above_left)
        for i in range(1, h):
            prev = out[i - 1]
            left = int(prev[0])
            tl = left
            row = plane[i]
            o = out[i]
            for j in range(w):
                top = int(prev[j])
                g = left + top - tl
                g = 0 if g < 0 else (255 if g > 255 else g)
                left = (int(row[j]) + g) & 0xFF
                tl = top
                o[j] = left
    return out


def _decode_alpha(payload: bytes, width: int, height: int) -> np.ndarray:
    """ALPH chunk -> (H, W) uint8 alpha plane.  Compression 0 = raw,
    1 = VP8L-coded green channel with externally-supplied dimensions."""
    head = payload[0]
    compression = head & 3
    filt = (head >> 2) & 3
    pre = (head >> 4) & 3
    if pre > 1:
        raise ValueError(f"bad ALPH pre-processing method {pre}")
    # pre == 1 ("preprocessed levels", alpha_quality < 100): the
    # ENCODER lossily quantized the plane before coding; the coded
    # levels ARE the output.  libwebp's DequantizeLevels smoothing
    # runs only under the opt-in decoder alpha_dithering option
    # (default 0 — WebPDecodeRGBA returns the raw levels), so plain
    # decode is bit-exact with the default oracle; pinned across an
    # alpha_quality × filter-method sweep in test_webpcodec.
    data = payload[1:]
    if compression == 0:
        plane = np.frombuffer(data[: width * height],
                              dtype=np.uint8).reshape(height, width).copy()
    elif compression == 1:
        bits = _Bits(data)
        argb, transforms = _decode_image_stream(bits, width, height, True)
        argb = _apply_inverse_transforms(argb, transforms)
        plane = ((argb >> 8) & 0xFF).astype(np.uint8).reshape(height, width)
    else:
        raise ValueError(f"bad ALPH compression method {compression}")
    return _unfilter_alpha(plane, filt)


def decode_vp8l(payload: bytes) -> np.ndarray:
    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    bits = _Bits(payload[1:])
    xsize = bits.read(14) + 1
    ysize = bits.read(14) + 1
    bits.read(1)  # alpha-is-used hint
    version = bits.read(3)
    if version != 0:
        raise ValueError(f"unsupported VP8L version {version}")
    argb, transforms = _decode_image_stream(bits, xsize, ysize, True)
    argb = _apply_inverse_transforms(argb, transforms)
    img = argb.reshape(ysize, xsize)
    out = np.empty((ysize, xsize, 4), dtype=np.uint8)
    out[..., 0] = (img >> 16) & 0xFF
    out[..., 1] = (img >> 8) & 0xFF
    out[..., 2] = img & 0xFF
    out[..., 3] = (img >> 24) & 0xFF
    return out


def decode_webp(blob: bytes) -> np.ndarray:
    """Decode a WebP file (lossless VP8L, lossy VP8, or lossy + ALPH
    alpha) to (H, W, 4) uint8 RGBA, bit-exact vs WebPDecodeRGBA."""
    fourcc, payload, alpha = _find_bitstream(blob)
    if fourcc == b"VP8L":
        return decode_vp8l(payload)
    from .vp8codec import vp8_to_rgba
    rgba = vp8_to_rgba(payload)
    if alpha is not None:
        rgba[..., 3] = _decode_alpha(alpha, rgba.shape[1], rgba.shape[0])
    return rgba

"""Lossy WebP (VP8 intra-frame) decoding — pure numpy + stdlib.

Implements the VP8 keyframe decode path of RFC 6386 ("VP8 Data Format
and Decoding Guide"), which is all a WebP file ever contains (WebP
lossy = one VP8 keyframe):

* boolean (arithmetic) decoder (§7), frame/segment/filter/quant
  headers (§9-10), token partitions;
* intra prediction modes (keyframe trees, contextual 4x4 b-modes);
* DCT/WHT coefficient tokens with the default probability tables
  extracted from the official libwebp build (functions/vp8_tables.py,
  tools/extract_vp8_tables.py — NOT transcribed from the RFC);
* dequantization (§14), 4x4 IDCT / Walsh-Hadamard inverse with the
  exact fixed-point constants, whole-MB reconstruction (§12-13);
* the in-loop deblocking filter, normal and simple variants (§15),
  applied in raster MB order with the exact signed-char arithmetic.

`decode_vp8` returns the Y/U/V planes (4:2:0), verified BIT-EXACT
against the official libwebp's WebPDecodeYUV on encoder-generated
fixtures (tests/test_vp8codec.py); `vp8_to_rgba` adds libwebp's fancy
chroma upsampling + fixed-point color conversion, bit-exact vs
WebPDecodeRGBA.  webpcodec.decode_webp dispatches "VP8 " chunks here.

Throughput note: this is a per-token Python loop — built for
features-at-sample-rate over binary columns, not dense video decode
(same contract as the JPEG/VP8L decoders in this package).
"""

from __future__ import annotations

import numpy as np

from .vp8_tables import (AC_TABLE, BANDS, BMODE_PROBS, CAT3, CAT4, CAT5,
                         CAT6, COEF_PROBS, COEF_UPDATE_PROBS, DC_TABLE,
                         ZIGZAG)

# keyframe mode trees + probabilities (RFC 6386 §11.2; the probability
# constants are pinned by every fixture in tests/test_vp8codec.py — a
# wrong byte here fails all of them at the first macroblock)
_KF_YMODE_TREE = (-4, 2, 4, 6, -0, -1, -2, -3)   # B_PRED, DC, V, H, TM
_KF_YMODE_PROB = (145, 156, 163, 128)
_UV_MODE_TREE = (-0, 2, -1, 4, -2, -3)           # DC, V, H, TM
_KF_UV_PROB = (142, 114, 183)
# RFC 6386's bmode_tree with leaves renumbered into libwebp's b-mode
# order (RD=4, VR=5, LD=6 — the RFC enum has LD=4, RD=5, VR=6), because
# BMODE_PROBS is extracted from libwebp and context-indexed in ITS order.
_BMODE_TREE = (-0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -4, -5, -6, 14, -7, 16,
               -8, -9)
_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# coefficient token tree (§13.2): leaves are token ids 0..11
# 0..4 literal values, 5..10 categories 1..6, 11 = EOB handled outside
_DCT_0, _DCT_1, _DCT_2, _DCT_3, _DCT_4 = 0, 1, 2, 3, 4
_CAT_BASE = (5, 7, 11, 19, 35, 67)
_CAT_PROBS = ((159,), (165, 145), tuple(CAT3.tolist()), tuple(CAT4.tolist()),
              tuple(CAT5.tolist()), tuple(CAT6.tolist()))

_B_DC, _B_TM, _B_VE, _B_HE = 0, 1, 2, 3
_B_RD, _B_VR, _B_LD, _B_VL, _B_HD, _B_HU = 4, 5, 6, 7, 8, 9
_DC, _V, _H, _TM, _B_PRED = 0, 1, 2, 3, 4
# 16x16 mode -> implied uniform b-mode for neighbor context (§11.3)
_MODE_TO_B = {_DC: _B_DC, _V: _B_VE, _H: _B_HE, _TM: _B_TM}


class _Bool:
    """RFC 6386 §7 boolean decoder."""

    __slots__ = ("data", "pos", "value", "range", "bits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.value = (data[0] << 8) | (data[1] if len(data) > 1 else 0)
        self.range = 255
        self.bits = 0

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        bigsplit = split << 8
        if self.value >= bigsplit:
            ret = 1
            self.range -= split
            self.value -= bigsplit
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value = (self.value << 1) & 0xFFFFFF
            self.range <<= 1
            self.bits += 1
            if self.bits == 8:
                self.bits = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                self.pos += 1
        return ret

    def flag(self) -> int:
        return self.get(128)

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.get(128) else v

    def tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i


def _clamp_q(v: int) -> int:
    return 0 if v < 0 else (127 if v > 127 else v)


class _Header:
    pass


def _parse_headers(data: bytes):
    """Frame tag + keyframe header + partition-1 bool-coded headers."""
    h = _Header()
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise ValueError("VP8 interframe in a WebP file")
    h.show = (tag >> 4) & 1
    part1_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    w = data[6] | (data[7] << 8)
    hh = data[8] | (data[9] << 8)
    h.width, h.height = w & 0x3FFF, hh & 0x3FFF
    bd = _Bool(data[10: 10 + part1_size])

    bd.get(128)  # color space
    bd.get(128)  # clamping type

    # segmentation (§9.3)
    h.segmentation = bd.flag()
    h.update_map = 0
    h.seg_abs = 0
    h.seg_quant = [0, 0, 0, 0]
    h.seg_filter = [0, 0, 0, 0]
    h.seg_tree_probs = [255, 255, 255]
    if h.segmentation:
        h.update_map = bd.flag()
        update_data = bd.flag()
        if update_data:
            h.seg_abs = bd.flag()
            for i in range(4):
                h.seg_quant[i] = bd.signed_literal(7) if bd.flag() else 0
            for i in range(4):
                h.seg_filter[i] = bd.signed_literal(6) if bd.flag() else 0
        if h.update_map:
            for i in range(3):
                h.seg_tree_probs[i] = bd.literal(8) if bd.flag() else 255

    # loop filter (§9.4)
    h.filter_simple = bd.get(128)
    h.filter_level = bd.literal(6)
    h.sharpness = bd.literal(3)
    h.lf_delta = bd.flag()
    h.ref_lf_delta = [0, 0, 0, 0]
    h.mode_lf_delta = [0, 0, 0, 0]
    if h.lf_delta and bd.flag():
        for i in range(4):
            if bd.flag():
                h.ref_lf_delta[i] = bd.signed_literal(6)
        for i in range(4):
            if bd.flag():
                h.mode_lf_delta[i] = bd.signed_literal(6)

    # token partitions (§9.5)
    h.n_parts = 1 << bd.literal(2)

    # quantizer indices (§9.6)
    h.y_ac_qi = bd.literal(7)
    h.y_dc_delta = bd.signed_literal(4) if bd.flag() else 0
    h.y2_dc_delta = bd.signed_literal(4) if bd.flag() else 0
    h.y2_ac_delta = bd.signed_literal(4) if bd.flag() else 0
    h.uv_dc_delta = bd.signed_literal(4) if bd.flag() else 0
    h.uv_ac_delta = bd.signed_literal(4) if bd.flag() else 0

    bd.flag()  # refresh entropy probs (no-op for a single keyframe)

    # coefficient probability updates (§13.4)
    probs = COEF_PROBS.copy()
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    if bd.get(int(COEF_UPDATE_PROBS[t, b, c, p])):
                        probs[t, b, c, p] = bd.literal(8)
    h.coef_probs = probs

    h.use_skip = bd.flag()
    h.skip_prob = bd.literal(8) if h.use_skip else 0

    h.part1_bd = bd
    # token partition sizes follow partition 1
    off = 10 + part1_size
    sizes = []
    for i in range(h.n_parts - 1):
        sizes.append(data[off] | (data[off + 1] << 8) | (data[off + 2] << 16))
        off += 3
    h.parts = []
    for s in sizes:
        h.parts.append(_Bool(data[off: off + s]))
        off += s
    h.parts.append(_Bool(data[off:]))
    return h


def _quantizers(h):
    """Per-segment (y1_dc, y1_ac, y2_dc, y2_ac, uv_dc, uv_ac)."""
    out = []
    for s in range(4):
        if h.segmentation:
            base = h.seg_quant[s] if h.seg_abs else h.y_ac_qi + h.seg_quant[s]
        else:
            base = h.y_ac_qi
        q = _clamp_q(base)
        y1dc = int(DC_TABLE[_clamp_q(q + h.y_dc_delta)])
        y1ac = int(AC_TABLE[q])
        y2dc = int(DC_TABLE[_clamp_q(q + h.y2_dc_delta)]) * 2
        y2ac = int(AC_TABLE[_clamp_q(q + h.y2_ac_delta)]) * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = int(DC_TABLE[_clamp_q(q + h.uv_dc_delta)])
        if uvdc > 132:
            uvdc = 132
        uvac = int(AC_TABLE[_clamp_q(q + h.uv_ac_delta)])
        out.append((y1dc, y1ac, y2dc, y2ac, uvdc, uvac))
    return out


def _decode_block(bd, probs_t, first, ctx, dq_dc, dq_ac):
    """One 4x4 coefficient block (§13.3).  Returns (coeffs[16] already
    dequantized in raster order, nonzero_flag)."""
    coeffs = np.zeros(16, dtype=np.int32)
    n = first
    p = probs_t[int(BANDS[n])][ctx]
    nz = False
    start = 0  # 0: include EOB branch; 2: skip it (after a zero)
    while n < 16:
        if start == 0:
            if not bd.get(int(p[0])):
                break  # EOB
        # token tree below the EOB branch
        if not bd.get(int(p[1])):
            v = 0
            n += 1
            p = probs_t[int(BANDS[n]) if n < 16 else 0][0]
            start = 2
            continue
        if not bd.get(int(p[2])):
            v = 1
            nctx = 1
        else:
            if not bd.get(int(p[3])):
                if not bd.get(int(p[4])):
                    v = 2
                else:
                    v = 3 if not bd.get(int(p[5])) else 4
            else:
                if not bd.get(int(p[6])):
                    if not bd.get(int(p[7])):
                        cat = 0
                    else:
                        cat = 1
                else:
                    if not bd.get(int(p[8])):
                        cat = 2 if not bd.get(int(p[9])) else 3
                    else:
                        cat = 4 if not bd.get(int(p[10])) else 5
                v = _CAT_BASE[cat]
                add = 0
                for cp in _CAT_PROBS[cat]:
                    add = (add << 1) | bd.get(cp)
                v += add
            nctx = 2
        if bd.flag():
            v = -v
        pos = int(ZIGZAG[n])
        coeffs[pos] = v * (dq_dc if pos == 0 else dq_ac)
        nz = True
        n += 1
        if n == 16:
            break
        p = probs_t[int(BANDS[n])][nctx]
        start = 0
    return coeffs, nz


# ---------------------------------------------------------------------------
# transforms (§14.3-14.4): exact fixed-point
# ---------------------------------------------------------------------------

def _idct4x4(block: np.ndarray) -> np.ndarray:
    """VP8 inverse DCT, RFC 6386 §14.4 (constants 20091/35468)."""
    c = block.reshape(4, 4).astype(np.int64)
    # vertical pass (columns)
    a = c[0] + c[2]
    b = c[0] - c[2]
    t1 = (c[1] * 35468) >> 16
    t2 = c[3] + ((c[3] * 20091) >> 16)
    cc = t1 - t2
    t1 = c[1] + ((c[1] * 20091) >> 16)
    t2 = (c[3] * 35468) >> 16
    d = t1 + t2
    tmp = np.empty((4, 4), dtype=np.int64)
    tmp[0] = a + d
    tmp[3] = a - d
    tmp[1] = b + cc
    tmp[2] = b - cc
    # horizontal pass (rows) + >>3 with rounding
    t = tmp.T
    a = t[0] + t[2]
    b = t[0] - t[2]
    t1 = (t[1] * 35468) >> 16
    t2 = t[3] + ((t[3] * 20091) >> 16)
    cc = t1 - t2
    t1 = t[1] + ((t[1] * 20091) >> 16)
    t2 = (t[3] * 35468) >> 16
    d = t1 + t2
    out = np.empty((4, 4), dtype=np.int64)
    out[0] = (a + d + 4) >> 3
    out[3] = (a - d + 4) >> 3
    out[1] = (b + cc + 4) >> 3
    out[2] = (b - cc + 4) >> 3
    return out.T.astype(np.int32)


def _iwht4x4(block: np.ndarray) -> np.ndarray:
    """Inverse Walsh-Hadamard for the Y2 block (§14.3)."""
    c = block.reshape(4, 4).astype(np.int64)
    a = c[0] + c[3]
    d = c[1] + c[2]
    e = c[1] - c[2]
    b = c[0] - c[3]
    tmp = np.empty((4, 4), dtype=np.int64)
    tmp[0] = a + d
    tmp[1] = b + e
    tmp[2] = a - d
    tmp[3] = b - e
    t = tmp.T
    a = t[0] + t[3]
    d = t[1] + t[2]
    e = t[1] - t[2]
    b = t[0] - t[3]
    out = np.empty((4, 4), dtype=np.int64)
    out[0] = (a + d + 3) >> 3
    out[1] = (b + e + 3) >> 3
    out[2] = (a - d + 3) >> 3
    out[3] = (b - e + 3) >> 3
    return out.T.astype(np.int32)


# ---------------------------------------------------------------------------
# intra prediction (§12).  Planes carry a 1-pixel border: row -1 above and
# column -1 left, so predictors read plane[y-1+1, x-1+1] style offsets.
# ---------------------------------------------------------------------------

def _pred_dc(plane, y, x, size, has_above, has_left):
    if has_above and has_left:
        s = int(plane[y - 1, x: x + size].sum()
                + plane[y: y + size, x - 1].sum())
        return (s + size) >> int(np.log2(2 * size))
    if has_above:
        s = int(plane[y - 1, x: x + size].sum())
        return (s + size // 2) >> int(np.log2(size))
    if has_left:
        s = int(plane[y: y + size, x - 1].sum())
        return (s + size // 2) >> int(np.log2(size))
    return 128


def _predict_16_or_8(plane, y, x, size, mode, has_above, has_left):
    if mode == _DC:
        plane[y: y + size, x: x + size] = _pred_dc(plane, y, x, size,
                                                   has_above, has_left)
    elif mode == _V:
        plane[y: y + size, x: x + size] = plane[y - 1, x: x + size]
    elif mode == _H:
        plane[y: y + size, x: x + size] = plane[y: y + size, x - 1][:, None]
    else:  # TM
        above = plane[y - 1, x: x + size].astype(np.int32)
        left = plane[y: y + size, x - 1].astype(np.int32)
        tl = int(plane[y - 1, x - 1])
        v = left[:, None] + above[None, :] - tl
        plane[y: y + size, x: x + size] = np.clip(v, 0, 255)


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def _predict_b(plane, y, x, mode, above_right):
    """4x4 sub-block prediction (§12.3).  above_right: 4 pixels."""
    A = plane[y - 1, x: x + 4].astype(np.int32)
    AR = above_right.astype(np.int32)
    L = plane[y: y + 4, x - 1].astype(np.int32)
    TL = int(plane[y - 1, x - 1])
    out = np.empty((4, 4), dtype=np.int32)
    if mode == _B_DC:
        out[:] = (int(A.sum()) + int(L.sum()) + 4) >> 3
    elif mode == _B_TM:
        out[:] = np.clip(L[:, None] + A[None, :] - TL, 0, 255)
    elif mode == _B_VE:
        row = np.empty(4, dtype=np.int32)
        e = np.concatenate(([TL], A, AR[:1]))
        for i in range(4):
            row[i] = _avg3(e[i], e[i + 1], e[i + 2])
        out[:] = row[None, :]
    elif mode == _B_HE:
        e = np.concatenate(([TL], L, L[3:]))
        col = np.empty(4, dtype=np.int32)
        for i in range(4):
            col[i] = _avg3(e[i], e[i + 1], e[i + 2] if i < 3
                           else int(L[3]))
        # last row uses avg3(L2, L3, L3)
        col[3] = _avg3(int(L[2]), int(L[3]), int(L[3]))
        out[:] = col[:, None]
    elif mode == _B_LD:
        e = np.concatenate((A, AR)).astype(np.int32)
        for r in range(4):
            for c in range(4):
                i = r + c
                out[r, c] = _avg3(e[i], e[i + 1],
                                  e[i + 2] if i + 2 < 8 else e[7])
        out[3, 3] = _avg3(int(e[6]), int(e[7]), int(e[7]))
    elif mode == _B_RD:
        e = np.concatenate((L[::-1], [TL], A)).astype(np.int32)  # L3..L0,TL,A0..A3
        for r in range(4):
            for c in range(4):
                i = 3 - r + c + 1
                out[r, c] = _avg3(e[i - 1], e[i], e[i + 1])
    elif mode == _B_VR:
        I, J, K = int(L[0]), int(L[1]), int(L[2])
        X = TL
        Aa, Bb, Cc, Dd = (int(v) for v in A)
        grid = [
            [_avg2(X, Aa), _avg2(Aa, Bb), _avg2(Bb, Cc), _avg2(Cc, Dd)],
            [_avg3(I, X, Aa), _avg3(X, Aa, Bb), _avg3(Aa, Bb, Cc),
             _avg3(Bb, Cc, Dd)],
            [_avg3(J, I, X), _avg2(X, Aa), _avg2(Aa, Bb), _avg2(Bb, Cc)],
            [_avg3(K, J, I), _avg3(I, X, Aa), _avg3(X, Aa, Bb),
             _avg3(Aa, Bb, Cc)],
        ]
        out[:] = np.array(grid, dtype=np.int32)
    elif mode == _B_VL:
        e = np.concatenate((A, AR)).astype(np.int32)
        for r in range(4):
            for c in range(4):
                i = c + (r >> 1)
                if (r & 1) == 0:
                    out[r, c] = _avg2(e[i], e[i + 1])
                else:
                    out[r, c] = _avg3(e[i], e[i + 1], e[i + 2])
        out[2, 3] = _avg3(int(e[4]), int(e[5]), int(e[6]))
        out[3, 3] = _avg3(int(e[5]), int(e[6]), int(e[7]))
    elif mode == _B_HD:
        p = [int(v) for v in np.concatenate((L[::-1], [TL], A))]
        # p = [L3,L2,L1,L0,TL,A0,A1,A2,A3]
        def P(i):
            return p[i]
        grid = [
            [_avg2(P(3), P(4)), _avg3(P(3), P(4), P(5)),
             _avg3(P(2 + 2), P(5), P(6)), _avg3(P(5), P(6), P(7))],
            [_avg2(P(2), P(3)), _avg3(P(2), P(3), P(4)),
             _avg2(P(3), P(4)), _avg3(P(3), P(4), P(5))],
            [_avg2(P(1), P(2)), _avg3(P(1), P(2), P(3)),
             _avg2(P(2), P(3)), _avg3(P(2), P(3), P(4))],
            [_avg2(P(0), P(1)), _avg3(P(0), P(1), P(2)),
             _avg2(P(1), P(2)), _avg3(P(1), P(2), P(3))],
        ]
        out[:] = np.array(grid, dtype=np.int32)
    elif mode == _B_HU:
        l0, l1, l2, l3 = (int(v) for v in L)
        grid = [
            [_avg2(l0, l1), _avg3(l0, l1, l2), _avg2(l1, l2),
             _avg3(l1, l2, l3)],
            [_avg2(l1, l2), _avg3(l1, l2, l3), _avg2(l2, l3),
             _avg3(l2, l3, l3)],
            [_avg2(l2, l3), _avg3(l2, l3, l3), l3, l3],
            [l3, l3, l3, l3],
        ]
        out[:] = np.array(grid, dtype=np.int32)
    else:
        raise ValueError(f"bad b-mode {mode}")
    return out


def decode_vp8(data: bytes):
    """Decode a VP8 keyframe chunk payload -> (Y, U, V) uint8 planes at
    (height, width) / half-res chroma, loop-filtered, cropped."""
    h = _parse_headers(data)
    mb_w = (h.width + 15) >> 4
    mb_h = (h.height + 15) >> 4
    quants = _quantizers(h)

    # planes with a 1-px prediction border (value conventions pinned by
    # the libwebp fixtures): above = 127, left = 129, top-left = 127
    Y = np.full((mb_h * 16 + 1, mb_w * 16 + 1 + 4), 129, dtype=np.uint8)
    U = np.full((mb_h * 8 + 1, mb_w * 8 + 1), 129, dtype=np.uint8)
    V = np.full((mb_h * 8 + 1, mb_w * 8 + 1), 129, dtype=np.uint8)
    Y[0, :] = 127
    U[0, :] = 127
    V[0, :] = 127

    bd1 = h.part1_bd
    probs = h.coef_probs

    # per-MB stored info for the loop filter
    mb_info = np.zeros((mb_h, mb_w, 3), dtype=np.int32)  # level, inner, skip

    # b-mode context rows/cols
    above_b = np.zeros((mb_w, 4), dtype=np.int32)
    # nz contexts: per plane per 4x4 column/row
    above_nz_y = np.zeros((mb_w, 4), dtype=np.int32)
    above_nz_u = np.zeros((mb_w, 2), dtype=np.int32)
    above_nz_v = np.zeros((mb_w, 2), dtype=np.int32)
    above_nz_y2 = np.zeros(mb_w, dtype=np.int32)

    for mby in range(mb_h):
        left_b = np.zeros(4, dtype=np.int32)
        left_nz_y = np.zeros(4, dtype=np.int32)
        left_nz_u = np.zeros(2, dtype=np.int32)
        left_nz_v = np.zeros(2, dtype=np.int32)
        left_nz_y2 = 0
        tbd = h.parts[mby % h.n_parts]
        for mbx in range(mb_w):
            # ---- modes (partition 1) ----
            seg = 0
            if h.segmentation and h.update_map:
                seg = bd1.tree(_SEGMENT_TREE, h.seg_tree_probs, 0)
            skip = bd1.get(h.skip_prob) if h.use_skip else 0
            ymode = bd1.tree(_KF_YMODE_TREE, _KF_YMODE_PROB)
            if ymode == 4:  # B_PRED (leaf -4 mapped to 4)
                ymode = _B_PRED
                bmodes = np.zeros((4, 4), dtype=np.int32)
                for by in range(4):
                    for bx in range(4):
                        a = above_b[mbx, bx] if by == 0 else bmodes[by - 1, bx]
                        l = left_b[by] if bx == 0 else bmodes[by, bx - 1]
                        bmodes[by, bx] = bd1.tree(
                            _BMODE_TREE, BMODE_PROBS[a, l])
            else:
                bmodes = np.full((4, 4), _MODE_TO_B[ymode], dtype=np.int32)
            uvmode = bd1.tree(_UV_MODE_TREE, _KF_UV_PROB)
            above_b[mbx] = bmodes[3]
            left_b[:] = bmodes[:, 3]

            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = quants[seg]

            # ---- residuals (token partition) ----
            ycoeffs = np.zeros((16, 16), dtype=np.int32)
            ucoeffs = np.zeros((4, 16), dtype=np.int32)
            vcoeffs = np.zeros((4, 16), dtype=np.int32)
            mb_nz = False
            if not skip:
                if ymode != _B_PRED:
                    ctx = int(above_nz_y2[mbx] + left_nz_y2)
                    y2, nz2 = _decode_block(tbd, probs[1], 0, ctx, y2dc, y2ac)
                    above_nz_y2[mbx] = left_nz_y2 = int(nz2)
                    dc16 = _iwht4x4(y2).ravel()
                    first, ptype = 1, 0
                else:
                    dc16 = None
                    first, ptype = 0, 3
                for b in range(16):
                    by, bx = b >> 2, b & 3
                    ctx = int(above_nz_y[mbx, bx] + left_nz_y[by])
                    co, nz = _decode_block(tbd, probs[ptype], first, ctx,
                                           y1dc, y1ac)
                    if dc16 is not None:
                        co[0] = dc16[b]
                    ycoeffs[b] = co
                    above_nz_y[mbx, bx] = left_nz_y[by] = int(nz)
                    mb_nz = mb_nz or nz or (dc16 is not None and co[0] != 0)
                for b in range(4):
                    by, bx = b >> 1, b & 1
                    ctx = int(above_nz_u[mbx, bx] + left_nz_u[by])
                    co, nz = _decode_block(tbd, probs[2], 0, ctx, uvdc, uvac)
                    ucoeffs[b] = co
                    above_nz_u[mbx, bx] = left_nz_u[by] = int(nz)
                    mb_nz = mb_nz or nz
                for b in range(4):
                    by, bx = b >> 1, b & 1
                    ctx = int(above_nz_v[mbx, bx] + left_nz_v[by])
                    co, nz = _decode_block(tbd, probs[2], 0, ctx, uvdc, uvac)
                    vcoeffs[b] = co
                    above_nz_v[mbx, bx] = left_nz_v[by] = int(nz)
                    mb_nz = mb_nz or nz
            else:
                above_nz_y[mbx] = 0
                left_nz_y[:] = 0
                above_nz_u[mbx] = 0
                left_nz_u[:] = 0
                above_nz_v[mbx] = 0
                left_nz_v[:] = 0
                if ymode != _B_PRED:
                    above_nz_y2[mbx] = left_nz_y2 = 0
                dc16 = None

            # ---- reconstruction ----
            yo, xo = mby * 16 + 1, mbx * 16 + 1
            has_above, has_left = mby > 0, mbx > 0
            if ymode != _B_PRED:
                _predict_16_or_8(Y, yo, xo, 16, ymode, has_above, has_left)
                if not skip:
                    for b in range(16):
                        by, bx = (b >> 2) * 4, (b & 3) * 4
                        res = _idct4x4(ycoeffs[b])
                        blk = Y[yo + by: yo + by + 4,
                                xo + bx: xo + bx + 4].astype(np.int32)
                        Y[yo + by: yo + by + 4, xo + bx: xo + bx + 4] = \
                            np.clip(blk + res, 0, 255)
            else:
                # the MB's top-right 4 pixels (used by every column-3
                # sub-block): above-right MB's bottom row, replicated
                # from the above MB's last pixel on the right border
                # (127 on the top row, like the rest of the top border)
                if mby == 0:
                    tr = np.full(4, 127, dtype=np.uint8)
                elif mbx == mb_w - 1:
                    tr = np.full(4, Y[yo - 1, xo + 15], dtype=np.uint8)
                else:
                    tr = Y[yo - 1, xo + 16: xo + 20]
                for b in range(16):
                    by, bx = (b >> 2) * 4, (b & 3) * 4
                    py, px = yo + by, xo + bx
                    # above-right pixels for this sub-block
                    ar = tr if bx == 12 else Y[py - 1, px + 4: px + 8]
                    pred = _predict_b(Y, py, px, int(bmodes[b >> 2, b & 3]),
                                      np.asarray(ar, dtype=np.int32))
                    if not skip:
                        pred = pred + _idct4x4(ycoeffs[b])
                    Y[py: py + 4, px: px + 4] = np.clip(pred, 0, 255)
            uo, uxo = mby * 8 + 1, mbx * 8 + 1
            for plane, coeffs in ((U, ucoeffs), (V, vcoeffs)):
                _predict_16_or_8(plane, uo, uxo, 8, uvmode,
                                 has_above, has_left)
                if not skip:
                    for b in range(4):
                        by, bx = (b >> 1) * 4, (b & 1) * 4
                        res = _idct4x4(coeffs[b])
                        blk = plane[uo + by: uo + by + 4,
                                    uxo + bx: uxo + bx + 4].astype(np.int32)
                        plane[uo + by: uo + by + 4, uxo + bx: uxo + bx + 4] \
                            = np.clip(blk + res, 0, 255)

            # ---- filter level for this MB ----
            lvl = h.filter_level
            if h.segmentation:
                lvl = h.seg_filter[seg] if h.seg_abs \
                    else lvl + h.seg_filter[seg]
            if h.lf_delta:
                lvl += h.ref_lf_delta[0]
                if ymode == _B_PRED:
                    lvl += h.mode_lf_delta[0]
            lvl = 0 if lvl < 0 else (63 if lvl > 63 else lvl)
            inner = int(mb_nz) or ymode == _B_PRED
            mb_info[mby, mbx] = (lvl, int(inner), skip)

    # strip the extra 4 columns used for above-right reads
    Y = Y[:, : mb_w * 16 + 1]

    if h.filter_level > 0:
        _loop_filter(Y, U, V, mb_info, h)

    y = Y[1:, 1:][: h.height, : h.width]
    u = U[1:, 1:][: (h.height + 1) >> 1, : (h.width + 1) >> 1]
    v = V[1:, 1:][: (h.height + 1) >> 1, : (h.width + 1) >> 1]
    return y.copy(), u.copy(), v.copy()


# ---------------------------------------------------------------------------
# loop filter (§15) — exact signed-char arithmetic via int32 + clamps
# ---------------------------------------------------------------------------

def _s8(v):
    return np.clip(v, -128, 127)


def _filter_common(p1, p0, q0, q1, use_outer):
    """§15.2 common adjustment; arrays are int32 with value-128 applied."""
    a = _s8(p1 - q1) if use_outer else 0
    a = _s8(a + 3 * (q0 - p0))
    f1 = _s8(a + 4) >> 3
    f2 = _s8(a + 3) >> 3
    q0n = _s8(q0 - f1)
    p0n = _s8(p0 + f2)
    return p0n, q0n, f1


def _simple_segment(arr, idx_p1, idx_p0, idx_q0, idx_q1, limit):
    p1 = arr[idx_p1].astype(np.int32) - 128
    p0 = arr[idx_p0].astype(np.int32) - 128
    q0 = arr[idx_q0].astype(np.int32) - 128
    q1 = arr[idx_q1].astype(np.int32) - 128
    mask = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= limit
    p0n, q0n, _ = _filter_common(p1, p0, q0, q1, True)
    arr[idx_p0] = np.where(mask, p0n + 128, arr[idx_p0])
    arr[idx_q0] = np.where(mask, q0n + 128, arr[idx_q0])


def _normal_edge(get, put, edge_limit, interior, hev_t, mb_edge):
    """get(k) -> int32 array of pixels at offset k from the edge
    (negative = p side); put(k, arr) stores back.  §15.3/15.4."""
    p3, p2, p1, p0 = (get(-4) - 128, get(-3) - 128, get(-2) - 128,
                      get(-1) - 128)
    q0, q1, q2, q3 = (get(0) - 128, get(1) - 128, get(2) - 128,
                      get(3) - 128)
    mask = ((np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= edge_limit)
    for a, b in ((p3, p2), (p2, p1), (p1, p0), (q1, q0), (q2, q1), (q3, q2)):
        mask &= (np.abs(a - b) <= interior)
    hev = (np.abs(p1 - p0) > hev_t) | (np.abs(q1 - q0) > hev_t)

    if not mb_edge:
        # subblock filter: hev pixels take the 2-tap common adjust;
        # non-hev also nudge p1/q1 by a>>1
        p0h, q0h, _ = _filter_common(p1, p0, q0, q1, True)
        p0n, q0n, f1 = _filter_common(p1, p0, q0, q1, False)
        a = (_s8(f1 + 1) >> 1)
        p1n = _s8(p1 + a)
        q1n = _s8(q1 - a)
        sel_p0 = np.where(hev, p0h, p0n)
        sel_q0 = np.where(hev, q0h, q0n)
        put(-1, np.where(mask, sel_p0 + 128, p0 + 128))
        put(0, np.where(mask, sel_q0 + 128, q0 + 128))
        put(-2, np.where(mask & ~hev, p1n + 128, p1 + 128))
        put(1, np.where(mask & ~hev, q1n + 128, q1 + 128))
    else:
        # mbfilter (§15.4): hev -> common adjust; else 3-tap wide
        p0h, q0h, _ = _filter_common(p1, p0, q0, q1, True)
        w = _s8(_s8(p1 - q1) + 3 * (q0 - p0))
        a = (27 * w + 63) >> 7
        q0w = _s8(q0 - a)
        p0w = _s8(p0 + a)
        a = (18 * w + 63) >> 7
        q1w = _s8(q1 - a)
        p1w = _s8(p1 + a)
        a = (9 * w + 63) >> 7
        q2w = _s8(q2 - a)
        p2w = _s8(p2 + a)
        put(-1, np.where(mask, np.where(hev, p0h, p0w) + 128, p0 + 128))
        put(0, np.where(mask, np.where(hev, q0h, q0w) + 128, q0 + 128))
        put(-2, np.where(mask & ~hev, p1w + 128, p1 + 128))
        put(1, np.where(mask & ~hev, q1w + 128, q1 + 128))
        put(-3, np.where(mask & ~hev, p2w + 128, p2 + 128))
        put(2, np.where(mask & ~hev, q2w + 128, q2 + 128))


def _mk_get_put_v(plane, y0, x, n):
    """vertical edge at column x, rows y0..y0+n (filter runs across x)."""
    def get(k):
        return plane[y0: y0 + n, x + k].astype(np.int32)

    def put(k, arr):
        plane[y0: y0 + n, x + k] = np.clip(arr, 0, 255).astype(np.uint8)
    return get, put


def _mk_get_put_h(plane, y, x0, n):
    def get(k):
        return plane[y + k, x0: x0 + n].astype(np.int32)

    def put(k, arr):
        plane[y + k, x0: x0 + n] = np.clip(arr, 0, 255).astype(np.uint8)
    return get, put


def _loop_filter(Y, U, V, mb_info, h):
    mb_h, mb_w = mb_info.shape[:2]
    for mby in range(mb_h):
        for mbx in range(mb_w):
            lvl, inner, skip = (int(v) for v in mb_info[mby, mbx])
            if lvl == 0:
                continue
            interior = lvl
            if h.sharpness:
                interior >>= 2 if h.sharpness > 4 else 1
                if interior > 9 - h.sharpness:
                    interior = 9 - h.sharpness
            if interior < 1:
                interior = 1
            mb_lim = ((lvl + 2) * 2) + interior
            sub_lim = (lvl * 2) + interior
            hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
            yo, xo = mby * 16 + 1, mbx * 16 + 1
            uo, uxo = mby * 8 + 1, mbx * 8 + 1
            if h.filter_simple:
                if mbx > 0:
                    g, p = _mk_get_put_v(Y, yo, xo, 16)
                    self = None
                    p1 = g(-2)
                    _simple_segment(Y, (slice(yo, yo + 16), xo - 2),
                                    (slice(yo, yo + 16), xo - 1),
                                    (slice(yo, yo + 16), xo),
                                    (slice(yo, yo + 16), xo + 1), mb_lim)
                if inner:
                    for bx in (4, 8, 12):
                        _simple_segment(Y, (slice(yo, yo + 16), xo + bx - 2),
                                        (slice(yo, yo + 16), xo + bx - 1),
                                        (slice(yo, yo + 16), xo + bx),
                                        (slice(yo, yo + 16), xo + bx + 1),
                                        sub_lim)
                if mby > 0:
                    _simple_segment(Y, (yo - 2, slice(xo, xo + 16)),
                                    (yo - 1, slice(xo, xo + 16)),
                                    (yo, slice(xo, xo + 16)),
                                    (yo + 1, slice(xo, xo + 16)), mb_lim)
                if inner:
                    for by in (4, 8, 12):
                        _simple_segment(Y, (yo + by - 2, slice(xo, xo + 16)),
                                        (yo + by - 1, slice(xo, xo + 16)),
                                        (yo + by, slice(xo, xo + 16)),
                                        (yo + by + 1, slice(xo, xo + 16)),
                                        sub_lim)
                continue
            # normal filter
            if mbx > 0:
                g, p = _mk_get_put_v(Y, yo, xo, 16)
                _normal_edge(g, p, mb_lim, interior, hev_t, True)
                for pl, po, pxo in ((U, uo, uxo), (V, uo, uxo)):
                    g, p = _mk_get_put_v(pl, po, pxo, 8)
                    _normal_edge(g, p, mb_lim, interior, hev_t, True)
            if inner:
                for bx in (4, 8, 12):
                    g, p = _mk_get_put_v(Y, yo, xo + bx, 16)
                    _normal_edge(g, p, sub_lim, interior, hev_t, False)
                for pl, po, pxo in ((U, uo, uxo), (V, uo, uxo)):
                    g, p = _mk_get_put_v(pl, po, pxo + 4, 8)
                    _normal_edge(g, p, sub_lim, interior, hev_t, False)
            if mby > 0:
                g, p = _mk_get_put_h(Y, yo, xo, 16)
                _normal_edge(g, p, mb_lim, interior, hev_t, True)
                for pl, po, pxo in ((U, uo, uxo), (V, uo, uxo)):
                    g, p = _mk_get_put_h(pl, po, pxo, 8)
                    _normal_edge(g, p, mb_lim, interior, hev_t, True)
            if inner:
                for by in (4, 8, 12):
                    g, p = _mk_get_put_h(Y, yo + by, xo, 16)
                    _normal_edge(g, p, sub_lim, interior, hev_t, False)
                for pl, po, pxo in ((U, uo, uxo), (V, uo, uxo)):
                    g, p = _mk_get_put_h(pl, po + 4, pxo, 8)
                    _normal_edge(g, p, sub_lim, interior, hev_t, False)


# ---------------------------------------------------------------------------
# YUV 4:2:0 -> RGBA: libwebp's "fancy" bilinear chroma upsampling and
# fixed-point color conversion, reproduced exactly (incl. the nested
# rounding of the diagonal averages) so decode_webp's lossy RGBA output
# is bit-identical to WebPDecodeRGBA (tests/test_vp8codec.py).
# ---------------------------------------------------------------------------

def _upsample_pair(rt, rc, width):
    """One chroma row pair -> two full-width rows (libwebp upsampling.c
    UPSAMPLE_FUNC): rt/rc are int32 (uw,) chroma rows; returns
    (top, bottom) int32 (width,) rows."""
    top = np.empty(width, dtype=np.int32)
    bot = np.empty(width, dtype=np.int32)
    top[0] = (3 * rt[0] + rc[0] + 2) >> 2
    bot[0] = (3 * rc[0] + rt[0] + 2) >> 2
    lpp = (width - 1) >> 1
    if lpp >= 1:
        tl, t = rt[:lpp], rt[1: lpp + 1]
        l, uv = rc[:lpp], rc[1: lpp + 1]
        avg = tl + t + l + uv + 8
        diag12 = (avg + 2 * (t + l)) >> 3
        diag03 = (avg + 2 * (tl + uv)) >> 3
        top[1: 2 * lpp: 2] = (diag12 + tl) >> 1
        top[2: 2 * lpp + 1: 2] = (diag03 + t) >> 1
        bot[1: 2 * lpp: 2] = (diag03 + l) >> 1
        bot[2: 2 * lpp + 1: 2] = (diag12 + uv) >> 1
    if not (width & 1):
        top[width - 1] = (3 * rt[-1] + rc[-1] + 2) >> 2
        bot[width - 1] = (3 * rc[-1] + rt[-1] + 2) >> 2
    return top, bot


def _upsample_plane(C, height, width):
    """Chroma plane (uh, uw) -> (height, width) int32, fancy upsampling."""
    C = C.astype(np.int32)
    out = np.empty((height, width), dtype=np.int32)
    top0, _ = _upsample_pair(C[0], C[0], width)
    out[0] = top0
    uh = C.shape[0]
    for r in range(uh - 1):
        t, b = _upsample_pair(C[r], C[r + 1], width)
        if 2 * r + 1 < height:
            out[2 * r + 1] = t
        if 2 * r + 2 < height:
            out[2 * r + 2] = b
    if not (height & 1):
        t, _ = _upsample_pair(C[uh - 1], C[uh - 1], width)
        out[height - 1] = t
    return out


def _yuv_to_rgba(Y, Uf, Vf):
    """libwebp yuv.h fixed-point conversion (YUV_FIX2 = 6)."""
    y = Y.astype(np.int32)
    u = Uf
    v = Vf
    yy = (y * 19077) >> 8
    r = yy + ((v * 26149) >> 8) - 14234
    g = yy - ((u * 6419) >> 8) - ((v * 13320) >> 8) + 8708
    b = yy + ((u * 33050) >> 8) - 17685
    out = np.empty(Y.shape + (4,), dtype=np.uint8)
    for i, ch in enumerate((r, g, b)):
        out[..., i] = np.minimum(np.maximum(ch, 0), 255 << 6) >> 6
    out[..., 3] = 255
    return out


def vp8_to_rgba(data: bytes) -> np.ndarray:
    """Decode a VP8 keyframe payload to (H, W, 4) uint8 RGBA exactly as
    libwebp's WebPDecodeRGBA does (fancy upsampling on)."""
    Y, U, V = decode_vp8(data)
    H, W = Y.shape
    Uf = _upsample_plane(U, H, W)
    Vf = _upsample_plane(V, H, W)
    return _yuv_to_rgba(Y, Uf, Vf)

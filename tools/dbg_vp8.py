"""Block-level VP8 debug: at q=100 filter_level==0, so libwebp's output IS
the raw reconstruction — compare per 4x4 block as we decode."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np

from tests import webp_oracle
from tools.dev_vp8 import vp8_payload, fixture
from tantivy_spark.functions import vp8codec as V

lib = webp_oracle.load()

W, H, SEED, KIND, Q = (int(sys.argv[1]) if len(sys.argv) > 1 else 16,
                       int(sys.argv[2]) if len(sys.argv) > 2 else 16,
                       int(sys.argv[3]) if len(sys.argv) > 3 else 1,
                       sys.argv[4] if len(sys.argv) > 4 else "gradient",
                       int(sys.argv[5]) if len(sys.argv) > 5 else 100)

rgba = fixture(W, H, SEED, KIND)
blob = webp_oracle.encode_lossy(lib, rgba, Q)
Yo, Uo, Vo = webp_oracle.decode_yuv(lib, blob)
data = vp8_payload(blob)

h = V._parse_headers(data)
assert h.filter_level == 0, f"filter_level={h.filter_level}, pick q with 0"
mb_w = (h.width + 15) >> 4
mb_h = (h.height + 15) >> 4
quants = V._quantizers(h)
print(f"mb {mb_w}x{mb_h} quants[0]={quants[0]}")

# pad ref planes to MB grid for comparison (edge MBs decode full 16x16)
def pad(ref, ph, pw):
    out = np.zeros((ph, pw), dtype=np.int32) - 1   # -1 = outside, skip
    out[:ref.shape[0], :ref.shape[1]] = ref
    return out

Yr = pad(Yo, mb_h * 16, mb_w * 16)
Ur = pad(Uo, mb_h * 8, mb_w * 8)
Vr = pad(Vo, mb_h * 8, mb_w * 8)

Y = np.full((mb_h * 16 + 1, mb_w * 16 + 1 + 4), 129, dtype=np.uint8)
U = np.full((mb_h * 8 + 1, mb_w * 8 + 1), 129, dtype=np.uint8)
Vp = np.full((mb_h * 8 + 1, mb_w * 8 + 1), 129, dtype=np.uint8)
Y[0, :] = 127
U[0, :] = 127
Vp[0, :] = 127

bd1 = h.part1_bd
probs = h.coef_probs
above_b = np.zeros((mb_w, 4), dtype=np.int32)
above_nz_y = np.zeros((mb_w, 4), dtype=np.int32)
above_nz_u = np.zeros((mb_w, 2), dtype=np.int32)
above_nz_v = np.zeros((mb_w, 2), dtype=np.int32)
above_nz_y2 = np.zeros(mb_w, dtype=np.int32)

MODES16 = {0: "DC", 1: "V", 2: "H", 3: "TM", 4: "B_PRED"}
BM = ["DC", "TM", "VE", "HE", "RD", "VR", "LD", "VL", "HD", "HU"]
nbad = 0

def check(tag, mine, ref, extra=""):
    global nbad
    m = mine.astype(np.int32)
    valid = ref >= 0
    d = np.where(valid, m - ref, 0)
    if (d != 0).any():
        nbad += 1
        print(f"BAD {tag} {extra}\n mine=\n{m}\n ref=\n{np.where(valid, ref, -1)}")
        if nbad >= int(sys.argv[6] if len(sys.argv) > 6 else 3):
            sys.exit(1)
        return False
    return True

for mby in range(mb_h):
    left_b = np.zeros(4, dtype=np.int32)
    left_nz_y = np.zeros(4, dtype=np.int32)
    left_nz_u = np.zeros(2, dtype=np.int32)
    left_nz_v = np.zeros(2, dtype=np.int32)
    left_nz_y2 = 0
    tbd = h.parts[mby % h.n_parts]
    for mbx in range(mb_w):
        seg = 0
        if h.segmentation and h.update_map:
            seg = bd1.tree(V._SEGMENT_TREE, h.seg_tree_probs, 0)
        skip = bd1.get(h.skip_prob) if h.use_skip else 0
        ymode = bd1.tree(V._KF_YMODE_TREE, V._KF_YMODE_PROB)
        if ymode == 4:
            ymode = V._B_PRED
            bmodes = np.zeros((4, 4), dtype=np.int32)
            for by in range(4):
                for bx in range(4):
                    a = above_b[mbx, bx] if by == 0 else bmodes[by - 1, bx]
                    l = left_b[by] if bx == 0 else bmodes[by, bx - 1]
                    bmodes[by, bx] = bd1.tree(V._BMODE_TREE, V.BMODE_PROBS[a, l])
        else:
            bmodes = np.full((4, 4), V._MODE_TO_B[ymode], dtype=np.int32)
        uvmode = bd1.tree(V._UV_MODE_TREE, V._KF_UV_PROB)
        above_b[mbx] = bmodes[3]
        left_b[:] = bmodes[:, 3]
        y1dc, y1ac, y2dc, y2ac, uvdc, uvac = quants[seg]
        print(f"MB({mby},{mbx}) ymode={MODES16[ymode]} uv={MODES16[uvmode]} skip={skip}"
              + (f" bmodes={[[BM[m] for m in row] for row in bmodes.tolist()]}"
                 if ymode == V._B_PRED else ""))

        ycoeffs = np.zeros((16, 16), dtype=np.int32)
        ucoeffs = np.zeros((4, 16), dtype=np.int32)
        vcoeffs = np.zeros((4, 16), dtype=np.int32)
        mb_nz = False
        if not skip:
            if ymode != V._B_PRED:
                ctx = int(above_nz_y2[mbx] + left_nz_y2)
                y2, nz2 = V._decode_block(tbd, probs[1], 0, ctx, y2dc, y2ac)
                above_nz_y2[mbx] = left_nz_y2 = int(nz2)
                dc16 = V._iwht4x4(y2).ravel()
                first, ptype = 1, 0
            else:
                dc16 = None
                first, ptype = 0, 3
            for b in range(16):
                by, bx = b >> 2, b & 3
                ctx = int(above_nz_y[mbx, bx] + left_nz_y[by])
                co, nz = V._decode_block(tbd, probs[ptype], first, ctx, y1dc, y1ac)
                if dc16 is not None:
                    co[0] = dc16[b]
                ycoeffs[b] = co
                above_nz_y[mbx, bx] = left_nz_y[by] = int(nz)
                mb_nz = mb_nz or nz
            for b in range(4):
                by, bx = b >> 1, b & 1
                ctx = int(above_nz_u[mbx, bx] + left_nz_u[by])
                co, nz = V._decode_block(tbd, probs[2], 0, ctx, uvdc, uvac)
                ucoeffs[b] = co
                above_nz_u[mbx, bx] = left_nz_u[by] = int(nz)
                mb_nz = mb_nz or nz
            for b in range(4):
                by, bx = b >> 1, b & 1
                ctx = int(above_nz_v[mbx, bx] + left_nz_v[by])
                co, nz = V._decode_block(tbd, probs[2], 0, ctx, uvdc, uvac)
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
            if ymode != V._B_PRED:
                above_nz_y2[mbx] = left_nz_y2 = 0
            dc16 = None

        yo, xo = mby * 16 + 1, mbx * 16 + 1
        has_above, has_left = mby > 0, mbx > 0
        if ymode != V._B_PRED:
            V._predict_16_or_8(Y, yo, xo, 16, ymode, has_above, has_left)
            if not skip:
                for b in range(16):
                    by, bx = (b >> 2) * 4, (b & 3) * 4
                    res = V._idct4x4(ycoeffs[b])
                    blk = Y[yo + by: yo + by + 4, xo + bx: xo + bx + 4].astype(np.int32)
                    Y[yo + by: yo + by + 4, xo + bx: xo + bx + 4] = np.clip(blk + res, 0, 255)
            for b in range(16):
                by, bx = (b >> 2) * 4, (b & 3) * 4
                if not check(f"Y16 MB({mby},{mbx}) blk({b>>2},{b&3})",
                             Y[yo + by: yo + by + 4, xo + bx: xo + bx + 4],
                             Yr[mby*16+by: mby*16+by+4, mbx*16+bx: mbx*16+bx+4],
                             f"mode={MODES16[ymode]} coeffs={ycoeffs[b].tolist()}"):
                    pass
        else:
            if mby == 0:
                tr = np.full(4, 127, dtype=np.uint8)
            elif mbx == mb_w - 1:
                tr = np.full(4, Y[yo - 1, xo + 15], dtype=np.uint8)
            else:
                tr = Y[yo - 1, xo + 16: xo + 20]
            for b in range(16):
                by, bx = (b >> 2) * 4, (b & 3) * 4
                py, px = yo + by, xo + bx
                ar = tr if bx == 12 else Y[py - 1, px + 4: px + 8]
                pred = V._predict_b(Y, py, px, int(bmodes[b >> 2, b & 3]),
                                    np.asarray(ar, dtype=np.int32))
                rec = pred if skip else pred + V._idct4x4(ycoeffs[b])
                Y[py: py + 4, px: px + 4] = np.clip(rec, 0, 255)
                check(f"Y4 MB({mby},{mbx}) blk({b>>2},{b&3})",
                      Y[py: py + 4, px: px + 4],
                      Yr[mby*16+by: mby*16+by+4, mbx*16+bx: mbx*16+bx+4],
                      f"bmode={BM[int(bmodes[b>>2,b&3])]} pred=\n{np.clip(pred,0,255)}\n coeffs={ycoeffs[b].tolist()} A={Y[py-1,px:px+4].tolist()} AR={np.asarray(ar).tolist()} L={Y[py:py+4,px-1].tolist()} TL={int(Y[py-1,px-1])}")
        uo, uxo = mby * 8 + 1, mbx * 8 + 1
        for plane, coeffs, ref, nm in ((U, ucoeffs, Ur, "U"), (Vp, vcoeffs, Vr, "V")):
            V._predict_16_or_8(plane, uo, uxo, 8, uvmode, has_above, has_left)
            if not skip:
                for b in range(4):
                    by, bx = (b >> 1) * 4, (b & 1) * 4
                    res = V._idct4x4(coeffs[b])
                    blk = plane[uo + by: uo + by + 4, uxo + bx: uxo + bx + 4].astype(np.int32)
                    plane[uo + by: uo + by + 4, uxo + bx: uxo + bx + 4] = np.clip(blk + res, 0, 255)
            for b in range(4):
                by, bx = (b >> 1) * 4, (b & 1) * 4
                check(f"{nm} MB({mby},{mbx}) blk({b>>1},{b&1})",
                      plane[uo + by: uo + by + 4, uxo + bx: uxo + bx + 4],
                      ref[mby*8+by: mby*8+by+4, mbx*8+bx: mbx*8+bx+4],
                      f"mode={MODES16[uvmode]} coeffs={coeffs[b].tolist()}")
print("DONE", "clean" if nbad == 0 else f"{nbad} bad blocks")

"""Extract the VP8 intra-frame decode tables from the system libwebp.

The VP8 bitstream's default probability/quantizer tables (RFC 6386
§13.4-14.1) are ~4 KB of constants that cannot be safely transcribed
from memory.  This tool locates them in libwebp's .rodata by content
anchors (the same extract-from-the-official-build method as
tools/extract_amongs.py for the Snowball stemmers) and writes
tantivy_spark/functions/vp8_tables.py.

Anchors (verified before slicing):
* CoeffsProba0   [4][8][3][11]: 33 x 128 (type-0 band-0) followed by
                 the known row 253,136,254,255,228,219.
* CoeffsUpdateProba same shape: the 1056 bytes immediately before
                 kBModesProba; sanity: >= 80% bytes are 255.
* kBModesProba   [10][10][9]: first row 231,120,48,89,115,113,120,152,112.
* kDcTable       uint8[128] monotone 4,5,6,7,8,9,10,10,... -> 157.
* kAcTable       uint16[128] monotone 4..284.
* kZigzag, kBands, kCat3..kCat6 by exact/adjacent bytes.

Tests re-derive all of these against the shared library
(tests/test_vp8codec.py) so a libwebp upgrade that changed them would
fail loudly.
"""

from __future__ import annotations

import subprocess
import sys

import numpy as np

LIB = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"


def rodata(path: str = LIB) -> bytes:
    out = subprocess.run(["objdump", "-h", path], capture_output=True,
                         text=True, check=True).stdout
    for line in out.splitlines():
        parts = line.split()
        if len(parts) >= 7 and parts[1] == ".rodata":
            size, file_off = int(parts[2], 16), int(parts[5], 16)
            data = open(path, "rb").read()
            return data[file_off: file_off + size]
    raise RuntimeError("no .rodata section found")


def extract(ro: bytes) -> dict:
    a = np.frombuffer(ro, dtype=np.uint8)

    bmodes_at = ro.find(bytes([231, 120, 48, 89, 115, 113, 120, 152, 112]))
    assert bmodes_at > 1056, "kBModesProba anchor not found"
    bmodes = a[bmodes_at: bmodes_at + 900].reshape(10, 10, 9)

    upd = a[bmodes_at - 1056: bmodes_at].reshape(4, 8, 3, 11)
    assert (upd == 255).mean() > 0.8, "CoeffsUpdateProba shape check failed"

    cp_at = ro.find(bytes([253, 136, 254, 255, 228, 219])) - 33
    assert cp_at > 0 and (a[cp_at: cp_at + 33] == 128).all(), \
        "CoeffsProba0 anchor not found"
    coef = a[cp_at: cp_at + 1056].reshape(4, 8, 3, 11)

    dc_at = ro.find(bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14]))
    assert dc_at >= 0
    dc = a[dc_at: dc_at + 128].astype(int)
    assert dc[-1] == 157 and (np.diff(dc) >= 0).all()

    u16 = np.frombuffer(ro[: len(ro) // 2 * 2], dtype="<u2")
    ac = None
    for st in range(len(u16) - 128):
        seg = u16[st: st + 128].astype(int)
        if (seg[0] == 4 and seg[1] == 5 and (np.diff(seg) >= 0).all()
                and seg[-1] == 284):
            ac = seg
            break
    assert ac is not None, "kAcTable not found"

    zz_at = ro.find(bytes([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]))
    assert zz_at >= 0
    zigzag = a[zz_at: zz_at + 16].astype(int)
    # category extra-bit probability tables follow the zigzag in rodata
    cat6 = a[zz_at + 16: zz_at + 27].astype(int)
    assert cat6[0] == 254 and cat6[-1] == 129
    cat5 = a[zz_at + 28: zz_at + 33].astype(int)
    cat4 = a[zz_at + 34: zz_at + 38].astype(int)
    cat3 = a[zz_at + 39: zz_at + 42].astype(int)
    assert list(cat3) == [173, 148, 140] and list(cat5)[0] == 180

    bands_at = ro.find(bytes([0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]))
    assert bands_at >= 0
    bands = a[bands_at: bands_at + 17].astype(int)

    return {
        "COEF_PROBS": coef, "COEF_UPDATE_PROBS": upd, "BMODE_PROBS": bmodes,
        "DC_TABLE": dc, "AC_TABLE": ac, "ZIGZAG": zigzag, "BANDS": bands,
        "CAT3": cat3, "CAT4": cat4, "CAT5": cat5, "CAT6": cat6,
    }


def emit(tables: dict, out_path: str) -> None:
    with open(out_path, "w") as f:
        f.write('"""VP8 intra-frame decode tables (RFC 6386 defaults).\n\n'
                "Extracted from the official libwebp shared library by\n"
                "tools/extract_vp8_tables.py (content-anchored .rodata\n"
                "slices), NOT transcribed; tests/test_vp8codec.py\n"
                "re-derives them against the library when present.\n"
                '"""\n\nimport numpy as np\n\n')
        for name, arr in tables.items():
            flat = np.asarray(arr).ravel().tolist()
            shape = tuple(np.asarray(arr).shape)
            f.write(f"{name} = np.array({flat}, dtype=np.int64)"
                    f".reshape{shape if len(shape) > 1 else f'({shape[0]},)'}\n\n")


if __name__ == "__main__":
    t = extract(rodata())
    out = sys.argv[1] if len(sys.argv) > 1 else \
        "tantivy_spark/functions/vp8_tables.py"
    emit(t, out)
    for k, v in t.items():
        print(k, np.asarray(v).shape)

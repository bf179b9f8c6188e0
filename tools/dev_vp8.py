"""Dev harness: compare decode_vp8 YUV planes vs libwebp's WebPDecodeYUV."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np

from tests import webp_oracle
from tantivy_spark.functions.vp8codec import decode_vp8

lib = webp_oracle.load()
assert lib is not None


def vp8_payload(blob: bytes) -> bytes:
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP"
    pos = 12
    while pos + 8 <= len(blob):
        fourcc = blob[pos:pos + 4]
        size = int.from_bytes(blob[pos + 4:pos + 8], "little")
        if fourcc == b"VP8 ":
            return blob[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8 chunk")


def fixture(w, h, seed, kind="gradient"):
    rng = np.random.RandomState(seed)
    if kind == "gradient":
        yy, xx = np.mgrid[0:h, 0:w]
        r = ((xx * 255) // max(w - 1, 1)).astype(np.uint8)
        g = ((yy * 255) // max(h - 1, 1)).astype(np.uint8)
        b = ((xx + yy) % 256).astype(np.uint8)
    elif kind == "noise":
        r, g, b = rng.randint(0, 256, (3, h, w)).astype(np.uint8)
    elif kind == "flat":
        r = np.full((h, w), 100, np.uint8)
        g = np.full((h, w), 180, np.uint8)
        b = np.full((h, w), 40, np.uint8)
    elif kind == "blocks":
        r = ((np.mgrid[0:h, 0:w][0] // 8 % 2) * 200).astype(np.uint8)
        g = ((np.mgrid[0:h, 0:w][1] // 8 % 2) * 200).astype(np.uint8)
        b = rng.randint(0, 256, (h, w)).astype(np.uint8)
    a = np.full((h, w), 255, np.uint8)
    return np.stack([r, g, b, a], axis=-1)


def compare(w, h, seed, kind, q):
    rgba = fixture(w, h, seed, kind)
    blob = webp_oracle.encode_lossy(lib, rgba, q)
    Yo, Uo, Vo = webp_oracle.decode_yuv(lib, blob)
    Y, U, V = decode_vp8(vp8_payload(blob))
    ok = True
    for name, mine, ref in (("Y", Y, Yo), ("U", U, Uo), ("V", V, Vo)):
        if mine.shape != ref.shape:
            print(f"  {name}: SHAPE {mine.shape} vs {ref.shape}")
            ok = False
            continue
        diff = (mine.astype(int) - ref.astype(int))
        nbad = int((diff != 0).sum())
        if nbad:
            ys, xs = np.nonzero(diff)
            print(f"  {name}: {nbad}/{diff.size} differ, max {np.abs(diff).max()}, "
                  f"first at ({ys[0]},{xs[0]}) mine={mine[ys[0],xs[0]]} ref={ref[ys[0],xs[0]]}")
            ok = False
    print(f"{kind} {w}x{h} q={q}: {'OK' if ok else 'FAIL'}")
    return ok


if __name__ == "__main__":
    cases = [
        (16, 16, 0, "flat", 75),
        (16, 16, 1, "gradient", 75),
        (32, 32, 2, "gradient", 75),
        (48, 32, 3, "noise", 50),
        (64, 48, 4, "blocks", 75),
        (37, 23, 5, "gradient", 75),
        (128, 96, 6, "noise", 90),
        (100, 100, 7, "blocks", 30),
    ]
    allok = all(compare(*c) for c in cases)
    print("ALL OK" if allok else "FAILURES")

"""Vectorized XXH64 matching Spark's `F.xxhash64` (seed 42).

The Catalyst hash-mode build assigns documents to segments with
`pmod(xxhash64(segment_col), n_segments)` (`operators/build.py`
`_docmap_base`).  The direct-IO hash build re-buckets rows with
pyarrow + numpy instead of a JVM exchange, and it must land every
document in the SAME segment the Catalyst path would pick — so this
module implements the public XXH64 algorithm (Yann Collet's xxHash,
the spec in the xxhash repository; also RFC-published constants) with
Spark's input conventions:

  * string columns: XXH64 over the UTF-8 bytes
  * integral columns: Spark hashes int/long as the 8-byte
    little-endian value (`XxHash64.hashLong`)

Vectorization: rows are grouped by exact byte length; within a length
class every lane runs the identical fixed control flow (stripe count,
tail split), so the whole class computes as numpy u64 SIMD-ish
arithmetic.  Parity with `F.xxhash64` is pinned in
tests/test_hash_direct.py over fuzzed lengths 0..100 including
multi-byte UTF-8 and the >=32-byte stripe path.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(11400714785074694791)
_P2 = np.uint64(14029467366897019727)
_P3 = np.uint64(1609587929392839161)
_P4 = np.uint64(9650029242287828579)
_P5 = np.uint64(2870177450012600261)

_SPARK_SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _round(acc: np.ndarray, lane: np.ndarray) -> np.ndarray:
    acc = acc + lane * _P2
    return _rotl(acc, 31) * _P1


def _merge_round(h: np.ndarray, acc: np.ndarray) -> np.ndarray:
    h = h ^ _round(np.zeros_like(acc), acc)
    return h * _P1 + _P4


def xxh64_fixed(mat: np.ndarray, seed: int | np.uint64 = _SPARK_SEED
                ) -> np.ndarray:
    """XXH64 of every row of a fixed-width byte matrix.

    ``mat``: (n, L) uint8 — each row is one L-byte message.  Returns
    (n,) uint64.  All lanes share L, so stripes/tail are fixed control
    flow and the math vectorizes across rows."""
    old = np.seterr(over="ignore")  # u64 wraparound IS the algorithm
    try:
        n, L = mat.shape
        seed = np.uint64(seed)
        mat = np.ascontiguousarray(mat)

        def u64(i):  # little-endian u64 lane at byte offset i
            return mat[:, i:i + 8].copy().view("<u8").reshape(n).astype(
                np.uint64)

        def u32(i):
            return mat[:, i:i + 4].copy().view("<u4").reshape(n).astype(
                np.uint64)

        pos = 0
        if L >= 32:
            v1 = np.full(n, seed + _P1 + _P2, dtype=np.uint64)
            v2 = np.full(n, seed + _P2, dtype=np.uint64)
            v3 = np.full(n, seed, dtype=np.uint64)
            v4 = np.full(n, seed - _P1, dtype=np.uint64)
            while pos + 32 <= L:
                v1 = _round(v1, u64(pos))
                v2 = _round(v2, u64(pos + 8))
                v3 = _round(v3, u64(pos + 16))
                v4 = _round(v4, u64(pos + 24))
                pos += 32
            h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
                 + _rotl(v4, 18))
            for v in (v1, v2, v3, v4):
                h = _merge_round(h, v)
        else:
            h = np.full(n, seed + _P5, dtype=np.uint64)
        h = h + np.uint64(L)
        while pos + 8 <= L:
            h = h ^ _round(np.zeros(n, dtype=np.uint64), u64(pos))
            h = _rotl(h, 27) * _P1 + _P4
            pos += 8
        if pos + 4 <= L:
            h = h ^ (u32(pos) * _P1)
            h = _rotl(h, 23) * _P2 + _P3
            pos += 4
        while pos < L:
            h = h ^ (mat[:, pos].astype(np.uint64) * _P5)
            h = _rotl(h, 11) * _P1
            pos += 1
        h = h ^ (h >> np.uint64(33))
        h = h * _P2
        h = h ^ (h >> np.uint64(29))
        h = h * _P3
        h = h ^ (h >> np.uint64(32))
        return h
    finally:
        np.seterr(**old)


def xxh64_bytes(values: np.ndarray, offsets: np.ndarray,
                seed: int | np.uint64 = _SPARK_SEED) -> np.ndarray:
    """XXH64 of n variable-length byte strings given as a flat uint8
    buffer + (n+1,) offsets (the Arrow string layout).  Groups rows by
    exact length and runs `xxh64_fixed` per class."""
    offsets = np.asarray(offsets, dtype=np.int64)
    lens = np.diff(offsets)
    n = len(lens)
    out = np.empty(n, dtype=np.uint64)
    for L in np.unique(lens):
        idx = np.nonzero(lens == L)[0]
        L = int(L)
        if L == 0:
            out[idx] = xxh64_fixed(
                np.empty((len(idx), 0), dtype=np.uint8), seed)
            continue
        # gather each class into a dense (m, L) matrix
        starts = offsets[idx]
        gather = starts[:, None] + np.arange(L, dtype=np.int64)[None, :]
        out[idx] = xxh64_fixed(values[gather], seed)
    return out


def spark_xxhash64_array(arr) -> np.ndarray:
    """`F.xxhash64(col)` (seed 42) over a pyarrow string or integral
    array; returns int64 (Spark's signed result)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    if pa.types.is_string(arr.type):
        arr = arr.combine_chunks() if hasattr(arr, "combine_chunks") else arr
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if arr.null_count:
            raise ValueError("null segment keys are not supported on "
                             "the direct hash build")
        buf_off = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                                count=len(arr) + 1 + arr.offset)
        offsets = buf_off[arr.offset:arr.offset + len(arr) + 1].astype(
            np.int64)
        values = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        h = xxh64_bytes(values, offsets)
        return h.view(np.int64)
    if pa.types.is_integer(arr.type):
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if arr.null_count:
            raise ValueError("null segment keys are not supported on "
                             "the direct hash build")
        # Spark's XxHash64 hashes LongType as 8 LE bytes (hashLong) but
        # int/short/byte as the 4-byte int value (hashInt) — match the
        # width split exactly
        if arr.type.bit_width > 32:
            v = arr.to_numpy(zero_copy_only=False).astype("<i8")
            mat = v.view(np.uint8).reshape(len(v), 8)
        else:
            v = arr.to_numpy(zero_copy_only=False).astype("<i4")
            mat = v.view(np.uint8).reshape(len(v), 4)
        return xxh64_fixed(mat).view(np.int64)
    raise ValueError(
        f"direct hash build supports string/integral segment keys, "
        f"got {arr.type}")


def spark_pmod_segments(arr, n_segments: int) -> np.ndarray:
    """`pmod(xxhash64(col), n_segments)` — the Catalyst hash-mode
    segment assignment, bit-for-bit."""
    h = spark_xxhash64_array(arr)
    m = h % np.int64(n_segments)   # numpy % on int64 is already
    m = np.where(m < 0, m + n_segments, m)  # floored... keep explicit
    return m.astype(np.int32)

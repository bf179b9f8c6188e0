"""Posting-list block codec — numpy-vectorized, semantics per tantivy.

Reference format (not byte-copied; we keep the *shape*, stored as parquet
binary + typed metadata columns instead of a custom file):

* 128-doc blocks; doc ids strictly-increasing, delta encoded and bitpacked
  at the block's minimal bit width (/root/reference/src/postings/
  compression/mod.rs:3-77, serializer.rs:314-497).
* term freqs stored minus-one, bitpacked per block.
* the final partial block (< 128 docs) is VInt/LEB128 encoded
  (serializer.rs:454-488).
* per-block skip metadata: last doc id + block-max scoring pair
  (src/postings/skip.rs:55-120).  tantivy stores the (fieldnorm_id, tf)
  pair maximizing tf_factor under a segment-local weight
  (serializer.rs:389-440); we store ``(min fieldnorm_id, max tf)`` of the
  block, which is a genuine upper bound under ANY BM25 weight (the factor
  is increasing in tf and decreasing in norm) and keeps the build
  single-pass — upper-bound semantics, and therefore WAND exactness, are
  preserved (see SURVEY.md §4 WAND safety note).

The per-posting fieldnorm byte is stored alongside (tantivy keeps it in the
segment's ``.fieldnorm`` file, src/fieldnorm/writer.rs:58-95; we denormalize
it into the posting row so the query kernel is self-contained).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # COMPRESSION_BLOCK_SIZE, src/postings/compression/mod.rs


# --------------------------------------------------------------------------
# bit packing (width 0..=32), big-endian within each value
# --------------------------------------------------------------------------

def bitpack(vals: np.ndarray, width: int) -> bytes:
    """Pack uint values at `width` bits each. width==0 -> empty buffer."""
    if width == 0:
        return b""
    bits = np.unpackbits(
        vals.astype(">u4").view(np.uint8).reshape(-1, 4), axis=1
    )[:, 32 - width:]
    return np.packbits(bits.ravel()).tobytes()


def bitunpack(buf: bytes | memoryview, n: int, width: int) -> np.ndarray:
    """Inverse of bitpack -> uint32[n]."""
    if width == 0:
        return np.zeros(n, dtype=np.uint32)
    total_bits = n * width
    nbytes = (total_bits + 7) // 8
    raw = np.frombuffer(buf, dtype=np.uint8, count=nbytes)
    bits = np.unpackbits(raw)[:total_bits].reshape(n, width)
    full = np.zeros((n, 32), dtype=np.uint8)
    full[:, 32 - width:] = bits
    return np.packbits(full, axis=1).view(">u4").ravel().astype(np.uint32)


def _needed_width(vals: np.ndarray) -> int:
    if len(vals) == 0:
        return 0
    m = int(vals.max())
    return m.bit_length()


# --------------------------------------------------------------------------
# LEB128 varint (tail blocks)
# --------------------------------------------------------------------------

def _vint_bytes(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128 for an array of values at once -> (uint8 byte stream,
    per-value byte counts).  Values must be < 2^53 (true of all doc
    deltas / tfs / positions here) so the float64 exponent gives the
    exact bit length."""
    v = np.asarray(v, dtype=np.int64).astype(np.uint64)
    bl = np.frexp(np.maximum(v, 1).astype(np.float64))[1]  # == bit_length
    nb = (bl + 6) // 7
    offs = np.cumsum(nb) - nb
    total = int(offs[-1] + nb[-1]) if len(v) else 0
    val_idx = np.repeat(np.arange(len(v)), nb)
    j = (np.arange(total) - np.repeat(offs, nb)).astype(np.uint64)
    b = ((v[val_idx] >> (np.uint64(7) * j)) & np.uint64(0x7F)).astype(np.uint8)
    b[j < (nb[val_idx] - 1).astype(np.uint64)] |= 0x80
    return b, nb


def vint_encode(vals: np.ndarray) -> bytes:
    vals = np.asarray(vals)
    if len(vals) == 0:
        return b""
    return _vint_bytes(vals)[0].tobytes()


def vint_decode(buf: bytes | memoryview, n: int) -> tuple[np.ndarray, int]:
    """Decode `n` LEB128 values — vectorized: find the first n terminal
    bytes (high bit clear), then one shift-and-reduceat pass."""
    if n == 0:
        return np.empty(0, dtype=np.uint64), 0
    raw = np.frombuffer(buf, dtype=np.uint8, count=min(len(buf), n * 10))
    term = np.flatnonzero((raw & 0x80) == 0)[:n]
    pos = int(term[n - 1]) + 1
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = term[:-1] + 1
    shifts = (np.arange(pos) - np.repeat(starts, term - starts + 1)).astype(np.uint64)
    contrib = (raw[:pos] & np.uint64(0x7F)).astype(np.uint64) << (np.uint64(7) * shifts)
    return np.add.reduceat(contrib, starts), pos


# --------------------------------------------------------------------------
# posting-list encode / decode
# --------------------------------------------------------------------------

def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, fieldnorm_ids: np.ndarray
) -> dict:
    """Encode one term's posting list (sorted, strictly increasing doc ids).

    Returns a dict of parquet-ready columns:
      doc_enc/tf_enc: binary block streams  (full blocks: [1B width][packed];
                      tail block: LEB128 varints)
      fnorm_enc:      one uint8 per posting (parquet-compressed)
      block_last:     int64[]  last doc id per block (the skip index)
      block_doc_off / block_tf_off: int32[] byte offset of each block
      bm_norm_id / bm_tf: per-block block-max pair (upper-bound semantics)
    """
    n = len(doc_ids)
    assert n > 0
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    fieldnorm_ids = np.asarray(fieldnorm_ids, dtype=np.uint8)

    deltas_m1 = np.diff(doc_ids, prepend=-1) - 1  # strict-increasing => >= 0
    tfs_m1 = tfs - 1

    n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    doc_parts: list[bytes] = []
    tf_parts: list[bytes] = []
    block_last = np.empty(n_blocks, dtype=np.int64)
    block_doc_off = np.empty(n_blocks, dtype=np.int32)
    block_tf_off = np.empty(n_blocks, dtype=np.int32)
    bm_norm_id = np.empty(n_blocks, dtype=np.int32)
    bm_tf = np.empty(n_blocks, dtype=np.int32)

    doc_off = 0
    tf_off = 0
    for bi in range(n_blocks):
        lo = bi * BLOCK_SIZE
        hi = min(lo + BLOCK_SIZE, n)
        d = deltas_m1[lo:hi]
        t = tfs_m1[lo:hi]
        block_last[bi] = doc_ids[hi - 1]
        block_doc_off[bi] = doc_off
        block_tf_off[bi] = tf_off
        bm_norm_id[bi] = int(fieldnorm_ids[lo:hi].min())
        bm_tf[bi] = int(tfs[lo:hi].max())
        if hi - lo == BLOCK_SIZE:
            dw = _needed_width(d)
            tw = _needed_width(t)
            db = bytes([dw]) + bitpack(d.astype(np.uint32), dw)
            tb = bytes([tw]) + bitpack(t.astype(np.uint32), tw)
        else:  # vint tail (serializer.rs:454-488)
            db = vint_encode(d)
            tb = vint_encode(t)
        doc_parts.append(db)
        tf_parts.append(tb)
        doc_off += len(db)
        tf_off += len(tb)

    return {
        "doc_freq": n,
        "doc_enc": b"".join(doc_parts),
        "tf_enc": b"".join(tf_parts),
        "fnorm_enc": fieldnorm_ids.tobytes(),
        "block_last": block_last,
        "block_doc_off": block_doc_off,
        "block_tf_off": block_tf_off,
        "bm_norm_id": bm_norm_id,
        "bm_tf": bm_tf,
    }


def encode_postings_flat(
    doc_ids: np.ndarray, tfs: np.ndarray, fieldnorm_ids: np.ndarray,
    term_starts: np.ndarray,
) -> dict:
    """Encode MANY terms' posting lists in ONE vectorized pass.

    Same byte format as `encode_postings` (parity-pinned in
    tests/test_blocks.py) — 128-doc blocks, delta-m1 bitpack with 1-byte
    width header for full blocks, LEB128 vint tail, per-block skip/
    block-max metadata — but with no per-term Python: per-block reductions
    are reduceat over the flat run arrays, bitpacking batches all blocks
    of equal width together, and the streams land in two global buffers
    with per-term offsets.  This is the index build's hot kernel — the
    per-term `encode_postings` loop was ~80% of stage-2 wall time.

    Inputs are the term-sorted flat run arrays (`_encode_runs` contract):
    `term_starts` is int64[n_terms+1] tiling [0, n_runs); doc ids are
    strictly increasing within each term.

    Returns flat columns + offsets (all numpy):
      doc_buf/tf_buf uint8       global concatenated streams
      doc_term_off/tf_term_off   int64[n_terms+1] per-term byte ranges
      block_offsets              int64[n_terms+1] per-term block ranges
      block_last int64[]         flat per-block skip index
      block_doc_off/block_tf_off int32[] (per-term-relative byte offsets)
      bm_norm_id/bm_tf int32[]   flat per-block block-max pairs
      doc_freq/sum_tf/max_tf     int64[n_terms]
    """
    n_runs = len(doc_ids)
    term_starts = np.asarray(term_starts, dtype=np.int64)
    n_terms = len(term_starts) - 1
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    fieldnorm_ids = np.asarray(fieldnorm_ids, dtype=np.uint8)
    lens = np.diff(term_starts)
    first = term_starts[:-1]

    # deltas-minus-one with a reset at each term start
    d = np.empty(n_runs, dtype=np.int64)
    d[1:] = doc_ids[1:] - doc_ids[:-1] - 1
    d[first] = doc_ids[first]
    t_m1 = tfs - 1

    # block layout: block b of term t covers runs [start + 128b, ...)
    nb = (lens + BLOCK_SIZE - 1) // BLOCK_SIZE
    tot_blocks = int(nb.sum())
    blk_term = np.repeat(np.arange(n_terms), nb)
    k = np.arange(tot_blocks) - np.repeat(np.cumsum(nb) - nb, nb)
    blk_start = first[blk_term] + BLOCK_SIZE * k
    blk_len = np.minimum(BLOCK_SIZE, term_starts[1:][blk_term] - blk_start)
    blk_end = blk_start + blk_len

    # blocks tile the run arrays contiguously -> reduceat per block
    block_last = doc_ids[blk_end - 1]
    bm_norm_id = np.minimum.reduceat(fieldnorm_ids, blk_start).astype(np.int32)
    bm_tf = np.maximum.reduceat(tfs, blk_start).astype(np.int32)
    d_max = np.maximum.reduceat(d, blk_start)
    t_max = np.maximum.reduceat(t_m1, blk_start)

    full = blk_len == BLOCK_SIZE
    # width = bit_length(block max); frexp exponent == bit_length (< 2^53)
    dw = np.frexp(np.maximum(d_max, 1).astype(np.float64))[1] * (d_max > 0)
    tw = np.frexp(np.maximum(t_max, 1).astype(np.float64))[1] * (t_max > 0)

    doc_nbytes = np.where(full, 1 + dw * (BLOCK_SIZE // 8), 0).astype(np.int64)
    tf_nbytes = np.where(full, 1 + tw * (BLOCK_SIZE // 8), 0).astype(np.int64)

    # vint tail blocks: gather all tail values, one _vint_bytes call each
    tail_blocks = np.flatnonzero(~full)
    if len(tail_blocks):
        tl = blk_len[tail_blocks]
        tstarts = blk_start[tail_blocks]
        g = np.repeat(tstarts, tl) + (
            np.arange(int(tl.sum())) - np.repeat(np.cumsum(tl) - tl, tl)
        )
        vstarts = np.cumsum(tl) - tl
        db_tail, dnb = _vint_bytes(d[g])
        tb_tail, tnb = _vint_bytes(t_m1[g])
        doc_nbytes[tail_blocks] = np.add.reduceat(dnb, vstarts)
        tf_nbytes[tail_blocks] = np.add.reduceat(tnb, vstarts)

    blk_first = np.cumsum(nb) - nb  # first block index per term
    doc_goff = np.cumsum(doc_nbytes) - doc_nbytes  # global byte off per block
    tf_goff = np.cumsum(tf_nbytes) - tf_nbytes
    doc_term_bytes = np.add.reduceat(doc_nbytes, blk_first)
    tf_term_bytes = np.add.reduceat(tf_nbytes, blk_first)
    doc_term_off = np.concatenate(([0], np.cumsum(doc_term_bytes)))
    tf_term_off = np.concatenate(([0], np.cumsum(tf_term_bytes)))
    block_doc_off = (doc_goff - np.repeat(doc_term_off[:-1], nb)).astype(np.int32)
    block_tf_off = (tf_goff - np.repeat(tf_term_off[:-1], nb)).astype(np.int32)

    doc_buf = np.zeros(int(doc_nbytes.sum()), dtype=np.uint8)
    tf_buf = np.zeros(int(tf_nbytes.sum()), dtype=np.uint8)

    def _write_full(buf, goff, widths, vals):
        buf[goff[full]] = widths[full]  # 1-byte width headers
        for w in np.unique(widths[full]):
            if w == 0:
                continue
            sel = full & (widths == w)
            bs = blk_start[sel]
            v = vals[(bs[:, None] + np.arange(BLOCK_SIZE)).ravel()]
            bits = np.unpackbits(
                v.astype(">u4").view(np.uint8).reshape(-1, 4), axis=1
            )[:, 32 - w:]
            payload = np.packbits(
                bits.reshape(len(bs), BLOCK_SIZE * w), axis=1)
            tgt = (goff[sel][:, None] + 1
                   + np.arange(BLOCK_SIZE * w // 8)).ravel()
            buf[tgt] = payload.ravel()

    _write_full(doc_buf, doc_goff, dw, d)
    _write_full(tf_buf, tf_goff, tw, t_m1)

    if len(tail_blocks):
        def _write_tail(buf, goff, stream, per_blk_bytes):
            tgt = np.repeat(goff[tail_blocks], per_blk_bytes) + (
                np.arange(len(stream))
                - np.repeat(np.cumsum(per_blk_bytes) - per_blk_bytes,
                            per_blk_bytes)
            )
            buf[tgt] = stream

        _write_tail(doc_buf, doc_goff, db_tail, doc_nbytes[tail_blocks])
        _write_tail(tf_buf, tf_goff, tb_tail, tf_nbytes[tail_blocks])

    return {
        "doc_freq": lens,
        "sum_tf": np.add.reduceat(tfs, first),
        "max_tf": np.maximum.reduceat(tfs, first),
        "doc_buf": doc_buf,
        "tf_buf": tf_buf,
        "doc_term_off": doc_term_off,
        "tf_term_off": tf_term_off,
        "block_offsets": np.concatenate(([0], np.cumsum(nb))),
        "block_last": block_last,
        "block_doc_off": block_doc_off,
        "block_tf_off": block_tf_off,
        "bm_norm_id": bm_norm_id,
        "bm_tf": bm_tf,
    }


def encode_positions_flat(
    flat_positions: np.ndarray, tfs: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Positions stream for MANY postings at once (the reference's
    positions file shape, /root/reference/src/positions/mod.rs:8-26 —
    per-posting delta LEB128; we use the vint form uniformly).

    `flat_positions` holds each posting's positions consecutively;
    `tfs[i]` is posting i's count.  One segmented sort, one delta pass,
    one vectorized vint encode — no per-posting Python.  Returns
    (byte stream, int64 per-posting byte offsets)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    n_post = len(tfs)
    if n_post == 0:
        return b"", np.empty(0, dtype=np.int64)
    if (tfs <= 0).any():
        # empty postings (not produced by the build, but keep the codec
        # total): encode the nonempty ones, point empties at the next start
        nz = tfs > 0
        enc, offs_nz = encode_positions_flat(
            flat_positions, tfs[nz]
        ) if nz.any() else (b"", np.empty(0, dtype=np.int64))
        offs_with_end = np.append(offs_nz, len(enc))
        return enc, offs_with_end[np.cumsum(nz) - nz]
    starts = np.cumsum(tfs) - tfs
    p = np.asarray(flat_positions, dtype=np.int64)
    pidx = np.repeat(np.arange(n_post), tfs)
    order = np.lexsort((p, pidx))
    ps = p[order]
    d = np.empty_like(ps)
    d[0] = ps[0]
    d[1:] = ps[1:] - ps[:-1]
    first = starts  # tf >= 1 for every posting, so starts strictly increase
    d[first] = ps[first]
    b, nb = _vint_bytes(d)
    post_bytes = np.add.reduceat(nb, first)
    offs = np.cumsum(post_bytes) - post_bytes
    return b.tobytes(), offs


def encode_positions(positions_per_posting: list) -> tuple[bytes, np.ndarray]:
    """Single-term convenience wrapper over `encode_positions_flat`."""
    tfs = np.fromiter(
        (len(p) for p in positions_per_posting), dtype=np.int64,
        count=len(positions_per_posting),
    )
    if len(tfs) == 0:
        return b"", np.empty(0, dtype=np.int32)
    flat = (
        np.concatenate([np.asarray(p, dtype=np.int64)
                        for p in positions_per_posting if len(p)])
        if tfs.sum() else np.empty(0, dtype=np.int64)
    )
    enc, offs = encode_positions_flat(flat, tfs)
    return enc, offs.astype(np.int32)


def decode_positions(
    pos_enc: bytes, pos_off: np.ndarray, tfs: np.ndarray,
    posting_indices: np.ndarray,
) -> list[np.ndarray]:
    """Positions arrays for the given posting ordinals; `tfs` is aligned
    with `posting_indices` (tf = number of positions of that posting)."""
    out = []
    mv = memoryview(pos_enc)
    for i, pi in enumerate(np.asarray(posting_indices, dtype=np.int64)):
        n = int(tfs[i])
        deltas, _ = vint_decode(mv[int(pos_off[pi]):], n)
        out.append(np.cumsum(deltas.astype(np.int64)))
    return out


def decode_block(
    doc_enc: bytes,
    tf_enc: bytes,
    block_doc_off: np.ndarray,
    block_tf_off: np.ndarray,
    doc_freq: int,
    block_idx: int,
    prev_last_doc: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode a single block -> (doc_ids int64, tfs int64)."""
    lo = block_idx * BLOCK_SIZE
    cnt = min(BLOCK_SIZE, doc_freq - lo)
    do = int(block_doc_off[block_idx])
    to = int(block_tf_off[block_idx])
    if cnt == BLOCK_SIZE:  # full blocks are bitpacked, the (<128) tail is vint
        dw = doc_enc[do]
        d = bitunpack(memoryview(doc_enc)[do + 1:], BLOCK_SIZE, dw).astype(np.int64)
        tw = tf_enc[to]
        t = bitunpack(memoryview(tf_enc)[to + 1:], BLOCK_SIZE, tw).astype(np.int64)
    else:
        d, _ = vint_decode(memoryview(doc_enc)[do:], cnt)
        t, _ = vint_decode(memoryview(tf_enc)[to:], cnt)
        d = d.astype(np.int64)
        t = t.astype(np.int64)
    docs = np.cumsum(d + 1) + prev_last_doc
    return docs, t + 1


def _unpack_full_blocks(enc: bytes, boffs: np.ndarray) -> np.ndarray:
    """Batch-decode full 128-value bitpacked blocks -> int64 (m, 128).

    `boffs` are the byte offsets of each block's 1-byte width header.
    The inverse of `encode_postings_flat._write_full`: blocks are grouped
    by width so each distinct width costs ONE unpackbits/packbits pass —
    a per-block Python loop here was the query kernel's decode hot spot
    (~38 us/block adds up to seconds on multi-million-posting terms)."""
    raw = np.frombuffer(enc, dtype=np.uint8)
    widths = raw[boffs]
    out = np.empty((len(boffs), BLOCK_SIZE), dtype=np.int64)
    for w in np.unique(widths):
        sel = widths == w
        if w == 0:
            out[sel] = 0
            continue
        w = int(w)
        nb = BLOCK_SIZE * w // 8
        payload = raw[boffs[sel][:, None] + 1 + np.arange(nb)]
        bits = np.unpackbits(payload, axis=1).reshape(-1, w)
        full = np.zeros((bits.shape[0], 32), dtype=np.uint8)
        full[:, 32 - w:] = bits
        vals = np.packbits(full, axis=1).view(">u4").ravel()
        out[sel] = vals.astype(np.int64).reshape(-1, BLOCK_SIZE)
    return out


def decode_postings(
    doc_enc: bytes,
    tf_enc: bytes,
    block_doc_off: np.ndarray,
    block_tf_off: np.ndarray,
    block_last: np.ndarray,
    doc_freq: int,
    block_indices: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode all blocks (or a subset) -> (doc_ids, tfs, posting_offsets).

    posting_offsets[i] is the index within the full posting list of the
    first doc of decoded block i — used to slice fnorm_enc.

    Vectorized: all requested full blocks decode in one width-grouped
    pass (`_unpack_full_blocks`); only the (at most one) vint tail block
    takes a scalar path.  Parity with the per-block `decode_block` loop
    is pinned in tests/test_blocks.py.
    """
    n_blocks = len(block_doc_off)
    if block_indices is None:
        bidx = np.arange(n_blocks, dtype=np.int64)
    else:
        bidx = np.asarray(block_indices, dtype=np.int64)
    if len(bidx) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    offs = bidx * BLOCK_SIZE
    prev = np.where(bidx > 0, block_last[np.maximum(bidx - 1, 0)], -1)
    tail_bi = n_blocks - 1 if doc_freq % BLOCK_SIZE != 0 else -1
    is_tail = bidx == tail_bi
    counts = np.full(len(bidx), BLOCK_SIZE, dtype=np.int64)
    counts[is_tail] = doc_freq - tail_bi * BLOCK_SIZE
    starts = np.cumsum(counts) - counts
    docs = np.empty(int(counts.sum()), dtype=np.int64)
    tfs = np.empty_like(docs)

    full_pos = np.flatnonzero(~is_tail)
    if len(full_pos):
        fb = bidx[full_pos]
        d = _unpack_full_blocks(doc_enc, np.asarray(block_doc_off, np.int64)[fb])
        t = _unpack_full_blocks(tf_enc, np.asarray(block_tf_off, np.int64)[fb])
        tgt = (starts[full_pos][:, None] + np.arange(BLOCK_SIZE)).ravel()
        docs[tgt] = (np.cumsum(d + 1, axis=1) + prev[full_pos][:, None]).ravel()
        tfs[tgt] = (t + 1).ravel()
    for p in np.flatnonzero(is_tail):  # at most one per term
        cnt = int(counts[p])
        d, _ = vint_decode(memoryview(doc_enc)[int(block_doc_off[tail_bi]):], cnt)
        t, _ = vint_decode(memoryview(tf_enc)[int(block_tf_off[tail_bi]):], cnt)
        lo = int(starts[p])
        docs[lo:lo + cnt] = np.cumsum(d.astype(np.int64) + 1) + int(prev[p])
        tfs[lo:lo + cnt] = t.astype(np.int64) + 1
    return docs, tfs, offs


def fnorms_for_blocks(
    fnorm_enc: bytes, doc_freq: int, block_indices: np.ndarray | None = None
) -> np.ndarray:
    """Per-posting fieldnorm ids for the given blocks (uint8 array)."""
    arr = np.frombuffer(fnorm_enc, dtype=np.uint8, count=doc_freq)
    if block_indices is None:
        return arr
    parts = [
        arr[bi * BLOCK_SIZE: min((bi + 1) * BLOCK_SIZE, doc_freq)]
        for bi in np.asarray(block_indices, dtype=np.int64)
    ]
    if not parts:
        return np.empty(0, dtype=np.uint8)
    return np.concatenate(parts)

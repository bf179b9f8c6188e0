"""Posting block codec round-trip — mirrors the reference's serializer and
compression tests (src/postings/serializer.rs:389-482, compression/mod.rs:36-77)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tantivy_spark.operators import blocks


def _roundtrip(docs, tfs, fns):
    e = blocks.encode_postings(docs, tfs, fns)
    d, t, _ = blocks.decode_postings(
        e["doc_enc"], e["tf_enc"], e["block_doc_off"], e["block_tf_off"],
        e["block_last"], e["doc_freq"],
    )
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)
    assert np.array_equal(blocks.fnorms_for_blocks(e["fnorm_enc"], len(docs)), fns)
    return e


def test_bitpack_roundtrip_all_widths():
    rng = np.random.default_rng(1)
    for w in range(0, 33):
        hi = 1 if w == 0 else 2**w
        vals = rng.integers(0, hi, 128).astype(np.uint32) if w else np.zeros(128, np.uint32)
        buf = blocks.bitpack(vals, w)
        out = blocks.bitunpack(buf, 128, w)
        assert np.array_equal(out, vals), w


def test_vint_roundtrip():
    vals = np.array([0, 1, 127, 128, 300, 2**20, 2**35], dtype=np.uint64)
    buf = blocks.vint_encode(vals)
    out, consumed = blocks.vint_decode(buf, len(vals))
    assert consumed == len(buf)
    assert np.array_equal(out, vals)


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 700),
    seed=st.integers(0, 10**6),
    dense=st.booleans(),
)
def test_roundtrip_property(n, seed, dense):
    rng = np.random.default_rng(seed)
    space = n if dense else n * 50
    docs = np.sort(rng.choice(space, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 1000, n).astype(np.int64)
    fns = rng.integers(0, 256, n).astype(np.uint8)
    e = _roundtrip(docs, tfs, fns)
    # block metadata invariants
    n_blocks = (n + blocks.BLOCK_SIZE - 1) // blocks.BLOCK_SIZE
    assert len(e["block_last"]) == n_blocks
    assert e["block_last"][-1] == docs[-1]
    # block-max pair is a genuine upper bound: min fieldnorm, max tf
    for bi in range(n_blocks):
        lo, hi = bi * blocks.BLOCK_SIZE, min((bi + 1) * blocks.BLOCK_SIZE, n)
        assert e["bm_tf"][bi] == tfs[lo:hi].max()
        assert e["bm_norm_id"][bi] == fns[lo:hi].min()


def test_subset_decode():
    rng = np.random.default_rng(7)
    n = 1000
    docs = np.sort(rng.choice(50_000, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, n).astype(np.int64)
    fns = rng.integers(0, 256, n).astype(np.uint8)
    e = blocks.encode_postings(docs, tfs, fns)
    pick = np.array([0, 3, 7])  # includes the vint tail (block 7 of 0..7)
    d, t, offs = blocks.decode_postings(
        e["doc_enc"], e["tf_enc"], e["block_doc_off"], e["block_tf_off"],
        e["block_last"], n, pick,
    )
    expect = np.concatenate([docs[bi * 128: (bi + 1) * 128] for bi in pick])
    assert np.array_equal(d, expect)
    f = blocks.fnorms_for_blocks(e["fnorm_enc"], n, pick)
    assert np.array_equal(f, np.concatenate([fns[bi * 128: (bi + 1) * 128] for bi in pick]))


def test_dense_zero_width_block():
    # consecutive doc ids -> deltas-1 all zero -> width 0, no payload bytes
    docs = np.arange(128, dtype=np.int64)
    tfs = np.ones(128, dtype=np.int64)
    fns = np.zeros(128, dtype=np.uint8)
    e = _roundtrip(docs, tfs, fns)
    assert len(e["doc_enc"]) == 1  # just the width byte
    assert len(e["tf_enc"]) == 1

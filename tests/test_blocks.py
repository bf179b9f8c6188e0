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


def test_term_scorer_golden_max_and_block_max():
    """Golden f32 fixtures from term_query/term_scorer.rs
    test_term_scorer_max_score (:168-190): per-term max score, per-block
    block-max from the stored (fieldnorm_id, tf) pair, and per-doc scores."""
    import numpy as np
    import pytest

    from tantivy_spark.functions.bm25 import Bm25Params, Bm25Weight
    from tantivy_spark.functions.fieldnorm import fieldnorm_to_id
    from tantivy_spark.operators import blocks

    w = Bm25Weight.for_one_term(3, 6, np.float32(10.0), Bm25Params())
    assert float(w.max_score()) == pytest.approx(1.3990127, rel=1e-5)

    doc_ids = np.array([2, 3, 7], dtype=np.int64)
    tfs = np.array([3, 12, 8], dtype=np.int64)
    norms = np.array([0, 0, 10, 12, 0, 0, 0, 100], dtype=np.int64)
    fns = fieldnorm_to_id(norms[doc_ids]).astype(np.uint8)
    e = blocks.encode_postings(doc_ids, tfs, fns)
    # Stored pair is (min fieldnorm_id, max tf) — an upper bound valid
    # under ANY avgdl, so WAND pruning stays exact under the GLOBAL weight
    # (SURVEY §4.2 WAND-safety note).  With heterogeneous fieldnorms this
    # is deliberately looser than the reference's segment-local argmax
    # pair (loaded-block true max 1.3676447, serializer.rs:389-440): here
    # (norm of 10 tokens, tf=12) -> 1.3862944 >= 1.3676447.
    bm = float(w.score(np.array(e["bm_norm_id"]), np.array(e["bm_tf"]))[0])
    assert bm == pytest.approx(1.3862944, rel=1e-5)
    assert bm >= 1.3676447 - 1e-6
    per_doc = w.score(fns.astype(np.int64), tfs)
    assert bm >= float(per_doc.max()) - 1e-6
    assert float(per_doc[0]) == pytest.approx(1.0892314, rel=1e-5)
    assert float(per_doc[1]) == pytest.approx(1.3676447, rel=1e-5)
    assert float(per_doc[2]) == pytest.approx(0.72015285, rel=1e-5)


def test_block_wand_golden_block_maxes():
    """term_scorer.rs test_block_wand (:256-280): per-block upper bounds.
    Blocks 0/1 match the reference skip-data bounds; for the tail block the
    reference's shallow bound falls back to the term max (5.2971773) while
    the loaded-block true max is 3.9539647 — we STORE the true pair for
    every block (global-stats WAND safety, SURVEY §4.2), so our stored
    bound equals the loaded value and is <= the reference's shallow bound."""
    import numpy as np
    import pytest

    from tantivy_spark.functions.bm25 import Bm25Params, Bm25Weight
    from tantivy_spark.functions.fieldnorm import fieldnorm_to_id
    from tantivy_spark.operators import blocks

    doc_tfs = [(d, 1) for d in range(128)]
    doc_tfs += [(d, 2 if d == 200 else 1) for d in range(128, 256)]
    doc_tfs += [(256, 1), (257, 3), (258, 1)]
    doc_ids = np.array([d for d, _ in doc_tfs], dtype=np.int64)
    tfs = np.array([t for _, t in doc_tfs], dtype=np.int64)
    fns = fieldnorm_to_id(np.full(len(doc_ids), 20, dtype=np.int64)).astype(np.uint8)

    w = Bm25Weight.for_one_term(10, 129, np.float32(20.0), Bm25Params())
    assert float(w.max_score()) == pytest.approx(5.2971773, rel=1e-5)

    e = blocks.encode_postings(doc_ids, tfs, fns)
    bm = w.score(np.array(e["bm_norm_id"], dtype=np.int64),
                 np.array(e["bm_tf"], dtype=np.int64))
    assert float(bm[0]) == pytest.approx(2.5161593, rel=1e-5)
    assert float(bm[1]) == pytest.approx(3.4597192, rel=1e-5)
    assert float(bm[2]) == pytest.approx(3.9539647, rel=1e-5)


@settings(max_examples=40, deadline=None)
@given(n=st.integers(1, 1200), seed=st.integers(0, 10**6),
       subset=st.booleans())
def test_vectorized_decode_matches_per_block_loop(n, seed, subset):
    """The width-grouped batch decoder must equal the scalar per-block
    decode_block loop on every block pattern (full/tail/zero-width)."""
    rng = np.random.default_rng(seed)
    docs = np.sort(rng.choice(n * 30, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 300, n).astype(np.int64)
    fns = rng.integers(0, 256, n).astype(np.uint8)
    e = blocks.encode_postings(docs, tfs, fns)
    n_blocks = len(e["block_last"])
    pick = (np.unique(rng.integers(0, n_blocks, max(1, n_blocks // 2)))
            if subset else np.arange(n_blocks))
    d, t, offs = blocks.decode_postings(
        e["doc_enc"], e["tf_enc"], e["block_doc_off"], e["block_tf_off"],
        e["block_last"], n, pick,
    )
    ref_d, ref_t = [], []
    for bi in pick:
        prev = int(e["block_last"][bi - 1]) if bi > 0 else -1
        db, tb = blocks.decode_block(
            e["doc_enc"], e["tf_enc"], e["block_doc_off"], e["block_tf_off"],
            n, int(bi), prev,
        )
        ref_d.append(db)
        ref_t.append(tb)
    assert np.array_equal(d, np.concatenate(ref_d))
    assert np.array_equal(t, np.concatenate(ref_t))
    assert np.array_equal(offs, pick * blocks.BLOCK_SIZE)

"""Property test: the pruning kernel is exactly equivalent to exhaustive
scoring — mirrors the reference's block-WAND proptest
(src/query/boolean_query/block_wand_union.rs:427-634) and the TopN tie-break
fixtures (src/collector/top_score_collector.rs:860-1230)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tantivy_spark.functions.bm25 import Bm25Params, Bm25Weight
from tantivy_spark.operators import blocks
from tantivy_spark.operators.kernel import Clause, TermPostings, segment_topk

F32 = np.float32


def _mk_corpus(rng, n_docs, n_terms):
    """Random per-doc fieldnorms + per-term posting lists."""
    fns = rng.integers(0, 200, n_docs).astype(np.uint8)
    terms = []
    for _ in range(n_terms):
        df = int(rng.integers(1, n_docs + 1))
        docs = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 50, df).astype(np.int64)
        terms.append((docs, tfs, fns[docs]))
    return fns, terms


def _tp(term, docs, tfs, fns_):
    e = blocks.encode_postings(docs, tfs, fns_)
    return TermPostings(
        term=term, doc_freq=len(docs), doc_enc=e["doc_enc"], tf_enc=e["tf_enc"],
        fnorm_enc=e["fnorm_enc"],
        block_last=e["block_last"], block_doc_off=e["block_doc_off"],
        block_tf_off=e["block_tf_off"],
        bm_norm_id=np.asarray(e["bm_norm_id"], np.int64),
        bm_tf=np.asarray(e["bm_tf"], np.int64),
    )


def _brute_force(clauses_data, occurs, weights, n_docs, k, min_should):
    """Exhaustive TAAT in f32, clause-order accumulation, tantivy tie-break."""
    scores = np.zeros(n_docs, dtype=F32)
    present = np.zeros((len(clauses_data), n_docs), dtype=bool)
    for ci, (docs, tfs, fns_) in enumerate(clauses_data):
        present[ci, docs] = True
    musts = [i for i, o in enumerate(occurs) if o == "must"]
    shoulds = [i for i, o in enumerate(occurs) if o == "should"]
    must_nots = [i for i, o in enumerate(occurs) if o == "must_not"]
    match = np.ones(n_docs, dtype=bool)
    if not musts and not shoulds:
        return np.empty(0, np.int64), np.empty(0, F32)
    for i in musts:
        match &= present[i]
    if not musts:
        match = np.zeros(n_docs, dtype=bool)
        for i in shoulds:
            match |= present[i]
    if min_should > 0 and shoulds:
        cnt = np.zeros(n_docs, dtype=np.int64)
        for i in shoulds:
            cnt += present[i]
        match &= cnt >= min_should
    for i in must_nots:
        match &= ~present[i]
    for ci, (docs, tfs, fns_) in enumerate(clauses_data):
        if occurs[ci] == "must_not":
            continue
        sc = np.zeros(n_docs, dtype=F32)
        sc[docs] = weights[ci].score(fns_.astype(np.int64), tfs)
        scores = (scores + sc).astype(F32)
    docs = np.nonzero(match)[0].astype(np.int64)
    sc = scores[docs]
    order = np.lexsort((docs, -sc.astype(np.float64)))[:k]
    return docs[order], sc[order]


@settings(max_examples=80, deadline=None)
@given(
    seed=st.integers(0, 10**6),
    n_docs=st.integers(5, 600),
    n_terms=st.integers(1, 4),
    k=st.integers(1, 12),
    shape=st.sampled_from(
        ["all_should", "all_must", "mixed", "with_not", "min_should"]
    ),
)
def test_kernel_equals_brute_force(seed, n_docs, n_terms, k, shape):
    rng = np.random.default_rng(seed)
    fns, terms = _mk_corpus(rng, n_docs, n_terms)
    total_tokens = int(fns.astype(np.int64).sum()) + n_docs  # arbitrary exact totals
    params = Bm25Params()

    occurs = []
    for i in range(n_terms):
        if shape == "all_should":
            occurs.append("should")
        elif shape == "all_must":
            occurs.append("must")
        elif shape == "mixed":
            occurs.append("must" if i % 2 == 0 else "should")
        elif shape == "with_not":
            occurs.append("must_not" if (i == n_terms - 1 and n_terms > 1) else "should")
        else:
            occurs.append("should")
    min_should = 2 if (shape == "min_should" and n_terms >= 2) else 0

    avg = F32(F32(total_tokens) / F32(n_docs))
    weights, clauses, clause_data = [], [], []
    for i, (docs, tfs, f) in enumerate(terms):
        w = Bm25Weight.for_one_term(len(docs), n_docs, avg, params)
        weights.append(w)
        clause_data.append((docs, tfs, f))
        clauses.append(Clause(occurs[i], f"t{i}", w, _tp(f"t{i}", docs, tfs, f)))

    got_docs, got_scores = segment_topk(clauses, k, min_should)
    exp_docs, exp_scores = _brute_force(clause_data, occurs, weights, n_docs, k, min_should)

    assert np.array_equal(got_docs, exp_docs), (got_docs, exp_docs)
    assert np.array_equal(got_scores, exp_scores)  # bit-exact f32


def test_tie_break_ascending_doc_id():
    # equal scores -> ascending doc id (top_score_collector.rs:28-30)
    docs = np.arange(0, 50, dtype=np.int64)
    tfs = np.full(50, 3, dtype=np.int64)
    fns_ = np.full(50, 10, dtype=np.uint8)
    w = Bm25Weight.for_one_term(50, 100, 12.0)
    cl = [Clause("should", "t", w, _tp("t", docs, tfs, fns_))]
    got_docs, got_scores = segment_topk(cl, 5)
    assert list(got_docs) == [0, 1, 2, 3, 4]
    assert len(set(got_scores.tolist())) == 1


def test_must_term_absent_from_segment():
    docs = np.array([1, 5], dtype=np.int64)
    w = Bm25Weight.for_one_term(2, 10, 5.0)
    cl = [
        Clause("must", "present", w, _tp("p", docs, np.array([1, 1]), np.array([3, 3], np.uint8))),
        Clause("must", "absent", None, None),
    ]
    got_docs, _ = segment_topk(cl, 10)
    assert len(got_docs) == 0


def test_only_must_not_matches_nothing():
    docs = np.array([1], dtype=np.int64)
    w = Bm25Weight.for_one_term(1, 10, 5.0)
    cl = [Clause("must_not", "x", w, _tp("x", docs, np.array([2]), np.array([3], np.uint8)))]
    got_docs, _ = segment_topk(cl, 10)
    assert len(got_docs) == 0


def test_const_score():
    docs = np.array([2, 4, 9], dtype=np.int64)
    w = Bm25Weight.for_one_term(3, 10, 5.0)
    cl = [Clause("should", "x", w, _tp("x", docs, np.array([5, 1, 2]), np.array([3, 3, 3], np.uint8)))]
    got_docs, got_scores = segment_topk(cl, 10, const_score=1.0)
    assert list(got_docs) == [2, 4, 9]
    assert got_scores.tolist() == [1.0, 1.0, 1.0]


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 10**6),
    n_docs=st.integers(5, 400),
    k=st.integers(1, 10),
    shape=st.sampled_from(["all_should", "mixed", "with_not"]),
)
def test_kernel_with_array_postings_equals_brute_force(seed, n_docs, k, shape):
    """ArrayPostings (virtual-term, e.g. a materialized phrase) clauses mix
    with block-encoded TermPostings clauses and the kernel stays exactly
    equivalent to exhaustive f32 scoring."""
    from tantivy_spark.operators.kernel import ArrayPostings

    rng = np.random.default_rng(seed)
    fns, terms = _mk_corpus(rng, n_docs, 3)
    # clause 0/1: encoded terms; clause 2: in-memory virtual term
    vdocs = np.sort(rng.choice(n_docs, size=int(rng.integers(1, n_docs + 1)),
                               replace=False)).astype(np.int64)
    vtfs = rng.integers(1, 6, len(vdocs)).astype(np.int64)
    varr = (vdocs, vtfs, fns[vdocs])
    data = [terms[0], terms[1], varr]
    if shape == "all_should":
        occurs = ["should", "should", "should"]
    elif shape == "mixed":
        occurs = ["must", "should", "should"]
    else:
        occurs = ["should", "must_not", "should"]
    weights = [
        Bm25Weight.for_one_term(len(d), n_docs, F32(10.0), Bm25Params())
        for d, _, _ in data
    ]
    clauses = [
        Clause(occurs[0], "t0", weights[0], _tp("t0", *terms[0])),
        Clause(occurs[1], "t1", weights[1], _tp("t1", *terms[1])),
        Clause(occurs[2], "vp", weights[2],
               ArrayPostings(vdocs, vtfs, fns[vdocs].astype(np.int64))),
    ]
    got_docs, got_scores = segment_topk(clauses, k)
    exp_docs, exp_scores = _brute_force(data, occurs, weights, n_docs, k, 0)
    assert np.array_equal(got_docs, exp_docs)
    assert np.allclose(got_scores, exp_scores, rtol=1e-6, atol=1e-7)


def _brute_dismax(data, weights, tie, n_docs, k):
    """Exhaustive dismax: max + tie*(sum-max), f32, tantivy tie-break."""
    mx = np.zeros(n_docs, dtype=F32)
    sm = np.zeros(n_docs, dtype=F32)
    match = np.zeros(n_docs, dtype=bool)
    for (docs, tfs, fns_), w in zip(data, weights):
        sc = np.zeros(n_docs, dtype=F32)
        sc[docs] = w.score(fns_.astype(np.int64), tfs)
        mx = np.maximum(mx, sc)
        sm = (sm + sc).astype(F32)
        match[docs] = True
    scores = (mx + F32(tie) * (sm - mx)).astype(F32)
    docs = np.nonzero(match)[0].astype(np.int64)
    sc = scores[docs]
    order = np.lexsort((docs, -sc.astype(np.float64)))[:k]
    return docs[order], sc[order]


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10**6),
    n_docs=st.integers(6000, 24000),
    n_terms=st.integers(1, 3),
    k=st.integers(1, 12),
    shape=st.sampled_from(["all_should", "all_must", "mixed", "with_not"]),
)
def test_kernel_large_skewed_equals_brute_force(seed, n_docs, n_terms, k,
                                                shape):
    """Large posting lists (>= 32 blocks) with skewed fieldnorms/tfs —
    the regime where BlockWAND's partial θ seed and per-term block cuts
    actually engage (small corpora take the flat-distribution bailout).
    The pruned kernel must stay bit-exactly equal to exhaustive TAAT."""
    rng = np.random.default_rng(seed)
    fns, terms = _mk_corpus(rng, n_docs, n_terms)
    params = Bm25Params()
    occurs = []
    for i in range(n_terms):
        if shape == "all_should":
            occurs.append("should")
        elif shape == "all_must":
            occurs.append("must")
        elif shape == "mixed":
            occurs.append("must" if i % 2 == 0 else "should")
        else:
            occurs.append(
                "must_not" if (i == n_terms - 1 and n_terms > 1)
                else "should")
    avg = F32(F32(int(fns.astype(np.int64).sum()) + n_docs) / F32(n_docs))
    weights, clauses, data = [], [], []
    for i, (docs, tfs, f) in enumerate(terms):
        w = Bm25Weight.for_one_term(len(docs), n_docs, avg, params)
        weights.append(w)
        data.append((docs, tfs, f))
        clauses.append(Clause(occurs[i], f"t{i}", w, _tp(f"t{i}", docs, tfs, f)))
    got_docs, got_scores = segment_topk(clauses, k, 0)
    exp_docs, exp_scores = _brute_force(data, occurs, weights, n_docs, k, 0)
    assert np.array_equal(got_docs, exp_docs)
    assert np.array_equal(got_scores, exp_scores)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10**6),
    n_docs=st.integers(6000, 24000),
    n_terms=st.integers(1, 3),
    k=st.integers(1, 10),
    tie=st.sampled_from([0.0, 0.3, 1.0]),
)
def test_dismax_large_skewed_equals_brute_force(seed, n_docs, n_terms, k,
                                                tie):
    from tantivy_spark.operators.kernel import segment_topk_dismax

    rng = np.random.default_rng(seed)
    fns, terms = _mk_corpus(rng, n_docs, n_terms)
    avg = F32(F32(int(fns.astype(np.int64).sum()) + n_docs) / F32(n_docs))
    weights, clauses, data = [], [], []
    for i, (docs, tfs, f) in enumerate(terms):
        w = Bm25Weight.for_one_term(len(docs), n_docs, avg, Bm25Params())
        weights.append(w)
        data.append((docs, tfs, f))
        clauses.append(Clause("should", f"t{i}", w, _tp(f"t{i}", docs, tfs, f)))
    got_docs, got_scores = segment_topk_dismax(clauses, tie, k)
    exp_docs, exp_scores = _brute_dismax(data, weights, tie, n_docs, k)
    assert np.array_equal(got_docs, exp_docs)
    assert np.array_equal(got_scores, exp_scores)


def test_blockwand_actually_skips_decode(monkeypatch):
    """On a skewed single-term list the kernel must decode a small
    fraction of the blocks (θ from the best blocks prunes the rest) —
    the property the whole BlockWAND apparatus exists for."""
    from tantivy_spark.operators import kernel as Kmod

    rng = np.random.default_rng(7)
    n_docs = 120_000
    # skewed doc lengths CLUSTERED in doc-id space (insertion order
    # groups similar sources): one short-doc region scores high, the
    # rest long/low — so block maxes vary and pruning has something to
    # skip (scattering the short docs would lift every block's max)
    fns = rng.integers(120, 200, n_docs).astype(np.uint8)
    fns[5000:6000] = rng.integers(1, 8, 1000).astype(np.uint8)
    docs = np.arange(n_docs, dtype=np.int64)
    tfs = rng.integers(1, 4, n_docs).astype(np.int64)
    # df << N — a hot-but-not-stopword term, so idf (and score spread)
    # is realistic
    w = Bm25Weight.for_one_term(n_docs, 10_000_000, F32(150.0),
                                Bm25Params())
    tp = _tp("t", docs, tfs, fns)

    decoded_blocks = []
    orig = blocks.decode_postings

    def counting(doc_enc, tf_enc, bdo, bto, bl, df, block_indices=None):
        decoded_blocks.append(
            len(bdo) if block_indices is None else len(block_indices))
        return orig(doc_enc, tf_enc, bdo, bto, bl, df, block_indices)

    monkeypatch.setattr(Kmod.blocks, "decode_postings", counting)
    got_docs, got_scores = segment_topk(
        [Clause("should", "t", w, tp)], 10)
    total_decoded = sum(decoded_blocks)
    n_blocks = len(tp.block_last)
    assert total_decoded < n_blocks // 4, (total_decoded, n_blocks)
    # and the result is still exact
    monkeypatch.setattr(Kmod.blocks, "decode_postings", orig)
    exp_docs, exp_scores = _brute_force(
        [(docs, tfs, fns)], ["should"], [w], n_docs, 10, 0)
    assert np.array_equal(got_docs, exp_docs)
    assert np.array_equal(got_scores, exp_scores)

"""Phrase query + positions codec tests.

Mirrors the reference's phrase semantics tests
(/root/reference/src/query/phrase_query/mod.rs): doc matches iff terms
occur at consecutive positions; tf = number of phrase occurrences; scored
like a single term with summed idf (phrase_scorer.rs:578-582).
"""

import numpy as np
import pandas as pd
import pytest

from tantivy_spark.config import IndexConfig
from tantivy_spark.functions.bm25 import Bm25Params, Bm25Weight
from tantivy_spark.operators import blocks
from tantivy_spark.operators.build import build_index
from tantivy_spark.operators.kernel import TermPostings, segment_topk_phrase
from tantivy_spark.operators.search import Searcher
from tantivy_spark.plans import logical as L


def test_positions_roundtrip():
    rng = np.random.default_rng(7)
    n = 300
    doc_ids = np.sort(rng.choice(100_000, size=n, replace=False))
    positions = [
        np.sort(rng.choice(500, size=rng.integers(1, 8), replace=False))
        for _ in range(n)
    ]
    tfs = np.array([len(p) for p in positions], dtype=np.int64)
    pos_enc, pos_off = blocks.encode_positions(positions)
    got = blocks.decode_positions(pos_enc, pos_off, tfs, np.arange(n))
    for g, p in zip(got, positions):
        assert np.array_equal(g, p)
    # subset decode
    sub = np.array([0, 5, n - 1])
    got2 = blocks.decode_positions(pos_enc, pos_off, tfs[sub], sub)
    for g, i in zip(got2, sub):
        assert np.array_equal(g, positions[i])


def _postings_with_positions(doc_positions: dict[int, list[int]]) -> TermPostings:
    doc_ids = np.array(sorted(doc_positions), dtype=np.int64)
    pos = [np.array(doc_positions[d]) for d in doc_ids]
    tfs = np.array([len(p) for p in pos], dtype=np.int64)
    fns = np.full(len(doc_ids), 10, dtype=np.uint8)
    e = blocks.encode_postings(doc_ids, tfs, fns)
    pos_enc, pos_off = blocks.encode_positions(pos)
    return TermPostings(
        term="t", doc_freq=len(doc_ids), doc_enc=e["doc_enc"],
        tf_enc=e["tf_enc"], fnorm_enc=e["fnorm_enc"],
        block_last=e["block_last"], block_doc_off=e["block_doc_off"],
        block_tf_off=e["block_tf_off"], bm_norm_id=e["bm_norm_id"],
        bm_tf=e["bm_tf"], pos_enc=pos_enc, pos_off=pos_off,
    )


def test_phrase_kernel_consecutive_only():
    # doc 0: "a b" at (0,1) -> match; doc 1: "a .. b" gap -> no match;
    # doc 2: "b a" -> no match; doc 3: two occurrences
    tp_a = _postings_with_positions({0: [0], 1: [0], 2: [5], 3: [2, 7]})
    tp_b = _postings_with_positions({0: [1], 1: [4], 2: [4], 3: [3, 8]})
    w = Bm25Weight.for_terms([4, 4], 10, 100, Bm25Params())
    docs, scores = segment_topk_phrase([tp_a, tp_b], w, k=10)
    assert docs.tolist() == [3, 0]  # doc 3 has tf=2 -> higher score
    assert scores[0] > scores[1]


def test_phrase_kernel_duplicate_term():
    # phrase "a a": doc 0 has a at 0,1 (match), doc 1 at 0,2 (no match)
    tp_a = _postings_with_positions({0: [0, 1], 1: [0, 2]})
    w = Bm25Weight.for_terms([2, 2], 10, 100, Bm25Params())
    docs, _ = segment_topk_phrase([tp_a, tp_a], w, k=10)
    assert docs.tolist() == [0]


@pytest.fixture(scope="module")
def phrase_index(spark, tmp_root):
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(6)],
            "turn_idx": [0] * 6,
            "text": [
                "the quick brown fox",
                "quick brown shoes",
                "brown quick reversal",
                "the quick brown quick brown fox",
                "unrelated words here",
                "quick stop then brown later",
            ],
        }
    )
    src = spark.createDataFrame(pdf)
    cfg = IndexConfig(n_segments=2, n_term_buckets=4, positions=True)
    idx = f"{tmp_root}/phrase_idx"
    build_index(spark, src, idx, cfg)
    return Searcher(spark, idx)


def test_phrase_e2e_daat_vs_taat(phrase_index):
    q = L.PhraseQuery(("quick", "brown"))
    daat = phrase_index.search(q, k=10, mode="daat").collect()
    taat = phrase_index.search(q, k=10, mode="taat64").collect()
    got_daat = [(r["conv_id"], r["turn_idx"]) for r in daat]
    got_taat = [(r["conv_id"], r["turn_idx"]) for r in taat]
    assert got_daat == got_taat
    matched = {c for c, _ in got_daat}
    assert matched == {"c0", "c1", "c3"}  # c5 has a gap: "quick stop then brown"
    # doc with two occurrences scores highest
    assert got_daat[0][0] == "c3"
    # f32 vs f64 agreement to f32 precision
    for rd, rt in zip(daat, taat):
        assert rt["score"] == pytest.approx(rd["score"], rel=1e-6)


def test_phrase_absent_term(phrase_index):
    q = L.PhraseQuery(("quick", "zzz"))
    assert phrase_index.search(q, k=10, mode="daat").count() == 0
    assert phrase_index.search(q, k=10, mode="taat64").count() == 0


def test_phrase_boost(phrase_index):
    q = L.PhraseQuery(("quick", "brown"))
    base = phrase_index.search(q, k=10, mode="daat").collect()
    boosted = phrase_index.search(L.BoostQuery(q, 2.0), k=10, mode="daat").collect()
    for rb, r in zip(boosted, base):
        assert rb["score"] == pytest.approx(2.0 * r["score"], rel=1e-6)


def test_slop_count_greedy():
    from tantivy_spark.operators.kernel import _slop_count
    import numpy as np
    # adjacent (adjusted diff 0) matches at slop 0 via phrase path; here the
    # greedy counter itself: |l - r| <= slop
    assert _slop_count(np.array([0]), np.array([0]), 0) == 1
    assert _slop_count(np.array([0]), np.array([2]), 1) == 0
    assert _slop_count(np.array([0]), np.array([2]), 2) == 1
    # greedy best-match advance: left 0,3 right 3 -> pairs (3,3) not (0,3)
    assert _slop_count(np.array([0, 3]), np.array([3]), 3) == 1
    # left 0 is out of range of 2 at slop 1; greedy pairs 3 with 2 -> one
    assert _slop_count(np.array([0, 3]), np.array([2, 4]), 1) == 1
    assert _slop_count(np.array([0, 3]), np.array([1, 4]), 1) == 2


def test_phrase_slop_e2e(phrase_index):
    # "quick brown" with a gap in c5 ("quick stop then brown"): distance
    # between adjusted positions = 2 -> matched at slop >= 2
    q2 = L.PhraseQuery(("quick", "brown"), slop=2)
    out = phrase_index.search(q2, k=10, mode="daat").collect()
    got = {r["conv_id"] for r in out}
    assert "c5" in got
    assert {"c0", "c1", "c3"} <= got
    # reversed order "brown quick" in c2: adjusted |1 - (0-1)| = 2
    assert "c2" in {r["conv_id"] for r in
                    phrase_index.search(L.PhraseQuery(("quick", "brown"), slop=2),
                                        k=10, mode="daat").collect()}
    q1 = L.PhraseQuery(("quick", "brown"), slop=1)
    got1 = {r["conv_id"] for r in phrase_index.search(q1, k=10, mode="daat").collect()}
    assert "c5" not in got1  # gap of 2 needs slop >= 2


def test_phrase_prefix_e2e(phrase_index):
    # "quick bro"* expands bro -> brown
    q = L.PhrasePrefixQuery(("quick", "bro"))
    out = phrase_index.search(q, k=10, mode="daat").collect()
    assert {r["conv_id"] for r in out} == {"c0", "c1", "c3"}
    # no expansions -> empty
    qz = L.PhrasePrefixQuery(("quick", "zzz"))
    assert phrase_index.search(qz, k=10, mode="daat").count() == 0
    # expansion set larger than one term
    q2 = L.PhrasePrefixQuery(("the", "qu"))
    out2 = phrase_index.search(q2, k=10, mode="daat").collect()
    assert {r["conv_id"] for r in out2} == {"c0", "c3"}


def test_parser_phrase_prefix():
    from tantivy_spark.plans.parser import QueryParser

    q = QueryParser().parse('"quick bro"*')
    assert q == L.PhrasePrefixQuery(("quick", "bro"))


def test_regex_phrase_kernel_alternatives():
    # slots-of-alternatives: phrase "a (b|c)": doc0 "a b", doc1 "a c",
    # doc2 "a d" (no match), doc3 "b a" (order wrong)
    tp_a = _postings_with_positions({0: [0], 1: [0], 2: [0], 3: [1]})
    tp_b = _postings_with_positions({0: [1], 3: [0]})
    tp_c = _postings_with_positions({1: [1]})
    w = Bm25Weight.for_terms([2, 2], 10, 100, Bm25Params())
    docs, _ = segment_topk_phrase([tp_a, [tp_b, tp_c]], w, k=10)
    assert docs.tolist() == [0, 1]


def test_regex_phrase_e2e(phrase_index):
    # "(quick|brown) (brown|shoes)" matches quick-brown and brown-shoes
    q = L.RegexPhraseQuery(("quick|brown", "brown|shoes"))
    out = phrase_index.search(q, k=10, mode="daat").collect()
    got = {r["conv_id"] for r in out}
    # quick brown: c0,c1,c3; brown shoes: c1; brown quick? no (2nd slot)
    assert got == {"c0", "c1", "c3"}
    # no expansions for an impossible slot
    qz = L.RegexPhraseQuery(("quick", "zzz.*"))
    assert phrase_index.search(qz, k=10, mode="daat").count() == 0


# ---------------------------------------------------------------------------
# Multi-term (3+) slop phrases: the carrying-slop-budget intersection
# (phrase_scorer.rs:232-345) and the reference's own fixtures.
# ---------------------------------------------------------------------------


def test_carrying_slop_intersect_fixtures():
    """Exact port of phrase_scorer.rs test_carry_slop_intersection
    (:650-705): fold lists left-to-right with update_left=True and check
    the surviving (slop, position) pairs and the final count."""
    from tantivy_spark.operators.kernel import _carrying_slop_intersect

    def run(lists, slop):
        left = list(lists[0])
        slops = [0] * len(left)
        count = 0
        for right in lists[1:]:
            count, left, slops = _carrying_slop_intersect(
                left, slops, list(right), slop, True
            )
        return count, list(zip(slops, left))

    assert run([[1], []], 1) == (0, [])
    assert run([[1], [2]], 1) == (1, [(1, 1), (1, 2)])
    assert run([[1], [3]], 1) == (0, [])
    # the order may still matter
    assert run([[1], [2], [2]], 1) == (1, [(1, 2)])
    assert run([[2], [1], [2]], 1) == (1, [(1, 2)])
    assert run([[2], [2], [1]], 1) == (1, [(1, 1), (1, 2)])
    assert run([[2], [2], [1], [2]], 1) == (1, [(1, 2)])
    assert run([[1], [2], [2], [2]], 1) == (1, [(1, 2)])
    assert run([[1], [2], [1]], 1) == (1, [(1, 1)])
    assert run([[11], [10, 12]], 1) == (1, [(1, 10), (1, 11), (1, 12)])
    assert run([[10, 12], [11]], 1) == (1, [(1, 10), (1, 11), (1, 12)])
    assert run([[5, 7, 11], [1, 5, 10, 12]], 1) == (
        2, [(0, 5), (1, 10), (1, 11), (1, 12)]
    )


def _texts_index(spark, tmp_root, name, texts):
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(len(texts))],
            "turn_idx": [0] * len(texts),
            "text": texts,
        }
    )
    src = spark.createDataFrame(pdf)
    cfg = IndexConfig(n_segments=1, n_term_buckets=2, positions=True)
    idx = f"{tmp_root}/{name}"
    build_index(spark, src, idx, cfg)
    return Searcher(spark, idx)


def _slop_hits(searcher, terms, slop):
    out = searcher.search(L.PhraseQuery(tuple(terms), slop=slop), k=10,
                          mode="daat").collect()
    # conv_id c{i} with single-segment build => doc order = i
    return sorted((int(r["conv_id"][1:]), r["score"]) for r in out)


def test_phrase_slop_3term(spark, tmp_root):
    # mod.rs test_phrase_slop (:238-256)
    s = _texts_index(spark, tmp_root, "slop3_a", ["a x b c"])
    assert len(_slop_hits(s, ["a", "b", "c"], 1)) == 1
    s = _texts_index(spark, tmp_root, "slop3_b", ["a x b x c"])
    assert len(_slop_hits(s, ["a", "b", "c"], 1)) == 0


def test_phrase_slop_bug2(spark, tmp_root):
    # mod.rs test_phrase_score_with_slop_bug_2 (:190-201)
    s = _texts_index(spark, tmp_root, "slopbug2_a", ["a x b x c", "a a c"])
    assert len(_slop_hits(s, ["a", "b", "c"], 2)) == 1
    s = _texts_index(spark, tmp_root, "slopbug2_b", ["a x b x c", "b c c"])
    assert len(_slop_hits(s, ["a", "b", "c"], 2)) == 1


def test_phrase_slop_repeating(spark, tmp_root):
    # mod.rs test_phrase_score_with_slop_repeating (:220-225)
    s = _texts_index(spark, tmp_root, "sloprep",
                     ["wendy subject subject captain", "Captain"])
    assert len(_slop_hits(s, ["wendy", "subject", "captain"], 1)) == 1


def test_phrase_slop_size_golden(spark, tmp_root):
    # mod.rs test_phrase_score_with_slop_size (:228-235): golden f32 scores
    s = _texts_index(spark, tmp_root, "slopsize",
                     ["a b e c", "a e e e c", "a e e e e c"])
    hits = _slop_hits(s, ["a", "c"], 3)
    assert [d for d, _ in hits] == [0, 1]
    assert hits[0][1] == pytest.approx(0.29086056, rel=1e-4)
    assert hits[1][1] == pytest.approx(0.26706287, rel=1e-4)


def test_phrase_slop_ordering_golden(spark, tmp_root):
    # mod.rs test_phrase_score_with_slop_ordering (:259-274): golden f32
    # scores indexed in doc order over the matching docs
    s = _texts_index(spark, tmp_root, "sloporder", [
        "a e b e c",
        "a e e e e e b e e e e c",
        "a c b",
        "a c e b e",
        "a e c b",
        "a e b c",
    ])
    hits = _slop_hits(s, ["a", "b", "c"], 3)
    scores = [sc for _, sc in hits]
    assert len(scores) >= 4
    assert scores[0] == pytest.approx(0.23091172, rel=1e-4)
    assert scores[1] == pytest.approx(0.27310878, rel=1e-4)
    assert scores[3] == pytest.approx(0.25024384, rel=1e-4)


# ---------------------------------------------------------------------------
# Mixed boolean: phrase clauses composing with term clauses on the f32
# DAAT kernel path (virtual-term ArrayPostings), vs the float64 tree oracle
# ---------------------------------------------------------------------------


def test_mixed_boolean_phrase_daat_vs_taat(phrase_index):
    q = L.BooleanQuery.new([
        (L.Occur.MUST, L.PhraseQuery(("quick", "brown"))),
        (L.Occur.SHOULD, L.TermQuery("fox")),
        (L.Occur.MUST_NOT, L.TermQuery("shoes")),
    ])
    daat = phrase_index.search(q, k=10, mode="daat").collect()
    taat = phrase_index.search(q, k=10, mode="taat64").collect()
    assert [r["conv_id"] for r in daat] == [r["conv_id"] for r in taat]
    for rd, rt in zip(daat, taat):
        assert rt["score"] == pytest.approx(rd["score"], rel=1e-6)
    got = {r["conv_id"] for r in daat}
    assert got == {"c0", "c3"}  # quick-brown docs minus c1 (shoes)
    # phrase contributes BM25 (not const): scores exceed term-only part
    assert all(r["score"] > 0 for r in daat)


def test_mixed_boolean_phrase_should(phrase_index):
    q = L.BooleanQuery.new([
        (L.Occur.SHOULD, L.BoostQuery(L.PhraseQuery(("quick", "brown")), 2.0)),
        (L.Occur.SHOULD, L.TermQuery("unrelated")),
    ])
    daat = phrase_index.search(q, k=10, mode="daat").collect()
    taat = phrase_index.search(q, k=10, mode="taat64").collect()
    d = {(r["conv_id"]): r["score"] for r in daat}
    t = {(r["conv_id"]): r["score"] for r in taat}
    assert set(d) == set(t) == {"c0", "c1", "c3", "c4"}
    for key in d:
        assert t[key] == pytest.approx(d[key], rel=1e-6)


def test_mixed_boolean_absent_phrase_term(phrase_index):
    # phrase with absent term: MUST -> empty; SHOULD -> term-only scoring
    q_must = L.BooleanQuery.new([
        (L.Occur.MUST, L.PhraseQuery(("quick", "zzz"))),
        (L.Occur.SHOULD, L.TermQuery("fox")),
    ])
    assert phrase_index.search(q_must, k=10, mode="daat").count() == 0
    q_should = L.BooleanQuery.new([
        (L.Occur.SHOULD, L.PhraseQuery(("quick", "zzz"))),
        (L.Occur.SHOULD, L.TermQuery("fox")),
    ])
    out = phrase_index.search(q_should, k=10, mode="daat").collect()
    assert {r["conv_id"] for r in out} == {"c0", "c3"}


def test_mixed_boolean_slop_phrase_clause(phrase_index):
    # slop phrase as a boolean clause rides the same kernel path
    q = L.BooleanQuery.new([
        (L.Occur.MUST, L.PhraseQuery(("quick", "brown"), slop=2)),
        (L.Occur.MUST_NOT, L.TermQuery("fox")),
    ])
    out = phrase_index.search(q, k=10, mode="daat").collect()
    got = {r["conv_id"] for r in out}
    # slop=2 matches c0,c1,c2,c3,c5; must_not fox drops c0,c3
    assert got == {"c1", "c2", "c5"}


def test_mixed_dismax_phrase_daat_vs_taat(phrase_index):
    q = L.DisjunctionMaxQuery(
        (L.PhraseQuery(("quick", "brown")), L.TermQuery("fox"),
         L.BoostQuery(L.TermQuery("shoes"), 2.0)),
        tie_breaker=0.3,
    )
    daat = phrase_index.search(q, k=10, mode="daat").collect()
    taat = phrase_index.search(q, k=10, mode="taat64").collect()
    d = {r["conv_id"]: r["score"] for r in daat}
    t = {r["conv_id"]: r["score"] for r in taat}
    assert set(d) == set(t)
    for key in d:
        assert t[key] == pytest.approx(d[key], rel=1e-6)
    assert {"c0", "c1", "c3"} <= set(d)

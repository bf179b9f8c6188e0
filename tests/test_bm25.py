"""Golden BM25 fixtures ported from the reference's unit tests
(src/query/bm25.rs:250-299, src/query/term_query/mod.rs:19-130).

The expected f32 constants are the reference's own assertions; matching them
validates analyzer parity + quantized-fieldnorm + f32 formula shape all at
once.
"""

import numpy as np
import pytest

from tantivy_spark.functions.analysis import tokenize_default
from tantivy_spark.functions.bm25 import Bm25Params, Bm25Weight, idf
from tantivy_spark.functions.fieldnorm import fieldnorm_to_id

F32 = np.float32


def nearly(a, b, rel=5e-4):
    return abs(float(a) - float(b)) <= rel * max(abs(float(a)), abs(float(b)), 1e-12)


def test_idf_ln2():
    # bm25.rs:256-260: idf(1, 2) == ln(2)
    assert nearly(idf(1, 2), np.log(F32(2.0)), rel=1e-6)


def test_idf_validates():
    with pytest.raises(ValueError):
        idf(3, 2)


def test_params_validation():
    with pytest.raises(ValueError, match="k1 must be non-negative"):
        Bm25Params(-1.0, 0.75)
    with pytest.raises(ValueError, match="b must be in"):
        Bm25Params(1.2, 1.5)


def test_custom_params_produce_different_scores():
    # bm25.rs:263-284
    w_default = Bm25Weight.for_one_term(10, 100, 50.0, Bm25Params())
    w_custom = Bm25Weight.for_one_term(10, 100, 50.0, Bm25Params(2.0, 0.3))
    s_d = w_default.score(np.array([10]), np.array([5]))[0]
    s_c = w_custom.score(np.array([10]), np.array([5]))[0]
    assert abs(s_d - s_c) > 1e-6


def test_golden_single_doc_string_field():
    # term_query/mod.rs:22-45: 1 doc "a" (raw tokenizer), score 0.28768212
    w = Bm25Weight.for_terms([1], total_num_docs=1, total_num_tokens=1)
    s = w.score(np.array([fieldnorm_to_id(1)]), np.array([1]))[0]
    assert nearly(s, 0.28768212, rel=1e-6)


GOLDEN_DOC0 = (
    "left1 left2 left2 left2f2 left2f2 left3 abcde abcde abcde abcde abcde "
    "abcde abcde abcde abcde abcewde abcde abcde"
)
GOLDEN_DOC1 = "left4 left1"


def _corpus_stats():
    toks0, _ = tokenize_default(GOLDEN_DOC0)
    toks1, _ = tokenize_default(GOLDEN_DOC1)
    assert len(toks0) == 18 and len(toks1) == 2
    return toks0, toks1


def test_golden_term_weight_left2():
    # term_query/mod.rs:101-108: top score 0.77802235
    toks0, toks1 = _corpus_stats()
    N, total = 2, len(toks0) + len(toks1)
    w = Bm25Weight.for_terms([1], N, total)
    tf = toks0.count("left2")
    s = w.score(np.array([fieldnorm_to_id(len(toks0))]), np.array([tf]))[0]
    assert nearly(s, 0.77802235, rel=1e-6)


def test_golden_term_weight_left1():
    # term_query/mod.rs:109-119: scores {0.27101856, 0.13736556}
    toks0, toks1 = _corpus_stats()
    N, total = 2, len(toks0) + len(toks1)
    w = Bm25Weight.for_terms([2], N, total)
    s = w.score(
        np.array([fieldnorm_to_id(len(toks0)), fieldnorm_to_id(len(toks1))]),
        np.array([1, 1]),
    )
    assert nearly(s[1], 0.27101856)
    assert nearly(s[0], 0.13736556)


def test_golden_combined_or_query():
    # term_query/mod.rs:120-129: "left2 left1" -> {0.9153879, 0.27101856}
    toks0, toks1 = _corpus_stats()
    N, total = 2, len(toks0) + len(toks1)
    w2 = Bm25Weight.for_terms([1], N, total)
    w1 = Bm25Weight.for_terms([2], N, total)
    fn0 = fieldnorm_to_id(len(toks0))
    s = F32(
        w2.score(np.array([fn0]), np.array([toks0.count("left2")]))[0]
        + w1.score(np.array([fn0]), np.array([1]))[0]
    )
    assert nearly(s, 0.9153879)


def test_boost():
    w = Bm25Weight.for_one_term(1, 2, 10.0)
    b = w.boost_by(2.0)
    s1 = w.score(np.array([5]), np.array([1]))[0]
    s2 = b.score(np.array([5]), np.array([1]))[0]
    assert nearly(s2, 2.0 * s1, rel=1e-6)


def test_max_score_formula():
    # max_score() = score(255, 2_013_265_944) (bm25.rs:208-210). Note: this
    # is tantivy's heuristic term bound, NOT a strict dominance bound under
    # down-quantized norms; our kernel prunes with per-block
    # (min norm, max tf) pairs instead, which ARE strict (see blocks.py).
    w = Bm25Weight.for_one_term(3, 10, 7.5)
    expected = w.score(np.array([255]), np.array([2_013_265_944]))[0]
    assert float(w.max_score()) == float(expected)


def test_boolean_golden_scores(spark, tmp_root):
    """Golden f32 fixtures from boolean_query/mod.rs test_boolean_score
    (:251-256) and test_intersection_score (:288-289)."""
    import pandas as pd

    from tantivy_spark.config import IndexConfig
    from tantivy_spark.operators.build import build_index
    from tantivy_spark.operators.search import Searcher
    from tantivy_spark.plans import logical as L

    def mk(name, texts):
        pdf = pd.DataFrame({
            "conv_id": [f"c{i}" for i in range(len(texts))],
            "turn_idx": [0] * len(texts),
            "text": texts,
        })
        idx = f"{tmp_root}/{name}"
        build_index(spark, spark.createDataFrame(pdf), idx,
                    IndexConfig(n_segments=1, n_term_buckets=2))
        return Searcher(spark, idx)

    s = mk("bool_golden", ["a b c", "a c", "b c"])
    q = L.BooleanQuery.new([
        (L.Occur.SHOULD, L.TermQuery("a")),
        (L.Occur.SHOULD, L.TermQuery("b")),
    ])
    hits = {r["conv_id"]: r["score"]
            for r in s.search(q, k=10, mode="daat").collect()}
    assert hits["c0"] == pytest.approx(0.84163445, rel=1e-4)
    boosted = {r["conv_id"]: r["score"]
               for r in s.search(L.BoostQuery(q, 2.0), k=10, mode="daat").collect()}
    assert boosted["c0"] == pytest.approx(1.6832689, rel=1e-4)

    s2 = mk("bool_golden_aux", ["a b c", "a c", "b c", "a b c d", "d"])
    q2 = L.BooleanQuery.new([
        (L.Occur.MUST, L.TermQuery("a")),
        (L.Occur.MUST, L.TermQuery("b")),
    ])
    out = s2.search(q2, k=10, mode="daat").collect()
    # matching docs in doc order: c0 ("a b c"), c3 ("a b c d")
    by_doc = {r["conv_id"]: r["score"] for r in out}
    assert by_doc["c0"] == pytest.approx(0.977973, rel=1e-4)
    assert by_doc["c3"] == pytest.approx(0.84699446, rel=1e-4)

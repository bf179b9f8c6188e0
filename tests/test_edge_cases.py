"""Edge-case robustness: empty/odd inputs through the full build+query path."""

import time

import pandas as pd
import pytest

from tantivy_spark.config import IndexConfig
from tantivy_spark.operators.build import build_index
from tantivy_spark.operators.search import Searcher
from tantivy_spark.plans import logical as L


def test_empty_and_null_texts(spark, tmp_root):
    pdf = pd.DataFrame(
        {
            "conv_id": ["a", "b", "c", "d"],
            "turn_idx": [0, 0, 0, 0],
            "text": ["real words here", "", None, "   !!! ..."],
        }
    )
    idx = f"{tmp_root}/edge_{time.time_ns()}"
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(n_segments=2, n_term_buckets=2))
    s = Searcher(spark, idx)
    assert s.total_docs == 4  # token-less docs still get doc ids
    assert s.count(L.TermQuery("real")) == 1
    # token-less docs have fieldnorm_id 0 and never match
    out = s.search(L.BooleanQuery.union(["words", "here"]), k=10, mode="daat").collect()
    assert {r["conv_id"] for r in out} == {"a"}
    # AllQuery sees all 4
    assert s.search(L.AllQuery(), k=10).count() == 4


def test_fieldnorm_saturation_long_doc(spark, tmp_root):
    # a ~3000-token doc: quantized dl decodes below the exact count, but
    # indexing and scoring stay finite and ordered
    long_text = " ".join(f"w{i % 50}" for i in range(3000))
    pdf = pd.DataFrame(
        {
            "conv_id": ["long", "short"],
            "turn_idx": [0, 0],
            "text": [long_text, "w1 w2"],
        }
    )
    idx = f"{tmp_root}/sat_{time.time_ns()}"
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(n_segments=1, n_term_buckets=2))
    s = Searcher(spark, idx)
    out = s.search(L.TermQuery("w1"), k=10, mode="daat").collect()
    assert len(out) == 2
    # tf~60 saturates the tf-factor: the long doc outranks despite the
    # length penalty; both scores finite and positive
    assert out[0]["conv_id"] == "long"
    assert all(0 < r["score"] < 10 for r in out)
    # and the f64 oracle path agrees on the ordering
    taat = s.search(L.TermQuery("w1"), k=10, mode="taat64").collect()
    assert [r["conv_id"] for r in taat] == [r["conv_id"] for r in out]
    from tantivy_spark.functions.fieldnorm import FIELD_NORMS_TABLE, fieldnorm_to_id
    import numpy as np
    fid = int(fieldnorm_to_id(np.array([3000]))[0])
    assert int(FIELD_NORMS_TABLE[fid]) <= 3000  # rounds DOWN (code.rs:7-11)


def test_single_doc_corpus(spark, tmp_root):
    pdf = pd.DataFrame({"conv_id": ["only"], "turn_idx": [0],
                        "text": ["lonely document"]})
    idx = f"{tmp_root}/single_{time.time_ns()}"
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(n_segments=4, n_term_buckets=4))
    s = Searcher(spark, idx)
    assert s.total_docs == 1
    out = s.search(L.TermQuery("lonely"), k=10, mode="daat").collect()
    assert len(out) == 1
    # idf(1,1) = ln(1 + 0.5/1.5) -> positive finite score
    assert 0 < out[0]["score"] < 1


def test_query_k_one(spark, tmp_root):
    pdf = pd.DataFrame(
        {"conv_id": [f"c{i}" for i in range(9)], "turn_idx": [0] * 9,
         "text": [f"shared unique{i}" for i in range(9)]}
    )
    idx = f"{tmp_root}/kone_{time.time_ns()}"
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(n_segments=3, n_term_buckets=2))
    s = Searcher(spark, idx)
    out = s.search(L.TermQuery("shared"), k=1, mode="daat").collect()
    assert len(out) == 1
    # all scores tie -> ascending (segment_ord, doc_id) picks seg 0 doc 0
    full = s.search(L.TermQuery("shared"), k=9, mode="daat",
                    fetch_keys=False).collect()
    assert (full[0]["segment_ord"], full[0]["doc_id"]) == \
        min((r["segment_ord"], r["doc_id"]) for r in full)

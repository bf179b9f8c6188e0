"""Query-scoped aggregations — distributed vs in-process parity.

The reference's aggregations run through the searcher
(`searcher.search(query, AggregationCollector)`,
src/aggregation/collector.rs:83-118): fast-field columns of the MATCHING
docs feed the collector.  Both engines expose that as
`aggregate(request, query)` — Searcher compiles to Catalyst
(aggregations.run_aggregation), ServingSearcher runs the pandas mirror
(agg_local.run_aggregation_pandas).  These tests pin the two engines to
each other across the request dialect: same columns, same ordering, same
null semantics, same values.
"""

import time

import numpy as np
import pandas as pd
import pytest

from tantivy_spark.config import IndexConfig
from tantivy_spark.operators.build import build_index
from tantivy_spark.operators.merge import delete_term
from tantivy_spark.operators.search import Searcher
from tantivy_spark.operators.serve import ServingSearcher
from tantivy_spark.plans import logical as L
from tantivy_spark.sources.transcripts import transcripts_pdf


@pytest.fixture(scope="module")
def built(spark, tmp_root):
    pdf = transcripts_pdf(220)
    idx = f"{tmp_root}/aggserve_{time.time_ns()}"
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(n_segments=5, n_term_buckets=4, positions=True))
    return idx


def _assert_frames_match(sdf: pd.DataFrame, pdf: pd.DataFrame,
                         sort_all: bool = False) -> None:
    assert list(sdf.columns) == list(pdf.columns)
    assert len(sdf) == len(pdf), f"{len(sdf)} vs {len(pdf)} rows"
    a, b = sdf.reset_index(drop=True), pdf.reset_index(drop=True)
    if sort_all:
        cols = list(a.columns)
        a = a.sort_values(cols, kind="stable").reset_index(drop=True)
        b = b.sort_values(cols, kind="stable").reset_index(drop=True)
    for c in a.columns:
        av, bv = a[c], b[c]
        if (pd.api.types.is_float_dtype(av) or
                pd.api.types.is_float_dtype(bv)):
            np.testing.assert_allclose(
                av.astype("float64").to_numpy(),
                bv.astype("float64").to_numpy(),
                rtol=1e-9, equal_nan=True, err_msg=f"column {c}")
        elif (pd.api.types.is_datetime64_any_dtype(av) or
              pd.api.types.is_datetime64_any_dtype(bv)):
            assert list(pd.to_datetime(av).astype("datetime64[us]")) == \
                list(pd.to_datetime(bv).astype("datetime64[us]")), \
                f"column {c}"
        else:
            la = [None if pd.isna(x) else x for x in av]
            lb = [None if pd.isna(x) else x for x in bv]
            assert la == lb, f"column {c}: {la[:6]} vs {lb[:6]}"


def _both(spark, idx, request, query=None, fields=None, sort_all=False,
          nonempty=True):
    d = Searcher(spark, idx).aggregate(
        request, query, fast_fields=fields).toPandas()
    s = ServingSearcher(idx).aggregate(request, query, fast_fields=fields)
    _assert_frames_match(d, s, sort_all=sort_all)
    if nonempty:
        assert len(d) > 0
    return d


REQUESTS = [
    # terms: default order, metric sub-aggs, query-scoped
    ({"terms": {"field": "role", "size": 10},
      "aggs": {"avg_tc": {"avg": {"field": "token_count"}},
               "sum_tc": {"sum": {"field": "token_count"}}}},
     L.TermQuery("w0")),
    # terms: missing bucket + order by key asc
    ({"terms": {"field": "tool", "size": 10, "missing": "(none)",
                "order": {"_key": "asc"}}}, None),
    # terms: order by a sub-metric, sum_other + error bound columns
    ({"terms": {"field": "role", "size": 2, "show_sum_other": True,
                "show_doc_count_error": True,
                "order": {"avg_tc": "desc"}},
      "aggs": {"avg_tc": {"avg": {"field": "token_count"}}}},
     L.BooleanQuery.union(["w1", "w2"])),
    # histogram with reference gap-fill + a stats sub-agg
    ({"histogram": {"field": "token_count", "interval": 7.0},
      "aggs": {"st": {"stats": {"field": "turn_idx"}}}},
     L.BooleanQuery.union(["w0", "w3", "w5"])),
    # histogram: offset + hard bounds + min_doc_count
    ({"histogram": {"field": "token_count", "interval": 10.0, "offset": 3.0,
                    "hard_bounds": {"min": 10.0, "max": 90.0},
                    "min_doc_count": 2}}, None),
    # date_histogram: reference fixed_interval ms grid
    ({"date_histogram": {"field": "ts", "fixed_interval": "3h"}}, None),
    # date_histogram: calendar extension
    ({"date_histogram": {"field": "ts", "calendar_interval": "day"},
      "aggs": {"users": {"cardinality": {"field": "conv_id",
                                         "exact": True}}}},
     L.TermQuery("w1")),
    # range buckets with extended_stats + exact percentiles sub-aggs
    ({"range": {"field": "token_count",
                "ranges": [{"key": "short", "to": 30},
                           {"key": "mid", "from": 30, "to": 80},
                           {"key": "long", "from": 80}]},
      "aggs": {"es": {"extended_stats": {"field": "turn_idx"}},
               "pct": {"percentiles": {"field": "token_count",
                                       "percents": [25.0, 50.0, 99.0]}}}},
     None),
    # filter bucket (the shared portable predicate; fields declared)
    ({"filter": {"condition": "token_count > 30",
                 "fields": ["token_count"]},
      "aggs": {"n": {"value_count": {"field": "token_count"}}}},
     L.TermQuery("w2")),
    # filter bucket: AST form + boolean structure + null-typed column
    # (tool is mostly null — not/in must DROP null rows on BOTH
    # engines, Spark's three-valued semantics); fields inferred from
    # the predicate, no declaration
    ({"filter": {"condition": ["and", ["gt", "token_count", 20],
                               ["not", ["in", "role", ["tool"]]]]},
      "aggs": {"n": {"value_count": {"field": "token_count"}},
               "a": {"avg": {"field": "token_count"}}}},
     None),
    ({"filter": {"condition":
                 "not tool == 'browser' or token_count <= 15"},
      "aggs": {"n": {"value_count": {"field": "token_count"}}}},
     None),
    # composite: typed sources, per-source order
    ({"composite": {"sources": [
        {"r": {"terms": {"field": "role", "order": "desc"}}},
        {"tc": {"histogram": {"field": "token_count", "interval": 25.0}}},
    ], "size": 8}}, None),
    # composite: missing_bucket source + keyset pagination
    ({"composite": {"sources": [
        {"t": {"terms": {"field": "tool", "missing_bucket": True}}},
    ], "size": 3, "after": ["browser"]}}, None),
    # missing bucket
    ({"missing": {"field": "tool"},
      "aggs": {"avg_tc": {"avg": {"field": "token_count"}}}}, None),
    # bucketless metric at the root
    ({"stats": {"field": "token_count"}}, L.TermQuery("w4")),
    # nested buckets: terms -> histogram with a metric
    ({"terms": {"field": "role", "size": 2},
      "aggs": {"by_tc": {"histogram": {"field": "token_count",
                                       "interval": 40.0},
                         "aggs": {"m": {"max": {"field": "turn_idx"}}}}}},
     None),
]


@pytest.mark.parametrize("ri", range(len(REQUESTS)))
def test_aggregate_parity(spark, built, ri):
    request, query = REQUESTS[ri]
    _both(spark, built, request, query)


def test_top_hits_parity(spark, built):
    req = {"top_hits": {"group_field": "role", "size": 2,
                        "sort_field": "token_count", "ascending": False,
                        "select": ["turn_idx", "conv_id"]}}
    # row order across groups is engine-internal — compare as sorted sets
    _both(spark, built, req, L.TermQuery("w0"), sort_all=True)


def test_top_hits_default_select_parity(spark, built):
    """No explicit select: both engines default to the request's own
    field set (request_fields order), not their internal frame shapes."""
    req = {"top_hits": {"group_field": "role", "size": 2,
                        "sort_field": "token_count"}}
    out = _both(spark, built, req, L.TermQuery("w0"), sort_all=True)
    assert list(out.columns) == ["role", "token_count"]


def test_distributed_shard_size_reads_shard_col(spark, built):
    """request_fields must include terms shard_col — the distributed
    engine is the one that supports the shard_size error protocol."""
    out = Searcher(spark, built).aggregate(
        {"terms": {"field": "role", "size": 2, "shard_size": 3,
                   "shard_col": "conv_id"}}, L.TermQuery("w0")).toPandas()
    assert len(out) > 0
    assert "key" in out.columns and "doc_count" in out.columns


def test_fixed_interval_max_buckets_parity(spark, built):
    """Both engines enforce max_buckets on fixed_interval
    date_histogram (the serving mirror always did; the distributed
    dispatcher used to drop it)."""
    from tantivy_spark.operators.aggregations import AggregationLimitError

    req = {"date_histogram": {"field": "ts", "fixed_interval": "1m",
                              "max_buckets": 5}}
    with pytest.raises(AggregationLimitError):
        Searcher(spark, built).aggregate(req).toPandas()
    with pytest.raises(AggregationLimitError):
        ServingSearcher(built).aggregate(req)


def test_fastfield_cache_evicts_fifo(built):
    """A column that no longer fits evicts the oldest-cached fields —
    early large columns must not pin the budget for the reader's life."""
    srv = ServingSearcher(built)
    v1, _ = srv._fastfield("token_count")
    srv.FASTFIELD_CACHE_VALUES = int(len(v1) * 1.5)
    srv._ff_cache.clear()
    srv._ff_granted = 0
    srv._fastfield("token_count")
    assert "token_count" in srv._ff_cache
    srv._fastfield("turn_idx")
    assert "turn_idx" in srv._ff_cache
    assert "token_count" not in srv._ff_cache
    assert srv._ff_granted == len(v1)
    # the evicted field is still served correctly (re-read, re-cached)
    v2, _ = srv._fastfield("token_count")
    assert v2.equals(v1)


def test_aggregate_respects_query_scope(spark, built):
    """Scoped doc_count == the engines' own count() for the same query."""
    q = L.BooleanQuery.union(["w0", "w7"])
    srv = ServingSearcher(built)
    out = srv.aggregate({"terms": {"field": "role", "size": 10}}, q)
    assert int(out["doc_count"].sum()) == srv.count(q) > 0
    full = srv.aggregate({"terms": {"field": "role", "size": 10}})
    assert int(full["doc_count"].sum()) == srv.count(L.AllQuery())


def test_aggregate_sees_deletes(spark, tmp_root):
    pdf = transcripts_pdf(80)
    idx = f"{tmp_root}/aggserve_del_{time.time_ns()}"
    build_index(spark, spark.createDataFrame(pdf), idx,
                IndexConfig(n_segments=3, n_term_buckets=4, positions=True))
    req = {"terms": {"field": "role", "size": 10}}
    before = _both(spark, idx, req)
    delete_term(spark, idx, "w0")
    after = _both(spark, idx, req)
    assert int(after["doc_count"].sum()) < int(before["doc_count"].sum())
    # distributed and serving agree post-delete by construction of _both


def test_serving_approx_sketches_answer_in_process(built):
    """Approximate metrics now run on serving-side mergeable sketches
    (HLL cardinality, DDSketch percentiles) with their documented error
    bounds instead of raising; only terms shard_size (the distributed
    shard-merge protocol) remains distributed-only."""
    srv = ServingSearcher(built)
    approx_c = srv.aggregate(
        {"terms": {"field": "role"},
         "aggs": {"c": {"cardinality": {"field": "conv_id"}}}})
    exact_c = srv.aggregate(
        {"terms": {"field": "role"},
         "aggs": {"c": {"cardinality": {"field": "conv_id",
                                        "exact": True}}}})
    assert list(approx_c.columns) == list(exact_c.columns)
    for est, ex in zip(approx_c["c"], exact_c["c"]):
        # rsd 0.023 -> 5-sigma bound (plus slack for tiny counts)
        assert abs(int(est) - int(ex)) <= max(5 * 0.023 * int(ex), 2)
    # deterministic (seeded hash, no randomness)
    again = srv.aggregate(
        {"terms": {"field": "role"},
         "aggs": {"c": {"cardinality": {"field": "conv_id"}}}})
    assert approx_c.equals(again)

    approx_p = srv.aggregate(
        {"terms": {"field": "role"},
         "aggs": {"p": {"percentiles": {"field": "token_count",
                                        "exact": False}}}})
    exact_p = srv.aggregate(
        {"terms": {"field": "role"},
         "aggs": {"p": {"percentiles": {"field": "token_count"}}}})
    assert list(approx_p.columns) == list(exact_p.columns)
    pcols = [c for c in approx_p.columns if c.startswith("p_p")]
    assert pcols
    # DDSketch guarantee is alpha=0.01 vs the RANK value; the exact
    # column interpolates between ranks, so allow one inter-rank gap
    # (token_count is integral -> gap <= 1) on top of the alpha band
    np.testing.assert_allclose(
        approx_p[pcols].to_numpy(dtype="float64"),
        exact_p[pcols].to_numpy(dtype="float64"), rtol=0.03, atol=1.0)

    with pytest.raises(NotImplementedError, match="shard_size"):
        srv.aggregate({"terms": {"field": "role", "shard_size": 5,
                                 "shard_col": "conv_id"}})


def test_serving_aggregate_empty_match_set(spark, built):
    srv = ServingSearcher(built)
    out = srv.aggregate({"terms": {"field": "role", "size": 10}},
                        L.TermQuery("zzz-absent-term"))
    assert list(out.columns) == ["key", "doc_count"]
    assert len(out) == 0


def test_serving_aggregate_warm_reads_nothing(built, monkeypatch):
    """After one aggregate, repeat aggregations over the same fields and
    terms touch no files — the fast-field cache is the mmap'd-column
    posture of the reference (src/fastfield)."""
    import pyarrow.parquet as pq

    srv = ServingSearcher(built)
    q = L.TermQuery("w0")
    req = {"terms": {"field": "role", "size": 10},
           "aggs": {"avg_tc": {"avg": {"field": "token_count"}}}}
    first = srv.aggregate(req, q)

    def boom(*a, **k):
        raise AssertionError("filesystem touched after warm aggregate")
    monkeypatch.setattr(pq, "read_table", boom)
    again = srv.aggregate(req, q)
    assert len(again) and again.equals(first)
    # a different query over the SAME fields is also read-free once its
    # postings are warm
    monkeypatch.undo()
    srv.search(L.TermQuery("w1"), 5)
    monkeypatch.setattr(pq, "read_table", boom)
    assert len(srv.aggregate(req, L.TermQuery("w1")))


def test_match_docs_count_consistency(spark, built):
    """_match_docs_by_segment is count()'s backend — spot-check against
    the distributed count for several query shapes."""
    d = Searcher(spark, built)
    s = ServingSearcher(built)
    for q in (L.TermQuery("w0"),
              L.BooleanQuery.union(["w1", "w5"]),
              L.BooleanQuery.intersection(["w0", "w2"]),
              L.PhraseQuery(("w0", "w1")),
              L.FuzzyTermQuery("w0", distance=1),
              L.AllQuery()):
        assert s.count(q) == d.count(q), repr(q)

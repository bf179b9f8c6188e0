"""ES-style aggregation compilation tests (reference: src/aggregation/)."""

import pandas as pd
import pytest

from pyspark.sql import functions as F
from tantivy_spark.operators import aggregations as A


@pytest.fixture(scope="module")
def events(spark):
    pdf = pd.DataFrame(
        {
            "etype": ["a", "a", "a", "b", "b", "c", "c", "c", "c", None],
            "val": [1.0, 2.0, 3.0, 10.0, 20.0, 5.0, 5.0, 7.0, 100.0, 4.0],
            "uid": [1, 1, 2, 3, 3, 4, 5, 6, 6, 7],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00", "2024-01-01 11:00", "2024-01-02 09:00",
                 "2024-01-02 10:00", "2024-01-03 00:00", "2024-01-03 12:00",
                 "2024-01-03 13:00", "2024-01-04 01:00", "2024-01-04 02:00",
                 "2024-01-04 03:00"]),
        }
    )
    return spark.createDataFrame(pdf)


def test_terms_order_and_size(events):
    out = A.run_aggregation(events, {"terms": {"field": "etype", "size": 2}}).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [("c", 4), ("a", 3)]


def test_terms_missing_bucket(events):
    out = A.run_aggregation(
        events, {"terms": {"field": "etype", "size": 10, "missing": "N/A"}}
    ).collect()
    assert ("N/A", 1) in [(r["key"], r["doc_count"]) for r in out]


def test_terms_with_sub_metrics(events):
    out = {r["key"]: r for r in A.run_aggregation(
        events,
        {"terms": {"field": "etype", "size": 10},
         "aggs": {"v": {"stats": {"field": "val"}}}},
    ).collect()}
    assert out["a"]["v_sum"] == 6.0 and out["a"]["v_avg"] == 2.0
    assert out["b"]["v_min"] == 10.0 and out["b"]["v_max"] == 20.0


def test_histogram(events):
    out = {r["key"]: r["doc_count"] for r in A.run_aggregation(
        events, {"histogram": {"field": "val", "interval": 10.0}}).collect()}
    # reference default min_doc_count=0: EMPTY buckets between the first
    # and last key are emitted (histogram.rs:60)
    expect = {k * 10.0: 0 for k in range(11)}
    expect.update({0.0: 7, 10.0: 1, 20.0: 1, 100.0: 1})
    assert out == expect


def test_histogram_min_doc_count_filters(events):
    out = {r["key"]: r["doc_count"] for r in A.run_aggregation(
        events, {"histogram": {"field": "val", "interval": 10.0,
                               "min_doc_count": 1}}).collect()}
    assert out == {0.0: 7, 10.0: 1, 20.0: 1, 100.0: 1}


def test_histogram_offset_and_bounds(events):
    out = {r["key"]: r["doc_count"] for r in A.run_aggregation(
        events, {"histogram": {"field": "val", "interval": 10.0,
                               "offset": 5.0, "min_doc_count": 1}}).collect()}
    # grid shifts to [5 + 10k, 5 + 10(k+1))
    assert set(out) <= {-5.0, 5.0, 15.0, 25.0, 95.0}
    # hard_bounds drops values whose bucket is outside
    out = {r["key"]: r["doc_count"] for r in A.run_aggregation(
        events, {"histogram": {"field": "val", "interval": 10.0,
                               "hard_bounds": {"min": 0.0, "max": 20.0},
                               "min_doc_count": 1}}).collect()}
    assert out == {0.0: 7, 10.0: 1, 20.0: 1}
    # extended_bounds widens the zero-filled grid
    out = {r["key"]: r["doc_count"] for r in A.run_aggregation(
        events, {"histogram": {"field": "val", "interval": 10.0,
                               "extended_bounds": {"min": -20.0,
                                                   "max": 120.0}}}).collect()}
    assert min(out) == -20.0 and max(out) == 120.0
    assert out[-20.0] == 0 and out[120.0] == 0 and out[0.0] == 7
    with pytest.raises(ValueError):
        A.run_aggregation(events, {"histogram": {
            "field": "val", "interval": 10.0, "min_doc_count": 1,
            "extended_bounds": {"min": 0.0, "max": 10.0}}})


def test_date_histogram_fixed_interval(events):
    out = A.run_aggregation(
        events, {"date_histogram": {"field": "ts", "fixed_interval": "1d"}}
    ).collect()
    # 1d fixed grid == day truncation for this UTC data set
    assert [r["doc_count"] for r in out] == [2, 2, 3, 3]
    assert all(r["key"].hour == 0 for r in out)
    with pytest.raises(ValueError):
        A.parse_fixed_interval_ms("1.5h")
    assert A.parse_fixed_interval_ms("90m") == 5_400_000


def test_date_histogram(events):
    out = A.run_aggregation(
        events, {"date_histogram": {"field": "ts", "calendar_interval": "day"}}
    ).collect()
    assert [r["doc_count"] for r in out] == [2, 2, 3, 3]


def test_range(events):
    out = {r["key"]: r["doc_count"] for r in A.run_aggregation(
        events, {"range": {"field": "val", "ranges": [
            {"key": "lo", "to": 5.0},
            {"key": "mid", "from": 5.0, "to": 20.0},
            {"key": "hi", "from": 20.0},
        ]}}).collect()}
    # half-open [from, to): 5.0 falls in mid, 20.0 in hi
    assert out == {"lo": 4, "mid": 4, "hi": 2}


def test_filter_bucket(events):
    r = A.run_aggregation(
        events,
        {"filter": {"condition": "val >= 10"},
         "aggs": {"m": {"max": {"field": "val"}}}},
    ).collect()[0]
    assert r["doc_count"] == 3 and r["m"] == 100.0


def test_composite_pagination(events):
    page1 = A.run_aggregation(
        events.fillna({"etype": "zz"}),
        {"composite": {"sources": ["etype", "uid"], "size": 3}}).collect()
    assert len(page1) == 3
    last = (page1[-1]["etype"], page1[-1]["uid"])
    page2 = A.run_aggregation(
        events.fillna({"etype": "zz"}),
        {"composite": {"sources": ["etype", "uid"], "size": 3,
                       "after": list(last)}}).collect()
    keys1 = [(r["etype"], r["uid"]) for r in page1]
    keys2 = [(r["etype"], r["uid"]) for r in page2]
    assert not set(keys1) & set(keys2)
    assert all(k > last for k in keys2)


def test_percentiles_exact(events):
    r = A.run_aggregation(
        events, {"terms": {"field": "etype", "size": 1},
                 "aggs": {"p": {"percentiles": {"field": "val",
                                                "percents": [50.0],
                                                "exact": True}}}}).collect()[0]
    assert r["key"] == "c" and r["p_p50_0"] == 6.0  # median of 5,5,7,100


def test_cardinality(events):
    r = A.run_aggregation(
        events, {"terms": {"field": "etype", "size": 10},
                 "aggs": {"u": {"cardinality": {"field": "uid", "exact": True}}}}
    ).collect()
    d = {x["key"]: x["u"] for x in r}
    assert d["a"] == 2 and d["b"] == 1 and d["c"] == 3


def test_top_hits(events):
    out = A.run_aggregation(
        events.fillna({"etype": "zz"}),
        {"top_hits": {"group_field": "etype", "size": 1, "sort_field": "val",
                      "select": ["etype", "uid", "val"]}}).collect()
    best = {r["etype"]: r["val"] for r in out}
    assert best["c"] == 100.0 and best["b"] == 20.0


def test_missing_agg(events):
    r = A.run_aggregation(events, {"missing": {"field": "etype"}}).collect()[0]
    assert r["doc_count"] == 1


def test_global_metric_root(events):
    r = A.run_aggregation(events, {"avg": {"field": "val"}}).collect()[0]
    assert r["avg"] == pytest.approx(15.7)


def test_nested_terms_in_date_histogram(events):
    out = A.run_aggregation(
        events.fillna({"etype": "zz"}),
        {"date_histogram": {"field": "ts", "calendar_interval": "day"},
         "aggs": {"by_type": {"terms": {"field": "etype"},
                              "aggs": {"v": {"avg": {"field": "val"}}}}}},
    ).collect()
    # (day, etype) pairs with doc_count + avg metric
    assert all(r["doc_count"] >= 1 for r in out)
    d1 = [r for r in out if str(r["key"]).startswith("2024-01-01")]
    assert {r["child_key"] for r in d1} == {"a"}
    assert d1[0]["doc_count"] == 2 and d1[0]["v"] == 1.5


def test_nested_terms_parent_size(events):
    out = A.run_aggregation(
        events.fillna({"etype": "zz"}),
        {"terms": {"field": "etype", "size": 2},
         "aggs": {"days": {"date_histogram": {"field": "ts",
                                              "calendar_interval": "day"}}}},
    ).collect()
    parents = {r["key"] for r in out}
    assert parents == {"c", "a"}  # top-2 parents by total doc_count


def test_percentiles_ddsketch_vs_exact(spark):
    """DDSketch percentiles honor the alpha relative-error guarantee vs the
    exact quantiles (metric/percentiles.rs 'Estimating Percentiles')."""
    import numpy as np

    from tantivy_spark.operators.aggregations import percentiles_ddsketch

    rng = np.random.default_rng(21)
    vals = rng.lognormal(3.0, 1.0, 20_000)
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    out = {
        r["percent"]: r["value"]
        for r in percentiles_ddsketch(df, "value",
                                      percents=(5.0, 50.0, 95.0)).collect()
    }
    sv = np.sort(vals)
    for p in (5.0, 50.0, 95.0):
        true = sv[int(p / 100.0 * (len(sv) - 1))]
        assert abs(out[p] - true) / true <= 0.03  # alpha=0.01 + bucket slack


# --------------------------------------------------------------------------
# terms shard_size / error bound / bucket limits (round 2)
# --------------------------------------------------------------------------

def test_terms_shard_size_error_bound(spark):
    import pandas as pd

    from tantivy_spark.operators import aggregations as A

    # shard 0 sees a:3 b:2 c:1; shard 1 sees b:3 c:2 a:1 — with
    # shard_size=2 shard 0 drops c (cut=2), shard 1 drops a (cut=2)
    rows = (
        [("a", 0)] * 3 + [("b", 0)] * 2 + [("c", 0)] * 1
        + [("b", 1)] * 3 + [("c", 1)] * 2 + [("a", 1)] * 1
    )
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["t", "shard"]))
    out = {r["key"]: r for r in A.terms_agg(
        df, "t", size=10, shard_size=2, shard_col="shard",
        show_doc_count_error=True,
    ).collect()}
    # a kept only by shard 0 -> count 3, error = shard 1's cut (2)
    assert out["a"]["doc_count"] == 3
    assert out["a"]["doc_count_error_upper_bound"] == 2
    # b kept by both -> exact, error 0
    assert out["b"]["doc_count"] == 5
    assert out["b"]["doc_count_error_upper_bound"] == 0
    # c kept only by shard 1 -> count 2, error = shard 0's cut (2)
    assert out["c"]["doc_count"] == 2
    assert out["c"]["doc_count_error_upper_bound"] == 2


def test_terms_exact_error_bound_zero(spark):
    import pandas as pd

    from tantivy_spark.operators import aggregations as A

    df = spark.createDataFrame(pd.DataFrame({"t": ["a", "a", "b"]}))
    out = A.terms_agg(df, "t", show_doc_count_error=True).collect()
    assert all(r["doc_count_error_upper_bound"] == 0 for r in out)


def test_bucket_limit_guard(spark):
    import pandas as pd
    import pytest as _pt

    from tantivy_spark.operators import aggregations as A

    df = spark.createDataFrame(
        pd.DataFrame({"t": [f"k{i}" for i in range(50)]})
    )
    with _pt.raises(A.AggregationLimitError):
        A.terms_agg(df, "t", max_buckets=10)
    # under the limit: fine
    assert len(A.terms_agg(df, "t", size=100, max_buckets=100).collect()) == 50


def test_terms_sum_other_doc_count(events):
    out = A.run_aggregation(
        events,
        {"terms": {"field": "etype", "size": 2,
                   "show_sum_other": True}},
    ).collect()
    assert len(out) == 2
    total = events.filter(F.col("etype").isNotNull()).count()
    covered = sum(r.doc_count for r in out)
    assert all(r.sum_other_doc_count == total - covered for r in out)


def test_terms_custom_order_and_min_doc_count(events):
    # order by a sub-metric (term_agg/mod.rs CustomOrder SubAggregation)
    out = A.run_aggregation(events, {
        "terms": {"field": "etype", "size": 10,
                  "order": {"avg_val": "desc"}},
        "aggs": {"avg_val": {"avg": {"field": "val"}}},
    }).collect()
    avgs = [r["avg_val"] for r in out]
    assert avgs == sorted(avgs, reverse=True)
    # order by key ascending
    out = A.run_aggregation(events, {
        "terms": {"field": "etype", "size": 10, "order": {"_key": "asc"}},
    }).collect()
    keys = [r["key"] for r in out if r["key"] is not None]
    assert keys == sorted(keys)
    # min_doc_count filters sparse buckets
    all_counts = {r["key"]: r["doc_count"] for r in A.run_aggregation(
        events, {"terms": {"field": "etype", "size": 10}}).collect()}
    floor_n = min(all_counts.values()) + 1
    filtered = A.run_aggregation(events, {
        "terms": {"field": "etype", "size": 10,
                  "min_doc_count": floor_n}}).collect()
    assert all(r["doc_count"] >= floor_n for r in filtered)
    assert len(filtered) < len(all_counts)


def test_composite_typed_sources(events):
    # date_histogram + terms sources with per-source order and keyset
    # pagination (bucket/composite/mod.rs:50-145)
    req = {"composite": {
        "sources": [
            {"day": {"date_histogram": {"field": "ts",
                                        "calendar_interval": "day"}}},
            {"etype": {"terms": {"field": "etype", "order": "desc",
                                 "missing_bucket": False}}},
        ], "size": 3}}
    page1 = A.run_aggregation(events, req).collect()
    assert len(page1) == 3
    assert all(r["etype"] is not None for r in page1)  # missing dropped
    days = [r["day"] for r in page1]
    assert days == sorted(days)
    # within a day, terms descend
    last = page1[-1]
    req2 = {"composite": {**req["composite"],
                          "after": (last["day"], last["etype"])}}
    page2 = A.run_aggregation(events, req2).collect()
    assert page2 and (page2[0]["day"], page2[0]["etype"]) != \
        (last["day"], last["etype"])
    # histogram source buckets on the interval grid
    out = A.run_aggregation(events, {"composite": {
        "sources": [{"bucket": {"histogram": {"field": "val",
                                              "interval": 10.0}}}],
        "size": 100}}).collect()
    assert all(float(r["bucket"]) % 10.0 == 0.0 for r in out)

"""Space-usage reporting tests (src/space_usage/mod.rs analogue)."""


# ---------------------------------------------------------------------------
# space usage (src/space_usage/mod.rs)
# ---------------------------------------------------------------------------

def test_space_usage_components(spark, tmp_path):
    from tantivy_spark.config import IndexConfig
    from tantivy_spark.operators.build import build_index
    from tantivy_spark.operators.search import Searcher

    rows = [(f"d{i}", f"alpha beta gamma doc{i} " * 5, i)
            for i in range(40)]
    src = spark.createDataFrame(rows, "k string, text string, v int")
    idx = str(tmp_path / "su_idx")
    cfg = IndexConfig(text_col="text", key_cols=("k",),
                      segment_col="k", n_segments=4,
                      n_term_buckets=4, positions=True)
    # repartition(4): the default build makes one segment per input
    # partition; these tests assert exact segment counts
    build_index(spark, src.repartition(4), idx, cfg)
    usage = Searcher(spark, idx).space_usage()

    assert len(usage["segments"]) == 4
    assert sum(s["num_docs"] for s in usage["segments"]) == 40
    for comp in ("postings", "positions", "fieldnorms", "termdict",
                 "store", "fast_fields"):
        assert usage[comp] > 0, comp
        assert usage[comp] == sum(s[comp] for s in usage["segments"])
    # the int fast-field column is reported per field
    assert "v" in usage["segments"][0]["per_fast_field"]
    assert usage["deletes"] == 0
    assert usage["total"] == sum(s["total"] for s in usage["segments"])


def test_space_usage_no_positions_and_deletes(spark, tmp_path):
    from tantivy_spark.config import IndexConfig
    from tantivy_spark.operators.build import build_index
    from tantivy_spark.operators.merge import delete_term
    from tantivy_spark.operators.search import Searcher

    rows = [(f"d{i}", f"alpha beta doc{i}") for i in range(20)]
    src = spark.createDataFrame(rows, "k string, text string")
    idx = str(tmp_path / "su_idx2")
    cfg = IndexConfig(text_col="text", key_cols=("k",),
                      segment_col="k", n_segments=2,
                      n_term_buckets=2, positions=False)
    # repartition(4): the default build makes one segment per input
    # partition; these tests assert exact segment counts
    build_index(spark, src.repartition(4), idx, cfg)
    usage = Searcher(spark, idx).space_usage()
    # positions=False leaves only the null column-chunk headers (the
    # schema keeps pos_enc/pos_off for uniformity) — no encoded data
    assert usage["positions"] < 1024
    assert usage["positions"] < usage["postings"]

    delete_term(spark, idx, "alpha")
    usage2 = Searcher(spark, idx).space_usage()
    assert usage2["deletes"] > 0
    assert usage2["total"] == usage["total"] + usage2["deletes"]

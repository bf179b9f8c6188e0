"""E2E correctness protocol (FIXTURES.md §4): determinism across
parallelism, checkpoint/resume, partition pruning in the physical plan."""

import os
import time

import pytest
from pyspark.sql import functions as F

from tantivy_spark.config import IndexConfig
from tantivy_spark.operators.build import build_index, load_manifest
from tantivy_spark.operators.search import Searcher
from tantivy_spark.plans import logical as L
from tantivy_spark.sources.transcripts import transcripts_df


# explicit "hash": the cross-partitioning identity this file pins only
# holds for content-hashed segment assignment (the default now resolves
# to the fused "input" mode, whose layout follows the input partitioning
# by design — covered by tests/test_fused_input.py)
CFG = IndexConfig(n_segments=4, n_term_buckets=4,
                  segment_assignment="hash")


def _postings_fingerprint(spark, idx):
    """Order-insensitive content hash of the postings table."""
    df = spark.read.parquet(os.path.join(idx, "postings"))
    row = (
        df.select(
            F.sum(F.crc32(F.concat_ws("|", "term", "segment_ord", "doc_freq",
                                      F.hex("doc_enc"), F.hex("tf_enc"),
                                      F.hex("fnorm_enc")))).alias("h"),
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_freq").alias("df"),
        ).collect()[0]
    )
    return (int(row["h"]), int(row["n"]), int(row["df"]))


def _docmap_fingerprint(spark, idx):
    df = spark.read.parquet(os.path.join(idx, "docmap"))
    row = df.select(
        F.sum(F.crc32(F.concat_ws("|", "conv_id", "turn_idx", "segment_ord",
                                  "doc_id", "fieldnorm_id"))).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return (int(row["h"]), int(row["n"]))


def test_build_identical_across_parallelism(spark, tmp_root):
    """Same corpus at different generator/shuffle partitioning -> identical
    docmap and postings content (the determinism invariant that makes
    rank-identical scoring well-defined on any cluster size)."""
    src_a = transcripts_df(spark, 120, partitions=3)
    src_b = transcripts_df(spark, 120, partitions=13)
    ia = f"{tmp_root}/det_a_{time.time_ns()}"
    ib = f"{tmp_root}/det_b_{time.time_ns()}"
    build_index(spark, src_a, ia, CFG)
    build_index(spark, src_b, ib, CFG)
    assert _docmap_fingerprint(spark, ia) == _docmap_fingerprint(spark, ib)
    assert _postings_fingerprint(spark, ia) == _postings_fingerprint(spark, ib)
    ma, mb = load_manifest(ia), load_manifest(ib)
    assert ma["segments"] == mb["segments"]
    # and identical top-k on both (f32-exact)
    sa, sb = Searcher(spark, ia), Searcher(spark, ib)
    q = L.BooleanQuery.union(["w0", "w5", "w100"])
    ra = [(r["conv_id"], r["turn_idx"], r["score"])
          for r in sa.search(q, k=10, mode="daat").collect()]
    rb = [(r["conv_id"], r["turn_idx"], r["score"])
          for r in sb.search(q, k=10, mode="daat").collect()]
    assert ra == rb


def test_resume_skips_completed_stages_and_is_identical(spark, tmp_root):
    """Stage markers make the build resumable; a resumed build leaves
    byte-identical content and records per-segment lineage metrics."""
    src = transcripts_df(spark, 80, partitions=4)
    idx = f"{tmp_root}/resume_{time.time_ns()}"
    build_index(spark, src, idx, CFG)
    fp_before = _postings_fingerprint(spark, idx)
    manifest = load_manifest(idx)

    # lineage/metrics per segment present (docs tokenized, tokens, postings)
    for seg in manifest["segments"]:
        assert seg["n_docs"] > 0 and seg["n_tokens"] > 0
        assert seg["n_terms"] > 0 and seg["n_postings"] > 0

    def _tree_mtimes(sub):
        out = {}
        for root, _, files in os.walk(os.path.join(idx, sub)):
            for f in files:
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
        return out

    # simulate a crash after stage 1: drop the postings marker + manifest
    dm_before = _tree_mtimes("docmap")
    os.remove(os.path.join(idx, "_done_postings"))
    os.remove(os.path.join(idx, "manifest.json"))
    build_index(spark, src, idx, CFG, resume=True)
    assert _postings_fingerprint(spark, idx) == fp_before
    assert _tree_mtimes("docmap") == dm_before  # stage 1 was skipped

    # full resume (everything done) rebuilds only the manifest
    pm_before = _tree_mtimes("postings")
    m = build_index(spark, src, idx, CFG, resume=True)
    assert m["total_docs"] == manifest["total_docs"]
    assert _tree_mtimes("docmap") == dm_before      # skipped
    assert _tree_mtimes("postings") == pm_before    # skipped


def test_query_scan_is_partition_pruned(spark, tmp_root):
    """The pruned postings scan must push the tbucket filter into parquet
    partition pruning and the term filter into data filters — the explain
    output is the evidence (the term-dict FST role of the layout)."""
    src = transcripts_df(spark, 60, partitions=4)
    idx = f"{tmp_root}/prune_{time.time_ns()}"
    build_index(spark, src, idx, CFG)
    s = Searcher(spark, idx)
    plan = s.pruned_postings(["w0"])._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tbucket" in plan
    assert "PushedFilters" in plan or "term" in plan
    # only 1 of 4 tbucket directories scanned
    import re

    m = re.search(r"tbucket.*?IN \(([^)]*)\)|tbucket#\d+\s*=\s*(\d+)", plan)
    assert m is not None


def test_stable_turn_order_invariant(spark, tmp_root):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering —
    the north-rule per-row invariant: doc ids follow the stable sort."""
    src = transcripts_df(spark, 50, partitions=5)
    idx = f"{tmp_root}/order_{time.time_ns()}"
    build_index(spark, src, idx, CFG)
    dm = (
        spark.read.parquet(os.path.join(idx, "docmap"))
        .select("segment_ord", "doc_id", "conv_id", "turn_idx")
        .collect()
    )
    by_seg: dict[int, list] = {}
    for r in dm:
        by_seg.setdefault(r["segment_ord"], []).append(
            (r["doc_id"], r["conv_id"], r["turn_idx"])
        )
    for seg, rows in by_seg.items():
        rows.sort()
        ids = [r[0] for r in rows]
        assert ids == list(range(len(rows)))  # dense, 0-based
        keys = [(r[1], r[2]) for r in rows]
        assert keys == sorted(keys)  # doc id order == stable key order


def test_sort_by_field_index_sorting(spark, tmp_root):
    """IndexSettings::sort_by_field (index_meta.rs:288-398): docs within
    each segment are ordered by the fast field, and search results are
    identical to the unsorted index (sorting only permutes doc ids)."""
    src = transcripts_df(spark, 100, partitions=3).withColumn(
        "n_chars", F.length("text"))
    iu = f"{tmp_root}/sortfield_u_{time.time_ns()}"
    ids = f"{tmp_root}/sortfield_d_{time.time_ns()}"
    build_index(spark, src, iu, CFG)
    build_index(
        spark, src, ids,
        IndexConfig(n_segments=4, n_term_buckets=4,
                    sort_by_field=("n_chars", "desc")))

    dm = spark.read.parquet(os.path.join(ids, "docmap"))
    rows = dm.select("segment_ord", "doc_id", "n_chars").collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r.segment_ord, []).append((r.doc_id, r.n_chars))
    for seg, pairs in by_seg.items():
        pairs.sort()
        vals = [v for _, v in pairs]
        assert vals == sorted(vals, reverse=True), f"segment {seg} unsorted"

    # same corpus, same scores — only the doc-id permutation changes
    su, sd = Searcher(spark, iu), Searcher(spark, ids)
    q = L.BooleanQuery.union(["the", "a", "spark"])
    ru = {(r.conv_id, r.turn_idx): round(r.score, 4)
          for r in su.search(q, k=10000).collect()}
    rd = {(r.conv_id, r.turn_idx): round(r.score, 4)
          for r in sd.search(q, k=10000).collect()}
    assert ru == rd

    # the setting round-trips through the manifest (config json)
    import json as _json

    m = load_manifest(ids)
    assert tuple(m["config"]["sort_by_field"]) == ("n_chars", "desc")
    cfg_rt = IndexConfig.from_json(_json.dumps(m["config"]))
    assert cfg_rt.sort_by_field == ("n_chars", "desc")


def test_ip_fast_field_range(spark, tmp_root):
    """IpAddr fast field (field_type.rs:177-201): IPs normalize to
    32-hex u128 strings (IPv4 via the v6-mapped block) and RangeQuery
    serves numeric-order ranges over them, v4 and v6 mixed."""
    from tantivy_spark.functions.ip import ip_hex_col, ip_range, ip_to_u128_hex

    # v4 maps into ::ffff:0:0/96 — ordering interleaves correctly
    assert ip_to_u128_hex("10.0.0.1") == ip_to_u128_hex("::ffff:10.0.0.1")
    assert ip_to_u128_hex("10.0.0.2") > ip_to_u128_hex("10.0.0.1")
    assert ip_to_u128_hex("2001:db8::1") > ip_to_u128_hex("255.255.255.255")

    src = transcripts_df(spark, 60, partitions=2).withColumn(
        "ip",
        ip_hex_col(
            F.when(F.col("turn_idx") % 7 == 0,
                   F.concat(F.lit("2001:db8::"),
                            F.conv(F.col("turn_idx").cast("string"), 10, 16)))
            .otherwise(F.concat_ws(".", F.lit("10"), F.lit("0"),
                                   (F.col("turn_idx") % 4).cast("string"),
                                   (F.col("turn_idx") % 250).cast("string")))
        ))
    idx = f"{tmp_root}/ipidx_{time.time_ns()}"
    build_index(spark, src, idx, CFG)
    sr = Searcher(spark, idx)

    got = sr.search(
        ip_range("ip", "10.0.2.0", "10.0.3.255"), k=100000)
    got_keys = {(r.conv_id, r.turn_idx) for r in got.collect()}
    exp_keys = {
        (r.conv_id, r.turn_idx)
        for r in src.collect()
        if ip_to_u128_hex("10.0.2.0") <= r.ip <= ip_to_u128_hex("10.0.3.255")
    }
    assert got_keys == exp_keys and got_keys
    # v6 upper range catches only the v6 docs
    v6 = sr.search(ip_range("ip", "2001:db8::", "2001:db8::ffff"), k=100000)
    v6_keys = {(r.conv_id, r.turn_idx) for r in v6.collect()}
    assert v6_keys == {(r.conv_id, r.turn_idx) for r in src.collect()
                      if r.turn_idx % 7 == 0}
    assert v6_keys


def test_pretokenized_field(spark, tmp_root):
    """PreTokStr ingestion (tokenized_string.rs): an array<string> source
    column bypasses the analyzer; tokens index verbatim (no lowercasing,
    no length filter) with sequential positions."""
    src = transcripts_df(spark, 40, partitions=2).withColumn(
        "toks", F.split(F.upper(F.col("text")), "[^A-Z0-9]+")
    ).withColumn(
        "toks", F.filter(F.col("toks"), lambda t: t != "")
    ).drop("text").withColumnRenamed("toks", "text")
    idx = f"{tmp_root}/pretok_{time.time_ns()}"
    cfg = IndexConfig(n_segments=2, n_term_buckets=4, positions=True,
                      tokenizer="pretokenized")
    build_index(spark, src, idx, cfg)
    sr = Searcher(spark, idx)
    # tokens were NOT lowercased — the verbatim uppercase term matches
    hits = sr.search(L.TermQuery("W0"), k=10000).collect()
    assert hits
    assert sr.count(L.TermQuery("w0")) == 0
    # phrase over pretokenized sequential positions: take two adjacent
    # tokens from a known doc and find that doc by phrase
    row = src.filter(F.size("text") >= 2).select("conv_id", "turn_idx",
                                                 "text").first()
    pair = (row.text[0], row.text[1])
    ph = sr.search(L.PhraseQuery(pair), k=10000, mode="daat").collect()
    assert (row.conv_id, row.turn_idx) in {(r.conv_id, r.turn_idx) for r in ph}


def test_segment_plugin_component(spark, tmp_root):
    """SegmentPlugin extension surface (segment_component.rs:31-33): a
    named callable writes an extra per-segment table at build time; the
    Searcher reads it back live-segment-filtered."""
    src = transcripts_df(spark, 30, partitions=2)
    idx = f"{tmp_root}/plugin_{time.time_ns()}"

    def tok_stats(docmap):
        return docmap.groupBy("segment_ord").agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("token_count").alias("tokens"),
        )

    m = build_index(spark, src, idx, CFG, plugins={"tok_stats": tok_stats})
    assert m["plugins"] == ["tok_stats"]
    sr = Searcher(spark, idx)
    rows = sr.plugin("tok_stats").collect()
    assert {r.segment_ord for r in rows} == set(range(4)) - (
        set(range(4)) - {r.segment_ord for r in rows})
    assert sum(r.docs for r in rows) == m["total_docs"]
    with pytest.raises(KeyError):
        sr.plugin("nope")
    # resumed build skips the plugin stage (marker present)
    m2 = build_index(spark, src, idx, CFG, resume=True,
                     plugins={"tok_stats": tok_stats})
    assert "plugin_tok_stats" not in m2["stage_seconds"]


def test_record_basic_docs_only(spark, tmp_root):
    """IndexRecordOption::Basic (index_record_option.rs:15-27): postings
    record docs only — every tf is 1 (the tf-1 stream bitpacks to zero
    width), sum_tf == doc_freq, and scoring sees tf=1 even for docs that
    repeat a term."""
    from tantivy_spark.operators import blocks

    src = transcripts_df(spark, 40, partitions=2).withColumn(
        "text", F.concat_ws(" ", "text", "text"))  # force tf >= 2 everywhere
    basic_idx = f"{tmp_root}/basic_{time.time_ns()}"
    freq_idx = f"{tmp_root}/freqs_{time.time_ns()}"
    build_index(spark, src, basic_idx,
                IndexConfig(n_segments=4, n_term_buckets=4, record="basic"))
    build_index(spark, src, freq_idx, CFG)

    pb = spark.read.parquet(os.path.join(basic_idx, "postings"))
    row = pb.select(
        F.max("max_tf").alias("mx"),
        F.sum(F.when(F.col("sum_tf") != F.col("doc_freq"), 1)
              .otherwise(0)).alias("bad")).collect()[0]
    assert row.mx == 1 and row.bad == 0
    # decoded tf streams are all ones
    some = pb.limit(20).collect()
    import numpy as np
    for r in some:
        _, tfs, _ = blocks.decode_postings(
            bytes(r.doc_enc), bytes(r.tf_enc),
            np.asarray(r.block_doc_off), np.asarray(r.block_tf_off),
            np.asarray(r.block_last), int(r.doc_freq))
        assert (tfs == 1).all()

    # same doc sets as the freqs index, different scores (tf clamped)
    sb = Searcher(spark, basic_idx)
    sf_ = Searcher(spark, freq_idx)
    top_term = (
        spark.read.parquet(os.path.join(freq_idx, "postings"))
        .groupBy("term").agg(F.sum("doc_freq").alias("df"))
        .orderBy(F.desc("df")).first().term)
    q = L.TermQuery(top_term)
    kb = {(r.conv_id, r.turn_idx) for r in sb.search(q, 1000).collect()}
    kf = {(r.conv_id, r.turn_idx) for r in sf_.search(q, 1000).collect()}
    assert kb == kf and kb

    # positions are refused with basic (WithFreqsAndPositions only)
    with pytest.raises(ValueError):
        build_index(spark, src, f"{tmp_root}/bp_{time.time_ns()}",
                    IndexConfig(record="basic", positions=True))


def test_date_precision_truncation(spark, tmp_root):
    """DateOptions truncation (date_time_options.rs DateTimePrecision):
    timestamp fast fields are truncated at index time, so range bounds
    compare against truncated values."""
    src = transcripts_df(spark, 30, partitions=2).withColumn(
        "ts", F.timestamp_micros(
            F.unix_micros("ts") + (F.col("turn_idx") % 997) * 1001 + 1))
    idx = f"{tmp_root}/dsec_{time.time_ns()}"
    build_index(spark, src, idx,
                IndexConfig(n_segments=2, n_term_buckets=4,
                            date_precision="seconds"))
    dm = spark.read.parquet(os.path.join(idx, "docmap"))
    sub = dm.filter(F.col("ts") != F.date_trunc("second", F.col("ts")))
    assert sub.count() == 0
    # source had sub-second components to truncate
    raw = src.filter(F.col("ts") != F.date_trunc("second", F.col("ts")))
    assert raw.count() > 0

    idx_ms = f"{tmp_root}/dms_{time.time_ns()}"
    build_index(spark, src, idx_ms,
                IndexConfig(n_segments=2, n_term_buckets=4,
                            date_precision="milliseconds"))
    dm_ms = spark.read.parquet(os.path.join(idx_ms, "docmap"))
    bad_ms = dm_ms.filter(F.unix_micros("ts") % 1000 != 0)
    assert bad_ms.count() == 0

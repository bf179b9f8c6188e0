"""Direct-IO hash-assigned build (`build_fused_hash_files`): the
content-deterministic segment layout of the Catalyst hash mode through
the file-based re-bucketing shuffle.

Pins, in order of load-bearing-ness:
  * `functions/xxhash64.py` == Spark's `F.xxhash64` (seed 42) over
    fuzzed strings (all length classes incl. the >=32-byte stripe
    path, multi-byte UTF-8) and integral columns;
  * layout identity: doc→segment mapping AND within-segment doc ids
    equal to `build_index(segment_assignment="hash")`, and query
    scores f32-identical;
  * cross-parallelism determinism: tiny splits vs one split produce
    byte-identical docmap/postings/terms CONTENT (the property hash
    mode exists for — same index at any cluster size);
  * per-split/per-segment resume markers.
"""

import glob
import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from tantivy_spark.config import IndexConfig
from tantivy_spark.functions.xxhash64 import (spark_pmod_segments,
                                              spark_xxhash64_array,
                                              xxh64_fixed)
from tantivy_spark.operators.build import build_index, build_index_direct
from tantivy_spark.operators.search import Searcher
from tantivy_spark.plans import logical as L
from tantivy_spark.sources.transcripts import transcripts_df


def test_xxhash64_matches_spark_strings(spark):
    import pyarrow as pa

    rng = np.random.default_rng(7)
    vals = []
    for L_ in [0, 1, 2, 3, 4, 5, 7, 8, 9, 12, 15, 16, 17, 31, 32, 33,
               40, 63, 64, 65, 100]:
        for _ in range(8):
            vals.append("".join(
                chr(int(c)) for c in rng.integers(33, 127, size=L_)))
    vals += ["conv00000042", "héllo wörld", "東京タワー", "naïve",
             "a" * 200, "Ωμέγα" * 20]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    want = [r["h"] for r in
            df.select(F.xxhash64("s").alias("h")).collect()]
    got = spark_xxhash64_array(pa.array(vals))
    assert [int(x) for x in got] == want


def test_xxhash64_matches_spark_longs(spark):
    import pyarrow as pa

    vals = [0, 1, -1, 42, 2**31, -(2**31) - 7, 2**62, -(2**63),
            2**63 - 1, 123456789012345]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    want = [r["h"] for r in
            df.select(F.xxhash64("v").alias("h")).collect()]
    got = spark_xxhash64_array(pa.array(vals, type=pa.int64()))
    assert [int(x) for x in got] == want
    # int32 columns take Spark's 4-byte hashInt path, not hashLong —
    # which is why spark_xxhash64_array splits on bit_width > 32
    df32 = spark.createDataFrame([(v,) for v in range(-5, 6)], "v int")
    want32 = [r["h"] for r in
              df32.select(F.xxhash64("v").alias("h")).collect()]
    got32 = spark_xxhash64_array(pa.array(range(-5, 6), type=pa.int32()))
    assert [int(x) for x in got32] == want32


def test_pmod_matches_spark(spark):
    import pyarrow as pa

    vals = [f"conv{i:08d}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    want = [r["m"] for r in df.select(
        F.pmod(F.xxhash64("s"), F.lit(7)).cast("int").alias("m")
    ).collect()]
    got = spark_pmod_segments(pa.array(vals), 7)
    assert [int(x) for x in got] == want
    assert min(want) >= 0


CFG = dict(n_segments=5, n_term_buckets=4, positions=True,
           segment_assignment="hash")


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hd"))
    src = transcripts_df(spark, 150, partitions=5)
    src_path = os.path.join(root, "src")
    src.write.parquet(src_path)

    idx_df = os.path.join(root, "idx_df")
    m_df = build_index(spark, spark.read.parquet(src_path), idx_df,
                       IndexConfig(**CFG))
    idx_direct = os.path.join(root, "idx_direct")
    m_direct = build_index_direct(spark, src_path, idx_direct,
                                  IndexConfig(**CFG))
    return root, src_path, idx_df, m_df, idx_direct, m_direct


def test_layout_identical_to_catalyst_hash(spark, built):
    root, src_path, idx_df, m_df, idx_direct, m_direct = built
    assert m_direct["total_docs"] == m_df["total_docs"]
    assert m_direct["total_tokens"] == m_df["total_tokens"]

    def layout(idx):
        rows = (spark.read.parquet(os.path.join(idx, "docmap"))
                .select("conv_id", "turn_idx", "segment_ord", "doc_id")
                .collect())
        return {(r["conv_id"], r["turn_idx"]):
                (r["segment_ord"], r["doc_id"]) for r in rows}

    assert layout(idx_direct) == layout(idx_df)


def test_scores_identical_to_catalyst_hash(spark, built):
    root, src_path, idx_df, m_df, idx_direct, m_direct = built
    s1, s2 = Searcher(spark, idx_df), Searcher(spark, idx_direct)
    for q in (L.TermQuery("w3"),
              L.BooleanQuery.union(["w1", "w7", "w19"]),
              L.PhraseQuery(["w0", "w1"])):
        r1 = [(r["conv_id"], int(r["turn_idx"]), float(r["score"]))
              for r in s1.search(q, k=20, mode="daat").collect()]
        r2 = [(r["conv_id"], int(r["turn_idx"]), float(r["score"]))
              for r in s2.search(q, k=20, mode="daat").collect()]
        assert r1 == r2  # identical layout -> identical tie-breaks too


def test_cross_parallelism_bit_identity(spark, built):
    """Many tiny splits vs one big split: identical index CONTENT —
    the reproducibility property hash assignment exists for."""
    root, src_path, *_ = built

    def content(idx):
        out = []
        for tbl in ("docmap", "postings", "terms"):
            df = spark.read.parquet(os.path.join(idx, tbl))
            rows = df.collect()
            out.append(sorted(
                tuple(str(v) for v in r) for r in rows))
        return out

    idx_a = os.path.join(root, "idx_tiny_splits")
    idx_b = os.path.join(root, "idx_one_split")
    build_index_direct(spark, src_path, idx_a, IndexConfig(**CFG),
                       split_bytes=64 << 10)      # many splits
    build_index_direct(spark, src_path, idx_b, IndexConfig(**CFG),
                       split_bytes=1 << 30)       # one split per file
    ca, cb = content(idx_a), content(idx_b)
    assert ca == cb


def test_empty_segments_skipped(spark, tmp_path):
    src = transcripts_df(spark, 6, partitions=2)
    p = str(tmp_path / "small_src")
    src.write.parquet(p)
    idx = str(tmp_path / "small_idx")
    m = build_index_direct(
        spark, p, idx,
        IndexConfig(n_segments=64, n_term_buckets=2,
                    segment_assignment="hash"))
    # 6 conversations cannot fill 64 segments; empty ones have no entry
    assert 0 < len(m["segments"]) <= 6 * 2
    assert m["total_docs"] == src.count()
    s = Searcher(spark, idx)
    assert s.total_docs == m["total_docs"]


def test_resume_markers(spark, built, tmp_path):
    root, src_path, *_ = built
    idx = str(tmp_path / "idx_resume")
    cfg = IndexConfig(**CFG)
    m1 = build_index_direct(spark, src_path, idx, cfg)
    lineage = os.path.join(idx, "lineage")
    seg_markers = sorted(glob.glob(os.path.join(lineage, "seg_*.json")))
    bucket_markers = glob.glob(os.path.join(lineage, "bucket_*.json"))
    assert seg_markers and bucket_markers
    # simulate a partial crash: one split unstaged, one segment unencoded
    os.remove(bucket_markers[0])
    os.remove(seg_markers[0])
    # drop the stage markers so resume re-enters the fused stage (the
    # per-split/per-segment markers then decide what actually re-runs)
    for st in ("docmap", "postings", "terms"):
        mp = os.path.join(idx, f"_done_{st}")
        if os.path.exists(mp):
            os.remove(mp)
    m2 = build_index_direct(spark, src_path, idx, cfg, resume=True)
    assert m2["total_docs"] == m1["total_docs"]
    assert {s["segment_ord"] for s in m2["segments"]} == \
        {s["segment_ord"] for s in m1["segments"]}


def test_hash_direct_over_iceberg_table(spark, tmp_path):
    """The two direct dataflows compose: content-deterministic hash
    segments planned from an Iceberg snapshot's data files."""
    from tantivy_spark.sources import iceberg

    src = transcripts_df(spark, 40, partitions=3)
    tbl = str(tmp_path / "tbl")
    iceberg.write_table(spark, src, tbl)
    idx = str(tmp_path / "idx")
    m = build_index_direct(
        spark, tbl, idx,
        IndexConfig(n_segments=4, n_term_buckets=2,
                    segment_assignment="hash"))
    assert m["total_docs"] == src.count()
    s = Searcher(spark, idx)
    assert len(s.search(L.TermQuery("w1"), k=5).collect()) == 5

"""Per-segment IVF vector component (SegmentPlugin) — operators/vector_index.py.

Covers: component shape (codebook + member lists per segment), exactness
at nprobe = n_clusters (degenerates to flat search), pruned-probe
semantics (result = exact top-k of the probed clusters' members),
determinism across rebuilds, and live-segment pruning through the
manifest (the segment-lifecycle property that distinguishes this from
the table-level ANN operators).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tantivy_spark.config import IndexConfig
from tantivy_spark.operators.build import build_index
from tantivy_spark.operators.pipeline import brute_force_topk
from tantivy_spark.operators.search import Searcher
from tantivy_spark.operators.vector_index import (ivf_segment_component,
                                                  ivf_segment_topk)

N_DOCS = 120
DIM = 8


def _tables(spark):
    rng = np.random.RandomState(7)
    docs = pd.DataFrame({
        "ext_id": np.arange(N_DOCS, dtype=np.int64),
        "text": [f"doc number {i} with words w{i % 13}" for i in range(N_DOCS)],
    })
    emb = pd.DataFrame({
        "vec_id": np.arange(N_DOCS, dtype=np.int64),
        "embedding": [rng.randn(DIM).astype(np.float32).tolist()
                      for _ in range(N_DOCS)],
    })
    return spark.createDataFrame(docs), spark.createDataFrame(emb)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    docs, emb = _tables(spark)
    idx = str(tmp_path_factory.mktemp("ivfseg") / "idx")
    cfg = IndexConfig(text_col="text", key_cols=("ext_id",),
                      segment_col="ext_id", n_segments=3, n_term_buckets=4)
    plug = ivf_segment_component(emb, doc_key="ext_id", vec_key="vec_id",
                                 n_clusters=4, iters=3)
    build_index(spark, docs, idx, cfg, plugins={"ivf": plug})
    return idx, docs, emb


class TestComponentShape:
    def test_rows_and_kinds(self, spark, built):
        idx, docs, emb = built
        tbl = Searcher(spark, idx).plugin("ivf")
        counts = {r["kind"]: r["c"] for r in
                  tbl.groupBy("kind").agg(F.count(F.lit(1)).alias("c"))
                  .collect()}
        assert counts["m"] == N_DOCS
        n_segs = tbl.select("segment_ord").distinct().count()
        assert counts["c"] == 4 * n_segs
        cl = tbl.agg(F.min("cluster"), F.max("cluster")).collect()[0]
        assert cl[0] == 0 and cl[1] == 3
        # every member carries its key; centroids carry none
        assert tbl.filter((F.col("kind") == "m")
                          & F.col("key").isNull()).count() == 0
        assert tbl.filter((F.col("kind") == "c")
                          & F.col("key").isNotNull()).count() == 0

    def test_deterministic_rebuild(self, spark, built, tmp_path):
        idx, docs, emb = built
        cfg = IndexConfig(text_col="text", key_cols=("ext_id",),
                          segment_col="ext_id", n_segments=3,
                          n_term_buckets=4)
        plug = ivf_segment_component(emb, doc_key="ext_id",
                                     vec_key="vec_id", n_clusters=4,
                                     iters=3)
        idx2 = str(tmp_path / "again")
        build_index(spark, docs, idx2, cfg, plugins={"ivf": plug})

        def norm(d):
            f = (Searcher(spark, d).plugin("ivf").toPandas()
                 .sort_values(["segment_ord", "kind", "cluster", "key"])
                 .reset_index(drop=True))
            f["embedding"] = f["embedding"].map(
                lambda v: tuple(np.round(v, 12)))
            return f

        pd.testing.assert_frame_equal(norm(idx), norm(idx2))


class TestProbe:
    def test_full_probe_is_exact(self, spark, built):
        idx, docs, emb = built
        s = Searcher(spark, idx)
        q = [0.2] * DIM
        got = ivf_segment_topk(s, q, k=10, nprobe=4).collect()
        exp = brute_force_topk(
            emb.withColumnRenamed("vec_id", "key"), "key", "embedding",
            q, k=10).collect()
        assert [(r["key"], round(r["cosine"], 9)) for r in got] == \
            [(r["key"], round(r["cosine"], 9)) for r in exp]

    def test_pruned_probe_is_exact_over_probed_members(self, spark, built):
        idx, docs, emb = built
        s = Searcher(spark, idx)
        q = [0.5] + [0.0] * (DIM - 1)
        tbl = s.plugin("ivf")
        cents = tbl.filter(F.col("kind") == "c").collect()
        qv = np.asarray(q)
        probe = {}
        for r in cents:
            d2 = float(((np.asarray(r["embedding"]) - qv) ** 2).sum())
            seg = int(r["segment_ord"])
            best = probe.get(seg)
            if best is None or (d2, r["cluster"]) < best:
                probe[seg] = (d2, r["cluster"])
        pairs = [(s_, c) for s_, (_, c) in probe.items()]
        members = tbl.filter(F.col("kind") == "m").collect()
        cand = [r for r in members
                if (int(r["segment_ord"]), int(r["cluster"])) in
                {(a, int(b)) for a, b in pairs}]

        def cos(v):
            v = np.asarray(v)
            return float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))

        exp = sorted(((-cos(r["embedding"]), r["key"]) for r in cand))[:5]
        got = ivf_segment_topk(s, q, k=5, nprobe=1).collect()
        assert [r["key"] for r in got] == [k for _, k in exp]

    def test_live_segment_pruning(self, spark, built, tmp_path):
        idx, docs, emb = built
        from tantivy_spark.operators.merge import delete_all_documents

        cfg = IndexConfig(text_col="text", key_cols=("ext_id",),
                          segment_col="ext_id", n_segments=3,
                          n_term_buckets=4)
        plug = ivf_segment_component(emb, doc_key="ext_id",
                                     vec_key="vec_id", n_clusters=4,
                                     iters=3)
        idx3 = str(tmp_path / "prune")
        build_index(spark, docs, idx3, cfg, plugins={"ivf": plug})
        delete_all_documents(spark, idx3)
        assert Searcher(spark, idx3).plugin("ivf").count() == 0

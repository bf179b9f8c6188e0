"""Per-segment IVF vector component, wired through the SegmentPlugin hook.

The reference attaches every index component to the segment lifecycle
(src/index/segment_component.rs:31-33: each SegmentComponent is a file of
one immutable segment; paradedb's vector extension builds its IVF data the
same way, inside the segment).  tantivy_spark's table-level ANN operators
(operators/pipeline.py: flat / LSH / IVF) search a free-standing table;
this module moves IVF INTO the segment lifecycle:

  * built at index-build time via ``build_index(plugins={"ivf": ...})`` —
    one k-means + assignment per segment, inside that segment's task
    group (no cross-segment shuffle);
  * stored partitioned by ``segment_ord`` like every other per-segment
    table, visible only with the manifest commit (atomic index commit);
  * read back through ``Searcher.plugin()``, so merged-away / deleted
    segments are pruned by the live-segment set exactly like postings.

Component rows (one table, two kinds):
  kind='c'  centroid rows: (segment_ord, cluster, embedding) — the
            segment's trained codebook (tiny: n_clusters rows/segment);
  kind='m'  member rows: (segment_ord, cluster, <key>, embedding) — the
            cluster posting lists.

Query (`ivf_segment_topk`): collect the codebooks (n_segments x
n_clusters rows — driver-small by construction), pick each segment's
``nprobe`` closest clusters to the query, scan only those (segment,
cluster) member lists via a broadcast semi-join, exact-rerank.  At
10^12 docs the member scan prunes to nprobe clusters per live segment;
the rerank is the same TakeOrderedAndProject shape as flat search.
``nprobe = n_clusters`` degenerates to exact flat search (the
oracle-comparable configuration, like ann_ivf_top10).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tantivy_spark.operators.pipeline import brute_force_topk

COMPONENT_SCHEMA = ("segment_ord int, kind string, cluster int, "
                    "key long, embedding array<double>")


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Closed-form splitmix64 (same arithmetic as pipeline._hyperplanes):
    deterministic, reproducible outside numpy."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def lloyd_kmeans(mat: np.ndarray, n_clusters: int, iters: int) -> np.ndarray:
    """Deterministic Lloyd's iterations, first-rows init — the training
    loop of the reference's ivf training pass (same as pipeline.ivf_train,
    shared here for the per-segment variant)."""
    n_clusters = min(n_clusters, len(mat))
    centroids = mat[:n_clusters].copy()
    for _ in range(iters):
        d2 = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(n_clusters):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def ivf_segment_component(
    embeddings: DataFrame,
    doc_key: str,
    vec_key: str,
    vec_col: str = "embedding",
    n_clusters: int = 8,
    iters: int = 3,
    sample: int = 4096,
    seed: int = 13,
) -> Callable[[DataFrame], DataFrame]:
    """SegmentPlugin factory: attach an IVF vector index over
    ``embeddings`` (keyed by ``vec_key``) to every segment (docmap rows
    keyed by ``doc_key``).

    Per segment: train centroids with deterministic Lloyd's k-means over
    a seeded-hash-ordered sample of at most ``sample`` member vectors
    (reproducible at any parallelism), then assign every member to its
    nearest-L2 centroid.  The embeddings join is shuffle-pinned — a
    per-doc side table must never be broadcast (the round-2 scale-bug
    rule, pipeline.py:376).
    """

    def plugin(docmap: DataFrame) -> DataFrame:
        emb = embeddings.select(
            F.col(vec_key).cast("long").alias("key"),
            F.transform(F.col(vec_col),
                        lambda x: x.cast("double")).alias("embedding"),
        )
        members = (
            docmap.select("segment_ord",
                          F.col(doc_key).cast("long").alias("key"))
            .join(emb.hint("shuffle_hash"), "key", "inner")
        )

        def train_assign(pdf: pd.DataFrame) -> pd.DataFrame:
            seg = int(pdf["segment_ord"].iloc[0])
            keys = pdf["key"].to_numpy(np.int64)
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            # seeded-hash sample order: deterministic regardless of the
            # rows' arrival order or parallelism
            # fold the seed in Python ints (numpy warns on scalar uint64
            # wraparound even though the mod-2^64 product is intended)
            seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) & ((1 << 64) - 1))
            h = _splitmix64(keys.astype(np.uint64) + seed_mix)
            order = np.argsort(h, kind="stable")
            cents = lloyd_kmeans(mat[order[:sample]], n_clusters, iters)
            d2 = ((cents ** 2).sum(axis=1)[None, :]
                  - 2.0 * (mat @ cents.T))
            assign = d2.argmin(axis=1).astype(np.int32)
            out_c = pd.DataFrame({
                "segment_ord": seg, "kind": "c",
                "cluster": np.arange(len(cents), dtype=np.int32),
                "key": None, "embedding": list(cents),
            })
            out_m = pd.DataFrame({
                "segment_ord": seg, "kind": "m", "cluster": assign,
                "key": keys, "embedding": pdf["embedding"].tolist(),
            })
            return pd.concat([out_c, out_m], ignore_index=True)

        return members.groupBy("segment_ord").applyInPandas(
            train_assign, schema=COMPONENT_SCHEMA)

    return plugin


def ivf_segment_topk(
    searcher,
    qvec: list[float],
    k: int = 10,
    nprobe: int = 4,
    metric: str = "cosine",
    plugin_name: str = "ivf",
    key_alias: str = "key",
) -> DataFrame:
    """Probe the per-segment IVF component: per live segment, rank its
    centroids by L2 distance to the query, scan the nprobe nearest
    clusters' member lists, exact-rerank globally.  nprobe >= n_clusters
    is exact (flat search over every member)."""
    tbl = searcher.plugin(plugin_name)
    cents = (tbl.filter(F.col("kind") == "c")
             .select("segment_ord", "cluster", "embedding").collect())
    q = np.asarray(qvec, dtype=np.float64)
    by_seg: dict[int, list[tuple[float, int]]] = {}
    for r in cents:
        d2 = float(((np.asarray(r["embedding"]) - q) ** 2).sum())
        by_seg.setdefault(int(r["segment_ord"]), []).append(
            (d2, int(r["cluster"])))
    pairs = [
        (seg, c)
        for seg, ds in by_seg.items()
        for _, c in sorted(ds)[:nprobe]
    ]
    probe_df = searcher.spark.createDataFrame(
        pairs, "segment_ord int, cluster int")
    cands = (
        tbl.filter(F.col("kind") == "m")
        .join(F.broadcast(probe_df), ["segment_ord", "cluster"], "inner")
        .withColumnRenamed("key", key_alias)
    )
    return brute_force_topk(cands, key_alias, "embedding", qvec, k,
                            metric=metric)

"""Collectors — what to do with the matched/scored doc set.

Reference: /root/reference/src/collector/ — TopDocs (top_score_collector.rs),
Count (count_collector.rs), DocSetCollector (docset_collector.rs),
HistogramCollector (histogram_collector.rs), FacetCollector
(facet_collector.rs), FilterCollector (filter_collector_wrapper.rs),
MultiCollector (multi_collector.rs).

Spark mapping: a collector is a transformation over the engine's scored
frame `(segment_ord, doc_id, score)` joined with the docmap's fast-field
columns.  The scored frame comes from the TAAT64 path with no limit (full
match set) or the DAAT top-k path when only ranks are needed; collectors
compose as DataFrame ops, so MultiCollector = cache the scored frame once
and derive every sub-collector from it (one matching pass, like the
reference's single collect walk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tantivy_spark.operators.search import Searcher
from tantivy_spark.plans import logical as L


def scored_frame(searcher: Searcher, query: L.Query,
                 fast_fields: list[str] | None = None) -> DataFrame:
    """Full match set with scores (+ requested docmap fast-field columns).

    The docmap join is the columnar fast-field access of the reference
    (collectors read doc values from the column store, never the inverted
    index — src/aggregation/agg_data.rs shape).
    """
    scored = searcher.top_docs_frame(query, k=None, mode="taat64")
    if not fast_fields:
        return scored
    dm = searcher.docmap().select("segment_ord", "doc_id", *fast_fields)
    return scored.join(dm, ["segment_ord", "doc_id"], "inner")


def top_docs(searcher: Searcher, query: L.Query, limit: int, offset: int = 0,
             order_by_field: str | None = None,
             ascending: bool = False,
             order_by=None, tweak_score=None,
             fast_fields: list[str] | None = None) -> DataFrame:
    """TopDocs with offset — by score (default), by a fast field
    (TopDocs::order_by_u64_field / order_by_fast_field), by an arbitrary
    computed sort key, or with a recomputed score.

    The sort-key framework (top_score_collector.rs:63-470,
    src/collector/sort_key/):
      * ``order_by``: a Column expression over the scored frame's columns
        (score + requested fast fields), or a callable(frame) -> Column —
        the SortKeyComputer analogue.
      * ``tweak_score``: callable(frame) -> Column replacing the score
        before ranking — the TweakedScoreTopCollector analogue.
    Tie-break is ascending DocAddress (segment_ord, doc_id), as in
    merge_fruits.

    The offset stays IN the plan: orderBy + limit(offset+limit) keeps the
    distributed per-partition TopK + TakeOrderedAndProject bound, then a
    row_number window slices the <= offset+limit survivors (bounded, so
    the single-partition window is a constant-size step) — no driver-side
    collect/slice."""
    from pyspark.sql import Window

    fields = list(fast_fields or [])
    if order_by_field is not None and order_by_field not in fields:
        fields.append(order_by_field)

    # EARLY TERMINATION on a sorted index (the point of index sorting,
    # index_meta.rs:288-398 + the reference's top-field collectors): when
    # ordering a match-all by the index's own sort_by_field in the same
    # direction, doc ids ARE the rank — read only the first
    # (offset+limit) doc ids of each segment (a pruned docmap scan of
    # k×n_segments rows; no scoring, no full scan).  Only sound with no
    # pending deletes (same guard as the count fast path).
    sbf = getattr(searcher.cfg, "sort_by_field", None)
    if (sbf is not None
            and isinstance(query, L.AllQuery)
            and order_by is None and tweak_score is None
            and order_by_field is not None
            and tuple(sbf) == (order_by_field,
                               "asc" if ascending else "desc")
            and not searcher.tombstones()
            and not searcher.has_doc_tombstones()):
        k = limit + offset
        frame = (
            searcher.docmap()
            .filter(F.col("doc_id") < k)
            .select("segment_ord", "doc_id", F.lit(1.0).alias("score"),
                    *fields)
        )
        sort_cols = [
            F.asc(order_by_field) if ascending else F.desc(order_by_field),
            F.asc("segment_ord"), F.asc("doc_id"),
        ]
        out = frame.orderBy(*sort_cols).limit(k)
        if offset:
            from pyspark.sql import Window as _W

            w = _W.orderBy(*sort_cols)
            out = (
                out.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") > offset)
                .drop("_rn")
            )
        return out

    if order_by is None and order_by_field is not None:
        order_by = F.col(order_by_field)

    if order_by is None and tweak_score is None and not fields:
        frame = searcher.top_docs_frame(query, k=limit + offset, mode="taat64")
        sort_cols = [F.desc("score"), F.asc("segment_ord"), F.asc("doc_id")]
    else:
        frame = scored_frame(searcher, query, fields)
        if tweak_score is not None:
            frame = frame.withColumn("score", tweak_score(frame))
        if order_by is not None:
            key = order_by(frame) if callable(order_by) else order_by
            frame = frame.withColumn("_sort_key", key)
            sort_cols = [
                F.asc("_sort_key") if ascending else F.desc("_sort_key"),
                F.asc("segment_ord"), F.asc("doc_id"),
            ]
        else:
            sort_cols = [F.desc("score"), F.asc("segment_ord"), F.asc("doc_id")]
    out = frame.orderBy(*sort_cols).limit(limit + offset)
    if offset:
        w = Window.orderBy(*sort_cols)
        out = (
            out.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > offset)
            .drop("_rn")
        )
    return out.drop("_sort_key")


def count(searcher: Searcher, query: L.Query) -> int:
    """Count collector (count_collector.rs:37) — doc_freq fast path inside."""
    return searcher.count(query)


def doc_set(searcher: Searcher, query: L.Query) -> DataFrame:
    """DocSetCollector (docset_collector.rs:9): all matching DocAddresses."""
    return (
        searcher.top_docs_frame(query, k=None, mode="taat64")
        .select("segment_ord", "doc_id")
    )


def histogram(searcher: Searcher, query: L.Query, field: str,
              min_value: float, bucket_width: float,
              num_buckets: int) -> DataFrame:
    """HistogramCollector (histogram_collector.rs:27): fixed-width buckets
    over a fast field of the matching docs; values outside
    [min, min + width*num_buckets) are dropped (reference semantics)."""
    sf = scored_frame(searcher, query, [field])
    bucket = F.floor((F.col(field) - F.lit(min_value)) / F.lit(bucket_width))
    return (
        sf.withColumn("bucket", bucket)
        .filter((F.col("bucket") >= 0) & (F.col("bucket") < num_buckets))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("bucket")
    )


def facet_counts(searcher: Searcher, query: L.Query, field: str,
                 root: str = "/") -> DataFrame:
    """FacetCollector (facet_collector.rs:55-183): counts of the direct
    children of `root` over a hierarchical path column ("/a/b/c")."""
    sf = scored_frame(searcher, query, [field])
    root = root.rstrip("/")
    depth = len([p for p in root.split("/") if p]) + 2  # split produces ['',...]
    child = F.concat_ws("/", F.slice(F.split(F.col(field), "/"), 1, depth))
    prefixed = sf.filter(
        F.col(field).startswith(root + "/") if root else F.lit(True)
    )
    return (
        prefixed.withColumn("facet", F.concat(F.lit("/"), F.regexp_replace(child, "^/", "")))
        .groupBy("facet")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("facet")
    )


def filtered(searcher: Searcher, query: L.Query, predicate,
             inner):
    """FilterCollector (filter_collector_wrapper.rs:70): fast-field
    predicate wrapped around an inner collector callable(scored_df)."""
    def wrapper(sf: DataFrame) -> DataFrame:
        cond = F.expr(predicate) if isinstance(predicate, str) else predicate
        return inner(sf.filter(cond))

    return wrapper


def multi(searcher: Searcher, query: L.Query, fast_fields: list[str],
          collectors: dict) -> dict:
    """MultiCollector (multi_collector.rs:171): one matching pass, several
    collectors.  `collectors` maps name -> callable(scored_df) -> DataFrame;
    the scored frame is cached, every collector materializes from that one
    pass, and the results are returned as collected row lists (the
    reference's merged 'fruits')."""
    sf = scored_frame(searcher, query, fast_fields).cache()
    try:
        return {name: fn(sf).collect() for name, fn in collectors.items()}
    finally:
        sf.unpersist()

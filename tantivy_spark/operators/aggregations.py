"""Elasticsearch-style aggregations, compiled to Catalyst plans.

Reference: /root/reference/src/aggregation/ — request enum
`AggregationVariants` (agg_req.rs:185-239), two-phase execution
(segment results -> IntermediateAggregationResults -> merge_fruits,
collector.rs:83-118, intermediate_agg_result.rs:213).

Spark mapping: Catalyst's partial/final aggregation IS the reference's
intermediate-merge shape, so every aggregation below compiles to a plain
``groupBy(...).agg(...)`` plan — whole-stage-codegen'd, map-side partially
aggregated, shuffled once on the bucket key.  Nothing here drops to Python.

Scale note: bucket aggs shuffle on the bucket expression; cardinality of the
bucket key bounds reducer fan-in.  `terms` with `size=k` still computes full
counts before the final limit (exact counts, same as the reference's
`shard_size`-exhaustive mode); at 100 TB the groupBy is the single shuffle
and AQE coalesces post-shuffle partitions.

Supported (reference file in parens):

* buckets: terms (bucket/term_agg), histogram / date_histogram
  (bucket/histogram/), range (bucket/range.rs), filter (bucket/filter.rs),
  composite (bucket/composite/), missing-term (bucket/term_missing_agg.rs)
* metrics: avg/sum/min/max/count/value_count (metric/*.rs), stats /
  extended_stats (metric/stats.rs, extended_stats.rs), percentiles
  (metric/percentiles.rs — we offer exact `percentile` and approximate
  `percentile_approx`), cardinality (metric/cardinality.rs — exact
  `count_distinct` and HLL++ `approx_count_distinct`; the reference uses an
  Apache DataSketches HLL at lg_k=11 ≈ 2.3% err — same sketch class,
  different constants), top_hits (metric/top_hits.rs — window row_number).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# metric sub-aggregations -> list of Column aggregate expressions
# --------------------------------------------------------------------------

def _metric_exprs(name: str, spec: dict) -> list:
    kind, body = next(iter(spec.items()))
    field = body.get("field")
    c = F.col(field) if field else None
    if kind == "avg":
        return [F.avg(c).alias(name)]
    if kind == "sum":
        return [F.sum(c).alias(name)]
    if kind == "min":
        return [F.min(c).alias(name)]
    if kind == "max":
        return [F.max(c).alias(name)]
    if kind in ("count", "doc_count"):
        return [F.count(F.lit(1)).alias(name)]
    if kind == "value_count":
        return [F.count(c).alias(name)]
    if kind == "stats":
        return [
            F.count(c).alias(f"{name}_count"),
            F.sum(c).alias(f"{name}_sum"),
            F.min(c).alias(f"{name}_min"),
            F.max(c).alias(f"{name}_max"),
            F.avg(c).alias(f"{name}_avg"),
        ]
    if kind == "extended_stats":
        return [
            F.count(c).alias(f"{name}_count"),
            F.sum(c).alias(f"{name}_sum"),
            F.min(c).alias(f"{name}_min"),
            F.max(c).alias(f"{name}_max"),
            F.avg(c).alias(f"{name}_avg"),
            F.sum(c * c).alias(f"{name}_sum_of_squares"),
            F.var_pop(c).alias(f"{name}_variance"),
            F.stddev_pop(c).alias(f"{name}_std_deviation"),
        ]
    if kind == "percentiles":
        pcts = body.get("percents", [1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0])
        exact = body.get("exact", True)
        out = []
        for p in pcts:
            col_name = f"{name}_p{str(p).replace('.', '_')}"
            if exact:
                out.append(F.percentile(c, F.lit(p / 100.0)).alias(col_name))
            else:
                out.append(
                    F.percentile_approx(c, F.lit(p / 100.0)).alias(col_name)
                )
        return out
    if kind == "cardinality":
        if body.get("exact", False):
            return [F.count_distinct(c).alias(name)]
        # HLL++ (the reference's DataSketches HLL analogue); rsd 0.023 ~ lg_k=11
        return [
            F.approx_count_distinct(c, rsd=body.get("rsd", 0.023)).alias(name)
        ]
    raise ValueError(f"unsupported metric aggregation {kind!r}")


def _sub_metric_exprs(sub_aggs: dict | None) -> list:
    exprs = [F.count(F.lit(1)).alias("doc_count")]
    for name, spec in (sub_aggs or {}).items():
        exprs.extend(_metric_exprs(name, spec))
    return exprs


# --------------------------------------------------------------------------
# bucket aggregations
# --------------------------------------------------------------------------

class AggregationLimitError(Exception):
    """Bucket-count guard tripped — the reference's AggregationLimits
    memory/bucket protection (src/aggregation/agg_limits.rs:22-34,
    DEFAULT_BUCKET_LIMIT = 65_000)."""


DEFAULT_BUCKET_LIMIT = 65_000  # agg_limits.rs:22-34


def check_bucket_limit(df: DataFrame, key_col, max_buckets: int | None) -> None:
    """Fail fast when a bucket agg would materialize more than
    `max_buckets` distinct buckets (agg_limits.rs validate_and_add /
    add_count semantics — we check up front since Catalyst aggregates in
    one pass rather than incrementally)."""
    if max_buckets is None:
        return
    n = df.select(key_col.alias("_k")).distinct().limit(max_buckets + 1).count()
    if n > max_buckets:
        raise AggregationLimitError(
            f"aggregation would create > {max_buckets} buckets "
            f"(reference DEFAULT_BUCKET_LIMIT={DEFAULT_BUCKET_LIMIT})"
        )


def terms_agg(df: DataFrame, field: str, size: int = 10,
              order_by="count", missing=None,
              sub_aggs: dict | None = None,
              shard_size: int | None = None, shard_col: str | None = None,
              show_doc_count_error: bool = False,
              show_sum_other: bool = False,
              min_doc_count: int = 1,
              max_buckets: int | None = None) -> DataFrame:
    """Terms bucket, order by count desc then key asc (the reference's
    default order, bucket/term_agg), top `size` buckets.

    Default = exact exhaustive counts (error bound 0).  With `shard_size`
    + `shard_col`, each shard keeps only its top `shard_size` buckets
    before the merge — the reference/ES `shard_size` protocol — and
    `show_doc_count_error` adds `doc_count_error_upper_bound`: for each
    surviving key, the sum over NON-contributing shards of that shard's
    smallest kept count (the worst case it could have missed) — the
    term_agg error-bound algorithm (bucket/term_agg/).

    `show_sum_other` adds the ES/reference response field
    `sum_other_doc_count` (docs in scope not covered by the returned
    buckets) as a constant column: total via a broadcast 1-row
    cross-join, bucket sum via an unpartitioned window over the <= size
    returned rows — both bounded, no driver action."""
    key = F.col(field)
    if missing is not None:
        key = F.coalesce(key, F.lit(missing))
    check_bucket_limit(df, key, max_buckets)
    if shard_size is None:
        g = df.groupBy(key.alias("key")).agg(*_sub_metric_exprs(sub_aggs))
        if min_doc_count > 1:
            # term_agg/mod.rs:331 — buckets below min_doc_count dropped
            # (0 and 1 coincide here: buckets are derived from the data)
            g = g.filter(F.col("doc_count") >= F.lit(min_doc_count))
        if show_doc_count_error:
            g = g.withColumn(
                "doc_count_error_upper_bound", F.lit(0).cast("long")
            )
        # CustomOrder (term_agg/mod.rs:238-249): target "_count", "_key",
        # or a sub-aggregation metric column; ties break by key asc
        if isinstance(order_by, dict):
            (target, direction), = order_by.items()
        elif order_by == "count":
            target, direction = "_count", "desc"
        else:
            target, direction = "_key", "asc"
        col = {"_count": "doc_count", "_key": "key"}.get(target, target)
        primary = F.asc(col) if direction == "asc" else F.desc(col)
        g = g.orderBy(primary, F.asc("key"))
        out = g.limit(size)
        if show_sum_other:
            out = _with_sum_other(out, df, key)
        return out

    if shard_col is None:
        raise ValueError("shard_size needs shard_col (the per-shard key)")
    if sub_aggs:
        raise ValueError("shard_size mode supports doc_count only")
    per = (
        df.groupBy(F.col(shard_col).alias("shard"), key.alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("shard").orderBy(F.desc("cnt"), F.asc("key"))
    kept = per.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= shard_size
    ).drop("_rk")
    cutoff = kept.groupBy("shard").agg(F.min("cnt").alias("cut"))
    total_cut = cutoff.agg(F.sum("cut").alias("t")).collect()[0]["t"] or 0
    merged = (
        kept.join(F.broadcast(cutoff), "shard")
        .groupBy("key")
        .agg(
            F.sum("cnt").alias("doc_count"),
            F.sum("cut").alias("_cut_seen"),
        )
    )
    out = merged.select(
        "key", "doc_count",
        (F.lit(int(total_cut)) - F.col("_cut_seen"))
        .cast("long").alias("doc_count_error_upper_bound"),
    )
    if not show_doc_count_error:
        out = out.drop("doc_count_error_upper_bound")
    out = out.orderBy(F.desc("doc_count"), F.asc("key")).limit(size)
    if show_sum_other:
        out = _with_sum_other(out, df, key)
    return out


def _with_sum_other(buckets: DataFrame, df: DataFrame, key) -> DataFrame:
    total = df.agg(F.count(key).alias("_tot"))
    w_all = Window.partitionBy()
    return (
        buckets.crossJoin(F.broadcast(total))
        .withColumn(
            "sum_other_doc_count",
            (F.col("_tot") - F.sum("doc_count").over(w_all)).cast("long"),
        )
        .drop("_tot")
    )


def histogram_agg(df: DataFrame, field: str, interval: float,
                  sub_aggs: dict | None = None, offset: float = 0.0,
                  min_doc_count: int = 0,
                  extended_bounds: tuple[float, float] | None = None,
                  hard_bounds: tuple[float, float] | None = None,
                  max_buckets: int | None = DEFAULT_BUCKET_LIMIT,
                  ) -> DataFrame:
    """Fixed-width histogram (bucket/histogram/histogram.rs): bucket key
    = floor((value - offset)/interval)*interval + offset.  Reference
    semantics: with the default min_doc_count=0 EMPTY buckets between
    the first and last non-empty key are emitted (doc_count 0, metric
    sub-aggs null); `extended_bounds` widens that filled range,
    `hard_bounds` drops values whose bucket falls outside it, and
    min_doc_count > 0 filters sparse buckets instead (histogram.rs:60,
    :137-183 — extended_bounds with min_doc_count>0 is an error)."""
    if min_doc_count > 0 and extended_bounds is not None:
        raise ValueError(
            "Cannot set min_doc_count and extended_bounds at the same time")
    c = F.col(field)
    key = (F.floor((c - F.lit(offset)) / F.lit(interval)) * F.lit(interval)
           + F.lit(offset))
    if hard_bounds is not None:
        lo, hi = hard_bounds
        if extended_bounds is not None and (
                extended_bounds[0] < lo or extended_bounds[1] > hi):
            raise ValueError(
                "extended_bounds have to be inside hard_bounds")
        df = df.filter((key >= F.lit(lo)) & (key <= F.lit(hi)))
    buckets = (df.groupBy(key.alias("key"))
               .agg(*_sub_metric_exprs(sub_aggs)))
    if min_doc_count > 0:
        return buckets.filter(
            F.col("doc_count") >= F.lit(min_doc_count)).orderBy("key")
    # gap fill: the absolute grid between the first and last key
    bounds = buckets.agg(F.min("key").alias("lo"),
                         F.max("key").alias("hi")).collect()[0]
    if bounds["lo"] is None:
        return buckets.orderBy("key")
    lo, hi = float(bounds["lo"]), float(bounds["hi"])
    if extended_bounds is not None:
        eb_lo = (F.floor((F.lit(extended_bounds[0]) - F.lit(offset))
                         / F.lit(interval)) * F.lit(interval)
                 + F.lit(offset))
        eb = df.sparkSession.range(1).select(
            eb_lo.alias("l")).collect()[0]["l"]
        lo = min(lo, float(eb))
        hi = max(hi, float(extended_bounds[1]))
        hi = (hi - offset) // interval * interval + offset
    n = int(round((hi - lo) / interval)) + 1
    if max_buckets is not None and n > max_buckets:
        raise AggregationLimitError(
            f"aggregation would create > {max_buckets} buckets "
            f"(reference DEFAULT_BUCKET_LIMIT={DEFAULT_BUCKET_LIMIT})")
    grid = df.sparkSession.range(n).select(
        (F.lit(lo) + F.col("id") * F.lit(interval)).alias("key"))
    filled = grid.join(buckets, "key", "left")
    filled = filled.withColumn(
        "doc_count", F.coalesce(F.col("doc_count"), F.lit(0)))
    return filled.orderBy("key")


#: fixed_interval units (date_histogram.rs parse_into_milliseconds)
_FIXED_INTERVAL_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000,
                      "d": 86_400_000}


def parse_fixed_interval_ms(s: str) -> int:
    """date_histogram.rs `parse_into_milliseconds`: integer number +
    unit in ms/s/m/h/d; fractional values are rejected."""
    import re

    m = re.fullmatch(r"(\d+)(ms|s|m|h|d)", s.strip())
    if not m:
        raise ValueError(f"invalid fixed_interval {s!r}")
    return int(m.group(1)) * _FIXED_INTERVAL_MS[m.group(2)]


def date_histogram_agg(df: DataFrame, field: str, interval: str | None = None,
                       sub_aggs: dict | None = None,
                       fixed_interval: str | None = None,
                       offset: str | None = None,
                       min_doc_count: int = 0,
                       max_buckets: int | None = DEFAULT_BUCKET_LIMIT,
                       ) -> DataFrame:
    """Date histogram (bucket/histogram/date_histogram.rs).  The
    reference supports FIXED intervals only (ms/s/m/h/d; a
    DateHistogramAggregation is a HistogramAggregation over the
    timestamp in milliseconds, same empty-bucket fill).  Calendar
    `interval` (year/month/week/day/hour/minute via date_trunc) is kept
    as an extension beyond the reference."""
    if fixed_interval is not None:
        iv = parse_fixed_interval_ms(fixed_interval)
        off = parse_fixed_interval_ms(offset) if offset else 0
        ms = F.unix_millis(F.col(field).cast("timestamp")).cast("double")
        out = histogram_agg(
            df.withColumn("__ms", ms), "__ms", float(iv), sub_aggs,
            offset=float(off), min_doc_count=min_doc_count,
            max_buckets=max_buckets)
        return out.withColumn(
            "key",
            F.timestamp_millis(F.col("key").cast("long"))
            .cast("timestamp_ntz"))
    key = F.date_trunc(interval, F.col(field)).alias("key")
    return df.groupBy(key).agg(*_sub_metric_exprs(sub_aggs)).orderBy("key")


def range_agg(df: DataFrame, field: str, ranges: list[dict],
              sub_aggs: dict | None = None) -> DataFrame:
    """Range buckets [from, to) — the reference's half-open semantics
    (bucket/range.rs).  Each range is {"key": str, "from": x?, "to": y?}."""
    c = F.col(field)
    expr = F.lit(None).cast("string")
    for r in reversed(ranges):
        cond = F.lit(True)
        if r.get("from") is not None:
            cond = cond & (c >= F.lit(r["from"]))
        if r.get("to") is not None:
            cond = cond & (c < F.lit(r["to"]))
        lo = r.get("from", "*")
        hi = r.get("to", "*")
        expr = F.when(cond, F.lit(r.get("key", f"{lo}-{hi}"))).otherwise(expr)
    return (
        df.withColumn("key", expr)
        .filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(*_sub_metric_exprs(sub_aggs))
        .orderBy("key")
    )


def filter_agg(df: DataFrame, condition, sub_aggs: dict | None = None) -> DataFrame:
    """Filter bucket (bucket/filter.rs): metrics over the matching
    subset.  String and AST-list conditions compile through the SHARED
    portable predicate (plans/predicate.py) — the serving mirror runs
    the same dialect with the same null semantics and raises the same
    PredicateError on anything unsupported; pass a Catalyst Column for
    engine-specific SQL."""
    from tantivy_spark.plans import predicate as _P

    if isinstance(condition, (str, list, tuple)):
        cond = _P.to_spark(_P.as_ast(condition))
    else:
        cond = condition
    return df.filter(cond).agg(*_sub_metric_exprs(sub_aggs))


def _composite_source(spec):
    """One composite source -> (name, key expr, direction, drop_missing).
    Accepts a bare column name (terms, asc — the original shorthand) or
    the reference's source spec {name: {terms|histogram|date_histogram:
    {field, interval?, fixed_interval?, calendar_interval?, order?,
    missing_bucket?}}} (bucket/composite/mod.rs:50-145)."""
    if isinstance(spec, str):
        return spec, F.col(spec), "asc", False
    (name, inner), = spec.items()
    (kind, body), = inner.items()
    field = body["field"]
    if kind == "terms":
        key = F.col(field)
    elif kind == "histogram":
        iv = float(body["interval"])
        key = F.floor(F.col(field) / F.lit(iv)) * F.lit(iv)
    elif kind == "date_histogram":
        if "fixed_interval" in body:
            iv = parse_fixed_interval_ms(body["fixed_interval"])
            ms = F.unix_millis(F.col(field).cast("timestamp"))
            key = F.timestamp_millis(
                (F.floor(ms / F.lit(iv)) * F.lit(iv)).cast("long")
            ).cast("timestamp_ntz")
        else:
            key = F.date_trunc(body.get("calendar_interval", "day"),
                               F.col(field))
    else:
        raise ValueError(f"unknown composite source kind {kind!r}")
    return (name, key, body.get("order", "asc"),
            not body.get("missing_bucket", False))


def composite_agg(df: DataFrame, sources: list, size: int = 10,
                  after: tuple | None = None,
                  sub_aggs: dict | None = None) -> DataFrame:
    """Composite bucket with keyset pagination (bucket/composite/):
    buckets ordered by the source tuple per-source asc|desc; `after`
    resumes past the given key tuple.  Sources are terms, histogram, or
    date_histogram (mod.rs:140-145); docs missing a source value are
    dropped unless that source sets missing_bucket (mod.rs:59-62)."""
    parsed = [_composite_source(s) for s in sources]
    names = [n for n, _, _, _ in parsed]
    keyed = df.select(
        *[k.alias(n) for n, k, _, _ in parsed],
        *[c for c in df.columns if c not in names])
    for n, _, _, drop_missing in parsed:
        if drop_missing:
            keyed = keyed.filter(F.col(n).isNotNull())
    g = keyed.groupBy(*names).agg(*_sub_metric_exprs(sub_aggs))
    if after is not None:
        # keyset predicate: source tuple strictly beyond `after` in the
        # per-source sort direction, lexicographically
        pred = F.lit(False)
        eq = F.lit(True)
        for (n, _, order, _), a in zip(parsed, after):
            beyond = (F.col(n) > F.lit(a)) if order == "asc"                 else (F.col(n) < F.lit(a))
            pred = pred | (eq & beyond)
            eq = eq & (F.col(n) == F.lit(a))
        g = g.filter(pred)
    sort = [F.asc(n) if order == "asc" else F.desc(n)
            for n, _, order, _ in parsed]
    return g.orderBy(*sort).limit(size)


def missing_agg(df: DataFrame, field: str,
                sub_aggs: dict | None = None) -> DataFrame:
    """Missing-term bucket (bucket/term_missing_agg.rs): docs with no value."""
    return df.filter(F.col(field).isNull()).agg(*_sub_metric_exprs(sub_aggs))


def top_hits_agg(df: DataFrame, group_field: str, size: int,
                 sort_field: str, ascending: bool = False,
                 select_cols: list[str] | None = None) -> DataFrame:
    """TopHits per bucket (metric/top_hits.rs) = window row_number <= size.

    Deterministic tie-break on the full sort (sort_field, then remaining
    columns) mirrors the reference's stable DocAddress ordering.
    """
    order = [F.asc(sort_field) if ascending else F.desc(sort_field)]
    extra = [c for c in (select_cols or df.columns) if c not in (sort_field, group_field)]
    order += [F.asc(c) for c in extra]
    w = Window.partitionBy(group_field).orderBy(*order)
    out_cols = select_cols or df.columns
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= size)
        .select(group_field, *[c for c in out_cols if c != group_field])
    )


def global_stats_agg(df: DataFrame, sub_aggs: dict) -> DataFrame:
    """Top-level (bucketless) metric aggregations — the reference's metric
    aggs at the request root."""
    return df.agg(*_sub_metric_exprs(sub_aggs))


# --------------------------------------------------------------------------
# ES-style request dispatcher (one top-level named agg per call)
# --------------------------------------------------------------------------

_BUCKET_KINDS = {
    "terms", "histogram", "date_histogram", "range", "filter", "composite",
    "missing", "top_hits",
}


def _bucket_key(kind: str, body: dict):
    """(key expression, pre-filter) for a bucket kind — used for nesting."""
    if kind == "terms":
        key = F.col(body["field"])
        if body.get("missing") is not None:
            key = F.coalesce(key, F.lit(body["missing"]))
        return key, None
    if kind == "histogram":
        iv = body["interval"]
        return (F.floor(F.col(body["field"]) / F.lit(iv)) * F.lit(iv)), None
    if kind == "date_histogram":
        interval = body.get("calendar_interval", body.get("interval", "day"))
        return F.date_trunc(interval, F.col(body["field"])), None
    if kind == "range":
        c = F.col(body["field"])
        expr = F.lit(None).cast("string")
        for r in reversed(body["ranges"]):
            cond = F.lit(True)
            if r.get("from") is not None:
                cond = cond & (c >= F.lit(r["from"]))
            if r.get("to") is not None:
                cond = cond & (c < F.lit(r["to"]))
            expr = F.when(cond, F.lit(r.get("key"))).otherwise(expr)
        return expr, F.col("_k").isNotNull()
    raise ValueError(f"bucket kind {kind!r} cannot nest")


def _nested_buckets(df: DataFrame, pkind: str, pbody: dict,
                    ckind: str, cbody: dict,
                    metric_aggs: dict | None) -> DataFrame:
    """Two-level bucket nesting (the reference's sub_aggregation tree,
    agg_req.rs): one groupBy on the composite key; parent `size` keeps the
    top parents by total doc_count (terms-order semantics), children
    ordered by key within each parent."""
    pkey, _ = _bucket_key(pkind, pbody)
    ckey, _ = _bucket_key(ckind, cbody)
    g = (
        df.withColumn("_pk", pkey).withColumn("_ck", ckey)
        .filter(F.col("_pk").isNotNull() & F.col("_ck").isNotNull())
        .groupBy(F.col("_pk").alias("key"), F.col("_ck").alias("child_key"))
        .agg(*_sub_metric_exprs(metric_aggs))
    )
    if pkind == "terms":
        size = pbody.get("size", 10)
        totals = g.groupBy("key").agg(F.sum("doc_count").alias("_total"))
        top = totals.orderBy(F.desc("_total"), F.asc("key")).limit(size)
        g = g.join(F.broadcast(top.select("key")), "key", "inner")
    return g.orderBy("key", "child_key")


def request_fields(request: dict) -> list[str]:
    """Fast-field columns an ES-shaped aggregation request reads — the
    column set a query-scoped aggregation must fetch from the docmap
    (the reference resolves the same set from fast-field readers in
    src/aggregation/agg_req_with_accessor.rs).  `filter` conditions are
    opaque expressions: declare their columns in body["fields"]."""
    out: list[str] = []

    def add(f) -> None:
        if f and f not in out:
            out.append(f)

    def walk(req: dict) -> None:
        for kind, body in req.items():
            if kind == "aggs":
                for sub in body.values():
                    walk(sub)
                continue
            if not isinstance(body, dict):
                continue
            add(body.get("field"))
            if kind == "terms":
                # shard_size mode reads the per-shard key column too
                add(body.get("shard_col"))
            if kind == "composite":
                for s in body.get("sources", []):
                    if isinstance(s, str):
                        add(s)
                    else:
                        (_, inner), = s.items()
                        (_, ibody), = inner.items()
                        add(ibody.get("field"))
            elif kind == "top_hits":
                add(body.get("group_field"))
                add(body.get("sort_field"))
                for c in body.get("select") or []:
                    add(c)
            elif kind == "filter":
                for c in body.get("fields") or []:
                    add(c)
                cond = body.get("condition")
                if isinstance(cond, (str, list, tuple)):
                    # portable predicates declare their own fields —
                    # no separate "fields" list needed
                    from tantivy_spark.plans import predicate as _P

                    try:
                        for c in _P.fields(_P.as_ast(cond)):
                            add(c)
                    except _P.PredicateError:
                        pass    # surfaces with full context at execution

    walk(request)
    return out


def run_aggregation(df: DataFrame, request: dict) -> DataFrame:
    """Execute one named aggregation request (ES JSON shape):

        {"terms": {"field": "event_type", "size": 10},
         "aggs": {"avg_value": {"avg": {"field": "value"}}}}

    Returns a flat DataFrame: bucket key column(s) + doc_count + one column
    per sub-metric (stats/extended_stats/percentiles expand to several).
    A bucket agg inside "aggs" nests (two levels): the result carries
    (key, child_key, doc_count, metrics...).
    """
    sub = request.get("aggs")
    kinds = [k for k in request if k != "aggs"]
    # detect bucket-in-bucket nesting
    if sub and len(kinds) == 1:
        bucket_children = {
            n: s for n, s in sub.items()
            if next(iter(s.keys() - {"aggs"})) in
            ("terms", "histogram", "date_histogram", "range")
        }
        if bucket_children:
            if len(bucket_children) > 1:
                raise ValueError("one nested bucket per level")
            (cname, cspec), = bucket_children.items()
            ckind = next(iter(cspec.keys() - {"aggs"}))
            metric_sub = cspec.get("aggs")
            return _nested_buckets(
                df, kinds[0], request[kinds[0]], ckind, cspec[ckind], metric_sub
            )
    if len(kinds) != 1:
        raise ValueError("request must contain exactly one aggregation kind")
    kind = kinds[0]
    body = request[kind]
    if kind == "terms":
        return terms_agg(df, body["field"], body.get("size", 10),
                         body.get("order", "count"), body.get("missing"), sub,
                         min_doc_count=body.get("min_doc_count", 1),
                         shard_size=body.get("shard_size"),
                         shard_col=body.get("shard_col"),
                         show_doc_count_error=body.get(
                             "show_doc_count_error", False),
                         show_sum_other=body.get("show_sum_other", False),
                         max_buckets=body.get("max_buckets"))
    if kind == "histogram":
        eb = body.get("extended_bounds")
        hb = body.get("hard_bounds")
        return histogram_agg(
            df, body["field"], body["interval"], sub,
            offset=body.get("offset", 0.0),
            min_doc_count=body.get("min_doc_count", 0),
            extended_bounds=(eb["min"], eb["max"]) if eb else None,
            hard_bounds=(hb["min"], hb["max"]) if hb else None,
            max_buckets=body.get("max_buckets", DEFAULT_BUCKET_LIMIT))
    if kind == "date_histogram":
        if "fixed_interval" in body:
            return date_histogram_agg(
                df, body["field"], None, sub,
                fixed_interval=body["fixed_interval"],
                offset=body.get("offset"),
                min_doc_count=body.get("min_doc_count", 0),
                max_buckets=body.get("max_buckets", DEFAULT_BUCKET_LIMIT))
        return date_histogram_agg(
            df, body["field"],
            body.get("calendar_interval", body.get("interval", "day")), sub)
    if kind == "range":
        return range_agg(df, body["field"], body["ranges"], sub)
    if kind == "filter":
        return filter_agg(df, body["condition"], sub)
    if kind == "composite":
        return composite_agg(df, body["sources"], body.get("size", 10),
                             tuple(body["after"]) if body.get("after") else None,
                             sub)
    if kind == "missing":
        return missing_agg(df, body["field"], sub)
    if kind == "top_hits":
        return top_hits_agg(df, body["group_field"], body.get("size", 3),
                            body["sort_field"], body.get("ascending", False),
                            body.get("select"))
    # bucketless metric at the root
    return global_stats_agg(df, {kind: {kind: body}})



# --------------------------------------------------------------------------
# DDSketch percentiles — the reference's actual sketch algorithm
# (metric/percentiles.rs:216-218 wraps sketches-ddsketch with defaults
# alpha=0.01 / 2048 bins), run as the two-phase partial/merge shape of
# DistributedAggregationCollector (collector.rs:46, intermediate merge).
# --------------------------------------------------------------------------


def percentiles_ddsketch(
    df: DataFrame, field: str,
    percents: tuple[float, ...] = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0),
    alpha: float = 0.01,
) -> DataFrame:
    """Relative-error percentiles via DDSketch: one sketch per partition
    (vectorized add over Arrow batches), partial sketches serialized as
    (keys, counts, zero) rows, merged on the driver — sketch size is
    O(bins), independent of data size, so the merge input is tiny at any
    scale.  Guarantee: |est - true| <= alpha * |true| per quantile."""
    import numpy as np
    import pandas as pd

    from tantivy_spark.functions.ddsketch import DDSketch

    spark = df.sparkSession

    def partial(it):
        s = DDSketch(alpha=alpha)
        for pdf in it:
            s.add(pdf[field].to_numpy(dtype=np.float64, na_value=np.nan))
        k, c, z = s.to_arrays()
        yield pd.DataFrame(
            {"keys": [k.tolist()], "counts": [c.tolist()], "zero": [int(z)]}
        )

    parts = (
        df.select(field)
        .mapInPandas(partial, schema="keys array<long>, counts array<long>, zero long")
        .collect()
    )
    merged = DDSketch(alpha=alpha)
    for r in parts:
        merged.merge(
            DDSketch.from_arrays(
                np.array(r["keys"], dtype=np.int64),
                np.array(r["counts"], dtype=np.int64),
                int(r["zero"]), alpha=alpha,
            )
        )
    rows = [
        (float(p), float(merged.quantile(p / 100.0)))
        for p in percents
        if merged.count > 0
    ]
    return spark.createDataFrame(rows, "percent double, value double")

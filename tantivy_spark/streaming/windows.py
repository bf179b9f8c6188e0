"""Event-time windowed aggregation with late-data handling.

The streaming analogue of the batch `date_histogram` / `terms`
aggregations (`operators/aggregations.py`): a tumbling event-time window
keyed by an optional bucket column, with a watermark bounding how late an
event may arrive and still update its window — Spark's state store then
drops windows older than the watermark, which is exactly the
bounded-memory guarantee a 100 TB stream needs (state size is
O(buckets × windows-in-watermark-horizon), independent of stream
length).

Also: `streaming_dedup` — watermarked exact dedup over a key column, the
streaming counterpart of `pipeline.exact_dedup` (state = keys within the
horizon only).

Everything here is declarative Structured Streaming — no Python in the
hot path; the windowed aggregate compiles to the same partial/final
HashAggregate pair as the batch engine plus the state-store exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_stats(stream_df: DataFrame, ts_col: str,
                   window: str = "1 minute",
                   watermark: str = "2 minutes",
                   key_col: str | None = None,
                   value_col: str | None = None) -> DataFrame:
    """Tumbling-window counts (and value stats when `value_col` given)
    per `key_col`, tolerating events up to `watermark` late.

    Output columns: window_start, window_end, [key], doc_count,
    [min/max/sum/avg of value] — the date_histogram + stats bucket shape.
    """
    df = stream_df.withWatermark(ts_col, watermark)
    keys = [F.window(F.col(ts_col), window).alias("w")]
    if key_col is not None:
        keys.append(F.col(key_col).alias("key"))
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    if value_col is not None:
        v = F.col(value_col)
        aggs += [F.min(v).alias("min_value"), F.max(v).alias("max_value"),
                 F.sum(v).alias("sum_value"), F.avg(v).alias("avg_value")]
    out = df.groupBy(*keys).agg(*aggs)
    cols = [F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end")]
    if key_col is not None:
        cols.append("key")
    return out.select(*cols, "doc_count",
                      *(c for c in out.columns if c.endswith("_value")))


def streaming_dedup(stream_df: DataFrame, key_cols: list[str],
                    ts_col: str, watermark: str = "10 minutes") -> DataFrame:
    """Exact streaming dedup on `key_cols` within the watermark horizon
    (`dropDuplicatesWithinWatermark` keeps state bounded; duplicates
    farther apart than the horizon pass — the documented contract)."""
    df = stream_df.withWatermark(ts_col, watermark)
    try:
        return df.dropDuplicatesWithinWatermark(key_cols)
    except AttributeError:  # pre-3.5 fallback: unbounded-state variant
        return df.dropDuplicates(key_cols + [ts_col])

"""Event-time windowed aggregation + watermark late-data semantics over a
real Structured Streaming query (file source, availableNow drain,
memory sink)."""

import os
import time

import pandas as pd
import pytest

from tantivy_spark.streaming.windows import streaming_dedup, windowed_stats


def _write_batch(spark, path, rows):
    pdf = pd.DataFrame(rows, columns=["ts", "etype", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)


def test_windowed_stats_with_watermark(spark, tmp_root):
    src = f"{tmp_root}/winsrc_{time.time_ns()}"
    # batch 1: events in minutes 0 and 1, plus one far-future event at
    # minute 30 that drives the watermark forward
    _write_batch(spark, src, [
        ("2024-01-01 00:00:10", "a", 1.0),
        ("2024-01-01 00:00:20", "a", 3.0),
        ("2024-01-01 00:01:15", "b", 5.0),
        ("2024-01-01 00:30:00", "late-driver", 0.0),
    ])
    stream = (
        spark.readStream.schema("ts timestamp, etype string, value double")
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = windowed_stats(stream, "ts", window="1 minute",
                         watermark="2 minutes", key_col="etype",
                         value_col="value")
    name = f"win_{time.time_ns()}"
    sink = f"{tmp_root}/sink_{name}"
    ck = f"{tmp_root}/ck_{name}"

    def drain():
        q = (out.writeStream.format("parquet").option("path", sink)
             .outputMode("append").trigger(availableNow=True)
             .option("checkpointLocation", ck).start())
        q.awaitTermination(120)
        return spark.read.parquet(sink).collect()

    rows = {(r.window_start.isoformat(), r.key): r for r in drain()}
    # minute-0 and minute-1 windows are final (watermark passed them)
    a0 = rows[("2024-01-01T00:00:00", "a")]
    assert a0.doc_count == 2 and a0.sum_value == 4.0 and a0.avg_value == 2.0
    b1 = rows[("2024-01-01T00:01:00", "b")]
    assert b1.doc_count == 1 and b1.min_value == 5.0

    # batch 2: an event for minute 0 arriving ~30 min late -> beyond the
    # 2-minute watermark horizon -> dropped, the emitted window is final
    _write_batch(spark, src, [
        ("2024-01-01 00:00:30", "a", 100.0),   # too late, dropped
        ("2024-01-01 00:31:00", "c", 7.0),
    ])
    # second drain resumes from the SAME checkpoint (watermark state
    # carries over) and appends only newly-final windows
    all_rows = [(r.window_start.isoformat(), r.key, r.doc_count)
                for r in drain()]
    # the late minute-0 'a' event was dropped: that window appears exactly
    # once, still with doc_count 2
    a0_rows = [(w, k, n) for w, k, n in all_rows
               if w.startswith("2024-01-01T00:00") and k == "a"]
    assert a0_rows == [("2024-01-01T00:00:00", "a", 2)], all_rows


def test_streaming_dedup_within_watermark(spark, tmp_root):
    src = f"{tmp_root}/dedupsrc_{time.time_ns()}"
    _write_batch(spark, src, [
        ("2024-01-01 00:00:01", "k1", 1.0),
        ("2024-01-01 00:00:02", "k1", 1.0),   # dup within horizon
        ("2024-01-01 00:00:03", "k2", 2.0),
    ])
    stream = (
        spark.readStream.schema("ts timestamp, etype string, value double")
        .parquet(src)
    )
    out = streaming_dedup(stream, ["etype"], "ts", watermark="5 minutes")
    name = f"dd_{time.time_ns()}"
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", f"{tmp_root}/ck_{name}").start())
    q.awaitTermination(120)
    keys = [r.etype for r in spark.sql(f"select * from {name}").collect()]
    assert sorted(keys) == ["k1", "k2"]


def test_sessionize_stateful_operator(spark, tmp_root):
    """applyInPandasWithState sessionization: in-batch gap splitting plus
    watermark-driven event-time timeouts closing idle sessions across
    checkpointed drains."""
    from tantivy_spark.streaming.sessions import sessionize

    src = f"{tmp_root}/sessrc_{time.time_ns()}"
    # u1: two sessions inside one batch (events 00:00-00:01, then a gap
    # > 5 min, events 00:10); u2: one session
    _write_batch(spark, src, [
        ("2024-01-01 00:00:00", "u1", 0.0),
        ("2024-01-01 00:00:40", "u1", 0.0),
        ("2024-01-01 00:01:00", "u1", 0.0),
        ("2024-01-01 00:10:00", "u1", 0.0),
        ("2024-01-01 00:00:30", "u2", 0.0),
    ])
    stream = (
        spark.readStream.schema("ts timestamp, etype string, value double")
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = sessionize(stream, "etype", "ts", gap_seconds=300,
                     watermark="1 minute")
    sink = f"{tmp_root}/sesssink_{time.time_ns()}"
    ck = f"{tmp_root}/sessck_{time.time_ns()}"

    def drain():
        q = (out.writeStream.format("parquet").option("path", sink)
             .outputMode("append").trigger(availableNow=True)
             .option("checkpointLocation", ck).start())
        q.awaitTermination(180)
        return sorted(
            ((r.key, r.session_start.isoformat(), r.session_end.isoformat(),
              r.n_events) for r in spark.read.parquet(sink).collect()))

    first = drain()
    # the in-batch gap split closes u1's first session immediately
    assert ("u1", "2024-01-01T00:00:00", "2024-01-01T00:01:00", 3) in first

    # batch 2 pushes the watermark far ahead -> remaining sessions time out
    _write_batch(spark, src, [("2024-01-01 01:00:00", "u3", 0.0)])
    second = drain()
    assert ("u1", "2024-01-01T00:10:00", "2024-01-01T00:10:00", 1) in second
    assert ("u2", "2024-01-01T00:00:30", "2024-01-01T00:00:30", 1) in second

"""Streaming windowed aggregations (SURVEY.md §2.9 T1/T2/T6/T9):
tumbling event-time windows with watermark, trigger sizing via
maxFilesPerTrigger, memory-sink drains."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sync_spark.sources.cdc import read_event_stream, write_event_batch


def _ev(seq, ts, table="users"):
    return {
        "op": "insert",
        "seq": seq,
        "ts": ts,
        "source_table": table,
        "key_json": json.dumps({"id": seq}),
        "after_json": json.dumps({"id": seq}),
    }


def test_tumbling_window_with_watermark(spark, tmp_path):
    log = str(tmp_path / "ev")
    write_event_batch(
        log,
        [
            _ev(1, "2024-01-01T00:01:00Z"),
            _ev(2, "2024-01-01T00:04:00Z"),
            _ev(3, "2024-01-01T00:07:00Z"),
            _ev(4, "2024-01-01T01:02:00Z"),
        ],
        1,
    )
    stream = read_event_stream(spark, log)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "source_table")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("winout")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT date_format(w.start, 'HH:mm') AS s, n FROM winout ORDER BY s"
    ).collect()
    assert [(r.s, r.n) for r in rows] == [("00:00", 2), ("00:05", 1), ("01:00", 1)]


def test_streaming_session_window(spark, tmp_path):
    """Native session_window in streaming (T9 extension): events gap
    > 10 min split sessions per table."""
    log = str(tmp_path / "sev")
    write_event_batch(
        log,
        [
            _ev(1, "2024-01-01T00:00:00Z"),
            _ev(2, "2024-01-01T00:05:00Z"),  # same session (gap 5m)
            _ev(3, "2024-01-01T00:30:00Z"),  # new session (gap 25m)
        ],
        1,
    )
    stream = read_event_stream(spark, log)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "source_table")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sessout")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT date_format(w.start, 'HH:mm') AS s, n FROM sessout ORDER BY s"
    ).collect()
    assert [(r.s, r.n) for r in rows] == [("00:00", 2), ("00:30", 1)]


def test_max_files_per_trigger_batches(spark, tmp_path):
    log = str(tmp_path / "ev2")
    for b in range(3):
        write_event_batch(log, [_ev(b * 10 + i, "2024-01-01T00:00:00Z") for i in range(2)], b)
    stream = read_event_stream(spark, log, max_files_per_trigger=1)
    seen_batches = []

    def sink(df, bid):
        seen_batches.append((bid, df.count()))

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # T1/T2: one file per micro-batch → 3 batches of 2 events
    assert sorted(n for _, n in seen_batches) == [2, 2, 2]
    assert len(seen_batches) == 3

"""Multi-table CDC (one envelope stream fanning into several MERGE
targets — the reference's per-mapping goroutines, mongodb.go:279-291)
and streaming duplicate-event suppression (at-least-once sources)."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sync_spark.sources.cdc import read_event_stream, write_event_batch
from sync_spark.spec import SyncSpec
from sync_spark.streaming.pipeline import CdcPipeline, TableTarget, snapshot_if_empty

USERS = T.StructType([T.StructField("id", T.LongType()), T.StructField("name", T.StringType())])
ORDERS = T.StructType([T.StructField("oid", T.LongType()), T.StructField("total", T.DoubleType())])


def _ev(seq, table, key, after):
    return {
        "op": "insert" if after else "delete",
        "seq": seq,
        "ts": "2024-01-01T00:00:00Z",
        "source_table": table,
        "key_json": json.dumps(key),
        "after_json": json.dumps(after) if after else None,
    }


def test_one_stream_many_tables(spark, tmp_path):
    utgt, otgt = str(tmp_path / "users"), str(tmp_path / "orders")
    snapshot_if_empty(spark, spark.createDataFrame([Row(id=1, name="a")], USERS), utgt)
    snapshot_if_empty(spark, spark.createDataFrame([Row(oid=10, total=5.0)], ORDERS), otgt)
    # interleaved events for both tables + one for an UNMAPPED table
    write_event_batch(
        str(tmp_path / "ev"),
        [
            _ev(1, "users", {"id": 2}, {"id": 2, "name": "b"}),
            _ev(2, "orders", {"oid": 11}, {"oid": 11, "total": 7.5}),
            _ev(3, "ignored_table", {"id": 99}, {"id": 99}),
            _ev(4, "orders", {"oid": 10}, None),  # delete
        ],
        1,
    )
    pipe = CdcPipeline(
        spark,
        SyncSpec(task_id=1, type="parquet"),
        [
            TableTarget("users", utgt, USERS, ["id"]),
            TableTarget("orders", otgt, ORDERS, ["oid"]),
        ],
        event_log_dir=str(tmp_path / "ev"),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    pipe.run_available()
    assert {r.id for r in spark.read.parquet(utgt).collect()} == {1, 2}
    assert {r.oid for r in spark.read.parquet(otgt).collect()} == {11}


def test_streaming_event_dedup(spark, tmp_path):
    """At-least-once transports can re-deliver the same (table, seq):
    dropDuplicates on the stream suppresses re-deliveries within the
    watermark horizon."""
    log = str(tmp_path / "ev")
    write_event_batch(log, [_ev(1, "users", {"id": 1}, {"id": 1, "name": "x"})] * 3, 1)
    write_event_batch(log, [_ev(1, "users", {"id": 1}, {"id": 1, "name": "x"})], 2)

    stream = (
        read_event_stream(spark, log)
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["source_table", "seq"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.sql("SELECT count(*) FROM dedup_out").collect()[0][0] == 1

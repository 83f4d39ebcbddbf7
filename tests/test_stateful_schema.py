"""Stateful streaming counters (applyInPandasWithState) + schema
flattening / inference utilities."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import types as T

from sync_spark.functions.schema_utils import (
    flatten_schema,
    infer_json_schema,
    select_dotted,
)
from sync_spark.sources.cdc import read_event_stream, write_event_batch
from sync_spark.streaming.stateful import running_counters


def _ev(seq, op, table="users"):
    return {
        "op": op,
        "seq": seq,
        "ts": "2024-01-01T00:00:00Z",
        "source_table": table,
        "key_json": json.dumps({"id": seq}),
        "after_json": json.dumps({"id": seq}) if op != "delete" else None,
    }


def test_running_counters_accumulate_across_batches(spark, tmp_path):
    log = str(tmp_path / "ev")
    write_event_batch(log, [_ev(1, "insert"), _ev(2, "update"), _ev(3, "delete")], 1)
    write_event_batch(log, [_ev(4, "insert"), _ev(5, "insert", table="orders")], 2)

    stream = read_event_stream(spark, log, max_files_per_trigger=1)
    counters = running_counters(stream)
    q = (
        counters.writeStream.outputMode("update")
        .format("memory")
        .queryName("counters")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM counters").collect()
    # last snapshot per table = accumulated totals across both batches
    last = {}
    for r in rows:
        last[r.source_table] = r  # memory sink appends in batch order
    assert last["users"].received == 4
    assert last["users"].inserted == 2
    assert last["users"].updated == 1
    assert last["users"].deleted == 1
    assert last["orders"].received == 1 and last["orders"].inserted == 1


def test_flatten_schema_dotted_paths():
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "profile",
                T.StructType(
                    [
                        T.StructField("email", T.StringType()),
                        T.StructField(
                            "address",
                            T.StructType([T.StructField("zip", T.StringType())]),
                        ),
                    ]
                ),
            ),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("flag", T.BooleanType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    flat = flatten_schema(schema)
    assert flat == {
        "id": "int",
        "profile": "object",
        "profile.email": "string",
        "profile.address": "object",
        "profile.address.zip": "string",
        "tags": "array",
        "flag": "bool",
        "ts": "date",
    }


def test_infer_and_select_dotted(spark):
    docs = spark.createDataFrame(
        [
            Row(j='{"a": {"b": 1, "c": "x"}, "d": true}'),
            Row(j='{"a": {"b": 2}, "e": 1.5}'),
        ]
    )
    schema = infer_json_schema(spark, docs, "j")
    flat = flatten_schema(schema)
    assert flat["a"] == "object" and flat["a.b"] == "int" and flat["d"] == "bool"
    from pyspark.sql import functions as F

    parsed = docs.select(F.from_json("j", schema).alias("doc")).select("doc.*")
    out = select_dotted(parsed, ["a.b", "a.c"]).collect()
    assert [(r.a_b, r.a_c) for r in out] == [(1, "x"), (2, None)]


def test_infer_schema_latest_n_partition_invariant(spark):
    """The sampled set is the latest N by seq, so the inferred schema
    must not change when the input's partitioning (scan order) does.
    Older docs carry an extra field that must NOT appear when the
    sample covers only the newest 2."""
    rows = [
        Row(seq=1, j='{"old_only": 1, "a": 1}'),
        Row(seq=2, j='{"old_only": 2, "a": 2}'),
        Row(seq=3, j='{"a": 3, "fresh": "x"}'),
        Row(seq=4, j='{"a": 4, "fresh": "y"}'),
    ]
    docs = spark.createDataFrame(rows)
    schemas = set()
    for n_parts in (1, 3, 7):
        s = infer_json_schema(spark, docs.repartition(n_parts), "j", sample=2)
        schemas.add(s.simpleString())
        flat = flatten_schema(s)
        assert "fresh" in flat and "old_only" not in flat
    assert len(schemas) == 1

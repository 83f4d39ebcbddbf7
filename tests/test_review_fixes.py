"""Regression tests for the round-1 code-review findings."""

from __future__ import annotations

import json
from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sync_spark.functions.security import decrypt_value, encrypt_value
from sync_spark.operators.cluster import connected_components
from sync_spark.operators.countquery import compile_condition
from sync_spark.operators.merge import apply_changes
from sync_spark.operators.monitor import monitor_tick
from sync_spark.plans.backup import prune_tables, table_time_range
from sync_spark.spec import CountCondition, FieldSecurity, SyncSpec


def test_ignore_deletes_keeps_superseded_upsert(spark):
    """upsert(seq=1) then delete(seq=2) with ignoreDeleteOps: the
    delete is a no-op, so the upsert must land (filter-after-compact
    would silently drop it)."""
    target = spark.createDataFrame([], "id long, v string")
    changes = spark.createDataFrame(
        [Row(id=1, v="new", op="upsert", seq=1), Row(id=1, v=None, op="delete", seq=2)]
    )
    out = apply_changes(target, changes, keys=["id"], ignore_deletes=True).collect()
    assert [(r.id, r.v) for r in out] == [(1, "new")]


def test_snapshot_never_masks_key_columns(spark, tmp_path):
    from sync_spark.engine import SyncTask

    schema = T.StructType([T.StructField("id", T.LongType()), T.StructField("email", T.StringType())])
    spec = SyncSpec(
        task_id=1,
        type="parquet",
        field_security={
            "users": [
                FieldSecurity(field="id", security_type="masked"),  # must be ignored
                FieldSecurity(field="email", security_type="masked"),
            ]
        },
        pk_columns={"users": ["id"]},
    )
    spec.mappings = SyncSpec.from_json(
        '{"mappings": [{"tables": [{"sourceTable": "users"}]}]}'
    ).mappings
    src = spark.createDataFrame([Row(id=7, email="x@y.z")], schema)
    task = SyncTask(
        spark, spec, {"users": src}.get, {"users": schema},
        str(tmp_path / "t"), str(tmp_path / "e"), str(tmp_path / "c"),
    )
    task.snapshot()
    row = spark.read.parquet(str(tmp_path / "t" / "users")).collect()[0]
    assert row.id == 7  # key intact
    assert row.email == "*****"


def test_non_ascii_encryption_key(spark):
    df = spark.createDataFrame([Row(s="payload")])
    key = "鍵" * 12  # multi-byte utf-8, > 32 bytes when encoded
    enc = encrypt_value(F.col("s"), key, df.schema["s"].dataType)
    out = df.select(decrypt_value(enc, key).alias("d")).collect()[0]
    assert out.d == "payload"


def test_non_date_numeric_suffixes_survive_planning():
    assert table_time_range("t_999999") is None
    assert table_time_range("t_20241340") is None
    # and pruning keeps them (undated semantics) instead of crashing
    kept = prune_tables(["t_999999", "t_20241340"], (datetime(2024, 1, 1), datetime(2024, 2, 1)))
    assert kept == ["t_999999", "t_20241340"]


def test_scoped_condition_skipped_without_table_context(spark):
    cond = CountCondition(field="x", operator="=", value=1, table="users")
    assert compile_condition(cond, for_table=None) is None


def test_monitor_tick_empty_pairs(spark):
    out = monitor_tick(spark, 1, {}, logged_at=datetime(2024, 1, 1))
    assert out.count() == 0
    assert out.columns == ["task_id", "table", "src_count", "tgt_count", "logged_at"]


def test_cc_raises_on_non_convergence(spark):
    nodes = spark.createDataFrame([Row(id=i) for i in range(6)])
    edges = spark.createDataFrame([Row(id_a=i, id_b=i + 1) for i in range(5)])
    # driver_threshold=0 forces the distributed propagation loop —
    # the union-find path has no iteration cap to trip
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(nodes, edges, max_iter=2, driver_threshold=0)


def test_dlq_replay_is_idempotent(spark, tmp_path):
    """Re-running a batch (fresh checkpoint = crash before commit)
    must not duplicate DLQ rows."""
    import shutil

    from sync_spark.sources.cdc import write_event_batch
    from sync_spark.streaming.pipeline import CdcPipeline, TableTarget, snapshot_if_empty

    schema = T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.StringType())])
    tgt = str(tmp_path / "t")
    snapshot_if_empty(spark, spark.createDataFrame([Row(id=1, v="a")], schema), tgt)
    write_event_batch(
        str(tmp_path / "ev"),
        [
            {
                "op": "insert",
                "seq": 5,
                "ts": "2024-01-01T00:00:00Z",
                "source_table": "users",
                "key_json": json.dumps({"id": None}),
                "after_json": json.dumps({"id": None, "v": "bad"}),
            }
        ],
        1,
    )

    def run():
        CdcPipeline(
            spark,
            SyncSpec(task_id=1, type="parquet"),
            [TableTarget("users", tgt, schema, ["id"])],
            event_log_dir=str(tmp_path / "ev"),
            checkpoint_dir=str(tmp_path / "ck"),
            dlq_path=str(tmp_path / "dlq"),
        ).run_available()

    run()
    shutil.rmtree(str(tmp_path / "ck"))  # simulate crash-before-commit
    run()
    dlq = spark.read.parquet(str(tmp_path / "dlq")).collect()
    assert len(dlq) == 1 and dlq[0].seq == 5

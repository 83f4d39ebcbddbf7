"""Per-batch apply counters emitted by the CDC pipeline (A6 loop) +
replay idempotence of the stats path."""

from __future__ import annotations

import json
import shutil

from pyspark.sql import Row
from pyspark.sql import types as T

from sync_spark.operators.monitor import apply_stats_totals
from sync_spark.sources.cdc import write_event_batch
from sync_spark.spec import SyncSpec
from sync_spark.streaming.pipeline import CdcPipeline, TableTarget, snapshot_if_empty

SCHEMA = T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.StringType())])


def _ev(seq, op, vid):
    return {
        "op": op,
        "seq": seq,
        "ts": "2024-01-01T00:00:00Z",
        "source_table": "users",
        "key_json": json.dumps({"id": vid}),
        "after_json": json.dumps({"id": vid, "v": "x"}) if op != "delete" else None,
    }


def test_apply_stats_and_replay(spark, tmp_path):
    tgt = str(tmp_path / "t")
    snapshot_if_empty(spark, spark.createDataFrame([Row(id=1, v="a")], SCHEMA), tgt)
    write_event_batch(
        str(tmp_path / "ev"),
        [_ev(1, "insert", 2), _ev(2, "insert", 3), _ev(3, "update", 1), _ev(4, "delete", 3)],
        1,
    )

    def run():
        CdcPipeline(
            spark,
            SyncSpec(task_id=1, type="parquet"),
            [TableTarget("users", tgt, SCHEMA, ["id"])],
            event_log_dir=str(tmp_path / "ev"),
            checkpoint_dir=str(tmp_path / "ck"),
            stats_path=str(tmp_path / "stats"),
        ).run_available()

    run()
    totals = {(r.table, r.op): (r.total, r.n_batches) for r in apply_stats_totals(spark, str(tmp_path / "stats")).collect()}
    assert totals[("users", "insert")] == (2, 1)
    assert totals[("users", "update")] == (1, 1)
    assert totals[("users", "delete")] == (1, 1)

    # crash-replay: same batch re-applied must not double-count
    shutil.rmtree(str(tmp_path / "ck"))
    run()
    totals2 = {(r.table, r.op): (r.total, r.n_batches) for r in apply_stats_totals(spark, str(tmp_path / "stats")).collect()}
    assert totals2 == totals


def test_stats_exclude_ignored_deletes(spark, tmp_path):
    """ignoreDeleteOps tables must not count deletes as executed."""
    tgt = str(tmp_path / "t")
    snapshot_if_empty(spark, spark.createDataFrame([Row(id=1, v="a")], SCHEMA), tgt)
    write_event_batch(str(tmp_path / "ev"), [_ev(1, "insert", 2), _ev(2, "delete", 1)], 1)
    CdcPipeline(
        spark,
        SyncSpec(task_id=1, type="parquet"),
        [TableTarget("users", tgt, SCHEMA, ["id"], ignore_deletes=True)],
        event_log_dir=str(tmp_path / "ev"),
        checkpoint_dir=str(tmp_path / "ck"),
        stats_path=str(tmp_path / "stats"),
    ).run_available()
    totals = {(r.table, r.op) for r in apply_stats_totals(spark, str(tmp_path / "stats")).collect()}
    assert totals == {("users", "insert")}  # delete never executed
    assert {r.id for r in spark.read.parquet(tgt).collect()} == {1, 2}

"""Live processingTime-trigger smoke (T1's continuous mode): events
written while the stream runs are picked up by subsequent
micro-batches without a restart."""

from __future__ import annotations

import json
import time

from pyspark.sql import Row
from pyspark.sql import types as T

from sync_spark.sources.cdc import write_event_batch
from sync_spark.spec import SyncSpec
from sync_spark.streaming.pipeline import CdcPipeline, TableTarget, snapshot_if_empty

SCHEMA = T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.StringType())])


def _ev(seq, vid, v):
    return {
        "op": "insert",
        "seq": seq,
        "ts": "2024-01-01T00:00:00Z",
        "source_table": "users",
        "key_json": json.dumps({"id": vid}),
        "after_json": json.dumps({"id": vid, "v": v}),
    }


def test_processing_time_trigger_live(spark, tmp_path):
    tgt = str(tmp_path / "t")
    snapshot_if_empty(spark, spark.createDataFrame([Row(id=1, v="a")], SCHEMA), tgt)
    pipe = CdcPipeline(
        spark,
        SyncSpec(task_id=1, type="parquet"),
        [TableTarget("users", tgt, SCHEMA, ["id"])],
        event_log_dir=str(tmp_path / "ev"),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    write_event_batch(str(tmp_path / "ev"), [_ev(1, 2, "b")], 1)
    q = pipe.start(trigger_once=False)  # processingTime='2 seconds'
    try:

        def wait_for(n, timeout=60):
            deadline = time.time() + timeout
            while time.time() < deadline:
                try:
                    if spark.read.parquet(tgt).count() >= n:
                        return True
                except Exception:
                    pass
                time.sleep(1)
            return False

        assert wait_for(2), "first live batch not applied"
        # produce MORE events while the query is running
        write_event_batch(str(tmp_path / "ev"), [_ev(2, 3, "c"), _ev(3, 4, "d")], 2)
        assert wait_for(4), "second live batch not applied"
    finally:
        q.stop()
    ids = {r.id for r in spark.read.parquet(tgt).collect()}
    assert ids == {1, 2, 3, 4}

"""T10 config hot-reload: spec file change stops the old pipeline and
starts a new one with the new behavior; unchanged polls are no-ops."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import types as T

from sync_spark.sources.cdc import write_event_batch
from sync_spark.spec import SyncSpec
from sync_spark.streaming.pipeline import CdcPipeline, TableTarget, snapshot_if_empty
from sync_spark.streaming.reload import SpecWatcher

SCHEMA = T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.StringType())])

SPEC_PLAIN = json.dumps(
    {"taskId": 1, "type": "parquet",
     "mappings": [{"tables": [{"sourceTable": "users"}]}],
     "pkColumns": {"users": ["id"]}}
)
SPEC_MASKED = json.dumps(
    {"taskId": 1, "type": "parquet",
     "mappings": [{"tables": [{"sourceTable": "users"}]}],
     "fieldSecurity": {"users": [{"field": "v", "securityType": "masked"}]},
     "pkColumns": {"users": ["id"]}}
)


def _event(seq, v):
    return {
        "op": "insert",
        "seq": seq,
        "ts": "2024-01-01T00:00:00Z",
        "source_table": "users",
        "key_json": json.dumps({"id": seq}),
        "after_json": json.dumps({"id": seq, "v": v}),
    }


def test_hot_reload_switches_behavior(spark, tmp_path):
    tgt = str(tmp_path / "t")
    snapshot_if_empty(spark, spark.createDataFrame([Row(id=0, v="base")], SCHEMA), tgt)
    spec_file = tmp_path / "spec.json"
    spec_file.write_text(SPEC_PLAIN)

    class DrainQuery:
        """availableNow 'query' handle: drains the log on start."""

        def __init__(self, spec):
            self.pipe = CdcPipeline(
                spark, spec,
                [TableTarget("users", tgt, SCHEMA, ["id"],
                             ignore_deletes=spec.mappings[0].tables[0].ignore_delete_ops)],
                event_log_dir=str(tmp_path / "ev"),
                checkpoint_dir=str(tmp_path / "ck"),
            )
            self.pipe.run_available()

        def stop(self):
            pass

    watcher = SpecWatcher(str(spec_file), DrainQuery)

    write_event_batch(str(tmp_path / "ev"), [_event(1, "plain")], 1)
    assert watcher.poll_once() is True  # initial start
    assert watcher.poll_once() is False  # unchanged → no-op
    got = {r.id: r.v for r in spark.read.parquet(tgt).collect()}
    assert got[1] == "plain"

    # flip the spec to masked; next poll restarts with new rules
    spec_file.write_text(SPEC_MASKED)
    write_event_batch(str(tmp_path / "ev"), [_event(2, "secret")], 2)
    assert watcher.poll_once() is True
    assert watcher.reload_count == 1
    got = {r.id: r.v for r in spark.read.parquet(tgt).collect()}
    assert got[1] == "plain"  # pre-reload rows untouched
    assert got[2] == "******"  # new rules applied after reload

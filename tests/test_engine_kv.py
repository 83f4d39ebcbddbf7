"""Top-level task facade (engine.py) + KV model: full sync-task
lifecycle from a JSON spec, backup task, Redis-shaped TTL semantics."""

from __future__ import annotations

import json
from datetime import date, datetime

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sync_spark.engine import SyncTask, run_backup_task
from sync_spark.operators.kv import keyspace_size, live_keys, restore_replace
from sync_spark.sources.cdc import write_event_batch
from sync_spark.spec import BackupSpec, SyncSpec

USERS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("email", T.StringType()),
    ]
)

SPEC_JSON = """
{"taskId": 5, "type": "parquet",
 "mappings": [{"sourceDatabase": "src", "targetDatabase": "tgt",
               "tables": [{"sourceTable": "users", "targetTable": "users_t"}]}],
 "fieldSecurity": {"users": [{"field": "email", "securityType": "masked"}]},
 "pkColumns": {"users": ["id"]}}
"""


def test_sync_task_lifecycle(spark, tmp_path):
    spec = SyncSpec.from_json(SPEC_JSON)
    source = spark.createDataFrame(
        [Row(id=1, name="ann", email="ann@x.io"), Row(id=2, name="bo", email="bo@y.io")],
        USERS_SCHEMA,
    )
    task = SyncTask(
        spark,
        spec,
        source_loader={"users": source}.get,
        row_schemas={"users": USERS_SCHEMA},
        target_root=str(tmp_path / "tgt"),
        event_log_dir=str(tmp_path / "ev"),
        checkpoint_root=str(tmp_path / "ck"),
    )
    # 1. snapshot runs once, masks email
    assert task.snapshot() == {"users": True}
    assert task.snapshot() == {"users": False}
    tgt = {r.id: r for r in spark.read.parquet(str(tmp_path / "tgt" / "users_t")).collect()}
    assert tgt[1].email == "********"

    # 2. CDC drain applies masked update
    write_event_batch(
        str(tmp_path / "ev"),
        [
            {
                "op": "update",
                "seq": 1,
                "ts": "2024-01-01T00:00:00Z",
                "source_table": "users",
                "key_json": json.dumps({"id": 2}),
                "after_json": json.dumps({"id": 2, "name": "bo2", "email": "bo2@z.net"}),
            }
        ],
        1,
    )
    task.run_cdc_available()
    tgt = {r.id: r for r in spark.read.parquet(str(tmp_path / "tgt" / "users_t")).collect()}
    assert tgt[2].name == "bo2" and tgt[2].email == "*" * len("bo2@z.net")

    # 3. monitor tick records src/tgt counts
    row = task.monitor(logged_at=datetime(2024, 1, 2)).collect()[0]
    assert row.src_count == 2 and row.tgt_count == 2


def test_backup_task_from_spec(spark, tmp_path):
    spec = BackupSpec.from_json(
        json.dumps(
            {
                "name": "nightly",
                "tables": ["^ev_"],
                "isRegex": True,
                "fields": {"ev": ["event_id", "ts"]},
                "format": "jsonl",
                "query": {"type": "offset", "field": "ts", "startOffset": -30, "endOffset": 2},
                "fileNamePattern": "{table}_{YYYY}{MM}{DD}",
                "compression": None,
            }
        )
    )
    ev = spark.createDataFrame(
        [Row(event_id=1, ts=datetime(2024, 1, 10)), Row(event_id=2, ts=datetime(2024, 1, 11))]
    )
    paths = run_backup_task(
        spark,
        spec,
        catalog=["ev_202401", "other"],
        load_table={"ev_202401": ev}.get,
        out_dir=str(tmp_path),
        run_day=date(2024, 1, 12),
    )
    assert paths == [str(tmp_path / "ev_20240112")]
    assert spark.read.json(paths[0]).count() == 2


def test_kv_ttl_and_restore(spark):
    kv = spark.createDataFrame(
        [
            Row(key="a", value="1", expires_at=datetime(2024, 1, 1)),
            Row(key="b", value="2", expires_at=datetime(2024, 3, 1)),
            Row(key="c", value="3", expires_at=None),
        ]
    )
    now = datetime(2024, 2, 1)
    assert {r.key for r in live_keys(kv, now).collect()} == {"b", "c"}
    assert keyspace_size(kv, now).collect()[0].dbsize == 2
    dump = spark.createDataFrame(
        [Row(key="b", value="2new", expires_at=datetime(2024, 4, 1))]
    )
    restored = {r.key: r.value for r in restore_replace(kv, dump).collect()}
    assert restored == {"a": "1", "b": "2new", "c": "3"}


def test_sync_task_execute_dispatch(spark, tmp_path):
    """SyncTask.execute = the reference's /sql/execute surface on the
    task's own targets: Mongo-JS reads/aggregates, Redis with a KV
    frame, ANSI SQL over mapped-table views — and unmapped
    collections refused loudly."""
    spec = SyncSpec.from_json(SPEC_JSON)
    source = spark.createDataFrame(
        [Row(id=i, name=f"u{i}", email=f"u{i}@x.io") for i in range(1, 6)],
        USERS_SCHEMA,
    )
    task = SyncTask(
        spark,
        spec,
        source_loader={"users": source}.get,
        row_schemas={"users": USERS_SCHEMA},
        target_root=str(tmp_path / "tgt"),
        event_log_dir=str(tmp_path / "ev"),
        checkpoint_root=str(tmp_path / "ck"),
    )
    task.snapshot()

    # Mongo read against the SOURCE spelling and the TARGET spelling
    for coll in ("users", "users_t"):
        kind, out, st = task.execute(f"db.{coll}.find({{id: {{$gte: 4}}}}).sort({{id: 1}})")
        assert kind == "mongo_find" and [r.id for r in out.collect()] == [4, 5]

    kind, out, _ = task.execute(
        "db.users.aggregate([{$group: {_id: null, n: {$sum: 1}}}])"
    )
    assert kind == "mongo_aggregate" and out.collect()[0].n == 5

    kind, out, _ = task.execute("SELECT COUNT(*) AS n FROM users_t WHERE id > 2")
    assert kind == "sql" and out.collect()[0].n == 3

    kv = spark.createDataFrame([("a", "1")], "key string, value string")
    kind, out, st = task.execute("GET a", kv=kv)
    assert kind == "redis" and out.collect()[0].value == "1"

    import pytest as _pt

    with _pt.raises(ValueError, match="not mapped by task"):
        task.execute("db.nope.find({})")

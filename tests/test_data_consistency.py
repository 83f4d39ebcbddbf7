"""TC22-style data consistency through the FULL CDC pipeline —
special characters (CJK, emoji, control chars, SQL-injection-looking
strings), NULLs, and large fields survive snapshot + CDC byte-exact
(reference: pkg/syncer/test/data_consistency_test.go:10-50)."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import types as T

from sync_spark.sources.cdc import write_event_batch
from sync_spark.spec import SyncSpec
from sync_spark.streaming.pipeline import CdcPipeline, TableTarget, snapshot_if_empty

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("txt", T.StringType()),
        T.StructField("num", T.DoubleType()),
    ]
)

NASTY = [
    "日本語テスト文字列",
    "emoji 🎉🚀💥 mixed",
    "tab\there\nnewline",
    "quote's \"and\" `backticks`; DROP TABLE users; --",
    "null byte next:\x00end",
    "x" * 100_000,  # large field
    "",  # empty string
    None,  # NULL
]


def test_special_chars_nulls_large_fields_roundtrip(spark, tmp_path):
    initial = [Row(id=i, txt=t, num=float(i)) for i, t in enumerate(NASTY[:4])]
    tgt = str(tmp_path / "t")
    snapshot_if_empty(spark, spark.createDataFrame(initial, SCHEMA), tgt)

    events = []
    for i, t in enumerate(NASTY[4:], start=100):
        events.append(
            {
                "op": "insert",
                "seq": i,
                "ts": "2024-01-01T00:00:00Z",
                "source_table": "docs",
                "key_json": json.dumps({"id": i}),
                "after_json": json.dumps({"id": i, "txt": t, "num": None}),
            }
        )
    # plus an update rewriting a CJK row with emoji
    events.append(
        {
            "op": "update",
            "seq": 200,
            "ts": "2024-01-01T00:00:01Z",
            "source_table": "docs",
            "key_json": json.dumps({"id": 0}),
            "after_json": json.dumps({"id": 0, "txt": "更新🆙", "num": 0.5}),
        }
    )
    write_event_batch(str(tmp_path / "ev"), events, 1)
    CdcPipeline(
        spark,
        SyncSpec(task_id=1, type="parquet"),
        [TableTarget("docs", tgt, SCHEMA, ["id"])],
        event_log_dir=str(tmp_path / "ev"),
        checkpoint_dir=str(tmp_path / "ck"),
    ).run_available()

    got = {r.id: (r.txt, r.num) for r in spark.read.parquet(tgt).collect()}
    assert got[0] == ("更新🆙", 0.5)
    assert got[1] == (NASTY[1], 1.0)
    assert got[2] == (NASTY[2], 2.0)
    assert got[3] == (NASTY[3], 3.0)
    assert got[100] == (NASTY[4], None)
    assert got[101][0] == "x" * 100_000 and len(got[101][0]) == 100_000
    assert got[102] == ("", None)
    assert got[103] == (None, None)

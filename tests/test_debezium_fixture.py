"""Recorded Debezium-topic fixture replayed through the batch path
(r9, closing the live-CDC seam one notch further): REAL Debezium
change-event JSON — schema+payload envelopes, op codes c/r/u/d,
before/after images, PK-change in BOTH connector modes (split
DELETE+CREATE and single before/after update), log-compaction
tombstones, and a malformed op — wired bytes → debezium_envelope →
changes_for_table → apply_changes, asserted against an independent
driver-side oracle fold of the same recorded events.

Reference parity being pinned offline: the change-stream tail of
pkg/syncer/mongodb/mongodb.go:550-607 (op decode, replace/delete
folding) — here the wire producer is a stock Debezium connector
instead of a custom watcher, so a user can point the engine at a real
topic with no custom code.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sync_spark.operators.merge import apply_changes
from sync_spark.sources.cdc import (
    KAFKA_RAW_SCHEMA,
    changes_for_table,
    debezium_envelope,
)

ROW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)

# A minimal-but-real Debezium JSON schema block (the connector always
# publishes one unless schemas.enable=false); its CONTENT is ignored
# by the adapter — only $.payload matters — but its presence is what
# distinguishes the two converter layouts.
_KEY_SCHEMA_BLOCK = {
    "type": "struct",
    "fields": [{"type": "int64", "optional": False, "field": "id"}],
    "optional": False,
    "name": "dbserver1.inventory.users.Key",
}
_VALUE_SCHEMA_BLOCK = {
    "type": "struct",
    "fields": [
        {"type": "struct", "optional": True, "field": "before"},
        {"type": "struct", "optional": True, "field": "after"},
        {"type": "struct", "optional": False, "field": "source"},
        {"type": "string", "optional": False, "field": "op"},
        {"type": "int64", "optional": True, "field": "ts_ms"},
    ],
    "optional": False,
    "name": "dbserver1.inventory.users.Envelope",
}


def _key(id_):
    return json.dumps({"schema": _KEY_SCHEMA_BLOCK, "payload": {"id": id_}})


def _event(op, after, before=None, ts_ms=1704412800000, table="users"):
    return json.dumps(
        {
            "schema": _VALUE_SCHEMA_BLOCK,
            "payload": {
                "before": before,
                "after": after,
                "source": {
                    "version": "2.5.0.Final",
                    "connector": "mysql",
                    "name": "dbserver1",
                    "db": "inventory",
                    "table": table,
                },
                "op": op,
                "ts_ms": ts_ms,
            },
        }
    )


# The recorded topic: (key_json, value_json_or_None, offset). One
# partition (Debezium keys by PK; a single-table single-key-space
# fixture rides one partition, so offset IS the per-key order).
RECORDED = [
    # snapshot read (op r) of a pre-existing source row
    (_key(5), _event("r", {"id": 5, "name": "eve"}, ts_ms=1704412800001), 0),
    # plain insert
    (_key(1), _event("c", {"id": 1, "name": "a"}, ts_ms=1704412800002), 1),
    # plain update (before image present, PK unchanged)
    (
        _key(1),
        _event(
            "u",
            {"id": 1, "name": "b"},
            before={"id": 1, "name": "a"},
            ts_ms=1704412800003,
        ),
        2,
    ),
    # delete + its log-compaction tombstone
    (
        _key(5),
        _event("d", None, before={"id": 5, "name": "eve"}, ts_ms=1704412800004),
        3,
    ),
    (_key(5), None, 4),
    # PK change 2 → 3, SPLIT mode (what Debezium actually emits for a
    # key update): DELETE(old) + tombstone + CREATE(new)
    (
        _key(2),
        _event("d", None, before={"id": 2, "name": "two"}, ts_ms=1704412800005),
        5,
    ),
    (_key(2), None, 6),
    (_key(3), _event("c", {"id": 3, "name": "two-moved"}, ts_ms=1704412800005), 7),
    # PK change 4 → 6, NON-SPLIT mode (single update with before
    # image) — changes_for_table must synthesize the old-key delete
    (
        _key(6),
        _event(
            "u",
            {"id": 6, "name": "four-moved"},
            before={"id": 4, "name": "four"},
            ts_ms=1704412800006,
        ),
        8,
    ),
    # malformed op code — must SURFACE (NULL op), never silently drop
    (_key(9), _event("x", {"id": 9, "name": "junk"}, ts_ms=1704412800007), 9),
]

_TARGET_ROWS = [(2, "two"), (4, "four")]


def _oracle_fold():
    """Independent driver-side fold of the recorded wire bytes: parse
    each event the way a human reads the Debezium docs and apply it to
    a dict, with non-split PK changes deleting the before-key."""
    state = {i: n for i, n in _TARGET_ROWS}
    for _k, v, _off in RECORDED:
        if v is None:
            continue  # tombstone
        p = json.loads(v)["payload"]
        op = {"c": "insert", "r": "insert", "u": "update", "d": "delete"}.get(p["op"])
        if op is None:
            continue  # quarantined, not applied
        if op == "delete":
            state.pop(p["before"]["id"], None)
            continue
        if (
            op == "update"
            and p.get("before")
            and p["before"]["id"] != p["after"]["id"]
        ):
            state.pop(p["before"]["id"], None)
        state[p["after"]["id"]] = p["after"]["name"]
    return state


def _raw_frame(spark, records=None):
    import datetime

    rows = [
        (
            k.encode() if k is not None else None,
            v.encode() if v is not None else None,
            "dbserver1.inventory.users",
            0,
            off,
            datetime.datetime(2024, 1, 5, 0, 0, off % 60),
            0,
        )
        for k, v, off in (records or RECORDED)
    ]
    return spark.createDataFrame(rows, KAFKA_RAW_SCHEMA)


class TestDebeziumEnvelope:
    def test_wire_mapping(self, spark):
        env = debezium_envelope(_raw_frame(spark)).orderBy("seq").collect()
        # tombstones dropped: 10 records, 2 tombstones
        assert len(env) == 8
        by_seq = {r["seq"]: r for r in env}
        r0 = by_seq[0]
        assert r0["op"] == "insert" and r0["source_table"] == "users"
        assert json.loads(r0["key_json"]) == {"id": 5}
        assert json.loads(r0["after_json"]) == {"id": 5, "name": "eve"}
        assert r0["ts"].isoformat().startswith("2024-01-05")
        # delete: key-only, before image carried
        r3 = by_seq[3]
        assert r3["op"] == "delete" and r3["after_json"] is None
        assert json.loads(r3["before_key_json"])["id"] == 5
        # malformed op surfaces as NULL, never dropped
        assert by_seq[9]["op"] is None
        assert json.loads(by_seq[9]["after_json"])["id"] == 9

    def test_schemas_disabled_layout(self, spark):
        """JsonConverter schemas.enable=false publishes the event
        object at TOP level and the bare key struct — same envelope."""
        flat = [
            (
                json.dumps({"id": 7}),
                json.dumps(
                    {
                        "before": None,
                        "after": {"id": 7, "name": "flat"},
                        "source": {"table": "users"},
                        "op": "c",
                        "ts_ms": 1704412800009,
                    }
                ),
                0,
            )
        ]
        env = debezium_envelope(_raw_frame(spark, flat)).collect()
        assert len(env) == 1
        assert env[0]["op"] == "insert"
        assert json.loads(env[0]["key_json"]) == {"id": 7}
        assert json.loads(env[0]["after_json"])["name"] == "flat"

    def test_recorded_topic_fold_matches_oracle(self, spark):
        """The full path: wire bytes → envelope → typed changes →
        apply_changes MERGE == the independent oracle fold."""
        env = debezium_envelope(_raw_frame(spark))
        changes = changes_for_table(env, "users", ROW_SCHEMA, ["id"])
        # the malformed-op row is VISIBLE here (no-silent-drop
        # contract) — the streaming pipeline quarantines it to the
        # DLQ; this batch test drops it explicitly at the same point
        assert changes.filter(F.col("op").isNull()).count() == 1
        good = changes.filter(F.col("op").isNotNull())
        target = spark.createDataFrame(_TARGET_ROWS, ROW_SCHEMA)
        merged = apply_changes(target, good, ["id"])
        got = {r["id"]: r["name"] for r in merged.collect()}
        assert got == _oracle_fold()
        # the non-split PK change really moved the row
        assert 4 not in got and got[6] == "four-moved"
        # the split PK change too
        assert 2 not in got and got[3] == "two-moved"

    def test_idempotent_replay(self, spark):
        """Re-applying the same recorded topic (a consumer restart
        from an older offset) converges to the same state — the
        effectively-once posture on real wire data."""
        env = debezium_envelope(_raw_frame(spark))
        changes = changes_for_table(env, "users", ROW_SCHEMA, ["id"]).filter(
            F.col("op").isNotNull()
        )
        target = spark.createDataFrame(_TARGET_ROWS, ROW_SCHEMA)
        once = apply_changes(target, changes, ["id"])
        twice = apply_changes(once, changes, ["id"])
        assert sorted(map(tuple, once.collect())) == sorted(
            map(tuple, twice.collect())
        )


class TestDebeziumMongoLayout:
    """The Debezium MongoDB connector (the reference's actual source,
    pkg/syncer/mongodb) emits ``payload.after`` as a JSON STRING (the
    extended-JSON rendering of the document), not a nested object —
    get_json_object returns the string itself in that case, which IS
    the after-image JSON, so the adapter handles both renderings with
    the same expression. Pin it."""

    def test_after_as_string_parses(self, spark):
        import datetime

        v = json.dumps(
            {
                "schema": _VALUE_SCHEMA_BLOCK,
                "payload": {
                    "before": None,
                    # Mongo connector: after is a STRING of JSON
                    "after": json.dumps({"id": 11, "name": "mongo-doc"}),
                    # the REAL Mongo-connector source block: db/rs/
                    # collection — there is NO "table" field (the
                    # adapter must read source.collection)
                    "source": {
                        "connector": "mongodb",
                        "name": "dbserver1",
                        "db": "inventory",
                        "rs": "rs0",
                        "collection": "users",
                    },
                    "op": "c",
                    "ts_ms": 1704412800010,
                },
            }
        )
        raw = spark.createDataFrame(
            [
                (
                    _key(11).encode(),
                    v.encode(),
                    "dbserver1.inventory.users",
                    0,
                    0,
                    datetime.datetime(2024, 1, 5),
                    0,
                )
            ],
            KAFKA_RAW_SCHEMA,
        )
        env = debezium_envelope(raw)
        changes = changes_for_table(env, "users", ROW_SCHEMA, ["id"])
        rows = changes.collect()
        assert len(rows) == 1
        assert rows[0]["id"] == 11 and rows[0]["name"] == "mongo-doc"
        assert rows[0]["op"] == "insert"

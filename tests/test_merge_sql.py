"""SQL MERGE INTO dialect (operators/passthrough.py): the S12/S13
merge semantics as a statement, compiled onto merge.apply_changes —
the reference's replace-document upsert/delete surface expressed in
ANSI MERGE grammar (restricted to full-after-image arms)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from sync_spark.operators.passthrough import (
    dispatch_execute,
    parse_merge_sql,
    run_merge_sql,
)


@pytest.fixture()
def frames(spark):
    tgt = spark.createDataFrame(
        [Row(id=1, v="a", n=10), Row(id=2, v="b", n=20), Row(id=3, v="c", n=30)]
    )
    src = spark.createDataFrame(
        [
            Row(id=2, v="B", n=200, dead=False),
            Row(id=3, v="c", n=30, dead=True),
            Row(id=4, v="d", n=40, dead=False),
        ]
    )
    return {"t": tgt, "s": src}


FULL = """MERGE INTO t USING s ON t.id = s.id
WHEN MATCHED AND s.dead = true THEN DELETE
WHEN MATCHED THEN UPDATE SET *
WHEN NOT MATCHED THEN INSERT *"""


def test_parse_merge_forms():
    spec = parse_merge_sql(FULL)
    assert (spec.target, spec.source) == ("t", "s")
    assert spec.keys == [("id", "id")]
    assert spec.matched_delete == "s.dead = true"
    assert spec.has_update and spec.has_insert

    spec = parse_merge_sql(
        "MERGE INTO tbl AS a USING (SELECT 1 AS k) b ON b.k = a.k "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert spec.source.startswith("(") and spec.s_alias == "b"
    assert spec.keys == [("k", "k")]  # swapped ON order still maps to target
    assert not spec.has_update and spec.has_insert and spec.matched_delete is None

    spec = parse_merge_sql(
        "MERGE INTO x USING y ON x.a = y.b AND x.c = y.d WHEN MATCHED THEN DELETE"
    )
    assert spec.keys == [("a", "b"), ("c", "d")]
    assert spec.matched_delete == ""  # unconditional


@pytest.mark.parametrize(
    "bad",
    [
        "MERGE t USING s ON t.id = s.id WHEN MATCHED THEN DELETE",  # not MERGE INTO
        "MERGE INTO t USING s WHEN MATCHED THEN DELETE",  # no ON
        "MERGE INTO t USING s ON t.id > s.id WHEN MATCHED THEN DELETE",  # not equality
        "MERGE INTO t USING s ON t.id = s.id",  # no WHEN
        "MERGE INTO t USING s ON t.id = s.id WHEN NOT MATCHED THEN DELETE",
        "MERGE INTO t USING s ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = 1",
        "MERGE INTO t USING s ON z.id = s.id WHEN MATCHED THEN DELETE",  # alias drift
    ],
)
def test_parse_merge_rejects(bad):
    with pytest.raises(ValueError):
        parse_merge_sql(bad)


def test_merge_full_semantics(frames):
    kind, affected, new = dispatch_execute(FULL, resolve=frames.__getitem__)
    assert kind == "merge"
    assert sorted(map(tuple, affected.collect())) == [("delete", 1), ("upsert", 2)]
    assert sorted((r.id, r.v, r.n) for r in new.collect()) == [
        (1, "a", 10),  # untouched
        (2, "B", 200),  # replaced
        (4, "d", 40),  # inserted; 3 deleted
    ]


def test_merge_single_arm_semantics(frames):
    upd = "MERGE INTO t USING s ON t.id = s.id WHEN MATCHED THEN UPDATE SET *"
    _, _, new = dispatch_execute(upd, resolve=frames.__getitem__)
    assert sorted((r.id, r.v) for r in new.collect()) == [
        (1, "a"), (2, "B"), (3, "c")
    ]  # id=4 NOT inserted
    ins = "MERGE INTO t USING s ON t.id = s.id WHEN NOT MATCHED THEN INSERT *"
    _, _, new = dispatch_execute(ins, resolve=frames.__getitem__)
    assert sorted((r.id, r.v) for r in new.collect()) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d")
    ]  # matched rows untouched


def test_merge_subquery_source(spark, frames):
    q = (
        "MERGE INTO t AS a USING (SELECT 5 AS id, 'e' AS v, 50 AS n) b "
        "ON a.id = b.id WHEN NOT MATCHED THEN INSERT *"
    )
    _, _, new = dispatch_execute(q, resolve=frames.__getitem__, run_sql=spark.sql)
    assert (5, "e", 50) in {(r.id, r.v, r.n) for r in new.collect()}
    with pytest.raises(ValueError, match="SQL runner"):
        dispatch_execute(q, resolve=frames.__getitem__)


def test_merge_null_condition_rows_fall_through_to_update(spark):
    """3VL: a NULL delete condition neither deletes nor drops the row —
    it flows to the update arm (the after-image still lands)."""
    tgt = spark.createDataFrame([Row(id=1, v="a")])
    src = spark.createDataFrame([Row(id=1, v="A", dead=None)], "id long, v string, dead boolean")
    q = (
        "MERGE INTO t USING s ON t.id = s.id "
        "WHEN MATCHED AND s.dead = true THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET *"
    )
    _, _, new = dispatch_execute(q, resolve={"t": tgt, "s": src}.__getitem__)
    assert [(r.id, r.v) for r in new.collect()] == [(1, "A")]


def test_merge_ansi_restrictions(spark, frames):
    dup = frames["s"].unionByName(frames["s"])
    # default: the guard is IN-PLAN (zero extra jobs) — it raises when
    # the merge job actually runs, on the new-state AND the
    # affected-counts frames alike
    affected, new = run_merge_sql(FULL, resolve={"t": frames["t"], "s": dup}.__getitem__)
    with pytest.raises(Exception, match="duplicate keys"):
        new.collect()
    with pytest.raises(Exception, match="duplicate keys"):
        affected.collect()
    # eager mode: fail-fast driver-side ValueError at statement time
    with pytest.raises(ValueError, match="duplicate keys"):
        run_merge_sql(
            FULL, resolve={"t": frames["t"], "s": dup}.__getitem__, eager_guard=True
        )
    slim = frames["s"].drop("n")
    with pytest.raises(ValueError, match="missing target columns"):
        run_merge_sql(FULL, resolve={"t": frames["t"], "s": slim}.__getitem__)
    q = (
        "MERGE INTO t USING s ON t.id = s.id "
        "WHEN MATCHED AND t.n > 5 THEN DELETE WHEN MATCHED THEN UPDATE SET *"
    )
    with pytest.raises(ValueError, match="SOURCE row only"):
        run_merge_sql(q, resolve=frames.__getitem__)


def test_merge_dup_keys_with_at_most_one_action_are_allowed(spark):
    """The guard's real invariant (ADVICE r7): raise iff a key yields
    >= 2 change ACTIONS. Duplicate source keys whose extra rows
    produce no action are deterministic and must NOT raise — pinned
    here for the insert-only-with-matched-dups case (matched rows
    yield zero actions) and the conditional-DELETE-no-UPDATE case
    (rows failing the condition fall out of the only arm)."""
    tgt = spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")])
    # id=1 duplicated but MATCHED under insert-only → 0 actions each
    src = spark.createDataFrame(
        [Row(id=1, v="x"), Row(id=1, v="y"), Row(id=3, v="c")]
    )
    ins = "MERGE INTO t USING s ON t.id = s.id WHEN NOT MATCHED THEN INSERT *"
    affected, new = run_merge_sql(ins, resolve={"t": tgt, "s": src}.__getitem__)
    assert sorted(map(tuple, affected.collect())) == [("upsert", 1)]
    assert sorted((r.id, r.v) for r in new.collect()) == [
        (1, "a"), (2, "b"), (3, "c")
    ]
    # conditional DELETE, no UPDATE arm: only ONE dup row passes the
    # condition → 1 action → allowed, deterministic
    src2 = spark.createDataFrame(
        [Row(id=1, v="x", dead=True), Row(id=1, v="y", dead=False)]
    )
    q = "MERGE INTO t USING s ON t.id = s.id WHEN MATCHED AND s.dead = true THEN DELETE"
    affected, new = run_merge_sql(q, resolve={"t": tgt, "s": src2}.__getitem__)
    assert sorted(map(tuple, affected.collect())) == [("delete", 1)]
    assert sorted(r.id for r in new.collect()) == [2]
    # ...but BOTH dups passing the condition = 2 delete actions → raise
    src3 = spark.createDataFrame(
        [Row(id=1, v="x", dead=True), Row(id=1, v="y", dead=True)]
    )
    _, new = run_merge_sql(q, resolve={"t": tgt, "s": src3}.__getitem__)
    with pytest.raises(Exception, match="duplicate keys"):
        new.collect()


def test_merge_delete_arm_never_touches_not_matched_rows(spark):
    """ANSI: WHEN MATCHED ... DELETE applies to matched rows ONLY — a
    not-matched source row satisfying the delete condition must still
    insert through the NOT MATCHED arm, never vanish."""
    tgt = spark.createDataFrame([Row(id=1, v="a", dead=False)])
    src = spark.createDataFrame(
        [
            Row(id=1, v="A", dead=True),  # matched + dead → delete
            Row(id=5, v="e", dead=True),  # NOT matched + dead → INSERT
            Row(id=6, v="f", dead=False),  # NOT matched → insert
        ]
    )
    q = (
        "MERGE INTO t USING s ON t.id = s.id "
        "WHEN MATCHED AND s.dead = true THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    _, affected, new = dispatch_execute(q, resolve={"t": tgt, "s": src}.__getitem__)
    assert sorted(map(tuple, affected.collect())) == [("delete", 1), ("upsert", 2)]
    assert sorted((r.id, r.v) for r in new.collect()) == [(5, "e"), (6, "f")]
    # unconditional delete + insert: matched rows die, new rows land
    q2 = (
        "MERGE INTO t USING s ON t.id = s.id "
        "WHEN MATCHED THEN DELETE WHEN NOT MATCHED THEN INSERT *"
    )
    _, _, new = dispatch_execute(q2, resolve={"t": tgt, "s": src}.__getitem__)
    assert sorted(r.id for r in new.collect()) == [5, 6]


def test_merge_rejects_unparsed_arms_and_fused_conditions():
    """An arm outside the restricted grammar must raise, never be
    silently skipped (altered semantics) or fused into the previous
    arm's condition by the lazy capture."""
    with pytest.raises(ValueError, match="unsupported MERGE"):
        parse_merge_sql(
            "MERGE INTO t USING s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    with pytest.raises(ValueError, match="unsupported MERGE"):
        parse_merge_sql(
            "MERGE INTO t USING s ON t.id = s.id "
            "WHEN MATCHED AND s.x = 1 THEN FROB "
            "WHEN NOT MATCHED THEN INSERT *"
        )


def test_merge_subquery_with_string_literal_parens(spark, frames):
    """Parens inside string literals must not unbalance the USING
    subquery scanner."""
    q = (
        "MERGE INTO t AS a USING (SELECT 8 AS id, ')' || 'x(' AS v, 1 AS n) b "
        "ON a.id = b.id WHEN NOT MATCHED THEN INSERT *"
    )
    spec = parse_merge_sql(q)
    assert spec.source == "(SELECT 8 AS id, ')' || 'x(' AS v, 1 AS n)"
    _, _, new = dispatch_execute(q, resolve=frames.__getitem__, run_sql=spark.sql)
    assert (8, ")x(", 1) in {(r.id, r.v, r.n) for r in new.collect()}


def test_merge_multi_key(spark):
    tgt = spark.createDataFrame([Row(a=1, b=1, v="x"), Row(a=1, b=2, v="y")])
    src = spark.createDataFrame([Row(a=1, b=2, v="Y"), Row(a=2, b=1, v="z")])
    q = (
        "MERGE INTO t USING s ON t.a = s.a AND t.b = s.b "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    _, _, new = dispatch_execute(q, resolve={"t": tgt, "s": src}.__getitem__)
    assert sorted((r.a, r.b, r.v) for r in new.collect()) == [
        (1, 1, "x"), (1, 2, "Y"), (2, 1, "z")
    ]


def test_merge_through_sync_task_execute(spark, tmp_path):
    """E2e on a real task target: MERGE INTO the mapped table through
    SyncTask.execute — the /sql/execute surface grows the statement."""
    from tests.test_engine_kv import SPEC_JSON, USERS_SCHEMA
    from sync_spark.engine import SyncTask
    from sync_spark.spec import SyncSpec

    spec = SyncSpec.from_json(SPEC_JSON)
    source = spark.createDataFrame(
        [Row(id=i, name=f"u{i}", email=f"u{i}@x.io") for i in range(1, 4)],
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
    kind, affected, new_state = task.execute(
        "MERGE INTO users_t AS t USING ("
        "  SELECT 2 AS id, 'u2x' AS name, 'u2x@x.io' AS email"
        "  UNION ALL SELECT 9, 'u9', 'u9@x.io'"
        ") s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    assert kind == "merge"
    assert sorted(map(tuple, affected.collect())) == [("upsert", 2)]
    assert sorted((r.id, r.name) for r in new_state.collect()) == [
        (1, "u1"), (2, "u2x"), (3, "u3"), (9, "u9")
    ]


def test_execute_apply_persists_new_state(spark, tmp_path):
    """execute_apply replaces the mapped target with a write verb's
    post-state — atomically, keeping the bucketed layout — so a
    subsequent read (and a plain execute) sees the applied data.
    Redis writes are refused (no mapped table target)."""
    import pytest as _pt

    from tests.test_engine_kv import SPEC_JSON, USERS_SCHEMA
    from sync_spark.engine import SyncTask
    from sync_spark.sources.bucketed import read_meta, read_target
    from sync_spark.spec import SyncSpec

    spec = SyncSpec.from_json(SPEC_JSON)
    source = spark.createDataFrame(
        [Row(id=i, name=f"u{i}", email=f"u{i}@x.io") for i in range(1, 4)],
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
    path = task._target_paths()["users_t"]
    meta_before = read_meta(path)
    kind, _, applied = task.execute_apply(
        "MERGE INTO users_t AS t USING (SELECT 9 AS id, 'u9' AS name, "
        "'u9@x.io' AS email) s ON t.id = s.id "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert kind == "merge" and applied == path
    assert read_meta(path) == meta_before  # layout contract preserved
    assert sorted(r.id for r in read_target(spark, path).collect()) == [1, 2, 3, 9]
    # a Mongo write verb applies the same way
    kind, _, applied = task.execute_apply("db.users_t.deleteMany({id: {$gte: 9}})")
    assert kind == "mongo_write" and applied == path
    assert sorted(r.id for r in read_target(spark, path).collect()) == [1, 2, 3]
    # reads apply nothing
    kind, _, applied = task.execute_apply("db.users_t.find({})")
    assert kind == "mongo_find" and applied is None
    # Redis KV state has no mapped target
    kv = spark.createDataFrame([("a", "1")], "key string, value string")
    with _pt.raises(ValueError, match="no mapped table target"):
        task.execute_apply("SET a 2", kv=kv)

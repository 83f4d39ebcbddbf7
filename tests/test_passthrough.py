"""Mongo-JS and Redis passthrough dialects (operators/passthrough.py)
— the reference's /sql/execute pattern-matched branches
(pkg/api/auth_handler.go:1267-1883) re-expressed on DataFrames."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sync_spark.operators.passthrough import (
    mongo_filter_to_column,
    parse_mongo_js,
    run_mongo_js,
    run_redis,
)


@pytest.fixture()
def users(spark):
    return spark.createDataFrame(
        [
            Row(uid=1, name="ann", age=30, city="tokyo"),
            Row(uid=2, name="bob", age=25, city="osaka"),
            Row(uid=3, name="cho", age=35, city="tokyo"),
            Row(uid=4, name="dee", age=28, city="kyoto"),
            Row(uid=5, name="eve", age=35, city="tokyo"),
        ]
    )


def _resolve(df):
    return lambda coll: df


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------


def test_parse_find_chain():
    q = parse_mongo_js(
        "db.users.find({age: {$gte: 28}}, {name: 1, age: 1})"
        ".sort({age: -1, name: 1}).skip(1).limit(2)"
    )
    assert q.collection == "users" and not q.count
    assert q.filter == {"age": {"$gte": 28}}
    assert q.projection == {"name": 1, "age": 1}
    assert q.sort == [("age", -1), ("name", 1)]
    assert q.skip == 1 and q.limit == 2


def test_parse_relaxed_js_and_count():
    q = parse_mongo_js("db.users.countDocuments({city: 'tokyo'})")
    assert q.count and q.filter == {"city": "tokyo"}
    with pytest.raises(ValueError, match="not a recognized"):
        parse_mongo_js("SELECT 1")


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------


def test_find_filter_sort_limit(users):
    out = run_mongo_js(
        "db.users.find({city: 'tokyo'}, {name: 1, age: 1}).sort({age: -1, name: 1}).limit(2)",
        _resolve(users),
    ).collect()
    assert [(r.name, r.age) for r in out] == [("cho", 35), ("eve", 35)]


def test_find_operators_and_or_in(users):
    out = run_mongo_js(
        "db.users.find({$or: [{age: {$lt: 26}}, {city: {$in: ['kyoto']}}]}).sort({uid: 1})",
        _resolve(users),
    ).collect()
    assert [r.uid for r in out] == [2, 4]

    out = run_mongo_js(
        "db.users.find({age: {$gte: 28, $lte: 35}, city: {$ne: 'tokyo'}})",
        _resolve(users),
    ).collect()
    assert [r.uid for r in out] == [4]


def test_find_skip_offset(users):
    out = run_mongo_js(
        "db.users.find({}).sort({uid: 1}).skip(3).limit(5)", _resolve(users)
    ).collect()
    assert [r.uid for r in out] == [4, 5]


def test_count_documents(users):
    out = run_mongo_js(
        "db.users.countDocuments({city: 'tokyo'})", _resolve(users)
    ).collect()
    assert out[0].n == 3


def test_filter_pushdown_reaches_scan(spark, tmp_path):
    """The Mongo branch must compile to the SAME pushdown-able plan as
    the SQL branch: a $gt filter shows up in PushedFilters."""
    p = str(tmp_path / "u")
    spark.createDataFrame([Row(uid=i, age=20 + i) for i in range(50)]).write.parquet(p)
    df = run_mongo_js(
        "db.u.find({age: {$gt: 40}})", lambda c: spark.read.parquet(p)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(age,40)" in plan


def test_unsupported_mongo_operator(users):
    with pytest.raises(ValueError, match="unsupported Mongo operator"):
        mongo_filter_to_column({"age": {"$regex": "x"}})


# ---------------------------------------------------------------------------
# Redis
# ---------------------------------------------------------------------------


@pytest.fixture()
def kv(spark):
    return spark.createDataFrame(
        [Row(key=f"user:{i}", value=f"v{i}") for i in range(1, 6)]
        + [Row(key="cfg:mode", value="on")]
    )


def test_redis_keys_glob(kv):
    assert [r.key for r in run_redis("KEYS user:*", kv).collect()] == [
        f"user:{i}" for i in range(1, 6)
    ]
    assert [r.key for r in run_redis("KEYS user:?", kv).collect()] == [
        f"user:{i}" for i in range(1, 6)
    ]
    assert [r.key for r in run_redis("KEYS *:mode", kv).collect()] == ["cfg:mode"]
    # glob is anchored: no substring matches
    assert run_redis("KEYS ser:*", kv).count() == 0


def test_redis_get_mget_exists_dbsize(kv):
    assert run_redis("GET user:3", kv).collect()[0].value == "v3"
    assert run_redis("GET nope", kv).count() == 0
    got = run_redis("MGET user:1 user:4 nope", kv).collect()
    assert [(r.key, r.value) for r in got] == [("user:1", "v1"), ("user:4", "v4")]
    assert run_redis("EXISTS user:1 nope", kv).collect()[0].n == 1
    assert run_redis("DBSIZE", kv).collect()[0].dbsize == 6


def test_redis_set_del_state(kv):
    kv2 = run_redis("SET user:3 updated", kv)
    assert kv2.filter(F.col("key") == "user:3").collect()[0].value == "updated"
    assert kv2.count() == 6  # upsert, not append
    kv3 = run_redis("SET brand:new x", kv2)
    assert kv3.count() == 7
    kv4 = run_redis("DEL user:1 user:2 nope", kv3)
    assert kv4.count() == 5
    with pytest.raises(ValueError, match="unsupported Redis"):
        run_redis("FLUSHALL", kv)


# ---------------------------------------------------------------------------
# Mongo JS write verbs
# ---------------------------------------------------------------------------


def test_mongo_insert_many(users):
    from sync_spark.operators.passthrough import run_mongo_js_write

    new, affected = run_mongo_js_write(
        "db.users.insertMany([{uid: 6, name: 'fox', age: 40, city: 'nara'},"
        " {uid: 7, name: 'gil', age: 22, city: 'kobe'}])",
        users,
    )
    assert new.count() == 7
    a = affected.collect()[0]
    assert (a.op, a.affected_rows) == ("insertMany", 2)
    assert new.filter(F.col("uid") == 6).collect()[0].name == "fox"


def test_mongo_insert_unknown_field_raises(users):
    from sync_spark.operators.passthrough import run_mongo_js_write

    with pytest.raises(ValueError, match="not in collection schema"):
        run_mongo_js_write("db.users.insertMany([{uid: 9, bogus: 1}])", users)


def test_mongo_update_many_set(users):
    from sync_spark.operators.passthrough import run_mongo_js_write

    new, affected = run_mongo_js_write(
        "db.users.updateMany({city: 'tokyo'}, {$set: {age: 99}})", users
    )
    rows = {r.uid: r.age for r in new.collect()}
    assert rows == {1: 99, 2: 25, 3: 99, 4: 28, 5: 99}
    assert affected.collect()[0].affected_rows == 3
    # non-$set update forms rejected, like the reference
    with pytest.raises(ValueError, match="\\$set"):
        run_mongo_js_write("db.users.updateMany({}, {$inc: {age: 1}})", users)


def test_mongo_delete_many(users):
    from sync_spark.operators.passthrough import run_mongo_js_write

    new, affected = run_mongo_js_write(
        "db.users.deleteMany({age: {$gte: 30}})", users
    )
    assert sorted(r.uid for r in new.collect()) == [2, 4]
    assert affected.collect()[0].affected_rows == 3
    # match-all delete empties the collection but keeps the schema
    emptied, aff2 = run_mongo_js_write("db.users.deleteMany({})", users)
    assert emptied.count() == 0 and emptied.columns == users.columns
    assert aff2.collect()[0].affected_rows == 5


def test_dispatch_execute_routes_all_dialects(spark, users):
    from sync_spark.operators.passthrough import dispatch_execute

    kv = spark.createDataFrame([Row(key="a", value="1"), Row(key="b", value="2")])
    users.createOrReplaceTempView("users_v")

    kind, out, st = dispatch_execute(
        "db.users.find({age: {$gte: 30}}).limit(2)", resolve=lambda c: users
    )
    assert kind == "mongo_find" and st is None and out.count() == 2

    kind, affected, new_state = dispatch_execute(
        "db.users.deleteMany({age: {$lt: 30}})", resolve=lambda c: users
    )
    assert kind == "mongo_write" and affected.collect()[0].affected_rows == 2
    assert new_state.count() == 3

    kind, out, st = dispatch_execute("KEYS *", resolve=lambda c: users, kv=kv)
    assert kind == "redis" and [r.key for r in out.collect()] == ["a", "b"]

    kind, affected, new_kv = dispatch_execute("DEL a", resolve=lambda c: users, kv=kv)
    assert kind == "redis_write" and new_kv.count() == 1

    kind, out, st = dispatch_execute(
        "SELECT COUNT(*) AS n FROM users_v", resolve=lambda c: users, kv=kv,
        run_sql=lambda q: spark.sql(q),
    )
    assert kind == "sql" and out.collect()[0].n == 5


def test_mongo_insert_one(users):
    from sync_spark.operators.passthrough import run_mongo_js_write

    new, affected = run_mongo_js_write(
        "db.users.insertOne({uid: 6, name: 'fox', age: 40, city: 'nara'})", users
    )
    assert new.count() == 6
    a = affected.collect()[0]
    assert (a.op, a.affected_rows) == ("insertOne", 1)


def test_mongo_update_one_single_row(users):
    from sync_spark.operators.passthrough import run_mongo_js_write

    stmt = "db.users.updateOne({city: 'tokyo'}, {$set: {age: 99}})"
    new, affected = run_mongo_js_write(stmt, users)
    rows = new.collect()
    assert affected.collect()[0].affected_rows == 1
    changed = [r.uid for r in rows if r.age == 99]
    assert len(changed) == 1 and changed[0] in (1, 3, 5)
    # deterministic: same row wins on re-run
    new2, _ = run_mongo_js_write(stmt, users)
    assert [r.uid for r in new2.collect() if r.age == 99] == changed
    # no-match updateOne: zero affected, state unchanged
    new3, aff3 = run_mongo_js_write(
        "db.users.updateOne({city: 'nowhere'}, {$set: {age: 1}})", users
    )
    assert aff3.collect()[0].affected_rows == 0
    assert sorted(r.age for r in new3.collect()) == sorted(r.age for r in users.collect())


def test_mongo_delete_one_and_duplicates(spark, users):
    from pyspark.sql import Row as R
    from sync_spark.operators.passthrough import run_mongo_js_write

    new, affected = run_mongo_js_write("db.users.deleteOne({city: 'tokyo'})", users)
    assert affected.collect()[0].affected_rows == 1
    assert new.count() == 4
    assert new.filter(F.col("city") == "tokyo").count() == 2
    # exact-duplicate rows: deleteOne removes exactly ONE copy
    dup = spark.createDataFrame([R(k=1, v="x"), R(k=1, v="x"), R(k=2, v="y")])
    new2, aff2 = run_mongo_js_write("db.c.deleteOne({k: 1})", dup)
    assert aff2.collect()[0].affected_rows == 1
    assert new2.filter(F.col("k") == 1).count() == 1


def test_mongo_remove_verb(users):
    from sync_spark.operators.passthrough import run_mongo_js_write

    # remove(filter) deletes ALL matches, like Mongo
    new, affected = run_mongo_js_write("db.users.remove({city: 'tokyo'})", users)
    assert affected.collect()[0].affected_rows == 3 and new.count() == 2
    # remove(filter, true) is justOne
    new1, aff1 = run_mongo_js_write("db.users.remove({city: 'tokyo'}, true)", users)
    assert aff1.collect()[0].affected_rows == 1 and new1.count() == 4


def test_mongo_docs_push_loop(users):
    """The reference's own documented insertMany loop form
    (pkg/api/auth_handler.go:1539-1602) routes through dispatch and
    inserts count sequential documents built from the push template."""
    from sync_spark.operators.passthrough import dispatch_execute, parse_push_loop_docs

    stmt = (
        "var docs = []; let count = 3; "
        "for (let i = 1; i <= count; i++) { "
        "docs.push({uid: 10 + i, name: 'user' + i, age: 20, "
        "city: 'user' + i + '@example.com'}); } "
        "db.users.insertMany(docs);"
    )
    coll, docs = parse_push_loop_docs(stmt)
    assert coll == "users" and len(docs) == 3
    assert docs[0] == {"uid": 11, "name": "user1", "age": 20, "city": "user1@example.com"}
    kind, affected, new_state = dispatch_execute(stmt, resolve=lambda c: users)
    assert kind == "mongo_write"
    assert affected.collect()[0].affected_rows == 3
    assert new_state.count() == 8
    assert new_state.filter(F.col("uid") == 13).collect()[0].name == "user3"
    # default count (no let count=N) matches the reference fallback of 5
    stmt2 = (
        "var docs = []; for (var j = 0; j < n; j++) "
        "{ docs.push({uid: j, name: 'u', age: 1, city: 'x'}); } "
        "db.users.insertMany(docs);"
    )
    _, docs2 = parse_push_loop_docs(stmt2)
    assert len(docs2) == 5 and docs2[0]["uid"] == 0 and docs2[4]["uid"] == 4


def test_dispatch_routes_new_verbs(spark, users):
    from sync_spark.operators.passthrough import dispatch_execute

    kind, affected, st = dispatch_execute(
        "db.users.updateOne({city: 'osaka'}, {$set: {age: 26}})",
        resolve=lambda c: users,
    )
    assert kind == "mongo_write" and affected.collect()[0].affected_rows == 1
    assert st.filter(F.col("uid") == 2).collect()[0].age == 26

    kv = spark.createDataFrame(
        [("a", "1", 5000), ("b", "2", None)], "key string, value string, ttl_ms long"
    )
    # TTL reads route through the redis arm (was: fell through to SQL)
    kind, out, st = dispatch_execute("TTL a", resolve=lambda c: users, kv=kv)
    assert kind == "redis" and st is None and out.collect()[0].ttl == 5
    # EXPIRE/PERSIST/SETEX are writes: new KV state comes back
    kind, affected, new_kv = dispatch_execute("EXPIRE b 30", resolve=lambda c: users, kv=kv)
    assert kind == "redis_write"
    from sync_spark.operators.passthrough import run_redis
    assert run_redis("TTL b", new_kv).collect()[0].ttl == 30
    kind, _, new_kv2 = dispatch_execute("PERSIST a", resolve=lambda c: users, kv=kv)
    assert kind == "redis_write" and run_redis("TTL a", new_kv2).collect()[0].ttl == -1
    kind, _, new_kv3 = dispatch_execute("SETEX c 60 v9", resolve=lambda c: users, kv=kv)
    assert kind == "redis_write" and new_kv3.count() == 3
    assert run_redis("TTL c", new_kv3).collect()[0].ttl == 60


def test_redis_ttl_family(spark):
    from sync_spark.operators.passthrough import run_redis

    kv = spark.createDataFrame(
        [("a", "1", 5000), ("b", "2", None), ("c", "3", None)],
        "key string, value string, ttl_ms long",
    )
    # TTL: seconds / -1 no expiry / -2 missing
    assert run_redis("TTL a", kv).collect()[0].ttl == 5
    # nearest-rounding parity with Redis ttlGenericCommand
    kv1999 = spark.createDataFrame([("z", "9", 1999)], "key string, value string, ttl_ms long")
    assert run_redis("TTL z", kv1999).collect()[0].ttl == 2
    assert run_redis("TTL b", kv).collect()[0].ttl == -1
    assert run_redis("TTL nope", kv).collect()[0].ttl == -2

    after = run_redis("EXPIRE b 30", kv)
    assert run_redis("TTL b", after).collect()[0].ttl == 30
    assert run_redis("TTL a", after).collect()[0].ttl == 5  # others untouched

    cleared = run_redis("PERSIST a", kv)
    assert run_redis("TTL a", cleared).collect()[0].ttl == -1

    setex = run_redis("SETEX d 60 v4", kv)
    assert run_redis("TTL d", setex).collect()[0].ttl == 60
    assert run_redis("GET d", setex).collect()[0].value == "v4"
    assert setex.count() == 4

    # ttl-less frame: TTL answers -1/-2, EXPIRE adds the column
    plain = spark.createDataFrame([("x", "9")], "key string, value string")
    assert run_redis("TTL x", plain).collect()[0].ttl == -1
    assert run_redis("TTL y", plain).collect()[0].ttl == -2
    with_ttl = run_redis("EXPIRE x 10", plain)
    assert run_redis("TTL x", with_ttl).collect()[0].ttl == 10


# ---------------------------------------------------------------------------
# Mongo aggregate() pipeline
# ---------------------------------------------------------------------------


def test_mongo_aggregate_group_sort(users):
    from sync_spark.operators.passthrough import run_mongo_aggregate

    out = run_mongo_aggregate(
        "db.users.aggregate(["
        "{$match: {age: {$gte: 25}}}, "
        "{$group: {_id: '$city', n: {$sum: 1}, max_age: {$max: '$age'}}}, "
        "{$sort: {n: -1, _id: 1}}"
        "])",
        _resolve(users),
    ).collect()
    assert [(r._id, r.n, r.max_age) for r in out] == [
        ("tokyo", 3, 35), ("kyoto", 1, 28), ("osaka", 1, 25),
    ]


def test_mongo_aggregate_global_group_and_project(users):
    from sync_spark.operators.passthrough import run_mongo_aggregate

    out = run_mongo_aggregate(
        "db.users.aggregate([{$group: {_id: null, total: {$sum: '$age'}, n: {$count: {}}}}])",
        _resolve(users),
    ).collect()[0]
    # Mongo returns _id: null for the global group — same shape as
    # the '$field' form
    assert (out._id, out.total, out.n) == (None, 153.0, 5)

    ren = run_mongo_aggregate(
        "db.users.aggregate([{$match: {uid: 1}}, {$project: {who: '$name', uid: 1}}])",
        _resolve(users),
    ).collect()[0]
    assert (ren.who, ren.uid) == ("ann", 1)


def test_mongo_aggregate_skip_limit_and_errors(users):
    import pytest as _pt
    from sync_spark.operators.passthrough import dispatch_execute, run_mongo_aggregate

    out = run_mongo_aggregate(
        "db.users.aggregate([{$sort: {uid: 1}}, {$skip: 2}, {$limit: 2}])",
        _resolve(users),
    ).collect()
    assert [r.uid for r in out] == [3, 4]

    with _pt.raises(ValueError, match="unsupported pipeline stage"):
        run_mongo_aggregate("db.users.aggregate([{$lookup: {}}])", _resolve(users))
    with _pt.raises(ValueError, match="unsupported accumulator"):
        run_mongo_aggregate(
            "db.users.aggregate([{$group: {_id: null, x: {$stdDevPop: '$age'}}}])",
            _resolve(users),
        )

    kind, out, st = dispatch_execute(
        "db.users.aggregate([{$group: {_id: '$city', n: {$sum: 1}}}, {$sort: {_id: 1}}])",
        resolve=lambda c: users,
    )
    assert kind == "mongo_aggregate" and st is None
    assert [(r._id, r.n) for r in out.collect()] == [("kyoto", 1), ("osaka", 1), ("tokyo", 3)]


def test_redis_del_keeps_null_key_rows(spark):
    from pyspark.sql import Row as R

    kv = spark.createDataFrame(
        [R(key="a", value="1"), R(key=None, value="orphan"), R(key="b", value="2")]
    )
    out = run_redis("DEL a", kv)
    rows = {r.key: r.value for r in out.collect()}
    # 3VL guard: deleting 'a' must not drop the unrelated NULL-key row
    assert rows == {None: "orphan", "b": "2"}

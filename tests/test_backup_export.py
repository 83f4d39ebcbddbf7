"""Backup planning + export writers: regex expansion, prefix
grouping, date-suffix pruning, JSONL/CSV artifacts with the
reference's quoting/NULL conventions."""

from __future__ import annotations

import csv
import glob
import gzip
from datetime import date, datetime

from pyspark.sql import Row

from sync_spark.plans.backup import (
    ExportUnit,
    expand_tables,
    group_by_prefix,
    plan_export,
    prune_tables,
    render_file_name,
    split_suffix,
    table_time_range,
)
from sync_spark.sources.writers import export_group, read_export_jsonl

CATALOG = [
    "users",
    "orders_202401",
    "orders_202402",
    "orders_202403",
    "logs_20240115",
    "logs_20240116",
    "archive_2023",
    "misc_7",
]


def test_expand_literal_and_regex():
    assert expand_tables(CATALOG, ["users", "nope"], is_regex=False) == ["users"]
    assert expand_tables(CATALOG, [r"^orders_"], is_regex=True) == [
        "orders_202401",
        "orders_202402",
        "orders_202403",
    ]


def test_split_and_group():
    assert split_suffix("orders_202401") == ("orders", "202401", "month")
    assert split_suffix("logs_20240115") == ("logs", "20240115", "day")
    assert split_suffix("archive_2023") == ("archive", "2023", "year")
    assert split_suffix("misc_7") == ("misc", "7", "numeric")
    assert split_suffix("users") == ("users", None, None)
    groups = group_by_prefix(CATALOG)
    assert groups["orders"] == ["orders_202401", "orders_202402", "orders_202403"]
    assert groups["users"] == ["users"]


def test_time_ranges_and_pruning():
    assert table_time_range("orders_202401") == (datetime(2024, 1, 1), datetime(2024, 2, 1))
    assert table_time_range("orders_202412") == (datetime(2024, 12, 1), datetime(2025, 1, 1))
    assert table_time_range("logs_20240115") == (datetime(2024, 1, 15), datetime(2024, 1, 16))
    assert table_time_range("archive_2023") == (datetime(2023, 1, 1), datetime(2024, 1, 1))
    assert table_time_range("misc_7") is None
    window = (datetime(2024, 2, 10), datetime(2024, 3, 5))
    kept = prune_tables(
        ["orders_202401", "orders_202402", "orders_202403", "users"], window
    )
    assert kept == ["orders_202402", "orders_202403", "users"]  # undated kept


def test_plan_export_end_to_end():
    units = plan_export(
        catalog=CATALOG,
        patterns=[r"^orders_", r"^users$"],
        is_regex=True,
        fields_by_table={"orders": ["id", "amount"], "*": ["all"]},
        window=(datetime(2024, 2, 1), datetime(2024, 2, 15)),
        file_pattern="{table}_{YYYY}-{MM}-{DD}",
        run_day=date(2024, 2, 15),
    )
    by_group = {u.group: u for u in units}
    assert by_group["orders"].tables == ["orders_202402"]
    assert by_group["orders"].fields == ["id", "amount"]
    assert by_group["orders"].file_name == "orders_2024-02-15"
    assert by_group["users"].fields == []  # "all" sentinel → *


def test_render_file_name():
    assert render_file_name("{table}_{YYYY}{MM}{DD}.json", "t", date(2024, 3, 7)) == "t_20240307.json"


def test_export_jsonl_roundtrip(spark, tmp_path):
    t1 = spark.createDataFrame([Row(id=1, v="a", ts=datetime(2024, 1, 10))])
    t2 = spark.createDataFrame([Row(id=2, v="b", ts=datetime(2024, 2, 10))])
    unit = ExportUnit(group="t", tables=["t_202401", "t_202402"], fields=[], file_name="t_out")
    path = export_group(
        spark,
        unit,
        load_table={"t_202401": t1, "t_202402": t2}.get,
        out_dir=str(tmp_path),
        file_format="jsonl",
        window=(datetime(2024, 1, 1), datetime(2024, 3, 1)),
        compression="gzip",
    )
    back = read_export_jsonl(spark, path)
    assert back.count() == 2  # A9 record count
    assert {r.v for r in back.collect()} == {"a", "b"}
    assert all(f.endswith(".gz") for f in glob.glob(f"{path}/part-*"))


def test_export_csv_quote_all_null_empty(spark, tmp_path):
    df = spark.createDataFrame([Row(id=1, v="x,y"), Row(id=2, v=None)])
    unit = ExportUnit(group="c", tables=["c"], fields=[], file_name="c_out")
    path = export_group(
        spark,
        unit,
        load_table={"c": df}.get,
        out_dir=str(tmp_path),
        file_format="csv",
        compression=None,
    )
    files = glob.glob(f"{path}/part-*.csv")
    rows = []
    for fp in files:
        with open(fp) as f:
            rows.extend(f.read().splitlines())
    header = [r for r in rows if r.startswith('"id"')]
    assert header, "header must be fully quoted (QUOTE_ALL)"
    data = sorted(r for r in rows if not r.startswith('"id"'))
    assert data[0] == '"1","x,y"'
    assert data[1] == '"2",""'  # NULL → empty string, still quoted


def test_export_sql_dump_roundtrip(spark, tmp_path):
    """S17: format=sql emits mysqldump-style INSERTs. Roundtrip: an
    independent SQL engine (DuckDB) executes the DDL + every INSERT
    line and must reproduce the exact source rows — quotes, NULLs,
    unicode, timestamps included."""
    import duckdb

    rows = [
        Row(id=1, v="plain", amt=1.5, ts=datetime(2024, 1, 10, 12, 0, 0)),
        Row(id=2, v="O'Brien; DROP", amt=None, ts=datetime(2024, 2, 10, 1, 2, 3)),
        Row(id=3, v="日本語🎉", amt=-0.25, ts=None),
        Row(id=4, v=None, amt=2.0, ts=datetime(2024, 2, 28, 23, 59, 59)),
    ]
    df = spark.createDataFrame(rows)
    unit = ExportUnit(group="t", tables=["t"], fields=[], file_name="t_dump")
    path = export_group(
        spark,
        unit,
        load_table={"t": df}.get,
        out_dir=str(tmp_path),
        file_format="sql",
        compression=None,
        include_ddl=True,
    )
    stmts = []
    for fp in glob.glob(f"{path}/part-*"):
        with open(fp) as f:
            stmts.extend(ln for ln in f.read().splitlines() if ln)
    assert len(stmts) == 4 and all(s.startswith("INSERT INTO `t` (") for s in stmts)

    ddl_files = glob.glob(f"{path}__ddl/part-*")
    ddl = "\n".join(open(fp).read() for fp in ddl_files)
    assert "CREATE TABLE `t`" in ddl

    con = duckdb.connect()
    con.execute(ddl.replace("`", '"'))  # ANSI ident quoting for DuckDB
    for s in stmts:
        con.execute(s.replace("`", '"'))
    back = con.execute('SELECT id, v, amt, ts FROM "t" ORDER BY id').fetchall()
    assert back == [
        (1, "plain", 1.5, datetime(2024, 1, 10, 12, 0, 0)),
        (2, "O'Brien; DROP", None, datetime(2024, 2, 10, 1, 2, 3)),
        (3, "日本語🎉", -0.25, None),
        (4, None, 2.0, datetime(2024, 2, 28, 23, 59, 59)),
    ]


def test_export_sql_where_window_prunes(spark, tmp_path):
    """The reference passes --where="ts >= .. AND ts < .." to
    mysqldump; here the same window is the export filter pushdown."""
    df = spark.createDataFrame(
        [
            Row(id=1, ts=datetime(2024, 1, 10)),
            Row(id=2, ts=datetime(2024, 2, 10)),
            Row(id=3, ts=datetime(2024, 3, 10)),
        ]
    )
    unit = ExportUnit(group="w", tables=["w"], fields=[], file_name="w_dump")
    path = export_group(
        spark,
        unit,
        load_table={"w": df}.get,
        out_dir=str(tmp_path),
        file_format="sql",
        window=(datetime(2024, 2, 1), datetime(2024, 3, 1)),
        compression=None,
    )
    stmts = []
    for fp in glob.glob(f"{path}/part-*"):
        with open(fp) as f:
            stmts.extend(ln for ln in f.read().splitlines() if ln)
    assert len(stmts) == 1 and "VALUES (2, " in stmts[0]


def test_export_scheme_prefixed_path(spark, tmp_path):
    """S19: writers are path-scheme transparent — exercised through a
    real file:// URI (gs:// resolves the same way via the GCS
    connector jar on a cluster)."""
    df = spark.createDataFrame([Row(id=1, v="a")])
    unit = ExportUnit(group="s", tables=["s"], fields=[], file_name="s_out")
    path = export_group(
        spark,
        unit,
        load_table={"s": df}.get,
        out_dir=f"file://{tmp_path}",
        file_format="jsonl",
        compression=None,
    )
    assert path.startswith("file://")
    back = read_export_jsonl(spark, path)
    assert [(r.id, r.v) for r in back.collect()] == [(1, "a")]


def test_sql_literal_escapes_newlines_and_nonfinite(spark):
    from sync_spark.sources.writers import sql_insert_lines

    df = spark.createDataFrame(
        [Row(id=1, note="line1\nline2", x=float("nan")),
         Row(id=2, note="back\\slash", x=float("inf"))],
        "id long, note string, x double",
    )
    lines = [r.value for r in sql_insert_lines(df, "t").collect()]
    assert all("\n" not in l for l in lines)  # one INSERT per physical line
    by_id = {l.split("(")[2][:1]: l for l in lines}
    assert "NULL" in by_id["1"] and "line1\\nline2" in by_id["1"]
    assert "NULL" in by_id["2"] and "back\\\\slash" in by_id["2"]


def test_plan_export_raises_on_colliding_artifact_names():
    import pytest
    from datetime import date

    from sync_spark.plans.backup import plan_export

    with pytest.raises(ValueError, match="same artifact"):
        plan_export(
            catalog=["orders", "users"],
            patterns=["orders", "users"],
            is_regex=False,
            fields_by_table={},
            window=None,
            file_pattern="backup_{YYYY}{MM}{DD}",  # no {table}
            run_day=date(2026, 8, 13),
        )


def test_expand_tables_dedups_literal_patterns():
    from sync_spark.plans.backup import expand_tables

    assert expand_tables(["orders"], ["orders", "orders"], is_regex=False) == ["orders"]


def test_fields_keyed_by_member_table_name():
    from datetime import date

    from sync_spark.plans.backup import plan_export

    units = plan_export(
        catalog=["ev_202401", "ev_202402"],
        patterns=["^ev_"],
        is_regex=True,
        fields_by_table={"ev_202401": ["event_id"]},
        window=None,
        file_pattern="{table}_{YYYY}",
        run_day=date(2026, 1, 1),
    )
    assert units[0].fields == ["event_id"]


def test_windowed_export_raises_on_missing_column(spark, tmp_path):
    import pytest
    from datetime import datetime

    from sync_spark.plans.backup import ExportUnit
    from sync_spark.sources.writers import export_group

    df = spark.createDataFrame([Row(a=1)])
    unit = ExportUnit(group="t", tables=["t"], fields=[], file_name="t_x")
    with pytest.raises(ValueError, match="window column"):
        export_group(
            spark, unit, lambda n: df, str(tmp_path),
            window=(datetime(2024, 1, 1), datetime(2024, 1, 2)), ts_col="ts",
        )


def test_export_columnar_formats_roundtrip(spark, tmp_path):
    """parquet/ORC export artifacts: schema-preserving roundtrip,
    codec applied (gzip spelled zlib for ORC instead of failing)."""
    df = spark.createDataFrame(
        [Row(id=1, v="a", ts=datetime(2024, 1, 10)), Row(id=2, v=None, ts=None)]
    )
    for fmt, reader in (("parquet", spark.read.parquet), ("orc", spark.read.orc)):
        unit = ExportUnit(group="p", tables=["p"], fields=[], file_name=f"p_{fmt}")
        path = export_group(
            spark,
            unit,
            load_table={"p": df}.get,
            out_dir=str(tmp_path),
            file_format=fmt,
            compression="gzip",
        )
        back = reader(path)
        assert back.count() == 2
        assert dict(back.dtypes) == dict(df.dtypes)  # schema travels
        rows = {r.id: r for r in back.collect()}
        assert rows[1].v == "a" and rows[2].v is None  # nulls stay typed nulls

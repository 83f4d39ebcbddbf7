"""Export writers (SURVEY.md §2.1 S15-S19 + S17).

- JSONL: one JSON object per line, mongoexport-compatible shape
  (executor.go:536-560, external_simple.go:391-455);
- CSV: full quoting + empty-string NULLs, matching the reference's
  `mysql --batch` → python csv.QUOTE_ALL converter (mysql.go:166-280);
- SQL dump (S17): formatted INSERT statements, the re-expression of
  the reference shelling out to `mysqldump --single-transaction
  --where=...` (mysql.go:104-164; format selection
  external_simple.go:42-43). mysqldump is inherently single-node; here
  each row renders to one `INSERT INTO t (cols) VALUES (...);` line
  with pure JVM expressions (concat/regexp_replace — no UDFs) and the
  dump writes as distributed text parts, so a 100 TB export
  parallelizes like any other scan→write. String literals use
  MySQL-default-mode escaping like mysqldump ('' doubling plus
  backslash escapes for \\, newline, CR, NUL — keeping one INSERT per
  physical line). `--where` = the same window pushdown as every
  other format; optional DDL header per mysqldump's CREATE TABLE
  preamble;
- compression = gzip codec on the writer (S18's zip step collapses
  into the codec option);
- GCS: `df.write` to `gs://` URIs goes through the GCS connector on a
  real cluster (S19) — path-scheme transparent (tested via file://).

One lazy plan per artifact: filter (window) → project (fields) →
unionByName across sibling tables → write. Predicate + projection
reach each parquet scan; at 100 TB the union is a no-shuffle
concatenation of pruned scans coalesced by AQE.
"""

from __future__ import annotations

from datetime import datetime
from functools import reduce
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sync_spark.plans.backup import ExportUnit


# ---------------------------------------------------------------------------
# S17: SQL dump formatting
# ---------------------------------------------------------------------------

_SQL_TYPES: list[tuple[type, str]] = [
    (T.BooleanType, "BOOLEAN"),
    (T.ByteType, "TINYINT"),
    (T.ShortType, "SMALLINT"),
    (T.IntegerType, "INT"),
    (T.LongType, "BIGINT"),
    (T.FloatType, "FLOAT"),
    (T.DoubleType, "DOUBLE"),
    (T.DateType, "DATE"),
    (T.TimestampType, "TIMESTAMP"),
]


def _sql_type_name(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    for py_t, name in _SQL_TYPES:
        if isinstance(dt, py_t):
            return name
    return "TEXT"  # strings, binary-as-hex, nested-as-json


def sql_create_table(table: str, schema: T.StructType) -> str:
    """mysqldump-style DDL preamble for one table."""
    cols = ",\n".join(
        f"  `{f.name}` {_sql_type_name(f.dataType)}"
        f"{'' if f.nullable else ' NOT NULL'}"
        for f in schema.fields
    )
    return (
        f"DROP TABLE IF EXISTS `{table}`;\n"
        f"CREATE TABLE `{table}` (\n{cols}\n);"
    )


def _sql_literal(name: str, dt: T.DataType) -> F.Column:
    """Render one column as a SQL literal — NULL, bare numerics, or a
    quoted escaped string — entirely JVM-side.

    String escaping is MySQL-default-mode (like mysqldump): backslash
    escapes for \\\\, newline, CR and NUL — which also keeps every
    INSERT on ONE physical line, the property the text writer and any
    line-oriented splitter depend on — plus '' doubling for quotes
    (valid in both default and ANSI modes). Non-finite doubles render
    NULL (bare NaN/Infinity tokens are not valid SQL)."""
    col = F.col(name)
    null_pred = col.isNull()
    if isinstance(
        dt,
        (
            T.ByteType,
            T.ShortType,
            T.IntegerType,
            T.LongType,
            T.FloatType,
            T.DoubleType,
            T.DecimalType,
            T.BooleanType,
        ),
    ):
        body = col.cast("string")
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            null_pred = null_pred | F.isnan(col) | (F.abs(col) == F.lit(float("inf")))
    elif isinstance(dt, T.BinaryType):
        body = F.concat(F.lit("X'"), F.hex(col), F.lit("'"))
    else:
        if isinstance(dt, T.TimestampType):
            s = F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")
        elif isinstance(dt, (T.StructType, T.ArrayType, T.MapType)):
            s = F.to_json(col)
        else:
            s = col.cast("string")
        s = F.regexp_replace(s, r"\\", r"\\\\")
        s = F.regexp_replace(s, "'", "''")
        s = F.regexp_replace(s, "\n", r"\\n")
        s = F.regexp_replace(s, "\r", r"\\r")
        s = F.regexp_replace(s, "\x00", r"\\0")
        body = F.concat(F.lit("'"), s, F.lit("'"))
    return F.when(null_pred, F.lit("NULL")).otherwise(body)


def sql_insert_lines(df: DataFrame, table: str) -> DataFrame:
    """One `INSERT INTO t (cols) VALUES (...);` statement per row
    (mysqldump --skip-extended-insert shape — line-parallel, so the
    dump splits/loads/greps like any text file). Returns a one-column
    ('value') frame ready for ``write.text``."""
    cols = ", ".join(f"`{f.name}`" for f in df.schema.fields)
    vals = []
    for i, f_ in enumerate(df.schema.fields):
        if i:
            vals.append(F.lit(", "))
        vals.append(_sql_literal(f_.name, f_.dataType))
    line = F.concat(
        F.lit(f"INSERT INTO `{table}` ({cols}) VALUES ("),
        *vals,
        F.lit(");"),
    )
    return df.select(line.alias("value"))


def export_group(
    spark: SparkSession,
    unit: ExportUnit,
    load_table: Callable[[str], DataFrame],
    out_dir: str,
    file_format: str = "jsonl",
    window: Optional[tuple[datetime, datetime]] = None,
    ts_col: str = "ts",
    compression: Optional[str] = "gzip",
    include_ddl: bool = False,
) -> str:
    """Materialize one export unit → directory of part files under
    ``out_dir/unit.file_name``. Returns the artifact path.

    ``file_format="sql"`` (S17) renders mysqldump-style INSERT lines;
    ``include_ddl`` additionally writes the CREATE TABLE preamble to a
    ``<artifact>__ddl`` sibling (kept separate because text parts have
    no cross-file ordering — a loader applies the DDL dir first)."""
    dfs = []
    for t in unit.tables:
        df = load_table(t)
        if window is not None:
            if ts_col not in df.columns:
                # silently exporting the FULL history when a window was
                # configured would be a wrong (and over-sharing) artifact
                raise ValueError(
                    f"date-range export of {t!r} needs window column "
                    f"{ts_col!r}, which the table does not have "
                    f"(columns: {df.columns})"
                )
            df = df.filter(
                (F.col(ts_col) >= F.lit(window[0])) & (F.col(ts_col) < F.lit(window[1]))
            )
        if unit.fields:
            df = df.select(*unit.fields)
        dfs.append(df)
    merged = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
    path = f"{out_dir.rstrip('/')}/{unit.file_name}"

    def _writer(frame):
        w = frame.write.mode("overwrite")
        return w.option("compression", compression) if compression else w

    if file_format == "jsonl":
        _writer(merged).json(path)
    elif file_format == "csv":
        # reference conventions (mysql.go:196-280): every field quoted,
        # NULL → empty string, header row
        _writer(merged).option("quoteAll", True).option("nullValue", "").option(
            "header", True
        ).option("escape", '"').csv(path)
    elif file_format == "sql":
        lines = sql_insert_lines(merged, unit.group)
        _writer(lines).text(path)
        if include_ddl:
            ddl = sql_create_table(unit.group, merged.schema)
            (
                spark.createDataFrame([(ddl,)], "value string")
                .coalesce(1)
                .write.mode("overwrite")
                .text(f"{path}__ddl")
            )
    elif file_format == "parquet":
        # columnar artifact (beyond the reference's text formats):
        # schema travels with the data, codec is splittable — the
        # right export for anything another engine will re-scan
        _writer(merged).parquet(path)
    elif file_format == "orc":
        # ORC names its zlib codec differently; translate the common
        # "gzip" spelling instead of failing the write
        codec = {"gzip": "zlib"}.get(compression, compression)
        w = merged.write.mode("overwrite")
        if codec:
            w = w.option("compression", codec)
        w.orc(path)
    else:
        raise ValueError(f"unsupported export format: {file_format!r}")
    return path


def read_export_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S15 read side + A9 record counting (`spark.read.json(path)`)."""
    return spark.read.json(path)

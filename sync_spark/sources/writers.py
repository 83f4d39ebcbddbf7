"""Export writers (SURVEY.md §2.1 S15-S19).

- JSONL: one JSON object per line, mongoexport-compatible shape
  (executor.go:536-560, external_simple.go:391-455);
- CSV: full quoting + empty-string NULLs, matching the reference's
  `mysql --batch` → python csv.QUOTE_ALL converter (mysql.go:166-280);
- compression = gzip codec on the writer (S18's zip step collapses
  into the codec option);
- GCS: `df.write` to `gs://` URIs goes through the GCS connector on a
  real cluster (S19) — path-scheme transparent here.

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

from sync_spark.plans.backup import ExportUnit


def export_group(
    spark: SparkSession,
    unit: ExportUnit,
    load_table: Callable[[str], DataFrame],
    out_dir: str,
    file_format: str = "jsonl",
    window: Optional[tuple[datetime, datetime]] = None,
    ts_col: str = "ts",
    compression: Optional[str] = "gzip",
) -> str:
    """Materialize one export unit → directory of part files under
    ``out_dir/unit.file_name``. Returns the artifact path."""
    dfs = []
    for t in unit.tables:
        df = load_table(t)
        if window is not None and ts_col in df.columns:
            df = df.filter(
                (F.col(ts_col) >= F.lit(window[0])) & (F.col(ts_col) < F.lit(window[1]))
            )
        if unit.fields:
            df = df.select(*unit.fields)
        dfs.append(df)
    merged = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
    path = f"{out_dir.rstrip('/')}/{unit.file_name}"
    writer = merged.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    if file_format == "jsonl":
        writer.json(path)
    elif file_format == "csv":
        # reference conventions (mysql.go:196-280): every field quoted,
        # NULL → empty string, header row
        writer.option("quoteAll", True).option("nullValue", "").option("header", True).option(
            "escape", '"'
        ).csv(path)
    else:
        raise ValueError(f"unsupported export format: {file_format!r}")
    return path


def read_export_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S15 read side + A9 record counting (`spark.read.json(path)`)."""
    return spark.read.json(path)

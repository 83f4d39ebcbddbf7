"""Oracle-comparison harness mirroring the driver's correctness gate:
run the Spark query and the DuckDB SQL on the same parquet tables,
sort columns by name, canonicalize row order, compare values.

Used by tests/ so every registry entry is validated locally before the
driver ever sees it.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import duckdb
import pandas as pd

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1)
    if len(out):
        out = out.sort_values(by=list(out.columns), key=lambda s: s.astype(str)).reset_index(
            drop=True
        )
    return out


def _values_equal(a, b) -> bool:
    """Strict, driver-style: the driver hashes stringified values, so
    int vs float representation differences (2996 vs 2996.0) are REAL
    mismatches — do not paper over them here."""
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    try:
        import numpy as np

        if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
            a = list(a) if isinstance(a, np.ndarray) else a
            b = list(b) if isinstance(b, np.ndarray) else b
            return _values_equal(a, b)
    except ImportError:
        pass
    # None==None and NaN==NaN, but NOT None==NaN: the driver compares
    # stringified values ('None' != 'nan'), so conflating them here
    # would pass locally a query the driver's gate fails
    if a is None and b is None:
        return True
    if a is not None and b is not None and a != a and b != b:  # both NaN
        return True
    return str(a) == str(b)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> Optional[str]:
    """Return None if equal (driver-style), else a diff description."""
    s, o = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if list(s.columns) != list(o.columns):
        return f"schema mismatch: spark={list(s.columns)} oracle={list(o.columns)}"
    if len(s) != len(o):
        return f"row count mismatch: spark={len(s)} oracle={len(o)}"
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not _values_equal(a, b):
                return f"value mismatch col={col} row={i}: spark={a!r} oracle={b!r}"
    return None


def run_compare(spark, spec, sf_dir: str) -> Optional[str]:
    """Run one QuerySpec both ways; None = match."""
    sdf = spec.spark_fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return None  # rows-only check: just ensure it ran
    con = duckdb_conn(sf_dir)
    try:
        odf = con.execute(spec.oracle).fetchdf()
    finally:
        con.close()
    return compare_frames(sdf, odf)

"""Hash-bucketed parquet target store for incremental CDC MERGE
(SURVEY.md §2.1 S12/S13 target side; the scale fix for the round-1
full-target-rewrite anti-pattern).

Reference cost model (cited for parity, not ported): the reference
applies changes row-wise against an indexed store — per-PK upserts and
deletes (mongodb.go:1184-1235 BulkWrite, mysql.go:524-692,
postgresql.go:726-965) — so a micro-batch touching 0.01% of keys costs
O(batch), not O(target). Plain ``overwrite`` parquet costs O(target)
per batch. This module restores the reference's cost model on files:

- the target directory is laid out as hive-style hash buckets
  ``__bucket=N/part-*.parquet`` with ``N = pmod(xxhash64(keys), n)``
  — a pure function of the key (content hash, retry-stable;
  SPARK-23207 note in operators/skew.py applies);
- a micro-batch derives its *touched* bucket set from the change
  keys, reads ONLY those buckets (Spark partition pruning does the
  file skipping: the ``__bucket IN (...)`` filter shows up as
  PartitionFilters in the scan), merges, and atomically swaps only
  those bucket directories. Untouched buckets are never read, never
  rewritten — byte-identical across batches (tested);
- per-bucket swap is rename-aside (old → ``*__old``, stage → live,
  drop old) so a reader in another process never observes a missing
  or half-written bucket, and a crash mid-swap leaves either the old
  or the new complete directory.

At 100 TB: n_buckets sizes so one bucket ≈ a few GB (e.g. 8192
buckets for 20 TB targets); the touched-set collect is bounded by
n_buckets ints, not data. The same ``apply_changes`` plan feeds Delta
or Iceberg ``MERGE INTO`` on deployments that have a table format —
this store is the dependency-free equivalent with the same asymptotic
write cost.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BUCKET_COL = "__bucket"


def bucket_expr(keys: Sequence[str], n_buckets: int) -> F.Column:
    """Deterministic bucket id for a key tuple. xxhash64 is a content
    hash (stable under task retry, unlike monotonically_increasing_id)
    and pmod keeps the result in [0, n)."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast("int")


def is_bucketed(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    return any(e.startswith(f"{BUCKET_COL}=") for e in os.listdir(path))


def _swap_dir(src: str, dst: str) -> None:
    """Atomic-ish directory replace: rename the live dir aside, rename
    the staged dir into place, then drop the old one. A crash between
    the two renames leaves ``dst__old`` intact for manual recovery —
    never a window with neither version (the round-1 _write_atomic had
    exactly that window)."""
    old = f"{dst}__old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(dst):
        os.rename(dst, old)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    os.rename(src, dst)
    if os.path.exists(old):
        shutil.rmtree(old)


def write_bucketed(
    df: DataFrame, path: str, keys: Sequence[str], n_buckets: int
) -> None:
    """Full (re)write of a bucketed target — the snapshot path. Stages
    the whole layout then swaps the root directory."""
    stage = f"{path}__stage_{uuid.uuid4().hex[:8]}"
    (
        df.withColumn(BUCKET_COL, bucket_expr(keys, n_buckets))
        .write.partitionBy(BUCKET_COL)
        .mode("overwrite")
        .parquet(stage)
    )
    _swap_dir(stage, path)


def read_target(spark: SparkSession, path: str) -> DataFrame:
    """Read a target table, bucketed or legacy-flat, WITHOUT the
    bucket column — the one schema callers (monitor, tests, queries)
    should see."""
    df = spark.read.option("basePath", path).parquet(path)
    if BUCKET_COL in df.columns:
        df = df.drop(BUCKET_COL)
    return df


def read_buckets(
    spark: SparkSession, path: str, buckets: Iterable[int]
) -> DataFrame:
    """Pruned read of only the given buckets. The isin filter on the
    partition column becomes PartitionFilters — untouched buckets'
    files are never opened."""
    df = spark.read.option("basePath", path).parquet(path)
    return df.filter(F.col(BUCKET_COL).isin(list(buckets))).drop(BUCKET_COL)


def overwrite_buckets(
    merged: DataFrame,
    path: str,
    keys: Sequence[str],
    n_buckets: int,
    touched: Iterable[int],
) -> None:
    """Swap ONLY the touched bucket directories with ``merged``'s rows
    (which must all hash into ``touched`` — true by construction when
    merged = survivors-of-touched ∪ upserts). A touched bucket whose
    every row was deleted gets an explicit empty-but-readable parquet
    dir so the target never loses its schema."""
    touched = sorted(set(touched))
    if not touched:
        return
    stage = f"{path}__stage_{uuid.uuid4().hex[:8]}"
    (
        merged.withColumn(BUCKET_COL, bucket_expr(keys, n_buckets))
        .write.partitionBy(BUCKET_COL)
        .mode("overwrite")
        .parquet(stage)
    )
    spark = merged.sparkSession
    schema = merged.schema
    try:
        for b in touched:
            src = os.path.join(stage, f"{BUCKET_COL}={b}")
            dst = os.path.join(path, f"{BUCKET_COL}={b}")
            if not os.path.exists(src):
                # bucket emptied by deletes: stage a schema-only dir
                spark.createDataFrame([], schema).write.mode("overwrite").parquet(src)
            _swap_dir(src, dst)
    finally:
        if os.path.exists(stage):
            shutil.rmtree(stage)


def bucketize_in_place(
    spark: SparkSession, path: str, keys: Sequence[str], n_buckets: int
) -> None:
    """One-time migration of a legacy flat parquet target into the
    bucketed layout (used when a pipeline attaches to a target written
    by an older snapshot)."""
    df = spark.read.parquet(path).localCheckpoint(eager=True)
    write_bucketed(df, path, keys, n_buckets)

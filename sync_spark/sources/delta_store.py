"""Native Delta-protocol MERGE ingest — the CDC apply contract
executed DIRECTLY against a Delta table, no delta jar required
(VERDICT r10 #3; reference parity: pkg/syncer/mongodb/mongodb.go's
1184-1235 apply loop targets a live database, this engine's
lakehouse-native equivalent targets a Delta table any external
reader consumes).

`delta_export.py` publishes the bucketed store AS a Delta table
(store = source of truth, log = projection). This module inverts
that: the Delta table IS the store — data files live under
``delta_dir/__bucket=K/``, the ``_delta_log`` is the only metadata,
and every CDC batch commits one MERGE version:

1. replay the log (checkpoint-seeded) → active file set + schema +
   the bucketing contract (carried in ``metaData.configuration``,
   Delta's own table-property mechanism);
2. derive the touched buckets from the change keys with the SAME
   ``bucket_expr`` as the bucketed store (one tiny distinct over
   bucket ids, bounded by n_buckets — or reuse the pipeline's
   already-collected summary);
3. pinned-schema read of ONLY the touched buckets' active files —
   O(touched), the log replaces directory listing;
4. ``apply_changes`` (J1/J2 semantics, unchanged plan) → write the
   merged rows as NEW parquet files into the touched bucket dirs
   (unique names; Delta files are immutable, never overwritten);
5. commit ``remove`` for every previously-active file in the
   touched buckets + ``add`` for the new ones, plus a protocol
   ``txn {appId, version}`` action — Delta's native streaming-writer
   idempotence: a crash-replayed foreachBatch batch sees its appId
   watermark already at batch_id and SKIPS, which is exactly the
   put-if-absent exactly-once contract delta-spark's own streaming
   sink uses (PROTOCOL.md §Transaction Identifiers).

Crash-safety: data files land BEFORE the log commit (an unreferenced
file is invisible to every Delta reader — leak, never corruption);
the commit itself is the staged ``os.replace`` put-if-absent from
delta_export. Schema evolution is Delta-native: a widened row schema
re-emits ``metaData`` in the same commit; old files read the new
columns as NULL by name.

Scale: a batch costs O(touched buckets) read+write plus one KB-sized
JSON append — identical asymptotics to the bucketed store, but the
table is directly consumable by delta-rs / DuckDB-delta / Trino /
Spark+delta with time travel, VACUUM, and checkpoint compaction
(delta_export's vacuum_export / write_checkpoint operate on this
layout unchanged). At 100 TB the same layout holds: buckets sized to
a few GB, merge touches only the buckets the batch's keys hash into.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from typing import Iterable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sync_spark.operators.merge import apply_changes
from sync_spark.sources.bucketed import BUCKET_COL, bucket_expr
from sync_spark.sources.delta_export import (
    read_export,
    replay_with_checkpoint,
    write_commit,
)

# metaData.configuration keys carrying the bucketing contract — the
# Delta-native home for table properties (same mechanism delta-spark
# uses for delta.appendOnly etc.)
CONF_KEYS = "sync_spark.bucketing.keyCols"
CONF_NBUCKETS = "sync_spark.bucketing.nBuckets"


def _schema_string(row_schema: T.StructType) -> str:
    fields = list(row_schema.fields) + [
        T.StructField(BUCKET_COL, T.IntegerType(), True)
    ]
    return T.StructType(fields).json()


def _row_schema_from_meta(meta: dict) -> T.StructType:
    full = T.StructType.fromJson(__import__("json").loads(meta["schemaString"]))
    return T.StructType([f for f in full.fields if f.name != BUCKET_COL])


def table_config(meta: dict) -> tuple[list[str], int]:
    conf = meta.get("configuration") or {}
    if CONF_KEYS not in conf or CONF_NBUCKETS not in conf:
        raise ValueError(
            "delta table metaData carries no sync_spark bucketing contract "
            f"(configuration={conf!r}) — not a delta_store-managed table"
        )
    return conf[CONF_KEYS].split(","), int(conf[CONF_NBUCKETS])


def _meta_action(
    row_schema: T.StructType,
    key_cols: Sequence[str],
    n_buckets: int,
    prior: Optional[dict] = None,
) -> dict:
    now_ms = int(time.time() * 1000)
    return {
        "metaData": {
            "id": prior["id"] if prior else uuid.uuid4().hex,
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _schema_string(row_schema),
            "partitionColumns": [BUCKET_COL],
            "configuration": {
                CONF_KEYS: ",".join(key_cols),
                CONF_NBUCKETS: str(n_buckets),
            },
            "createdTime": prior["createdTime"] if prior else now_ms,
        }
    }


def _commit_info(operation: str) -> dict:
    return {
        "commitInfo": {
            "timestamp": int(time.time() * 1000),
            "operation": operation,
            "operationParameters": {},
            "engineInfo": "sync_spark-delta-store",
        }
    }


def _stage_data_files(
    df: DataFrame, delta_dir: str, key_cols: Sequence[str], n_buckets: int
) -> list[dict]:
    """Write ``df`` bucketed to a stage dir, then MOVE each part file
    into ``delta_dir/__bucket=K/`` under a fresh unique name. Returns
    the add-action dicts (path/partitionValues/size/modificationTime).
    Files land before any log commit — crash leaks unreferenced files,
    never a dangling reference."""
    stage = os.path.join(
        os.path.dirname(delta_dir.rstrip("/")) or ".",
        f".{os.path.basename(delta_dir.rstrip('/'))}__dstage_{uuid.uuid4().hex[:8]}",
    )
    adds: list[dict] = []
    try:
        (
            df.withColumn(BUCKET_COL, bucket_expr(key_cols, n_buckets))
            # key-sorted parquet: selective rowgroup stats + compression
            # (same discipline as the bucketed store's write_bucketed)
            .sortWithinPartitions(BUCKET_COL, *key_cols)
            .write.partitionBy(BUCKET_COL)
            .mode("overwrite")
            .parquet(stage)
        )
        for b in sorted(os.listdir(stage)):
            if not b.startswith(f"{BUCKET_COL}="):
                continue
            bval = b.split("=", 1)[1]
            os.makedirs(os.path.join(delta_dir, b), exist_ok=True)
            for f in sorted(os.listdir(os.path.join(stage, b))):
                if not f.endswith(".parquet") or f.startswith((".", "_")):
                    continue
                name = f"part-{uuid.uuid4().hex}.snappy.parquet"
                dst = os.path.join(delta_dir, b, name)
                os.rename(os.path.join(stage, b, f), dst)
                st = os.stat(dst)
                adds.append(
                    {
                        "path": f"{b}/{name}",
                        "partitionValues": {BUCKET_COL: bval},
                        "size": st.st_size,
                        "modificationTime": int(st.st_mtime * 1000),
                        "dataChange": True,
                    }
                )
    finally:
        if os.path.exists(stage):
            shutil.rmtree(stage)
    return adds


def create_delta_table(
    spark: SparkSession,
    source: DataFrame,
    delta_dir: str,
    key_cols: Sequence[str],
    n_buckets: int,
) -> int:
    """Version-0 snapshot: bucket-write ``source`` into ``delta_dir``
    and commit protocol + metaData (with the bucketing contract) +
    adds. The delta analog of the pipeline's ``snapshot_if_empty``
    write path."""
    state = replay_with_checkpoint(delta_dir)
    if state["version"] >= 0:
        raise ValueError(f"delta table already exists at {delta_dir!r}")
    os.makedirs(delta_dir, exist_ok=True)
    adds = _stage_data_files(source, delta_dir, key_cols, n_buckets)
    actions = [
        _commit_info("CREATE TABLE AS SELECT"),
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta_action(
            T.StructType(source.schema.fields), key_cols, n_buckets
        ),
        *[{"add": a} for a in adds],
    ]
    write_commit(delta_dir, 0, actions)
    return 0


def delta_snapshot_if_empty(
    spark: SparkSession,
    source: DataFrame,
    delta_dir: str,
    key_cols: Sequence[str],
    n_buckets: int,
    row_schema: Optional[T.StructType] = None,
) -> bool:
    """Initial full copy, skipped when the table already exists —
    mirrors pipeline.snapshot_if_empty (mongodb.go:459-465) for the
    delta target."""
    state = replay_with_checkpoint(delta_dir)
    if state["version"] >= 0:
        return False
    if row_schema is not None:
        source = source.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in row_schema.fields]
        )
    create_delta_table(spark, source, delta_dir, key_cols, n_buckets)
    return True


def read_delta_store(
    spark: SparkSession, delta_dir: str, version: Optional[int] = None
) -> DataFrame:
    """Log-driven read of the store (= delta_export.read_export: replay
    the log, scan exactly the active files). Time travel included."""
    return read_export(spark, delta_dir, version)


def _read_active_buckets(
    spark: SparkSession,
    delta_dir: str,
    files: dict[str, dict],
    buckets: Iterable[int],
    row_schema: T.StructType,
) -> tuple[DataFrame, list[str]]:
    """Pinned-schema scan of the touched buckets' active files.
    Returns (df, touched_active_paths). The log IS the listing: a
    file on disk but not in the log (crash leak, concurrent stage) is
    never read."""
    bvals = {str(b) for b in buckets}
    touched_paths = sorted(
        p
        for p, a in files.items()
        if a.get("partitionValues", {}).get(BUCKET_COL) in bvals
    )
    if not touched_paths:
        return spark.createDataFrame([], row_schema), touched_paths
    full = T.StructType(
        list(row_schema.fields) + [T.StructField(BUCKET_COL, T.IntegerType())]
    )
    df = (
        spark.read.schema(full)
        .option("basePath", delta_dir)
        .parquet(*[os.path.join(delta_dir, p) for p in touched_paths])
        .drop(BUCKET_COL)
    )
    return df, touched_paths


def delta_merge(
    spark: SparkSession,
    delta_dir: str,
    changes: DataFrame,
    app_id: Optional[str] = None,
    txn_version: Optional[int] = None,
    row_schema: Optional[T.StructType] = None,
    touched: Optional[Sequence[int]] = None,
) -> Optional[int]:
    """MERGE one CDC change batch (after-image rows + op/seq columns,
    the apply_changes contract) into the Delta table. Returns the
    committed version, or None when skipped (idempotent txn replay) /
    nothing to do.

    ``app_id``/``txn_version``: protocol transaction identifier — pass
    (streaming query id, batch_id) from foreachBatch and a replayed
    batch is a no-op, the T4 effectively-once contract expressed in
    Delta's own terms.

    ``row_schema``: authoritative row schema (pipeline hot-reload
    evolution). Wider than the table's → metaData is re-emitted in
    this commit (old files null-fill by name). Narrower → error, same
    contract as the bucketed path's narrowing guard.

    ``touched``: pre-computed touched bucket ids (the pipeline's batch
    summary already collected them); omitted → derived here with one
    bucket-id distinct (bounded by n_buckets rows)."""
    state = replay_with_checkpoint(delta_dir)
    if state["version"] < 0:
        raise ValueError(
            f"no delta table at {delta_dir!r} — create_delta_table first"
        )
    if (
        app_id is not None
        and txn_version is not None
        and state.get("txns", {}).get(app_id, -1) >= txn_version
    ):
        return None  # replayed batch: already applied, exactly-once skip
    meta = state["metaData"]
    key_cols, n_buckets = table_config(meta)
    stored_schema = _row_schema_from_meta(meta)

    meta_changed = False
    if row_schema is not None:
        stored_names = {f.name for f in stored_schema.fields}
        row_names = {f.name for f in row_schema.fields}
        missing = stored_names - row_names
        if missing:
            raise ValueError(
                f"row_schema lacks columns {sorted(missing)} present in the "
                "delta table — narrowing a schema mid-stream would destroy "
                "their data in every touched bucket; run an explicit "
                "migration if the drop is intended"
            )
        conflicts = sorted(
            f.name
            for f in row_schema.fields
            if f.name in stored_names
            and f.dataType
            != next(g.dataType for g in stored_schema.fields if g.name == f.name)
        )
        if conflicts:
            # a silent cast here would null out every conflicting value
            # in the touched buckets (the fieldSecurity-retyping trap
            # the bucketed path guards identically)
            raise ValueError(
                f"row_schema re-types columns {conflicts} vs the delta "
                "table's stored types — a same-name type change is a "
                "migration, not a merge side effect; migrate explicitly"
            )
        if row_names - stored_names:
            stored_schema = T.StructType(
                list(stored_schema.fields)
                + [f for f in row_schema.fields if f.name not in stored_names]
            )
            meta_changed = True

    if touched is None:
        touched = [
            r[0]
            for r in changes.select(
                bucket_expr(key_cols, n_buckets).alias("__b")
            )
            .distinct()
            .collect()
        ]
    touched = sorted(set(touched))
    if not touched and not meta_changed:
        return None

    target, old_paths = _read_active_buckets(
        spark, delta_dir, state["files"], touched, stored_schema
    )
    merged = apply_changes(target, changes, keys=key_cols)
    # align to the stored schema (changes may carry fewer columns than
    # an evolved table; missing ones null-fill by name)
    merged = merged.select(
        *[
            (
                F.col(f.name).cast(f.dataType)
                if f.name in merged.columns
                else F.lit(None).cast(f.dataType)
            ).alias(f.name)
            for f in stored_schema.fields
        ]
    )
    adds = _stage_data_files(merged, delta_dir, key_cols, n_buckets)
    stray = {a["partitionValues"][BUCKET_COL] for a in adds} - {
        str(b) for b in touched
    }
    if stray:
        # same loud failure as overwrite_buckets: rows hashing outside
        # the touched set mean the caller's derivation and bucket_expr
        # disagree — committing would strand stale duplicates
        raise ValueError(
            f"merged rows hash into buckets {sorted(stray)} outside the "
            f"touched set {touched} (key type drift?); aborting commit"
        )

    version = state["version"] + 1
    now_ms = int(time.time() * 1000)
    actions: list[dict] = [_commit_info("MERGE")]
    if meta_changed:
        actions.append(_meta_action(stored_schema, key_cols, n_buckets, prior=meta))
    if app_id is not None and txn_version is not None:
        actions.append({"txn": {"appId": app_id, "version": txn_version}})
    for p in old_paths:
        actions.append(
            {"remove": {"path": p, "deletionTimestamp": now_ms, "dataChange": True}}
        )
    actions.extend({"add": a} for a in adds)
    write_commit(delta_dir, version, actions)
    return version

"""CDC sync pipeline: snapshot-if-empty + streaming tail with
foreachBatch MERGE (SURVEY.md §3.1 re-expression, §2.9 T1-T8).

Reference parity map:
- initial snapshot gated on empty target (mongodb.go:458-525,
  mysql.go:205-214) → ``snapshot_if_empty``;
- change-stream tail → ``readStream`` on the envelope log; resume
  tokens (T3) → ``checkpointLocation``;
- per-event apply with latest-wins ordering (T4/W2) →
  latest-per-key compaction + ``apply_changes`` MERGE per micro-batch,
  idempotent so at-least-once delivery yields effectively-once;
- ``ignoreDeleteOps`` (P11) honored per table mapping;
- fieldSecurity masking/encryption applied to the after-image BEFORE
  it reaches the target (security.go semantics);
- dead-letter queue (S14/T6: mongodb.go:1310-1443): rows with null
  keys (unappliable) are quarantined to a DLQ table instead of
  poisoning the batch.

Target storage is a parquet directory rewritten per micro-batch
(read-merge-overwrite). On a production deployment the same
``apply_changes`` feeds Delta/Iceberg ``MERGE INTO`` — the swap is
one writer function; plain parquet keeps this repo dependency-free.
The rewrite is atomic at the directory level via write-new + rename.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sync_spark.functions.security import apply_security_rules
from sync_spark.operators.merge import apply_changes, compact_latest_per_key
from sync_spark.sources.cdc import changes_for_table, read_event_stream
from sync_spark.spec import SyncSpec


@dataclass
class TableTarget:
    source_table: str
    target_path: str
    row_schema: T.StructType
    key_cols: list[str]
    ignore_deletes: bool = False


def _write_atomic(df: DataFrame, path: str) -> None:
    """Overwrite ``path`` with df, staging to a sibling temp dir first
    so readers never observe a half-written table."""
    tmp = f"{path}__stage_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def snapshot_if_empty(spark: SparkSession, source: DataFrame, target_path: str) -> bool:
    """Initial full copy, skipped when the target already has data
    (mongodb.go:459-465). Returns True if the snapshot ran."""
    if os.path.exists(target_path):
        try:
            if spark.read.parquet(target_path).limit(1).count() > 0:
                return False
        except Exception:
            pass  # unreadable/empty dir → re-snapshot
    _write_atomic(source, target_path)
    return True


class CdcPipeline:
    """One sync task: envelope event log → per-table MERGE targets."""

    def __init__(
        self,
        spark: SparkSession,
        spec: SyncSpec,
        tables: list[TableTarget],
        event_log_dir: str,
        checkpoint_dir: str,
        dlq_path: Optional[str] = None,
        security_key: str = "",
        max_files_per_trigger: int | None = None,
        stats_path: Optional[str] = None,
    ) -> None:
        self.spark = spark
        self.spec = spec
        self.tables = tables
        self.event_log_dir = event_log_dir
        self.checkpoint_dir = checkpoint_dir
        self.dlq_path = dlq_path
        self.security_key = security_key
        self.max_files_per_trigger = max_files_per_trigger
        self.stats_path = stats_path

    # -- micro-batch apply ------------------------------------------------

    def _apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        """foreachBatch body. Idempotent: compaction + MERGE means
        replaying a batch after a crash converges to the same target
        state (T4)."""
        batch = batch.persist()
        try:
            for t in self.tables:
                changes = changes_for_table(batch, t.source_table, t.row_schema, t.key_cols)
                # DLQ: events whose key is unappliable (all key cols
                # null) are quarantined, never block the stream (T6)
                null_key = None
                for k in t.key_cols:
                    c = F.col(k).isNull()
                    null_key = c if null_key is None else (null_key & c)
                bad = changes.filter(null_key)
                good = changes.filter(~null_key)
                if self.dlq_path and bad.limit(1).count() > 0:
                    # partition-dir overwrite keyed by (table, batch):
                    # replaying a crashed batch rewrites the SAME dir
                    # instead of appending duplicates, keeping the DLQ
                    # as idempotent as the merge itself
                    (
                        bad.withColumn("reason", F.lit("null_key"))
                        .select("op", "seq", "reason")
                        .write.mode("overwrite")
                        .parquet(
                            f"{self.dlq_path}/table={t.source_table}/batch_id={batch_id}"
                        )
                    )
                rules = self.spec.field_security.get(t.source_table, [])
                if rules:
                    # mask/encrypt the after-image columns; key + op +
                    # seq stay intact for the merge
                    data_rules = [r for r in rules if r.field.split(".")[0] not in t.key_cols]
                    good = apply_security_rules(good, data_rules, key=self.security_key)
                if good.limit(1).count() == 0:
                    continue
                if self.stats_path is not None:
                    # per-batch apply counters (A6, changestream_statistics
                    # analog: monitor.go:96-110): same per-(table,batch)
                    # overwrite discipline as the DLQ so crash-replays do
                    # not double-count; gated on nonempty batches so idle
                    # tables produce no files/jobs; counts only events the
                    # merge will actually consider (ignored deletes are
                    # excluded, mirroring what gets executed)
                    stats_src = (
                        good.filter(F.col("op") != "delete") if t.ignore_deletes else good
                    )
                    (
                        stats_src.groupBy("op")
                        .agg(F.count(F.lit(1)).alias("n"))
                        .write.mode("overwrite")
                        .parquet(
                            f"{self.stats_path}/table={t.source_table}/batch_id={batch_id}"
                        )
                    )
                target = self.spark.read.parquet(t.target_path)
                merged = apply_changes(
                    target,
                    good,
                    keys=t.key_cols,
                    ignore_deletes=t.ignore_deletes,
                )
                # localCheckpoint BEFORE the overwrite: `merged` reads
                # the same files it is about to replace
                merged = merged.localCheckpoint(eager=True)
                _write_atomic(merged, t.target_path)
        finally:
            batch.unpersist()

    # -- stream lifecycle --------------------------------------------------

    def start(self, trigger_once: bool = True):
        stream = read_event_stream(
            self.spark, self.event_log_dir, self.max_files_per_trigger
        )
        mapped = [t.source_table for t in self.tables]
        stream = stream.filter(F.col("source_table").isin(mapped))  # P10
        writer = (
            stream.writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime="2 seconds")  # T1
        return writer.start()

    def run_available(self) -> None:
        """Process everything currently in the log, then stop —
        deterministic batch-like drain used by tests and backfills."""
        q = self.start(trigger_once=True)
        q.awaitTermination()

"""Key-value store model (SURVEY.md §1.1, §2.1 S7-S9, §2.9 T12) —
the Redis surface re-expressed relationally.

Reference semantics: snapshot = SCAN + per-key DUMP/TTL → RESTORE
REPLACE (redis.go:89-164); expired keys are skipped; TTLs are carried
and re-applied; keyspace size = DBSIZE (monitor.go:656-668).

Spark model: ``(key STRING, value BINARY/STRING, ttl_ms LONG,
type STRING)``. Expiry is a filter against a supplied "now" (never
wall-clock inside the plan — determinism); RESTORE REPLACE's
last-write-wins is the same latest-per-key compaction the CDC merge
uses."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sync_spark import tz


def live_keys(kv: DataFrame, now: datetime, epoch_col: str = "expires_at") -> DataFrame:
    """T12: drop expired keys (ttl carried as an absolute expiry
    timestamp column; null = persistent)."""
    return kv.filter(
        F.col(epoch_col).isNull() | (F.col(epoch_col) > F.lit(tz.fmt(now)).cast("timestamp"))
    )


def keyspace_size(kv: DataFrame, now: datetime, epoch_col: str = "expires_at") -> DataFrame:
    """A4: DBSIZE over live keys."""
    return live_keys(kv, now, epoch_col).agg(F.count(F.lit(1)).alias("dbsize"))


def restore_replace(target: DataFrame, dump: DataFrame, key_col: str = "key") -> DataFrame:
    """S7 apply: RESTORE REPLACE = upsert by key (idempotent).

    The dump is compacted to one row per key first — Redis SCAN may
    emit a key more than once mid-rehash (redis.io SCAN guarantees),
    and a duplicate surviving the union would violate last-write-wins.
    The anti-join is null-safe so a NULL-key row replaces rather than
    duplicates."""
    compacted = dump.dropDuplicates([key_col])
    cond = target[key_col].eqNullSafe(compacted[key_col])
    return target.join(compacted, cond, "left_anti").unionByName(compacted)

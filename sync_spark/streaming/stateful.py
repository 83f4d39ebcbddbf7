"""Custom stateful streaming operator: per-table CDC counters
(SURVEY.md §2.4 A6, §2.9) via ``applyInPandasWithState``.

The reference accumulates received/inserted/updated/deleted counters
per (task, collection) in memory and upserts them to SQLite
(monitor.go:96-110, 747-836). Streaming-native re-expression: keyed
state per source_table updated each micro-batch, emitting a running
snapshot row per batch — restart-safe because the state lives in the
checkpoint.

This is the pattern slot for any custom stateful operator the
DataFrame API can't express (the brief's applyInPandasWithState
bullet); the counter logic itself is trivially small so the state
plumbing stays visible.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("received", T.LongType()),
        T.StructField("inserted", T.LongType()),
        T.StructField("updated", T.LongType()),
        T.StructField("deleted", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("source_table", T.StringType()),
        T.StructField("received", T.LongType()),
        T.StructField("inserted", T.LongType()),
        T.StructField("updated", T.LongType()),
        T.StructField("deleted", T.LongType()),
    ]
)


def _update_counters(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        received, inserted, updated, deleted = state.get
    else:
        received = inserted = updated = deleted = 0
    for pdf in pdfs:
        ops = pdf["op"].value_counts()
        received += int(len(pdf))
        inserted += int(ops.get("insert", 0))
        updated += int(ops.get("update", 0)) + int(ops.get("replace", 0))
        deleted += int(ops.get("delete", 0))
    state.update((received, inserted, updated, deleted))
    yield pd.DataFrame(
        {
            "source_table": [key[0]],
            "received": [received],
            "inserted": [inserted],
            "updated": [updated],
            "deleted": [deleted],
        }
    )


def running_counters(envelope_stream: DataFrame) -> DataFrame:
    """CDC envelope stream → running per-table counter snapshots
    (one output row per table per micro-batch)."""
    return (
        envelope_stream.select("source_table", "op")
        .groupBy("source_table")
        .applyInPandasWithState(
            _update_counters,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

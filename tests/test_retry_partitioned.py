"""Retry guardian (T7) + partitioned-table layout with native
partition pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sync_spark.sources.partitioned import read_day_range, write_partitioned_by_day
from sync_spark.sources.readers import read_table
from sync_spark.streaming.retry import RetryStats, is_recoverable, run_with_retry


def test_retry_recovers_with_backoff_schedule():
    calls = {"n": 0}
    slept: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise RuntimeError("connection reset by peer")

    stats = run_with_retry(flaky, sleep=slept.append)
    assert calls["n"] == 4 and stats.attempts == 4
    assert slept == [5.0, 7.5, 11.25]  # 5s base, x1.5 (reference constants)


def test_retry_unrecoverable_raises_immediately():
    def bad():
        raise ValueError("schema mismatch: column renamed")

    with pytest.raises(ValueError):
        run_with_retry(bad, sleep=lambda s: None)


def test_retry_exhaustion_reraises():
    def always():
        raise RuntimeError("timeout waiting for broker")

    with pytest.raises(RuntimeError):
        run_with_retry(always, max_retries=3, sleep=lambda s: None)


def test_delay_caps_at_max():
    slept: list[float] = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 10:
            raise RuntimeError("temporarily unavailable")

    run_with_retry(flaky, sleep=slept.append, base_delay=100.0, max_delay=150.0)
    assert slept[0] == 100.0 and all(d <= 150.0 for d in slept)


def test_recoverability_classifier():
    assert is_recoverable(RuntimeError("Connection refused"))
    assert is_recoverable(RuntimeError("read timed out"))
    assert not is_recoverable(RuntimeError("column v does not exist"))


def test_partition_pruning_in_scan(spark, sf_small, tmp_path):
    ev = read_table(spark, sf_small, "events")
    path = str(tmp_path / "events_part")
    write_partitioned_by_day(ev, path, "ts")

    ranged = read_day_range(spark, path, "2024-01-10", "2024-01-12")
    # correctness: matches a plain filter on the unpartitioned table
    expected = ev.filter(
        (F.col("ts") >= "2024-01-10") & (F.col("ts") < "2024-01-12")
    ).count()
    assert ranged.count() == expected > 0

    plan = ranged._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters:")[1][:200]
    assert "dt" in pf  # dt predicates became partition pruning

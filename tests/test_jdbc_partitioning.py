"""JDBC partitioning logic (pure — no database in this container)."""

from __future__ import annotations

import pytest

from sync_spark.sources.jdbc import predicate_partitions, range_partition_options


def test_range_options():
    opts = range_partition_options("id", 0, 1_000_000, 16)
    assert opts == {
        "partitionColumn": "id",
        "lowerBound": "0",
        "upperBound": "1000000",
        "numPartitions": "16",
    }
    with pytest.raises(ValueError):
        range_partition_options("id", 10, 5, 4)
    with pytest.raises(ValueError):
        range_partition_options("id", 0, 10, 0)


def test_predicate_partitions_cover_exactly_once():
    preds = predicate_partitions("created_at", ["2024-01-01", "2024-02-01"], quote=True)
    assert preds == [
        "created_at < '2024-01-01' OR created_at IS NULL",
        "created_at >= '2024-01-01' AND created_at < '2024-02-01'",
        "created_at >= '2024-02-01'",
    ]
    # simulate coverage over sample values
    import datetime

    def matches(pred: str, v) -> bool:
        if v is None:
            return "IS NULL" in pred
        clauses = [c for c in pred.split(" OR ") if "IS NULL" not in c]
        ok = True
        for c in clauses[0].split(" AND "):
            op = ">=" if ">=" in c else "<"
            bound = c.split("'")[1]
            ok &= (v >= bound) if op == ">=" else (v < bound)
        return ok

    for v in [None, "2023-12-31", "2024-01-01", "2024-01-15", "2024-02-01", "2024-03-01"]:
        hits = [p for p in preds if matches(p, v)]
        assert len(hits) == 1, f"{v!r} covered {len(hits)} times"


def test_predicate_partitions_requires_boundary():
    with pytest.raises(ValueError):
        predicate_partitions("id", [])

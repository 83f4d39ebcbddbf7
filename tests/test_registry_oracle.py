"""Every registry entry is validated against its DuckDB oracle at
sf0.001 (fast) — the same comparison the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from sync_spark.registry import all_queries
from sync_spark.testing import run_compare


def _specs():
    return sorted(all_queries().items())


@pytest.mark.parametrize("name,spec", _specs(), ids=[n for n, _ in _specs()])
def test_oracle_match(spark, sf_small, name, spec):
    diff = run_compare(spark, spec, sf_small)
    assert diff is None, f"{name}: {diff}"


@pytest.mark.parametrize("name,spec", _specs(), ids=[n for n, _ in _specs()])
def test_runs_nonempty_schema(spark, sf_small, name, spec):
    df = spec.spark_fn(spark, sf_small)
    assert df.schema is not None
    assert df.count() >= 0

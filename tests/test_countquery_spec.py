"""countQuery DSL compiler + job-spec JSON parsing."""

from __future__ import annotations

from datetime import date, datetime

import pytest
from pyspark.sql import Row

from sync_spark import tz
from sync_spark.operators.countquery import (
    coerce_literal,
    compile_condition,
    compile_query,
)
from sync_spark.spec import CountCondition, CountQuery, DateRange, SyncSpec


def test_coercion_chain():
    assert coerce_literal("42") == 42
    assert coerce_literal("4.5") == 4.5
    assert coerce_literal("abc") == "abc"
    assert coerce_literal(7) == 7


def test_table_scoping(spark):
    cond = CountCondition(field="x", operator="=", value=1, table="users")
    assert compile_condition(cond, for_table="orders") is None
    assert compile_condition(cond, for_table="users") is not None


def test_bad_operator(spark):
    with pytest.raises(ValueError, match="operator"):
        compile_condition(CountCondition(field="x", operator="LIKE", value="a"))


def test_compile_query_filters(spark):
    df = spark.createDataFrame(
        [Row(v=10, s="a", ts=datetime(2024, 1, 15, 3, 0)), Row(v=99, s="b", ts=datetime(2024, 2, 1))]
    )
    q = CountQuery(
        enabled=True,
        conditions=[CountCondition(field="v", operator=">", value="50")],
    )
    pred = compile_query(q)
    assert df.filter(pred).count() == 1


def test_daterange_boundaries():
    # JST day 2024-01-15 = UTC [01-14 15:00, 01-15 15:00)
    start, end = tz.jst_day_range(date(2024, 1, 15))
    assert start == datetime(2024, 1, 14, 15, 0)
    assert end == datetime(2024, 1, 15, 15, 0)
    # year boundary
    start, end = tz.jst_month_range(date(2023, 12, 31))
    assert start == datetime(2023, 11, 30, 15, 0)
    assert end == datetime(2023, 12, 31, 15, 0)
    # week: 2024-01-17 is Wednesday → Sunday 2024-01-14 JST
    start, end = tz.jst_week_range(date(2024, 1, 17))
    assert start == datetime(2024, 1, 13, 15, 0)


def test_sync_spec_json_roundtrip():
    spec = SyncSpec.from_json(
        """
        {"taskId": 3, "type": "mongodb", "enabled": true,
         "mappings": [{"sourceDatabase": "src", "targetDatabase": "tgt",
                       "tables": [{"sourceTable": "users", "targetTable": "users_t",
                                   "ignoreDeleteOps": true}]}],
         "fieldSecurity": {"users": [{"field": "email", "securityType": "encrypted"}]},
         "countQuery": {"enabled": true,
                        "conditions": [{"field": "status", "operator": "=", "value": "active"}],
                        "dateRange": {"type": "offset", "field": "updated_at",
                                      "startOffset": -7, "endOffset": 0}},
         "pkColumns": {"users": ["id"]}}
        """
    )
    assert spec.task_id == 3
    assert spec.mappings[0].tables[0].ignore_delete_ops is True
    assert spec.field_security["users"][0].security_type == "encrypted"
    assert spec.count_query.date_range.start_offset == -7
    assert spec.pk_columns["users"] == ["id"]

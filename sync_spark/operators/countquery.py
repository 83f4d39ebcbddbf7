"""countQuery condition DSL → Column compiler (SURVEY.md §2.2 P3-P8,
§2.4 A2).

Reference semantics (pkg/utils/query_counter.go):
- equality / comparison operators with string→int64→float64 coercion
  attempts (:185-244) — we coerce the *literal* driver-side, exactly
  like the reference builds its Mongo filter / SQL WHERE, so Catalyst
  still sees a plain pushdown-able predicate;
- per-condition table scoping (:88-91): a condition only applies when
  its ``table`` matches the queried table (P12);
- dateRange windows computed in JST then converted to UTC (:96-181),
  delegated to sync_spark.tz.
"""

from __future__ import annotations

from datetime import date, datetime
from typing import Any, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sync_spark import tz
from sync_spark.spec import CountCondition, CountQuery, DateRange

_OPS = {"=", "==", ">", ">=", "<", "<=", "!=", "<>"}


def coerce_literal(value: Any) -> Any:
    """string → int → float fallback chain (query_counter.go:186-196)."""
    if not isinstance(value, str):
        return value
    try:
        return int(value)
    except ValueError:
        pass
    try:
        return float(value)
    except ValueError:
        return value


def compile_condition(cond: CountCondition, for_table: Optional[str] = None) -> Optional[Column]:
    """One condition → Column predicate; None when scoped to another
    table (P12). A table-scoped condition applies ONLY when the
    queried table is known to match — with no table context it is
    skipped, not applied everywhere."""
    if cond.table and cond.table != for_table:
        return None
    op = cond.operator.strip()
    if op not in _OPS:
        raise ValueError(f"unsupported countQuery operator: {op!r}")
    lit = F.lit(coerce_literal(cond.value))
    c = F.col(cond.field)
    if op in ("=", "=="):
        return c == lit
    if op == ">":
        return c > lit
    if op == ">=":
        return c >= lit
    if op == "<":
        return c < lit
    if op == "<=":
        return c <= lit
    return c != lit  # != / <>


def window_for_range(dr: DateRange, anchor: date) -> tuple[datetime, datetime]:
    """dateRange type → half-open UTC (start, end) window — the ONE
    type dispatcher, shared by the countQuery compiler and the backup
    planner (a backup that ignored ``type`` would silently export
    1/7th of a weekly window)."""
    kind = dr.type
    if kind == "daily" or kind == "today":
        return tz.jst_day_range(anchor)
    if kind == "yesterday":
        return tz.jst_offset_day_range(anchor, -1, 0)
    if kind == "weekly":
        return tz.jst_week_range(anchor)
    if kind == "monthly":
        return tz.jst_month_range(anchor)
    if kind == "offset":
        return tz.jst_offset_day_range(anchor, dr.start_offset, dr.end_offset)
    raise ValueError(f"unsupported dateRange type: {kind!r}")


def compile_date_range(dr: DateRange, anchor: date) -> Column:
    """dateRange → half-open UTC literal range on ``dr.field``.

    ``anchor`` stands in for the reference's "now" so plans are
    deterministic and testable; production callers pass date.today().
    """
    start, end = window_for_range(dr, anchor)
    c = F.col(dr.field)
    return (c >= F.lit(tz.fmt(start)).cast("timestamp")) & (
        c < F.lit(tz.fmt(end)).cast("timestamp")
    )


def compile_query(
    q: CountQuery, for_table: Optional[str] = None, anchor: Optional[date] = None
) -> Optional[Column]:
    """Full countQuery → single AND-ed predicate (or None = match all).
    A disabled countQuery compiles to match-all — the reference only
    applies the filter when ``enabled`` is set."""
    if not getattr(q, "enabled", True):
        return None
    preds: list[Column] = []
    for cond in q.conditions:
        p = compile_condition(cond, for_table)
        if p is not None:
            preds.append(p)
    if q.date_range is not None:
        preds.append(compile_date_range(q.date_range, anchor or date.today()))
    if not preds:
        return None
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def count_with_query(
    df: DataFrame, q: CountQuery, for_table: Optional[str] = None, anchor: Optional[date] = None
) -> DataFrame:
    """A2 filtered count (CountDocuments(filter) analog) as a 1-row
    DataFrame."""
    pred = compile_query(q, for_table, anchor)
    if pred is not None:
        df = df.filter(pred)
    return df.agg(F.count(F.lit(1)).alias("cnt"))

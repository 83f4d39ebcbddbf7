"""Backup/export planning (SURVEY.md §3.2, §2.2 P13, §2.7 U1/U2,
§2.8 F5/F6/F10, §4 partition pruning).

Re-expresses pkg/backup/executor.go's plan phase:
- regex/catalog table expansion (executor.go:420-458,
  mysql.go:518-578),
- grouping date-suffixed sibling tables (`t_202501`, `t_202502`) by
  prefix (executor.go:460-501),
- parsing `_YYYYMM` / `_YYYYMMDD` / `_YYYY` suffixes into time ranges
  (executor.go:661-747),
- pruning groups to tables overlapping the query window
  (executor.go:562-700) — table-granularity partition pruning; when
  the same data is modeled as a date-partitioned table, Catalyst does
  this natively, so the helper exists for name-suffixed legacy
  catalogs only,
- file-name pattern rendering with {table} / {YYYY} / {MM} / {DD}
  placeholders (time_utils.go:25-51, executor.go:121-154).

Everything here is driver-side planning over catalog *names* — tiny
data, plain Python, feeding lazy Spark plans built in
sources/writers.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import date, datetime, timedelta
from typing import Optional

_SUFFIXES = [
    (re.compile(r"^(.*)_(\d{8})$"), "day"),
    (re.compile(r"^(.*)_(\d{6})$"), "month"),
    (re.compile(r"^(.*)_(\d{4})$"), "year"),
    (re.compile(r"^(.*)_(\d+)$"), "numeric"),
]


def expand_tables(catalog: list[str], patterns: list[str], is_regex: bool) -> list[str]:
    """P13: resolve the spec's table list against the live catalog.
    Both branches dedup — a duplicated pattern must not double-export
    a table's rows through the group union."""
    if not is_regex:
        cat = set(catalog)
        seen_lit: set[str] = set()
        out_lit = []
        for t in patterns:
            if t in cat and t not in seen_lit:
                seen_lit.add(t)
                out_lit.append(t)
        return out_lit
    out: list[str] = []
    for pat in patterns:
        rx = re.compile(pat)
        out.extend(t for t in catalog if rx.search(t))
    # stable order, no dups
    seen: set[str] = set()
    uniq = []
    for t in sorted(out):
        if t not in seen:
            seen.add(t)
            uniq.append(t)
    return uniq


def split_suffix(table: str) -> tuple[str, Optional[str], Optional[str]]:
    """→ (prefix, suffix_digits, kind) where kind ∈
    {day, month, year, numeric, None}."""
    for rx, kind in _SUFFIXES:
        m = rx.match(table)
        if m:
            return m.group(1), m.group(2), kind
    return table, None, None


def group_by_prefix(tables: list[str]) -> dict[str, list[str]]:
    """U2: date/numeric-suffixed siblings under one group key."""
    groups: dict[str, list[str]] = {}
    for t in tables:
        prefix, _, _ = split_suffix(t)
        groups.setdefault(prefix, []).append(t)
    for g in groups.values():
        g.sort()
    return groups


def table_time_range(table: str) -> Optional[tuple[datetime, datetime]]:
    """F10: `_YYYYMM` → that month, `_YYYYMMDD` → that day, `_YYYY` →
    that year; half-open; None for unsuffixed/numeric tables."""
    _, digits, kind = split_suffix(table)
    if kind == "day":
        try:
            d = datetime.strptime(digits, "%Y%m%d")
        except ValueError:
            return None  # 8-digit suffix that isn't a date (t_99999999)
        return d, d + timedelta(days=1)
    if kind == "month":
        try:
            d = datetime.strptime(digits, "%Y%m")
        except ValueError:
            return None  # 6-digit suffix that isn't a month (t_999999)
        nxt = datetime(d.year + (d.month == 12), d.month % 12 + 1, 1)
        return d, nxt
    if kind == "year":
        y = int(digits)
        if not 1900 <= y <= 2200:
            return None  # 4-digit numeric suffix that isn't a year
        return datetime(y, 1, 1), datetime(y + 1, 1, 1)
    return None


def prune_tables(
    tables: list[str], window: Optional[tuple[datetime, datetime]]
) -> list[str]:
    """Partition pruning at table-name granularity: keep tables whose
    derived range overlaps the window; undated tables always kept
    (they might contain anything — executor.go keeps them too)."""
    if window is None:
        return list(tables)
    lo, hi = window
    kept = []
    for t in tables:
        rng = table_time_range(t)
        if rng is None or (rng[0] < hi and rng[1] > lo):
            kept.append(t)
    return kept


def render_file_name(pattern: str, table: str, day: date) -> str:
    """F5/F6: {table} + {YYYY}/{MM}/{DD} placeholder substitution."""
    out = pattern.replace("{table}", table)
    out = out.replace("{YYYY}", f"{day.year:04d}")
    out = out.replace("{MM}", f"{day.month:02d}")
    out = out.replace("{DD}", f"{day.day:02d}")
    return out


@dataclass
class ExportUnit:
    """One artifact: a group of sibling tables exported as one file."""

    group: str
    tables: list[str]
    fields: list[str] = field(default_factory=list)  # empty/["all"] = *
    file_name: str = ""


def plan_export(
    catalog: list[str],
    patterns: list[str],
    is_regex: bool,
    fields_by_table: dict[str, list[str]],
    window: Optional[tuple[datetime, datetime]],
    file_pattern: str,
    run_day: date,
) -> list[ExportUnit]:
    """Full §3.2 plan phase: expand → group → prune → name."""
    tables = expand_tables(catalog, patterns, is_regex)
    units = []
    for prefix, members in sorted(group_by_prefix(tables).items()):
        kept = prune_tables(members, window)
        if not kept:
            continue
        # projections may be keyed by the group prefix OR by a real
        # (suffixed) member table name — spec.py documents "table →
        # projection", so the member-name key must work too
        fields = fields_by_table.get(prefix)
        if fields is None:
            fields = next(
                (fields_by_table[t] for t in kept if t in fields_by_table),
                fields_by_table.get("*", []),
            )
        if fields == ["all"]:
            fields = []
        units.append(
            ExportUnit(
                group=prefix,
                tables=kept,
                fields=fields,
                file_name=render_file_name(file_pattern, prefix, run_day),
            )
        )
    names = [u.file_name for u in units]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        # mode('overwrite') on a shared path would silently keep only
        # the LAST group's artifact — a lost backup, not a warning
        raise ValueError(
            f"file_name_pattern {file_pattern!r} renders the same artifact "
            f"path for multiple table groups ({sorted(dupes)}); include "
            "{table} in the pattern"
        )
    return units

"""Job-spec model — the engine's IR #1.

Mirrors the reference's config JSON semantics (pkg/config/config.go:
15-64: SyncConfig / DatabaseMapping / TableMapping / AdvancedSettings;
:101-112 fieldSecurity; pkg/utils/query_counter.go:15-26 countQuery)
as plain dataclasses loadable from the same JSON shape. Specs drive
batch snapshot jobs, streaming CDC pipelines, backup/export plans and
monitoring ticks.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class FieldSecurity:
    field: str  # dotted path for nested documents ("a.b.c")
    security_type: str  # "masked" | "encrypted"

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> "FieldSecurity":
        return cls(field=d["field"], security_type=d.get("securityType", "masked"))


@dataclass
class CountCondition:
    field: str
    operator: str  # = > >= < <= != <>
    value: Any
    table: Optional[str] = None  # condition applies only to this table (P12)

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> "CountCondition":
        return cls(
            field=d["field"],
            operator=d.get("operator", "="),
            value=d.get("value"),
            table=d.get("table"),
        )


@dataclass
class DateRange:
    """countQuery dateRange (query_counter.go:96-181) / backup offset
    range (external_simple.go:528-596)."""

    type: str = "daily"  # daily | yesterday | weekly | monthly | offset
    field: str = "updated_at"
    start_offset: int = 0
    end_offset: int = 1

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> "DateRange":
        return cls(
            type=d.get("type", "daily"),
            field=d.get("field", "updated_at"),
            start_offset=int(d.get("startOffset", 0)),
            end_offset=int(d.get("endOffset", 1)),
        )


@dataclass
class CountQuery:
    enabled: bool = False
    conditions: list[CountCondition] = field(default_factory=list)
    date_range: Optional[DateRange] = None

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> "CountQuery":
        return cls(
            enabled=bool(d.get("enabled", False)),
            conditions=[CountCondition.from_json(c) for c in d.get("conditions", [])],
            date_range=DateRange.from_json(d["dateRange"]) if d.get("dateRange") else None,
        )


@dataclass
class TableMapping:
    source_table: str
    target_table: str
    ignore_delete_ops: bool = False  # P11

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> "TableMapping":
        return cls(
            source_table=d["sourceTable"],
            target_table=d.get("targetTable", d["sourceTable"]),
            ignore_delete_ops=bool(d.get("ignoreDeleteOps", False)),
        )


@dataclass
class DatabaseMapping:
    source_database: str
    target_database: str
    tables: list[TableMapping] = field(default_factory=list)

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> "DatabaseMapping":
        return cls(
            source_database=d.get("sourceDatabase", ""),
            target_database=d.get("targetDatabase", ""),
            tables=[TableMapping.from_json(t) for t in d.get("tables", [])],
        )


@dataclass
class SyncSpec:
    task_id: int
    type: str  # mongodb | mysql | mariadb | postgresql | redis | parquet
    enabled: bool = True
    mappings: list[DatabaseMapping] = field(default_factory=list)
    field_security: dict[str, list[FieldSecurity]] = field(default_factory=dict)  # table → rules
    count_query: Optional[CountQuery] = None
    pk_columns: dict[str, list[str]] = field(default_factory=dict)  # table → PK cols

    @classmethod
    def from_json(cls, d: dict[str, Any] | str) -> "SyncSpec":
        if isinstance(d, str):
            d = json.loads(d)
        fs: dict[str, list[FieldSecurity]] = {}
        for table, rules in d.get("fieldSecurity", {}).items():
            fs[table] = [FieldSecurity.from_json(r) for r in rules]
        return cls(
            task_id=int(d.get("taskId", 0)),
            type=d.get("type", "parquet"),
            enabled=bool(d.get("enabled", True)),
            mappings=[DatabaseMapping.from_json(m) for m in d.get("mappings", [])],
            field_security=fs,
            count_query=CountQuery.from_json(d["countQuery"]) if d.get("countQuery") else None,
            pk_columns={k: list(v) for k, v in d.get("pkColumns", {}).items()},
        )


@dataclass
class BackupSpec:
    """pkg/backup/executor.go:31-55 ExecutorBackupConfig."""

    name: str
    tables: list[str]  # names or regexes (isRegex)
    fields: dict[str, list[str]] = field(default_factory=dict)  # table → projection, "all" = *
    file_format: str = "jsonl"  # jsonl | csv
    is_regex: bool = False
    date_range: Optional[DateRange] = None
    file_name_pattern: str = "{table}_{YYYY}-{MM}-{DD}"
    compression: Optional[str] = "gzip"

    @classmethod
    def from_json(cls, d: dict[str, Any] | str) -> "BackupSpec":
        if isinstance(d, str):
            d = json.loads(d)
        return cls(
            name=d.get("name", "backup"),
            tables=list(d.get("tables", [])),
            fields={k: list(v) for k, v in d.get("fields", {}).items()},
            file_format=d.get("format", "jsonl"),
            is_regex=bool(d.get("isRegex", False)),
            date_range=DateRange.from_json(d["query"]) if d.get("query") else None,
            file_name_pattern=d.get("fileNamePattern", "{table}_{YYYY}-{MM}-{DD}"),
            compression=d.get("compression", "gzip"),
        )

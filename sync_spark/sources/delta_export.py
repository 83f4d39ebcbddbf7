"""Delta-Lake-protocol export of the bucketed CDC store — closes the
table-format seam (SURVEY.md §2.1 S12; reference parity:
pkg/syncer/*'s targets are live databases, this engine's target is a
lakehouse table) from the WRITE side without the Delta jars: the
Delta transaction log is a PUBLIC, implementation-independent format
(delta.io PROTOCOL.md — JSON action files under ``_delta_log/`` next
to ordinary parquet), so the store can be *published* as a real Delta
table that any Delta reader (Spark+delta jar, delta-rs, DuckDB delta,
Trino, ...) consumes directly, even though this container cannot
itself read Delta back.

Mechanism per export:

1. hard-link every live parquet part file into the export dir,
   preserving the hive layout (``__bucket=K/part-*.parquet`` →
   Delta partition column ``__bucket``); links are metadata-only and
   pin inodes, so files the STORE later rewrites stay readable in the
   export — which is exactly Delta's tombstone/time-travel contract;
2. diff the live file set against the log replay of the previous
   version (add/remove applied in order — the same replay a Delta
   reader does) and append ONE new ``{version:020d}.json`` with
   `remove` actions for vanished files and `add` actions for new
   ones. No data change → no new version (idempotent);
3. version 0 additionally carries `protocol` (minReader 1 /
   minWriter 2) and `metaData` (stable table id, Spark schemaString,
   partitionColumns=[__bucket]); the metaData is re-emitted when the
   merged store schema evolves, which is Delta's own schema-evolution
   mechanism.

Crash-safety follows the repo discipline: the JSON commit is staged
under a dot-tmp name and ``os.replace``d into place (Delta requires
put-if-absent per version; a single-writer local export gets that
from the atomic rename), and links happen BEFORE the commit so a
crash can only leak unreferenced files, never reference missing ones.

Scale: an export is O(#changed files) link syscalls + one JSON
append — the add/remove diff touches file NAMES only, no data scan.
At 100 TB with 4096 buckets and a few files per bucket the log stays
KB-sized per version; Delta's checkpoint-parquet compaction is the
documented next step when version count grows into the thousands
(readers replay from the last checkpoint; without one they replay all
JSON versions — correct, just slower).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from typing import Optional

from pyspark.sql import SparkSession

from sync_spark.sources.bucketed import (
    BUCKET_COL,
    read_target,
    recover_interrupted_swaps,
)

LOG_DIR = "_delta_log"


def _log_path(delta_dir: str) -> str:
    return os.path.join(delta_dir, LOG_DIR)


def _version_file(delta_dir: str, version: int) -> str:
    return os.path.join(_log_path(delta_dir), f"{version:020d}.json")


def log_versions(delta_dir: str) -> list[int]:
    """Committed log versions, ascending (the reader's listing step)."""
    lp = _log_path(delta_dir)
    if not os.path.isdir(lp):
        return []
    out = []
    for e in os.listdir(lp):
        if e.endswith(".json") and e[:-5].isdigit():
            out.append(int(e[:-5]))
    return sorted(out)


def _read_actions(delta_dir: str, version: int) -> list[dict]:
    with open(_version_file(delta_dir, version)) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def replay_log(delta_dir: str) -> dict:
    """Replay the full log the way a Delta reader does: later actions
    win per path. Returns {'files': {path: add_action}, 'metaData':
    last metaData or None, 'protocol': last protocol or None,
    'version': last version or -1}."""
    files: dict[str, dict] = {}
    meta: Optional[dict] = None
    proto: Optional[dict] = None
    versions = log_versions(delta_dir)
    for v in versions:
        for action in _read_actions(delta_dir, v):
            if "add" in action:
                files[action["add"]["path"]] = action["add"]
            elif "remove" in action:
                files.pop(action["remove"]["path"], None)
            elif "metaData" in action:
                meta = action["metaData"]
            elif "protocol" in action:
                proto = action["protocol"]
    return {
        "files": files,
        "metaData": meta,
        "protocol": proto,
        "version": versions[-1] if versions else -1,
    }


def _live_files(store_path: str) -> dict[str, dict]:
    """Current store parquet files keyed by their export-relative path
    (``__bucket=K/part-*.parquet``) with size/mtime/partition value."""
    recover_interrupted_swaps(store_path)
    out: dict[str, dict] = {}
    for b in sorted(os.listdir(store_path)):
        if not b.startswith(f"{BUCKET_COL}="):
            continue
        bval = b.split("=", 1)[1]
        bdir = os.path.join(store_path, b)
        for f in sorted(os.listdir(bdir)):
            if not f.endswith(".parquet") or f.startswith((".", "_")):
                continue
            st = os.stat(os.path.join(bdir, f))
            out[f"{b}/{f}"] = {
                "src": os.path.join(bdir, f),
                "partitionValues": {BUCKET_COL: bval},
                "size": st.st_size,
                "modificationTime": int(st.st_mtime * 1000),
            }
    return out


def _schema_string(spark: SparkSession, store_path: str) -> str:
    """Spark-JSON schemaString of the logical table + the __bucket
    partition column (Delta schemas include partition columns)."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    df = read_target(spark, store_path)
    fields = list(df.schema.fields) + [StructField(BUCKET_COL, IntegerType(), True)]
    return StructType(fields).json()


def _link_file(src: str, dst: str) -> None:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if os.path.exists(dst):
        return  # immutable part files: same name == same bytes
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def export_delta(
    spark: SparkSession, store_path: str, delta_dir: str, operation: str = "MERGE"
) -> Optional[int]:
    """Publish the store's CURRENT state as the next Delta log version
    under ``delta_dir``. Returns the committed version number, or None
    when nothing changed (no empty commits). Safe to call after every
    CdcPipeline batch; cost is proportional to the touched buckets."""
    state = replay_log(delta_dir)
    live = _live_files(store_path)

    adds = {p: a for p, a in live.items() if p not in state["files"]}
    removes = sorted(p for p in state["files"] if p not in live)
    schema_string = _schema_string(spark, store_path)
    meta_changed = (
        state["metaData"] is None or state["metaData"]["schemaString"] != schema_string
    )
    if not adds and not removes and not meta_changed:
        return None

    # link data files BEFORE committing the log entry: a crash here
    # leaks unreferenced links, never a log that points at nothing
    for p, a in sorted(adds.items()):
        _link_file(a["src"], os.path.join(delta_dir, p))

    version = state["version"] + 1
    now_ms = int(time.time() * 1000)
    actions: list[dict] = [
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": operation,
                "operationParameters": {},
                "engineInfo": "sync_spark-delta-export",
            }
        }
    ]
    if version == 0:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
    if meta_changed:
        prior_id = state["metaData"]["id"] if state["metaData"] else uuid.uuid4().hex
        actions.append(
            {
                "metaData": {
                    "id": prior_id,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_string,
                    "partitionColumns": [BUCKET_COL],
                    "configuration": {},
                    "createdTime": (
                        state["metaData"]["createdTime"]
                        if state["metaData"]
                        else now_ms
                    ),
                }
            }
        )
    for p in removes:
        actions.append(
            {
                "remove": {
                    "path": p,
                    "deletionTimestamp": now_ms,
                    "dataChange": True,
                }
            }
        )
    for p, a in sorted(adds.items()):
        actions.append(
            {
                "add": {
                    "path": p,
                    "partitionValues": a["partitionValues"],
                    "size": a["size"],
                    "modificationTime": a["modificationTime"],
                    "dataChange": True,
                }
            }
        )

    os.makedirs(_log_path(delta_dir), exist_ok=True)
    final = _version_file(delta_dir, version)
    if os.path.exists(final):
        raise RuntimeError(
            f"delta export conflict: version {version} already exists in "
            f"{delta_dir!r} (concurrent exporter?)"
        )
    tmp = os.path.join(
        _log_path(delta_dir), f".tmp_{version:020d}_{uuid.uuid4().hex[:8]}.json"
    )
    with open(tmp, "w") as fh:
        for action in actions:
            fh.write(json.dumps(action, separators=(",", ":")) + "\n")
    os.replace(tmp, final)
    return version


def read_export(spark: SparkSession, delta_dir: str, version: Optional[int] = None):
    """Read the exported table AS A DELTA READER WOULD — replay the
    log up to ``version`` (default: latest) and scan exactly the
    active file set with partition values from the log, NOT from
    directory listing. This is the in-container verification path (no
    delta jar needed) and doubles as time travel over the export."""
    from pyspark.sql import functions as F

    if version is None:
        version = replay_log(delta_dir)["version"]
    files: dict[str, dict] = {}
    for v in log_versions(delta_dir):
        if v > version:
            break
        for action in _read_actions(delta_dir, v):
            if "add" in action:
                files[action["add"]["path"]] = action["add"]
            elif "remove" in action:
                files.pop(action["remove"]["path"], None)
    if not files:
        raise ValueError(f"no active files at version {version} in {delta_dir!r}")
    paths = [os.path.join(delta_dir, p) for p in sorted(files)]
    # basePath keeps partition discovery consistent; mergeSchema
    # mirrors read_target's evolution behavior
    df = (
        spark.read.option("basePath", delta_dir)
        .option("mergeSchema", "true")
        .parquet(*paths)
    )
    if BUCKET_COL in df.columns:
        df = df.drop(BUCKET_COL)
    return df


def vacuum_export(delta_dir: str, keep_versions: int = 2) -> dict:
    """Delta-style VACUUM for the export: physically delete data files
    that are NOT referenced by any of the last ``keep_versions`` log
    versions' active sets, then drop the log files older than the
    retained window. Time travel remains exact within the window and
    is explicitly surrendered before it — the same contract as Delta's
    ``VACUUM ... RETAIN``.

    The survivor set is the UNION of per-version replays (a file
    removed at version N is still needed to read version N-1), so this
    never breaks a retained as-of read. Files are unlinked (the store
    may still hold the inode via its own link — vacuum only releases
    the export's pin). Returns counts for the caller's audit log.

    Log truncation keeps replayability: the oldest retained version's
    full active state is REWRITTEN as a self-contained base commit
    (protocol + metaData + every active add) under its own version
    number before older JSON files are dropped — the same collapsing a
    Delta checkpoint performs, expressed in the JSON log itself so
    readers need no checkpoint support."""
    versions = log_versions(delta_dir)
    if not versions:
        return {"deleted_files": 0, "dropped_versions": 0}
    retained = versions[-keep_versions:]
    cutoff = retained[0]

    # replay up to each retained version; union of actives = survivors
    survivors: set[str] = set()
    per_version: dict[int, dict[str, dict]] = {}
    files: dict[str, dict] = {}
    meta: Optional[dict] = None
    proto: Optional[dict] = None
    for v in versions:
        for action in _read_actions(delta_dir, v):
            if "add" in action:
                files[action["add"]["path"]] = action["add"]
            elif "remove" in action:
                files.pop(action["remove"]["path"], None)
            elif "metaData" in action:
                meta = action["metaData"]
            elif "protocol" in action:
                proto = action["protocol"]
        if v >= cutoff:
            per_version[v] = dict(files)
            survivors |= set(files)

    # delete unreferenced data files
    deleted = 0
    for b in sorted(os.listdir(delta_dir)):
        if not b.startswith(f"{BUCKET_COL}="):
            continue
        bdir = os.path.join(delta_dir, b)
        for f in sorted(os.listdir(bdir)):
            rel = f"{b}/{f}"
            if f.endswith(".parquet") and rel not in survivors:
                os.unlink(os.path.join(bdir, f))
                deleted += 1
        if not os.listdir(bdir):
            os.rmdir(bdir)

    dropped = [v for v in versions if v < cutoff]
    if dropped:
        # rewrite the cutoff version as a self-contained base commit
        # (staged + os.replace: a crash leaves the old, still-valid
        # chain in place)
        base_actions: list[dict] = [
            {
                "commitInfo": {
                    "timestamp": int(time.time() * 1000),
                    "operation": "VACUUM BASE",
                    "operationParameters": {"keepVersions": keep_versions},
                    "engineInfo": "sync_spark-delta-export",
                }
            }
        ]
        if proto:
            base_actions.append({"protocol": proto})
        if meta:
            base_actions.append({"metaData": meta})
        for p in sorted(per_version[cutoff]):
            base_actions.append({"add": per_version[cutoff][p]})
        tmp = os.path.join(
            _log_path(delta_dir), f".tmp_base_{cutoff:020d}_{uuid.uuid4().hex[:8]}.json"
        )
        with open(tmp, "w") as fh:
            for action in base_actions:
                fh.write(json.dumps(action, separators=(",", ":")) + "\n")
        os.replace(tmp, _version_file(delta_dir, cutoff))
        for v in dropped:
            os.unlink(_version_file(delta_dir, v))
    return {"deleted_files": deleted, "dropped_versions": len(dropped)}

"""Snapshot / time-travel layer for the bucketed CDC store — the
dependency-free slice of what Delta/Iceberg would provide on a real
cluster (SURVEY.md §2.1 S12/S13 extension; the table-format MERGE
backend itself stays environment-blocked, this closes the *read*
side: reproducible as-of reads and operational rollback).

Mechanism: after a merge, ``snapshot_create`` HARD-LINKS every live
bucket's parquet files into ``.snapshots/v{N}/__bucket=K/``. Links are
metadata-only (no data copy) and pin the inode: the store's
rename-aside swaps later delete the live *directory entries*, but the
snapshot's links keep the bytes alive. Parquet part files are
immutable once written (the store swaps directories, never rewrites
files in place), so a link IS a consistent frozen copy.

Cost model at 100 TB: one snapshot = O(#files) link syscalls + one
manifest write — no data movement, no scan. Retention is explicit
(``expire_snapshots``); space cost of old snapshots is only the delta
of replaced buckets, because untouched buckets share inodes across
every snapshot that references them.

The ``.snapshots`` root is dot-prefixed, so Spark's file listing on
the LIVE table never sees it (same discipline as the ``.old_*``
parking dirs and ``.sync_meta.json``).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_spark.sources.bucketed import (
    BUCKET_COL,
    _swap_dir,
    read_target,
    recover_interrupted_swaps,
)

SNAP_DIR = ".snapshots"
MANIFEST = "manifest.json"


def _snap_root(path: str) -> str:
    return os.path.join(path, SNAP_DIR)


def _manifest_path(path: str) -> str:
    return os.path.join(_snap_root(path), MANIFEST)


def _read_manifest(path: str) -> dict:
    mp = _manifest_path(path)
    if not os.path.exists(mp):
        return {"versions": []}
    with open(mp) as fh:
        return json.load(fh)


def _write_manifest(path: str, manifest: dict) -> None:
    """Atomic (write-tmp + rename) so a crash mid-write can't leave a
    torn manifest that orphans every existing snapshot."""
    os.makedirs(_snap_root(path), exist_ok=True)
    tmp = _manifest_path(path) + f".tmp_{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, _manifest_path(path))


def snapshot_versions(path: str) -> list[dict]:
    """Committed snapshot descriptors, oldest first."""
    return list(_read_manifest(path)["versions"])


def _link_tree(src_dir: str, dst_dir: str) -> int:
    """Hard-link every regular file of one bucket dir; falls back to
    copy if the filesystem refuses links (still correct, just not
    free). Returns the file count."""
    os.makedirs(dst_dir, exist_ok=True)
    n = 0
    for entry in os.listdir(src_dir):
        s, d = os.path.join(src_dir, entry), os.path.join(dst_dir, entry)
        if not os.path.isfile(s):
            continue
        try:
            os.link(s, d)
        except OSError:
            shutil.copy2(s, d)
        n += 1
    return n


def _clean_stale_stages(path: str) -> None:
    """Drop leaked rollback staging dirs (a crash between _link_tree
    and the swap leaves a `.rbstage_*` hard-link tree that pins old
    file bytes; recover_interrupted_swaps only knows the store's own
    parking names)."""
    if not os.path.isdir(path):
        return
    for e in os.listdir(path):
        if e.startswith(".rbstage_"):
            shutil.rmtree(os.path.join(path, e), ignore_errors=True)


def snapshot_create(path: str, note: str = "") -> int:
    """Freeze the CURRENT live state as the next version. Staged under
    a dot-tmp name and renamed into place, so a crash mid-link leaves
    no half-registered version (the manifest is only updated after the
    rename)."""
    recover_interrupted_swaps(path)
    _clean_stale_stages(path)
    manifest = _read_manifest(path)
    # next version accounts for ORPHAN v* dirs too (a crash between
    # the rename below and the manifest append leaves an unreferenced
    # vN dir): numbering only off the manifest would collide with the
    # orphan and wedge every subsequent snapshot on ENOTEMPTY
    on_disk = []
    if os.path.isdir(_snap_root(path)):
        for e in os.listdir(_snap_root(path)):
            if e.startswith("v") and e[1:].isdigit():
                on_disk.append(int(e[1:]))
    version = 1 + max(
        [v["version"] for v in manifest["versions"]] + on_disk, default=0
    )
    final = os.path.join(_snap_root(path), f"v{version}")
    stage = os.path.join(_snap_root(path), f".tmp_v{version}_{uuid.uuid4().hex[:8]}")
    buckets = [e for e in os.listdir(path) if e.startswith(f"{BUCKET_COL}=")]
    if not buckets:
        raise ValueError(f"nothing to snapshot: no {BUCKET_COL}= dirs under {path!r}")
    n_files = 0
    for b in sorted(buckets):
        n_files += _link_tree(os.path.join(path, b), os.path.join(stage, b))
    # carry the layout contract so a snapshot is self-describing even
    # if the live table is later re-bucketized
    meta_src = os.path.join(path, ".sync_meta.json")
    if os.path.exists(meta_src):
        shutil.copy2(meta_src, os.path.join(stage, ".sync_meta.json"))
    os.rename(stage, final)
    manifest["versions"].append(
        {
            "version": version,
            "buckets": len(buckets),
            "files": n_files,
            "created_unix": int(time.time()),
            "note": note,
        }
    )
    _write_manifest(path, manifest)
    return version


def read_snapshot(spark: SparkSession, path: str, version: int) -> DataFrame:
    """Time-travel read: the table exactly as of ``version``. Same
    reader as the live table (bucket column dropped), so downstream
    plans are identical."""
    versions = {v["version"] for v in snapshot_versions(path)}
    if version not in versions:
        raise ValueError(
            f"unknown snapshot version {version} for {path!r}; have {sorted(versions)}"
        )
    return read_target(spark, os.path.join(_snap_root(path), f"v{version}"))


def snapshot_rollback(spark: SparkSession, path: str, version: int) -> int:
    """Restore the live table to ``version``. The pre-rollback state
    is snapshotted FIRST, so a rollback is itself undoable (returns
    that safety version). Buckets are replaced wholesale: dirs present
    live but absent from the snapshot are removed (the snapshot is the
    full table state, not a delta)."""
    versions = {v["version"] for v in snapshot_versions(path)}
    if version not in versions:
        raise ValueError(
            f"unknown snapshot version {version} for {path!r}; have {sorted(versions)}"
        )
    _clean_stale_stages(path)
    safety = snapshot_create(path, note=f"pre-rollback-to-v{version}")
    snap = os.path.join(_snap_root(path), f"v{version}")
    live_buckets = {e for e in os.listdir(path) if e.startswith(f"{BUCKET_COL}=")}
    snap_buckets = {e for e in os.listdir(snap) if e.startswith(f"{BUCKET_COL}=")}
    for b in sorted(snap_buckets):
        dst = os.path.join(path, b)
        # dot-prefixed stage: a `<bucket>__stage_x` name would read as
        # a partition dir with a poisoned value; a crash pre-swap
        # leaks only an invisible dot-dir
        stage = os.path.join(path, f".rbstage_{uuid.uuid4().hex[:8]}")
        _link_tree(os.path.join(snap, b), stage)
        # the store's crash-safe swap (park live under .old_*, rename
        # stage in, drop parking): a crash at any point is healed by
        # recover_interrupted_swaps — a bare rmtree+rename window would
        # leave the bucket MISSING with nothing to recover from
        _swap_dir(stage, dst)
    for b in sorted(live_buckets - snap_buckets):
        # park-then-delete (same discipline as _swap_dir): a crash
        # mid-rmtree on the live name would leave a partially-deleted
        # bucket visible to readers; renamed to a dot-prefixed parking
        # name first, the worst case is an invisible leaked dir that
        # _clean_stale_stages drops on the next snapshot entry
        doomed = os.path.join(path, f".rbstage_doomed_{uuid.uuid4().hex[:8]}")
        os.rename(os.path.join(path, b), doomed)
        shutil.rmtree(doomed, ignore_errors=True)
    meta_src = os.path.join(snap, ".sync_meta.json")
    if os.path.exists(meta_src):
        shutil.copy2(meta_src, os.path.join(path, ".sync_meta.json"))
    return safety


def expire_snapshots(path: str, keep_last: int) -> list[int]:
    """Drop all but the newest ``keep_last`` versions. Shared inodes
    mean only bytes unreferenced by ANY remaining snapshot (or the
    live table) are actually reclaimed. Returns expired versions."""
    if keep_last < 0:
        raise ValueError("keep_last must be >= 0")
    manifest = _read_manifest(path)
    vs = sorted(manifest["versions"], key=lambda v: v["version"])
    doomed = vs[: max(0, len(vs) - keep_last)]
    keep = vs[len(doomed):]
    # manifest first: a crash after this point leaves unreferenced
    # dirs (garbage, harmless) rather than referenced-but-deleted ones
    _write_manifest(path, {"versions": keep})
    expired = []
    for v in doomed:
        d = os.path.join(_snap_root(path), f"v{v['version']}")
        if os.path.exists(d):
            shutil.rmtree(d)
        expired.append(v["version"])
    return expired


def latest_version(path: str) -> Optional[int]:
    vs = snapshot_versions(path)
    return vs[-1]["version"] if vs else None


def snapshot_diff(
    spark: SparkSession,
    path: str,
    version_a: int,
    version_b: int,
    key_cols: list,
) -> DataFrame:
    """What changed between two frozen versions: one row per key that
    was ADDED, REMOVED, or CHANGED from ``version_a`` to ``version_b``
    (unchanged keys are absent). The operational companion to
    time-travel reads — "what did batch N actually do" without replay.

    Shape: full outer join on the key columns + a null-safe
    any-column-differs predicate — one co-partitioned shuffle per
    side, no collect; the same j_src_tgt_diff discipline as the
    monitoring surface."""
    a = read_snapshot(spark, path, version_a)
    b = read_snapshot(spark, path, version_b)
    value_cols = [c for c in a.columns if c not in key_cols]
    aa = a.select(
        *[F.col(k).alias(f"__ka_{k}") for k in key_cols],
        *[F.col(c).alias(f"__va_{c}") for c in value_cols],
        F.lit(True).alias("__in_a"),
    )
    bb = b.select(
        *[F.col(k).alias(f"__kb_{k}") for k in key_cols],
        *[F.col(c).alias(f"__vb_{c}") for c in value_cols],
        F.lit(True).alias("__in_b"),
    )
    cond = None
    for k in key_cols:
        c = F.col(f"__ka_{k}").eqNullSafe(F.col(f"__kb_{k}"))
        cond = c if cond is None else (cond & c)
    j = aa.join(bb, cond, "full_outer")
    differs = F.lit(False)
    for c in value_cols:
        differs = differs | ~F.col(f"__va_{c}").eqNullSafe(F.col(f"__vb_{c}"))
    status = (
        F.when(F.col("__in_a").isNull(), F.lit("added"))
        .when(F.col("__in_b").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
    )
    out_keys = [
        F.coalesce(F.col(f"__ka_{k}"), F.col(f"__kb_{k}")).alias(k) for k in key_cols
    ]
    return (
        j.withColumn("change", status)
        .filter(F.col("change").isNotNull())
        .select(*out_keys, "change")
    )

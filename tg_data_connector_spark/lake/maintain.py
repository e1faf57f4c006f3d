"""Table maintenance: compaction, tombstone purge, orphan GC, snapshot expiry.

The operational counterparts of Iceberg's rewrite_data_files / expire_snapshots
/ remove_orphan_files, built on this repo's snapshot format. The reference has
no equivalent (it writes into an external DB); these exist because a
copy-on-write MERGE table accumulates per-commit files and delete tombstones.

Safety rules:
  * a tombstone may be purged only when every source partition's high-watermark
    has passed the point where an older event could still arrive for that key —
    the caller asserts this by passing ``purge_tombstones=True`` (typically
    after a full replay, or on a lag-bounded schedule at 100 TB);
  * orphan GC deletes only files referenced by NO manifest in `_versions/`
    (crash leftovers from between stage and publish);
  * snapshot expiry keeps the manifest chain bounded; data files still
    referenced by retained snapshots are kept.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from .table import BUCKET_COL, DELETED_COL, LakeTable, Snapshot, bucket_expr


def compact(
    table: LakeTable, purge_tombstones: bool = False, target_files_per_bucket: int = 1
) -> Snapshot:
    """Rewrite every bucket's files into one file (small-file compaction),
    optionally dropping tombstones. Commits one snapshot; readers of older
    snapshots are unaffected (files are immutable)."""
    snap = table.snapshot()
    meta = table.meta()
    df = table.read(snapshot=snap, with_lineage=True)
    if purge_tombstones:
        df = df.where(~F.col(DELETED_COL))
    df = df.withColumn(BUCKET_COL, bucket_expr(meta["key"], meta["buckets"]))
    files = table.write_data_files(df, snap.schema_id)
    all_buckets = sorted({f["bucket"] for f in snap.files} | {f["bucket"] for f in files})
    return table.commit(
        files,
        replace_buckets=all_buckets,
        summary_update={"compaction": True, "purged_tombstones": purge_tombstones},
    )


def gc_orphans(table: LakeTable) -> list[str]:
    """Delete data files referenced by no manifest (stage-then-crash leftovers).
    Returns the removed paths (relative)."""
    referenced: set[str] = set()
    for v in table.history():
        for f in table.snapshot(v).files:
            referenced.add(f["path"])
    removed = []
    data_root = os.path.join(table.root, "data")
    for commit_dir in sorted(os.listdir(data_root)):
        cpath = os.path.join(data_root, commit_dir)
        if not os.path.isdir(cpath):
            continue
        bdirs = [
            d for d in os.listdir(cpath) if os.path.isdir(os.path.join(cpath, d))
        ]
        live = False
        for bdir in bdirs:
            for fn in os.listdir(os.path.join(cpath, bdir)):
                if f"data/{commit_dir}/{bdir}/{fn}" in referenced:
                    live = True
        if not live:
            for bdir in bdirs:
                for fn in os.listdir(os.path.join(cpath, bdir)):
                    removed.append(f"data/{commit_dir}/{bdir}/{fn}")
            shutil.rmtree(cpath)
    return removed


def expire_snapshots(table: LakeTable, keep_last: int = 10) -> list[int]:
    """Drop manifests older than the last N (current is always kept). Data files
    still referenced by retained snapshots survive; newly unreferenced files
    become orphans for gc_orphans. Returns expired version numbers."""
    history = table.history()
    current = table.current_version()
    keep = set(history[-keep_last:]) | {current}
    expired = []
    for v in history:
        if v not in keep:
            os.remove(table._vpath(v))
            expired.append(v)
    return expired

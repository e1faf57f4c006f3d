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
    """Delete data files referenced by no snapshot (stage-then-crash leftovers)
    and manifest shards referenced by no version file. Returns the removed
    paths (relative). All I/O goes through the table's FS seam (``lake/fs.py``)
    so a DFS-backed table is maintainable without touching this code."""
    fs = table.fs
    referenced: set[str] = set()
    shard_refs: set[str] = set()
    for v in table.history():
        snap = table.snapshot(v)
        for f in snap.files:
            referenced.add(f["path"])
        shard_refs.update(snap.manifests.values())
    removed = []
    data_root = os.path.join(table.root, "data")
    for commit_dir in fs.listdir(data_root):
        cpath = os.path.join(data_root, commit_dir)
        if not fs.isdir(cpath):
            continue
        bdirs = [d for d in fs.listdir(cpath) if fs.isdir(os.path.join(cpath, d))]
        live = False
        for bdir in bdirs:
            for fn in fs.listdir(os.path.join(cpath, bdir)):
                if f"data/{commit_dir}/{bdir}/{fn}" in referenced:
                    live = True
        if not live:
            for bdir in bdirs:
                for fn in fs.listdir(os.path.join(cpath, bdir)):
                    removed.append(f"data/{commit_dir}/{bdir}/{fn}")
            fs.rmtree(cpath)
    mdir = table._mdir()
    if fs.exists(mdir):
        for fn in fs.listdir(mdir):
            rel = f"_manifests/{fn}"
            if rel not in shard_refs:
                fs.remove(os.path.join(mdir, fn))
                removed.append(rel)
    return removed


def expire_snapshots(table: LakeTable, keep_last: int = 10) -> list[int]:
    """Drop version files older than the last N (current is always kept). Data
    files and manifest shards still referenced by retained snapshots survive;
    newly unreferenced ones become orphans for gc_orphans. Returns expired
    version numbers."""
    history = table.history()
    current = table.current_version()
    keep = set(history[-keep_last:]) | {current}
    expired = []
    for v in history:
        if v not in keep:
            table.fs.remove(table._vpath(v))
            table._snap_cache.pop(v, None)
            expired.append(v)
    return expired

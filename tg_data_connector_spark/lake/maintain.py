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
    (crash leftovers from between stage and publish); because a concurrent
    commit stages data files and manifest shards BEFORE its version file
    exists, GC additionally skips anything younger than ``min_age_seconds``
    (default 1 h) — run with 0 only when no writer can be in flight;
  * snapshot expiry keeps the manifest chain bounded; data files still
    referenced by retained snapshots are kept.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import functions as F

from .table import (
    BUCKET_COL,
    DELETED_COL,
    CommitConflict,
    LakeTable,
    Snapshot,
    bucket_expr,
)


def compact(
    table: LakeTable,
    purge_tombstones: bool = False,
    buckets: list[int] | None = None,
    cluster_by: list[str] | None = None,
    files_per_bucket: int = 4,
    cluster_method: str | None = None,
    zorder_bits: int = 8,
    target_rows_per_file: int | None = None,
) -> Snapshot:
    """Rewrite buckets' files into one file each (small-file compaction),
    folding any merge-on-read delta files into the base (the resolved read
    collapses them), optionally dropping tombstones. Commits one snapshot;
    readers of older snapshots are unaffected (files are immutable).

    ``buckets``: compact only this subset — INCREMENTAL maintenance. At
    100 TB a full-table compaction is a once-in-a-while job; steady-state
    maintenance compacts the buckets whose delta depth crossed a threshold
    (``delta_depths`` below picks them), each run O(selected buckets). None
    compacts the whole table.

    ``cluster_by`` (default: the table's declared ``cluster_cols``):
    CLUSTERED rewrite — Iceberg's rewrite_data_files with a sort order /
    Delta's OPTIMIZE ZORDER-lite. Each bucket is split into up to
    ``files_per_bucket`` files by RANGE of the cluster columns
    (``repartitionByRange`` on (bucket, *cluster), then a within-partition
    sort), so every emitted file carries a tight min/max on those columns.
    This is what makes ``stats_cols`` manifest pruning work on data whose
    ARRIVAL order doesn't cluster the column: appends land value-interleaved
    (full-range stats, nothing prunes), one clustered compaction later
    ``read(filters=...)`` skips whole files, and the within-file sort makes
    the pushed predicate skip row groups inside the survivors. Plain
    compaction (``cluster_by=None`` and no declared cluster_cols) keeps the
    old one-file-per-bucket behavior.

    ``cluster_method`` (default: the table's declared ``cluster_method``,
    else ``"range"``): ``"range"`` is the lexicographic split above —
    optimal when filters always constrain the LEADING cluster column.
    ``"zorder"`` (Delta OPTIMIZE ZORDER BY) range-splits on a Morton
    z-value interleaving every cluster column's rank bits (``lake/zorder``),
    so a filter on ANY one of k z columns still skips ~(1 - F^(-1/k)) of
    each bucket's F files — the right layout when queries filter the
    clustered columns independently. Within-file rows still sort
    lexicographically on the cluster columns (row-group pruning inside
    survivors). ``zorder_bits`` bounds the per-column rank resolution.

    ``target_rows_per_file`` (clustered rewrites only): size the output by
    ROWS instead of a uniform ``files_per_bucket`` — the rows-denominated
    analog of Delta OPTIMIZE's file-size target, using the manifest's
    per-file row counts (no data I/O). The range partitioner's equi-depth
    sampling then allocates MORE files to bigger buckets automatically, so
    a skewed table gets uniform file sizes rather than uniform file counts.
    Falls back to ``files_per_bucket`` if any selected manifest entry
    predates row counts.

    Basis-protected: the rewrite embeds the rows of the snapshot it READ, so
    the commit passes ``expected_parent`` — a concurrent writer landing
    between the read and the publish raises ``CommitConflict`` instead of
    being silently erased by the compacted files. Re-run on conflict (the
    operation is idempotent and there is no urgency ordering)."""
    snap = table.snapshot()
    meta = table.meta()
    nb = table.bucket_count(snap)
    df = table.read(snapshot=snap, with_lineage=True, buckets=buckets)
    if purge_tombstones:
        df = df.where(~F.col(DELETED_COL))
    df = df.withColumn(BUCKET_COL, bucket_expr(meta["key"], nb))
    cluster = cluster_by if cluster_by is not None else meta.get("cluster_cols")
    if cluster:
        missing = [c for c in cluster if c not in df.columns]
        if missing:
            raise ValueError(f"cluster_by columns not in table: {missing}")
        # range-split WITHIN buckets: partitions hold contiguous (bucket,
        # cluster...) ranges, so partitionBy("b") emits ~files_per_bucket
        # files per bucket, each spanning a narrow cluster-column slice.
        # The shuffle is the same O(rows) exchange the plain rewrite pays —
        # range instead of hash partitioning, plus one sampling pass.
        n_parts = nb * max(1, files_per_bucket)
        if target_rows_per_file:
            chosen_set = None if buckets is None else set(buckets)
            counts = [
                f.get("rows")
                for f in snap.files
                if chosen_set is None or f["bucket"] in chosen_set
            ]
            if counts and all(c is not None for c in counts):
                total = sum(counts)
                # equi-depth ranges spread rows evenly across partitions,
                # so a global rows budget sizes every output file — bigger
                # buckets simply span more ranges
                n_parts = max(nb, -(-total // target_rows_per_file))
        method = (
            cluster_method
            if cluster_method is not None
            else meta.get("cluster_method", "range")
        )
        if method not in ("range", "zorder"):
            raise ValueError(f"unknown cluster_method: {method!r}")
        if method == "zorder" and len(cluster) >= 2:
            from .zorder import with_zvalue

            # the projection dropping _z preserves the range partitioning
            df = with_zvalue(df, list(cluster), bits=zorder_bits).repartitionByRange(
                n_parts, F.col(BUCKET_COL), F.col("_z")
            ).drop("_z")
        else:
            df = df.repartitionByRange(
                n_parts, F.col(BUCKET_COL), *[F.col(c) for c in cluster]
            )
        files = table.write_data_files(
            df,
            snap.schema_id,
            n_buckets=nb,
            bucket_aligned=True,  # layout established above — no re-shuffle
            sort_cols=list(cluster),
        )
    else:
        files = table.write_data_files(df, snap.schema_id, n_buckets=nb)
    chosen = None if buckets is None else set(buckets)
    replace = sorted(
        {
            f["bucket"]
            for f in snap.files
            if chosen is None or f["bucket"] in chosen
        }
        | {f["bucket"] for f in files}
    )
    return table.commit(
        files,
        replace_buckets=replace,
        summary_update={"compaction": True, "purged_tombstones": purge_tombstones},
        expected_parent=snap.version,
    )


def rebucket(table: LakeTable, new_n_buckets: int) -> Snapshot:
    """Bucket-count evolution (Iceberg's partition-spec evolution for the
    bucket transform): rewrite the whole table into ``new_n_buckets`` and
    switch the count in the SAME atomic commit.

    Why this must exist at 100 TB: the bucket count fixes the merge-join /
    write parallelism AND the per-bucket file size. A table created at, say,
    32 buckets and grown 1000x ends up with ~3 TB buckets — too coarse for
    bucket pruning, too big per write task. Doubling the bucket count on a
    live table is routine capacity maintenance, not a table migration.

    Mechanics: one resolved read of the current snapshot (folds any
    merge-on-read deltas, keeps tombstones — their anti-resurrection
    semantics must survive the rewrite), one repartition to the new count,
    one commit replacing EVERY old bucket. The new count rides
    ``summary["buckets"]``, which every subsequent commit inherits and every
    writer reads via ``LakeTable.bucket_count`` — so the layout switch is the
    snapshot pointer swap itself: crash anywhere and the table is still
    wholly old-layout or wholly new-layout, never mixed.

    Marked ``compaction`` in the summary: a physical rewrite with no logical
    change, so the change-data-feed (``table.changes``) skips it.

    Concurrency: basis-protected like ``compact`` — a concurrent writer
    publishing between read and publish raises ``CommitConflict``; re-run.
    A concurrent writer that LOSES to the rebucket re-runs its merge and
    picks up the new count from the fresh snapshot."""
    if new_n_buckets < 1:
        raise ValueError(f"new_n_buckets must be >= 1, got {new_n_buckets}")
    snap = table.snapshot()
    meta = table.meta()
    old_nb = table.bucket_count(snap)
    if new_n_buckets == old_nb:
        return snap
    df = table.read(snapshot=snap, with_lineage=True)
    df = df.withColumn(BUCKET_COL, bucket_expr(meta["key"], new_n_buckets))
    files = table.write_data_files(
        df, snap.schema_id, n_buckets=new_n_buckets
    )
    replace = sorted(
        {f["bucket"] for f in snap.files} | {f["bucket"] for f in files}
    )
    return table.commit(
        files,
        replace_buckets=replace,
        summary_update={
            "buckets": new_n_buckets,
            "compaction": True,
            "rebucket": {"from": old_nb, "to": new_n_buckets},
        },
        expected_parent=snap.version,
    )


def delta_depths(snap: Snapshot) -> dict[int, int]:
    """Per-bucket count of merge-on-read delta files in a snapshot — the
    incremental-compaction picker: ``compact(t, buckets=[b for b, d in
    delta_depths(s).items() if d > threshold])``. Pure metadata, no I/O."""
    out: dict[int, int] = {}
    for f in snap.files:
        if f.get("kind") == "delta":
            b = int(f["bucket"])
            out[b] = out.get(b, 0) + 1
    return out


def gc_orphans(table: LakeTable, min_age_seconds: float = 3600.0) -> list[str]:
    """Delete data files referenced by no snapshot (stage-then-crash leftovers)
    and manifest shards referenced by no version file. Returns the removed
    paths (relative). All I/O goes through the table's FS seam (``lake/fs.py``)
    so a DFS-backed table is maintainable without touching this code.

    ONE recursive listing per area (``fs.list_files_recursive``) instead of a
    per-directory ``listdir`` crawl: through a DFS seam each listdir is a
    driver-side RPC round trip, so a table with thousands of commit dirs would
    turn GC into an O(directories) driver crawl; the recursive call streams
    the subtree back in a single iterator (Iceberg's remove_orphan_files does
    the same).

    ``min_age_seconds`` protects in-flight commits: a concurrent writer stages
    its data files and manifest shards BEFORE publishing the version file
    (table.py two-phase order), so a GC pass in that window would otherwise
    delete files the about-to-publish snapshot references. Anything younger
    than the threshold is skipped (Iceberg's ``older_than`` semantics; default
    1 h). Pass 0 only when no concurrent writer can exist (tests, cold
    tables)."""
    import time

    fs = table.fs
    referenced: set[str] = set()
    shard_refs: set[str] = set()
    for v in table.history():
        snap = table.snapshot(v)
        for f in snap.files:
            referenced.add(f["path"])
        shard_refs.update(snap.manifests.values())
    removed = []
    cutoff = time.time() - min_age_seconds
    data_root = os.path.join(table.root, "data")
    # group the flat recursive listing back into commit dirs: deletion stays
    # whole-commit-dir (a live commit dir keeps even its unreferenced files,
    # matching the previous behavior and keeping rmtree one call per dir)
    by_commit: dict[str, list[str]] = {}
    if fs.exists(data_root):
        prefix = data_root.rstrip("/") + "/"
        for path in fs.list_files_recursive(data_root):
            rel = path[len(prefix):] if path.startswith(prefix) else \
                path.split("/data/", 1)[-1]
            commit_dir = rel.split("/", 1)[0]
            by_commit.setdefault(commit_dir, []).append(rel)
    for commit_dir, rels in by_commit.items():
        cpath = os.path.join(data_root, commit_dir)
        if any(f"data/{r}" in referenced for r in rels):
            continue
        if min_age_seconds > 0 and any(
            fs.mtime(os.path.join(data_root, r)) > cutoff for r in rels
        ):
            continue  # possibly a commit in flight: staged but not yet published
        removed.extend(f"data/{r}" for r in rels)
        fs.rmtree(cpath)
    mdir = table._mdir()
    if fs.exists(mdir):
        for fn in fs.listdir(mdir):
            rel = f"_manifests/{fn}"
            if rel in shard_refs:
                continue
            fpath = os.path.join(mdir, fn)
            if min_age_seconds > 0 and fs.mtime(fpath) > cutoff:
                continue  # shard staged by an in-flight commit
            fs.remove(fpath)
            removed.append(rel)
    return removed


@dataclass
class MaintenanceAction:
    """One recommended maintenance step. ``kind`` is ``"compact"`` /
    ``"expire_snapshots"`` / ``"gc_orphans"``; ``params`` are the kwargs
    ``run_maintenance`` passes to the corresponding function; ``reason`` is
    the human-readable trigger (which threshold fired, on what evidence)."""

    kind: str
    buckets: list[int] | None = None
    reason: str = ""
    params: dict = field(default_factory=dict)


def plan_maintenance(
    table: LakeTable,
    max_base_files_per_bucket: int = 8,
    max_delta_depth: int = 4,
    keep_last_snapshots: int = 10,
    snapshot_slack: int = 5,
) -> list[MaintenanceAction]:
    """Recommend maintenance from SNAPSHOT METADATA ONLY — the advisory layer
    of Delta's auto-OPTIMIZE / Iceberg's maintenance recommendations. Reads
    the current manifest and version history; never lists or opens data
    files, so planning cost is O(manifest) on the driver no matter how big
    the table is — safe to run after every ingest batch at 100 TB.

    Triggers:
      * a bucket's merge-on-read delta depth exceeds ``max_delta_depth``
        (every read of that bucket pays an LWW resolve over that many extra
        files) -> incremental ``compact`` of the offending buckets;
      * a bucket's BASE file count exceeds ``max_base_files_per_bucket``
        (each append commit lands one file per touched bucket, so steady
        ingest accumulates small files; with declared ``cluster_cols`` the
        new files are also un-clustered, eroding stats pruning) -> compact,
        which re-establishes the declared range/zorder layout as a side
        effect;
      * version history longer than ``keep_last_snapshots + snapshot_slack``
        -> ``expire_snapshots(keep_last=keep_last_snapshots)``, then
        ``gc_orphans`` to reclaim the newly unreferenced files (the pair is
        ordered: expiry is what CREATES the orphans). Crash leftovers from
        failed commits also need GC but are invisible to metadata — schedule
        a periodic ``gc_orphans`` independently of this planner.

    Returns actions in safe execution order (compactions first — they shrink
    what later snapshots reference — then expiry, then GC). Empty list =
    healthy table."""
    snap = table.snapshot()
    meta = table.meta()
    actions: list[MaintenanceAction] = []

    base_counts: dict[int, int] = {}
    for f in snap.files:
        if f.get("kind") != "delta":
            b = int(f["bucket"])
            base_counts[b] = base_counts.get(b, 0) + 1
    deltas = delta_depths(snap)

    deep = sorted(b for b, d in deltas.items() if d > max_delta_depth)
    wide = sorted(
        b for b, n in base_counts.items() if n > max_base_files_per_bucket
    )
    need = sorted(set(deep) | set(wide))
    if need:
        nb = table.bucket_count(snap)
        reasons = []
        if deep:
            reasons.append(
                f"delta depth > {max_delta_depth} in buckets {deep}"
            )
        if wide:
            reasons.append(
                f"base files > {max_base_files_per_bucket} in buckets {wide}"
            )
        if meta.get("cluster_cols"):
            reasons.append(
                f"rewrite re-clusters on {meta['cluster_cols']} "
                f"({meta.get('cluster_method', 'range')})"
            )
        actions.append(
            MaintenanceAction(
                kind="compact",
                # full-table compact when every bucket tripped: one pass,
                # and the planner's output stays O(1) instead of O(buckets)
                buckets=None if len(need) == nb else need,
                reason="; ".join(reasons),
            )
        )

    history = table.history()
    if len(history) > keep_last_snapshots + snapshot_slack:
        actions.append(
            MaintenanceAction(
                kind="expire_snapshots",
                reason=(
                    f"{len(history)} snapshots > keep_last "
                    f"{keep_last_snapshots} + slack {snapshot_slack}"
                ),
                params={"keep_last": keep_last_snapshots},
            )
        )
        actions.append(
            MaintenanceAction(
                kind="gc_orphans",
                reason="reclaim files unreferenced after snapshot expiry",
            )
        )
    return actions


def run_maintenance(
    table: LakeTable,
    actions: list[MaintenanceAction] | None = None,
    max_retries: int = 3,
    **plan_kwargs,
) -> dict[str, object]:
    """Execute a maintenance plan (default: ``plan_maintenance(table,
    **plan_kwargs)``). Compactions are retried on ``CommitConflict`` —
    ``compact`` re-reads the snapshot at entry, so a retry IS the documented
    recovery (a concurrent ingest won the pointer swap; the rewrite is
    idempotent and has no urgency ordering). Returns a summary dict:
    ``{"compacted": [versions], "expired": [versions], "gc_removed": [paths],
    "actions": n}``."""
    if actions is None:
        actions = plan_maintenance(table, **plan_kwargs)
    out: dict[str, object] = {
        "compacted": [],
        "expired": [],
        "gc_removed": [],
        "actions": len(actions),
    }
    for a in actions:
        if a.kind == "compact":
            last: CommitConflict | None = None
            for _ in range(max_retries):
                try:
                    snap = compact(table, buckets=a.buckets, **a.params)
                    out["compacted"].append(snap.version)
                    last = None
                    break
                except CommitConflict as exc:
                    last = exc
            if last is not None:
                raise last
        elif a.kind == "expire_snapshots":
            out["expired"].extend(expire_snapshots(table, **a.params))
        elif a.kind == "gc_orphans":
            out["gc_removed"].extend(gc_orphans(table, **a.params))
        else:
            raise ValueError(f"unknown maintenance action: {a.kind!r}")
    return out


def expire_snapshots(table: LakeTable, keep_last: int = 10) -> list[int]:
    """Drop version files older than the last N (current is always kept,
    and so is every TAGGED version and every BRANCH head — Iceberg's
    ref-based retention; version files are self-contained, so a ref head
    alone keeps its state readable). Data files and manifest shards still
    referenced by retained snapshots survive; newly unreferenced ones become
    orphans for gc_orphans. Returns expired version numbers."""
    history = table.history()
    current = table.current_version()
    keep = (
        set(history[-keep_last:])
        | {current}
        | set(table.tags().values())
        | set(table.branches().values())
    )
    expired = []
    for v in history:
        if v not in keep:
            table.fs.remove(table._vpath(v))
            table._snap_cache.pop(v, None)
            expired.append(v)
    return expired

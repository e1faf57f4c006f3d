"""Row-level DML over a lake table: ``delete_where`` / ``update_where``.

The reference has no row DML — its ``writeMode: update`` defers row mutation
to the destination DB's own engine (``WriterUtil.java:148-168`` builds an
ON-DUPLICATE/upsert statement and lets MySQL/Oracle resolve rows). A
lake-resident table has no such engine underneath, so these are the
``DELETE FROM`` / ``UPDATE ... WHERE`` analogs every Delta/Iceberg user runs
directly (GDPR/right-to-be-forgotten purges, retention sweeps, backfill
corrections). They are expressed as ONE engine batch through the SAME two
commit paths as CDC replay:

* ``mode="cow"`` -> ``merge_upsert``: copy-on-write rewrite of only the
  buckets holding matched keys (the bucket probe inside ``_merge_once``
  prunes the rewrite set — a selective predicate rewrites ~|matched|/|table|
  of the data, not the table);
* ``mode="mor"`` -> ``delta_append``: O(matched) delta/tombstone files, the
  base is never read back for the write (the read side already LWW-resolves
  base+delta; ``maintain.compact`` folds later).

Because both paths are the replay engine's own, tombstone semantics,
idempotent re-commit (optional ``batch_id``), optimistic-concurrency retry,
and write-audit-publish (``publish=False``) are inherited, not
re-implemented.

Versioning: each matched row's mutation is stamped ``(row._lsn,
row._seq + 1)`` — per-key, it beats exactly the version it read, needs no
global max-version scan and no new watermark machinery, and any later
genuine CDC event (higher ``commit_lsn``) still wins LWW over the manual
edit. The pathological collision — a real upstream event that reuses the
matched row's exact ``(lsn, seq+1)`` — would tie rather than lose; callers
that interleave DML with a live tail on the SAME keys should quiesce the
tail first (the same caveat Iceberg documents for concurrent UPDATE vs
streaming upsert).

Isolation: read-committed snapshot isolation, not serializable. The matched
set is computed against the snapshot current at call time; if a concurrent
writer commits first, the inherited ``CommitConflict`` retry re-applies the
SAME computed mutation against the new snapshot (row-level last-writer-wins)
— Iceberg's documented copy-on-write UPDATE behavior.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .merge import delta_append, merge_upsert
from .table import DELETED_COL, LSN_COL, SEQ_COL, LakeTable, Snapshot

__all__ = ["delete_where", "update_where"]


def _writer(mode: str):
    if mode == "cow":
        return merge_upsert
    if mode == "mor":
        return delta_append
    raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")


def _matched(table: LakeTable, snap: Snapshot, predicate: Column | str):
    """Live rows matching the predicate, with their winning (_lsn, _seq)."""
    if isinstance(predicate, str):
        predicate = F.expr(predicate)
    cur = table.read(snapshot=snap, with_lineage=True)
    # with_lineage skips the reader's tombstone filter — apply it here so a
    # purge can never "match" an already-deleted key and re-tombstone it
    return cur.where(~F.col(DELETED_COL)).where(predicate)


def _stamp(df, op: str, overrides: dict[str, Column], cols: list[str]):
    sel = [
        (overrides[c] if c in overrides else F.col(c)).alias(c) for c in cols
    ]
    return df.select(
        *sel,
        F.lit(op).alias("op"),
        F.col(LSN_COL).cast("bigint").alias("commit_lsn"),
        (F.col(SEQ_COL) + F.lit(1)).cast("bigint").alias("seq_no"),
    )


def delete_where(
    table: LakeTable,
    predicate: Column | str,
    mode: str = "cow",
    publish: bool = True,
    batch_id: str | None = None,
) -> Snapshot | None:
    """Delete every live row matching ``predicate``. Deletes are tombstones
    (exactly as replayed 'D' events), so a late-arriving OLDER update can
    never resurrect a purged row. Returns the committed snapshot, or None if
    nothing matched. Re-running is a no-op (the rows are gone)."""
    write = _writer(mode)
    snap = table.snapshot()
    cols = snap.schema().names()
    src = _stamp(_matched(table, snap, predicate), "D", {}, cols)
    summary = {"batch_id": batch_id} if batch_id else None
    if mode == "mor" and src.isEmpty():
        # delta_append commits even for an empty batch (replay relies on the
        # commit to advance watermarks); DML has no watermark to advance, so
        # an unmatched predicate must be a no-op. The COW path needs no check
        # — its bucket probe already returns None on an empty match.
        return None
    return write(table, src, summary_update=summary, publish=publish)


def update_where(
    table: LakeTable,
    predicate: Column | str,
    assignments: dict[str, Column | str],
    mode: str = "cow",
    publish: bool = True,
    batch_id: str | None = None,
) -> Snapshot | None:
    """Set ``assignments`` (column -> expression over the current row) on
    every live row matching ``predicate``. The table key cannot be assigned
    (that is an insert+delete, not an update — same rule as Iceberg/Delta
    UPDATE). Returns the committed snapshot, or None if nothing matched.

    Re-running re-applies the same expressions (idempotent in content; each
    run that still matches commits a new snapshot with a bumped per-row
    ``seq``). Pass ``batch_id`` for strict at-most-once across retries of the
    same logical edit."""
    if not assignments:
        raise ValueError("update_where requires at least one assignment")
    snap = table.snapshot()
    cols = snap.schema().names()
    key = table.meta()["key"]
    overrides: dict[str, Column] = {}
    for name, expr in assignments.items():
        if name == key:
            raise ValueError(f"cannot assign the table key {key!r}")
        if name not in cols:
            raise ValueError(f"unknown column {name!r}; have {cols}")
        overrides[name] = F.expr(expr) if isinstance(expr, str) else expr
    write = _writer(mode)
    src = _stamp(_matched(table, snap, predicate), "U", overrides, cols)
    summary = {"batch_id": batch_id} if batch_id else None
    if mode == "mor" and src.isEmpty():
        return None  # see delete_where: DML no-ops on an unmatched predicate
    return write(table, src, summary_update=summary, publish=publish)

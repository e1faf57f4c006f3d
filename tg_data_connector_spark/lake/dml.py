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

__all__ = ["delete_where", "merge_into", "update_where"]


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
    if mode == "mor" and table.meta().get("resolution", "lww") != "lww":
        # COLUMNWISE tables fold MoR delta rows as partial images (NULL =
        # unchanged) — but update_where writes a FULL image (the resolved
        # row with assignments applied), and an assignment that sets a
        # column to NULL must stick. Mark each row as a RESTART (reset
        # version == its own version, read-mapped to a full-image insert,
        # table.py resolve_columnwise) so the fold replaces the row wholesale.
        src = src.withColumn(
            "_rv_lsn", F.col("commit_lsn").cast("bigint")
        ).withColumn("_rv_seq", F.col("seq_no").cast("bigint"))
    summary = {"batch_id": batch_id} if batch_id else None
    if mode == "mor" and src.isEmpty():
        return None  # see delete_where: DML no-ops on an unmatched predicate
    return write(table, src, summary_update=summary, publish=publish)


def merge_into(
    table: LakeTable,
    source: DataFrame,
    when_matched_update: dict[str, "Column | str"] | str | None = None,
    matched_condition: "Column | str | None" = None,
    when_matched_delete: bool = False,
    delete_condition: "Column | str | None" = None,
    when_not_matched_insert: dict[str, "Column | str"] | str | None = "all",
    insert_condition: "Column | str | None" = None,
    mode: str = "cow",
    publish: bool = True,
    batch_id: str | None = None,
    check_cardinality: bool = True,
    summary_update: dict | None = None,
) -> Snapshot | None:
    """Delta/Iceberg-style conditional ``MERGE INTO`` of an arbitrary source
    DataFrame, keyed by the table key. Generalizes the CDC upsert (whose ops
    arrive pre-labeled) to DECLARED clause semantics:

      matched + ``delete_condition``            -> DELETE (tombstone)
      matched + ``matched_condition``           -> UPDATE (assignments)
      matched + neither                         -> target row kept
      not matched + ``insert_condition``        -> INSERT
      target rows with no source match          -> untouched

    Clause order is Delta's: DELETE is evaluated before UPDATE. "Matched"
    means a LIVE target row; a tombstoned key counts as NOT matched (the
    insert resurrects it — stamped ``(tombstone_lsn, tombstone_seq + 1)`` so
    it beats the tombstone under LWW; see the module docstring's versioning
    contract).

    Conditions and assignment expressions may reference both sides through
    the aliases ``t`` (target) and ``s`` (source) — e.g.
    ``matched_condition="s.n_tok > t.n_tok"``,
    ``when_matched_update={"n_tok": "s.n_tok + t.n_tok"}``. The shorthand
    ``"all"`` maps every non-key table column to the same-named source
    column (update: only columns the source carries; insert: absent columns
    become NULL). The table key cannot be assigned.

    Cardinality: like Delta MERGE, the source must hold at most ONE row per
    key — ``check_cardinality`` enforces it with one bounded probe
    (``limit(1)`` on the duplicate set); disable for pre-deduplicated
    sources to save the job.

    Scale shape: the matching join reads ONLY the buckets holding source
    keys (one bounded collect of the source's distinct bucket ids — the same
    copy-on-write pruning as ``merge_upsert``, so a batch touching b of 2^k
    buckets scans b/2^k of the table), and the changeset rides the engine's
    own commit paths: ``mode="cow"`` rewrites the affected buckets,
    ``mode="mor"`` appends O(batch) delta files. Optimistic-concurrency
    retry, WAP (``publish=False``), and ``batch_id`` at-most-once are
    inherited from those paths, not re-implemented.
    """
    from .table import bucket_expr

    def _cond(x, default: bool):
        if x is None:
            return F.lit(default)
        return F.expr(x) if isinstance(x, str) else x

    if when_matched_update is None and not when_matched_delete \
            and when_not_matched_insert is None:
        raise ValueError("merge_into: no clauses given")
    snap = table.snapshot()
    cols = snap.schema().names()
    key = table.meta()["key"]
    nb = table.bucket_count(snap)

    def _assignments(spec, allow_missing: bool) -> dict[str, Column]:
        if spec is None:
            return {}
        if spec == "all":
            return {
                c: (
                    F.col(f"s.{c}")
                    if c in source.columns
                    else F.lit(None)
                )
                for c in cols
                if c != key and (c in source.columns or allow_missing)
            }
        out = {}
        for name, expr in spec.items():
            if name == key:
                raise ValueError(f"cannot assign the table key {key!r}")
            if name not in cols:
                raise ValueError(f"unknown column {name!r}; have {cols}")
            out[name] = F.expr(expr) if isinstance(expr, str) else expr
        return out

    upd = _assignments(when_matched_update, allow_missing=False)
    ins = _assignments(when_not_matched_insert, allow_missing=True)

    # the source plan feeds up to three consumers (cardinality probe, bucket
    # probe, matching join) — compute it once
    persisted = not (
        source.storageLevel.useMemory or source.storageLevel.useDisk
    )
    if persisted:
        source = source.persist()
    try:
        if check_cardinality:
            dup = (
                source.groupBy(key)
                .agg(F.count(F.lit(1)).alias("n"))
                .where(F.col("n") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"merge_into: source has multiple rows for key "
                    f"{dup[0][0]!r} (Delta MERGE cardinality rule)"
                )
        src_buckets = sorted(
            r[0]
            for r in source.select(
                bucket_expr(key, nb).alias("b")
            ).distinct().collect()
        )
        if not src_buckets:
            return None
        tgt = table.read(
            snapshot=snap, buckets=src_buckets, with_lineage=True
        ).alias("t")
        s = source.alias("s")
        j = s.join(tgt, F.col(f"s.{key}") == F.col(f"t.{key}"), "left_outer")

        t_exists = F.col(f"t.{key}").isNotNull()
        live = t_exists & ~F.coalesce(F.col(f"t.{DELETED_COL}"), F.lit(False))
        do_del = (
            live & _cond(delete_condition, True)
            if when_matched_delete
            else F.lit(False)
        )
        do_upd = (
            live & ~do_del & _cond(matched_condition, True)
            if upd
            else F.lit(False)
        )
        do_ins = (
            ~live & _cond(insert_condition, True)
            if when_not_matched_insert is not None
            else F.lit(False)
        )
        op = (
            F.when(do_del, F.lit("D"))
            .when(do_upd, F.lit("U"))
            .when(do_ins, F.lit("I"))
        )
        out_cols = [F.col(f"s.{key}").alias(key)]
        for c in cols:
            if c == key:
                continue
            upd_e = upd.get(c, F.col(f"t.{c}"))
            ins_e = ins.get(c, F.lit(None))
            out_cols.append(
                F.when(op == "U", upd_e)
                .when(op == "I", ins_e)
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
            )
        changeset = (
            j.where(op.isNotNull())
            .select(
                *out_cols,
                op.alias("op"),
                F.coalesce(F.col(f"t.{LSN_COL}"), F.lit(0))
                .cast("bigint")
                .alias("commit_lsn"),
                (F.coalesce(F.col(f"t.{SEQ_COL}"), F.lit(0)) + F.lit(1))
                .cast("bigint")
                .alias("seq_no"),
            )
        )
        if mode == "mor" and table.meta().get("resolution", "lww") != "lww":
            # Same rule as update_where above: merge_into's changeset rows
            # are FULL images (U rows carry every column of the resolved
            # row), but a columnwise fold would treat them as partial
            # images — a clause assigning NULL would silently keep the old
            # value, and on 'aggregate' tables an assigned value to a sum
            # column would be ADDED to the accumulator. Mark each row as a
            # restart so resolve_columnwise replaces the row wholesale.
            changeset = changeset.withColumn(
                "_rv_lsn", F.col("commit_lsn").cast("bigint")
            ).withColumn("_rv_seq", F.col("seq_no").cast("bigint"))
        write = _writer(mode)
        summary = dict(summary_update or {})
        if batch_id:
            summary["batch_id"] = batch_id
        summary = summary or None
        if mode == "mor" and changeset.isEmpty():
            return None  # no clause fired: DML no-ops (see delete_where)
        # affected_buckets stays None: merge_upsert's own probe shrinks the
        # rewrite to buckets with ACTUAL changeset rows (a clause-less match
        # must be a no-op, not an unchanged-bucket rewrite + empty commit)
        return write(
            table, changeset, summary_update=summary, publish=publish
        )
    finally:
        if persisted:
            source.unpersist()

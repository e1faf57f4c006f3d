"""Incremental table-to-table replication over the change-data-feed.

The lakehouse "medallion" hop the reference cannot express: its pipeline is
always source-system -> target-table, one job.json per copy
(``JobContainer.java`` drives exactly one reader/writer pair). Here a
downstream ``LakeTable`` subscribes to an upstream one through the upstream's
own change-data-feed (``LakeTable.changes`` — the consumer side of the CDC
contract), so a 100-TB bronze table fans out to silver tables at O(changes)
per hop, never O(table).

Guarantees (same bar as the replay engine):
  * exactly-once: the consumed upstream version rides the SAME snapshot
    commit as the data (``sync_from:<name>`` summary key + batch-id), so a
    crash between read and commit re-syncs from the old version and the
    batch-id check absorbs a duplicate commit;
  * incremental: one CDF read of the upstream commits since the last sync —
    merge-on-read commits stream back verbatim, COW commits diff only their
    touched buckets (see ``LakeTable.changes``), compactions are skipped;
  * schema-following: upstream added/widened columns are applied to the
    downstream table transactionally BEFORE the data merge (same
    schema-before-data rule the replay engine enforces); unsafe drift
    (narrowing, type conflicts) raises ``SchemaEvolutionError``;
  * LWW end-to-end: the CDF carries the upstream winners' (commit_lsn,
    seq_no); the downstream MERGE re-resolves on the same order, so syncing
    is idempotent and order-insensitive across overlapping runs.

Single logical subscriber per (downstream, source-name): two writers syncing
the same name into one table race their ``sync_from`` keys (last one wins —
safe but wasteful); different names compose fine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .evolve import apply_schema_change
from .merge import merge_upsert
from .table import (
    BUCKET_COL,
    DELETED_COL,
    LSN_COL,
    SEQ_COL,
    LakeTable,
    Snapshot,
    bucket_expr,
)


def _sync_key(source_name: str) -> str:
    return f"sync_from:{source_name}"


def _propagate_schema(src_schema, dst: LakeTable) -> None:
    """Bring dst's schema up to src's: add missing columns, widen drifted
    types. Each change is its own transactional schema commit (no data
    rewritten — Iceberg lazy evolution); unsafe drift raises."""
    import json

    dst_fields = dict(dst.snapshot().schema().fields)
    for name, typ in src_schema.fields:
        if name not in dst_fields:
            apply_schema_change(
                dst, json.dumps({"add_column": {"name": name, "type": typ}})
            )
        elif dst_fields[name].lower() != typ.lower():
            # apply_schema_change validates against the safe widening set
            # and raises SchemaEvolutionError on anything else
            apply_schema_change(
                dst, json.dumps({"widen": {"name": name, "to": typ}})
            )


def sync_table(
    src: LakeTable, dst: LakeTable, source_name: str = "default"
) -> Snapshot | None:
    """One incremental sync pass: apply every upstream change committed since
    the last pass to ``dst``. Returns the committed downstream snapshot, or
    None when already up to date.

    First pass bootstraps: a full read of the upstream snapshot INCLUDING
    tombstones (their (lsn, seq) anti-resurrection fences must exist
    downstream too, or a late event arriving downstream-only could revive a
    key the upstream already buried) written as the downstream base.
    """
    skey = _sync_key(source_name)
    dsnap = dst.snapshot()
    since = dsnap.summary.get(skey)
    cur = src.current_version()  # pin ONE upstream version for this pass
    if since is not None and int(since) >= cur:
        return None
    ssnap = src.snapshot(cur)
    _propagate_schema(ssnap.schema(), dst)
    key = dst.meta()["key"]
    batch_id = f"sync:{source_name}:{cur}"

    if since is None:
        # bootstrap: full state incl. tombstones, committed atomically with
        # the consumed-version marker (mirrors LakeTable.append + summary)
        nb = dst.bucket_count()
        out = src.read(snapshot=ssnap, with_lineage=True)
        dst_schema = dst.snapshot().schema()
        cols = [
            F.col(n).cast(t).alias(n) if n in out.columns
            else F.lit(None).cast(t).alias(n)
            for n, t in dst_schema.fields
        ]
        out = out.select(
            *cols, F.col(LSN_COL), F.col(SEQ_COL), F.col(DELETED_COL)
        ).withColumn(BUCKET_COL, bucket_expr(key, nb))
        files = dst.write_data_files(
            out, dst.snapshot().schema_id, n_buckets=nb
        )
        return dst.commit(
            files,
            replace_buckets=None,
            summary_update={skey: cur, "batch_id": batch_id},
        )

    ch = src.changes(int(since), cur)
    dst_schema = dst.snapshot().schema()
    payload = [
        F.col(n).cast(t).alias(n) if n in ch.columns
        else F.lit(None).cast(t).alias(n)
        for n, t in dst_schema.fields
    ]
    ev = ch.select(
        *payload,
        F.when(F.col(DELETED_COL), F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col(LSN_COL).alias("commit_lsn"),
        F.col(SEQ_COL).alias("seq_no"),
    )
    # the feed has one row per (commit, key); MERGE needs one per key
    from ..cdc.dedup import lww_dedup

    ev = lww_dedup(ev, key)
    snap = merge_upsert(dst, ev, summary_update={skey: cur, "batch_id": batch_id})
    if snap is None:
        # every commit since `since` was logically empty for us (e.g. pure
        # compactions): nothing to merge, nothing to move the marker past —
        # the next pass re-reads the same (cheap, still empty) window
        return None
    return snap

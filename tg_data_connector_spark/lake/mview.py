"""Incrementally-maintained aggregate views over a lake table's change feed.

The classic streaming "materialized view" the reference cannot express (its
pipeline is stateless row delivery, ``TaskGroupContainer.java``): a grouped
aggregate (counts, sums — and anything derivable from them: avg, rates)
kept current at **O(changes) per refresh, never O(table)**. At 100 TB a
nightly full ``GROUP BY`` over the bronze table is the single most expensive
recurring query a lake runs; maintaining it from the CDF makes the cost
proportional to the day's churn instead.

Algorithm (classic incremental view maintenance, signed delta counting):

  1. read the CDF once: ``src.changes(from_v, to_v)``, keep only each key's
     LATEST post-image in the range (intermediate states within the window
     cancel against nothing — only the endpoint matters);
  2. read the PRE-image of exactly the changed keys from the ``from_v``
     snapshot — bucket-pruned to the changed keys' buckets under ``from_v``'s
     own bucket count, so the subtraction side scans ~|changed buckets| of
     the table, not the table;
  3. signed contributions: post-images count +1 / +measure, pre-images count
     -1 / -measure; one hash-aggregate by the group columns collapses them
     to a per-group delta (map-side combined — the shuffle carries one row
     per distinct changed group);
  4. apply the delta through ``dml.merge_into`` with ADDITIVE assignments
     (``t.m + s.m``): groups whose maintained count reaches zero are
     DELETED, unseen groups INSERT, the consumed source version and a
     ``batch_id`` ride the same snapshot commit — crash between read and
     commit re-refreshes from the old version; a duplicate commit of the
     same window is absorbed by the batch-id check (exactly-once, the same
     contract as ``sync.py``).

Supported measures: ``("count", "*")`` and ``("sum", <expr>)`` — the
self-inverting aggregates. ``min``/``max`` are NOT incrementally
maintainable under deletes without per-group value multisets and raise
``ValueError`` (Flink's retract-stream rule; recompute those in full).

Retention contract: the refresh reads the ``from_v`` snapshot, so the
refresh cadence must beat ``maintain.expire_snapshots`` retention — the same
rule Delta documents for CDF consumers. Group columns may be NULL (a
sentinel-coded group key keeps NULL distinct from empty-string).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .dml import merge_into
from .table import (
    DELETED_COL,
    LSN_COL,
    SEQ_COL,
    LakeTable,
    Snapshot,
    TableSchema,
    bucket_expr,
)

GKEY = "_gkey"
CNT = "_cnt"
_NULL_MARK = "\x00\x01NULL"  # cannot collide with a real cast string
_SEP = "\x1f"


def _gkey_expr(group_by: list[str]):
    return F.concat_ws(
        _SEP,
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(_NULL_MARK))
            for c in group_by
        ],
    ).alias(GKEY)


def _check_measures(measures: dict[str, tuple[str, str]]) -> None:
    for out, (kind, _expr) in measures.items():
        if kind == "count":
            continue
        if kind == "sum":
            continue
        raise ValueError(
            f"measure {out!r}: {kind!r} is not incrementally maintainable "
            "under deletes (only count/sum self-invert); recompute in full"
        )
    if GKEY in measures or CNT in measures:
        raise ValueError(f"measure names {GKEY!r}/{CNT!r} are reserved")


def create_aggregate_view(
    src: LakeTable,
    root: str,
    group_by: list[str],
    measures: dict[str, tuple[str, str]],
    n_buckets: int = 16,
    fs=None,
) -> LakeTable:
    """Create the (empty) view table for ``refresh_aggregate``. Schema:
    sentinel-coded group key + the group columns (for direct reads) + the
    declared measures (sum outputs are stored as the source expression's
    Spark sum type: bigint for integral, double for floating) + the
    maintained row count ``_cnt``."""
    _check_measures(measures)
    src_schema = {f[0]: f[1] for f in src.snapshot().schema().fields}
    cols: list[tuple[str, str]] = [(GKEY, "string")]
    for g in group_by:
        if g not in src_schema:
            raise ValueError(f"group column {g!r} not in source schema")
        cols.append((g, src_schema[g]))
    probe = src.read().limit(0)
    for out, (kind, expr) in measures.items():
        if kind == "count":
            cols.append((out, "bigint"))
        else:
            t = probe.select(F.sum(F.expr(expr)).alias(out)).schema[0]
            cols.append((out, t.dataType.simpleString()))
    cols.append((CNT, "bigint"))
    return LakeTable.create(
        src.spark, root, TableSchema(cols), key=GKEY, n_buckets=n_buckets,
        fs=fs,
    )


def _contrib(df: DataFrame, group_by, measures, sign: int) -> DataFrame:
    sel = [_gkey_expr(group_by), *[F.col(c) for c in group_by]]
    for out, (kind, expr) in measures.items():
        e = F.lit(1) if kind == "count" else F.expr(expr)
        sel.append((F.lit(sign) * e).alias(out))
    sel.append(F.lit(sign).cast("bigint").alias(CNT))
    return df.select(*sel)


def refresh_aggregate(
    src: LakeTable,
    view: LakeTable,
    group_by: list[str],
    measures: dict[str, tuple[str, str]],
    source_name: str = "src",
    to_version: int | None = None,
    stats_out: dict | None = None,
) -> Snapshot | None:
    """Advance the view to ``src``'s state at ``to_version`` (default:
    current). Returns the view's new snapshot, or None when the source has
    not moved. Idempotent per window (batch-id); safe to re-run after a
    crash. See the module docstring for the delta algorithm and the
    retention contract."""
    _check_measures(measures)
    skey = f"mview_from:{source_name}"
    vsnap = view.snapshot()
    from_v = int(vsnap.summary.get(skey, 0))
    to_v = src.current_version() if to_version is None else to_version
    if to_v <= from_v:
        return None
    key = src.meta()["key"]

    ch = src.changes(from_v, to_v)
    # endpoint per key: the latest post-image in the window is the only row
    # whose contribution counts (earlier intra-window states never existed
    # as far as the from_v-anchored subtraction is concerned)
    latest = (
        ch.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(key).orderBy(
                    F.col(LSN_COL).desc(), F.col(SEQ_COL).desc()
                )
            ),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn", "_commit_version")
    ).persist()
    try:
        changed_keys = latest.select(key)
        old_snap = src.snapshot(from_v)
        nb_old = src.bucket_count(old_snap)
        bks = sorted(
            r[0]
            for r in changed_keys.select(
                bucket_expr(key, nb_old).alias("b")
            ).distinct().collect()
        )
        if stats_out is not None:  # observability: lets tests pin the
            # pre-image scan's bucket pruning (O(changed buckets), not O(table))
            stats_out.update(
                {"from": from_v, "to": to_v, "changed_buckets": list(bks)}
            )
        if not bks:
            return None
        # semi-join probe: AQE/auto-broadcast picks the strategy from the
        # actual changed-key width — a small CDF window broadcasts, a
        # full-table rewrite shuffles
        pre = src.read(snapshot=old_snap, buckets=bks).join(
            changed_keys, key, "left_semi"
        )
        post = latest.where(~F.col(DELETED_COL))
        delta = (
            _contrib(post, group_by, measures, +1)
            .unionByName(_contrib(pre, group_by, measures, -1))
            .groupBy(GKEY, *group_by)
            .agg(
                *[F.sum(out).alias(out) for out in measures],
                F.sum(CNT).alias(CNT),
            )
        )
        # drop no-op groups (rewrites that didn't change any measure): fewer
        # touched buckets for the COW merge
        nonzero = F.col(CNT) != 0
        for out in measures:
            nonzero = nonzero | (
                F.coalesce(F.col(out), F.lit(0)) != F.lit(0)
            )
        delta = delta.where(nonzero)

        adds = {out: f"t.{out} + coalesce(s.{out}, 0)" for out in measures}
        adds[CNT] = f"t.{CNT} + s.{CNT}"
        return merge_into(
            view,
            delta,
            when_matched_update=adds,
            when_matched_delete=True,
            delete_condition=f"t.{CNT} + s.{CNT} = 0",
            when_not_matched_insert="all",
            insert_condition=f"s.{CNT} <> 0",
            batch_id=f"mview:{source_name}:{from_v}->{to_v}",
            check_cardinality=False,  # delta is grouped by the key already
            summary_update={skey: to_v},
        )
    finally:
        latest.unpersist()

"""As-of (point-in-time) join — match each left row to the single most
recent right row at or before it, per key.

The operator every temporal pipeline hand-rolls: enrich an event with the
last-known dimension state, a quote with the prevailing rate, a training
document with the newest upstream annotation whose commit precedes it.
Neither Spark nor the reference (whose joins happen in the destination DB,
`WriterUtil.java:111-168`) ships one; DuckDB/pandas call it ASOF JOIN /
merge_asof.

Spark-first plan — the UNION-AND-CARRY form, not a range join:
  * the naive formulation (join on key + inequality, then keep the max) is a
    non-equi join: Catalyst can only plan it broadcast-nested-loop or sort-
    merge with per-key full cross products — O(|L| x matches) intermediate
    rows, a 100-TB killer when keys repeat heavily;
  * instead, both sides union into ONE stream tagged by side (right rows
    carry their payload as a struct, left rows carry null), and a window
    `last(payload, ignorenulls=True)` over
    (PARTITION BY key ORDER BY ts, side ROWS UNBOUNDED PRECEDING..CURRENT)
    carries the latest right payload forward onto every left row.
    Exactly ONE hash exchange on the key plus one in-partition sort —
    the same shape as any groupBy — and the intermediate is O(|L| + |R|),
    never the cross product. Equal timestamps: right sorts before left
    (side 0 < 1), so a right row AT the left timestamp matches, the
    inclusive `l.ts >= r.ts` convention (DuckDB ASOF, pandas merge_asof
    default).
  * `tolerance` bounds staleness post-match (match older than N time units
    -> unmatched) — a filter expression, no plan change.

Right-side uniqueness per (key, ts) is REQUIRED for determinism (which of
two same-instant right rows "the" match is is undefined everywhere —
merge_asof takes physical order, DuckDB an arbitrary one); callers dedupe
with their own rule first. `asof_join` validates this cheaply when asked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_PAYLOAD = "_asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_ts: str | None = None,
    suffix: str = "_r",
    strict: bool = False,
    tolerance=None,
) -> DataFrame:
    """Left as-of join: every left row, plus the columns of the most recent
    right row with the same ``on`` key and ``right_ts`` <= left ``ts``
    (strictly < when ``strict``); null-extended when no right row precedes.

    ``tolerance``: a Column/interval expression — matches where
    ``ts - right_ts > tolerance`` are nulled out (pandas merge_asof
    semantics). Right columns come back suffixed (key/ts included, so the
    match's timestamp is visible as ``<right_ts><suffix>``).
    """
    rts = right_ts or ts
    rcols = [c for c in right.columns if c != on]
    r = right.select(
        F.col(on).alias(on),
        F.col(rts).alias("_asof_ts"),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in rcols]).alias(_PAYLOAD),
    )
    l = left.select(
        "*",
        F.col(ts).alias("_asof_ts"),
        F.lit(1).alias(_SIDE),
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    # strict (<): left sorts BEFORE right at equal ts, so a same-instant
    # right row is not yet visible to last() when the left row is scored.
    order_side = F.col(_SIDE).desc() if strict else F.col(_SIDE).asc()
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_asof_ts").asc(), order_side)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = merged.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    ).where(F.col(_SIDE) == 1)
    if tolerance is not None:
        matched = matched.withColumn(
            _PAYLOAD,
            F.when(
                F.col(f"{_PAYLOAD}.{rts}")
                >= F.col("_asof_ts") - tolerance,
                F.col(_PAYLOAD),
            ),
        )
    out = matched.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"{_PAYLOAD}.{c}").alias(f"{c}{suffix}") for c in rcols],
    )
    return out

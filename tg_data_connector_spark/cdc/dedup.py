"""Last-writer-wins dedup: reduce a change batch to ONE row per key.

The reference has no aggregation operator at all (SURVEY §2.7); its upsert relies
on the destination DB resolving duplicate keys row-by-row in arrival order
(``WriterUtil.java:148-168``). For a deterministic, retry-safe MERGE the batch
must be reduced to the single newest event per key *before* the join — Iceberg's
MERGE has the same one-source-row-per-key cardinality rule.

Two physical strategies, same semantics:

  * ``lww_dedup``       — single ``groupBy(key).agg(max_by(payload, version))``:
    one shuffle, map-side partial aggregation for free (Spark plans
    ``partial_max_by -> exchange -> final_max_by``).
  * ``lww_dedup_salted``— explicit two-phase for pathologically hot keys: first
    ``groupBy(key, salt)`` (salt = hash of the version pair, so a hot key's
    events spread over S reducers), then ``groupBy(key)`` over the S partials.
    This is the north rule's "explicit salting of hot sources".

Which to use (measured, see BENCH notes in BASELINE.md): the PLAIN version is
the default. ``max_by`` is an algebraic aggregate, so Spark always plans
``partial_max_by -> exchange -> final_max_by``: a key receiving millions of
updates collapses to ONE partial row per map task before the shuffle — the
reducer for a hot key sees at most |map tasks| rows, not |events|. Salting on
top of that *multiplies group count by S* (with many distinct keys the phase-1
aggregation stops reducing at all: measured 2.59M events -> 2.09M "partials" at
525k keys x 16 salts) and adds a second full shuffle. Salting pays off only
when the per-map-task partial state itself can't absorb the hot key — i.e.
collect-type aggregates, not max_by. The salted path is kept for that shape
and for skew injected upstream of any aggregation (e.g. a hot `source` feeding
a non-algebraic kernel).

``max_by(struct(everything), struct(commit_lsn, seq_no))`` gives lexicographic
LWW. Exact duplicate deliveries (same version pair) collapse to one row by
construction — max_by of equal versions returns one of identical payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VERSION_COLS = ("commit_lsn", "seq_no")


def lww_dedup_arrow(
    df: DataFrame, key: str = "doc_id", num_partitions: int | None = None
) -> DataFrame:
    """One explicit hash(key) shuffle + one Arrow-vectorized kernel pass.

    Why this exists when ``lww_dedup`` already expresses the same thing: the
    ``max_by(struct(payload...), struct(lsn, seq))`` aggregation buffer holds
    var-width values (binary payload / token array), which disqualifies the
    codegen'd HashAggregate — Spark falls back to **SortAggregate**, i.e. a
    full sort of the payload-carrying batch on BOTH sides of the exchange
    (measured: 448 CPU-s vs 65 for the scan at 5M events/batch). This variant
    shuffles once on hash(key) — the north rule's explicit partitioning — and
    replaces the sort-based aggregation with a per-partition vectorized kernel:
    an int64 lexsort on the (commit_lsn, seq_no) columns (never the payload)
    followed by a hash ``drop_duplicates(keep='last')``. O(n log n) on two
    int columns instead of O(n log n) struct comparisons over full rows.

    Partition = whole pandas frame in executor memory: size
    ``spark.sql.shuffle.partitions`` so batch_rows/partitions fits (the same
    rule the reference applies to its channel memory,
    ``core/.../channel/memory/MemoryChannel.java:22-146``).

    Ties (duplicate deliveries with equal (lsn, seq)) keep one arbitrary row
    of identical payloads — same contract as max_by.

    ``num_partitions``: pass the target table's bucket count to make the
    output partitioning IDENTICAL to the lake bucket layout (bucket_expr ==
    HashPartitioning — ``lake/table.py``): the downstream MERGE join and the
    per-bucket file write then reuse this one shuffle.
    """
    schema = df.schema
    vcols = [c for c in VERSION_COLS]

    def reduce_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            tuple(pdf[c].to_numpy(dtype=np.int64) for c in reversed(vcols))
        )
        return pdf.iloc[order].drop_duplicates(subset=[key], keep="last")

    # Streaming reduce: each Arrow chunk is reduced to its per-key winners on
    # arrival and only winners accumulate, compacted whenever they exceed a
    # bound. Peak memory is therefore ~max(|distinct keys in partition|,
    # COMPACT_ROWS) + one chunk — NOT the whole shuffle partition (which grows
    # as events_per_batch / n_buckets and would otherwise cap batch sizing).
    # LWW is associative (max over the version pair per key), so chunked
    # reduction is exact.
    COMPACT_ROWS = 2_000_000

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        winners: list[pd.DataFrame] = []
        total = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            w = reduce_chunk(pdf)
            winners.append(w)
            total += len(w)
            if total > COMPACT_ROWS and len(winners) > 1:
                merged = reduce_chunk(pd.concat(winners, ignore_index=True))
                winners, total = [merged], len(merged)
        if not winners:
            return
        out = (
            reduce_chunk(pd.concat(winners, ignore_index=True))
            if len(winners) > 1
            else winners[0]
        )
        yield out

    parted = (
        df.repartition(num_partitions, F.col(key))
        if num_partitions
        else df.repartition(F.col(key))
    )
    return parted.mapInPandas(kernel, schema)


def _payload_struct(df: DataFrame, key: str):
    rest = [c for c in df.columns if c != key]
    return F.struct(*[F.col(c) for c in rest]), rest


def lww_dedup(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """One shuffle: groupBy(key) + max_by over the (commit_lsn, seq_no) order."""
    payload, rest = _payload_struct(df, key)
    version = F.struct(*[F.col(c) for c in VERSION_COLS])
    agg = df.groupBy(key).agg(F.max_by(payload, version).alias("_w"))
    return agg.select(key, *[F.col(f"_w.{c}").alias(c) for c in rest])


def lww_dedup_salted(
    df: DataFrame, key: str = "doc_id", salt_buckets: int = 16
) -> DataFrame:
    """Two-phase: (key, salt) partial max -> key final max. The salt derives from
    the version pair, not a RNG, so the plan is deterministic and retry-safe."""
    payload, rest = _payload_struct(df, key)
    version = F.struct(*[F.col(c) for c in VERSION_COLS])
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col("commit_lsn"), F.col("seq_no")), F.lit(salt_buckets)),
    )
    partial = salted.groupBy(key, "_salt").agg(F.max_by(payload, version).alias("_w"))
    final = partial.groupBy(key).agg(
        F.max_by(
            F.col("_w"), F.struct(*[F.col(f"_w.{c}") for c in VERSION_COLS])
        ).alias("_w")
    )
    return final.select(key, *[F.col(f"_w.{c}").alias(c) for c in rest])

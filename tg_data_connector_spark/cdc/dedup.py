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
    This is the north rule's "explicit salting of hot sources"; with AQE skew
    handling the plain version is usually enough, but at 10^10 events a single
    doc_id receiving millions of updates would otherwise pin one reducer.

``max_by(struct(everything), struct(commit_lsn, seq_no))`` gives lexicographic
LWW. Exact duplicate deliveries (same version pair) collapse to one row by
construction — max_by of equal versions returns one of identical payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VERSION_COLS = ("commit_lsn", "seq_no")


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

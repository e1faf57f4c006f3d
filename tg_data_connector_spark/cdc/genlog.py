"""Deterministic synthetic change-log + seed-table generator.

The reference's deterministic generator is the upstream ``streamreader`` plugin
(documented in ``tigergraphwriter/doc/tigergraphwriter.md:9-47``: const typed
columns x ``sliceRecordCount``). Here the generator is a pure column-expression
pipeline over ``spark.range(n)`` — no Python in the loop, no RNG state — so it
scales to 10^10 events by changing one integer, generates in parallel on every
executor, and the same closed-form row formula can be evaluated by an external
oracle (DuckDB) for the correctness gate.

Event mix (by design, mirrors FIXTURES.md F2):
  * ~30% inserts, ~50% updates, ~10% deletes, plus re-inserts after delete;
  * keys collide heavily (n_docs << n_events) to exercise LWW;
  * delivery order is a permutation of commit order (out-of-order tail);
  * every 20th event is duplicated (at-least-once delivery);
  * every 97th event is malformed (n_tok != size(tokens)) -> quarantine;
  * one hot source carries >50% of events (skew -> salting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOT_SOURCE = "src_hot"


def _mix(col):
    """Cheap integer bit-mix (splitmix-style, arithmetic-only so the identical
    formula runs in an external SQL oracle)."""
    return F.pmod(col * F.lit(2654435761), F.lit(2**31 - 1))


def gen_changelog(
    spark: SparkSession,
    n_events: int,
    n_docs: int,
    n_parts: int = 8,
    seed: int = 42,
    with_schema_change: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """Changelog with FIXTURES.md F2 shape:
    (op, commit_lsn, seq_no, doc_id, tokens, n_tok, source, part, offset[,
    schema_change, payload]).

    ``offset`` is the per-part monotone position (the per-partition
    high-watermark unit); ``commit_lsn`` is a permutation of event order so the
    log arrives out of (commit_lsn, seq_no) order within and across parts.
    """
    rng = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    s = F.lit(seed)

    part = F.pmod(i, F.lit(n_parts)).cast("int")
    offset = (i / F.lit(n_parts)).cast("bigint")
    # permuted commit order: lsn = mix(i + seed); unique since we mod by a prime
    # > n_events is NOT guaranteed -> make it unique by composing with id
    commit_lsn = (_mix(i + s) * F.lit(4) + F.pmod(i, F.lit(4))).cast("bigint")
    seq_no = F.pmod(i * F.lit(13) + s, F.lit(7)).cast("bigint")
    doc_key = F.pmod(_mix(i * F.lit(31) + s + F.lit(7)), F.lit(n_docs))
    doc_id = F.concat(F.lit("d"), F.lpad(doc_key.cast("string"), 8, "0"))
    opx = F.pmod(i * F.lit(17) + F.lit(3), F.lit(100))
    op = (
        F.when(opx < F.lit(10), F.lit("D"))
        .when(opx < F.lit(40), F.lit("I"))
        .otherwise(F.lit("U"))
    )
    srcx = F.pmod(i * F.lit(7919) + s, F.lit(100))
    source = F.when(srcx < F.lit(55), F.lit(HOT_SOURCE)).otherwise(
        F.concat(F.lit("src_"), F.pmod(srcx, F.lit(10)).cast("string"))
    )
    n = (F.lit(1) + F.pmod(i * F.lit(31) + s, F.lit(64))).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(0), n - F.lit(1)),
        lambda k: F.pmod(i * F.lit(1009) + k * F.lit(7) + s, F.lit(50000)).cast("int"),
    )
    malformed = F.pmod(i, F.lit(97)) == F.lit(96)
    n_tok = F.when(malformed, n + F.lit(1)).otherwise(n)  # violates size invariant

    df = rng.select(
        i.alias("event_id"),
        op.alias("op"),
        commit_lsn.alias("commit_lsn"),
        seq_no.alias("seq_no"),
        F.when(op == "D", doc_id).otherwise(doc_id).alias("doc_id"),
        F.when(op == "D", F.lit(None)).otherwise(tokens).alias("tokens"),
        F.when(op == "D", F.lit(None)).otherwise(n_tok).cast("int").alias("n_tok"),
        source.alias("source"),
        part.alias("part"),
        offset.alias("offset"),
    )
    if with_schema_change:
        df = df.withColumn(
            "schema_change",
            F.when(
                F.col("event_id") == F.lit(n_events // 2),
                F.lit('{"add_column": {"name": "lang", "type": "string"}}'),
            ).otherwise(F.lit(None).cast("string")),
        ).withColumn(
            "op",
            F.when(F.col("event_id") == F.lit(n_events // 2), F.lit("S")).otherwise(
                F.col("op")
            ),
        )
    # at-least-once: duplicate every 20th event (same (commit_lsn, seq_no, doc_id))
    dups = df.where(F.pmod(F.col("event_id"), F.lit(20)) == F.lit(5))
    return df.unionByName(dups)


def with_binary_payload(df: DataFrame) -> DataFrame:
    """Pack tokens into a binary cell (big-endian int32s) — the raw binlog-payload
    form consumed by the vectorized parser in ``parse.py``. Built with JVM-side
    expressions (hex render + unhex) so generation stays off the Python path."""
    return df.withColumn(
        "payload",
        F.when(
            F.col("tokens").isNotNull(),
            F.unhex(
                F.array_join(
                    F.transform(F.col("tokens"), lambda t: F.lpad(F.hex(t), 8, "0")),
                    "",
                )
            ),
        ).otherwise(F.lit(None).cast("binary")),
    )


def gen_seed_sequences(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Seed target table: one row per doc_id in FIXTURES.md F1 shape."""
    rng = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    s = F.lit(seed)
    n = (F.lit(1) + F.pmod(i * F.lit(11) + s, F.lit(32))).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(0), n - F.lit(1)),
        lambda k: F.pmod(i * F.lit(101) + k * F.lit(3) + s, F.lit(50000)).cast("int"),
    )
    srcx = F.pmod(i * F.lit(7919) + s, F.lit(100))
    source = F.when(srcx < F.lit(55), F.lit(HOT_SOURCE)).otherwise(
        F.concat(F.lit("src_"), F.pmod(srcx, F.lit(10)).cast("string"))
    )
    return rng.select(
        F.concat(F.lit("d"), F.lpad(i.cast("string"), 8, "0")).alias("doc_id"),
        tokens.alias("tokens"),
        n.alias("n_tok"),
        source.alias("source"),
    )

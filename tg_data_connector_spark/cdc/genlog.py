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

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOT_SOURCE = "src_hot"


def _n_dups(n_events: int) -> int:
    """Count of duplicated deliveries = |{i < n_events : i % 20 == 5}|.
    (The naive n_events // 20 undercounts by one whenever n_events % 20 >= 6,
    drifting the documented 'every 20th event is re-sent' invariant.)"""
    return (n_events - 6) // 20 + 1 if n_events > 5 else 0


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
    # at-least-once delivery: every 20th event (id = 5 mod 20) is re-sent.
    # The duplicate rows are folded into ONE range pass — ids beyond n_events
    # map back onto the duplicated event ids arithmetically — instead of a
    # union(df, df.where(...)) whose two branches would each run the full
    # (expensive) token-materializing generator plan.
    n_dups = _n_dups(n_events)
    rng = spark.range(
        0, n_events + n_dups, 1, partitions or spark.sparkContext.defaultParallelism
    )
    i = F.when(
        F.col("id") < n_events, F.col("id")
    ).otherwise(F.lit(5) + (F.col("id") - F.lit(n_events)) * F.lit(20))
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
    return df


def with_binary_payload(df: DataFrame) -> DataFrame:
    """Pack tokens into a binary cell (big-endian int32s) — the raw binlog-payload
    form consumed by the vectorized parser in ``parse.py``. The exact buffer-level
    inverse of ``parse.decode_payload_array``: the list offsets become byte
    offsets (x4) and the int32 values byteswap into the binary data buffer —
    one copy per Arrow batch, no per-row work. (A pure-expression hex-render
    variant measured ~20x slower at 40M events; generation feeds benchmarks, so
    it matters.)"""
    import numpy as np
    import pyarrow as pa

    in_fields = df.schema.fields
    names = [f.name for f in in_fields]
    idx = names.index("tokens")
    out_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in in_fields
    ) + ", payload binary"

    def pack(batches):
        for rb in batches:
            arr = rb.column(idx)
            n = len(arr)
            if n == 0:
                continue
            if arr.offset != 0:
                arr = pa.concat_arrays([arr.slice(0, n)])
            validity, off_buf, *_ = arr.buffers()
            offsets = np.frombuffer(off_buf, dtype=np.int32, count=n + 1)
            vals = arr.values.to_numpy(zero_copy_only=False).astype(">i4")
            byte_offsets = (offsets * 4).astype(np.int32)
            payload = pa.Array.from_buffers(
                pa.binary(),
                n,
                [validity, pa.py_buffer(byte_offsets.tobytes()),
                 pa.py_buffer(vals.tobytes())],
                null_count=arr.null_count,
            )
            yield pa.RecordBatch.from_arrays(
                list(rb.columns) + [payload], names + ["payload"]
            )

    return df.mapInArrow(pack, out_ddl)


def gen_changelog_payload_fast(
    spark: SparkSession,
    n_events: int,
    n_docs: int,
    n_parts: int = 8,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Numpy twin of ``with_binary_payload(gen_changelog(...)).drop("tokens")``:
    the identical closed-form row formulas evaluated vectorized over Arrow
    batches, emitting the packed binary payload directly (no token-array
    materialization, no per-token Column expressions). Formula-parity with the
    expression path is pinned by ``tests/test_genlog_parse.py``.

    Exists because staging 10^8-event benchmark inputs through the
    per-token expression pipeline measured ~20x slower than this kernel —
    and a 10^10-scale replay harness regenerates logs constantly.
    """
    import pyarrow as pa

    n_dups = _n_dups(n_events)
    rng = spark.range(
        0, n_events + n_dups, 1, partitions or spark.sparkContext.defaultParallelism
    )
    out_ddl = (
        "event_id bigint, op string, commit_lsn bigint, seq_no bigint,"
        " doc_id string, n_tok int, source string, part int, offset bigint,"
        " payload binary"
    )
    M31 = 2**31 - 1

    def kernel(batches):
        for rb in batches:
            raw = rb.column(0).to_numpy()
            if len(raw) == 0:
                continue
            i = np.where(raw < n_events, raw, 5 + (raw - n_events) * 20)
            part = (i % n_parts).astype(np.int32)
            offset = i // n_parts
            commit_lsn = ((i + seed) * 2654435761 % M31) * 4 + i % 4
            seq_no = (i * 13 + seed) % 7
            doc_key = (i * 31 + seed + 7) * 2654435761 % M31 % n_docs
            opx = (i * 17 + 3) % 100
            op = np.where(opx < 10, "D", np.where(opx < 40, "I", "U"))
            srcx = (i * 7919 + seed) % 100
            source = np.where(
                srcx < 55,
                HOT_SOURCE,
                np.char.add("src_", (srcx % 10).astype("U1")),
            )
            n = (1 + (i * 31 + seed) % 64).astype(np.int64)
            is_d = opx < 10
            malformed = i % 97 == 96
            n_tok = np.where(malformed, n + 1, n).astype(np.int32)
            # payload: concat of per-event big-endian int32 token streams
            n_eff = np.where(is_d, 0, n)
            offs = np.zeros(len(i) + 1, dtype=np.int64)
            np.cumsum(n_eff, out=offs[1:])
            ids_rep = np.repeat(i, n_eff)
            k = np.arange(len(ids_rep), dtype=np.int64) - np.repeat(
                offs[:-1], n_eff
            )
            vals = ((ids_rep * 1009 + k * 7 + seed) % 50000).astype(">i4")
            payload = pa.Array.from_buffers(
                pa.binary(),
                len(i),
                [
                    pa.py_buffer(np.packbits(~is_d, bitorder="little").tobytes()),
                    pa.py_buffer((offs * 4).astype(np.int32).tobytes()),
                    pa.py_buffer(vals.tobytes()),
                ],
                null_count=int(is_d.sum()),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(i),
                    pa.array(op),
                    pa.array(commit_lsn),
                    pa.array(seq_no),
                    pa.array(
                        np.char.add("d", np.char.zfill(doc_key.astype("U8"), 8))
                    ),
                    pa.array(n_tok, type=pa.int32(), mask=is_d),  # D -> null
                    pa.array(source),
                    pa.array(part, type=pa.int32()),
                    pa.array(offset),
                    payload,
                ],
                [
                    "event_id", "op", "commit_lsn", "seq_no", "doc_id",
                    "n_tok", "source", "part", "offset", "payload",
                ],
            )

    return rng.mapInArrow(kernel, out_ddl)


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

"""File/object-store sources: the gcsreader + unstructured-storage surface.

The reference streams CSV objects one record at a time through
``GcsReader.java:265-315`` and casts cells per a column-entry spec
(``UnstructuredStorageReaderUtil.java:398-470``; entry shape ``ColumnEntry.java``:
{index | value(const), type in {STRING,LONG,BOOLEAN,DOUBLE,DATE}, format}),
with failed casts routed to the dirty collector (``:476-488``) and no-spec reads
emitting all-string records (``:350-360``).

Spark-first: object listing, decompression (gzip/bzip2/...,
``UnstructuredStorageReaderUtil.java:117-213``) and file-level parallelism (one
input split per object — the reference round-robins objects over tasks,
``GcsReader.java:118-149``) are all built into ``spark.read.csv``. What we add is
the reference's *column-entry algebra*: per-index projection, typed casts with
per-column date formats, const columns, and cast-failure quarantine — expressed
as Column ops so every cast is codegen'd and the text scan prunes columns.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TYPES = {"string", "long", "boolean", "double", "date"}


@dataclass
class ColumnEntry:
    """One output column: either a 0-based source index or a constant value.
    Mirrors ``ColumnEntry.java:1-63`` (index/value/type/format)."""

    type: str = "string"
    index: int | None = None
    value: str | None = None
    format: str | None = None  # for date
    name: str | None = None

    def __post_init__(self):
        if self.type not in _TYPES:
            raise ValueError(f"bad type {self.type!r}")
        if (self.index is None) == (self.value is None):
            raise ValueError("exactly one of index/value required")


def _cast(col, entry: ColumnEntry):
    t = entry.type
    # try_cast, not cast: Spark 4 runs ANSI mode by default, where a failed cast
    # is an error; the reference's contract is failed-cast -> dirty record, so
    # the cast must yield null and the caller quarantines the row.
    if t == "string":
        return col
    if t == "long":
        return col.try_cast("bigint")
    if t == "double":
        return col.try_cast("double")
    if t == "boolean":
        # reference: only 'true'/'false' ignoring case (StringColumn.java:124-140)
        low = F.lower(col)
        return F.when(low == "true", F.lit(True)).when(low == "false", F.lit(False))
    if t == "date":
        fmt = entry.format or "yyyy-MM-dd HH:mm:ss"
        return F.try_to_timestamp(col, F.lit(fmt))
    raise AssertionError(t)


def read_typed_csv(
    spark: SparkSession,
    path: str,
    entries: list[ColumnEntry] | None,
    header: bool = False,
    sep: str = ",",
    encoding: str = "utf-8",
    null_format: str | None = None,
    skip_lines: int = 0,
    compression: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (clean, dirty): typed rows and rows where any non-const cast
    failed on a non-null cell (the reference's per-record convert-error ->
    dirty-record policy). With ``entries=None`` all columns pass through as
    strings (``UnstructuredStorageReaderUtil.java:350-360``)."""
    reader = (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("encoding", encoding)
        .option("mode", "PERMISSIVE")
    )
    if null_format is not None:
        reader = reader.option("nullValue", null_format)
    if skip_lines and not header:
        # header-skip generalization; the reference's skipHeader skips one line
        reader = reader.option("skipRows", skip_lines)
    df = reader.csv(path)
    if entries is None:
        return df, df.limit(0)

    raw_cols = df.columns
    out, bad_preds = [], []
    for i, e in enumerate(entries):
        name = e.name or f"c{i}"
        if e.value is not None:
            out.append(_cast(F.lit(e.value), e).alias(name))  # const column (F.lit)
            continue
        src_name = raw_cols[e.index] if header else f"_c{e.index}"
        src = F.col(src_name)
        casted = _cast(src, e)
        out.append(casted.alias(name))
        if e.type != "string":
            bad_preds.append(src.isNotNull() & casted.isNull())
    typed = df.select(*out, *[p.alias(f"_bad{i}") for i, p in enumerate(bad_preds)])
    if not bad_preds:
        return typed, typed.limit(0)
    any_bad = F.greatest(*[F.col(f"_bad{i}") for i in range(len(bad_preds))]) if len(
        bad_preds
    ) > 1 else F.col("_bad0")
    bad_cols = [f"_bad{i}" for i in range(len(bad_preds))]
    clean = typed.where(~F.coalesce(any_bad, F.lit(False))).drop(*bad_cols)
    dirty = typed.where(F.coalesce(any_bad, F.lit(False))).drop(*bad_cols)
    return clean, dirty

"""Z-order (Morton-curve) clustering values for multi-column data skipping.

Lexicographic range clustering (``maintain.compact(cluster_by=[a, b])``)
gives the LEADING column tight per-file ranges but leaves every trailing
column full-range inside each leading slice — filter on ``b`` alone and
nothing prunes. Interleaving the columns' rank bits on one space-filling
curve (Delta OPTIMIZE ZORDER BY / Iceberg rewrite with a z-sort-order)
spends the file budget evenly: a k-column z-layout with F files per bucket
gives EACH column ~F^(1/k) distinguishable slices, so a single-column
filter on ANY z column still skips ~(1 - F^(-1/k)) of the files.

Shape (all whole-stage-codegen expressions, no Python workers):
  1. per column, an order-preserving DOUBLE proxy (numerics cast; strings
     rank by their first 8 bytes big-endian — the prefix defines the same
     order parquet min/max stats compare by; date/timestamp/bool cast);
  2. ONE ``approxQuantile`` pass computes 2^bits - 1 equi-depth cut points
     per column (bounded driver metadata: k * 2^bits doubles — the same
     sampling Delta's range-id pass does);
  3. per row, the rank in [0, 2^bits) counts cuts <= value with a single
     ``F.aggregate`` over the literal cuts array — one fused comparison
     per cut, evaluated once per row per column. Each rank materializes as
     its OWN projection column before the interleave references it:
     the interleave reads bits of an AttributeReference, never a copy of
     the rank subtree. (A binary-search formulation is asymptotically
     cheaper per row but its self-referential ``when`` nesting grows the
     expression tree as 3^bits — Catalyst analysis alone took minutes at
     bits=8. O(2^bits) fused comparisons on the maintenance path is noise
     next to the rewrite's shuffle+write.)
  4. ranks interleave bit-by-bit into one BIGINT z-value (bit j of column i
     lands at position j*k + i), which the caller range-partitions on.

NULLs rank 0 (nulls-first, matching range partitioning); a constant or
all-null column yields one rank for every row and the curve degrades
gracefully to the remaining columns. bits * n_cols must fit in 63.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampType,
)

_NUMERIC = (
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    DecimalType,
)


def _order_proxy(col: str, dtype) -> Column:
    """An order-preserving double proxy for quantile cuts + rank compares.

    Strings map to their first 8 bytes read big-endian (rpad-ed hex so short
    strings align left, exactly how a left-to-right byte compare orders
    them); ties beyond 8 bytes collapse into one rank — acceptable, ranks
    only need to APPROXIMATE the order for locality, and file-level min/max
    stay exact because they come from the real column."""
    c = F.col(col)
    if isinstance(dtype, _NUMERIC + (BooleanType,)):
        return c.cast("double")
    if isinstance(dtype, (DateType, TimestampType)):
        return c.cast("timestamp").cast("double")
    if isinstance(dtype, StringType):
        # first 8 bytes, big-endian, as an unsigned value: hex -> pad to 16
        # nibbles -> base-16 conv (unsigned 64-bit domain) -> decimal ->
        # double. conv returns the unsigned decimal STRING, so the full
        # 2^64 range survives until the final (lossy-but-monotone) cast.
        h = F.rpad(F.hex(F.substring(c.cast("binary"), 1, 8)), 16, "0")
        return F.conv(h, 16, 10).cast("decimal(20,0)").cast("double")
    raise ValueError(f"zorder: unsupported column type for {col!r}: {dtype}")


def _rank_expr(proxy: Column, cuts: list[float]) -> Column:
    """Equi-depth rank in [0, len(cuts)]: count of cuts <= value, one
    aggregate over the literal cuts array. NULL proxy -> rank 0."""
    if not cuts:  # all-null / empty input: one rank for everyone
        return F.lit(0)
    arr = F.array(*[F.lit(float(v)) for v in cuts])
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, c: acc + F.when(proxy >= c, 1).otherwise(0),
    )


def with_zvalue(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    out: str = "_z",
    relative_error: float | None = None,
) -> DataFrame:
    """Return ``df`` with an interleaved BIGINT z-value column ``out``.

    Runs ONE ``approxQuantile`` job over the proxy projection to fix the
    cut points (equi-depth, so skewed columns still spread across ranks).
    Cost: one extra pass over the input at maintenance time — the same
    sampling pass ``repartitionByRange`` itself would run."""
    if not cols:
        raise ValueError("zorder: need at least one column")
    if bits * len(cols) > 63:
        raise ValueError(
            f"zorder: bits*cols = {bits * len(cols)} exceeds 63 "
            f"(lower bits or fewer columns)"
        )
    schema = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in schema]
    if missing:
        raise ValueError(f"zorder: columns not in frame: {missing}")
    proxies = {c: _order_proxy(c, schema[c]) for c in cols}
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    err = relative_error if relative_error is not None else 1.0 / (1 << (bits + 2))
    proj = df.select(*[p.alias(f"_zp{i}") for i, p in enumerate(proxies.values())])
    all_cuts = proj.approxQuantile(
        [f"_zp{i}" for i in range(len(cols))], probs, err
    )
    k = len(cols)
    rank_names = [f"__zr_{i}" for i in range(k)]
    with_ranks = df
    for i, c in enumerate(cols):
        with_ranks = with_ranks.withColumn(
            rank_names[i], _rank_expr(proxies[c], all_cuts[i]).cast("long")
        )
    z: Column = F.lit(0).cast("long")
    for i, rname in enumerate(rank_names):
        # bits of an AttributeReference — the rank subtree is materialized
        # once in its own projection, never copied per bit
        r = F.col(rname)
        for j in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(r, j).bitwiseAND(F.lit(1)), j * k + i
                )
            )
    return with_ranks.withColumn(out, z).drop(*rank_names)


def interleave_ranks(ranks: list[int], bits: int) -> int:
    """Pure-Python mirror of the bit interleave (test oracle)."""
    z = 0
    k = len(ranks)
    for i, r in enumerate(ranks):
        for j in range(bits):
            z |= ((r >> j) & 1) << (j * k + i)
    return z

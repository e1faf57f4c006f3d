"""Partitioned-scan planning: the reference's splitPk machinery, Spark-first.

The reference plans JDBC parallelism by querying ``SELECT MIN(pk), MAX(pk)`` and
cutting equal-width BigInteger ranges (``SingleTableSplitUtil.java:33-124``,
math in ``RangeSplitUtil.java:43-93``), adding one extra slice for ``pk IS
NULL`` (``:109-121``), splitting string PKs in a radix-128 ASCII space
(``RangeSplitUtil.java:105-128``), and — for Oracle — sampling quantile points
instead (equi-depth, ``SingleTableSplitUtil.java:294-389``).

Spark's ``DataFrameReader.jdbc`` has the numeric case built in
(column/lowerBound/upperBound/numPartitions). What Spark lacks and we provide:
  * the NULL slice + closed-form predicate list (for the ``predicates=[...]``
    overload) matching the reference's WHERE shapes;
  * equi-depth split points from ``approxQuantile`` over any keyed DataFrame —
    the Spark-native version of Oracle SAMPLE(): same Monte-Carlo idea, but
    distributed and source-agnostic;
  * these run against any keyed DataFrame (parquet stands in for JDBC in tests;
    with a real driver on the classpath the same predicates feed
    ``spark.read.jdbc(url, table, predicates=...)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def range_split_predicates(
    min_v: int, max_v: int, n: int, pk: str, include_null_slice: bool = True
) -> list[str]:
    """Equal-width ranges over [min_v, max_v], left-closed/right-open except the
    last (closed) — the reference emits `pk >= lo AND pk < hi` slices with a
    final closed slice and a dedicated NULL slice."""
    if max_v < min_v:
        preds = []
    elif n <= 1 or max_v == min_v:
        preds = [f"{pk} >= {min_v} AND {pk} <= {max_v}"]
    else:
        width = (max_v - min_v) // n
        cuts = [min_v + i * width for i in range(n)] + [max_v]
        preds = []
        for i in range(n):
            lo, hi = cuts[i], cuts[i + 1]
            if i == n - 1:
                preds.append(f"{pk} >= {lo} AND {pk} <= {hi}")
            else:
                preds.append(f"{pk} >= {lo} AND {pk} < {hi}")
    if include_null_slice:
        preds.append(f"{pk} IS NULL")
    return preds


def _str_to_radix_int(s: str, length: int, radix: int = 128) -> int:
    """String -> integer in radix-`radix` positional space, right-padded with
    zero digits to `length` (the reference's stringToBigInteger,
    ``RangeSplitUtil.java:105-128``: each char is one base-128 digit)."""
    v = 0
    for i in range(length):
        d = ord(s[i]) if i < len(s) else 0
        if d >= radix:
            raise ValueError(
                f"character {s[i]!r} (U+{d:04X}) outside radix-{radix} space"
            )
        v = v * radix + d
    return v


def _radix_int_to_str(v: int, length: int, radix: int = 128) -> str:
    digits = []
    for _ in range(length):
        digits.append(v % radix)
        v //= radix
    return "".join(chr(d) for d in reversed(digits)).rstrip("\x00")


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def string_range_split_predicates(
    min_s: str,
    max_s: str,
    n: int,
    pk: str,
    include_null_slice: bool = True,
    radix: int = 128,
) -> list[str]:
    """Equal-width split of a STRING primary key in radix-128 ASCII space —
    the reference's string-PK path (``RangeSplitUtil.java:14-30,105-128``):
    both bounds map to base-128 integers over a common digit length, the
    integer range splits equal-width, and the cut points map back to strings.

    Caveat (shared with the reference): the split points order by BYTE value;
    a database collation that orders differently can route rows into a
    neighboring slice. The slices still cover the whole domain (first/last
    slices are open toward the bounds), so rows are never lost — coverage is
    what the disjointness test pins.
    """
    length = max(len(min_s), len(max_s), 1)
    lo, hi = _str_to_radix_int(min_s, length, radix), _str_to_radix_int(
        max_s, length, radix
    )
    if hi < lo:
        lo, hi = hi, lo
        min_s, max_s = max_s, min_s
    if n <= 1 or hi == lo:
        preds = [f"{pk} >= {_sql_str(min_s)} AND {pk} <= {_sql_str(max_s)}"]
    else:
        width = (hi - lo) // n
        cuts_i = [lo + i * width for i in range(1, n)]
        # A cut integer can carry zero digits MID-string -> embedded NUL
        # bytes, which SQL string literals cannot hold (and real DBs reject).
        # Bumping NUL to \x01 moves a cut slightly UP; the strictly-increasing
        # filter below then drops any cut the bump leapfrogged — slice
        # boundaries only balance sizes, so adjusting them never breaks the
        # disjoint-cover contract (pinned by the hypothesis property test).
        cuts = [
            _radix_int_to_str(c, length, radix).replace("\x00", "\x01")
            for c in cuts_i
        ]
        # dedupe degenerate/reordered cuts (narrow ranges, NUL bumps)
        uniq = []
        for c in cuts:
            if c > min_s and c < max_s and (not uniq or c > uniq[-1]):
                uniq.append(c)
        bounds = [min_s] + uniq + [max_s]
        preds = []
        for i in range(len(bounds) - 1):
            lo_s, hi_s = _sql_str(bounds[i]), _sql_str(bounds[i + 1])
            if i == len(bounds) - 2:
                preds.append(f"{pk} >= {lo_s} AND {pk} <= {hi_s}")
            else:
                preds.append(f"{pk} >= {lo_s} AND {pk} < {hi_s}")
    if include_null_slice:
        preds.append(f"{pk} IS NULL")
    return preds


def quantile_split_predicates(
    df: DataFrame, pk: str, n: int, error: float = 0.001, include_null_slice: bool = True
) -> list[str]:
    """Equi-depth split points via approxQuantile (Greenwald-Khanna sketch, one
    pass, distributed) — the Spark-native stand-in for Oracle
    ``SAMPLE(0.1%) ORDER BY DBMS_RANDOM.VALUE``."""
    probs = [i / n for i in range(1, n)]
    qs = df.stat.approxQuantile(pk, probs, error) if n > 1 else []
    cuts = sorted(set(int(q) for q in qs))
    preds = []
    lo = None
    for c in cuts:
        if lo is None:
            preds.append(f"{pk} < {c}")
        else:
            preds.append(f"{pk} >= {lo} AND {pk} < {c}")
        lo = c
    preds.append(f"{pk} >= {lo}" if lo is not None else f"{pk} IS NOT NULL")
    if include_null_slice:
        preds.append(f"{pk} IS NULL")
    return preds


def hinted_select(
    table: str,
    columns: list[str] | None = None,
    hint: str | None = None,
    where: str | None = None,
) -> str:
    """Render the per-table SELECT the JDBC scan pushes down, with the
    reference's optimizer-hint injection (``HintUtil.java:27-66``): ``hint``
    is ``"tablePattern#hintExpression"`` (pattern optional — a bare expression
    applies to every table); when the pattern matches, the expression — with
    ``@table`` replaced by the unqualified table name — is spliced between
    SELECT and the column list, e.g. ``/*+ parallel(4) */``. A non-matching
    pattern or a malformed hint leaves the query untouched, as the reference
    does (it warns and proceeds)."""
    import re

    cols = ", ".join(columns) if columns else "*"
    prefix = ""
    if hint:
        pattern, _, expr = hint.rpartition("#")
        pattern = pattern or ".*"
        try:
            if re.search(pattern, table):
                unqualified = table.rsplit(".", 1)[-1]
                prefix = expr.replace("@table", unqualified).strip() + " "
        except re.error:
            prefix = ""
    q = f"SELECT {prefix}{cols} FROM {table}"
    if where:
        q += f" WHERE {where}"
    return q


def read_jdbc_split(
    spark: SparkSession,
    url: str,
    table: str,
    pk: str,
    num_partitions: int,
    properties: dict | None = None,
    lower: int | None = None,
    upper: int | None = None,
    columns: list[str] | None = None,
    hint: str | None = None,
    where: str | None = None,
) -> DataFrame:
    """Partitioned JDBC read (requires a JDBC driver jar on the classpath).
    When bounds are not given, they are fetched with a MIN/MAX pushdown query —
    exactly the reference's ``genPKSql`` (``SingleTableSplitUtil.java:279-289``).
    ``columns``/``hint``/``where`` push projection, optimizer hints and the
    static predicate into the source query (``SingleTableSplitUtil.java:
    126-149`` builds the same querySql per slice)."""
    props = properties or {}
    if lower is None or upper is None:
        bounds = spark.read.jdbc(
            url,
            f"(SELECT MIN({pk}) AS lo, MAX({pk}) AS hi FROM {table}) b",
            properties=props,
        ).collect()[0]
        # positional: identifier case of unquoted aliases is dialect-defined
        # (Derby/Oracle fold to upper, MySQL preserves) — found live vs Derby
        lower, upper = bounds[0], bounds[1]
    if isinstance(lower, str):
        # string primary key (UUIDs, natural keys): radix-128 split, the
        # reference's RangeSplitUtil string path
        preds = string_range_split_predicates(lower, upper, num_partitions, pk)
    else:
        preds = range_split_predicates(int(lower), int(upper), num_partitions, pk)
    src = table
    if columns or hint or where:
        src = f"({hinted_select(table, columns, hint, where)}) dx_src"
    return spark.read.jdbc(url, src, predicates=preds, properties=props)

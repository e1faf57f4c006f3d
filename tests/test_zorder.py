"""Z-order clustering (lake/zorder.py + compact(cluster_method="zorder")):
interleave correctness, pruning on EVERY z column, range-vs-zorder layout
contrast, LWW preservation, validation."""

import tempfile

import pytest
from pyspark.sql import functions as F

from tg_data_connector_spark.lake.table import LakeTable, TableSchema
from tg_data_connector_spark.lake.zorder import interleave_ranks, with_zvalue

SCHEMA = TableSchema(
    [
        ("doc_id", "string"),
        ("tokens", "array<int>"),
        ("n_tok", "int"),
        ("source", "string"),
    ]
)


def _grid(spark, n):
    """n rows whose (n_tok, source) values form an interleaved 2-D grid —
    arrival order correlates with NEITHER column."""
    i = F.col("id")
    # decorrelated dims: n_tok cycles fast (i mod 64), source slow (i div
    # 64) — inside any n_tok slice every source value occurs, so a
    # lexicographic (n_tok, source) layout provably can't prune on source
    n_tok = (i % 64 + 1).cast("int")
    src = F.concat(
        F.lit("s"), F.lpad(((i / 64).cast("long") % 16).cast("string"), 2, "0")
    )
    return spark.range(n).select(
        F.concat(F.lit("k"), i.cast("string")).alias("doc_id"),
        F.array(F.lit(1).cast("int")).alias("tokens"),
        n_tok.alias("n_tok"),
        src.alias("source"),
    )


def test_interleave_known_bits():
    """The pure-Python mirror pins the Morton definition."""
    # bits of a land at even positions, bits of b at odd positions
    assert interleave_ranks([0, 0], 4) == 0
    assert interleave_ranks([15, 15], 4) == 0xFF
    assert interleave_ranks([0b1010, 0b0101], 4) == 0b01100110
    assert interleave_ranks([1, 0], 4) == 0b01
    assert interleave_ranks([0, 1], 4) == 0b10
    assert interleave_ranks([7, 0, 0], 3) == 0b001001001


def test_zvalue_matches_single_column_ranks(spark):
    """The 2-column Spark z equals the Python interleave of the per-column
    ranks (a single-column z IS that column's rank — cuts are deterministic
    for identical input + error, so the runs agree), and ranks are monotone
    in the underlying value."""
    df = spark.createDataFrame(
        [(float(a), float(b)) for a in range(16) for b in range(16)],
        "a double, b double",
    )
    wa = with_zvalue(df, ["a"], bits=4, out="ra")
    wb = with_zvalue(wa, ["b"], bits=4, out="rb")
    rows = with_zvalue(wb, ["a", "b"], bits=4, out="z").collect()
    for r in rows:
        assert r["z"] == interleave_ranks([r["ra"], r["rb"]], 4), dict(r.asDict())
    # monotone rank vs value, full 4-bit range used on 16 uniform values
    by_a = {}
    for r in rows:
        by_a.setdefault(r["a"], set()).add(r["ra"])
    assert all(len(s) == 1 for s in by_a.values())  # rank depends on a only
    ranks = [next(iter(by_a[k])) for k in sorted(by_a)]
    assert ranks == sorted(ranks)
    assert len(set(ranks)) >= 14  # essentially one rank per distinct value


def test_zvalue_string_column_ordering(spark):
    """String proxy ranks preserve lexicographic order (first 8 bytes)."""
    rows = [("apple",), ("banana",), ("cherry",), ("date",), ("elder",),
            ("fig",), ("grape",), ("kiwi",)]
    df = spark.createDataFrame(rows * 4, "s string")
    got = with_zvalue(df, ["s"], bits=3, out="z").distinct().collect()
    by_s = sorted(got, key=lambda r: r["s"])
    zs = [r["z"] for r in by_s]
    assert zs == sorted(zs)
    # 8 values over 7 cuts: every boundary discriminates (cuts may equal the
    # smallest value, so the bottom rank can start at 1)
    assert len(set(zs)) >= 7


def test_zvalue_validation(spark):
    df = spark.range(4).select(F.col("id").cast("double").alias("a"))
    with pytest.raises(ValueError):
        with_zvalue(df, [])
    with pytest.raises(ValueError):
        with_zvalue(df, ["nope"])
    with pytest.raises(ValueError):
        with_zvalue(df, ["a"] * 8, bits=8)  # 64 bits > 63
    with pytest.raises(ValueError):
        LakeTable.create(
            spark, tempfile.mkdtemp() + "/t", SCHEMA, key="doc_id",
            n_buckets=2, cluster_method="hilbert",
        )


def _scan_fraction(t, filters):
    t.read(filters=filters).count()
    return t._last_scan_file_count / len(t.snapshot().files)


def test_zorder_prunes_both_columns(spark):
    """After a zorder compaction, a single-column filter on EITHER cluster
    column skips files; after a lexicographic range compaction of the same
    data only the leading column prunes meaningfully."""
    from tg_data_connector_spark.lake.maintain import compact

    def build(method):
        root = tempfile.mkdtemp(prefix=f"tgspark_z_{method}_")
        t = LakeTable.create(
            spark, f"{root}/t", SCHEMA, key="doc_id", n_buckets=2,
            stats_cols=["n_tok", "source"],
            cluster_cols=["n_tok", "source"], cluster_method=method,
        )
        t.append(_grid(spark, 6000), lsn_col=F.lit(1))
        compact(t, files_per_bucket=16)
        return t

    tz = build("zorder")
    tr = build("range")

    # leading column: both layouts prune
    assert _scan_fraction(tz, [("n_tok", "<=", 8)]) < 0.7
    assert _scan_fraction(tr, [("n_tok", "<=", 8)]) < 0.7
    # trailing column: only zorder prunes (range files span all sources)
    z_frac = _scan_fraction(tz, [("source", "=", "s03")])
    r_frac = _scan_fraction(tr, [("source", "=", "s03")])
    assert z_frac < 0.75, f"zorder should prune trailing col, scanned {z_frac}"
    assert r_frac == 1.0, f"range layout unexpectedly pruned trailing col"

    # row-level parity on both layouts
    for t in (tz, tr):
        got = t.read(filters=[("source", "=", "s03"), ("n_tok", ">", 32)])
        exp = t.read().where("source = 's03' AND n_tok > 32")
        assert got.exceptAll(exp).count() == 0
        assert exp.exceptAll(got).count() == 0


def test_zorder_compaction_preserves_lww_and_tombstones(spark):
    from tg_data_connector_spark.lake.maintain import compact
    from tg_data_connector_spark.lake.merge import delta_append

    root = tempfile.mkdtemp(prefix="tgspark_z_lww_")
    t = LakeTable.create(
        spark, f"{root}/t", SCHEMA, key="doc_id", n_buckets=2,
        stats_cols=["n_tok", "source"],
    )
    t.append(_grid(spark, 400), lsn_col=F.lit(1))
    changes = spark.createDataFrame(
        [
            ("k7", [9, 9], 2, "s99", "U", 5, 0),
            ("k8", None, None, None, "D", 5, 1),
        ],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "op string, commit_lsn bigint, seq_no bigint",
    )
    delta_append(t, changes)
    baseline = t.read().orderBy("doc_id").collect()
    compact(t, cluster_by=["n_tok", "source"], cluster_method="zorder",
            files_per_bucket=4)
    after = t.read().orderBy("doc_id").collect()
    assert baseline == after
    assert t.read().where("doc_id = 'k8'").count() == 0
    assert t.read().where("doc_id = 'k7'").collect()[0]["source"] == "s99"

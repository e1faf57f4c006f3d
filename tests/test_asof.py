"""As-of join: semantics (inclusive/strict/tolerance/no-match), determinism,
and the single-exchange plan shape."""

import datetime as dt

from pyspark.sql import functions as F

from tg_data_connector_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 5, "l_a"),
            (1, 2, "l_b"),
            (1, 9, "l_c"),
            (2, 1, "l_d"),  # before any right row for key 2
            (3, 4, "l_e"),  # key absent from right entirely
        ],
        "k int, t int, lv string",
    )
    right = spark.createDataFrame(
        [
            (1, 2, "r_x"),
            (1, 5, "r_y"),
            (1, 7, "r_z"),
            (2, 3, "r_w"),
        ],
        "k int, t int, rv string",
    )
    return left, right


def test_backward_inclusive(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", ts="t")
    got = {(r.k, r.t): (r.t_r, r.rv_r) for r in out.collect()}
    assert got == {
        (1, 5): (5, "r_y"),  # equal ts matches (inclusive)
        (1, 2): (2, "r_x"),
        (1, 9): (7, "r_z"),
        (2, 1): (None, None),  # no right row at or before
        (3, 4): (None, None),  # key unmatched
    }
    assert out.count() == left.count()  # left join: every left row survives


def test_strict_excludes_same_instant(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", ts="t", strict=True)
    got = {(r.k, r.t): r.t_r for r in out.collect()}
    assert got[(1, 5)] == 2  # same-instant right row no longer visible
    assert got[(1, 2)] is None
    assert got[(1, 9)] == 7


def test_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", ts="t", tolerance=F.lit(1))
    got = {(r.k, r.t): r.t_r for r in out.collect()}
    assert got[(1, 5)] == 5  # age 0 <= 1
    assert got[(1, 9)] is None  # age 2 > 1 -> nulled, row kept
    assert out.count() == 5


def test_timestamp_columns_and_interval_tolerance(spark):
    ts = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame([(1, ts(10))], "k int, t timestamp")
    right = spark.createDataFrame(
        [(1, ts(1), "old"), (1, ts(9), "new")], "k int, t timestamp, rv string"
    )
    out = asof_join(
        left, right, on="k", ts="t", tolerance=F.expr("INTERVAL 5 MINUTES")
    )
    [row] = out.collect()
    assert row.rv_r == "new"
    out2 = asof_join(
        left,
        right.where(F.col("rv") == "old"),
        on="k",
        ts="t",
        tolerance=F.expr("INTERVAL 5 MINUTES"),
    )
    [row2] = out2.collect()
    assert row2.rv_r is None  # 9 minutes stale > 5-minute tolerance


def test_distinct_right_ts_column_name(spark):
    left = spark.createDataFrame([(1, 10, "L")], "k int, ev_t int, lv string")
    right = spark.createDataFrame([(1, 4, 7.5)], "k int, snap_t int, rate double")
    out = asof_join(left, right, on="k", ts="ev_t", right_ts="snap_t")
    [row] = out.collect()
    assert (row.snap_t_r, row.rate_r) == (4, 7.5)
    assert row.lv == "L" and row.ev_t == 10


def test_single_exchange_plan(spark):
    """The union-and-carry form shuffles ONCE on the key — no join node, no
    per-key cross product. At 100 TB that single hash exchange + sort is the
    whole cost; a non-equi join formulation would be BNLJ or an exploded SMJ."""
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, on="k", ts="t")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan

"""Incremental aggregate views (lake/mview.py): refresh-from-CDF parity with
a full recompute, group birth/death, cross-group row moves, multi-commit
windows, no-op refresh, unsupported-measure rejection."""

import pytest
from pyspark.sql import functions as F

from tg_data_connector_spark.cdc import gen_seed_sequences
from tg_data_connector_spark.lake import LakeTable, TableSchema
from tg_data_connector_spark.lake.dml import delete_where, update_where
from tg_data_connector_spark.lake.mview import (
    create_aggregate_view,
    refresh_aggregate,
)

SCHEMA = TableSchema(
    [
        ("doc_id", "string"),
        ("tokens", "array<int>"),
        ("n_tok", "int"),
        ("source", "string"),
    ]
)
GROUP = ["source"]
MEASURES = {"n": ("count", "*"), "tok": ("sum", "n_tok")}


def _setup(spark, root, docs=60):
    t = LakeTable.create(spark, f"{root}/src", SCHEMA, key="doc_id", n_buckets=4)
    t.append(gen_seed_sequences(spark, docs))
    v = create_aggregate_view(t, f"{root}/view", GROUP, MEASURES, n_buckets=4)
    return t, v


def _expected(t):
    return {
        r["source"]: (r["n"], r["tok"])
        for r in t.read()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("tok"))
        .collect()
    }


def _got(v):
    rows = v.read().collect()
    for r in rows:  # the maintained count always equals the count measure
        assert r["_cnt"] == r["n"]
    return {r["source"]: (r["n"], r["tok"]) for r in rows}


def test_initial_refresh_matches_full_groupby(spark, tmp_path):
    t, v = _setup(spark, str(tmp_path))
    snap = refresh_aggregate(t, v, GROUP, MEASURES)
    assert snap is not None
    assert _got(v) == _expected(t)
    # source unchanged -> no-op, no new version
    assert refresh_aggregate(t, v, GROUP, MEASURES) is None


def test_incremental_updates_moves_and_deletes(spark, tmp_path):
    t, v = _setup(spark, str(tmp_path))
    refresh_aggregate(t, v, GROUP, MEASURES)
    # several commits inside one refresh window: value change, group move,
    # deletes
    update_where(
        t, F.substring("doc_id", -1, 1) == "3", {"n_tok": "n_tok + 100"}
    )
    update_where(
        t, F.substring("doc_id", -1, 1) == "4", {"source": F.lit("moved")}
    )
    delete_where(t, F.substring("doc_id", -1, 1).isin("5", "6"))
    snap = refresh_aggregate(t, v, GROUP, MEASURES)
    assert snap is not None
    exp = _expected(t)
    assert _got(v) == exp
    assert "moved" in exp  # group born in this window
    # chained incremental windows stay consistent
    update_where(t, F.col("source") == "moved", {"n_tok": "n_tok * 2"})
    refresh_aggregate(t, v, GROUP, MEASURES)
    assert _got(v) == _expected(t)


def test_group_death_deletes_view_row(spark, tmp_path):
    t, v = _setup(spark, str(tmp_path))
    refresh_aggregate(t, v, GROUP, MEASURES)
    victims = [
        r["source"]
        for r in t.read().groupBy("source").count().orderBy("count").limit(1).collect()
    ]
    delete_where(t, F.col("source") == victims[0])
    refresh_aggregate(t, v, GROUP, MEASURES)
    got = _got(v)
    assert victims[0] not in got
    assert got == _expected(t)


def test_refresh_is_idempotent_per_window(spark, tmp_path):
    t, v = _setup(spark, str(tmp_path))
    refresh_aggregate(t, v, GROUP, MEASURES)
    to_v = t.current_version()
    update_where(t, F.substring("doc_id", -1, 1) == "1", {"n_tok": "n_tok + 1"})
    new_v = t.current_version()
    refresh_aggregate(t, v, GROUP, MEASURES, to_version=new_v)
    want = _got(v)
    # a crashed-and-retried refresh of the SAME window must be absorbed by
    # the batch-id (no double-application): force the stored cursor back
    # by re-running with the same window bounds
    assert refresh_aggregate(t, v, GROUP, MEASURES, to_version=new_v) is None
    assert _got(v) == want
    assert to_v < new_v


def test_min_measure_rejected(spark, tmp_path):
    t, v = _setup(spark, str(tmp_path), docs=8)
    with pytest.raises(ValueError, match="not incrementally maintainable"):
        refresh_aggregate(t, v, GROUP, {"m": ("min", "n_tok")})
    with pytest.raises(ValueError, match="reserved"):
        create_aggregate_view(
            t, str(tmp_path / "v2"), GROUP, {"_cnt": ("count", "*")}
        )


def test_null_group_distinct_from_empty_string(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "src"), SCHEMA, key="doc_id", n_buckets=2
    )
    t.append(
        spark.createDataFrame(
            [("a", [1], 1, None), ("b", [2], 1, ""), ("c", [3], 2, "")],
            SCHEMA.ddl(),
        )
    )
    v = create_aggregate_view(
        t, str(tmp_path / "view"), GROUP, MEASURES, n_buckets=2
    )
    refresh_aggregate(t, v, GROUP, MEASURES)
    rows = {r["source"]: (r["n"], r["tok"]) for r in v.read().collect()}
    assert rows == {None: (1, 1), "": (2, 3)}


def test_refresh_preimage_is_bucket_pruned(spark, tmp_path):
    """Touching keys in a narrow bucket set must keep the subtraction-side
    scan narrow: the refresh's changed-bucket probe is the pre-image read's
    prune list, so it must cover exactly the touched keys' buckets."""
    from tg_data_connector_spark.lake.table import bucket_expr

    t, v = _setup(spark, str(tmp_path))
    refresh_aggregate(t, v, GROUP, MEASURES)
    victim = _ids_one(t)
    update_where(t, F.col("doc_id") == victim, {"n_tok": "n_tok + 5"})
    stats = {}
    refresh_aggregate(t, v, GROUP, MEASURES, stats_out=stats)
    want_bucket = (
        t.read()
        .where(F.col("doc_id") == victim)
        .select(bucket_expr("doc_id", 4).alias("b"))
        .collect()[0]["b"]
    )
    assert stats["changed_buckets"] == [want_bucket]
    assert _got(v) == _expected(t)


def _ids_one(t):
    return t.read().select("doc_id").orderBy("doc_id").limit(1).collect()[0][0]


def test_stream_view_maintenance(spark, tmp_path):
    """CDF-stream-triggered refresh: availableNow drains pending commits,
    the view converges to the full recompute, and a second drain (or a
    restarted stream with a fresh checkpoint) is a no-op — the refresh
    cursor, not the Spark checkpoint, is the idempotence boundary."""
    from tg_data_connector_spark.streaming.foreach import (
        stream_view_maintenance,
    )

    t, v = _setup(spark, str(tmp_path))
    update_where(t, F.substring("doc_id", -1, 1) == "2", {"n_tok": "n_tok + 9"})
    delete_where(t, F.substring("doc_id", -1, 1) == "7")
    q = stream_view_maintenance(
        spark, t, v, GROUP, MEASURES, str(tmp_path / "ck1")
    )
    q.awaitTermination(120)
    assert _got(v) == _expected(t)
    ver = v.current_version()
    # fresh checkpoint, no new commits: the stream re-delivers nothing new
    # version-wise and the cursor absorbs any replay
    q2 = stream_view_maintenance(
        spark, t, v, GROUP, MEASURES, str(tmp_path / "ck2")
    )
    q2.awaitTermination(120)
    assert v.current_version() == ver and _got(v) == _expected(t)

"""plan_maintenance / run_maintenance: metadata-only triggers (delta depth,
base-file accumulation, history length), safe ordering, execution parity."""

import pytest
from pyspark.sql import functions as F

from tg_data_connector_spark.lake import LakeTable, TableSchema
from tg_data_connector_spark.lake.maintain import (
    MaintenanceAction,
    delta_depths,
    plan_maintenance,
    run_maintenance,
)
from tg_data_connector_spark.lake.merge import delta_append

SCHEMA = TableSchema(
    [
        ("doc_id", "string"),
        ("tokens", "array<int>"),
        ("n_tok", "int"),
        ("source", "string"),
    ]
)

EV = (
    "doc_id string, tokens array<int>, n_tok int, source string, "
    "op string, commit_lsn bigint, seq_no bigint"
)


def _tbl(spark, root, n=40, n_buckets=4, **create_kwargs):
    t = LakeTable.create(spark, root, SCHEMA, "doc_id", n_buckets, **create_kwargs)
    seed = spark.range(n).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int")).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.lit("s").alias("source"),
    )
    t.append(seed)
    return t


def _append_one(t, spark, i):
    t.append(
        spark.createDataFrame(
            [(f"x{i}", [99], 1, "s")],
            "doc_id string, tokens array<int>, n_tok int, source string",
        )
    )


def test_healthy_table_empty_plan(spark, tmp_table_root):
    t = _tbl(spark, tmp_table_root)
    assert plan_maintenance(t) == []


def test_base_file_accumulation_triggers_compact(spark, tmp_table_root):
    t = _tbl(spark, tmp_table_root)
    for i in range(4):
        _append_one(t, spark, i)
    plan = plan_maintenance(t, max_base_files_per_bucket=2)
    assert [a.kind for a in plan] == ["compact"]
    assert "base files > 2" in plan[0].reason
    # only the bucket(s) the tiny appends actually hit are selected
    assert plan[0].buckets is not None
    base_counts = {}
    for f in t.snapshot().files:
        base_counts[f["bucket"]] = base_counts.get(f["bucket"], 0) + 1
    assert plan[0].buckets == sorted(
        b for b, c in base_counts.items() if c > 2
    )


def test_delta_depth_triggers_incremental_compact(spark, tmp_table_root):
    t = _tbl(spark, tmp_table_root)
    for lsn in range(2, 8):
        delta_append(
            t,
            spark.createDataFrame([("d1", [7], 1, "s", "U", lsn, 0)], EV),
        )
    depths = delta_depths(t.snapshot())
    assert max(depths.values()) >= 5
    plan = plan_maintenance(t, max_delta_depth=4)
    assert [a.kind for a in plan] == ["compact"]
    assert "delta depth > 4" in plan[0].reason
    assert plan[0].buckets == sorted(
        b for b, d in depths.items() if d > 4
    )


def test_all_buckets_tripped_plans_full_compact(spark, tmp_table_root):
    t = _tbl(spark, tmp_table_root, n=200)  # seed rows land in every bucket
    for i in range(3):
        t.append(
            spark.range(200).select(
                F.concat(F.lit(f"y{i}_"), F.col("id")).alias("doc_id"),
                F.array(F.lit(1)).alias("tokens"),
                F.lit(1).alias("n_tok"),
                F.lit("s").alias("source"),
            )
        )
    plan = plan_maintenance(t, max_base_files_per_bucket=2)
    assert plan[0].kind == "compact"
    assert plan[0].buckets is None  # whole-table pass, not an O(buckets) list


def test_history_growth_plans_expire_then_gc(spark, tmp_table_root):
    t = _tbl(spark, tmp_table_root, n=10)
    for i in range(8):
        _append_one(t, spark, i)
    plan = plan_maintenance(
        t, max_base_files_per_bucket=100, keep_last_snapshots=2,
        snapshot_slack=1,
    )
    assert [a.kind for a in plan] == ["expire_snapshots", "gc_orphans"]
    assert plan[0].params == {"keep_last": 2}


def test_cluster_reason_mentions_layout(spark, tmp_table_root):
    t = _tbl(
        spark, tmp_table_root,
        stats_cols=["n_tok", "source"],
        cluster_cols=["n_tok", "source"], cluster_method="zorder",
    )
    for i in range(4):
        _append_one(t, spark, i)
    plan = plan_maintenance(t, max_base_files_per_bucket=2)
    assert "zorder" in plan[0].reason


def test_run_maintenance_executes_and_converges(spark, tmp_table_root):
    t = _tbl(spark, tmp_table_root, n=30)
    for i in range(6):
        _append_one(t, spark, i)
    for lsn in range(2, 9):
        delta_append(
            t,
            spark.createDataFrame([("d2", [lsn], 1, "s", "U", lsn, 0)], EV),
        )
    state = sorted(t.read().collect())
    kwargs = dict(
        max_base_files_per_bucket=2, max_delta_depth=3,
        keep_last_snapshots=2, snapshot_slack=1,
    )
    res = run_maintenance(t, **kwargs)
    assert res["compacted"] and res["expired"]
    # gc runs with the default 1h age threshold, so fresh expiry leftovers
    # survive this run — reclaim them explicitly for the assert
    from tg_data_connector_spark.lake.maintain import gc_orphans

    assert gc_orphans(t, min_age_seconds=0)
    assert sorted(t.read().collect()) == state
    assert len(t.history()) <= 3
    # converged: the same thresholds now report a healthy table
    assert plan_maintenance(t, **kwargs) == []


def test_compact_target_rows_per_file(spark, tmp_table_root):
    """Rows-targeted clustered compaction sizes files by the manifest's row
    counts: ~total/target files overall, each near the target."""
    from tg_data_connector_spark.lake.maintain import compact

    t = LakeTable.create(
        spark, tmp_table_root, SCHEMA, "doc_id", 2,
        cluster_cols=["n_tok"],
    )
    t.append(
        spark.range(1000).select(
            F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
            F.array(F.lit(1)).alias("tokens"),
            (F.col("id") % 50).cast("int").alias("n_tok"),
            F.lit("s").alias("source"),
        )
    )
    state = sorted(t.read().collect())
    snap = compact(t, target_rows_per_file=100)
    files = snap.files
    assert 8 <= len(files) <= 14, len(files)  # ~1000/100, range-split slack
    assert all(f["rows"] <= 250 for f in files)
    assert sorted(t.read().collect()) == state


def test_run_maintenance_rejects_unknown_action(spark, tmp_table_root):
    t = _tbl(spark, tmp_table_root, n=5)
    with pytest.raises(ValueError):
        run_maintenance(t, actions=[MaintenanceAction(kind="nope")])

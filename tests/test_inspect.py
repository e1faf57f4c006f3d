"""Tags (named snapshot refs) and metadata-inspection tables."""

import pytest
from pyspark.sql import functions as F

from tg_data_connector_spark.lake import LakeTable, TableSchema
from tg_data_connector_spark.lake.inspect import (
    files_df,
    partition_stats,
    snapshots_df,
    tags_df,
)
from tg_data_connector_spark.lake.maintain import expire_snapshots

SCHEMA = TableSchema(
    [
        ("doc_id", "string"),
        ("tokens", "array<int>"),
        ("n_tok", "int"),
        ("source", "string"),
    ]
)


def _seed(spark, n=50, pfx="d"):
    return spark.range(n).select(
        F.concat(F.lit(pfx), F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int"), F.lit(1)).alias("tokens"),
        F.lit(2).alias("n_tok"),
        F.lit("s0").alias("source"),
    )


def test_tags_pin_survive_expiry_and_are_immutable(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark, 20))
    v1 = t.current_version()
    t.append(_seed(spark, 20, pfx="x"))
    t.append(_seed(spark, 20, pfx="y"))
    assert t.tag("release", v1) == v1
    assert t.tag("release", v1) == v1  # idempotent
    with pytest.raises(ValueError, match="immutable"):
        t.tag("release", v1 + 1)
    assert t.tags() == {"release": v1}
    expired = expire_snapshots(t, keep_last=1)
    assert v1 not in expired and v1 in t.history()
    assert t.snapshot(tag="release").version == v1
    assert t.read(snapshot=t.snapshot(tag="release")).count() == 20
    with pytest.raises(ValueError, match="version OR tag"):
        t.snapshot(version=v1, tag="release")
    assert [tuple(r) for r in tags_df(t).collect()] == [("release", v1)]
    t.drop_tag("release")
    assert t.tags() == {}
    # untagged now: the next expiry removes it
    assert v1 in expire_snapshots(t, keep_last=1)


def test_tag_nonexistent_version_rejected(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark))
    with pytest.raises(ValueError, match="does not exist"):
        t.tag("bad", 99)


def test_files_and_snapshots_metadata_match_data(spark, tmp_table_root):
    from tg_data_connector_spark.lake.merge import delta_append, merge_upsert

    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark, 40))
    ev = _seed(spark, 10, pfx="n").select(
        "*", F.lit("I").alias("op"),
        F.lit(5).cast("bigint").alias("commit_lsn"),
        F.lit(0).cast("bigint").alias("seq_no"),
    )
    merge_upsert(t, ev)
    delta_append(t, ev.withColumn("commit_lsn", F.lit(6).cast("bigint")))
    f = files_df(t)
    # manifest row counts are truthful: base rows = 40+10 keys, delta = 10
    assert f.where(F.col("kind") == "base").agg(F.sum("rows")).collect()[0][0] == 50
    assert f.where(F.col("kind") == "delta").agg(F.sum("rows")).collect()[0][0] == 10
    # per-file key bounds present where the engine collects them (delta files
    # — CoW rewrites intentionally skip stats: a hash bucket never prunes)
    assert (
        f.where(F.col("kind") == "delta")
        .where(F.col("kmin").isNull() | F.col("kmax").isNull())
        .count()
        == 0
    )
    s = snapshots_df(t)
    rows = {r["version"]: r for r in s.collect()}
    cur = t.current_version()
    assert rows[cur]["n_delta_files"] > 0
    assert rows[cur]["total_rows"] == 60
    assert rows[cur]["parent"] == cur - 1
    # per-bucket rollup sums back to the same totals
    ps = partition_stats(t).agg(F.sum("rows"), F.sum("n_files")).collect()[0]
    assert ps[0] == 60 and ps[1] == f.count()
    # metadata queries never open data files: built from manifests only
    assert files_df(t, t.snapshot(cur - 2)).agg(F.sum("rows")).collect()[0][0] == 40


# ------------------------------------------------------------------- fsck
def _probs(t, **kw):
    from tg_data_connector_spark.lake.inspect import verify_table

    return sorted(
        (r["check"], r["detail"]) for r in verify_table(t, **kw).collect()
    )


def test_verify_table_healthy_is_empty(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark, 40))
    t.append(_seed(spark, 10, pfx="x"))
    assert _probs(t, deep=True) == []


def test_verify_table_detects_missing_file(spark, tmp_table_root):
    import os

    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark, 40))
    victim = t.snapshot().files[0]["path"]
    t.fs.remove(os.path.join(t.root, victim))
    probs = _probs(t)
    assert any(c == "missing_file" and victim in d for c, d in probs)
    # the scan checks still run over the surviving files
    assert all(c == "missing_file" for c, d in probs)


def test_verify_table_detects_rowcount_and_misplacement(spark, tmp_table_root):
    import os

    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark, 40))
    entry = t.snapshot().files[0]
    victim = os.path.join(t.root, entry["path"])
    # out-of-band replacement: 3 rows whose keys hash to OTHER buckets
    bad = spark.createDataFrame(
        [(f"zz{i}", [1], 1, "s0") for i in range(3)], SCHEMA.ddl()
    )
    bad.coalesce(1).write.mode("overwrite").parquet(victim + ".tmp")
    import glob
    import shutil

    part = glob.glob(victim + ".tmp/part-*.parquet")[0]
    shutil.copyfile(part, victim)
    # drop the original write's Hadoop checksum sidecar — an out-of-band
    # replacement would not carry one, and a stale crc fails the read itself
    crc = os.path.join(
        os.path.dirname(victim), f".{os.path.basename(victim)}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    checks = {c for c, _ in _probs(t)}
    assert "row_count_mismatch" in checks or "bucket_misplacement" in checks


def test_verify_table_detects_watermark_regression(spark, tmp_table_root):
    import json
    import os

    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark, 10))
    v1 = t.current_version()
    t.append(_seed(spark, 10, pfx="x"))
    # tamper the PARENT version file: claim a higher watermark than the child
    vpath = t._vpath(v1)
    doc = json.loads(t.fs.read_text(vpath))
    doc["summary"].setdefault("watermarks", {})["0"] = 999
    t.fs.remove(vpath)
    with t.fs.write_text_atomic(vpath) as f:
        json.dump(doc, f)
    t2 = LakeTable(spark, t.root)
    probs = _probs(t2)
    assert any(c == "watermark_regression" for c, _ in probs)

import pytest
from pyspark.sql import functions as F

from tg_data_connector_spark.lake import LakeTable, TableSchema
from tg_data_connector_spark.lake.evolve import (
    SchemaEvolutionError,
    apply_schema_change,
    evolved_schema,
)

SCHEMA = TableSchema(
    [
        ("doc_id", "string"),
        ("tokens", "array<int>"),
        ("n_tok", "int"),
        ("source", "string"),
    ]
)


def _seed(spark, n=50):
    return spark.range(n).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int"), F.lit(1)).alias("tokens"),
        F.lit(2).alias("n_tok"),
        F.lit("s0").alias("source"),
    )


def test_create_append_read(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    assert t.current_version() == 0
    assert t.read().count() == 0
    t.append(_seed(spark))
    assert t.current_version() == 1
    df = t.read()
    assert df.count() == 50
    assert df.columns == ["doc_id", "tokens", "n_tok", "source"]
    row = df.where(F.col("doc_id") == "d7").collect()[0]
    assert row["tokens"] == [7, 1]


def test_bucket_pruned_read(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark))
    snap = t.snapshot()
    total = sum(f["rows"] for f in snap.files)
    assert total == 50
    b0 = t.read(buckets=[0]).count()
    assert b0 == sum(f["rows"] for f in snap.files if f["bucket"] == 0)
    assert 0 < b0 < 50


def test_snapshot_isolation(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark, 10))
    v1 = t.current_version()
    t.append(_seed(spark, 5).withColumn("doc_id", F.concat(F.lit("x"), F.col("doc_id"))))
    assert t.read(t.snapshot(v1)).count() == 10
    assert t.read().count() == 15


def test_evolve_add_and_widen(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark, 10))
    apply_schema_change(t, '{"add_column": {"name": "lang", "type": "string"}}')
    df = t.read()
    assert "lang" in df.columns
    assert df.where(F.col("lang").isNull()).count() == 10  # old files null-filled
    apply_schema_change(t, '{"widen": {"name": "n_tok", "to": "bigint"}}')
    assert dict(t.snapshot().schema().fields)["n_tok"] == "bigint"
    assert t.read().schema["n_tok"].dataType.simpleString() == "bigint"
    assert t.read().count() == 10
    # idempotent re-apply is a no-op
    assert apply_schema_change(t, '{"widen": {"name": "n_tok", "to": "bigint"}}') is None


def test_evolve_rejects_unsafe(spark):
    with pytest.raises(SchemaEvolutionError):
        evolved_schema(SCHEMA, '{"widen": {"name": "n_tok", "to": "smallint"}}')
    with pytest.raises(SchemaEvolutionError):
        evolved_schema(SCHEMA, '{"add_column": {"name": "n_tok", "type": "int"}}')


def test_crash_between_stage_and_publish_invisible(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark, 10))
    v = t.current_version()
    files = t.write_data_files(
        _seed(spark, 3)
        .withColumn("_lsn", F.lit(0).cast("bigint"))
        .withColumn("_seq", F.lit(0).cast("bigint"))
        .withColumn("_deleted", F.lit(False))
        .withColumn("_b", F.lit(0)),
        schema_id=1,
    )
    with pytest.raises(RuntimeError):
        t.commit(files, replace_buckets=None, crash_before_publish=True)
    # staged manifest exists but pointer never moved: readers see the old state
    assert t.current_version() == v
    assert t.read().count() == 10
    # next commit skips over the orphaned version file and succeeds
    t.append(_seed(spark, 2).withColumn("doc_id", F.concat(F.lit("y"), F.col("doc_id"))))
    assert t.read().count() == 12


def test_bucket_hash_format_validated(spark, tmp_table_root):
    """A table laid out under a different key->bucket hash must be refused at
    open — merging it would silently corrupt bucket pruning and the b= layout."""
    import json
    import os

    import pytest as _pytest

    from tg_data_connector_spark.lake.table import LakeTable, TableSchema

    t = LakeTable.create(
        spark, tmp_table_root, TableSchema([("doc_id", "string")]), key="doc_id"
    )
    assert t.meta()["bucket_hash"] == "murmur3_pmod"
    # tamper: simulate a table written by the old xxhash64 layout
    mp = os.path.join(tmp_table_root, "_meta.json")
    with open(mp) as f:
        m = json.load(f)
    m["bucket_hash"] = "xxhash64_pmod"
    with open(mp, "w") as f:
        json.dump(m, f)
    t2 = LakeTable(spark, tmp_table_root)
    with _pytest.raises(RuntimeError, match="bucket hash"):
        t2.meta()
    # legacy table with no recorded hash id is refused too
    del m["bucket_hash"]
    with open(mp, "w") as f:
        json.dump(m, f)
    t3 = LakeTable(spark, tmp_table_root)
    with _pytest.raises(RuntimeError, match="bucket hash"):
        t3.meta()


def test_local_table_fs_primitives(tmp_path):
    """The two guarantees the commit protocol needs from any FS backend:
    create-fails-if-exists (version claim) and atomic pointer replace."""
    import os

    import pytest as _pytest

    from tg_data_connector_spark.lake.fs import LocalTableFS

    fs = LocalTableFS()
    d = str(tmp_path / "t")
    fs.makedirs(d)
    p = os.path.join(d, "v1.json")
    fs.write_text_excl(p, "{}")
    with _pytest.raises(FileExistsError):
        fs.write_text_excl(p, "{}")  # second writer loses the version claim
    cur = os.path.join(d, "_current")
    with fs.write_text_atomic(cur) as f:
        f.write("1")
    assert fs.read_text(cur) == "1"
    # a failed atomic write leaves the old value intact and no temp litter
    try:
        with fs.write_text_atomic(cur) as f:
            f.write("2")
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert fs.read_text(cur) == "1"
    assert [x for x in fs.listdir(d) if ".tmp-" in x] == []

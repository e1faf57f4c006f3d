from pyspark.sql import functions as F

from tg_data_connector_spark.cdc.dedup import lww_dedup, lww_dedup_salted
from tg_data_connector_spark.lake import LakeTable, TableSchema, merge_upsert

SCHEMA = TableSchema(
    [
        ("doc_id", "string"),
        ("tokens", "array<int>"),
        ("n_tok", "int"),
        ("source", "string"),
    ]
)

EV = "doc_id string, tokens array<int>, n_tok int, source string, op string, commit_lsn bigint, seq_no bigint"


def _events(spark, rows):
    return spark.createDataFrame(rows, EV)


def test_lww_dedup_both_strategies(spark):
    rows = [
        ("a", [1], 1, "s", "I", 1, 0),
        ("a", [2], 1, "s", "U", 3, 1),
        ("a", [9], 1, "s", "U", 3, 0),  # same lsn, lower seq loses
        ("a", [0], 1, "s", "U", 2, 9),
        ("a", [2], 1, "s", "U", 3, 1),  # exact duplicate delivery
        ("b", [5], 1, "s", "D", 7, 0),
    ]
    df = _events(spark, rows)
    for fn in (lww_dedup, lambda d, k: lww_dedup_salted(d, k, 4)):
        out = {r["doc_id"]: r for r in fn(df, "doc_id").collect()}
        assert len(out) == 2
        assert out["a"]["tokens"] == [2] and out["a"]["commit_lsn"] == 3
        assert out["a"]["seq_no"] == 1
        assert out["b"]["op"] == "D"


def test_merge_insert_update_delete(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(
        spark.createDataFrame(
            [("a", [1], 1, "s"), ("b", [2], 1, "s"), ("c", [3], 1, "s")],
            "doc_id string, tokens array<int>, n_tok int, source string",
        )
    )
    batch = _events(
        spark,
        [
            ("a", [10, 11], 2, "s2", "U", 5, 0),  # update
            ("b", None, None, "s", "D", 5, 0),  # delete
            ("d", [40], 1, "s", "I", 5, 0),  # insert
            ("zz", None, None, "s", "D", 5, 0),  # delete of absent key -> tombstone
        ],
    )
    merge_upsert(t, batch)
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert set(rows) == {"a", "c", "d"}
    assert rows["a"]["tokens"] == [10, 11] and rows["a"]["source"] == "s2"
    assert rows["c"]["tokens"] == [3]


def test_merge_lww_ignores_stale_and_no_resurrection(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(
        spark.createDataFrame(
            [("a", [1], 1, "s")],
            "doc_id string, tokens array<int>, n_tok int, source string",
        ),
        lsn_col=F.lit(10),
        seq_col=F.lit(0),
    )
    # batch 1: delete at v20
    merge_upsert(t, _events(spark, [("a", None, None, "s", "D", 20, 0)]))
    assert t.read().count() == 0
    # batch 2 (late, out-of-order): update at v15 must NOT resurrect 'a'
    merge_upsert(t, _events(spark, [("a", [9], 1, "s", "U", 15, 0)]))
    assert t.read().count() == 0
    # stale update below the seed version is ignored too
    merge_upsert(t, _events(spark, [("a", [7], 1, "s", "U", 5, 0)]))
    assert t.read().count() == 0
    # but a genuinely newer insert after the delete wins
    merge_upsert(t, _events(spark, [("a", [42], 1, "s", "I", 30, 0)]))
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["tokens"] == [42]


def test_merge_only_rewrites_affected_buckets(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=8)
    seed = spark.range(200).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int")).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.lit("s").alias("source"),
    )
    t.append(seed)
    before = {f["path"] for f in t.snapshot().files}
    merge_upsert(t, _events(spark, [("d0", [99], 1, "s", "U", 5, 0)]))
    after = t.snapshot().files
    untouched = [f for f in after if f["path"] in before]
    # exactly one bucket was rewritten; the other buckets' files are reused
    rewritten_buckets = {f["bucket"] for f in after if f["path"] not in before}
    assert len(rewritten_buckets) == 1
    assert len(untouched) > 0
    assert t.read().where(F.col("doc_id") == "d0").collect()[0]["tokens"] == [99]
    assert t.read().count() == 200


def test_merge_idempotent_reapply(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    batch = _events(spark, [("a", [1], 1, "s", "I", 1, 0), ("b", [2], 1, "s", "I", 1, 1)])
    merge_upsert(t, batch)
    state1 = sorted(t.read().collect())
    merge_upsert(t, batch)  # re-apply the same batch
    assert sorted(t.read().collect()) == state1

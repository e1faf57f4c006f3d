"""Writable refs (branches): isolation, fast-forward, retention, races."""

import pytest
from pyspark.sql import functions as F

from tg_data_connector_spark.lake import LakeTable, TableSchema
from tg_data_connector_spark.lake.maintain import expire_snapshots
from tg_data_connector_spark.lake.merge import merge_upsert
from tg_data_connector_spark.lake.table import CommitConflict

SCHEMA = TableSchema(
    [
        ("doc_id", "string"),
        ("tokens", "array<int>"),
        ("n_tok", "int"),
        ("source", "string"),
    ]
)


def _seed(spark, n=30, pfx="d"):
    return spark.range(n).select(
        F.concat(F.lit(pfx), F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int")).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.lit("s0").alias("source"),
    )


def _events(spark, n, lsn, pfx="n"):
    return _seed(spark, n, pfx).select(
        "*", F.lit("I").alias("op"),
        F.lit(lsn).cast("bigint").alias("commit_lsn"),
        F.lit(0).cast("bigint").alias("seq_no"),
    )


def test_branch_isolation_and_fast_forward(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark))
    fork = t.current_version()
    br = t.create_branch("dev")
    assert br.ref == "dev" and br.current_version() == fork
    merge_upsert(br, _events(spark, 10, lsn=5))
    # branch advanced, main frozen; reads diverge accordingly
    assert br.current_version() > fork and t.current_version() == fork
    assert t.read().count() == 30 and br.read().count() == 40
    # fast-forward main onto the branch head; both handles converge
    t.fast_forward(br.current_version())
    assert t.current_version() == br.current_version()
    assert t.read().count() == 40


def test_branch_create_race_and_guards(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark))
    t.create_branch("dev")
    with pytest.raises(Exception):
        t.create_branch("dev")  # compare-and-create: second creator loses
    with pytest.raises(ValueError, match="primary"):
        t.create_branch("main")
    with pytest.raises(ValueError, match="does not exist"):
        t.create_branch("x", at_version=99)
    with pytest.raises(ValueError, match="does not exist"):
        t.checkout("nope")
    with pytest.raises(ValueError, match="primary"):
        t.drop_branch("main")


def test_fast_forward_rejects_non_descendant(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark))
    br = t.create_branch("dev")
    merge_upsert(br, _events(spark, 5, lsn=5))
    merge_upsert(t, _events(spark, 5, lsn=6, pfx="m"))  # main moves too
    # diverged: neither head is an ancestor of the other
    with pytest.raises(ValueError, match="descendant"):
        t.fast_forward(br.current_version())
    with pytest.raises(ValueError, match="descendant"):
        br.fast_forward(t.current_version())


def test_fast_forward_loses_to_concurrent_publish(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark))
    br = t.create_branch("dev")
    merge_upsert(br, _events(spark, 5, lsn=5))
    head = br.current_version()
    # simulate a racing writer publishing on main between the ancestry check
    # and the swap: patch _publish's expected_parent check by moving main
    t2 = t.checkout("main")
    merge_upsert(t2, _events(spark, 3, lsn=7, pfx="m"))
    with pytest.raises((CommitConflict, ValueError)):
        t.fast_forward(head)


def test_expiry_keeps_branch_heads(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark))
    br = t.create_branch("dev")
    merge_upsert(br, _events(spark, 5, lsn=5))
    head = br.current_version()
    for i in range(3):  # advance main well past the branch head
        merge_upsert(t, _events(spark, 2, lsn=10 + i, pfx=f"m{i}"))
    expired = expire_snapshots(t, keep_last=1)
    assert head not in expired and br.read().count() == 35
    t.drop_branch("dev")
    assert head in expire_snapshots(t, keep_last=1)


def test_refs_df_lists_all(spark, tmp_table_root):
    from tg_data_connector_spark.lake.inspect import refs_df

    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark))
    t.create_branch("dev")
    t.tag("v1")
    got = {(r["name"], r["kind"]): r["version"] for r in refs_df(t).collect()}
    v = t.current_version()
    assert got == {("main", "branch"): v, ("dev", "branch"): v, ("v1", "tag"): v}


def test_job_writer_branch_config(spark, tmp_table_root):
    """writer.branch routes a job's lake write onto a named ref: main stays
    frozen; a second job reuses the existing branch."""
    from tg_data_connector_spark.job import run_job

    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark))
    fork = t.current_version()
    job = {
        "reader": {
            "type": "sql",
            "querySql": "SELECT 'b' || CAST(id AS STRING) AS doc_id, "
                        "array(CAST(id AS INT)) AS tokens, 1 AS n_tok, "
                        "'s1' AS source, 'I' AS op, "
                        "CAST(9 AS BIGINT) AS commit_lsn, "
                        "CAST(0 AS BIGINT) AS seq_no FROM range(10)",
        },
        "writer": {"type": "lake_merge", "path": tmp_table_root,
                   "key": "doc_id", "writeMode": "merge", "branch": "dev"},
    }
    run_job(spark, job)
    assert t.current_version() == fork  # main untouched
    br = t.checkout("dev")
    assert br.read().count() == 40
    run_job(spark, job)  # branch exists now: checkout path, LWW no-op merge
    assert br.read().count() == 40
    t.fast_forward(br.current_version())
    assert t.read().count() == 40


def test_branches_and_tags_over_hadoop_fs(spark, tmp_path):
    """Refs use the same FS-seam primitives as version files: exercise the
    full branch/tag lifecycle through HadoopTableFS over a file:// root."""
    from tg_data_connector_spark.lake.fs import HadoopTableFS

    root = f"file://{tmp_path}/t"
    fs = HadoopTableFS(spark, root)
    t = LakeTable.create(spark, root, SCHEMA, key="doc_id", n_buckets=4, fs=fs)
    t.append(_seed(spark))
    v = t.current_version()
    t.tag("rel", v)
    br = t.create_branch("dev")
    merge_upsert(br, _events(spark, 5, lsn=5))
    assert t.current_version() == v and br.current_version() > v
    assert t.branches() == {"dev": br.current_version()}
    assert t.tags() == {"rel": v}
    t.fast_forward(br.current_version())
    assert t.read().count() == 35
    t.drop_branch("dev")
    t.drop_tag("rel")
    assert t.branches() == {} and t.tags() == {}

"""Streaming change-feed source (``readStream.format("lake_cdf")``) parity:
the stream must deliver exactly what batch ``LakeTable.changes()`` computes —
COW commits diffed against the parent, MoR delta commits verbatim, compaction
skipped — and pick up commits that land between triggers."""

import pytest
from pyspark.sql import functions as F

from tg_data_connector_spark.lake import LakeTable, TableSchema, merge_upsert
from tg_data_connector_spark.lake.maintain import compact
from tg_data_connector_spark.lake.merge import delta_append
from tg_data_connector_spark.streaming.cdf_source import read_change_stream

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


def _tbl(spark, root, n=20, nb=4):
    t = LakeTable.create(spark, root, SCHEMA, "doc_id", nb)
    seed = spark.range(n).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int")).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.lit("s").alias("source"),
    )
    t.append(seed)
    return t


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV)


def _drain(spark, root, v0, checkpoint, name):
    df = read_change_stream(spark, root, starting_version=v0)
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _assert_same(stream_df, batch_df):
    cols = sorted(batch_df.columns)
    s = stream_df.select(cols)
    b = batch_df.select(cols)
    assert s.exceptAll(b).count() == 0 and b.exceptAll(s).count() == 0
    assert s.count() == b.count()


def test_stream_matches_batch_changes(spark, tmp_table_root, tmp_path):
    t = _tbl(spark, tmp_table_root)
    v0 = t.current_version()
    # COW merge: rewrites buckets, must be parent-diffed
    merge_upsert(
        t,
        _ev(spark, [("d1", [7], 1, "s", "U", 10, 0), ("d2", [], 0, "s", "D", 11, 0)]),
        summary_update={"batch_id": "b1"},
    )
    # MoR delta: streams verbatim
    delta_append(
        t,
        _ev(spark, [("d3", [8, 8], 2, "s", "U", 12, 0)]),
        summary_update={"batch_id": "b2"},
    )
    # compaction: physical rewrite, no logical change — must be skipped
    compact(t)
    got = _drain(spark, tmp_table_root, v0, str(tmp_path / "cp1"), "cdf_parity")
    _assert_same(got, t.changes(v0))
    assert got.count() == 3  # d1 upsert + d2 tombstone + d3 delta
    assert got.where("doc_id = 'd2' and _deleted").count() == 1


def test_stream_resumes_across_new_commits(spark, tmp_table_root, tmp_path):
    """Commits landing after a drain are picked up by the next trigger from
    the SAME checkpoint — the offset (snapshot version) is durable."""
    t = _tbl(spark, tmp_table_root)
    v0 = t.current_version()
    merge_upsert(t, _ev(spark, [("d5", [1], 1, "s", "U", 20, 0)]),
                 summary_update={"batch_id": "b1"})
    cp = str(tmp_path / "cp2")
    sink = str(tmp_path / "sink")

    def drain_to_files():
        # memory sink cannot recover a checkpoint; the parquet sink can
        df = read_change_stream(spark, tmp_table_root, starting_version=v0)
        q = (
            df.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain_to_files()
    assert spark.read.parquet(sink).count() == 1
    merge_upsert(t, _ev(spark, [("d6", [2], 1, "s", "U", 21, 0)]),
                 summary_update={"batch_id": "b2"})
    drain_to_files()
    got = spark.read.parquet(sink)
    # second run delivered ONLY the new commit (offset came from checkpoint)
    assert got.count() == 2
    assert sorted(r["doc_id"] for r in got.collect()) == ["d5", "d6"]


def test_stream_defaults_to_tail_only(spark, tmp_table_root, tmp_path):
    """No startingVersion -> history before the first query start never
    streams; commits after it do (the reader pins the current version when
    the QUERY starts — stream definition is lazy)."""
    t = _tbl(spark, tmp_table_root)
    merge_upsert(t, _ev(spark, [("d7", [1], 1, "s", "U", 30, 0)]),
                 summary_update={"batch_id": "b0"})
    cp, sink = str(tmp_path / "cp3"), str(tmp_path / "sink3")

    def drain():
        q = (
            read_change_stream(spark, tmp_table_root)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()  # pins the post-d7 version in the checkpoint; delivers nothing
    merge_upsert(t, _ev(spark, [("d8", [2], 1, "s", "U", 31, 0)]),
                 summary_update={"batch_id": "b1"})
    drain()
    got = spark.read.parquet(sink)
    assert [r["doc_id"] for r in got.collect()] == ["d8"]  # d7 never streamed


def test_stream_schema_evolution_alignment(spark, tmp_table_root, tmp_path):
    """Files written before an add-column commit stream null-filled up to the
    pinned stream schema (the _read_file_entries rules, re-done in Arrow)."""
    from tg_data_connector_spark.lake.evolve import apply_schema_change

    t = _tbl(spark, tmp_table_root)
    v0 = t.current_version()  # stream range INCLUDES the pre-evolution commit
    merge_upsert(t, _ev(spark, [("d1", [5], 1, "s", "U", 40, 0)]),
                 summary_update={"batch_id": "b1"})
    apply_schema_change(t, '{"add_column": {"name": "lang", "type": "string"}}')
    merge_upsert(
        t,
        spark.createDataFrame(
            [("d2", [6], 1, "s", "en", "U", 41, 0)],
            "doc_id string, tokens array<int>, n_tok int, source string, "
            "lang string, op string, commit_lsn bigint, seq_no bigint",
        ),
        summary_update={"batch_id": "b2"},
    )
    got = _drain(spark, tmp_table_root, v0, str(tmp_path / "cp4"), "cdf_evo")
    _assert_same(got, t.changes(v0))
    rows = {r["doc_id"]: r for r in got.collect()}
    assert rows["d2"]["lang"] == "en"
    assert rows["d1"]["lang"] is None  # pre-evolution file, null-filled

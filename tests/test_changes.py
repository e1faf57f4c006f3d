"""Change-data-feed read (``LakeTable.changes`` — Iceberg changelog / Delta
CDF analog): per-commit row-level changes, exact under both write paths.

Delta (merge-on-read) commits are read verbatim — their new files ARE the
change set. Copy-on-write commits are diffed against the parent (anti-join of
the rewritten buckets on (key, version)) so unchanged-but-rewritten rows
never leak into the feed. Compaction commits carry no logical change and are
skipped.
"""

import pytest
from pyspark.sql import functions as F

from tg_data_connector_spark.lake import LakeTable, TableSchema, merge_upsert
from tg_data_connector_spark.lake.maintain import compact
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


def _feed(t, v0, to=None):
    return {
        (r["_commit_version"], r["doc_id"]): r
        for r in t.changes(v0, to).collect()
    }


def test_changes_mor_commits_verbatim(spark, tmp_table_root):
    t = _tbl(spark, tmp_table_root)
    v0 = t.current_version()
    delta_append(t, _ev(spark, [("d1", [7], 1, "s", "U", 10, 0)]),
                 summary_update={"batch_id": "b1"})
    delta_append(t, _ev(spark, [("d1", None, None, None, "D", 11, 0),
                                ("d2", [8, 8], 2, "s", "U", 11, 1)]),
                 summary_update={"batch_id": "b2"})
    got = _feed(t, v0)
    assert len(got) == 3
    (v1, v2) = sorted({v for v, _ in got})
    assert got[(v1, "d1")]["tokens"] == [7] and not got[(v1, "d1")]["_deleted"]
    assert got[(v2, "d1")]["_deleted"] and got[(v2, "d1")]["tokens"] is None
    assert got[(v2, "d2")]["tokens"] == [8, 8]
    assert got[(v2, "d1")]["_lsn"] == 11
    # half-open range: from v1 excludes the first commit
    assert set(_feed(t, v1)) == {(v2, "d1"), (v2, "d2")}


def test_changes_cow_diff_excludes_unchanged_rewrites(spark, tmp_table_root):
    """A COW merge rewrites EVERY row of the touched buckets; the feed must
    carry only the rows the commit logically changed."""
    t = _tbl(spark, tmp_table_root)
    v0 = t.current_version()
    merge_upsert(t, _ev(spark, [("d1", [9], 1, "s", "U", 20, 0),
                                ("d3", None, None, None, "D", 20, 1)]),
                 summary_update={"batch_id": "c1"})
    got = _feed(t, v0)
    assert set(k for _, k in got) == {"d1", "d3"}
    (v1,) = {v for v, _ in got}
    assert got[(v1, "d1")]["tokens"] == [9]
    assert got[(v1, "d3")]["_deleted"]


def test_changes_skips_compaction_commits(spark, tmp_table_root):
    t = _tbl(spark, tmp_table_root)
    v0 = t.current_version()
    delta_append(t, _ev(spark, [("d1", [7], 1, "s", "U", 10, 0)]),
                 summary_update={"batch_id": "b1"})
    before = set(_feed(t, v0))
    compact(t)
    assert set(_feed(t, v0)) == before  # physical rewrite adds nothing


def test_changes_seed_append_counts_as_inserts(spark, tmp_table_root):
    """The initial bulk load IS a change set (every row new vs the empty
    parent) — the feed from version 0 carries the seed."""
    t = _tbl(spark, tmp_table_root, n=5)
    got = t.changes(0)
    assert got.count() == 5
    assert got.where(F.col("_deleted")).count() == 0


def test_changes_rejects_non_ancestor(spark, tmp_table_root):
    t = _tbl(spark, tmp_table_root)
    with pytest.raises(ValueError, match="not an ancestor"):
        t.changes(t.current_version() + 7)


def test_changes_aligns_evolved_schema(spark, tmp_table_root):
    """Commits from before a schema evolution read null-filled up to the
    to-version's schema — one uniform frame across the range."""
    from tg_data_connector_spark.lake.evolve import apply_schema_change

    t = _tbl(spark, tmp_table_root)
    v0 = t.current_version()
    delta_append(t, _ev(spark, [("d1", [7], 1, "s", "U", 10, 0)]),
                 summary_update={"batch_id": "b1"})
    apply_schema_change(t, '{"add_column": {"name": "lang", "type": "string"}}')
    delta_append(
        t,
        spark.createDataFrame(
            [("d2", [8], 1, "s", "en", "U", 11, 0)],
            "doc_id string, tokens array<int>, n_tok int, source string, "
            "lang string, op string, commit_lsn bigint, seq_no bigint",
        ),
        summary_update={"batch_id": "b2"},
    )
    got = {r["doc_id"]: r for r in t.changes(v0).collect()}
    assert "lang" in t.changes(v0).columns
    assert got["d1"]["lang"] is None
    assert got["d2"]["lang"] == "en"


def test_changes_resolves_rename_across_range(spark, tmp_table_root):
    """A rename mid-range: pre-rename commits resolve the NEW name back
    through the rename log; post-rename commits carry it natively — the
    feed is one uniform frame under the to-version's names."""
    from tg_data_connector_spark.lake.evolve import apply_schema_change

    t = _tbl(spark, tmp_table_root)
    v0 = t.current_version()
    delta_append(t, _ev(spark, [("d1", [7], 1, "pre", "U", 10, 0)]),
                 summary_update={"batch_id": "b1"})
    apply_schema_change(t, '{"rename_column": {"name": "source", "to": "origin"}}')
    delta_append(
        t,
        spark.createDataFrame(
            [("d2", [8], 1, "post", "U", 11, 0)],
            "doc_id string, tokens array<int>, n_tok int, origin string, "
            "op string, commit_lsn bigint, seq_no bigint",
        ),
        summary_update={"batch_id": "b2"},
    )
    feed = t.changes(v0)
    assert "origin" in feed.columns and "source" not in feed.columns
    got = {r["doc_id"]: r["origin"] for r in feed.collect()}
    assert got["d1"] == "pre" and got["d2"] == "post"

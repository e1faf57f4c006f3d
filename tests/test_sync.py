"""Downstream table sync over the change-data-feed (lake/sync.py).

Reference parity note: the reference chains copies only by running another
job.json against the PREVIOUS copy's full output (``JobContainer.java`` is one
reader->writer pair); the CDF sync is the O(changes) version of that hop.
"""

import pytest
from pyspark.sql import functions as F

from tg_data_connector_spark.lake import LakeTable, TableSchema, merge_upsert, sync_table
from tg_data_connector_spark.lake.evolve import SchemaEvolutionError
from tg_data_connector_spark.lake.maintain import compact, rebucket

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


def _events(spark, rows):
    return spark.createDataFrame(rows, EV)


def _seed(spark, n=40):
    return spark.range(n).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int")).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.lit("s0").alias("source"),
    )


def _state(t):
    return {
        r["doc_id"]: (r["tokens"], r["n_tok"], r["source"])
        for r in t.read().collect()
    }


def _pair(spark, root, src_nb=4, dst_nb=8):
    src = LakeTable.create(spark, f"{root}/src", SCHEMA, key="doc_id", n_buckets=src_nb)
    dst = LakeTable.create(spark, f"{root}/dst", SCHEMA, key="doc_id", n_buckets=dst_nb)
    return src, dst


def test_bootstrap_then_incremental(spark, tmp_table_root):
    src, dst = _pair(spark, tmp_table_root)
    src.append(_seed(spark))
    merge_upsert(src, _events(spark, [("d1", [11], 1, "s1", "U", 5, 0)]))
    assert sync_table(src, dst) is not None  # bootstrap
    assert _state(dst) == _state(src)
    assert sync_table(src, dst) is None  # up to date -> no-op, no commit
    v = dst.current_version()
    merge_upsert(
        src,
        _events(
            spark,
            [("d2", None, None, "s", "D", 9, 0), ("z1", [7], 1, "s2", "I", 9, 0)],
        ),
    )
    assert sync_table(src, dst) is not None  # incremental via CDF
    assert _state(dst) == _state(src)
    assert "d2" not in _state(dst)
    assert dst.current_version() == v + 1  # exactly one downstream commit


def test_bootstrap_carries_tombstone_fences(spark, tmp_table_root):
    """A key deleted upstream BEFORE the bootstrap must stay dead downstream
    even when a late, older event arrives downstream-only."""
    src, dst = _pair(spark, tmp_table_root)
    src.append(_seed(spark))
    merge_upsert(src, _events(spark, [("d3", None, None, "s", "D", 8, 0)]))
    sync_table(src, dst)
    assert "d3" not in _state(dst)
    merge_upsert(dst, _events(spark, [("d3", [33], 1, "late", "U", 3, 0)]))
    assert "d3" not in _state(dst)  # fence replicated, resurrection blocked
    merge_upsert(dst, _events(spark, [("d3", [34], 1, "new", "I", 9, 0)]))
    assert _state(dst)["d3"] == ([34], 1, "new")


def test_sync_is_crash_safe_and_duplicate_safe(spark, tmp_table_root):
    """Re-running a pass whose commit DID land is a no-op (version marker);
    a duplicate merge of the same window is absorbed by LWW + batch-id."""
    src, dst = _pair(spark, tmp_table_root)
    src.append(_seed(spark))
    sync_table(src, dst)
    merge_upsert(src, _events(spark, [("d1", [42], 1, "s1", "U", 5, 0)]))
    s1 = sync_table(src, dst)
    s2 = sync_table(src, dst)
    assert s1 is not None and s2 is None
    assert _state(dst) == _state(src)
    applied = dst.snapshot().applied_batches()
    assert len([b for b in applied if b.startswith("sync:")]) == len(set(
        b for b in applied if b.startswith("sync:")
    ))


def test_sync_skips_compaction_and_survives_rebucket(spark, tmp_table_root):
    """Upstream physical maintenance (compact, rebucket) between passes is
    invisible to the feed; downstream state still converges."""
    src, dst = _pair(spark, tmp_table_root)
    src.append(_seed(spark))
    sync_table(src, dst)
    merge_upsert(src, _events(spark, [("d1", [1, 2], 2, "s1", "U", 5, 0)]))
    compact(src)
    rebucket(src, 16)
    merge_upsert(src, _events(spark, [("d2", [3], 1, "s2", "U", 9, 0)]))
    sync_table(src, dst)
    assert _state(dst) == _state(src)


def test_sync_propagates_added_column(spark, tmp_table_root):
    from tg_data_connector_spark.lake.evolve import apply_schema_change

    src, dst = _pair(spark, tmp_table_root)
    src.append(_seed(spark))
    sync_table(src, dst)
    apply_schema_change(src, '{"add_column": {"name": "lang", "type": "string"}}')
    ev = spark.createDataFrame(
        [("d1", [11], 1, "s1", "en", "U", 5, 0)],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "lang string, op string, commit_lsn bigint, seq_no bigint",
    )
    merge_upsert(src, ev)
    sync_table(src, dst)
    assert "lang" in dst.snapshot().schema().names()
    rows = {r["doc_id"]: r["lang"] for r in dst.read().collect()}
    assert rows["d1"] == "en"
    assert rows["d2"] is None  # old rows null-filled


def test_sync_rejects_narrowing_drift(spark, tmp_table_root):
    """dst evolved a column wider than src can satisfy -> no silent cast."""
    wide = TableSchema(
        [
            ("doc_id", "string"),
            ("tokens", "array<int>"),
            ("n_tok", "int"),
            ("source", "int"),  # type conflict with src's string
        ]
    )
    src = LakeTable.create(
        spark, f"{tmp_table_root}/src", SCHEMA, key="doc_id", n_buckets=4
    )
    dst = LakeTable.create(
        spark, f"{tmp_table_root}/dst", wide, key="doc_id", n_buckets=4
    )
    src.append(_seed(spark, 5))
    with pytest.raises(SchemaEvolutionError):
        sync_table(src, dst)


def test_two_sources_fan_in_with_independent_markers(spark, tmp_table_root):
    """Two upstreams with disjoint key spaces sync into one table; each
    source's consumed-version marker advances independently."""
    a = LakeTable.create(spark, f"{tmp_table_root}/a", SCHEMA, key="doc_id", n_buckets=4)
    b = LakeTable.create(spark, f"{tmp_table_root}/b", SCHEMA, key="doc_id", n_buckets=4)
    dst = LakeTable.create(spark, f"{tmp_table_root}/d", SCHEMA, key="doc_id", n_buckets=4)
    a.append(
        spark.createDataFrame([("a1", [1], 1, "sa")], SCHEMA.ddl())
    )
    b.append(
        spark.createDataFrame([("b1", [2], 1, "sb")], SCHEMA.ddl())
    )
    sync_table(a, dst, source_name="a")
    sync_table(b, dst, source_name="b")
    assert set(_state(dst)) == {"a1", "b1"}
    merge_upsert(a, _events(spark, [("a2", [3], 1, "sa", "I", 5, 0)]))
    sync_table(a, dst, source_name="a")
    assert set(_state(dst)) == {"a1", "a2", "b1"}
    s = dst.snapshot().summary
    assert s["sync_from:a"] == a.current_version()
    assert s["sync_from:b"] == b.current_version()

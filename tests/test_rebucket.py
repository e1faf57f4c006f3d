"""Bucket-count evolution (maintain.rebucket) + snapshot rollback.

Reference parity note: the reference connector has no table format at all —
its channel count is fixed per job (``JobContainer.java:95-186`` split). Bucket
evolution is the lake-side capability a 100-TB table needs instead: the bucket
count picked at create time fixes merge parallelism and file sizes forever
unless it can be evolved transactionally.
"""

import pytest
from pyspark.sql import functions as F

from tg_data_connector_spark.lake import LakeTable, TableSchema, merge_upsert
from tg_data_connector_spark.lake.maintain import rebucket
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


def _events(spark, rows):
    return spark.createDataFrame(rows, EV)


def _seed(spark, n=60):
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


def test_rebucket_grow_preserves_state_and_layout(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark))
    merge_upsert(
        t,
        _events(
            spark,
            [
                ("d1", [100], 1, "s1", "U", 5, 0),
                ("d2", None, None, "s", "D", 5, 0),
                ("x1", [7], 1, "s1", "I", 5, 0),
            ],
        ),
    )
    before = _state(t)
    snap = rebucket(t, 16)
    assert t.bucket_count() == 16
    assert snap.summary["rebucket"] == {"from": 4, "to": 16}
    # every file lives in the new layout, ids within range
    assert {f["bucket"] for f in snap.files} <= set(range(16))
    assert _state(t) == before
    # bucket-pruned read still partitions the key space exactly
    assert sum(t.read(buckets=[b]).count() for b in range(16)) == len(before)


def test_rebucket_shrink(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=8)
    t.append(_seed(spark, 40))
    before = _state(t)
    snap = rebucket(t, 2)
    assert t.bucket_count() == 2
    assert {f["bucket"] for f in snap.files} <= {0, 1}
    assert _state(t) == before


def test_merge_after_rebucket_uses_new_layout(spark, tmp_table_root):
    """The authoritative count is snapshot-scoped: a merge AFTER the rebucket
    must write under the new layout and produce the same logical state as a
    control table that was 16-bucket all along."""
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    ctrl = LakeTable.create(
        spark, tmp_table_root + "_ctrl", SCHEMA, key="doc_id", n_buckets=16
    )
    b1 = _events(
        spark,
        [("d3", [30], 1, "s1", "U", 5, 0), ("y1", [1], 1, "s1", "I", 5, 0)],
    )
    b2 = _events(
        spark,
        [
            ("d3", [31], 1, "s2", "U", 9, 0),
            ("y1", None, None, "s", "D", 9, 0),
            ("y2", [2], 1, "s2", "I", 9, 0),
        ],
    )
    for tbl in (t, ctrl):
        tbl.append(_seed(spark))
        merge_upsert(tbl, b1)
    rebucket(t, 16)
    for tbl in (t, ctrl):
        merge_upsert(tbl, b2)
    assert _state(t) == _state(ctrl)
    # post-rebucket commit dirs lay files out under the 16-wide expr
    assert {f["bucket"] for f in t.snapshot().files} <= set(range(16))


def test_rebucket_folds_mor_deltas_and_keeps_tombstones(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark, 20))
    delta_append(
        t,
        _events(
            spark,
            [("d5", [50], 1, "s1", "U", 5, 0), ("d6", None, None, "s", "D", 5, 0)],
        ),
    )
    assert any(f.get("kind") == "delta" for f in t.snapshot().files)
    before = _state(t)
    snap = rebucket(t, 8)
    assert not any(f.get("kind") == "delta" for f in snap.files)  # folded
    assert _state(t) == before
    # the tombstone's anti-resurrection semantics survived the rewrite:
    # a LATE, OLDER update for the deleted key must stay dead
    merge_upsert(t, _events(spark, [("d6", [66], 1, "s9", "U", 3, 0)]))
    assert "d6" not in _state(t)
    # while a NEWER insert revives it
    merge_upsert(t, _events(spark, [("d6", [67], 1, "s9", "I", 9, 0)]))
    assert _state(t)["d6"] == ([67], 1, "s9")


def test_rebucket_is_cdf_invisible(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark, 20))
    v0 = t.current_version()
    merge_upsert(t, _events(spark, [("d1", [11], 1, "s1", "U", 5, 0)]))
    rebucket(t, 8)
    merge_upsert(t, _events(spark, [("d2", [22], 1, "s2", "U", 9, 0)]))
    ch = t.changes(v0).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in ch) == ["d1", "d2"]


def test_rebucket_noop_and_validation(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark, 5))
    v = t.current_version()
    assert rebucket(t, 4).version == v  # no-op commit-free
    with pytest.raises(ValueError):
        rebucket(t, 0)


def test_rollback_restores_state_and_allows_new_commits(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark, 10))
    v_good = t.current_version()
    good = _state(t)
    merge_upsert(t, _events(spark, [("d0", [999], 1, "bad", "U", 50, 0)]))
    assert _state(t)["d0"] == ([999], 1, "bad")
    t.rollback(v_good)
    assert t.current_version() == v_good
    assert _state(t) == good
    # new lineage continues cleanly past the abandoned branch
    merge_upsert(t, _events(spark, [("d1", [42], 1, "ok", "U", 60, 0)]))
    assert _state(t)["d1"] == ([42], 1, "ok")
    assert t.snapshot().parent == v_good


def test_rollback_rejects_non_ancestor(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark, 5))
    with pytest.raises(ValueError):
        t.rollback(99)


def test_rollback_across_rebucket_restores_old_layout(spark, tmp_table_root):
    """Rolling back past a rebucket must also roll back the bucket count —
    which falls out of the count being snapshot-scoped."""
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t.append(_seed(spark, 20))
    v_old = t.current_version()
    before = _state(t)
    rebucket(t, 16)
    assert t.bucket_count() == 16
    t.rollback(v_old)
    assert t.bucket_count() == 4
    assert _state(t) == before
    merge_upsert(t, _events(spark, [("z1", [1], 1, "s", "I", 70, 0)]))
    assert {f["bucket"] for f in t.snapshot().files} <= set(range(4))


def test_merge_racing_concurrent_rebucket_recomputes_layout(spark, tmp_table_root):
    """A merge staged against the OLD bucket count loses to a concurrent
    rebucket; the retry must re-merge under the NEW count (merge_upsert's
    basis_nb check), land the update, and leave every file 16-wide."""
    t_a = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t_a.append(_seed(spark, 30))
    t_b = LakeTable(spark, tmp_table_root)
    fired = {"n": 0}

    def interleave():
        if fired["n"] == 0:
            fired["n"] += 1
            rebucket(t_b, 16)

    snap = merge_upsert(
        t_a,
        _events(spark, [("d1", [111], 1, "s9", "U", 20, 0)]),
        summary_update={"batch_id": "A"},
        pre_publish_check=interleave,
    )
    assert snap is not None
    assert t_a.bucket_count() == 16  # the rebucket won the race and stuck
    assert _state(t_a)["d1"] == ([111], 1, "s9")  # no lost update
    assert {f["bucket"] for f in t_a.snapshot().files} <= set(range(16))
    assert t_a.snapshot().applied_batches().count("A") == 1


def test_delta_append_racing_rebucket_restages_under_new_layout(spark, tmp_table_root):
    """A MoR delta staged against the OLD bucket count loses to a concurrent
    rebucket. A metadata-only retry would register the old-layout files —
    bucket-pruned reads would miss the delta and the next COW merge's
    replace_buckets could drop it (lost update). The retry must detect the
    count change and RE-STAGE under the new layout."""
    t_a = LakeTable.create(spark, tmp_table_root, SCHEMA, key="doc_id", n_buckets=4)
    t_a.append(_seed(spark, 30))
    t_b = LakeTable(spark, tmp_table_root)
    fired = {"n": 0}

    def interleave():
        if fired["n"] == 0:
            fired["n"] += 1
            rebucket(t_b, 16)

    snap = delta_append(
        t_a,
        _events(spark, [("d1", [111], 1, "s9", "U", 20, 0)]),
        summary_update={"batch_id": "A"},
        pre_publish_check=interleave,
    )
    assert snap is not None
    assert t_a.bucket_count() == 16
    assert {f["bucket"] for f in t_a.snapshot().files} <= set(range(16))
    assert _state(t_a)["d1"] == ([111], 1, "s9")
    # the delta must be visible through BUCKET-PRUNED reads under the new
    # layout (this is what a metadata-only retry would have broken)
    got = t_a.lookup(["d1"]).collect()
    assert len(got) == 1 and got[0]["tokens"] == [111]
    # and a follow-up COW merge of other keys must not drop the delta
    merge_upsert(
        t_a,
        _events(spark, [("d2", [222], 1, "s2", "U", 30, 0)]),
        summary_update={"batch_id": "B"},
    )
    assert _state(t_a)["d1"] == ([111], 1, "s9")
    assert t_a.snapshot().applied_batches().count("A") == 1

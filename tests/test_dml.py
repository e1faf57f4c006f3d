"""Row-level DML (lake/dml.py): delete_where / update_where over both commit
paths (COW rewrite, MOR deltas). Pins: predicate semantics, tombstone
no-resurrect, idempotent re-run, batch_id at-most-once, WAP staging, key
assignment rejection, and MOR->compaction survival."""

import pytest
from pyspark.sql import functions as F

from tg_data_connector_spark.cdc import gen_seed_sequences
from tg_data_connector_spark.lake import LakeTable, TableSchema
from tg_data_connector_spark.lake.dml import delete_where, update_where
from tg_data_connector_spark.lake.maintain import compact
from tg_data_connector_spark.lake.merge import merge_upsert

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


def _setup(spark, root, docs=60, nb=4):
    t = LakeTable.create(spark, root, SCHEMA, key="doc_id", n_buckets=nb)
    t.append(gen_seed_sequences(spark, docs))
    return t


def _ids(t):
    return sorted(r["doc_id"] for r in t.read().select("doc_id").collect())


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_delete_where_removes_and_tombstones(spark, tmp_path, mode):
    t = _setup(spark, str(tmp_path / f"t_{mode}"))
    before = _ids(t)
    victims = [d for d in before if d.endswith(("3", "7"))]
    assert victims
    snap = delete_where(
        t, F.substring("doc_id", -1, 1).isin("3", "7"), mode=mode
    )
    assert snap is not None
    after = _ids(t)
    assert after == [d for d in before if d not in victims]
    # tombstones exist (not merely dropped rows): lineage read shows _deleted
    dead = (
        t.read(with_lineage=True)
        .where(F.col("_deleted") & F.col("doc_id").isin(victims))
        .count()
    )
    assert dead == len(victims)
    # idempotent: nothing matches on re-run
    assert delete_where(t, F.substring("doc_id", -1, 1).isin("3", "7"), mode=mode) is None


def test_delete_tombstone_blocks_older_update_allows_newer(spark, tmp_path):
    t = _setup(spark, str(tmp_path / "t_resurrect"))
    victim = _ids(t)[0]
    delete_where(t, F.col("doc_id") == victim, mode="mor")
    # the seed row carried some (_lsn, _seq); the tombstone is (_lsn, _seq+1).
    # An OLDER update (lsn below the tombstone) must NOT resurrect the row…
    older = spark.createDataFrame(
        [(victim, [1, 2], 2, "late", "U", -10, 0)], EV
    )
    merge_upsert(t, older)
    assert victim not in _ids(t)
    # …while a NEWER one must.
    newer = spark.createDataFrame(
        [(victim, [3, 4], 2, "fresh", "U", 10**9, 0)], EV
    )
    merge_upsert(t, newer)
    rows = t.read().where(F.col("doc_id") == victim).collect()
    assert len(rows) == 1 and rows[0]["source"] == "fresh"


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_update_where_sets_values(spark, tmp_path, mode):
    t = _setup(spark, str(tmp_path / f"u_{mode}"))
    snap = update_where(
        t,
        "n_tok >= 5",
        {"source": F.lit("big"), "n_tok": (F.col("n_tok") + 100).cast("int")},
        mode=mode,
    )
    assert snap is not None
    rows = t.read().collect()
    for r in rows:
        if r["n_tok"] >= 100:
            assert r["source"] == "big" and r["n_tok"] >= 105
        else:
            assert r["source"] != "big" and r["n_tok"] < 5
    # total row count unchanged by an update
    assert len(rows) == 60


def test_update_survives_compaction(spark, tmp_path):
    t = _setup(spark, str(tmp_path / "u_compact"))
    update_where(t, "n_tok = 3", {"source": F.lit("patched")}, mode="mor")
    assert any(f.get("kind") == "delta" for f in t.snapshot().files)
    want = sorted(
        r["doc_id"] for r in t.read().where("source = 'patched'").collect()
    )
    compact(t)
    assert not any(f.get("kind") == "delta" for f in t.snapshot().files)
    got = sorted(
        r["doc_id"] for r in t.read().where("source = 'patched'").collect()
    )
    assert got == want and want


def test_update_rejects_key_unknown_and_empty(spark, tmp_path):
    t = _setup(spark, str(tmp_path / "u_guards"), docs=5)
    with pytest.raises(ValueError, match="key"):
        update_where(t, "n_tok = 1", {"doc_id": F.lit("x")})
    with pytest.raises(ValueError, match="unknown column"):
        update_where(t, "n_tok = 1", {"nope": F.lit(1)})
    with pytest.raises(ValueError, match="assignment"):
        update_where(t, "n_tok = 1", {})
    with pytest.raises(ValueError, match="mode"):
        delete_where(t, "n_tok = 1", mode="zap")


def test_dml_batch_id_at_most_once(spark, tmp_path):
    t = _setup(spark, str(tmp_path / "u_batch"))
    s1 = update_where(
        t, "n_tok = 2", {"source": F.lit("once")}, batch_id="edit-1"
    )
    v1 = t.current_version()
    # same logical edit retried: the batch-id check returns without committing
    s2 = update_where(
        t, "n_tok = 2", {"source": F.lit("once")}, batch_id="edit-1"
    )
    assert s1 is not None and s2 is not None
    assert t.current_version() == v1 == s2.version


def test_delete_where_staged_then_published(spark, tmp_path):
    t = _setup(spark, str(tmp_path / "d_wap"))
    before = _ids(t)
    victims = [d for d in before if d.endswith("1")]
    staged = delete_where(
        t, F.substring("doc_id", -1, 1) == "1", mode="cow", publish=False
    )
    # invisible until published
    assert _ids(t) == before
    audit = t.read(snapshot=staged)
    assert sorted(r["doc_id"] for r in audit.select("doc_id").collect()) == [
        d for d in before if d not in victims
    ]
    t.publish_staged(staged.version)
    assert _ids(t) == [d for d in before if d not in victims]


# ------------------------------------------------------------- merge_into
def _src(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string, "
              "flag string"
    )


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_merge_into_clause_routing(spark, tmp_path, mode):
    from tg_data_connector_spark.lake.dml import merge_into

    t = _setup(spark, str(tmp_path / f"m_{mode}"), docs=20)
    before = {
        r["doc_id"]: (r["n_tok"], r["source"]) for r in t.read().collect()
    }
    some = sorted(before)[:4]
    src = _src(spark, [
        (some[0], [1, 2], 2, "edit", "upd"),      # matched + update fires
        (some[1], [9], 1, "edit", "skip"),        # matched, no clause -> kept
        (some[2], [7], 1, "edit", "purge"),       # matched + delete fires
        ("zz_new", [5, 5], 2, "edit", "upd"),     # not matched -> insert
        ("zz_skip", [5], 1, "edit", "purge"),     # not matched + ins cond fails
    ])
    snap = merge_into(
        t, src,
        when_matched_update={"n_tok": "s.n_tok + t.n_tok", "source": "s.source"},
        matched_condition="s.flag = 'upd'",
        when_matched_delete=True,
        delete_condition="s.flag = 'purge'",
        when_not_matched_insert="all",
        insert_condition="s.flag <> 'purge'",
        mode=mode,
    )
    assert snap is not None
    after = {r["doc_id"]: (r["n_tok"], r["source"]) for r in t.read().collect()}
    assert after[some[0]] == (2 + before[some[0]][0], "edit")  # updated, t.* ref
    assert after[some[1]] == before[some[1]]                   # untouched
    assert some[2] not in after                              # deleted
    assert after["zz_new"] == (2, "edit")                    # inserted
    assert "zz_skip" not in after                            # insert cond false
    # untouched rows all survive
    assert len(after) == len(before) - 1 + 1


def test_merge_into_insert_resurrects_tombstone(spark, tmp_path):
    from tg_data_connector_spark.lake.dml import merge_into

    t = _setup(spark, str(tmp_path / "res"), docs=10)
    victim = _ids(t)[0]
    delete_where(t, F.col("doc_id") == victim)
    assert victim not in _ids(t)
    # a tombstoned key is NOT matched -> the insert clause fires and the new
    # row must BEAT the tombstone under LWW (version = tombstone_seq + 1)
    merge_into(
        t,
        _src(spark, [(victim, [42], 1, "back", "new")]),
        when_not_matched_insert="all",
    )
    rows = {r["doc_id"]: r["source"] for r in t.read().collect()}
    assert rows[victim] == "back"


def test_merge_into_cardinality_and_validation(spark, tmp_path):
    from tg_data_connector_spark.lake.dml import merge_into

    t = _setup(spark, str(tmp_path / "card"), docs=6)
    dup = _src(spark, [("a", [1], 1, "s", "x"), ("a", [2], 1, "s", "x")])
    with pytest.raises(ValueError, match="multiple rows"):
        merge_into(t, dup, when_not_matched_insert="all")
    ok = _src(spark, [("a", [1], 1, "s", "x")])
    with pytest.raises(ValueError, match="key"):
        merge_into(t, ok, when_matched_update={"doc_id": "s.doc_id"})
    with pytest.raises(ValueError, match="no clauses"):
        merge_into(t, ok, when_not_matched_insert=None)
    # duplicate source accepted when the caller vouches (pre-deduped contract)
    assert merge_into(
        t, dup.limit(1), when_not_matched_insert="all",
        check_cardinality=False,
    ) is not None


def test_merge_into_noop_commits_nothing(spark, tmp_path):
    from tg_data_connector_spark.lake.dml import merge_into

    t = _setup(spark, str(tmp_path / "noop"), docs=6)
    v0 = t.current_version()
    match_none = _src(spark, [(_ids(t)[0], [1], 1, "s", "skip")])
    out = merge_into(
        t, match_none,
        when_matched_update={"source": "s.source"},
        matched_condition="s.flag = 'upd'",
        when_not_matched_insert=None,
    )
    assert out is None and t.current_version() == v0
    out = merge_into(
        t, match_none, mode="mor",
        when_matched_update={"source": "s.source"},
        matched_condition="s.flag = 'upd'",
        when_not_matched_insert=None,
    )
    assert out is None and t.current_version() == v0


def test_merge_into_mor_then_compact_parity(spark, tmp_path):
    from tg_data_connector_spark.lake.dml import merge_into

    t = _setup(spark, str(tmp_path / "mc"), docs=12)
    ids = _ids(t)
    src = _src(spark, [
        (ids[0], None, 99, "edit", "upd"),
        (ids[1], [7], 1, "edit", "purge"),
        ("zz1", [3, 3], 2, "edit", "new"),
    ])
    merge_into(
        t, src,
        when_matched_update={"n_tok": "s.n_tok"},
        matched_condition="s.flag = 'upd'",
        when_matched_delete=True, delete_condition="s.flag = 'purge'",
        mode="mor",
    )
    want = sorted(
        (r["doc_id"], r["n_tok"]) for r in t.read().collect()
    )
    compact(t)
    got = sorted((r["doc_id"], r["n_tok"]) for r in t.read().collect())
    assert got == want
    assert ids[1] not in {d for d, _ in got}
    assert ("zz1", 2) in got and (ids[0], 99) in got

"""Partial-update resolution (ReplayConfig.resolution="partial"): NULL column
in a U after-image = "unchanged".

Pins, against hand-computed expectations and a pandas one-shot oracle:
  * per-column latest-setter collapse within a batch (cdc.dedup.partial_collapse),
    including D resets, I full-image resets (an INSERT's NULL is a real NULL),
    and duplicate-delivery collapse;
  * cross-batch coalesce through the COW MERGE (lake/merge partial_update=True):
    column survival from seed/earlier batches, reset (_rv) kill semantics;
  * BATCH-SPLIT INVARIANCE: replaying the same log at any events_per_batch
    yields the same final table as the one-shot collapse;
  * crash/resume idempotence under partial semantics;
  * the relaxed dirty contract (quality.dirty_predicate(partial=True));
  * rejected configurations (partial + MoR, partial + binary payload).
"""

import pytest
from pyspark.sql import functions as F

from tg_data_connector_spark.cdc.dedup import partial_collapse
from tg_data_connector_spark.cdc.quality import dirty_predicate
from tg_data_connector_spark.cdc.replay import ReplayConfig, ReplayEngine
from tg_data_connector_spark.lake import LakeTable, TableSchema

SCHEMA = TableSchema(
    [
        ("doc_id", "string"),
        ("tokens", "array<int>"),
        ("n_tok", "int"),
        ("source", "string"),
    ]
)

EV = (
    "doc_id string, op string, commit_lsn long, seq_no long, "
    "tokens array<int>, n_tok int, source string, part int, offset long"
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV)


def _collapse_rows(spark, rows):
    df = spark.createDataFrame(
        [r[:7] for r in rows],
        "doc_id string, op string, commit_lsn long, seq_no long, "
        "tokens array<int>, n_tok int, source string",
    )
    out = partial_collapse(df, "doc_id")
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_collapse_coalesces_updates_in_version_order(spark):
    got = _collapse_rows(
        spark,
        [
            ("a", "U", 1, 0, None, None, "s1"),
            ("a", "U", 3, 0, [1, 2], 2, None),
        ],
    )["a"]
    assert got["tokens"] == [1, 2] and got["n_tok"] == 2
    assert got["source"] == "s1"  # older setter survives for untouched column
    assert got["op"] == "U" and got["commit_lsn"] == 3
    assert got["_rv_lsn"] is None  # no reset in a pure-update batch


def test_collapse_delete_resets_older_setters(spark):
    got = _collapse_rows(
        spark,
        [
            ("b", "U", 1, 0, [9], 1, None),
            ("b", "D", 5, 0, None, None, None),
            ("b", "U", 7, 0, None, None, "late"),
        ],
    )["b"]
    assert got["tokens"] is None and got["n_tok"] is None  # died with the D@5
    assert got["source"] == "late" and got["op"] == "U"
    assert (got["_rv_lsn"], got["_rv_seq"]) == (5, 0)


def test_collapse_delete_last_wins(spark):
    got = _collapse_rows(
        spark,
        [
            ("c", "U", 2, 0, [5], 1, "x"),
            ("c", "D", 4, 0, None, None, None),
        ],
    )["c"]
    assert got["op"] == "D" and got["commit_lsn"] == 4
    assert got["tokens"] is None and got["source"] is None


def test_collapse_insert_null_is_a_real_null(spark):
    """A full-image INSERT resets every column — its NULL source overrides an
    older partial update's value."""
    got = _collapse_rows(
        spark,
        [
            ("d", "U", 2, 0, None, None, "old"),
            ("d", "I", 5, 0, [7, 7], 2, None),
        ],
    )["d"]
    assert got["tokens"] == [7, 7] and got["source"] is None
    assert (got["_rv_lsn"], got["_rv_seq"]) == (5, 0)


def test_collapse_duplicate_delivery(spark):
    got = _collapse_rows(
        spark,
        [
            ("e", "U", 1, 1, [3], 1, "e1"),
            ("e", "U", 1, 1, [3], 1, "e1"),
        ],
    )
    assert len(got) == 1 and got["e"]["tokens"] == [3]


SEED = [("a", [1], 1, "seed"), ("b", [2], 1, "seed"), ("c", [3], 1, "seed")]
LOG = [
    ("a", "U", 10, 0, None, None, "upd", 0, 0),
    ("b", "D", 11, 0, None, None, None, 0, 1),
    ("d", "U", 12, 0, [4, 4], 2, None, 0, 2),
    ("b", "U", 25, 0, [9, 9], 2, None, 0, 3),
    ("d", "U", 26, 0, None, None, "late", 0, 4),
]
EXPECTED = {
    # a: source updated, seed tokens survive the partial U
    "a": ([1], 1, "upd"),
    # b: D@11 kills the seed row entirely; U@25 re-creates it with tokens only
    "b": ([9, 9], 2, None),
    # c: untouched seed
    "c": ([3], 1, "seed"),
    # d: created partial, then source added by a later partial U
    "d": ([4, 4], 2, "late"),
}


def _seeded(spark, root, nb=4):
    t = LakeTable.create(spark, root, SCHEMA, key="doc_id", n_buckets=nb)
    t.append(
        spark.createDataFrame(
            SEED, "doc_id string, tokens array<int>, n_tok int, source string"
        ),
        lsn_col=F.lit(-1),
        seq_col=F.lit(0),
    )
    return t


def _state(t):
    return {
        r["doc_id"]: (r["tokens"], r["n_tok"], r["source"])
        for r in t.read().collect()
    }


@pytest.mark.parametrize("per_batch", [2, 100])
def test_replay_partial_batch_split_invariance(spark, tmp_path, per_batch):
    t = _seeded(spark, str(tmp_path / f"t{per_batch}"))
    eng = ReplayEngine(
        spark,
        t,
        ReplayConfig(events_per_batch=per_batch, resolution="partial"),
    )
    eng.replay(_ev(spark, LOG), run_id="pu")
    assert _state(t) == EXPECTED


def test_replay_partial_rerun_is_idempotent(spark, tmp_path):
    t = _seeded(spark, str(tmp_path / "t"))
    cfg = ReplayConfig(events_per_batch=3, resolution="partial")
    ReplayEngine(spark, t, cfg).replay(_ev(spark, LOG), run_id="pu")
    v1 = t.current_version()
    # full re-run from offset zero: watermarks + batch-id make it a no-op
    ReplayEngine(spark, t, cfg).replay(_ev(spark, LOG), run_id="pu")
    assert _state(t) == EXPECTED
    assert t.current_version() == v1


def test_replay_partial_crash_resume(spark, tmp_path):
    t = _seeded(spark, str(tmp_path / "t"))
    cfg = ReplayConfig(events_per_batch=2, resolution="partial")
    with pytest.raises(RuntimeError, match="crash"):
        ReplayEngine(spark, t, cfg).replay(
            _ev(spark, LOG), run_id="pu", crash_before_publish_at=2
        )
    ReplayEngine(spark, t, cfg).replay(_ev(spark, LOG), run_id="pu")
    assert _state(t) == EXPECTED


def test_partial_dirty_contract(spark):
    rows = [
        # broken pair: n_tok without tokens -> dirty
        ("a", "U", 1, 0, None, 3, None),
        # pair omitted together -> clean
        ("b", "U", 2, 0, None, None, "s"),
        # pair present and consistent -> clean
        ("c", "U", 3, 0, [1, 2], 2, None),
        # pair present, inconsistent -> dirty
        ("d", "U", 4, 0, [1], 9, None),
        # INSERT must stay a full image: missing tokens -> dirty
        ("e", "I", 5, 0, None, None, "s"),
        # tokens without n_tok -> dirty
        ("f", "U", 6, 0, [1], None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, op string, commit_lsn long, seq_no long, "
        "tokens array<int>, n_tok int, source string",
    )
    dirty = {
        r["doc_id"] for r in df.where(dirty_predicate(partial=True)).collect()
    }
    assert dirty == {"a", "d", "e", "f"}
    clean = {
        r["doc_id"] for r in df.where(~dirty_predicate(partial=True)).collect()
    }
    assert clean == {"b", "c"}  # NULL-safety: every row lands on one side


def test_partial_rejects_mor_and_payload(spark, tmp_path):
    t = _seeded(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="merge_mode"):
        ReplayEngine(
            spark, t, ReplayConfig(resolution="partial", merge_mode="mor")
        )
    with pytest.raises(ValueError, match="parse_payload"):
        ReplayEngine(
            spark, t, ReplayConfig(resolution="partial", parse_payload=True)
        )
    with pytest.raises(ValueError, match="resolution"):
        ReplayEngine(spark, t, ReplayConfig(resolution="bogus"))


def test_collapse_plan_shape(spark):
    """One hash(key) exchange + ONE sort feeding all window aggregates; the
    aggregate variant's second (unordered) window adds no sort or exchange."""
    from tg_data_connector_spark.cdc.dedup import aggregate_collapse

    df = spark.createDataFrame(
        [("a", "U", 1, 0, [1], 1, "s")],
        "doc_id string, op string, commit_lsn long, seq_no long, "
        "tokens array<int>, n_tok int, source string",
    )
    p1 = (
        partial_collapse(df, "doc_id", num_partitions=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert p1.count("Exchange hashpartitioning") == 1
    assert p1.count("Sort ") == 1
    p2 = (
        aggregate_collapse(df, "doc_id", agg_spec={"n_tok": "sum"},
                           num_partitions=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert p2.count("Exchange hashpartitioning") == 1
    assert p2.count("Sort ") == 1
    assert p2.count("Window") == 2


# ---------------------------------------------------------------- MoR engine
def _seeded_mor(spark, root, nb=4):
    t = LakeTable.create(
        spark, root, SCHEMA, key="doc_id", n_buckets=nb, resolution="partial"
    )
    t.append(
        spark.createDataFrame(
            SEED, "doc_id string, tokens array<int>, n_tok int, source string"
        ),
        lsn_col=F.lit(-1),
        seq_col=F.lit(0),
    )
    return t


@pytest.mark.parametrize("per_batch", [2, 100])
def test_replay_partial_mor_parity(spark, tmp_path, per_batch):
    """MoR deltas + read-time columnwise fold land the same state as COW —
    per_batch=100 puts b's D and later U in ONE batch (pseudo-delete path),
    per_batch=2 splits them across deltas."""
    t = _seeded_mor(spark, str(tmp_path / f"t{per_batch}"))
    cfg = ReplayConfig(
        events_per_batch=per_batch, resolution="partial", merge_mode="mor"
    )
    ReplayEngine(spark, t, cfg).replay(_ev(spark, LOG), run_id="pum")
    assert _state(t) == EXPECTED


def test_replay_partial_mor_compaction_lossless(spark, tmp_path):
    from tg_data_connector_spark.lake.maintain import compact

    t = _seeded_mor(spark, str(tmp_path / "t"))
    cfg = ReplayConfig(
        events_per_batch=2, resolution="partial", merge_mode="mor"
    )
    ReplayEngine(spark, t, cfg).replay(_ev(spark, LOG), run_id="pum")
    compact(t)
    assert _state(t) == EXPECTED
    # a partial update AFTER compaction coalesces with the compacted base
    ev2 = _ev(spark, [("b", "U", 30, 0, None, None, "post", 0, 5)])
    ReplayEngine(spark, t, cfg).replay(ev2, run_id="pum2")
    got = _state(t)
    assert got["b"] == ([9, 9], 2, "post")


def test_replay_partial_mor_crash_resume(spark, tmp_path):
    t = _seeded_mor(spark, str(tmp_path / "t"))
    cfg = ReplayConfig(
        events_per_batch=2, resolution="partial", merge_mode="mor"
    )
    with pytest.raises(RuntimeError, match="crash"):
        ReplayEngine(spark, t, cfg).replay(
            _ev(spark, LOG), run_id="pum", crash_before_publish_at=2
        )
    ReplayEngine(spark, t, cfg).replay(_ev(spark, LOG), run_id="pum")
    assert _state(t) == EXPECTED


def test_partial_mor_requires_table_declaration(spark, tmp_path):
    """MoR defers resolution to readers, so the merge engine must be a TABLE
    property: an undeclared table rejects mor+partial, and a declared table
    rejects an lww writer."""
    t_undeclared = _seeded(spark, str(tmp_path / "u"))
    with pytest.raises(ValueError, match="declare"):
        ReplayEngine(
            spark,
            t_undeclared,
            ReplayConfig(resolution="partial", merge_mode="mor"),
        )
    t_declared = _seeded_mor(spark, str(tmp_path / "d"))
    with pytest.raises(ValueError, match="declares"):
        ReplayEngine(spark, t_declared, ReplayConfig())  # lww writer


def test_changes_feed_emits_full_images_for_columnwise(spark, tmp_path):
    """CDF on a partial table must NOT stream partial delta rows verbatim
    (a downstream LWW apply would turn NULL=unchanged into NULL=overwrite):
    it emits the NET resolved diff — full images, one pseudo-commit."""
    from tg_data_connector_spark.lake.table import DELETED_COL

    t = _seeded_mor(spark, str(tmp_path / "t"))
    v0 = t.current_version()
    cfg = ReplayConfig(
        events_per_batch=2, resolution="partial", merge_mode="mor"
    )
    ReplayEngine(spark, t, cfg).replay(_ev(spark, LOG), run_id="pum")
    ch = t.changes(v0)
    rows = {r["doc_id"]: r for r in ch.collect()}
    # a: full image with seed tokens coalesced in, despite the partial U
    assert rows["a"]["tokens"] == [1] and rows["a"]["source"] == "upd"
    # b: final re-created row, not the intermediate tombstone
    assert rows["b"]["tokens"] == [9, 9] and not rows["b"][DELETED_COL]
    # c untouched -> absent from the net diff
    assert "c" not in rows
    assert rows["d"]["source"] == "late"


def test_sync_table_from_columnwise_upstream(spark, tmp_path):
    """Table-to-table sync off a partial upstream converges the downstream
    (a plain lww table) to the resolved upstream state across incremental
    passes."""
    from tg_data_connector_spark.lake.sync import sync_table

    up = _seeded_mor(spark, str(tmp_path / "up"))
    down = LakeTable.create(
        spark, str(tmp_path / "down"), SCHEMA, key="doc_id", n_buckets=4
    )
    cfg = ReplayConfig(
        events_per_batch=2, resolution="partial", merge_mode="mor"
    )
    sync_table(up, down, "up")  # bootstrap (seed only)
    ReplayEngine(spark, up, cfg).replay(
        _ev(spark, LOG[:3]), run_id="p1"
    )
    sync_table(up, down, "up")
    ReplayEngine(spark, up, cfg).replay(_ev(spark, LOG), run_id="p2")
    sync_table(up, down, "up")
    assert _state(down) == _state(up) == EXPECTED
    # converged: another pass is a no-op
    assert sync_table(up, down, "up") is None


def test_update_where_null_assignment_sticks_on_columnwise_mor(spark, tmp_path):
    """DML update_where writes a full image: on a columnwise MoR table an
    explicit set-to-NULL must stick — the delta row is marked as a restart
    so the read fold replaces the row wholesale instead of coalescing."""
    from tg_data_connector_spark.lake.dml import update_where

    t = _seeded_mor(spark, str(tmp_path / "t"))
    cfg = ReplayConfig(
        events_per_batch=100, resolution="partial", merge_mode="mor"
    )
    ReplayEngine(spark, t, cfg).replay(_ev(spark, LOG), run_id="pum")
    update_where(
        t, "doc_id = 'a'", {"source": F.lit(None).cast("string")}, mode="mor"
    )
    got = _state(t)
    assert got["a"] == ([1], 1, None)  # source nulled, tokens/n_tok kept
    # the other keys are untouched
    assert got["b"] == EXPECTED["b"] and got["d"] == EXPECTED["d"]


def test_mor_partial_out_of_order_batches(spark, tmp_path):
    """A streaming tail's file-split micro-batches can INTERLEAVE version
    ranges across batches. MoR columnwise appends raw events (the read fold
    is the collapse over the whole stream), so ANY batch order converges to
    the one-shot state — here the later batch carries OLDER versions whose
    setters must still lose to newer ones already applied, column by column."""
    t = _seeded_mor(spark, str(tmp_path / "t"))
    cfg = ReplayConfig(resolution="partial", merge_mode="mor")
    eng = ReplayEngine(spark, t, cfg)
    # batch 1: the NEWER events (tokens@26, the delete@11, re-create@25)
    b1 = [
        ("b", "D", 11, 0, None, None, None, 0, 1),
        ("b", "U", 25, 0, [9, 9], 2, None, 0, 3),
        ("d", "U", 26, 0, None, None, "late", 0, 4),
    ]
    # batch 2: the OLDER events delivered afterwards
    b2 = [
        ("a", "U", 10, 0, None, None, "upd", 0, 0),
        ("d", "U", 12, 0, [4, 4], 2, None, 0, 2),
    ]
    eng.apply_batch(_ev(spark, b1), batch_id="oo1")
    eng.apply_batch(_ev(spark, b2), batch_id="oo2")
    assert _state(t) == EXPECTED


def test_stream_replay_rejects_cow_columnwise(spark, tmp_path):
    from tg_data_connector_spark.streaming import stream_replay

    t = _seeded(spark, str(tmp_path / "t"))
    eng = ReplayEngine(spark, t, ReplayConfig(resolution="partial"))
    with pytest.raises(ValueError, match="mor"):
        stream_replay(spark, eng, str(tmp_path / "log"), str(tmp_path / "c"))


def test_merge_into_null_assignment_sticks_on_columnwise_mor(spark, tmp_path):
    """merge_into writes FULL-image U rows; on a columnwise MoR table they
    must carry the restart marker (same rule as update_where) so a clause
    assigning NULL replaces the row wholesale instead of being folded as a
    partial image that keeps the old value."""
    from tg_data_connector_spark.lake.dml import merge_into

    t = _seeded_mor(spark, str(tmp_path / "t"))
    cfg = ReplayConfig(
        events_per_batch=100, resolution="partial", merge_mode="mor"
    )
    ReplayEngine(spark, t, cfg).replay(_ev(spark, LOG), run_id="pmm")
    merge_into(
        t,
        spark.createDataFrame([("a",)], "doc_id string"),
        when_matched_update={"source": F.lit(None).cast("string")},
        when_not_matched_insert=None,
        mode="mor",
    )
    got = _state(t)
    assert got["a"] == ([1], 1, None)  # source nulled, tokens/n_tok kept
    assert got["b"] == EXPECTED["b"] and got["d"] == EXPECTED["d"]


def test_changes_all_compaction_window_short_circuits(spark, tmp_path):
    """changes() over a commit window that is ENTIRELY compactions on a
    columnwise table returns the empty diff without the O(table) two-scan
    exceptAll (a compaction is no logical change by definition)."""
    from tg_data_connector_spark.lake.maintain import compact

    t = _seeded_mor(spark, str(tmp_path / "t"))
    cfg = ReplayConfig(resolution="partial", merge_mode="mor")
    ReplayEngine(spark, t, cfg).replay(_ev(spark, LOG), run_id="pch")
    v = t.current_version()
    compact(t)
    ch = t.changes(from_version=v)
    assert ch.count() == 0
    # the plan must be the short-circuit, not the resolved diff: no Join
    # (exceptAll plans as a left-anti join over the two resolved scans)
    assert "Join" not in ch._jdf.queryExecution().optimizedPlan().toString()

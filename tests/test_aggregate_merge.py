"""Aggregation merge engine (ReplayConfig.resolution="aggregate"): per-column
sum/max/min/last combiners over the change feed (the Paimon aggregation merge
engine model), sharing the partial-update reset machinery — a DELETE resets
the accumulator, an INSERT restarts it at its own image.

Pins: collapse arithmetic with resets, duplicate-delivery safety for sums,
batch-split invariance through the COW MERGE, idempotent re-run, config
validation, and the relaxed (unpaired) dirty contract.
"""

import pytest
from pyspark.sql import functions as F

from tg_data_connector_spark.cdc.dedup import aggregate_collapse
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

SPEC = {"n_tok": "sum"}


def _collapse(spark, rows, spec=SPEC):
    df = spark.createDataFrame(
        [r[:7] for r in rows],
        "doc_id string, op string, commit_lsn long, seq_no long, "
        "tokens array<int>, n_tok int, source string",
    )
    out = aggregate_collapse(df, "doc_id", agg_spec=spec)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_collapse_sum_and_resets(spark):
    got = _collapse(
        spark,
        [
            # a: plain running total
            ("a", "U", 1, 0, None, 5, None),
            ("a", "U", 2, 0, None, 7, None),
            # b: delete resets, later update restarts
            ("b", "U", 1, 0, None, 100, None),
            ("b", "D", 3, 0, None, None, None),
            ("b", "U", 5, 0, None, 4, None),
            # c: insert restarts the accumulator at its own image
            ("c", "U", 1, 0, None, 50, None),
            ("c", "I", 4, 0, [9], 10, "new"),
            ("c", "U", 6, 0, None, 2, None),
            # d: masked contribution (NULL) adds nothing
            ("d", "U", 1, 0, None, 3, None),
            ("d", "U", 2, 0, None, None, "s"),
        ],
    )
    assert got["a"]["n_tok"] == 12
    assert got["b"]["n_tok"] == 4 and (got["b"]["_rv_lsn"]) == 3
    assert got["c"]["n_tok"] == 12 and got["c"]["source"] == "new"
    assert got["d"]["n_tok"] == 3 and got["d"]["source"] == "s"


def test_collapse_max_min(spark):
    got = _collapse(
        spark,
        [
            ("a", "U", 1, 0, None, 9, None),
            ("a", "U", 2, 0, None, 3, None),
            ("a", "D", 4, 0, None, None, None),
            ("a", "U", 5, 0, None, 6, None),
        ],
        spec={"n_tok": "max"},
    )
    assert got["a"]["n_tok"] == 6  # 9 and 3 died with the delete
    got = _collapse(
        spark,
        [
            ("a", "U", 1, 0, None, 9, None),
            ("a", "U", 2, 0, None, 3, None),
        ],
        spec={"n_tok": "min"},
    )
    assert got["a"]["n_tok"] == 3


def test_collapse_duplicate_delivery_not_double_counted(spark):
    got = _collapse(
        spark,
        [
            ("a", "U", 1, 0, None, 5, None),
            ("a", "U", 1, 0, None, 5, None),  # exact redelivery
            ("a", "U", 2, 0, None, 7, None),
        ],
    )
    assert got["a"]["n_tok"] == 12  # not 17


def test_collapse_rejects_unknown_fn(spark):
    df = spark.createDataFrame(
        [("a", "U", 1, 0, None, 5, None)],
        "doc_id string, op string, commit_lsn long, seq_no long, "
        "tokens array<int>, n_tok int, source string",
    )
    with pytest.raises(ValueError, match="unknown aggregate fn"):
        aggregate_collapse(df, "doc_id", agg_spec={"n_tok": "avg"})


SEED = [("a", [1], 10, "seed"), ("b", [2], 20, "seed")]
LOG = [
    ("a", "U", 10, 0, None, 5, "u1", 0, 0),
    ("a", "U", 11, 0, None, 7, None, 0, 1),
    ("b", "D", 12, 0, None, None, None, 0, 2),
    ("b", "U", 13, 0, [5], 3, None, 0, 3),
    ("c", "I", 14, 0, [9], 100, "new", 0, 4),
    ("c", "U", 15, 0, None, 1, None, 0, 5),
]
EXPECTED = {
    "a": ([1], 22, "u1"),  # 10 (seed) + 5 + 7; seed tokens survive
    "b": ([5], 3, None),  # delete killed the seed accumulator
    "c": ([9], 101, "new"),  # insert restarted at 100, then +1
}


def _seeded(spark, root):
    t = LakeTable.create(spark, root, SCHEMA, key="doc_id", n_buckets=4)
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
def test_replay_aggregate_batch_split_invariance(spark, tmp_path, per_batch):
    t = _seeded(spark, str(tmp_path / f"t{per_batch}"))
    cfg = ReplayConfig(
        events_per_batch=per_batch, resolution="aggregate", agg_spec=SPEC
    )
    ReplayEngine(spark, t, cfg).replay(
        spark.createDataFrame(LOG, EV), run_id="agg"
    )
    assert _state(t) == EXPECTED


def test_replay_aggregate_rerun_is_idempotent(spark, tmp_path):
    """Running totals are the semantics MOST exposed to double-application —
    the watermark/batch-id machinery must make a full re-run a no-op."""
    t = _seeded(spark, str(tmp_path / "t"))
    cfg = ReplayConfig(
        events_per_batch=2, resolution="aggregate", agg_spec=SPEC
    )
    log = spark.createDataFrame(LOG, EV)
    ReplayEngine(spark, t, cfg).replay(log, run_id="agg")
    v = t.current_version()
    ReplayEngine(spark, t, cfg).replay(log, run_id="agg")
    assert _state(t) == EXPECTED
    assert t.current_version() == v


def test_aggregate_config_validation(spark, tmp_path):
    t = _seeded(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="non-empty agg_spec"):
        ReplayEngine(spark, t, ReplayConfig(resolution="aggregate"))
    with pytest.raises(ValueError, match="unknown columns"):
        ReplayEngine(
            spark,
            t,
            ReplayConfig(resolution="aggregate", agg_spec={"bogus": "sum"}),
        )
    with pytest.raises(ValueError, match="merge_mode"):
        ReplayEngine(
            spark,
            t,
            ReplayConfig(
                resolution="aggregate", agg_spec=SPEC, merge_mode="mor"
            ),
        )


def test_unpaired_dirty_contract(spark):
    """With n_tok under an aggregate combiner the tokens/n_tok pair rule is
    dropped: only the key/op contract remains."""
    rows = [
        ("a", "U", 1, 0, None, 3, None),  # counter without tokens: clean
        (None, "U", 2, 0, None, 3, None),  # missing key: dirty
        ("c", "X", 3, 0, None, None, None),  # bad op: dirty
        ("d", "D", 4, 0, None, None, None),  # clean delete
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, op string, commit_lsn long, seq_no long, "
        "tokens array<int>, n_tok int, source string",
    )
    pred = dirty_predicate(partial=True, pair_check=False)
    assert {r["doc_id"] for r in df.where(pred).collect()} == {None, "c"}
    assert {r["doc_id"] for r in df.where(~pred).collect()} == {"a", "d"}


def test_job_surface_aggregate_resolution(spark, tmp_path):
    """The declarative config surface forwards resolution/aggSpec to the
    replay engine: a parquet changelog driven through run_job with
    resolution=aggregate lands the same state as the engine-level test."""
    from tg_data_connector_spark.job import run_job

    t = _seeded(spark, str(tmp_path / "t"))
    log_dir = str(tmp_path / "log")
    spark.createDataFrame(LOG, EV).write.parquet(log_dir)
    job = {
        "reader": {"type": "parquet", "path": log_dir},
        "writer": {
            "type": "lake_replay",
            "path": t.root,
            "key": "doc_id",
            "eventsPerBatch": 2,
            "runId": "jagg",
            "resolution": "aggregate",
            "aggSpec": {"n_tok": "sum"},
        },
    }
    run_job(spark, job)
    assert _state(t) == EXPECTED


# ---------------------------------------------------------------- MoR engine
def _seeded_mor(spark, root):
    t = LakeTable.create(
        spark, root, SCHEMA, key="doc_id", n_buckets=4,
        resolution="aggregate", agg_spec=SPEC,
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
def test_replay_aggregate_mor_parity(spark, tmp_path, per_batch):
    """Running totals through MoR deltas == COW: per_batch=100 exercises the
    batch-internal reset paths at read time (pseudo-delete for b, restart-at-
    winner for c), per_batch=2 exercises cross-delta accumulation."""
    t = _seeded_mor(spark, str(tmp_path / f"t{per_batch}"))
    cfg = ReplayConfig(
        events_per_batch=per_batch,
        resolution="aggregate",
        merge_mode="mor",
        agg_spec=SPEC,
    )
    ReplayEngine(spark, t, cfg).replay(
        spark.createDataFrame(LOG, EV), run_id="aggm"
    )
    assert _state(t) == EXPECTED


def test_replay_aggregate_mor_compaction_and_continue(spark, tmp_path):
    """Compaction folds the accumulator losslessly AND later deltas keep
    adding onto the compacted base (the base re-enters the fold as a full
    image at its version)."""
    from tg_data_connector_spark.lake.maintain import compact

    t = _seeded_mor(spark, str(tmp_path / "t"))
    cfg = ReplayConfig(
        events_per_batch=100,
        resolution="aggregate",
        merge_mode="mor",
        agg_spec=SPEC,
    )
    ReplayEngine(spark, t, cfg).replay(
        spark.createDataFrame(LOG, EV), run_id="aggm"
    )
    compact(t)
    assert _state(t) == EXPECTED
    ev2 = spark.createDataFrame(
        [("a", "U", 20, 0, None, 100, None, 0, 6)], EV
    )
    ReplayEngine(spark, t, cfg).replay(ev2, run_id="aggm2")
    assert _state(t)["a"] == ([1], 122, "u1")


def test_aggregate_mor_agg_spec_must_match_table(spark, tmp_path):
    t = _seeded_mor(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="agg_spec"):
        ReplayEngine(
            spark,
            t,
            ReplayConfig(
                resolution="aggregate",
                merge_mode="mor",
                agg_spec={"n_tok": "max"},  # table declared sum
            ),
        )


def test_job_surface_creates_declared_mor_table(spark, tmp_path):
    """A lake_replay writer with mergeMode=mor + a columnwise resolution
    creates the table WITH the declared merge engine, so the whole flow —
    create, replay, resolved read — runs off one job.json."""
    from tg_data_connector_spark.job import run_job

    log_dir = str(tmp_path / "log")
    root = str(tmp_path / "t")
    spark.createDataFrame(LOG, EV).write.parquet(log_dir)
    job = {
        "reader": {"type": "parquet", "path": log_dir},
        "writer": {
            "type": "lake_replay",
            "path": root,
            "key": "doc_id",
            "eventsPerBatch": 2,
            "runId": "jm",
            "mergeMode": "mor",
            "resolution": "aggregate",
            "aggSpec": {"n_tok": "sum"},
        },
    }
    run_job(spark, job)
    t = LakeTable(spark, root)
    assert t.meta().get("resolution") == "aggregate"
    got = _state(t)
    # no seed here: a's total is 5+7, b was deleted then re-created at 3,
    # c inserted at 100 then +1
    assert got == {
        "a": (None, 12, "u1"),
        "b": ([5], 3, None),
        "c": ([9], 101, "new"),
    }


def test_merge_into_assignment_replaces_sum_on_columnwise_mor(spark, tmp_path):
    """A merge_into clause assigning a value to a 'sum' column must SET it,
    not add a contribution to the accumulator: the full-image changeset row
    carries the restart marker so the read fold restarts at the assigned
    image (same rule as update_where)."""
    from tg_data_connector_spark.lake.dml import merge_into

    t = _seeded_mor(spark, str(tmp_path / "t"))
    cfg = ReplayConfig(
        events_per_batch=100,
        resolution="aggregate",
        merge_mode="mor",
        agg_spec=SPEC,
    )
    ReplayEngine(spark, t, cfg).replay(
        spark.createDataFrame(LOG, EV), run_id="aggmi"
    )
    assert _state(t)["a"][1] == 22  # accumulated: 10 seed + 5 + 7
    merge_into(
        t,
        spark.createDataFrame([("a",)], "doc_id string"),
        when_matched_update={"n_tok": F.lit(5)},
        when_not_matched_insert=None,
        mode="mor",
    )
    got = _state(t)
    assert got["a"] == ([1], 5, "u1")  # SET to 5, not 22+5
    assert got["b"] == EXPECTED["b"] and got["c"] == EXPECTED["c"]


def test_create_warns_on_narrow_sum_column(spark, tmp_path):
    """agg_spec 'sum' over an int column folds in bigint and casts back on
    read — an overflow raises under ANSI mode at read/compaction time, so
    create() steers to a wide type up front."""
    import warnings as _w

    with pytest.warns(UserWarning, match="bigint"):
        LakeTable.create(
            spark, str(tmp_path / "warn"), SCHEMA, key="doc_id",
            n_buckets=2, resolution="aggregate", agg_spec={"n_tok": "sum"},
        )
    wide = TableSchema([
        ("doc_id", "string"), ("tokens", "array<int>"),
        ("n_tok", "bigint"), ("source", "string"),
    ])
    with _w.catch_warnings():
        _w.simplefilter("error")
        LakeTable.create(
            spark, str(tmp_path / "ok"), wide, key="doc_id",
            n_buckets=2, resolution="aggregate", agg_spec={"n_tok": "sum"},
        )

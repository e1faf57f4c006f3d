"""ReplayConfig.expectations: warn counts, drop filtering + rule-tagged
quarantine, fail abort with watermark unadvanced, and exemption of
contract-dirty / delete events."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from tg_data_connector_spark.cdc.genlog import gen_changelog, gen_seed_sequences
from tg_data_connector_spark.cdc.replay import (
    Expectation,
    ExpectationFailed,
    ReplayConfig,
    ReplayEngine,
)
from tg_data_connector_spark.lake.table import LakeTable, TableSchema
from tests.oracle import oracle_final_state

SCHEMA = TableSchema(
    [
        ("doc_id", "string"),
        ("tokens", "array<int>"),
        ("n_tok", "int"),
        ("source", "string"),
    ]
)


def _table(spark, seed):
    root = tempfile.mkdtemp(prefix="tgspark_exp_")
    t = LakeTable.create(spark, f"{root}/t", SCHEMA, key="doc_id", n_buckets=8)
    t.append(seed, lsn_col=F.lit(-1), seq_col=F.lit(0))
    return t, root


def test_invalid_action_rejected():
    with pytest.raises(ValueError):
        Expectation("x", "true", "explode")


def test_drop_rule_filters_events_and_matches_oracle(spark):
    seed = gen_seed_sequences(spark, n_docs=200, seed=7)
    log = gen_changelog(spark, n_events=4000, n_docs=200, n_parts=4, seed=7)
    t, _ = _table(spark, seed)
    eng = ReplayEngine(
        spark,
        t,
        ReplayConfig(
            events_per_batch=2000,
            expectations=[
                Expectation("tok_bound", "op = 'D' OR n_tok <= 20", "drop")
            ],
        ),
    )
    reports = eng.replay(log, run_id="drop")
    # oracle: the rule commutes with replay -> filter the log up front
    kept = log.where("op = 'D' OR n_tok <= 20")
    want = oracle_final_state(seed, kept)
    got = t.read().select("doc_id", "tokens", "n_tok", "source")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    dropped = sum(r.expectations.get("tok_bound", 0) for r in reports)
    from tg_data_connector_spark.cdc.quality import dirty_predicate

    expect_viol = log.where(~dirty_predicate()).where(
        "op <> 'D' AND n_tok > 20"
    ).count()
    assert dropped == expect_viol > 0


def test_warn_counts_without_filtering(spark):
    seed = gen_seed_sequences(spark, n_docs=120, seed=3)
    log = gen_changelog(spark, n_events=2000, n_docs=120, n_parts=4, seed=3)
    t, _ = _table(spark, seed)
    eng = ReplayEngine(
        spark,
        t,
        ReplayConfig(
            events_per_batch=1000,
            expectations=[
                Expectation("tok_bound", "op = 'D' OR n_tok <= 20", "warn")
            ],
        ),
    )
    reports = eng.replay(log, run_id="warn")
    warned = sum(r.expectations.get("tok_bound", 0) for r in reports)
    from tg_data_connector_spark.cdc.quality import dirty_predicate

    expect_viol = log.where(~dirty_predicate()).where(
        "op <> 'D' AND n_tok > 20"
    ).count()
    assert warned == expect_viol > 0
    # warn never filters: final state == unconstrained oracle
    want = oracle_final_state(seed, log)
    got = t.read().select("doc_id", "tokens", "n_tok", "source")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_fail_aborts_before_any_commit(spark):
    seed = gen_seed_sequences(spark, n_docs=100, seed=5)
    log = gen_changelog(spark, n_events=1500, n_docs=100, n_parts=4, seed=5)
    t, _ = _table(spark, seed)
    v0 = t.current_version()
    eng = ReplayEngine(
        spark,
        t,
        ReplayConfig(
            events_per_batch=100_000,
            expectations=[
                Expectation("tok_bound", "op = 'D' OR n_tok <= 20", "fail")
            ],
        ),
    )
    with pytest.raises(ExpectationFailed):
        eng.replay(log, run_id="fail")
    assert t.current_version() == v0  # nothing staged/published
    assert t.snapshot().watermarks() == {}
    # after relaxing the rule the same engine replays the same batch fully
    eng2 = ReplayEngine(spark, t, ReplayConfig(events_per_batch=100_000))
    eng2.replay(log, run_id="fail")
    want = oracle_final_state(seed, log)
    got = t.read().select("doc_id", "tokens", "n_tok", "source")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_dropped_rows_quarantine_with_rule_tag(spark):
    seed = gen_seed_sequences(spark, n_docs=100, seed=9)
    log = gen_changelog(spark, n_events=1500, n_docs=100, n_parts=4, seed=9)
    t, root = _table(spark, seed)
    qdir = os.path.join(root, "quarantine")
    eng = ReplayEngine(
        spark,
        t,
        ReplayConfig(
            events_per_batch=100_000,
            quarantine_dir=qdir,
            expectations=[
                Expectation("tok_bound", "op = 'D' OR n_tok <= 20", "drop")
            ],
        ),
    )
    reports = eng.replay(log, run_id="q")
    exp = spark.read.parquet(f"{qdir}/_expectations")
    n_drop = sum(r.expectations["tok_bound"] for r in reports)
    assert exp.count() == n_drop > 0
    assert exp.where(F.array_contains("_rules", "tok_bound")).count() == n_drop
    # the dirty quarantine dir still reads clean (underscore subdir hidden)
    dirty = spark.read.parquet(qdir)
    assert "_rules" not in dirty.columns


def test_dirty_and_delete_events_exempt(spark):
    """Contract-dirty rows quarantine as dirty (not as expectation
    violations), and delete events pass via the op guard."""
    seed = gen_seed_sequences(spark, n_docs=80, seed=13)
    log = gen_changelog(spark, n_events=1200, n_docs=80, n_parts=4, seed=13)
    t, _ = _table(spark, seed)
    eng = ReplayEngine(
        spark,
        t,
        ReplayConfig(
            events_per_batch=100_000,
            expectations=[
                # without the op='D' guard this would count every delete —
                # the exemption under test is only for DIRTY rows
                Expectation("tok_bound", "op = 'D' OR n_tok <= 100", "fail")
            ],
        ),
    )
    # n_tok <= 100 holds for every clean event, so fail never trips even
    # though dirty rows violate the size contract
    reports = eng.replay(log, run_id="exempt")
    assert sum(r.expectations["tok_bound"] for r in reports) == 0
    assert sum(r.dirty for r in reports) > 0

"""Write-audit-publish (staged snapshots).

Iceberg's WAP pattern: a batch commits with ``publish=False`` so its snapshot
is fully staged (version file + manifest shards + data files) but invisible
to readers; an auditor reads the staged version via time travel, then either
``publish_staged`` (atomic fast-forward pointer swap — the audited bytes ARE
the published bytes) or ``drop_staged`` (version file deleted, files orphan
for gc). The reference's analog is its preCheck/dryRun gate before a load
(``JobContainer`` preCheck), which validates BEFORE writing; WAP validates
the actual written result, which is the stronger guarantee a lake format
makes possible.
"""

import pytest
from pyspark.sql import functions as F

from tg_data_connector_spark.lake import (
    LakeTable,
    TableSchema,
    delta_append,
    merge_upsert,
)
from tg_data_connector_spark.lake.maintain import gc_orphans
from tg_data_connector_spark.lake.table import CommitConflict

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


def _tbl(spark, root, nb=4, n=30):
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


def _state(t, snapshot=None):
    return {
        r["doc_id"]: (r["tokens"], r["n_tok"], r["source"])
        for r in t.read(snapshot=snapshot).collect()
    }


def test_staged_merge_invisible_until_published(spark, tmp_table_root):
    t = _tbl(spark, tmp_table_root)
    v0 = t.current_version()
    staged = merge_upsert(
        t,
        _ev(spark, [("d1", [99], 1, "s9", "U", 10, 0)]),
        summary_update={"batch_id": "A"},
        publish=False,
    )
    # invisible: pointer unmoved, reads show the old state
    assert t.current_version() == v0
    assert _state(t)["d1"] == ([1], 1, "s")
    assert "A" not in t.snapshot().applied_batches()
    # audit read sees the merged result
    assert _state(t, snapshot=t.snapshot(staged.version))["d1"] == ([99], 1, "s9")
    # publish: atomic fast-forward, now visible + batch recorded
    t.publish_staged(staged.version)
    assert t.current_version() == staged.version
    assert _state(t)["d1"] == ([99], 1, "s9")
    assert "A" in t.snapshot().applied_batches()


def test_drop_staged_rejects_audit_failure_and_gc_cleans(spark, tmp_table_root):
    t = _tbl(spark, tmp_table_root)
    v0 = t.current_version()
    files0 = {f["path"] for f in t.snapshot().files}
    staged = merge_upsert(
        t,
        _ev(spark, [("d1", [0], -1, "bad", "U", 10, 0)]),
        publish=False,
    )
    # audit fails (negative n_tok) -> reject
    bad = (
        t.read(snapshot=t.snapshot(staged.version))
        .where(F.col("n_tok") < 0)
        .count()
    )
    assert bad == 1
    t.drop_staged(staged.version)
    assert t.current_version() == v0
    assert _state(t)["d1"] == ([1], 1, "s")
    # the rejected snapshot's files are orphans now; gc removes them and
    # leaves every published file alone
    removed = gc_orphans(t, min_age_seconds=0)
    assert removed  # staged data files and manifest shards went away
    assert {f["path"] for f in t.snapshot().files} == files0
    assert t.read().count() == 30
    # dropping a published version is refused
    with pytest.raises(ValueError, match="published"):
        t.drop_staged(v0)


def test_publish_staged_rejects_non_fast_forward(spark, tmp_table_root):
    """An interloper publishing between stage and publish invalidates the
    staged snapshot (it embeds COW basis rows from the old parent):
    publish_staged must raise, the caller re-stages against the new head."""
    t_a = _tbl(spark, tmp_table_root)
    t_b = LakeTable(spark, tmp_table_root)
    staged = merge_upsert(
        t_a,
        _ev(spark, [("d1", [99], 1, "s9", "U", 10, 0)]),
        summary_update={"batch_id": "A"},
        publish=False,
    )
    merge_upsert(
        t_b,
        _ev(spark, [("d2", [77], 1, "s7", "U", 20, 0)]),
        summary_update={"batch_id": "B"},
    )
    with pytest.raises(CommitConflict):
        t_a.publish_staged(staged.version)
    # recovery protocol: discard the stale staged snapshot (so its files
    # don't stay pinned), re-stage against the new head, audit, publish
    t_a.drop_staged(staged.version)
    staged2 = merge_upsert(
        t_a,
        _ev(spark, [("d1", [99], 1, "s9", "U", 10, 0)]),
        summary_update={"batch_id": "A"},
        publish=False,
    )
    t_a.publish_staged(staged2.version)
    s = _state(t_a)
    assert s["d1"] == ([99], 1, "s9")
    assert s["d2"] == ([77], 1, "s7")
    assert t_a.snapshot().applied_batches().count("A") == 1


def test_staged_mor_delta_publish(spark, tmp_table_root):
    """WAP composes with the merge-on-read path: a staged delta_append is
    invisible, audits correctly through the base+delta LWW resolve, and
    fast-forwards on publish."""
    t = _tbl(spark, tmp_table_root)
    v0 = t.current_version()
    staged = delta_append(
        t,
        _ev(spark, [("d1", None, None, None, "D", 10, 0)]),
        summary_update={"batch_id": "A"},
        publish=False,
    )
    assert t.current_version() == v0
    assert "d1" in _state(t)
    assert "d1" not in _state(t, snapshot=t.snapshot(staged.version))
    t.publish_staged(staged.version)
    assert "d1" not in _state(t)
    assert t.read().count() == 29


def test_engine_wap_audit_each_batch_then_converge(spark, tmp_table_root):
    """ReplayConfig.wap_audit: every batch stages, is audited on the staged
    snapshot, and fast-forwards on approval — the final state is identical
    to an unaudited replay (the gate is pure protocol, zero semantic drift)."""
    from tg_data_connector_spark.cdc import (
        ReplayConfig, ReplayEngine, gen_changelog, gen_seed_sequences,
    )
    from oracle import oracle_final_state

    t = LakeTable.create(spark, tmp_table_root, SCHEMA, "doc_id", 8)
    seed = gen_seed_sequences(spark, 300)
    t.append(seed)
    log = gen_changelog(spark, 2000, 300, n_parts=4)
    audited = []

    def audit(table, staged):
        audited.append(staged.version)
        bad = (
            table.read(snapshot=staged).where(F.col("n_tok") < 0).count()
        )
        return bad == 0

    eng = ReplayEngine(
        spark, t, ReplayConfig(events_per_batch=1000, wap_audit=audit)
    )
    reports = eng.replay(log, run_id="wap")
    assert audited and len(audited) == len(reports)
    got = t.read().select("doc_id", "tokens", "n_tok", "source")
    exp = oracle_final_state(seed, log).select(
        "doc_id", "tokens", "n_tok", "source"
    )
    assert got.exceptAll(exp).count() + exp.exceptAll(got).count() == 0


def test_engine_wap_veto_preserves_watermark_for_retry(spark, tmp_table_root):
    """A vetoed batch drops its staged snapshot WITHOUT advancing the
    watermark: the table is untouched, and a re-run after the veto lifts
    retries the exact same batch and converges (at-most-once through the
    veto path)."""
    from tg_data_connector_spark.cdc import (
        ReplayConfig, ReplayEngine, gen_changelog, gen_seed_sequences,
    )
    from tg_data_connector_spark.cdc.replay import AuditRejected
    from oracle import oracle_final_state

    t = LakeTable.create(spark, tmp_table_root, SCHEMA, "doc_id", 8)
    seed = gen_seed_sequences(spark, 300)
    t.append(seed)
    log = gen_changelog(spark, 2000, 300, n_parts=4)
    gate = {"veto": True}
    cfg = ReplayConfig(
        events_per_batch=1000, wap_audit=lambda tb, s: not gate["veto"]
    )
    eng = ReplayEngine(spark, t, cfg)
    v0 = t.current_version()
    with pytest.raises(AuditRejected):
        eng.replay(log, run_id="wap")
    assert t.current_version() == v0  # nothing published
    assert not t.snapshot().watermarks()  # watermark did not advance
    gate["veto"] = False
    ReplayEngine(spark, t, cfg).replay(log, run_id="wap")
    got = t.read().select("doc_id", "tokens", "n_tok", "source")
    exp = oracle_final_state(seed, log).select(
        "doc_id", "tokens", "n_tok", "source"
    )
    assert got.exceptAll(exp).count() + exp.exceptAll(got).count() == 0
